"""Solr facet bucket params (facet.limit/offset/mincount/sort/prefix/
missing, per-field f.<field>.facet.X overrides) and facet.query — the
SimpleFacets parameter surface a real /select client uses, verified
brute-force against the source frame. Reference behavior:
SolrAdminActions.java:233-245 issues facet.field with setFacetLimit(-1);
the param semantics here follow Solr's SimpleFacets defaults (limit 100,
sort=count when limited, missing as a trailing null entry)."""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=50, turns_per_conv=6, seed=47)
    idx_dir = str(tmp_path_factory.mktemp("fparams"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="fp", **CFG))
    return df, BM25Index(spark, idx_dir)


def _brute_counts(df, field):
    rows = df.groupBy(field).count().collect()
    return {r[field]: r["count"] for r in rows if r[field] is not None}


def _pairs(flat):
    return list(zip(flat[::2], flat[1::2]))


def test_facet_limit_and_default_count_sort(corpus):
    df, idx = corpus
    want = sorted(
        _brute_counts(df, "role").items(), key=lambda p: (-p[1], str(p[0]))
    )
    resp = solr_select(idx, {
        "q": "*:*", "rows": 0, "facet": "true", "facet.field": "role",
        "facet.limit": 2,
    })
    got = _pairs(resp["facet_counts"]["facet_fields"]["role"])
    assert got == [(v, c) for v, c in want[:2]]


def test_facet_sort_index_and_offset(corpus):
    df, idx = corpus
    vals = sorted(_brute_counts(df, "role"))
    resp = solr_select(idx, {
        "q": "*:*", "rows": 0, "facet": "true", "facet.field": "role",
        "facet.sort": "index", "facet.offset": 1, "facet.limit": -1,
    })
    got = _pairs(resp["facet_counts"]["facet_fields"]["role"])
    assert [v for v, _ in got] == vals[1:]


def test_facet_prefix_and_mincount(corpus):
    df, idx = corpus
    counts = _brute_counts(df, "role")
    resp = solr_select(idx, {
        "q": "*:*", "rows": 0, "facet": "true", "facet.field": "role",
        "facet.prefix": "a",
    })
    got = dict(_pairs(resp["facet_counts"]["facet_fields"]["role"]))
    assert got == {v: c for v, c in counts.items() if v.startswith("a")}
    # a mincount above every bucket leaves no buckets
    resp2 = solr_select(idx, {
        "q": "*:*", "rows": 0, "facet": "true", "facet.field": "role",
        "facet.mincount": max(counts.values()) + 1,
    })
    assert resp2["facet_counts"]["facet_fields"]["role"] == []


def test_facet_missing_trailing_null(corpus):
    """facet.missing appends [None, <null-count>] after the buckets and the
    null group never appears as a bucket (Solr SimpleFacets)."""
    df, idx = corpus
    n_null = df.filter(df.tool.isNull()).count()
    resp = solr_select(idx, {
        "q": "*:*", "rows": 0, "facet": "true", "facet.field": "tool",
        "facet.missing": "true",
    })
    flat = resp["facet_counts"]["facet_fields"]["tool"]
    pairs = _pairs(flat)
    assert pairs[-1] == (None, n_null)
    assert all(v is not None for v, _ in pairs[:-1])


def test_facet_params_on_scored_query(corpus):
    """Bucket params shape the SAME DocSet as numFound: limited count-sorted
    buckets of a scored query equal the engine's full facet re-sorted."""
    _, idx = corpus
    full = {
        r["role"]: r["facet_count"]
        for r in idx.facet("error tool", "role").collect()
    }
    want = sorted(full.items(), key=lambda p: (-p[1], str(p[0])))[:1]
    resp = solr_select(idx, {
        "q": "error tool", "rows": 0, "facet": "true",
        "facet.field": "role", "facet.limit": 1,
    })
    assert _pairs(resp["facet_counts"]["facet_fields"]["role"]) == want


def test_per_field_override(corpus):
    """f.<field>.facet.X beats the global facet.X (Solr override rule)."""
    df, idx = corpus
    n_roles = len(_brute_counts(df, "role"))
    resp = solr_select(idx, {
        "q": "*:*", "rows": 0, "facet": "true",
        "facet.field": ["role", "tool"],
        "facet.limit": 1, "f.role.facet.limit": -1,
    })
    ff = resp["facet_counts"]["facet_fields"]
    assert len(_pairs(ff["role"])) == n_roles
    assert len(_pairs(ff["tool"])) == 1


def test_facet_query_counts_docset_intersection(corpus):
    """facet.query counts main-DocSet docs matching the facet query — i.e.
    count_matches with the facet query as one more fq."""
    _, idx = corpus
    fquery = "role:assistant"
    want = idx.count_matches("error tool", fq=[fquery])
    resp = solr_select(idx, {
        "q": "error tool", "rows": 0, "facet": "true",
        "facet.query": fquery,
    })
    assert resp["facet_counts"]["facet_queries"] == {fquery: want}
    # engine-level list form + *:* path
    assert idx.facet_query_count("*:*", fquery) == idx.count_matches(
        "*:*", fq=[fquery]
    )


def test_bad_facet_sort_raises(corpus):
    _, idx = corpus
    with pytest.raises(ValueError, match="facet.sort"):
        solr_select(idx, {
            "q": "*:*", "facet": "true", "facet.field": "role",
            "facet.sort": "alpha",
        })


def test_facet_range_other(corpus):
    """facet.range.other=all adds before/between/after counts relative to
    [start, end) over the same DocSet (nulls count nowhere)."""
    df, idx = corpus
    lo, hi = 1, 4
    resp = solr_select(idx, {
        "q": "*:*", "rows": 0, "facet": "true", "facet.range": "turn_idx",
        "facet.range.start": lo, "facet.range.end": hi,
        "facet.range.gap": 1, "facet.range.other": "all",
    })
    fr = resp["facet_counts"]["facet_ranges"]["turn_idx"]
    n_before = df.filter(df.turn_idx < lo).count()
    n_between = df.filter((df.turn_idx >= lo) & (df.turn_idx < hi)).count()
    n_after = df.filter(df.turn_idx >= hi).count()
    assert (fr["before"], fr["between"], fr["after"]) == (
        n_before, n_between, n_after)
    assert sum(fr["counts"][1::2]) == n_between
    # single-key form + validation
    one = solr_select(idx, {
        "q": "*:*", "rows": 0, "facet": "true", "facet.range": "turn_idx",
        "facet.range.start": lo, "facet.range.end": hi,
        "facet.range.gap": 1, "facet.range.other": "after",
    })["facet_counts"]["facet_ranges"]["turn_idx"]
    assert one["after"] == n_after and "before" not in one
    with pytest.raises(ValueError, match="facet.range.other"):
        solr_select(idx, {
            "q": "*:*", "facet": "true", "facet.range": "turn_idx",
            "facet.range.start": 0, "facet.range.end": 2,
            "facet.range.gap": 1, "facet.range.other": "outside",
        })


def test_facet_contains(corpus):
    """facet.contains / facet.contains.ignoreCase filter buckets by
    substring BEFORE the aggregate (Solr bucket filters)."""
    _, idx = corpus
    base = {r["role"]: r["facet_count"]
            for r in idx.facet("error tool", "role").collect()}
    got = {r["role"]: r["facet_count"]
           for r in idx.facet("error tool", "role", contains="ser").collect()}
    assert got == {k: v for k, v in base.items() if "ser" in k}
    ic = {r["role"]: r["facet_count"]
          for r in idx.facet("error tool", "role", contains="SER",
                             contains_ignore_case=True).collect()}
    assert ic == got
    assert idx.facet("error tool", "role", contains="SER").count() == 0
    resp = solr_select(idx, {
        "q": "error tool", "rows": 0, "facet": "true", "facet.field": "role",
        "facet.contains": "ser",
    })
    flat = resp["facet_counts"]["facet_fields"]["role"]
    assert dict(zip(flat[::2], flat[1::2])) == got


def test_facet_field_key_rename(corpus):
    """facet.field={!key=label}F renames the section without exclusion."""
    from solr_semantic_importer_spark.query.select_api import solr_select

    idx = corpus if not isinstance(corpus, tuple) else corpus[1]
    plain = solr_select(idx, {"q": "error", "rows": 0, "facet": "true",
                              "facet.field": "role"})
    renamed = solr_select(idx, {"q": "error", "rows": 0, "facet": "true",
                                "facet.field": "{!key=who}role"})
    assert renamed["facet_counts"]["facet_fields"]["who"] == \
        plain["facet_counts"]["facet_fields"]["role"]
