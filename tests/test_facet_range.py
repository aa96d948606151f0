"""Solr facet.range: half-open numeric buckets over the match set, the
f.<field>.facet.range.* param convention, and Solr's zero-filled flat
counts array. Verified against brute-force bucket membership computed from
the same match set."""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=50, turns_per_conv=6, seed=55)
    idx_dir = str(tmp_path_factory.mktemp("frange"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="frange", **CFG))
    return df, BM25Index(spark, idx_dir)


def _brute(idx, q, field, lo, hi, gap, fq_sql=None):
    docs = idx.docs()
    if fq_sql:
        docs = docs.filter(fq_sql)
    if q.strip() != "*:*":
        matched = {r["doc_id"] for r in idx.score_matches(q).collect()}
    else:
        matched = None
    want = {}
    for r in docs.select("doc_id", field).collect():
        if matched is not None and r["doc_id"] not in matched:
            continue
        v = float(r[field])
        if not (lo <= v < hi):
            continue
        b = lo + int((v - lo) // gap) * gap
        want[b] = want.get(b, 0) + 1
    return want


def test_facet_range_match_all(corpus):
    _, idx = corpus
    got = {
        float(r["bucket_start"]): int(r["facet_count"])
        for r in idx.facet_range("*:*", "dl", 0, 120, 20).collect()
    }
    assert got == _brute(idx, "*:*", "dl", 0, 120, 20)
    assert got  # non-degenerate corpus


def test_facet_range_scored_query(corpus):
    _, idx = corpus
    got = {
        float(r["bucket_start"]): int(r["facet_count"])
        for r in idx.facet_range("error tool", "turn_idx", 0, 6, 2).collect()
    }
    assert got == _brute(idx, "error tool", "turn_idx", 0, 6, 2)


def test_facet_range_validation(corpus):
    _, idx = corpus
    with pytest.raises(ValueError):
        idx.facet_range("*:*", "dl", 0, 100, 0)
    with pytest.raises(ValueError):
        idx.facet_range("*:*", "dl", 100, 0, 10)


def test_select_facet_range_shape(corpus):
    """Solr response shape: facet_counts.facet_ranges.<field> with a flat
    zero-filled counts array and echoed gap/start/end."""
    _, idx = corpus
    resp = solr_select(idx, {
        "q": "*:*", "rows": 0, "facet": "true", "facet.range": "dl",
        "facet.range.start": 0, "facet.range.end": 120, "facet.range.gap": 20,
    })
    fr = resp["facet_counts"]["facet_ranges"]["dl"]
    assert fr["gap"] == 20 and fr["start"] == 0 and fr["end"] == 120
    flat = fr["counts"]
    assert flat[0::2] == [0, 20, 40, 60, 80, 100]  # every bucket, zeros too
    want = _brute(idx, "*:*", "dl", 0, 120, 20)
    got = dict(zip(flat[0::2], flat[1::2]))
    assert got == {int(k): v for k, v in want.items()} | {
        int(b): 0 for b in range(0, 120, 20) if b not in want
    }
    assert sum(flat[1::2]) <= resp["response"]["numFound"]


def test_select_facet_range_per_field_override(corpus):
    _, idx = corpus
    resp = solr_select(idx, {
        "q": "error", "rows": 0, "facet": "true",
        "facet.range": "turn_idx",
        "facet.range.gap": 99,  # global (overridden)
        "f.turn_idx.facet.range.start": 0,
        "f.turn_idx.facet.range.end": 6,
        "f.turn_idx.facet.range.gap": 3,
    })
    fr = resp["facet_counts"]["facet_ranges"]["turn_idx"]
    assert fr["gap"] == 3 and len(fr["counts"]) == 4
    want = _brute(idx, "error", "turn_idx", 0, 6, 3)
    got = dict(zip(fr["counts"][0::2], fr["counts"][1::2]))
    assert {k: v for k, v in got.items() if v} == {
        int(k): v for k, v in want.items()
    }


def test_select_facet_range_missing_param(corpus):
    _, idx = corpus
    with pytest.raises(ValueError, match="facet.range.gap"):
        solr_select(idx, {
            "q": "*:*", "facet": "true", "facet.range": "dl",
            "facet.range.start": 0, "facet.range.end": 100,
        })


def test_date_range_facet(corpus):
    """facet.range on a timestamp field with a DateMath gap: ISO bucket
    labels, fixed-width units only, brute-force verified."""
    import datetime as dt

    from solr_semantic_importer_spark.query.select_api import solr_select

    _, idx = corpus
    rows = idx.docs().select("doc_id", "ts").collect()
    matched = {r["doc_id"] for r in idx.score_matches("error").collect()}
    ts = sorted(r["ts"] for r in rows if r["doc_id"] in matched)
    lo = ts[0].replace(minute=0, second=0, microsecond=0)
    hi = lo + dt.timedelta(hours=4)
    fmt = "%Y-%m-%dT%H:%M:%SZ"
    resp = solr_select(idx, {
        "q": "error", "rows": 0, "facet": "true", "facet.range": "ts",
        "facet.range.start": lo.strftime(fmt),
        "facet.range.end": hi.strftime(fmt),
        "facet.range.gap": "+1HOUR",
    })
    ent = resp["facet_counts"]["facet_ranges"]["ts"]
    assert ent["gap"] == "+1HOUR" and ent["start"] == lo.strftime(fmt)
    counts = dict(zip(ent["counts"][::2], ent["counts"][1::2]))
    assert len(counts) == 4
    for i in range(4):
        b = lo + dt.timedelta(hours=i)
        want = sum(
            1 for r in rows if r["doc_id"] in matched
            and b <= r["ts"].replace(tzinfo=None) < b + dt.timedelta(hours=1)
        )
        assert counts[b.strftime(fmt)] == want
    with pytest.raises(ValueError):
        solr_select(idx, {
            "q": "error", "rows": 0, "facet": "true", "facet.range": "ts",
            "facet.range.start": lo.strftime(fmt),
            "facet.range.end": hi.strftime(fmt),
            # +1MONTH/+1YEAR are supported since r5; unknown units fail loud
            "facet.range.gap": "+1FORTNIGHT",
        })


def test_omit_header_echo_params(corpus):
    from solr_semantic_importer_spark.query.select_api import solr_select

    _, idx = corpus
    r = solr_select(idx, {"q": "error", "rows": 1, "omitHeader": "true"})
    assert "responseHeader" not in r and r["response"]["docs"]
    r2 = solr_select(idx, {"q": "error", "rows": 1, "echoParams": "none"})
    assert "params" not in r2["responseHeader"]
    with pytest.raises(ValueError):
        solr_select(idx, {"q": "error", "echoParams": "bogus"})


# ------------------------------ facet.range.include / hardend (r5)


def test_facet_range_include_upper(corpus):
    """include=upper: every bucket is (lo, hi] — boundary values drop to
    the bucket below, values equal to start fall out of the range."""
    _, idx = corpus
    rows = [r["dl"] for r in idx.docs().select("dl").collect()
            if r["dl"] is not None]
    resp = solr_select(idx, {
        "q": "*:*", "rows": 0, "facet": "true", "facet.range": "dl",
        "facet.range.start": 0, "facet.range.end": 120,
        "facet.range.gap": 20, "facet.range.include": "upper",
        "facet.range.other": "all",
    })
    fr = resp["facet_counts"]["facet_ranges"]["dl"]
    got = dict(zip(fr["counts"][0::2], fr["counts"][1::2]))
    for i in range(6):
        lo = i * 20
        want = sum(1 for v in rows if lo < v <= lo + 20)
        assert got[lo] == want, (lo, got[lo], want)
    # an exact-boundary value exists in the corpus => upper differs
    # from lower somewhere when any dl is a multiple of 20 inside range
    assert fr["before"] == sum(1 for v in rows if v <= 0)
    assert fr["after"] == sum(1 for v in rows if v > 120)


def test_facet_range_include_upper_vs_lower_boundary(corpus):
    """A synthetic check that the two modes actually differ on boundary
    values present in the corpus (falls back to equality when none)."""
    _, idx = corpus
    rows = [r["dl"] for r in idx.docs().select("dl").collect()
            if r["dl"] is not None]
    boundary_hits = sum(1 for v in rows if v in (20, 40, 60, 80, 100))
    lo_resp = solr_select(idx, {
        "q": "*:*", "rows": 0, "facet": "true", "facet.range": "dl",
        "facet.range.start": 0, "facet.range.end": 120,
        "facet.range.gap": 20,
    })["facet_counts"]["facet_ranges"]["dl"]["counts"][1::2]
    up_resp = solr_select(idx, {
        "q": "*:*", "rows": 0, "facet": "true", "facet.range": "dl",
        "facet.range.start": 0, "facet.range.end": 120,
        "facet.range.gap": 20, "facet.range.include": "upper",
    })["facet_counts"]["facet_ranges"]["dl"]["counts"][1::2]
    if boundary_hits:
        assert lo_resp != up_resp
    else:
        assert lo_resp == up_resp


def test_facet_range_hardend_unaligned(corpus):
    """hardend=true truncates the last bucket at end; the default
    extends it to a whole gap (Solr RangeEndpointCalculator)."""
    _, idx = corpus
    rows = [r["dl"] for r in idx.docs().select("dl").collect()
            if r["dl"] is not None]
    base = {"q": "*:*", "rows": 0, "facet": "true", "facet.range": "dl",
            "facet.range.start": 0, "facet.range.end": 50,
            "facet.range.gap": 20}
    soft = solr_select(idx, base)["facet_counts"]["facet_ranges"]["dl"]
    hard = solr_select(idx, {**base, "facet.range.hardend": "true"})[
        "facet_counts"]["facet_ranges"]["dl"]
    # soft: last bucket [40, 60); hard: [40, 50)
    assert soft["end"] == 60 and hard["end"] == 50
    s_last = dict(zip(soft["counts"][0::2], soft["counts"][1::2]))[40]
    h_last = dict(zip(hard["counts"][0::2], hard["counts"][1::2]))[40]
    assert s_last == sum(1 for v in rows if 40 <= v < 60)
    assert h_last == sum(1 for v in rows if 40 <= v < 50)


def test_facet_range_include_validation(corpus):
    _, idx = corpus
    for inc in ("edge", "outer", "all", ["lower", "upper"]):
        with pytest.raises(ValueError, match="include"):
            solr_select(idx, {
                "q": "*:*", "rows": 0, "facet": "true",
                "facet.range": "dl", "facet.range.start": 0,
                "facet.range.end": 100, "facet.range.gap": 20,
                "facet.range.include": inc,
            })
