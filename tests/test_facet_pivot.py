"""facet.pivot: hierarchical facet trees vs a brute-force recompute over
the collected match set (Solr pivot semantics: count desc / value asc per
level, limit per parent, mincount per level, nulls never bucket)."""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=6, seed=7)
    idx_dir = str(tmp_path_factory.mktemp("pivot"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="pivot", **CFG))
    return BM25Index(spark, idx_dir)


def _brute_pivot(rows, fields, limit=100, mincount=1):
    """Reference pivot: recursive group/sort/cut over plain dicts."""
    if not fields:
        return []
    f = fields[0]
    groups: dict = {}
    for r in rows:
        if r[f] is None:
            continue
        groups.setdefault(r[f], []).append(r)
    ents = [
        {"field": f, "value": v, "count": len(g), "_rows": g}
        for v, g in groups.items()
        if len(g) >= mincount
    ]
    ents.sort(key=lambda e: (-e["count"], e["value"]))
    if limit >= 0:
        ents = ents[:limit]
    for e in ents:
        sub = _brute_pivot(e.pop("_rows"), fields[1:], limit, mincount)
        if sub:
            e["pivot"] = sub
    return ents


def _match_rows(idx, q, fq=None, op="OR"):
    if q.strip() == "*:*":
        ids = None
    else:
        ids = {r["doc_id"] for r in
               idx.score_matches(q, op=op, fq=fq).collect()}
    out = []
    for r in idx.docs().collect():
        if ids is None or r["doc_id"] in ids:
            out.append(r.asDict())
    return out


@pytest.mark.parametrize("q,fields,kw", [
    ("error", ["role", "turn_idx"], {}),
    ("error tool", ["role", "tool"], {}),          # tool has nulls
    ("*:*", ["role", "turn_idx", "tool"], {}),     # 3 levels, match-all
    ("error", ["role", "turn_idx"], dict(limit=2)),
    ("error", ["turn_idx", "role"], dict(mincount=3)),
])
def test_pivot_vs_brute(corpus, q, fields, kw):
    idx = corpus
    got = idx.pivot_facet(q, fields, **kw)
    rows = _match_rows(idx, q)
    if q != "*:*":
        pass
    want = _brute_pivot(rows, fields, **{"limit": 100, "mincount": 1, **kw})
    assert got == want


def test_pivot_respects_fq_and_op(corpus):
    idx = corpus
    got = idx.pivot_facet("error tool", ["role", "turn_idx"],
                          fq="turn_idx >= 2", op="AND")
    matched = {r["doc_id"] for r in
               idx.score_matches("error tool", op="AND",
                                 fq="turn_idx >= 2").collect()}
    rows = [r.asDict() for r in idx.docs().collect()
            if r["doc_id"] in matched]
    assert got == _brute_pivot(rows, ["role", "turn_idx"])
    # pivot total at level 1 == numFound of the same request
    assert sum(e["count"] for e in got) == idx.count_matches(
        "error tool", op="AND", fq="turn_idx >= 2"
    )


def test_pivot_via_select(corpus):
    idx = corpus
    resp = solr_select(idx, {
        "q": "error", "rows": 0, "facet": "true",
        "facet.pivot": "role,turn_idx",
    })
    fp = resp["facet_counts"]["facet_pivot"]
    assert list(fp) == ["role,turn_idx"]
    want = _brute_pivot(_match_rows(idx, "error"), ["role", "turn_idx"])
    assert fp["role,turn_idx"] == want


def test_pivot_empty_and_errors(corpus):
    idx = corpus
    assert idx.pivot_facet("zzzznope", ["role"]) == []
    with pytest.raises(ValueError):
        idx.pivot_facet("error", [])
