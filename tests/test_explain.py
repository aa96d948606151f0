"""Solr debugQuery explain analog: per-(doc, term) BM25 breakdown whose
contributions sum EXACTLY (same float math as the kernels) to the doc's
search() score, including boosts."""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=50, turns_per_conv=6, seed=7)
    idx_dir = str(tmp_path_factory.mktemp("explain"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="explain", **CFG))
    return df, BM25Index(spark, idx_dir)


def test_explain_sums_to_search_score(corpus):
    _, idx = corpus
    q = "error tool the"
    top = idx.search(q, k=5, use_cache=False).collect()
    ids = [r["doc_id"] for r in top]
    exp = idx.explain(q, ids).collect()
    sums: dict[int, float] = {}
    for r in exp:
        sums[r["doc_id"]] = sums.get(r["doc_id"], 0.0) + r["contribution"]
    for r in top:
        assert abs(sums[r["doc_id"]] - r["score"]) < 1e-9


def test_explain_boost_scales_weight(corpus):
    _, idx = corpus
    top = idx.search("error^2 tool", k=3, use_cache=False).collect()
    ids = [r["doc_id"] for r in top]
    plain = {
        (r["doc_id"], r["term"]): r["weight"]
        for r in idx.explain("error tool", ids).collect()
    }
    boosted = {
        (r["doc_id"], r["term"]): r["weight"]
        for r in idx.explain("error^2 tool", ids).collect()
    }
    assert plain and set(plain) == set(boosted)
    for (d, t), w in plain.items():
        factor = 2.0 if t == "error" else 1.0
        assert abs(boosted[(d, t)] - factor * w) < 1e-12


def test_explain_only_requested_docs_and_terms(corpus):
    _, idx = corpus
    rows = idx.explain("error", [0, 1, 2]).collect()
    assert {r["doc_id"] for r in rows} <= {0, 1, 2}
    assert all(r["term"] == "error" for r in rows)
    assert idx.explain("error", []).count() == 0
    assert idx.explain("zzzneveraterm", [0]).count() == 0


def test_select_debug_query(corpus):
    _, idx = corpus
    resp = solr_select(idx, {
        "q": "error tool", "rows": 3, "fl": "doc_id,score",
        "debugQuery": "true",
    })
    dbg = resp["debug"]["explain"]
    assert len(dbg) == len(resp["response"]["docs"])
    for d in resp["response"]["docs"]:
        e = dbg[str(d["doc_id"])]
        assert abs(e["score"] - d["score"]) < 1e-9
        assert {x["term"] for x in e["details"]} <= {"error", "tool"}


def test_fl_explain_transformer(corpus):
    from solr_semantic_importer_spark.query.select_api import solr_select

    idx = corpus if not isinstance(corpus, tuple) else corpus[1]
    resp = solr_select(idx, {
        "q": "error tool", "rows": 3, "fl": "doc_id,score,[explain]",
    })
    for d in resp["response"]["docs"]:
        text = d["[explain]"]
        assert text.endswith("sum of:") or "sum of:" in text
        # the explain total reproduces the doc's reported score exactly
        total = float(text.split(" = sum of:")[0])
        assert total == pytest.approx(d["score"], rel=1e-12)
    with pytest.raises(ValueError):
        solr_select(idx, {"q": "*:*", "fl": "doc_id,[explain]"})


def test_explain_composes_with_pf_in_q(corpus):
    """r5: the pf-in-q fail-loud is CLOSED — when an explain is
    requested, pf phrases route as bq components even under plain
    q.op=OR, and the breakdown folds bit-exactly (full coverage in
    tests/test_explain_boosted.py::test_pf_in_q_explain_folds_bit_exactly)."""
    idx = corpus if not isinstance(corpus, tuple) else corpus[1]
    resp = solr_select(idx, {
        "q": "error tool", "rows": 2, "fl": "doc_id,score",
        "debugQuery": "true", "defType": "edismax", "pf": "_text_",
    })
    for d in resp["response"]["docs"]:
        e = resp["debug"]["explain"][str(d["doc_id"])]
        comp = e["components"]
        v = comp["base"]
        for x in comp["bf"]:
            v = v + x
        for x in comp["bq"]:
            v = v + x
        assert v == e["score"] == d["score"]
