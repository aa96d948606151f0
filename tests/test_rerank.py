"""ReRank qparser (rq={!rerank ...}) vs brute-force rescoring."""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=6, seed=37)
    idx_dir = str(tmp_path_factory.mktemp("rr"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="rr", **CFG))
    return BM25Index(spark, idx_dir)


def _brute_rerank(idx, q, rqq, n, w, k):
    main = {r["doc_id"]: r["score"] for r in idx.score_matches(q).collect()}
    rr = {r["doc_id"]: r["score"] for r in idx.score_matches(rqq).collect()}
    ranked = sorted(main.items(), key=lambda t: (-round(t[1], 6), t[0]))
    win = [(d, s + w * rr.get(d, 0.0)) for d, s in ranked[:n]]
    win.sort(key=lambda t: (-round(t[1], 6), t[0]))
    return (win + ranked[n:])[:k]


@pytest.mark.parametrize("n,w", [(20, 2.0), (5, 10.0), (3, 0.5)])
def test_rerank_vs_brute(corpus, n, w):
    idx = corpus
    q, rqq = "error tool", "merge window"
    got = idx.search_reranked(q, rqq, k=10, rerank_docs=n,
                              rerank_weight=w).collect()
    want = _brute_rerank(idx, q, rqq, n, w, 10)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_rerank_via_select(corpus):
    idx = corpus
    resp = solr_select(idx, {
        "q": "error tool", "rows": 6,
        "rq": "{!rerank reRankQuery=$rqq reRankDocs=8 reRankWeight=3}",
        "rqq": "merge window",
        "fl": "doc_id,score",
    })
    want = _brute_rerank(idx, "error tool", "merge window", 8, 3.0, 6)
    assert [d["doc_id"] for d in resp["response"]["docs"]] == \
           [d for d, _ in want]
    # numFound unchanged (rerank never changes the match set)
    assert resp["response"]["numFound"] == idx.count_matches("error tool")
    with pytest.raises(ValueError):
        solr_select(idx, {"q": "error", "rq": "{!rerank reRankDocs=5}"})
    with pytest.raises(ValueError):
        solr_select(idx, {"q": "error",
                          "rq": "{!rerank reRankQuery=$missing}"})
    with pytest.raises(ValueError):
        solr_select(idx, {"q": "error", "rq": "{!rerank reRankQuery=x}",
                          "sort": "turn_idx asc"})
