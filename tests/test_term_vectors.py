"""TermVectorComponent: per-doc term vectors (tf, positions, df, tf-idf)
vs brute-force recomputation with the same analysis chain."""

import pytest

from solr_semantic_importer_spark.functions.analysis import analyze_text
from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=30, turns_per_conv=5, seed=21)
    idx_dir = str(tmp_path_factory.mktemp("tv"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="tv", **CFG))
    return BM25Index(spark, idx_dir)


def test_term_vectors_vs_brute(corpus):
    idx = corpus
    texts = {r["doc_id"]: r["text"] for r in
             idx.docs().select("doc_id", "text").limit(200).collect()}
    ids = sorted(texts)[:5]
    got = idx.term_vectors(ids, with_positions=True, with_df=True,
                           with_tf_idf=True)
    assert sorted(got) == ids
    # df over the whole corpus, from the raw texts
    alltexts = {r["doc_id"]: r["text"] for r in
                idx.docs().select("doc_id", "text").collect()}
    df_map: dict = {}
    for t in alltexts.values():
        for term in set(analyze_text(t or "")):
            df_map[term] = df_map.get(term, 0) + 1
    for i in ids:
        toks = analyze_text(texts[i] or "")
        want_tf: dict = {}
        want_pos: dict = {}
        for p, t in enumerate(toks):
            want_tf[t] = want_tf.get(t, 0) + 1
            want_pos.setdefault(t, []).append(p)
        assert {t: e["tf"] for t, e in got[i].items()} == want_tf
        for t, e in got[i].items():
            assert e["positions"] == want_pos[t]
            assert e["df"] == df_map[t]
            assert e["tf-idf"] == pytest.approx(e["tf"] / df_map[t])


def test_tv_via_select(corpus):
    idx = corpus
    resp = solr_select(idx, {
        "q": "error tool", "rows": 3, "tv": "true", "tv.df": "true",
        "fl": "doc_id",
    })
    page = [d["doc_id"] for d in resp["response"]["docs"]]
    tvs = resp["termVectors"]
    assert sorted(tvs) == sorted(str(i) for i in page)
    for i in page:
        ent = tvs[str(i)]["text"]
        assert all("tf" in e and "df" in e for e in ent.values())
        assert all("positions" not in e for e in ent.values())


def test_tv_empty(corpus):
    idx = corpus
    assert idx.term_vectors([]) == {}
