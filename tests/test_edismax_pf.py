"""edismax phrase boosting: defType=edismax + pf/pf2/pf3 (ps/ps2/ps3).

Under q.op=OR the phrases append as SHOULD clauses on the boolean scorer;
under q.op=AND / mm they route as rank-only boost queries (bq) so they
never become required clauses or inflate the mm count. The checkable
contracts are the same on every path: the DocSet never moves, and each
doc's score rises by exactly the (boosted) phrase scores of the windows
it matches."""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_export, solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)

Q = "error in tool"


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=30, turns_per_conv=5, seed=41)
    idx_dir = str(tmp_path_factory.mktemp("pf"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="pf", **CFG))
    return BM25Index(spark, idx_dir)


def _scores(resp):
    return {d["doc_id"]: d["score"] for d in resp["response"]["docs"]}


def test_pf_docset_unchanged_scores_boosted(corpus):
    base = solr_select(corpus, {"q": Q, "rows": 200, "fl": "doc_id,score"})
    pf = solr_select(corpus, {
        "q": Q, "rows": 200, "fl": "doc_id,score",
        "defType": "edismax", "pf": "_text_^2", "ps": "1",
    })
    assert pf["response"]["numFound"] == base["response"]["numFound"]
    assert set(_scores(pf)) == set(_scores(base))
    ph = {r["doc_id"]: r["score"]
          for r in corpus.phrase_matches(Q, slop=1).collect()}
    b, p = _scores(base), _scores(pf)
    for doc, s in p.items():
        assert s == pytest.approx(b[doc] + 2.0 * ph.get(doc, 0.0), rel=1e-9)
    # at least one doc actually got the phrase boost, or the test is vacuous
    assert any(doc in ph for doc in p)


def test_pf2_bigram_windows(corpus):
    base = solr_select(corpus, {"q": Q, "rows": 200, "fl": "doc_id,score"})
    pf2 = solr_select(corpus, {
        "q": Q, "rows": 200, "fl": "doc_id,score",
        "defType": "edismax", "pf2": "text",
    })
    ph1 = {r["doc_id"]: r["score"]
           for r in corpus.phrase_matches("error in").collect()}
    ph2 = {r["doc_id"]: r["score"]
           for r in corpus.phrase_matches("in tool").collect()}
    b, p = _scores(base), _scores(pf2)
    for doc, s in p.items():
        want = b[doc] + ph1.get(doc, 0.0) + ph2.get(doc, 0.0)
        assert s == pytest.approx(want, rel=1e-9)
    assert any(doc in ph1 or doc in ph2 for doc in p)


def test_pf_ranking_moves_phrase_docs_up(corpus):
    pf = solr_select(corpus, {
        "q": Q, "rows": 5, "fl": "doc_id,score",
        "defType": "edismax", "pf": "_text_^10", "ps": "2",
    })
    ph = {r["doc_id"] for r in corpus.phrase_matches(Q, slop=2).collect()}
    if ph:  # with a 10x boost every phrase-matching doc outranks the rest
        top = [d["doc_id"] for d in pf["response"]["docs"]]
        assert set(top[:min(len(ph), 5)]) <= ph


def test_pf_with_and_docset_unchanged(corpus):
    """q.op=AND + pf: the phrases must NOT become required clauses —
    numFound and the match set equal the un-boosted AND query's, and each
    doc's score gains exactly the boosted phrase scores (bq routing)."""
    base = solr_select(corpus, {
        "q": Q, "q.op": "AND", "rows": 200, "fl": "doc_id,score",
    })
    pf = solr_select(corpus, {
        "q": Q, "q.op": "AND", "rows": 200, "fl": "doc_id,score",
        "defType": "edismax", "pf": "_text_^2", "ps": "1",
    })
    assert pf["response"]["numFound"] == base["response"]["numFound"]
    assert set(_scores(pf)) == set(_scores(base))
    ph = {r["doc_id"]: r["score"]
          for r in corpus.phrase_matches(Q, slop=1).collect()}
    b, p = _scores(base), _scores(pf)
    for doc, s in p.items():
        assert s == pytest.approx(b[doc] + 2.0 * ph.get(doc, 0.0), rel=1e-9)
    # the AND match set must include a phrase doc or the boost is vacuous
    assert any(doc in ph for doc in p)


def test_pf_with_mm_docset_unchanged(corpus):
    """mm + pf: the phrase clauses must not count toward mm's clause
    total — numFound equals the un-boosted mm query's."""
    base = solr_select(corpus, {
        "q": Q, "mm": 2, "rows": 200, "fl": "doc_id,score",
    })
    pf = solr_select(corpus, {
        "q": Q, "mm": 2, "rows": 200, "fl": "doc_id,score",
        "defType": "edismax", "pf2": "_text_^3",
    })
    assert pf["response"]["numFound"] == base["response"]["numFound"]
    assert set(_scores(pf)) == set(_scores(base))
    ph1 = {r["doc_id"]: r["score"]
           for r in corpus.phrase_matches("error in").collect()}
    ph2 = {r["doc_id"]: r["score"]
           for r in corpus.phrase_matches("in tool").collect()}
    b, p = _scores(base), _scores(pf)
    for doc, s in p.items():
        want = b[doc] + 3.0 * (ph1.get(doc, 0.0) + ph2.get(doc, 0.0))
        assert s == pytest.approx(want, rel=1e-9)


def test_pf_and_facet_counts_match_unboosted(corpus):
    """facets under pf+AND count the exact AND DocSet (the facet path
    runs on the phrase-free q_main)."""
    base = solr_select(corpus, {
        "q": Q, "q.op": "AND", "rows": 0,
        "facet": "true", "facet.field": "role",
    })
    pf = solr_select(corpus, {
        "q": Q, "q.op": "AND", "rows": 0,
        "facet": "true", "facet.field": "role",
        "defType": "edismax", "pf": "_text_^2",
    })
    assert (pf["facet_counts"]["facet_fields"]["role"]
            == base["facet_counts"]["facet_fields"]["role"])


def test_export_pf_with_and(corpus):
    out = solr_export(corpus, {
        "q": Q, "q.op": "AND", "defType": "edismax", "pf": "_text_^2",
        "ps": "1", "fl": ["doc_id", "score"],
    }).collect()
    ph = {r["doc_id"]: r["score"]
          for r in corpus.phrase_matches(Q, slop=1).collect()}
    base = {r["doc_id"]: r["score"]
            for r in corpus.score_matches(Q, op="AND").collect()}
    got = {r["doc_id"]: r["score"] for r in out}
    assert got.keys() == base.keys()
    for doc, s in got.items():
        assert s == pytest.approx(base[doc] + 2.0 * ph.get(doc, 0.0),
                                  rel=1e-9)


def test_pf_and_requires_relevance_sort(corpus):
    with pytest.raises(ValueError, match="pf with q.op=AND, mm"):
        solr_select(corpus, {
            "q": Q, "q.op": "AND", "defType": "edismax", "pf": "_text_",
            "sort": "ts asc",
        })
    with pytest.raises(ValueError, match="does not support cursorMark"):
        solr_select(corpus, {
            "q": Q, "mm": 2, "defType": "edismax", "pf": "_text_",
            "cursorMark": "*",
        })


def test_pf_cursor_walk_rank_identical(corpus):
    """pf under the default OR rides the q string, so cursorMark deep
    paging stays supported: the cursor walk reproduces the one-page
    boosted ranking exactly."""
    full = solr_select(corpus, {
        "q": Q, "rows": 200, "fl": "doc_id,score",
        "defType": "edismax", "pf": "_text_^2", "ps": "1",
    })
    want = [(d["doc_id"], round(d["score"], 6))
            for d in full["response"]["docs"]]
    got, mark = [], "*"
    while True:
        r = solr_select(corpus, {
            "q": Q, "rows": 7, "fl": "doc_id,score",
            "defType": "edismax", "pf": "_text_^2", "ps": "1",
            "cursorMark": mark,
        })
        got += [(d["doc_id"], round(d["score"], 6))
                for d in r["response"]["docs"]]
        if r["nextCursorMark"] == mark or not r["response"]["docs"]:
            break
        mark = r["nextCursorMark"]
    assert got == want


def test_pf_match_all_noop(corpus):
    r = solr_select(corpus, {
        "q": "*:*", "rows": 3, "defType": "edismax", "pf": "_text_",
    })
    assert r["response"]["numFound"] == corpus.docs().count()


def test_export_supports_pf(corpus):
    out = solr_export(corpus, {
        "q": Q, "defType": "edismax", "pf": "_text_^2", "ps": "1",
        "fl": ["doc_id", "score"],
    }).collect()
    ph = {r["doc_id"]: r["score"]
          for r in corpus.phrase_matches(Q, slop=1).collect()}
    base = {r["doc_id"]: r["score"]
            for r in corpus.score_matches(Q).collect()}
    got = {r["doc_id"]: r["score"] for r in out}
    assert got.keys() == base.keys()
    for doc, s in got.items():
        assert s == pytest.approx(base[doc] + 2.0 * ph.get(doc, 0.0),
                                  rel=1e-9)


def test_pf_fail_loud(corpus):
    cases = [
        ({"q": Q, "pf": "_text_"}, "require defType=edismax"),
        ({"q": Q, "defType": "dismax"}, "unsupported defType"),
        ({"q": Q, "defType": "edismax", "ps": "2"}, "ps requires pf"),
        ({"q": Q, "defType": "edismax", "pf": "_text_ title"},
         "exactly one field"),
        ({"q": Q, "defType": "edismax", "pf": "title"}, "catch-all"),
        ({"q": 'error "in tool"', "defType": "edismax", "pf": "_text_"},
         "plain term query"),
        ({"q": Q, "defType": "edismax", "pf": "_text_",
          "group": "true", "group.field": "conv_id"},
         "group=true does not support pf"),
    ]
    for params, msg in cases:
        with pytest.raises(ValueError, match=msg):
            solr_select(corpus, {"rows": 1, **params})
