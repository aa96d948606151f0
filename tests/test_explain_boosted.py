"""debugQuery / fl=[explain] under bf/bq/boost: the breakdown comes from
the SAME Spark pipeline the ranking ran (engine.explain_boosted), so
``base*boost + sum(bf) + sum(bq)`` equals the response score bit-exactly
(no epsilon in these asserts)."""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=50, turns_per_conv=6, seed=11)
    idx_dir = str(tmp_path_factory.mktemp("explain_boosted"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="expb", **CFG))
    return df, BM25Index(spark, idx_dir)


def _fold(c):
    """Recompose the total exactly as the pipeline folds it."""
    v = c["base"]
    if "boost" in c:
        v = v * c["boost"]
    for x in c["bf"]:
        v = v + x
    for x in c["bq"]:
        v = v + x
    return v


def test_bf_components_sum_exactly(corpus):
    _, idx = corpus
    top = idx.search_boosted("error tool", k=5, bf="log(sum(turn_idx,1))",
                             with_stored=False).collect()
    ids = [r["doc_id"] for r in top]
    comps = {c["doc_id"]: c for c in
             idx.explain_boosted("error tool", ids, bf="log(sum(turn_idx,1))")}
    assert set(comps) == set(ids)
    for r in top:
        c = comps[r["doc_id"]]
        assert _fold(c) == r["score"]
        assert len(c["bf"]) == 1 and c["bq"] == [] and "boost" not in c


def test_boost_multiplies_base_exactly(corpus):
    _, idx = corpus
    top = idx.search_boosted("error", k=5,
                             boost="recip(turn_idx,1,2,1)").collect()
    ids = [r["doc_id"] for r in top]
    # score_matches is the boosted pipeline's base (WAND's kernel can
    # differ in the last ulp, so compare against the exhaustive scorer)
    plain = {r["doc_id"]: r["score"]
             for r in idx.score_matches("error").collect()}
    for c in idx.explain_boosted("error", ids, boost="recip(turn_idx,1,2,1)"):
        assert c["base"] == plain[c["doc_id"]]
        assert c["base"] * c["boost"] == c["score"]


def test_bq_adds_zero_outside_match(corpus):
    _, idx = corpus
    top = idx.search_boosted("tool", k=8, bq="error").collect()
    ids = [r["doc_id"] for r in top]
    bq_scores = {r["doc_id"]: r["score"]
                 for r in idx.score_matches("error").collect()}
    for c in idx.explain_boosted("tool", ids, bq="error"):
        assert len(c["bq"]) == 1
        assert c["bq"][0] == bq_scores.get(c["doc_id"], 0.0)
        assert _fold(c) == c["score"]


def test_combined_with_fq_and_op(corpus):
    _, idx = corpus
    kw = dict(bf=["sum(turn_idx,0)"], boost="recip(turn_idx,1,2,1)",
              bq=["tool"], op="AND", fq="role:assistant")
    top = idx.search_boosted("error the", k=5, **kw).collect()
    assert top
    ids = [r["doc_id"] for r in top]
    comps = {c["doc_id"]: c for c in
             idx.explain_boosted("error the", ids, **kw)}
    for r in top:
        assert _fold(comps[r["doc_id"]]) == r["score"]


def test_match_all_boost_base_is_one(corpus):
    _, idx = corpus
    top = idx.search_boosted("*:*", k=5, boost="sum(turn_idx,1)").collect()
    ids = [r["doc_id"] for r in top]
    for c in idx.explain_boosted("*:*", ids, boost="sum(turn_idx,1)"):
        assert c["base"] == 1.0
        assert c["base"] * c["boost"] == c["score"]


def test_select_debugQuery_with_bf(corpus):
    _, idx = corpus
    resp = solr_select(idx, {"q": "error tool", "rows": 4,
                             "bf": "log(sum(turn_idx,1))",
                             "debugQuery": "true"})
    docs = resp["response"]["docs"]
    assert docs
    for d in docs:
        e = resp["debug"]["explain"][str(d["doc_id"])]
        comp = e["components"]
        v = comp["base"]
        for x in comp["bf"]:
            v = v + x
        for x in comp["bq"]:
            v = v + x
        assert v == e["score"]
        # per-term lexical detail nests under base for a flat term q
        assert e["details"] and all("contribution" in t for t in e["details"])
        assert sum(t["contribution"] for t in e["details"]) == pytest.approx(
            comp["base"], abs=1e-9)


def test_select_fl_explain_text_with_boost(corpus):
    _, idx = corpus
    resp = solr_select(idx, {"q": "error", "rows": 3,
                             "boost": "recip(turn_idx,1,2,1)",
                             "fl": "doc_id,score,[explain]"})
    for d in resp["response"]["docs"]:
        text = d["[explain]"]
        assert text.startswith(f"{d['score']} = sum of:")
        assert "FunctionQuery(recip(turn_idx,1,2,1))" in text
        assert "product of:" in text


def test_select_debugQuery_matchall_boost(corpus):
    _, idx = corpus
    resp = solr_select(idx, {"q": "*:*", "rows": 3,
                             "boost": "sum(turn_idx,1)",
                             "debugQuery": "true"})
    for d in resp["response"]["docs"]:
        e = resp["debug"]["explain"][str(d["doc_id"])]
        assert e["components"]["base"] == 1.0
        assert "details" not in e  # *:* has no per-term decomposition


def test_pf_under_mm_explains_as_bq(corpus):
    _, idx = corpus
    params = {"q": "error tool", "defType": "edismax", "mm": 1,
              "pf": "_text_", "rows": 4, "debugQuery": "true"}
    resp = solr_select(idx, params)
    assert resp["response"]["docs"]
    for d in resp["response"]["docs"]:
        e = resp["debug"]["explain"][str(d["doc_id"])]
        comp = e["components"]
        assert len(comp["bq"]) == 1  # the pf phrase rides the bq machinery
        v = comp["base"]
        for x in comp["bf"]:
            v = v + x
        for x in comp["bq"]:
            v = v + x
        assert v == e["score"]


def test_rerank_components_sum_exactly(corpus):
    _, idx = corpus
    resp = solr_select(idx, {
        "q": "error", "rows": 5, "debugQuery": "true",
        "fl": "doc_id,score",
        "rq": "{!rerank reRankQuery=$rqq reRankDocs=3 reRankWeight=2.5}",
        "rqq": "tool",
    })
    docs = resp["response"]["docs"]
    assert docs
    saw_window = saw_tail = False
    for d in docs:
        e = resp["debug"]["explain"][str(d["doc_id"])]
        assert e["components"]["base"] + e["components"]["rerank"] \
            == e["score"] == d["score"]
        if e["inRerankWindow"]:
            saw_window = True
        else:
            saw_tail = True
            assert e["components"]["rerank"] == 0.0
    assert saw_window and saw_tail  # reRankDocs=3 < rows=5 splits the page


def test_rerank_fl_explain_text(corpus):
    _, idx = corpus
    resp = solr_select(idx, {
        "q": "error", "rows": 3, "fl": "doc_id,score,[explain]",
        "rq": "{!rerank reRankQuery=$rqq reRankDocs=10}", "rqq": "tool",
    })
    for d in resp["response"]["docs"]:
        text = d["[explain]"]
        assert text.startswith(f"{d['score']} = sum of:")
        assert "reRankQuery(tool)" in text


def test_pf_in_q_explain_folds_bit_exactly(corpus):
    """r5: the last explain fail-loud closed — pf under plain q.op=OR
    (previously appended to q, undecomposable) routes as a bq component
    when an explain is requested, so the breakdown sums to the response
    score bit-exactly."""
    _, idx = corpus
    params = {"q": "error tool", "defType": "edismax", "pf": "_text_",
              "rows": 4, "fl": "doc_id,score", "debugQuery": "true"}
    resp = solr_select(idx, params)
    assert resp["response"]["docs"]
    saw_phrase = False
    for d in resp["response"]["docs"]:
        e = resp["debug"]["explain"][str(d["doc_id"])]
        comp = e["components"]
        assert len(comp["bq"]) == 1  # the pf phrase rides the bq machinery
        saw_phrase = saw_phrase or comp["bq"][0] != 0.0
        v = comp["base"]
        for x in comp["bf"]:
            v = v + x
        for x in comp["bq"]:
            v = v + x
        assert v == e["score"] == d["score"]
    assert saw_phrase  # the corpus must exercise a phrase match


def test_pf_in_q_fl_explain_text(corpus):
    _, idx = corpus
    resp = solr_select(idx, {"q": "error tool", "defType": "edismax",
                             "pf": "_text_", "rows": 3,
                             "fl": "doc_id,score,[explain]"})
    for d in resp["response"]["docs"]:
        assert d["[explain]"].startswith(f"{d['score']} = sum of:")


def test_pf_in_q_explain_docset_matches_plain_path(corpus):
    """The explain route (pf as bq) and the plain route (pf appended to
    q) must agree on the DocSet and numFound — pf is rank-only."""
    _, idx = corpus
    base = {"q": "error tool", "defType": "edismax", "pf": "_text_",
            "rows": 10, "fl": "doc_id,score"}
    plain = solr_select(idx, base)
    dbg = solr_select(idx, {**base, "debugQuery": "true"})
    assert plain["response"]["numFound"] == dbg["response"]["numFound"]
    assert {d["doc_id"] for d in plain["response"]["docs"]} == \
        {d["doc_id"] for d in dbg["response"]["docs"]}
    for a, b in zip(plain["response"]["docs"], dbg["response"]["docs"]):
        assert a["score"] == pytest.approx(b["score"], rel=1e-9)
