"""Solr /select facade (query/select_api.py): param surface and response
shape parity with the JSON the reference consumes (solr9_response.json —
responseHeader / response.numFound / numFoundExact / docs), and the
importer's pagination loop (HttpSolrSelectClientImpl createSolrRequest:
q=*:* + one fq per filter + start/rows)."""

import json

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import select_pages, solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)

REF_SHAPE = "/root/reference/src/test/resources/solr9_response.json"


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=50, turns_per_conv=6, seed=31)
    idx_dir = str(tmp_path_factory.mktemp("sel"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="sel", **CFG))
    return df, BM25Index(spark, idx_dir)


def test_match_all_shape_and_importer_params(corpus):
    """The exact request the importer sends: q=*:* + fq filters + paging."""
    _, idx = corpus
    resp = solr_select(idx, {
        "q": "*:*", "fq": ["role:user", "-tool:*"], "start": 0, "rows": 5,
    })
    # response shape == the reference's consumed shape (solr9_response.json)
    with open(REF_SHAPE) as f:
        ref = json.load(f)
    assert set(ref) <= set(resp)
    assert {"numFound", "start", "numFoundExact", "docs"} <= set(resp["response"])
    assert set(ref["responseHeader"]) - {"zkConnected"} <= set(resp["responseHeader"])
    n_user = idx.docs().filter("role = 'user' AND tool IS NULL").count()
    assert resp["response"]["numFound"] == n_user
    assert len(resp["response"]["docs"]) == 5
    for d in resp["response"]["docs"]:
        assert d["role"] == "user" and d["tool"] is None
        assert "score" not in d  # fl absent -> Solr omits score
    # JSON-serializable end to end
    json.dumps(resp, default=str)


def test_scored_query_fl_and_score(corpus):
    _, idx = corpus
    resp = solr_select(idx, {
        "q": "error in tool", "rows": 5, "fl": "conv_id,turn_idx,score",
    })
    docs = resp["response"]["docs"]
    assert docs
    # fl projection + requested score
    assert set(docs[0]) == {"doc_id", "conv_id", "turn_idx", "score"}
    scores = [d["score"] for d in docs]
    assert scores == sorted(scores, reverse=True)
    assert resp["response"]["numFound"] >= len(docs)
    # numFound equals the engine's distinct match count
    assert resp["response"]["numFound"] == idx.count_matches("error in tool")


def test_q_op_and_numfound(corpus):
    _, idx = corpus
    n_or = solr_select(idx, {"q": "error tool", "rows": 0})["response"]["numFound"]
    n_and = solr_select(idx, {"q": "error tool", "rows": 0, "q.op": "AND"})[
        "response"]["numFound"]
    assert 0 < n_and < n_or


def test_paging_consistency(corpus):
    _, idx = corpus
    p1 = solr_select(idx, {"q": "error in tool", "rows": 3, "fl": "score"})
    p2 = solr_select(idx, {"q": "error in tool", "start": 3, "rows": 3,
                           "fl": "score"})
    ids1 = [d["doc_id"] for d in p1["response"]["docs"]]
    ids2 = [d["doc_id"] for d in p2["response"]["docs"]]
    assert not set(ids1) & set(ids2)
    whole = solr_select(idx, {"q": "error in tool", "rows": 6, "fl": "score"})
    assert [d["doc_id"] for d in whole["response"]["docs"]] == ids1 + ids2


def test_facet_flat_arrays(corpus):
    _, idx = corpus
    resp = solr_select(idx, {
        "q": "*:*", "rows": 0, "facet": "true", "facet.field": "role",
    })
    flat = resp["facet_counts"]["facet_fields"]["role"]
    assert len(flat) % 2 == 0
    pairs = dict(zip(flat[::2], flat[1::2]))
    want = {r["role"]: r["count"]
            for r in idx.docs().groupBy("role").count().collect()}
    assert pairs == want
    counts = flat[1::2]
    assert counts == sorted(counts, reverse=True)  # Solr facet.sort=count


def test_highlight_and_spellcheck_sections(corpus):
    _, idx = corpus
    resp = solr_select(idx, {"q": "error in tool", "rows": 3, "hl": "true"})
    hl = resp["highlighting"]
    assert set(hl) == {str(d["doc_id"]) for d in resp["response"]["docs"]}
    assert all(isinstance(v["text"], list) for v in hl.values())

    sp = solr_select(idx, {
        "q": "*:*", "rows": 0, "spellcheck": "true", "spellcheck.q": "topix42",
    })["spellcheck"]
    assert not sp["correctlySpelled"]
    # without spellcheck.extendedResults the suggestion list is plain words
    words = sp["suggestions"][1]["suggestion"]
    assert "topic42" in words and all(isinstance(w, str) for w in words)


def test_field_sort_match_all(corpus):
    _, idx = corpus
    resp = solr_select(idx, {
        "q": "*:*", "rows": 8, "sort": "turn_idx desc", "fl": "turn_idx",
    })
    vals = [d["turn_idx"] for d in resp["response"]["docs"]]
    assert vals == sorted(vals, reverse=True)
    assert vals[0] == 5  # turns_per_conv=6 -> max turn_idx 5


def test_field_sort_scored_query(corpus):
    """Solr field sort over a scored query orders the full MATCH SET by
    the field; scores still come back when fl requests them."""
    _, idx = corpus
    resp = solr_select(idx, {
        "q": "error in tool", "rows": 6, "sort": "turn_idx asc",
        "fl": "turn_idx,score",
    })
    docs = resp["response"]["docs"]
    assert docs
    vals = [d["turn_idx"] for d in docs]
    assert vals == sorted(vals)
    assert all(d["score"] is not None for d in docs)
    # same docs as the score-sorted surface, just reordered: page through
    # the whole match set and compare id sets
    n = resp["response"]["numFound"]
    whole = solr_select(idx, {
        "q": "error in tool", "rows": n, "sort": "turn_idx asc", "fl": "score",
    })
    by_score = solr_select(idx, {"q": "error in tool", "rows": n, "fl": "score"})
    assert ({d["doc_id"] for d in whole["response"]["docs"]}
            == {d["doc_id"] for d in by_score["response"]["docs"]})


def test_unknown_param_rejected(corpus):
    _, idx = corpus
    with pytest.raises(ValueError):
        solr_select(idx, {"q": "*:*", "group": "true"})


def test_solr_get_rtg(corpus, spark, tmp_path_factory):
    from solr_semantic_importer_spark.query.select_api import solr_get

    _, idx = corpus
    r = solr_get(idx, [3, 1, 999999], fl=["conv_id", "turn_idx"])
    docs = r["response"]["docs"]
    assert [d["doc_id"] for d in docs] == [3, 1]  # request order, missing skipped
    assert set(docs[0]) == {"doc_id", "conv_id", "turn_idx"}
    assert solr_get(idx, [])["response"]["numFound"] == 0
    # tombstone-aware: a deleted doc is not returned (own index, mutating)
    df = generate_transcripts(spark, n_convs=10, turns_per_conv=4, seed=37)
    d = str(tmp_path_factory.mktemp("rtg"))
    build_index(spark, df, d, BuildConfig(build_id="rtg", **CFG))
    idx2 = BM25Index(spark, d)
    assert solr_get(idx2, [0])["response"]["numFound"] == 1
    idx2.delete_by_query("doc_id = 0")
    assert solr_get(idx2, [0])["response"]["numFound"] == 0


def test_select_pages_importer_loop(corpus):
    """The importer's whole-collection crawl: page q=*:* until exhausted."""
    _, idx = corpus
    pages = list(select_pages(idx, {"q": "*:*", "fq": "role:assistant"},
                              page_size=40))
    total = pages[0]["response"]["numFound"]
    assert total == idx.docs().filter("role = 'assistant'").count()
    got = [d["doc_id"] for p in pages for d in p["response"]["docs"]]
    assert len(got) == total and len(set(got)) == total
    assert len(pages) == -(-total // 40)


def test_unsupported_sort_raises(corpus):
    """Malformed sorts fail loudly instead of defaulting the direction."""
    _, idx = corpus
    for bad in ("ts", "ts descending", "ts desc, doc_id", ", ts desc"):
        with pytest.raises(ValueError, match="unsupported sort"):
            solr_select(idx, {"q": "*:*", "sort": bad})
    # extra internal whitespace is normalized, not misparsed as bad direction
    resp = solr_select(idx, {"q": "*:*", "sort": "turn_idx   desc", "rows": 3})
    vals = [d["turn_idx"] for d in resp["response"]["docs"]]
    assert vals == sorted(vals, reverse=True)


def test_multi_field_sort(corpus):
    """Solr comma-separated multi-field sorts (r4): match-all and scored
    paths, with the doc_id tiebreaker appended last."""
    _, idx = corpus
    resp = solr_select(idx, {
        "q": "*:*", "sort": "role asc, turn_idx desc", "rows": 12,
        "fl": "doc_id,role,turn_idx",
    })
    got = [(d["role"], -d["turn_idx"], d["doc_id"])
           for d in resp["response"]["docs"]]
    assert got == sorted(got)
    scored = solr_select(idx, {
        "q": "error tool", "sort": "turn_idx asc, score desc", "rows": 8,
        "fl": "doc_id,turn_idx,score",
    })
    key = [(d["turn_idx"], -round(d["score"], 6), d["doc_id"])
           for d in scored["response"]["docs"]]
    assert key == sorted(key)


def test_sort_field_outside_fl(corpus):
    """Sort fields need not be in fl (Solr sorts on docValues): they join
    in for the ordering and are dropped from the response."""
    _, idx = corpus
    resp = solr_select(idx, {
        "q": "error tool", "sort": "ts asc", "rows": 5, "fl": "doc_id",
    })
    docs = resp["response"]["docs"]
    assert docs and all(set(d) == {"doc_id"} for d in docs)


def test_fl_star(corpus):
    """fl=* returns every stored field; score only when asked (fl=*,score)."""
    _, idx = corpus
    plain = solr_select(idx, {"q": "error", "rows": 2, "fl": "*"})
    d = plain["response"]["docs"][0]
    assert {"doc_id", "conv_id", "turn_idx", "role", "text"} <= set(d)
    assert "score" not in d
    with_score = solr_select(idx, {"q": "error", "rows": 2, "fl": "*,score"})
    d2 = with_score["response"]["docs"][0]
    assert "score" in d2 and {"conv_id", "text"} <= set(d2)


def test_min_exact_count(corpus):
    """Solr 8.6+ minExactCount: exact numFound up to N hits, a lower bound
    with numFoundExact=false beyond -- computed from the same top-k pass as
    the page (no second postings decode)."""
    _, idx = corpus
    exact = solr_select(idx, {"q": "error tool", "rows": 5})
    total = exact["response"]["numFound"]
    assert exact["response"]["numFoundExact"] is True and total > 10

    # threshold above the true total: still exact, same number
    hi = solr_select(idx, {"q": "error tool", "rows": 5,
                           "minExactCount": total + 50})
    assert hi["response"]["numFound"] == total
    assert hi["response"]["numFoundExact"] is True

    # threshold below the true total: lower bound, flagged inexact
    lo = solr_select(idx, {"q": "error tool", "rows": 5, "minExactCount": 10})
    assert lo["response"]["numFoundExact"] is False
    assert 10 <= lo["response"]["numFound"] <= total
    # the page itself is identical to the exact request's page
    assert ([d["doc_id"] for d in lo["response"]["docs"]]
            == [d["doc_id"] for d in exact["response"]["docs"]])


def test_field_sort_numfound_reuses_match_set(corpus):
    """Field-sorted scored requests count the materialized match set; the
    number must equal the exact score-sorted count."""
    _, idx = corpus
    exact = solr_select(idx, {"q": "error tool", "rows": 3})
    sorted_resp = solr_select(idx, {"q": "error tool", "rows": 3,
                                    "sort": "ts asc"})
    assert sorted_resp["response"]["numFound"] == exact["response"]["numFound"]
    assert sorted_resp["response"]["numFoundExact"] is True


def test_spellcheck_multi_term_and_collate(corpus):
    """Solr SpellCheckComponent: per-token suggestion entries for a
    multi-term spellcheck.q, and spellcheck.collate builds a verified
    collation from each misspelled token's top suggestion."""
    _, idx = corpus
    sp = solr_select(idx, {
        "q": "*:*", "rows": 0, "spellcheck": "true",
        "spellcheck.q": "errox topix42", "spellcheck.collate": "true",
        "spellcheck.extendedResults": "true",
        "spellcheck.collateExtendedResults": "true",
        "spellcheck.maxCollationTries": "10",
    })["spellcheck"]
    assert not sp["correctlySpelled"]
    entries = dict(zip(sp["suggestions"][::2], sp["suggestions"][1::2]))
    assert "error" in [s["word"] for s in entries["errox"]["suggestion"]]
    assert "topic42" in [s["word"] for s in entries["topix42"]["suggestion"]]
    coll = sp["collations"][1]
    # each token replaced by its TOP suggestion, hits verified
    tops = {t: entries[t]["suggestion"][0]["word"] for t in entries}
    want = " ".join(tops.get(t, t) for t in ("errox", "topix42"))
    assert coll["collationQuery"] == want
    assert coll["hits"] == idx.count_matches(want)
    assert coll["misspellingsAndCorrections"] == [
        "errox", tops["errox"], "topix42", tops["topix42"]]


def test_spellcheck_correctly_spelled_common_terms(corpus):
    """Common terms pass the maxQueryFrequency gate: no suggestions, and
    correctlySpelled stays true; no collations section without corrections."""
    _, idx = corpus
    sp = solr_select(idx, {
        "q": "*:*", "rows": 0, "spellcheck": "true",
        "spellcheck.q": "error tool", "spellcheck.collate": "true",
    })["spellcheck"]
    assert sp["correctlySpelled"] and sp["suggestions"] == []
    assert "collations" not in sp


def test_hl_snippets_multi_fragment(corpus):
    """hl.snippets > 1: up to N non-overlapping marked fragments per doc,
    in document order; each fragment is ~fragsize chars and every term
    occurrence inside it is wrapped."""
    _, idx = corpus
    resp = solr_select(idx, {
        "q": "error", "rows": 5, "hl": "true",
        "hl.fragsize": 30, "hl.snippets": 3,
    })
    hl = resp["highlighting"]
    assert set(hl) == {str(d["doc_id"]) for d in resp["response"]["docs"]}
    for frags in hl.values():
        lst = frags["text"]
        assert isinstance(lst, list) and 1 <= len(lst) <= 3
        for f in lst:
            assert "<em>" in f and len(f) <= 30 + len("<em></em>") * 10
    # snippets=1 keeps the single-fragment (string) behavior
    one = solr_select(idx, {
        "q": "error", "rows": 2, "hl": "true", "hl.fragsize": 30,
    })["highlighting"]
    for v in one.values():
        assert len(v["text"]) == 1 and isinstance(v["text"][0], str)


def test_fl_aliasing(corpus):
    """Solr fl renames (`alias:field`): fetch the source field, display it
    under the alias; works alongside plain fields and score."""
    _, idx = corpus
    resp = solr_select(idx, {
        "q": "error tool", "rows": 3, "fl": "id:doc_id,who:role,score",
    })
    for d in resp["response"]["docs"]:
        assert set(d) == {"id", "who", "score"}
    match_all = solr_select(idx, {
        "q": "*:*", "rows": 2, "fl": "id:doc_id,turn_idx",
    })
    for d in match_all["response"]["docs"]:
        assert "id" in d and "doc_id" not in d and "turn_idx" in d


def test_hl_tag_params(corpus):
    """hl.tag.pre/post (and the hl.simple.* spelling) change the markup."""
    _, idx = corpus
    resp = solr_select(idx, {
        "q": "error", "rows": 2, "hl": "true",
        "hl.tag.pre": "<b>", "hl.tag.post": "</b>", "fl": "doc_id",
    })
    frags = [v["text"][0] for v in resp["highlighting"].values()]
    assert any("<b>" in f and "</b>" in f for f in frags)
    assert all("<em>" not in f for f in frags)


def test_fl_function_pseudo_fields(corpus):
    """fl function pseudo-fields: computed per page doc, aliased or bare."""
    _, idx = corpus
    resp = solr_select(idx, {
        "q": "error", "rows": 3,
        "fl": "doc_id,plus:sum(turn_idx,dl),div(turn_idx,10)",
    })
    docs = {r["doc_id"]: r.asDict() for r in idx.docs().collect()}
    for d in resp["response"]["docs"]:
        src = docs[d["doc_id"]]
        assert d["plus"] == src["turn_idx"] + src["dl"]
        assert d["div(turn_idx,10)"] == pytest.approx(src["turn_idx"] / 10)
    # pseudo-field only: doc_id still keys the docs
    r2 = solr_select(idx, {"q": "error", "rows": 2,
                           "fl": "plus:sum(turn_idx,1)"})
    for d in r2["response"]["docs"]:
        assert set(d) == {"doc_id", "plus"}


def test_hl_q_highlights_a_different_query(corpus):
    _, idx = corpus
    # ranking by q, markup from hl.q -- Solr hl.q semantics
    base = solr_select(idx, {
        "q": "error", "rows": 5, "hl": "true", "fl": "doc_id",
    })
    alt = solr_select(idx, {
        "q": "error", "rows": 5, "hl": "true", "hl.q": "tool",
        "fl": "doc_id",
    })
    # same ranked docs (hl.q must not change matching/ranking)
    assert [d["doc_id"] for d in base["response"]["docs"]] == \
           [d["doc_id"] for d in alt["response"]["docs"]]
    alt_frags = "".join(v["text"][0] or "" for v in alt["highlighting"].values())
    assert "<em>tool</em>" in alt_frags
    assert "<em>error</em>" not in alt_frags


def test_hl_fl_validation(corpus):
    _, idx = corpus
    ok = solr_select(idx, {"q": "error", "rows": 2, "hl": "true",
                           "hl.fl": "text", "fl": "doc_id"})
    assert ok["highlighting"]
    ok2 = solr_select(idx, {"q": "error", "rows": 2, "hl": "true",
                            "hl.fl": "*", "fl": "doc_id"})
    assert ok2["highlighting"]
    with pytest.raises(ValueError, match="hl.fl"):
        solr_select(idx, {"q": "error", "rows": 2, "hl": "true",
                          "hl.fl": "title", "fl": "doc_id"})


def test_hl_max_analyzed_chars(corpus):
    _, idx = corpus
    docs = {r["doc_id"]: r["text"]
            for r in idx.docs().select("doc_id", "text").collect()}
    full = solr_select(idx, {"q": "error", "rows": 5, "hl": "true",
                             "fl": "doc_id"})["highlighting"]
    capped = solr_select(idx, {"q": "error", "rows": 5, "hl": "true",
                               "hl.maxAnalyzedChars": 40,
                               "fl": "doc_id"})["highlighting"]
    assert capped.keys() == full.keys()
    for did, v in capped.items():
        text = docs[int(did)]
        got = v["text"][0]
        # markup only inside the first 40 chars; tail verbatim
        assert got.endswith(text[40:])
        head = got[: len(got) - len(text[40:])] if text[40:] else got
        assert "<em>" not in text[40:] or True
        assert head.replace("<em>", "").replace("</em>", "") == text[:40]
        # whole-field invariant: stripping markup gives the original text
        assert got.replace("<em>", "").replace("</em>", "") == text
    # a doc whose only match is past the cap comes back unmarked
    any_unmarked = any("<em>" not in v["text"][0] for v in capped.values())
    marked_in_full = all("<em>" in v["text"][0] for v in full.values())
    assert marked_in_full
    # fragment mode: fragments never start past the cap
    frag = solr_select(idx, {"q": "error", "rows": 5, "hl": "true",
                             "hl.fragsize": 20, "hl.maxAnalyzedChars": 40,
                             "fl": "doc_id"})["highlighting"]
    for did, v in frag.items():
        stripped = v["text"][0].replace("<em>", "").replace("</em>", "")
        assert stripped in docs[int(did)][:40]
    with pytest.raises(ValueError, match="positive"):
        solr_select(idx, {"q": "error", "hl": "true",
                          "hl.maxAnalyzedChars": 0})
