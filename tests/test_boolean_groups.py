"""Parenthesized boolean groups in ``q`` (Lucene standard-parser grouping:
``(a OR b) AND c``, ``+(x y)^2``, nested levels).

Verification is algebraic, not self-referential: a group scores
boost * sum(matching subclause scores) and matches per nested-BooleanQuery
occur rules, so every grouped query's match set + scores are recomputed
here from independent single-term match sets (the same style as
test_boost_mm). Reference behavior: Lucene QueryParserBase.addClause /
BooleanQuery rewrite; the reference routes queries through Solr's lucene
QParser (solr-semantic-importer delegates querying to Solr).
"""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=60, turns_per_conv=6, seed=41)
    idx_dir = str(tmp_path_factory.mktemp("boolgroups"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="boolgroups", **CFG))
    return df, BM25Index(spark, idx_dir)


def _scores(idx, q, **kw):
    return {
        r["doc_id"]: r["score"] for r in idx.score_matches(q, **kw).collect()
    }


# -- parse shapes (no index needed) -----------------------------------------


class _Stub(BM25Index):
    def __init__(self):
        pass

    def analyze_query(self, text, synonyms=False):
        return [t for t in text.lower().split() if t and t != "the"]

    def _doc_columns(self):
        return frozenset({"role", "turn_idx"})


def test_parse_group_shapes():
    s = _Stub()
    cl = s.parse_boolean_q("(a OR b) AND c")
    assert cl == [
        ("MUST", ("group", [("SHOULD", ("term", "a", 1.0)),
                            ("SHOULD", ("term", "b", 1.0))], 1.0)),
        ("MUST", ("term", "c", 1.0)),
    ]
    # single-clause groups unwrap with boosts multiplied (Lucene's
    # single-SHOULD BooleanQuery rewrite), nesting composes boosts
    assert s.parse_boolean_q("(a)") == [("SHOULD", ("term", "a", 1.0))]
    assert s.parse_boolean_q("((a^2))^3") == [("SHOULD", ("term", "a", 6.0))]
    # q.op applies at EVERY level (parser-global default operator)
    cl = s.parse_boolean_q("(a OR b) c", op="AND")
    assert cl[0][0] == "MUST" and cl[1] == ("MUST", ("term", "c", 1.0))
    inner = cl[0][1]
    assert inner[0] == "group"
    assert [oc for oc, _ in inner[1]] == ["SHOULD", "SHOULD"]
    # a group whose every clause analyzes away drops like Lucene's null
    # clause -- but its introducing AND still upgrades the left neighbour
    assert s.parse_boolean_q("a AND (the)") == [("MUST", ("term", "a", 1.0))]
    # parens inside quoted phrases stay literal text
    assert s.parse_boolean_q('"literal (parens)"') == [
        ("SHOULD", ("phrase", "literal (parens)", 0, 1.0))
    ]


def test_parse_group_errors():
    s = _Stub()
    for bad in ["(a", "a)", "()", "(AND a)", "(a AND AND b)", "(a NOT)",
                "f:(a b)"]:
        with pytest.raises(ValueError):
            s.parse_boolean_q(bad)


# -- scoring semantics (algebraic recomposition) -----------------------------


def test_group_or_and_term(corpus):
    _, idx = corpus
    s_err = _scores(idx, "error")
    s_tool = _scores(idx, "tool")
    s_win = _scores(idx, "call")
    got = _scores(idx, "(error OR tool) AND call")
    want = {
        d: (s_err.get(d, 0.0) + s_tool.get(d, 0.0)) + s_win[d]
        for d in s_win
        if d in s_err or d in s_tool
    }
    assert set(got) == set(want)
    for d, v in want.items():
        assert abs(got[d] - v) < 1e-9


def test_group_boost_is_linear(corpus):
    _, idx = corpus
    s_err = _scores(idx, "error")
    s_tool = _scores(idx, "tool")
    got = _scores(idx, "(error tool)^2.5")
    want_docs = set(s_err) | set(s_tool)
    assert set(got) == want_docs
    for d in want_docs:
        want = 2.5 * (s_err.get(d, 0.0) + s_tool.get(d, 0.0))
        assert abs(got[d] - want) < 1e-9


def test_must_group_with_should_sibling(corpus):
    _, idx = corpus
    s_err = _scores(idx, "error")
    s_tool = _scores(idx, "tool")
    s_win = _scores(idx, "call")
    # +(error tool) call: group required, call optional but scoring
    got = _scores(idx, "+(error tool) call")
    want_docs = set(s_err) | set(s_tool)
    assert set(got) == want_docs
    for d in want_docs:
        want = s_err.get(d, 0.0) + s_tool.get(d, 0.0) + s_win.get(d, 0.0)
        assert abs(got[d] - want) < 1e-9


def test_prohibited_group(corpus):
    _, idx = corpus
    s_err = _scores(idx, "error")
    s_tool = _scores(idx, "tool")
    s_win = _scores(idx, "call")
    got = _scores(idx, "call -(error tool)")
    want = {d: v for d, v in s_win.items()
            if d not in s_err and d not in s_tool}
    assert got == pytest.approx(want)


def test_nested_two_levels(corpus):
    _, idx = corpus
    s_err = _scores(idx, "error")
    s_tool = _scores(idx, "tool")
    s_tbl = _scores(idx, "run")
    s_win = _scores(idx, "call")
    # ((error tool) AND run) OR call
    got = _scores(idx, "((error tool) AND run) OR call")
    inner = {
        d: s_err.get(d, 0.0) + s_tool.get(d, 0.0) + s_tbl[d]
        for d in s_tbl
        if d in s_err or d in s_tool
    }
    want = {}
    for d in set(inner) | set(s_win):
        want[d] = inner.get(d, 0.0) + s_win.get(d, 0.0)
    assert set(got) == set(want)
    for d, v in want.items():
        assert abs(got[d] - v) < 1e-9


def test_nested_pure_negative_group_matches_nothing(corpus):
    _, idx = corpus
    # a SHOULD group of only MUST_NOT clauses is a nested boolean that
    # matches nothing (Lucene); the sibling term still matches alone
    s_win = _scores(idx, "call")
    got = _scores(idx, "(-error) call")
    assert got == pytest.approx(s_win)


def test_group_with_phrase_and_filter(corpus):
    _, idx = corpus
    s_win = _scores(idx, "call")
    s_ph = _scores(idx, '"error in"')
    # ("error in" role:assistant) AND call
    got = _scores(idx, '("error in" role:assistant) AND call')
    # recompute the filter set independently
    role_only = {
        r["doc_id"]
        for r in idx.docs().filter("role = 'assistant'")
        .select("doc_id").collect()
    }
    want = {}
    for d in s_win:
        g = s_ph.get(d, 0.0) + (1.0 if d in role_only else 0.0)
        if d in s_ph or d in role_only:
            want[d] = g + s_win[d]
    assert set(got) == set(want)
    for d, v in want.items():
        assert abs(got[d] - v) < 1e-9


def test_group_query_via_search_and_select(corpus):
    _, idx = corpus
    rows = idx.search("(error OR tool) AND call", k=10,
                      use_cache=False).collect()
    assert rows
    exp = _scores(idx, "(error OR tool) AND call")
    top = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["doc_id"], round(r["score"], 6)) for r in rows] == [
        (d, round(v, 6)) for d, v in top
    ]
    # the /select facade accepts grouped q end-to-end
    resp = solr_select(
        idx, {"q": "(error OR tool) AND call", "rows": 5, "fl": "doc_id,score"}
    )
    assert resp["response"]["numFound"] == len(exp)


def test_group_mm_counts_top_level_should(corpus):
    _, idx = corpus
    s_err = _scores(idx, "error")
    s_tool = _scores(idx, "tool")
    s_win = _scores(idx, "call")
    # (error tool) call with mm=2: both top-level SHOULD clauses must hit
    got = _scores(idx, "(error tool) call", mm=2)
    want = {
        d: s_err.get(d, 0.0) + s_tool.get(d, 0.0) + s_win[d]
        for d in s_win
        if d in s_err or d in s_tool
    }
    assert set(got) == set(want)
    for d, v in want.items():
        assert abs(got[d] - v) < 1e-9


def test_group_highlight_surface_terms(corpus):
    _, idx = corpus
    terms = idx._surface_terms('((error tool) "run test") -call')
    assert "error" in terms and "tool" in terms
    assert "run" in terms and "test" in terms
    assert "call" not in terms  # prohibited clauses never highlight


def test_field_scoped_value_group_in_q(corpus):
    _, idx = corpus
    # role:(user assistant) = ConstantScore filter over the value group
    got = _scores(idx, "role:(user assistant) error")
    s_err = _scores(idx, "error")
    in_roles = {
        r["doc_id"]
        for r in idx.docs().filter("role IN ('user','assistant')")
        .select("doc_id").collect()
    }
    want = {d: s_err.get(d, 0.0) + (1.0 if d in in_roles else 0.0)
            for d in set(s_err) | in_roles}
    assert set(got) == set(want)
    for d, v in want.items():
        assert abs(got[d] - v) < 1e-9
    # boosted MUST form: +role:(...)^2 contributes a constant 2.0
    got2 = _scores(idx, "+role:(user assistant)^2 error")
    want2 = {d: s_err.get(d, 0.0) + 2.0 for d in in_roles}
    assert set(got2) == set(want2)
    for d, v in want2.items():
        assert abs(got2[d] - v) < 1e-9
    # unknown field still fails loud
    with pytest.raises(ValueError):
        idx.search("nosuchfield:(a b) error", k=1)


def test_group_query_matches_independent_oracle(corpus):
    """Fully independent check: the grouped query's match set + scores
    recomputed from BM25Oracle (pure-python tf/df/idf over the same doc
    ids), with the boolean tree evaluated by hand -- no engine scores on
    the expected side."""
    from solr_semantic_importer_spark.index.docids import assign_doc_ids_window
    from solr_semantic_importer_spark.oracle.bm25_ref import BM25Oracle

    df, idx = corpus
    docs = [
        (r["doc_id"], r["text"])
        for r in assign_doc_ids_window(df).select("doc_id", "text").collect()
    ]
    orc = BM25Oracle(docs)

    def has(t):
        return {d for d, c in orc.tfs.items() if t in c}

    # (error OR tool) AND call
    match = (has("error") | has("tool")) & has("call")
    want = {d: orc.score_doc(d, ["error", "tool", "call"]) for d in match}
    got = _scores(idx, "(error OR tool) AND call")
    assert set(got) == set(want)
    for d, v in want.items():
        assert abs(got[d] - v) < 1e-6

    # call -(error tool)
    match = has("call") - (has("error") | has("tool"))
    want = {d: orc.score_doc(d, ["call"]) for d in match}
    got = _scores(idx, "call -(error tool)")
    assert set(got) == set(want)
    for d, v in want.items():
        assert abs(got[d] - v) < 1e-6

    # (error tool)^2 call -- boost scales only the group's contribution
    match = has("error") | has("tool") | has("call")
    want = {
        d: 2.0 * orc.score_doc(d, ["error", "tool"])
        + orc.score_doc(d, ["call"])
        for d in match
    }
    got = _scores(idx, "(error tool)^2 call")
    assert set(got) == set(want)
    for d, v in want.items():
        assert abs(got[d] - v) < 1e-6
