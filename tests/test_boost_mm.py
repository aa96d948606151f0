"""Per-clause query boosts (Lucene ``term^2.5``) and minimum-should-match
(Solr ``mm``, dismax semantics restricted to flat SHOULD clauses).

Verification is algebraic, not self-referential: BM25 is linear in the
per-term weights, so ``q1^B q2`` must score every doc exactly
``B*s(q1) + s(q2)`` where s() comes from independent single-term match
sets; mm results must equal the brute-force "docs present in >= mm of the
per-term match sets". WAND (both kernel branches) is checked for rank
identity against the exhaustive path under both features.
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
    df = generate_transcripts(spark, n_convs=60, turns_per_conv=6, seed=99)
    idx_dir = str(tmp_path_factory.mktemp("boostmm"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="boostmm", **CFG))
    return df, BM25Index(spark, idx_dir)


def _scores(idx, q, **kw):
    return {
        r["doc_id"]: r["score"] for r in idx.score_matches(q, **kw).collect()
    }


def _top(idx, q, k=10_000, **kw):
    rows = idx.search(q, k=k, use_cache=False, **kw).collect()
    return [(r["doc_id"], round(r["score"], 6)) for r in rows]


def test_boost_parse():
    parse = BM25Index.parse_boosted_query
    class Stub:  # analyze without an index
        _BOOST_RE = BM25Index._BOOST_RE
        def analyze_query(self, text, synonyms=False):
            return [t for t in text.lower().split() if t]
    terms, boosts = parse(Stub(), "error^2 tool error^3.5 window")
    assert terms == ["error", "tool", "window"]
    assert boosts == {"error": 3.5}  # same term twice -> max boost
    terms, boosts = parse(Stub(), "plain words")
    assert boosts == {}  # no ^ -> empty boost map (cache key stability)


def test_boost_is_linear_in_weight(corpus):
    _, idx = corpus
    s_err = _scores(idx, "error")
    s_tool = _scores(idx, "tool")
    got = _scores(idx, "error^2 tool")
    want_docs = set(s_err) | set(s_tool)
    assert set(got) == want_docs
    for d in want_docs:
        want = 2.0 * s_err.get(d, 0.0) + s_tool.get(d, 0.0)
        assert abs(got[d] - want) < 1e-9


def test_boost_wand_matches_exhaustive(corpus):
    _, idx = corpus
    q = "error^2.5 tool the^0.5"
    assert _top(idx, q, k=25) == _top(idx, q, k=25, mode="exhaustive")
    # zone kernel too
    idx.exhaustive_cutoff = 0
    try:
        assert _top(idx, q, k=25) == _top(idx, q, k=25, mode="exhaustive")
    finally:
        del idx.exhaustive_cutoff
    # boost=1 everywhere is the unboosted query (and hits the same cache key)
    assert _top(idx, "error^1 tool", k=25) == _top(idx, "error tool", k=25)


def test_mm_equals_bruteforce(corpus):
    _, idx = corpus
    qterms = ["error", "tool", "the"]
    per_term = {t: _scores(idx, t) for t in qterms}
    got = dict(_top(idx, " ".join(qterms), mm=2))
    want = {}
    for d in set().union(*per_term.values()):
        present = [t for t in qterms if d in per_term[t]]
        if len(present) >= 2:
            want[d] = round(sum(per_term[t][d] for t in present), 6)
    assert got == want


def test_mm_percent_and_modes(corpus):
    _, idx = corpus
    q = "error tool the"
    base = _top(idx, q, mm=2)
    assert _top(idx, q, mm="67%") == base  # 67% of 3 clauses -> 2 (round down)
    assert _top(idx, q, mm=2, mode="exhaustive") == base
    idx.exhaustive_cutoff = 0
    try:
        assert _top(idx, q, mm=2) == base
    finally:
        del idx.exhaustive_cutoff
    # mm=1 / None is plain OR
    assert _top(idx, q, mm=1) == _top(idx, q)
    # mm = clause count == AND
    assert _top(idx, q, mm=3) == _top(idx, q, op="AND")


def test_mm_counts_oov_clauses(corpus):
    """Lucene mm counts SHOULD clauses; an OOV clause can never match, so
    mm == clause count with one OOV term -> zero results."""
    _, idx = corpus
    assert _top(idx, "error tool zzzneveraterm", mm=3) == []
    # but mm=2 is still satisfiable by the two real terms
    assert _top(idx, "error tool zzzneveraterm", mm=2) == _top(
        idx, "error tool", op="AND"
    )


def test_mm_cursor_walk(corpus):
    _, idx = corpus
    full = _top(idx, "error tool the", mm=2)
    out, mark = [], "*"
    while True:
        rows, nxt = idx.search_cursor("error tool the", k=5, cursor=mark, mm=2)
        out.extend((r["doc_id"], round(r["score"], 6)) for r in rows)
        if nxt == mark:
            break
        mark = nxt
    assert out == full


def test_select_mm_and_boost(corpus):
    _, idx = corpus
    resp = solr_select(idx, {"q": "error tool the", "mm": 2, "rows": 5,
                             "fl": "doc_id,score"})
    want = dict(_top(idx, "error tool the", mm=2))
    assert resp["response"]["numFound"] == len(want)
    for d in resp["response"]["docs"]:
        assert round(d["score"], 6) == want[d["doc_id"]]
    boosted = solr_select(idx, {"q": "error^2 tool", "rows": 3,
                                "fl": "doc_id,score"})
    top = _top(idx, "error^2 tool", k=3)
    assert [d["doc_id"] for d in boosted["response"]["docs"]] == [
        d for d, _ in top
    ]
