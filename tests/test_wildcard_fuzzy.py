"""Lucene multi-term query clauses in q: wildcards (``tabl*``, ``t?ble``)
and fuzzy terms (``table~``, ``table~1``) — Solr's lucene QParser surface
(reference queries route through /select, conf/solrconfig.xml defaults).

Semantics verified brute-force against the corpus:
- wildcard: Lucene's default CONSTANT_SCORE_REWRITE — every doc holding
  any dictionary term matching the pattern, constant score = clause boost;
  expansion past maxBooleanClauses (1024) raises like Solr.
- fuzzy: FuzzyQuery defaults (maxEdits 2, maxExpansions 50, prefixLength
  0) — expansion = dictionary terms within edit distance, scored as the
  sum of each expanded term's own BM25 (documented deviation: Lucene's
  TopTermsBlendedFreqScoringRewrite blends df across the expansion set;
  this engine scores each term with its true idf, same match set).
"""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index

TEXTS = [
    "table setup guide",        # 0
    "tables and chairs",        # 1
    "tablet screen broken",     # 2
    "fable about a fox",        # 3
    "cable management tips",    # 4
    "stable diffusion model",   # 5
    "label the records",        # 6
    "turntable vinyl setup",    # 7
]


def _edit_distance(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    import pandas as pd
    rows = [
        {"conv_id": f"c{i:03d}", "turn_idx": 0, "role": "user", "text": t,
         "tool": None, "ts": pd.Timestamp(1704067200 + i * 60, unit="s")}
        for i, t in enumerate(TEXTS)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    idx_dir = str(tmp_path_factory.mktemp("wz"))
    build_index(spark, df, idx_dir,
                BuildConfig(build_id="wz", segment_size=4, block_size=4))
    return df, BM25Index(spark, idx_dir)


def _ids(idx, q, **kw):
    return {int(r["doc_id"]) for r in idx._matched_ids(q, **kw).collect()}


def _scores(idx, q, **kw):
    return {
        int(r["doc_id"]): float(r["score"])
        for r in idx.score_matches(q, **kw).collect()
    }


def _docs_with(pred):
    return {i for i, t in enumerate(TEXTS)
            if any(pred(w) for w in t.split())}


# ---------------------------------------------------------------- parse

def test_parse_wildcard_and_fuzzy_clauses(corpus):
    _, idx = corpus
    cl = idx.parse_boolean_q("tabl*")
    assert cl == [("SHOULD", ("wildcard", "tabl*", 1.0))]
    cl = idx.parse_boolean_q("t?ble^2")
    assert cl == [("SHOULD", ("wildcard", "t?ble", 2.0))]
    cl = idx.parse_boolean_q("table~")
    assert cl == [("SHOULD", ("fuzzy", "table", 2, 1.0))]
    cl = idx.parse_boolean_q("table~1^3")
    assert cl == [("SHOULD", ("fuzzy", "table", 1, 3.0))]
    cl = idx.parse_boolean_q("+tabl* -fable guide")
    assert ("MUST", ("wildcard", "tabl*", 1.0)) in cl
    assert ("MUST_NOT", ("term", "fable", 1.0)) in cl
    # a plain term query stays on the WAND fast path
    assert idx.parse_boolean_q("table guide") is None


# ------------------------------------------------------------- wildcard

def test_expand_wildcard(corpus):
    _, idx = corpus
    assert idx.expand_wildcard("tabl*") == ["table", "tables", "tablet"]
    assert idx.expand_wildcard("t?ble") == ["table"]
    assert idx.expand_wildcard("*able") == ["cable", "fable", "stable",
                                            "table", "turntable"]
    assert idx.expand_wildcard("nomatch*") == []


def test_wildcard_constant_score(corpus):
    """`tabl*` matches every doc containing a tabl-prefixed term, all at
    constant score 1.0 (CONSTANT_SCORE_REWRITE); boost scales it."""
    _, idx = corpus
    want = _docs_with(lambda w: w.startswith("tabl"))
    assert _ids(idx, "tabl*") == want
    assert _scores(idx, "tabl*") == {d: 1.0 for d in want}
    assert _scores(idx, "tabl*^2.5") == {d: 2.5 for d in want}


def test_wildcard_with_occur_operators(corpus):
    _, idx = corpus
    tabl = _docs_with(lambda w: w.startswith("tabl"))
    setup = _docs_with(lambda w: w == "setup")
    assert _ids(idx, "+tabl* +setup") == tabl & setup
    assert _ids(idx, "setup -tabl*") == setup - tabl
    # unmatchable MUST wildcard empties the query
    assert _ids(idx, "+zzz* setup") == set()
    # unmatchable SHOULD wildcard contributes nothing
    assert _ids(idx, "zzz* setup") == setup


def test_bare_star_is_match_all(corpus):
    _, idx = corpus
    assert _ids(idx, "* -fable") == set(range(len(TEXTS))) - {3}


def test_wildcard_max_boolean_clauses(corpus):
    _, idx = corpus
    with pytest.raises(ValueError, match="maxBooleanClauses"):
        idx.expand_wildcard("*able", max_clauses=3)
    assert len(idx.expand_wildcard("*able", max_clauses=5)) == 5


# ---------------------------------------------------------------- fuzzy

def test_expand_fuzzy_edit_distance(corpus):
    """Expansion = dictionary terms within maxEdits, brute-force checked
    against a reference Levenshtein over the corpus vocabulary."""
    _, idx = corpus
    vocab = {w for t in TEXTS for w in t.split()}
    for max_edits in (0, 1, 2):
        got = set(idx.expand_fuzzy("table", max_edits=max_edits))
        want = {w for w in vocab if _edit_distance("table", w) <= max_edits}
        assert got == want, (max_edits, got, want)


def test_fuzzy_scores_sum_expanded_terms(corpus):
    """`table~1` scores each doc as the sum of its matching expanded
    terms' BM25 — verified against independent single-term match sets."""
    _, idx = corpus
    expansion = idx.expand_fuzzy("table", max_edits=1)
    per_term = [_scores(idx, t) for t in expansion]
    want = {}
    for s in per_term:
        for d, v in s.items():
            want[d] = want.get(d, 0.0) + v
    got = _scores(idx, "table~1")
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)
    # boost is linear on the clause
    got2 = _scores(idx, "table~1^2")
    for d in want:
        assert got2[d] == pytest.approx(2 * want[d], rel=1e-12)


def test_fuzzy_prefix_length_and_expansion_cap(corpus):
    _, idx = corpus
    # prefixLength=1 drops candidates not sharing the first letter
    got = set(idx.expand_fuzzy("table", max_edits=2, prefix_length=1))
    assert all(t.startswith("t") for t in got)
    assert "table" in got and "tables" in got
    assert "cable" not in got and "fable" not in got
    # maxExpansions keeps the closest (distance asc, df desc) candidates
    top1 = idx.expand_fuzzy("table", max_edits=2, max_expansions=1)
    assert top1 == ["table"]  # distance 0 ranks first


def test_fuzzy_with_occur_and_mm(corpus):
    _, idx = corpus
    near = _docs_with(lambda w: _edit_distance("table", w) <= 1)
    setup = _docs_with(lambda w: w == "setup")
    assert _ids(idx, "table~1") == near
    assert _ids(idx, "+table~1 -setup") == near - setup
    # fuzzy on a nonsense stem with no neighbors: unmatchable clause
    assert _ids(idx, "+zzzzzzz~1 setup") == set()
