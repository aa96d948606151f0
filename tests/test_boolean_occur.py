"""Lucene boolean occur operators in q (``+term`` MUST, ``-term``
MUST_NOT, unprefixed SHOULD; phrase clauses take prefixes too) — Lucene
BooleanQuery semantics verified brute-force: every MUST matches, no
MUST_NOT matches, >= minShouldMatch SHOULD clauses match (1 with no
MUSTs, else 0; mm raises it over the SHOULD count), score = sum of
matching positive clause scores."""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index

TEXTS = [
    "alpha beta gamma",            # 0
    "alpha gamma gamma delta",     # 1
    "beta delta delta",            # 2
    "alpha beta delta",            # 3
    "gamma gamma gamma",           # 4
    "epsilon alpha",               # 5
]


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    import pandas as pd
    rows = [
        {"conv_id": f"c{i:03d}", "turn_idx": 0, "role": "user", "text": t,
         "tool": None, "ts": pd.Timestamp(1704067200 + i * 60, unit="s")}
        for i, t in enumerate(TEXTS)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    idx_dir = str(tmp_path_factory.mktemp("occ"))
    build_index(spark, df, idx_dir,
                BuildConfig(build_id="occ", segment_size=4, block_size=4))
    return df, BM25Index(spark, idx_dir)


def _ids(idx, q, **kw):
    return {int(r["doc_id"]) for r in idx._matched_ids(q, **kw).collect()}


def _scores(idx, q, **kw):
    return {
        int(r["doc_id"]): float(r["score"])
        for r in idx.score_matches(q, **kw).collect()
    }


def _has(t):
    return {i for i, txt in enumerate(TEXTS) if t in txt.split()}


def test_must_not_excludes(corpus):
    """`alpha -delta`: alpha docs minus delta docs; scores = alpha-only
    scores (the prohibited clause never contributes)."""
    _, idx = corpus
    want = _has("alpha") - _has("delta")
    assert _ids(idx, "alpha -delta") == want
    plain = _scores(idx, "alpha")
    got = _scores(idx, "alpha -delta")
    assert got == {d: s for d, s in plain.items() if d in want}


def test_must_plus_should_scoring(corpus):
    """`+alpha beta`: alpha is required, beta optional-but-scoring — the
    match set is alpha's, scores add beta's contribution where present."""
    _, idx = corpus
    assert _ids(idx, "+alpha beta") == _has("alpha")
    a = _scores(idx, "alpha")
    b = _scores(idx, "beta")
    got = _scores(idx, "+alpha beta")
    for d in _has("alpha"):
        assert got[d] == pytest.approx(a[d] + b.get(d, 0.0), rel=1e-12)


def test_pure_negative_solr_rewrite(corpus):
    """Solr top-level rewrite: a q of only MUST_NOT clauses = `*:*` minus
    the prohibited docs, constant score 1.0."""
    _, idx = corpus
    want = set(range(len(TEXTS))) - _has("gamma")
    got = _scores(idx, "-gamma")
    assert set(got) == want and all(s == 1.0 for s in got.values())


def test_must_not_phrase(corpus):
    """A prohibited PHRASE clause only excludes exact-phrase docs, not all
    docs containing the terms."""
    _, idx = corpus
    got = _ids(idx, 'alpha -"beta delta"')
    # "beta delta" adjacent only in doc 3
    assert got == _has("alpha") - {3}


def test_mm_counts_should_clauses_only(corpus):
    """mm applies to the SHOULD count; MUST clauses don't consume it."""
    _, idx = corpus
    got = _ids(idx, "+alpha beta gamma", mm=2)
    want = {
        d for d in _has("alpha")
        if (d in _has("beta")) + (d in _has("gamma")) >= 2
    }
    assert got == want


def test_op_and_promotes_should(corpus):
    """q.op=AND turns SHOULD into MUST while -clauses stay prohibited."""
    _, idx = corpus
    got = _ids(idx, "alpha gamma -delta", op="AND")
    assert got == (_has("alpha") & _has("gamma")) - _has("delta")


def test_oov_must_empties(corpus):
    _, idx = corpus
    assert _ids(idx, "+zzzz alpha") == set()
    # OOV MUST_NOT is a no-op; OOV SHOULD contributes nothing
    assert _ids(idx, "alpha -zzzz") == _has("alpha")


def test_interior_hyphen_not_operator(corpus):
    """wi-fi style tokens don't trigger the boolean path (no leading
    operator), and the legacy analyzer split still applies."""
    _, idx = corpus
    assert idx.parse_boolean_q("alpha beta") is None
    assert idx.parse_boolean_q("wi-fi") is None


def test_highlight_skips_prohibited_terms(corpus):
    """The highlighter marks positive clause terms only."""
    _, idx = corpus
    terms = idx._surface_terms("+alpha beta -delta")
    assert "delta" not in terms and {"alpha", "beta"} <= set(terms)


def test_field_filter_clause_in_q(corpus):
    """`field:value` clauses in q (stored-column fields) constrain the
    DocSet like Solr's lucene parser; score contribution is the documented
    ConstantScore 1.0 deviation."""
    _, idx = corpus
    # pure filter clause: every matching doc, score 1.0
    got = {
        int(r["doc_id"]): float(r["score"])
        for r in idx.score_matches("conv_id:c001").collect()
    }
    assert got == {1: 1.0}
    # term + MUST_NOT field filter
    ids = {int(r["doc_id"])
           for r in idx._matched_ids("alpha -conv_id:c000").collect()}
    assert ids == {i for i, t in enumerate(TEXTS)
                   if "alpha" in t.split()} - {0}
    # MUST field filter + optional scoring term: every filter doc matches
    # (minShouldMatch = 0 when a MUST exists, Lucene default); score =
    # 1.0 for the filter + the term's BM25 where present
    alpha = {int(r["doc_id"]): float(r["score"])
             for r in idx.score_matches("alpha").collect()}
    got2 = {int(r["doc_id"]): float(r["score"])
            for r in idx.score_matches("+turn_idx:[0 TO 99] alpha").collect()}
    assert set(got2) == set(range(len(TEXTS)))
    for d, s in got2.items():
        assert s == pytest.approx(1.0 + alpha.get(d, 0.0), rel=1e-12)
    # the term becomes required under q.op=AND: DocSet intersects
    got3 = {int(r["doc_id"])
            for r in idx._matched_ids("+turn_idx:[0 TO 99] alpha",
                                      op="AND").collect()}
    assert got3 == set(alpha)


def test_unknown_field_prefix_falls_through(corpus):
    """`nosuchfield:x` is not a stored column: the clause analyzes as
    plain text (Lucene would error; the analyzer strips the colon)."""
    _, idx = corpus
    assert idx.parse_boolean_q("nosuchfield:alpha nosuch2:beta") is None
