"""Lucene standard-parser boolean KEYWORDS in ``q`` (AND/OR/NOT, &&/||):
resolved with QueryParserBase.addClause's exact algorithm (including the
q.op interplay and the famous `a OR b AND c` asymmetry) into the engine's
occur-prefix clause syntax, then verified rank-identical against the
equivalent prefix query on every scoring path."""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=6, seed=31)
    idx_dir = str(tmp_path_factory.mktemp("boolkw"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="boolkw", **CFG))
    return BM25Index(spark, idx_dir)


def _ranked(idx, q, op="OR", k=20):
    return [(r["doc_id"], round(r["score"], 6))
            for r in idx.search(q, k=k, op=op).collect()]


def test_keywords_match_prefix_syntax(corpus):
    idx = corpus
    # each keyword form must be rank-identical to its prefix equivalent
    for kw, prefix in [
        ("error AND test", "+error +test"),
        ("error AND NOT tool", "+error -tool"),
        ("NOT tool", "-tool"),
        ("error && test", "+error +test"),
        ("run OR error AND test", "run +error +test"),
        ('error AND "run test"', '+error +"run test"'),
    ]:
        assert _ranked(idx, kw) == _ranked(idx, prefix), kw


def test_or_keyword_is_plain_or(corpus):
    idx = corpus
    assert _ranked(idx, "error OR test") == _ranked(idx, "error test")
    # under q.op=AND, `OR` demotes both neighbours to SHOULD (Lucene):
    # `error OR test` scores like the plain OR query, NOT the AND query
    assert _ranked(idx, "error OR test", op="AND") == \
        _ranked(idx, "error test", op="OR")
    assert _ranked(idx, "error AND test", op="AND") == \
        _ranked(idx, "error test", op="AND")


def test_lowercase_words_stay_terms(corpus):
    idx = corpus
    # operators are case-sensitive: lowercase `and`/`or`/`not` analyze
    # as ordinary terms (no structure)
    assert idx.parse_boolean_q("error and test") is None
    assert idx.parse_boolean_q("error not test") is None


def test_numfound_matches_bruteforce(corpus):
    idx = corpus
    texts = {r["doc_id"]: set(idx._analyze(r["text"]))
             for r in idx.docs().collect()}
    n_and_not = sum(1 for t in texts.values()
                    if "error" in t and "tool" not in t)
    assert idx.count_matches("error AND NOT tool") == n_and_not
    # a OR b AND c == Lucene: a optional, b and c required
    n = sum(1 for t in texts.values() if "run" in t and "error" in t)
    assert idx.count_matches("test OR run AND error") == n


def test_select_and_components_see_keywords(corpus):
    idx = corpus
    resp = solr_select(idx, {"q": "error AND NOT tool", "rows": 3,
                             "facet": "true", "facet.field": "role"})
    want = _ranked(idx, "+error -tool", k=3)
    assert [d["doc_id"] for d in resp["response"]["docs"]] == \
           [d for d, _ in want]
    # facet counts the same DocSet as numFound
    flat = resp["facet_counts"]["facet_fields"]["role"]
    assert sum(flat[1::2]) == resp["response"]["numFound"]


def test_malformed_operator_queries_raise(corpus):
    idx = corpus
    # "(a AND b)" is VALID since grouped-boolean support landed
    # (test_boolean_groups.py); unbalanced/empty parens still raise
    for bad in ("AND x", "x AND", "x AND OR y", "NOT", "(a AND b",
                "a AND b)", "()", "NOT NOT x"):
        with pytest.raises(ValueError):
            idx.search(bad, k=1)
