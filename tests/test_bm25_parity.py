"""End-to-end rank-identity: Spark engine top-k == numpy oracle (SURVEY 5.2).

Covers: build pipeline (compressed salted postings), exhaustive and
segment-kernel scoring paths, AND semantics, synonym expansion, fq filters,
OOV queries, and per-turn text equality vs the source.
"""

import math

import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.index.docids import assign_doc_ids_window
from solr_semantic_importer_spark.oracle.bm25_ref import BM25Oracle
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

QUERIES = [
    "error in tool call",
    "the",
    "topic42 topic7",
    "rare00042",
    "test run error",
    "topic1 rare00001 the",
    "zzz_not_a_term qqqq",  # all-OOV
    "caf 100gb",
]


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=120, turns_per_conv=8, seed=42)
    idx_dir = str(tmp_path_factory.mktemp("idx"))
    # small segments + low hot threshold + salts: exercise every scale path
    cfg = BuildConfig(
        segment_size=100,
        block_size=16,
        n_term_buckets=8,
        hot_df_threshold=50,
        hot_salts=4,
        build_id="t1",
    )
    build_index(spark, df, idx_dir, cfg)
    # oracle over the same corpus with the SAME doc ids
    docs = [
        (r["doc_id"], r["text"])
        for r in assign_doc_ids_window(df).select("doc_id", "text").collect()
    ]
    oracle = BM25Oracle(docs)
    return df, BM25Index(spark, idx_dir), oracle


def _spark_topk(index, query, k=10, method="search", **kw):
    fn = index.search_phrase if method == "phrase" else index.search
    return [(r["doc_id"], r["score"]) for r in fn(query, k=k, **kw).collect()]


def assert_rank_identical(got, want):
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-9), (gs, ws)


@pytest.mark.parametrize("mode", ["exhaustive", "wand"])
@pytest.mark.parametrize("q", QUERIES)
def test_topk_rank_identical(corpus, q, mode):
    _, index, oracle = corpus
    got = _spark_topk(index, q, k=10, mode=mode)
    want = oracle.search(q, k=10)
    assert_rank_identical(got, want)


@pytest.mark.parametrize("q", QUERIES)
def test_topk_rank_identical_bmw_zones(corpus, q):
    """Force the block-max zone-skipping path (cutoff 0) -- must stay exact."""
    _, index, oracle = corpus
    index.exhaustive_cutoff = 0
    try:
        got = _spark_topk(index, q, k=10, mode="wand")
    finally:
        del index.exhaustive_cutoff
    want = oracle.search(q, k=10)
    assert_rank_identical(got, want)


PHRASES = [
    "error in tool call",
    "tool call",
    "the a",
    "the the",           # duplicate term
    "error",             # single-term degenerates to term query
    "zzz_not_a_term qqqq",
    "topic1 rare00001",
]


@pytest.mark.parametrize("p", PHRASES)
def test_phrase_rank_identical(corpus, p):
    _, index, oracle = corpus
    got = _spark_topk(index, p, k=10, method="phrase")
    want = oracle.search_phrase(p, k=10)
    assert_rank_identical(got, want)


def test_phrase_fq(corpus):
    df, index, oracle = corpus
    allowed = {
        r["doc_id"]
        for r in assign_doc_ids_window(df)
        .filter(F.col("role") == "user")
        .select("doc_id")
        .collect()
    }
    got = _spark_topk(index, "error in", k=10, method="phrase", fq="role = 'user'")
    want = oracle.search_phrase("error in", k=10, allowed=allowed)
    assert_rank_identical(got, want)


def test_facet_on_results(corpus):
    df, index, oracle = corpus
    got = {
        r["role"]: r["facet_count"]
        for r in index.facet("error test", "role").collect()
    }
    terms = ["error", "test"]
    ids = assign_doc_ids_window(df).select("doc_id", "role").collect()
    want: dict = {}
    for r in ids:
        tf = oracle.tfs[r["doc_id"]]
        if any(t in tf for t in terms):
            want[r["role"]] = want.get(r["role"], 0) + 1
    assert got == want


def test_and_semantics(corpus):
    _, index, oracle = corpus
    got = _spark_topk(index, "error tool", k=10, op="AND", mode="exhaustive")
    want = oracle.search("error tool", k=10, op="AND")
    assert_rank_identical(got, want)


AND_QUERIES = [
    "error tool",          # two mid-frequency terms
    "the rare00042",       # hot + rare: the block-skipping win shape
    "the a error",         # three terms, two hot
    "topic1 rare00001",    # both selective
    "error zzz_not_a_term",  # OOV conjunct -> empty (Solr MUST semantics)
]


@pytest.mark.parametrize("q", AND_QUERIES)
def test_and_skipping_rank_identical(corpus, q):
    """Conjunction via the segment-kernel intersection path (default mode)
    must match the oracle exactly, with and without forcing tiny blocks."""
    _, index, oracle = corpus
    want = oracle.search(q, k=10, op="AND")
    got = _spark_topk(index, q, k=10, op="AND", use_cache=False)
    assert_rank_identical(got, want)


def test_and_skipping_with_fq_and_deletes(corpus, spark, tmp_path_factory):
    """AND intersection under an fq filter, then under tombstones: the seed
    list carries the filters, so every conjunct inherits them."""
    df, index, oracle = corpus
    allowed = {
        r["doc_id"]
        for r in assign_doc_ids_window(df)
        .filter(F.col("role") == "user")
        .select("doc_id")
        .collect()
    }
    got = _spark_topk(
        index, "error tool", k=10, op="AND", fq="role = 'user'", use_cache=False
    )
    want = oracle.search("error tool", k=10, op="AND", allowed=allowed)
    assert_rank_identical(got, want)


def test_synonym_query(corpus):
    _, index, oracle = corpus
    got = _spark_topk(index, "100GB the", k=10, synonyms=True, mode="exhaustive")
    want = oracle.search("100GB the", k=10, synonyms=True)
    assert_rank_identical(got, want)


def test_fq_filter(corpus):
    df, index, oracle = corpus
    allowed = {
        r["doc_id"]
        for r in assign_doc_ids_window(df)
        .filter(F.col("role") == "user")
        .select("doc_id")
        .collect()
    }
    got = _spark_topk(index, "error test", k=10, fq="role = 'user'")
    want = oracle.search("error test", k=10, allowed=allowed)
    assert_rank_identical(got, want)


def test_per_turn_text_equality(corpus):
    """north_rule invariant: stored turns == source rows under stable order."""
    df, index, _ = corpus
    stored = index.docs().select("conv_id", "turn_idx", "text")
    src = df.select("conv_id", "turn_idx", "text")
    diff = stored.join(src, ["conv_id", "turn_idx"], "full_outer").filter(
        ~(stored["text"].eqNullSafe(src["text"]))
    )
    assert diff.count() == 0
    assert stored.count() == src.count()


def test_offset_paging(corpus):
    _, index, oracle = corpus
    full = oracle.search("the error", k=20)
    page = _spark_topk(index, "the error", k=5, offset=5, mode="exhaustive")
    assert_rank_identical(page, full[5:10])
