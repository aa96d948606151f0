"""Batch retrieval (search_many): N queries in ONE postings scan must be
row-identical (round-6 keys, rank order) to N independent search() calls,
across OR / AND / fq / mm / boosts / tombstones. The batch path decodes
each posting block once per segment and shares it across queries -- the
scan-amortization shape for offline workloads."""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)

QUERIES = {
    "hot": "the error",
    "mixed": "error tool window",
    "boosted": "error^2 tool",
    "selective": "tool",
    "oov": "zzzneveraterm",
    "empty": "",
}


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=60, turns_per_conv=6, seed=41)
    idx_dir = str(tmp_path_factory.mktemp("many"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="many", **CFG))
    return df, BM25Index(spark, idx_dir)


def _single(idx, q, k=10, **kw):
    rows = idx.search(q, k=k, use_cache=False, **kw).collect()
    return [(r["doc_id"], round(r["score"], 6)) for r in rows]


def _batch(idx, queries, k=10, **kw):
    rows = idx.search_many(queries, k=k, **kw).collect()
    out = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        out.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(r["score"], 6))
        )
    return out


def test_batch_matches_singles_or(corpus):
    _, idx = corpus
    got = _batch(idx, QUERIES, k=10)
    for qid, qs in QUERIES.items():
        assert got.get(qid, []) == _single(idx, qs, k=10), qid
    assert "oov" not in got and "empty" not in got  # no rows, like search()


def test_batch_matches_singles_and_fq_mm(corpus):
    _, idx = corpus
    qs = {"a": "error tool", "b": "the window"}
    fq = "role = 'user'"
    got = _batch(idx, qs, k=8, fq=fq)
    for qid, q in qs.items():
        assert got.get(qid, []) == _single(idx, q, k=8, fq=fq), qid
    got = _batch(idx, qs, k=8, op="AND")
    for qid, q in qs.items():
        assert got.get(qid, []) == _single(idx, q, k=8, op="AND"), qid
    got = _batch(idx, {"m": "error tool the"}, k=200, mm=2)
    assert got["m"] == _single(idx, "error tool the", k=200, mm=2)


def test_batch_rank_column(corpus):
    _, idx = corpus
    rows = idx.search_many({"q1": "error"}, k=5).collect()
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))


def test_batch_after_delete(corpus):
    """Tombstones flow into the batch kernels through the same cogrouped
    side as search(); identity holds post-delete. (Deletes persist for the
    rest of this module -- later tests compare both paths, so that's
    fine.)"""
    _, idx = corpus
    n = idx.delete_by_query("role = 'tool'")
    assert n > 0
    got = _batch(idx, {"q": "error tool"}, k=10)
    assert got.get("q", []) == _single(idx, "error tool", k=10)


def test_batch_list_input(corpus):
    _, idx = corpus
    got = _batch(idx, ["error", "tool"], k=5)
    assert set(got) == {"error", "tool"}
