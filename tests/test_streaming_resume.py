"""Structured Streaming incremental build, resume/idempotence, skew, verify."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.index.verify import assert_verified, verify_turn_equality
from solr_semantic_importer_spark.plans.manifest import Manifest
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts
from solr_semantic_importer_spark.streaming.incremental import (
    stream_build,
    windowed_event_counts,
)

CFG = dict(segment_size=128, block_size=32, n_term_buckets=4,
           hot_df_threshold=100, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark):
    return generate_transcripts(spark, n_convs=60, turns_per_conv=5, seed=7).persist()


def _topk(idx, q, k=10):
    return [
        (r["doc_id"], round(r["score"], 6))
        for r in idx.search(q, k=k, mode="exhaustive").collect()
    ]


def test_stream_build_matches_batch(spark, corpus, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("stream"))
    src = os.path.join(tmp, "src")
    corpus.coalesce(1).write.parquet(src)

    batch_dir = os.path.join(tmp, "idx_batch")
    build_index(spark, spark.read.parquet(src), batch_dir,
                BuildConfig(build_id="b", **CFG))

    stream_dir = os.path.join(tmp, "idx_stream")
    stream_build(spark, src, stream_dir, BuildConfig(build_id="s", **CFG),
                 checkpoint_dir=os.path.join(tmp, "cp"))

    bi, si = BM25Index(spark, batch_dir), BM25Index(spark, stream_dir)
    assert si.n_docs == bi.n_docs
    assert abs(si.avgdl - bi.avgdl) < 1e-9
    for q in ["error in tool call", "the", "topic42 topic7"]:
        assert _topk(si, q) == _topk(bi, q)
    # streaming checkpoint replay: rerunning the drained stream is a no-op
    stream_build(spark, src, stream_dir, BuildConfig(build_id="s", **CFG),
                 checkpoint_dir=os.path.join(tmp, "cp"))
    assert BM25Index(spark, stream_dir).n_docs == bi.n_docs


def test_stream_multibatch_stats_additive(spark, corpus, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("stream2"))
    src = os.path.join(tmp, "src")
    # 4 files -> maxFilesPerTrigger=1 -> 4 micro-batches
    corpus.repartition(4).write.parquet(src)
    idx_dir = os.path.join(tmp, "idx")
    stream_build(spark, src, idx_dir, BuildConfig(build_id="m", **CFG),
                 checkpoint_dir=os.path.join(tmp, "cp"), max_files_per_trigger=1)
    idx = BM25Index(spark, idx_dir)
    n = corpus.count()
    assert idx.n_docs == n
    # df(term) aggregated across batch increments must equal batch-global df
    tmp_batch = os.path.join(tmp, "idx_batch")
    build_index(spark, corpus, tmp_batch, BuildConfig(build_id="b", **CFG))
    bidx = BM25Index(spark, tmp_batch)
    a = {r["term"]: r["df"] for r in idx.dictionary().groupBy("term").agg(F.sum("df").alias("df")).collect()}
    b = {r["term"]: r["df"] for r in bidx.dictionary().collect()}
    assert a == b
    # ranking equality needs doc-id remap (batch order != global sort), so
    # compare via the stable key instead
    sd = idx.docs().select("doc_id", "conv_id", "turn_idx")
    key_of = {r["doc_id"]: (r["conv_id"], r["turn_idx"]) for r in sd.collect()}
    bd = bidx.docs().select("doc_id", "conv_id", "turn_idx")
    bkey_of = {r["doc_id"]: (r["conv_id"], r["turn_idx"]) for r in bd.collect()}
    # full result set (k >= n_docs): per-key scores must agree exactly;
    # truncated top-k may differ only in tie order at the cutoff since the
    # doc-id tie-break reflects ingestion order under streaming.
    for q in ["error in tool call", "topic1 rare00001 the"]:
        a_scores = sorted((key_of[d], s) for d, s in _topk(idx, q, k=10000))
        b_scores = sorted((bkey_of[d], s) for d, s in _topk(bidx, q, k=10000))
        assert a_scores == b_scores


def test_append_batch_replay_purges_partial_output(spark, corpus, tmp_path_factory):
    """Exactly-once under crash-replay: a foreachBatch retry of an
    UNCOMMITTED batch must not double-append docs/stats/dictionary/postings.
    Simulates a crash that published part of batch 1 before the manifest
    committed, then replays batch 1 for real."""
    from solr_semantic_importer_spark.streaming.incremental import append_batch

    tmp = str(tmp_path_factory.mktemp("replay"))
    idx_dir = os.path.join(tmp, "idx")
    cfg = BuildConfig(build_id="rp", **CFG)
    half = corpus.count() // 2
    ordered = corpus.orderBy("conv_id", "turn_idx")
    b0 = ordered.limit(half)
    b1 = ordered.subtract(b0)
    assert append_batch(b0, idx_dir, cfg, 0) is True

    # fake a crashed batch-1 attempt: some of its tagged files landed in the
    # live dirs (docs + corpus_stats), but the manifest never committed
    docs_dir = os.path.join(idx_dir, "docs")
    victims = [f for f in os.listdir(docs_dir) if f.endswith(".parquet")][:1]
    for f in victims:
        shutil.copyfile(
            os.path.join(docs_dir, f), os.path.join(docs_dir, f"b1-crashed-{f}")
        )
    st_dir = os.path.join(idx_dir, "corpus_stats")
    stf = [f for f in os.listdir(st_dir) if f.endswith(".parquet")][0]
    shutil.copyfile(os.path.join(st_dir, stf), os.path.join(st_dir, f"b1-crashed-{stf}"))

    assert append_batch(b1, idx_dir, cfg, 1) is True  # replay after "crash"
    idx = BM25Index(spark, idx_dir)
    n = corpus.count()
    assert idx.n_docs == n  # no double-counted docs or stats rows
    assert idx.docs().count() == n
    assert idx.docs().select("conv_id", "turn_idx").distinct().count() == n
    # committed replay is a no-op
    assert append_batch(b1, idx_dir, cfg, 1) is False


def test_resume_skips_committed_steps(spark, corpus, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("resume"))
    idx_dir = os.path.join(tmp, "idx")
    cfg = BuildConfig(build_id="r1", **CFG)
    build_index(spark, corpus, idx_dir, cfg)
    from solr_semantic_importer_spark.plans.manifest import _latest_version

    # simulate a crash after 'dictionary': drop postings commit + its files
    # (rewrite BOTH the latest version file -- the source of truth -- and
    # the legacy pointer)
    ver = _latest_version(idx_dir)
    for name in (f"_manifest.v{ver}.json", "_manifest.json"):
        man_path = os.path.join(idx_dir, name)
        before = json.load(open(man_path))
        before["steps"].pop("postings", None)
        before["steps"].pop("drop_pairs", None)
        json.dump(before, open(man_path, "w"))
    shutil.rmtree(os.path.join(idx_dir, "postings"))
    docs_mtime = os.path.getmtime(os.path.join(idx_dir, "docs"))

    man = build_index(spark, corpus, idx_dir, cfg)  # resume
    assert man.is_committed("postings")
    # committed steps were NOT rebuilt
    assert os.path.getmtime(os.path.join(idx_dir, "docs")) == docs_mtime

    # full rebuild in a fresh dir is value-identical (idempotence)
    idx2 = os.path.join(tmp, "idx2")
    build_index(spark, corpus, idx2, BuildConfig(build_id="r2", **CFG))
    a, b = BM25Index(spark, idx_dir), BM25Index(spark, idx2)
    for q in ["error in tool call", "the", "caf 100gb"]:
        assert _topk(a, q) == _topk(b, q)


def test_tf_pairs_dropped_after_build(spark, corpus, tmp_path_factory):
    """The uncompressed (doc, term, tf, positions) intermediate is deleted
    after the postings commit by default (it ~doubles index footprint);
    keep_tf_pairs=True opts back in."""
    tmp = str(tmp_path_factory.mktemp("droppairs"))
    d1 = os.path.join(tmp, "idx1")
    build_index(spark, corpus, d1, BuildConfig(build_id="dp1", **CFG))
    assert not os.path.exists(os.path.join(d1, "tf_pairs"))
    assert sorted(
        n for n in os.listdir(d1) if not n.startswith("_")
    ) == ["corpus_stats", "dictionary", "docs", "postings"]
    d2 = os.path.join(tmp, "idx2")
    build_index(spark, corpus, d2,
                BuildConfig(build_id="dp2", keep_tf_pairs=True, **CFG))
    assert os.path.exists(os.path.join(d2, "tf_pairs"))
    # queries identical either way
    a, b = BM25Index(spark, d1), BM25Index(spark, d2)
    for q in ["error in tool call", "the"]:
        assert _topk(a, q) == _topk(b, q)


def test_skew_salting_splits_hot_terms(spark, corpus, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("skew"))
    idx_dir = os.path.join(tmp, "idx")
    # force salting: "the" appears in far more than 10 docs
    cfg = BuildConfig(segment_size=64, block_size=16, n_term_buckets=4,
                      hot_df_threshold=10, hot_salts=4, build_id="sk")
    build_index(spark, corpus, idx_dir, cfg)
    idx = BM25Index(spark, idx_dir)
    post = idx.postings_for(["the"])
    n_salts = post.select("segment_id", "salt").distinct().groupBy("segment_id").count()
    assert n_salts.agg(F.max("count")).collect()[0][0] > 1  # actually split
    # salted postings still doc-ordered and rank-identical to unsalted build
    unsalted = os.path.join(tmp, "idx_nosalt")
    build_index(spark, corpus, unsalted,
                BuildConfig(segment_size=64, block_size=16, n_term_buckets=4,
                            hot_df_threshold=10**9, hot_salts=1, build_id="ns"))
    a, b = idx, BM25Index(spark, unsalted)
    for q in ["the", "the error", "topic1 rare00001 the"]:
        assert _topk(a, q) == _topk(b, q)
    for mode in ("wand",):
        ra = [(r["doc_id"], round(r["score"], 6)) for r in a.search("the error", mode=mode).collect()]
        rb = [(r["doc_id"], round(r["score"], 6)) for r in b.search("the error", mode=mode).collect()]
        assert ra == rb


def test_merge_bounds_runs_and_preserves_results(spark, corpus, tmp_path_factory):
    """Tiered segment merge: 20 micro-batches -> merge -> file/run counts
    bounded, bm25 results hash-identical, phrase path valid (batch runs
    collide on block_id pre-merge, so phrase REQUIRES the merge)."""
    from solr_semantic_importer_spark.index.merge import merge_postings

    tmp = str(tmp_path_factory.mktemp("merge"))
    src = os.path.join(tmp, "src")
    corpus.repartition(20).write.parquet(src)  # 20 files -> 20 micro-batches
    idx_dir = os.path.join(tmp, "idx")
    stream_build(spark, src, idx_dir, BuildConfig(build_id="mg", **CFG),
                 checkpoint_dir=os.path.join(tmp, "cp"), max_files_per_trigger=1)
    idx = BM25Index(spark, idx_dir)
    queries = ["error in tool call", "the", "topic42 topic7"]
    before = {q: _topk(idx, q) for q in queries}
    before_wand = {
        q: [(r["doc_id"], round(r["score"], 6))
            for r in idx.search(q, mode="wand").collect()]
        for q in queries
    }

    stats = merge_postings(spark, idx_dir)
    assert stats["files_after"] < stats["files_before"]
    assert stats["blocks_after"] <= stats["blocks_before"]

    idx2 = BM25Index(spark, idx_dir)
    for q in queries:
        assert _topk(idx2, q) == before[q]
        got_w = [(r["doc_id"], round(r["score"], 6))
                 for r in idx2.search(q, mode="wand").collect()]
        assert got_w == before_wand[q]
    # exactly one run per (term, segment, salt) with unique block ids
    post = idx2._postings()
    assert post.groupBy("term", "segment_id", "salt", "block_id").count().filter(
        "count > 1").count() == 0
    # dictionary consolidated: one row per (term, bucket)
    assert idx2.dictionary().groupBy("term", "bucket").count().filter(
        "count > 1").count() == 0
    # stats consolidated to a single row
    assert spark.read.parquet(os.path.join(idx_dir, "corpus_stats")).count() == 1
    # phrase scores per stable key match a batch-built index (doc ids differ
    # by ingestion order, so compare via (conv_id, turn_idx))
    batch_dir = os.path.join(tmp, "idx_batch")
    build_index(spark, corpus, batch_dir, BuildConfig(build_id="mb", **CFG))
    bidx = BM25Index(spark, batch_dir)
    key_of = {r["doc_id"]: (r["conv_id"], r["turn_idx"])
              for r in idx2.docs().select("doc_id", "conv_id", "turn_idx").collect()}
    bkey_of = {r["doc_id"]: (r["conv_id"], r["turn_idx"])
               for r in bidx.docs().select("doc_id", "conv_id", "turn_idx").collect()}
    for ph in ["error in", "tool call"]:
        a = sorted((key_of[r["doc_id"]], round(r["score"], 6))
                   for r in idx2.search_phrase(ph, k=10000).collect())
        b = sorted((bkey_of[r["doc_id"]], round(r["score"], 6))
                   for r in bidx.search_phrase(ph, k=10000).collect())
        assert a == b
    # re-merge is a committed no-op (manifest step)
    stats2 = merge_postings(spark, idx_dir)
    assert stats2["files_after"] == stats2["files_before"]


def test_verify_turn_equality(spark, corpus, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("verify"))
    idx_dir = os.path.join(tmp, "idx")
    build_index(spark, corpus, idx_dir, BuildConfig(build_id="v", **CFG))
    idx = BM25Index(spark, idx_dir)
    r = assert_verified(corpus, idx.docs())
    assert r["n_matched"] == corpus.count()
    # a corrupted stored turn is detected
    bad = idx.docs().withColumn(
        "text", F.when(F.col("doc_id") == 3, F.lit("CORRUPT")).otherwise(F.col("text"))
    )
    r2 = verify_turn_equality(corpus, bad)
    assert r2["n_mismatch"] == 1


def test_windowed_event_counts_batch_stream_equal(spark, sf_dir, tmp_path_factory):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in windowed_event_counts(ev).collect()
    }
    tmp = str(tmp_path_factory.mktemp("sev"))
    src = os.path.join(tmp, "src")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = windowed_event_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.sql("select * from win_counts").collect()
    }
    assert got == batch
