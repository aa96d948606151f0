"""topic() pub/sub + daemon() runner: windowed delivery, checkpoint
persistence, and the two-phase exactly-once topic->update pipeline
(streaming/topics.py) -- including crash replay at both crash points."""

import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.plans.manifest import (
    _conditional_put,
    _latest_version,
    read_manifest_data,
)
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.stream_expr import (
    TupleStream,
    _update_sink,
    next_batch_id,
    run_stream_expr,
)
from solr_semantic_importer_spark.sources.transcripts import (
    generate_transcripts,
)
from solr_semantic_importer_spark.streaming.incremental import append_batch
from solr_semantic_importer_spark.streaming.topics import (
    TopicStream,
    run_daemon,
)

CFG = dict(segment_size=64, block_size=16, n_term_buckets=4,
           hot_df_threshold=40, hot_salts=4)
STORED = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _build(spark, tmp_path_factory, name, n_convs, seed):
    df = generate_transcripts(spark, n_convs=n_convs, turns_per_conv=4,
                              seed=seed)
    d = str(tmp_path_factory.mktemp(name))
    build_index(spark, df, d, BuildConfig(build_id=name, **CFG))
    return d


def _append(spark, d, n_convs, seed, batch_id):
    idx = BM25Index(spark, d)
    live = read_manifest_data(idx.data_dir)["build_id"]
    cfg = idx._config_from_manifest(live)
    batch = generate_transcripts(
        spark, n_convs=n_convs, turns_per_conv=4, seed=seed
    ).withColumn("conv_id", F.concat(F.lit(f"s{seed}_"), F.col("conv_id")))
    assert append_batch(batch.select(*STORED), d, cfg, batch_id=batch_id)
    return BM25Index(spark, d)  # fresh handle: new files, new listing


def _match_ids(idx, q):
    return {r["doc_id"] for r in idx.score_matches(q).collect()}


def test_topic_poll_commit_windows(spark, tmp_path_factory):
    d = _build(spark, tmp_path_factory, "tpw", 12, seed=31)
    idx = BM25Index(spark, d)
    ts = TopicStream(idx, idx, "t1", "error")
    w1 = {r["doc_id"] for r in ts.poll().collect()}
    assert w1 == _match_ids(idx, "error") and w1
    ts.commit()
    assert ts.poll().count() == 0  # nothing new
    ts.commit()

    idx2 = _append(spark, d, 6, seed=77, batch_id=0)
    ts2 = TopicStream(idx2, idx2, "t1", "error")  # same persisted topic
    w2 = {r["doc_id"] for r in ts2.poll().collect()}
    assert w2 and not (w1 & w2)  # only the new arrivals
    assert w1 | w2 == _match_ids(idx2, "error")
    # fl projection + ordering + commit-before-poll contract
    rows = ts2.window(0, 10 ** 9).select("doc_id").collect()
    assert [r["doc_id"] for r in rows] == sorted(w1 | w2)
    with pytest.raises(RuntimeError, match="without a prior poll"):
        TopicStream(idx2, idx2, "t9", "error").commit()
    with pytest.raises(ValueError, match="not stored"):
        TopicStream(idx2, idx2, "t8", "error", fl=["nope"]).poll()


def test_topic_standalone_expression(spark, tmp_path_factory):
    d = _build(spark, tmp_path_factory, "tse", 10, seed=32)
    idx = BM25Index(spark, d)
    expr = 'topic(ck, src, id="tx", q="error", fl="conv_id,role")'
    colls = {"ck": idx, "src": idx}
    first = run_stream_expr(idx, expr, collections=colls).collect()
    assert first and set(first[0].asDict()) == {"doc_id", "conv_id", "role"}
    # standalone topic commits at eval: a second eval starts empty
    assert run_stream_expr(idx, expr, collections=colls).count() == 0
    with pytest.raises(ValueError, match="run_daemon"):
        run_stream_expr(idx, 'daemon(id="d", update(dest, ' + expr + '))',
                        collections=colls)


def test_daemon_exactly_once_and_incremental(spark, tmp_path_factory):
    ds = _build(spark, tmp_path_factory, "dsrc", 12, seed=33)
    dd = _build(spark, tmp_path_factory, "ddst", 3, seed=34)
    src, dest = BM25Index(spark, ds), BM25Index(spark, dd)
    n0 = dest.docs().count()
    colls = {"src": src, "dest": dest, "ck": src}
    expr = ('daemon(id="d1", terminate="true", runInterval="0", '
            'update(dest, topic(ck, src, id="td", q="error")))')
    out = run_daemon(src, expr, collections=colls, max_runs=5)
    n_match = len(_match_ids(src, "error"))
    assert sum(o["batchIndexed"] for o in out) == n_match
    dest = BM25Index(spark, dd)
    assert dest.docs().count() == n0 + n_match
    # the landed docs are queryable in dest
    assert dest.search("error", k=5, use_cache=False).count() > 0
    # idempotent re-run: no new window, nothing indexed
    assert run_daemon(src, expr, collections=colls, max_runs=3) == []
    assert BM25Index(spark, dd).docs().count() == n0 + n_match
    # new arrivals: only the delta flows
    src2 = _append(spark, ds, 5, seed=88, batch_id=0)
    colls2 = {"src": src2, "dest": BM25Index(spark, dd), "ck": src2}
    out2 = run_daemon(src2, expr, collections=colls2, max_runs=5)
    delta = len(_match_ids(src2, "error")) - n_match
    assert delta > 0 and sum(o["batchIndexed"] for o in out2) == delta
    assert BM25Index(spark, dd).docs().count() == n0 + n_match + delta


def test_daemon_crash_replay_both_points(spark, tmp_path_factory):
    ds = _build(spark, tmp_path_factory, "csrc", 10, seed=35)
    dd = _build(spark, tmp_path_factory, "cdst", 2, seed=36)
    src, dest = BM25Index(spark, ds), BM25Index(spark, dd)
    n0 = dest.docs().count()
    ts = TopicStream(src, src, "tc", "error")
    n_match = len(_match_ids(src, "error"))
    hi = ts.high_water()
    bid = next_batch_id(dest)

    # crash point 1: intent written, nothing landed
    _conditional_put(ts.ckpt_dir, _latest_version(ts.ckpt_dir),
                     {"checkpoint": 0, "pending_hi": hi, "batch_id": bid,
                      "q": "error"})
    expr = ('daemon(id="d2", terminate="true", '
            'update(dest, topic(ck, src, id="tc", q="error")))')
    colls = {"src": src, "dest": dest, "ck": src}
    out = run_daemon(src, expr, collections=colls, max_runs=3)
    assert sum(o["batchIndexed"] for o in out) == n_match
    assert BM25Index(spark, dd).docs().count() == n0 + n_match
    sealed = read_manifest_data(ts.ckpt_dir)
    assert sealed == {"checkpoint": hi, "q": "error"}

    # crash point 2: intent written AND batch landed, seal missing
    src2 = _append(spark, ds, 4, seed=89, batch_id=0)
    ts2 = TopicStream(src2, src2, "tc", "error")
    hi2 = ts2.high_water()
    delta_ids = _match_ids(src2, "error") - _match_ids(src, "error")
    bid2 = next_batch_id(BM25Index(spark, dd))
    _conditional_put(ts2.ckpt_dir, _latest_version(ts2.ckpt_dir),
                     {"checkpoint": hi, "pending_hi": hi2, "batch_id": bid2,
                      "q": "error"})
    win = ts2.window(hi, hi2)
    _update_sink(BM25Index(spark, dd),
                 TupleStream(win, (("doc_id", "asc"),)), batch_id=bid2)
    mid = BM25Index(spark, dd).docs().count()
    assert mid == n0 + n_match + len(delta_ids)
    colls2 = {"src": src2, "dest": BM25Index(spark, dd), "ck": src2}
    out2 = run_daemon(src2, expr, collections=colls2, max_runs=3)
    # replay reports the already-landed rows, indexes nothing twice
    assert sum(o["batchIndexed"] for o in out2) == len(delta_ids)
    assert BM25Index(spark, dd).docs().count() == mid
    assert read_manifest_data(ts2.ckpt_dir) == {"checkpoint": hi2,
                                                "q": "error"}


def test_update_sink_explicit_batch_id_is_idempotent(spark,
                                                     tmp_path_factory):
    dd = _build(spark, tmp_path_factory, "udst", 2, seed=37)
    dest = BM25Index(spark, dd)
    n0 = dest.docs().count()
    batch = generate_transcripts(spark, n_convs=2, turns_per_conv=3,
                                 seed=90).select(*STORED)
    bid = next_batch_id(dest)
    s = TupleStream(batch, ())
    r1 = _update_sink(dest, s, batch_id=bid).df.first()
    r2 = _update_sink(BM25Index(spark, dd), s, batch_id=bid).df.first()
    assert r1["totalIndexed"] == r2["totalIndexed"] == 6
    assert r1["batchNumber"] == r2["batchNumber"] == bid
    assert BM25Index(spark, dd).docs().count() == n0 + 6


def test_topic_tuples_hide_internal_columns(spark, tmp_path_factory):
    """Review fix: default topic projection = stored fields only."""
    d = _build(spark, tmp_path_factory, "thc", 6, seed=61)
    idx = BM25Index(spark, d)
    row = TopicStream(idx, idx, "th", "error").poll().first()
    cols = set(row.asDict())
    assert "dl" not in cols and "segment_id" not in cols
    assert {"doc_id", "conv_id", "text", "role"} <= cols


def test_lazy_update_over_topic_fails_loud(spark, tmp_path_factory):
    """Review fix: the lazy update(topic()) composition would commit the
    checkpoint before the append lands -- routed to run_daemon instead."""
    d = _build(spark, tmp_path_factory, "tlz", 4, seed=62)
    idx = BM25Index(spark, d)
    with pytest.raises(ValueError, match="run_daemon"):
        run_stream_expr(
            idx, 'update(dest, topic(ck, src, id="t", q="error"))',
            collections={"dest": idx, "ck": idx, "src": idx})


def test_append_batch_refuses_generation_pointer_root(spark,
                                                      tmp_path_factory):
    """Review fix: appending at a compacted index ROOT would un-publish
    the generation pointer -- fail loud, append into data_dir instead."""
    d = _build(spark, tmp_path_factory, "tgen", 6, seed=63)
    idx = BM25Index(spark, d)
    idx.compact()
    idx2 = BM25Index(spark, d)
    assert idx2.data_dir != d  # re-rooted onto the generation subdir
    live = read_manifest_data(idx2.data_dir)["build_id"]
    cfg = idx2._config_from_manifest(live)
    batch = generate_transcripts(spark, n_convs=1, turns_per_conv=2,
                                 seed=64).select(*STORED)
    with pytest.raises(ValueError, match="generation pointer"):
        append_batch(batch, d, cfg, batch_id=0)
    # the data_dir append path still works
    assert append_batch(batch, idx2.data_dir, cfg, batch_id=0)
