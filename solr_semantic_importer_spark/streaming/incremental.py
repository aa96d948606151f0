"""Structured Streaming ingestion: incremental, resumable index builds.

The reference is batch-with-streaming-internals: a bounded crawl pushed
through Reactor Flux publishers with a 30k-doc backpressure buffer
(/root/reference/src/main/java/com/krickert/search/indexer/solr/vector/event/
SolrSourceDocumentPublisher.java:17,22-25; parallel consumption
SubscriptionManager.java:49-56; completion polling
SolrSemanticIndexer.java:132-183). Spark-first, that machinery becomes
Structured Streaming: ``readStream`` -> ``foreachBatch`` -> per-micro-batch
segment build, with the checkpoint + manifest replacing the tracker/watchdog.

Design (Lucene-like segment-per-batch, the standard incremental-index shape):

- each micro-batch allocates a contiguous doc-id range ``[base, base+n)``
  from the manifest (``next_doc_id``), orders rows by the stable
  ``(conv_id, turn_idx)`` key within the batch, and writes its own postings /
  dictionary / stats *increments* (parquet append).
- global stats stay additive: corpus_stats rows sum to (N, sum_dl);
  dictionary df rows sum per term (BM25Index aggregates on read).
- exactly-once: the manifest commits step ``batch-<id>`` after the batch's
  writes; a foreachBatch replay of a committed id is a no-op (the engine-side
  analog of Solr's idempotent add-by-uniqueKey upsert,
  SolrIndexerIntegrationTest.java:69-79).
- backpressure: ``maxFilesPerTrigger`` bounds batch size (the analog of the
  30k buffer); late/out-of-order data needs no watermark for indexing
  because doc identity is (conv_id, turn_idx) upsert.

Blocks store avgdl-INDEPENDENT stats (max_tf, min_dl); the query side derives
the WAND upper bound from them with the CURRENT global avgdl, so appended
segments keep exact block-max pruning no matter how far avgdl drifts after
the batch was written (a baked-in max_tf_norm would stop being an upper
bound once global avgdl grows past the batch-local value).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.build import (
    INDEX_PARQUET_CODEC,
    POSTINGS_SCHEMA,
    BuildConfig,
    _make_partition_encoder,
    write_stats_parquet,
)
from ..index.docids import SORT_KEYS, assign_doc_ids
from ..functions.analysis import make_positions_udf, term_freqs_udf
from ..plans.manifest import Manifest, dir_bytes, read_manifest_data
from ..sources.transcripts import TRANSCRIPT_SCHEMA

_BATCH_RELATIONS = ("docs", "corpus_stats", "dictionary", "postings")


def _batch_tag(batch_id: int) -> str:
    return f"b{batch_id}"


def _purge_batch_files(index_dir: str, tag: str) -> None:
    """Delete every file a previous UNCOMMITTED attempt of this batch may
    have left behind (tagged file names + staging dirs), so a foreachBatch
    replay starts from a clean slate instead of double-appending rows."""
    for rel in _BATCH_RELATIONS:
        base = os.path.join(index_dir, rel)
        if not os.path.isdir(base):
            continue
        for root, _dirs, files in os.walk(base):
            for fn in files:
                if fn.startswith(f"{tag}-"):
                    os.remove(os.path.join(root, fn))
    for d in glob.glob(os.path.join(index_dir, f"_staging_{tag}_*")):
        shutil.rmtree(d, ignore_errors=True)


def _publish_staged(staging: str, target: str, tag: str) -> None:
    """Move the staged parquet files into the live relation dir, preserving
    partition subdirs (bucket=N/...) and prefixing every file with the batch
    tag. Per-file renames are atomic; a crash mid-publish leaves only tagged
    files that the replay purge removes."""
    for root, _dirs, files in os.walk(staging):
        rel = os.path.relpath(root, staging)
        for fn in files:
            if fn.startswith(("_", ".")):  # _SUCCESS / checksum sidecars
                continue
            dst_dir = target if rel == "." else os.path.join(target, rel)
            os.makedirs(dst_dir, exist_ok=True)
            os.replace(os.path.join(root, fn), os.path.join(dst_dir, f"{tag}-{fn}"))
    shutil.rmtree(staging, ignore_errors=True)


def next_batch_id(index_dir: str) -> int:
    """The next free ``batch-<id>`` slot in the manifest at ``index_dir``.
    Loads it under its LIVE build_id -- a mismatched id sees an empty step
    table (Manifest treats it as a fresh build) and would hand out slot 0
    forever."""
    live = (read_manifest_data(index_dir) or {}).get("build_id", "update")
    man = Manifest(index_dir, live)
    nxt = 0
    for name, st in man.steps.items():
        if name.startswith("batch-") and st.status == "committed":
            nxt = max(nxt, int(name.split("-", 1)[1]) + 1)
    return nxt


def append_batch(
    batch_df: DataFrame, index_dir: str, cfg: BuildConfig, batch_id: int
) -> bool:
    """Index one micro-batch as a new doc-id range. Returns False if the
    batch id was already committed (foreachBatch replay after failure).

    Exactly-once protocol (single writer; readers open between appends):
    every relation is written to a batch-scoped STAGING dir, then its files
    are moved into the live dirs under a ``b<batch_id>-`` name prefix, and
    only then does the manifest commit step ``batch-<id>``. A replay of an
    uncommitted id first deletes all files carrying its tag -- a crash at
    any point therefore never double-counts docs, df, or postings."""
    spark = batch_df.sparkSession
    if cfg.copy_fields:
        raise ValueError(
            "streaming append_batch does not support copy_fields; "
            "build multi-field indexes with index.build.build_index"
        )
    os.makedirs(index_dir, exist_ok=True)
    live = read_manifest_data(index_dir)
    if live is not None and live.get("generation"):
        # generation-pointer root (post-compaction): appending HERE would
        # flush a manifest without the pointer, silently un-publishing the
        # compaction and re-rooting readers onto stale relations
        raise ValueError(
            f"{index_dir!r} is a generation pointer "
            f"({live['generation']!r}): append into the generation "
            f"subdirectory (BM25Index.data_dir), not the root"
        )
    if live is not None and live.get("steps") \
            and live.get("build_id") != cfg.build_id:
        # manifest steps are keyed by build_id: a mismatched id would see
        # an EMPTY step table, restart doc ids at 0 and silently corrupt
        # every doc-id join -- fail loud instead
        raise ValueError(
            f"append_batch onto an index whose live build_id is "
            f"{live.get('build_id')!r} requires cfg.build_id to match "
            f"(got {cfg.build_id!r})"
        )
    man = Manifest(index_dir, cfg.build_id)
    step = f"batch-{batch_id}"
    if man.is_committed(step):
        return False
    tag = _batch_tag(batch_id)
    _purge_batch_files(index_dir, tag)
    base = _next_doc_id(man)

    def _stage(rel: str) -> str:
        return os.path.join(index_dir, f"_staging_{tag}_{rel}")

    def run():
        ids = assign_doc_ids(batch_df, start=base)
        a = ids.withColumn(
            "segment_id", (F.col("doc_id") / cfg.segment_size).cast("long")
        )
        if cfg.store_positions:
            # same per-chain analysis the batch build uses (a streamed
            # text_en request must NOT silently downgrade to text_general)
            a = a.withColumn(
                "tfmap", make_positions_udf(cfg.analyzer)(F.col("text"))
            ).withColumn(
                "dl",
                F.coalesce(
                    F.aggregate(
                        F.map_values("tfmap"), F.lit(0), lambda a_, x: a_ + F.size(x)
                    ),
                    F.lit(0),
                ),
            )
        else:
            if cfg.analyzer != "text_general":
                raise ValueError(
                    "non-default analyzer chains require store_positions=True"
                )
            a = a.withColumn("tfmap", term_freqs_udf(F.col("text"))).withColumn(
                "dl",
                F.coalesce(
                    F.aggregate(F.map_values("tfmap"), F.lit(0), lambda a_, x: a_ + x),
                    F.lit(0),
                ),
            )
        analyzed = a.persist()
        docs = analyzed.drop("tfmap")
        # partitionBy(segment_id): the SAME hive layout index.build writes
        # -- a flat file here next to build_index's segment_id=N/ subdirs
        # would collide with partition discovery (COLUMN_ALREADY_EXISTS)
        # and silently hide the appended docs from every reader
        docs.write.mode("overwrite").option(
            "compression", INDEX_PARQUET_CODEC
        ).partitionBy("segment_id").parquet(_stage("docs"))
        if cfg.store_positions:
            pairs = analyzed.select(
                "doc_id", "segment_id", "dl",
                F.explode("tfmap").alias("term", "positions"),
            ).select(
                "doc_id", "segment_id", "dl", "term",
                F.size("positions").alias("tf"), "positions",
            ).persist()
        else:
            pairs = analyzed.select(
                "doc_id", "segment_id", "dl", F.explode("tfmap").alias("term", "tf")
            ).persist()
        stats = analyzed.agg(
            F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
        ).collect()[0]
        n, sum_dl = int(stats["n_docs"]), int(stats["sum_dl"] or 0)
        write_stats_parquet(_stage("corpus_stats"), n, sum_dl)
        d = (
            pairs.groupBy("term")
            .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
            .withColumn(
                "bucket",
                F.pmod(F.xxhash64("term"), F.lit(cfg.n_term_buckets)).cast("int"),
            )
        )
        d.repartition(cfg.n_term_buckets, "bucket").write.mode("overwrite").option(
            "compression", INDEX_PARQUET_CODEC
        ).partitionBy(
            "bucket"
        ).parquet(_stage("dictionary"))
        shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        salted = pairs.withColumn("salt", F.lit(0))  # hot-splitting: batch-local
        enc = (
            salted.repartition(shuffle_n, "term", "segment_id", "salt")
            .sortWithinPartitions("term", "segment_id", "salt", "doc_id")
            .mapInPandas(
                _make_partition_encoder(cfg.block_size), schema=POSTINGS_SCHEMA
            )
            .withColumn(
                "bucket",
                F.pmod(F.xxhash64("term"), F.lit(cfg.n_term_buckets)).cast("int"),
            )
        )
        enc.write.mode("overwrite").option(
            "compression", INDEX_PARQUET_CODEC
        ).partitionBy("bucket").parquet(_stage("postings"))
        analyzed.unpersist()
        pairs.unpersist()
        # all staged; publish (per-file atomic renames, tagged for recovery)
        for rel in _BATCH_RELATIONS:
            _publish_staged(_stage(rel), os.path.join(index_dir, rel), tag)
        return n, dir_bytes(index_dir), {"base": base, "next_doc_id": base + n}

    man.run_step(step, run)
    # advance the global id cursor (also re-derivable from batch steps)
    man.commit(
        "finalize",
        rows=0,
        next_doc_id=int(man.steps[step].metrics["next_doc_id"]),
        n_term_buckets=cfg.n_term_buckets,
        segment_size=cfg.segment_size,
        block_size=cfg.block_size,
        analyzer=cfg.analyzer,
        store_positions=cfg.store_positions,
        hot_df_threshold=cfg.hot_df_threshold,
        hot_salts=cfg.hot_salts,
    )
    return True


def _next_doc_id(man: Manifest) -> int:
    nxt = 0
    # a batch-built index carries the cursor in its batch steps; an index
    # created by index.build.build_index assigned ids 0..n_docs-1 and
    # recorded n_docs in finalize -- appends onto it must start there, not
    # at 0 (duplicate doc_ids would silently corrupt every doc-id join)
    fin = man.steps.get("finalize")
    if fin is not None and fin.status == "committed":
        nxt = int(fin.metrics.get("n_docs", 0))
    for name, s in man.steps.items():
        if name.startswith("batch-") and s.status == "committed":
            nxt = max(nxt, int(s.metrics.get("next_doc_id", 0)))
    return nxt


def stream_build(
    spark: SparkSession,
    src_dir: str,
    index_dir: str,
    cfg: BuildConfig,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """File-source streaming index build: drain all available input
    (Trigger.AvailableNow), one segment range per micro-batch, resumable via
    the Spark checkpoint AND the manifest (either alone suffices)."""
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(src_dir)

    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: append_batch(
                bdf.sortWithinPartitions(*SORT_KEYS), index_dir, cfg, bid
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming windowed aggregation with late-data watermark (SURVEY 2.10:
    the reference has none of this; it is the Spark-native form its
    backpressure/completion machinery would take at unbounded scale).

    Works identically on a batch frame (no watermark applied) and a streaming
    frame -- tests assert batch/stream equivalence.
    """
    ts = F.col("ts").cast("timestamp")
    df = events.withColumn("_ts", ts)
    if df.isStreaming:
        df = df.withWatermark("_ts", watermark)
    return (
        df.groupBy(F.window("_ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("event_type"),
            F.col("n"),
        )
    )
