"""Tiered segment merge for incrementally-built indexes.

Streaming appends (streaming/incremental.py) add one postings/dictionary/
stats increment per micro-batch: after thousands of batches a term's posting
list is scattered over thousands of tiny files and block_ids collide across
batch runs. This is exactly the small-segment proliferation Lucene solves
with background segment merges (the reference leans on Solr's autoCommit +
merge policy, solrconfig.xml:292-306); :func:`merge_postings` is the
Spark-native form.

What it does (one pass, three relations, doc ids UNCHANGED):

- postings: decode every block back to (term, segment_id, doc_id, tf, dl
  [, positions]) in an Arrow kernel, then re-run the build's salted
  single-shuffle encoder -- each (term, segment, salt) becomes one
  doc-ordered run of full blocks with freshly-numbered block_ids, and hot
  terms get proper global-df salting (appends always write salt=0 because a
  batch can't see global df).
- dictionary: groupBy(term) sum(df, cf) -> one row per term per bucket.
- corpus_stats: summed to a single row.

Because tf/dl/doc ids/df-sums are preserved exactly, every query result is
hash-identical before and after the merge; phrase queries additionally
REQUIRE a merge once batch runs collide on (segment, salt, block_id), since
the positional kernel orders runs by block_id.

Commit protocol: each relation is rebuilt in a ``<rel>.merge`` staging dir
and swapped in under a manifest step (write-audit-publish). The swap is two
directory renames on a local FS; on an object store the same seam is a
manifest generation pointer (plans/manifest.py docstring).
"""

from __future__ import annotations

import os
import shutil
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.codec import varint_decode
from ..plans.manifest import Manifest, dir_bytes
from .build import (
    INDEX_PARQUET_CODEC,
    POSTINGS_SCHEMA,
    BuildConfig,
    write_stats_parquet,
)

_PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("segment_id", T.LongType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("dl", T.IntegerType(), False),
        T.StructField("positions", T.ArrayType(T.IntegerType()), True),
    ]
)


def _decode_postings_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Posting blocks -> raw (term, segment, doc, tf, dl, positions) rows.
    One vectorized decode per block; positions are split per posting with
    the same absolute-restart convention the encoder writes."""
    for pdf in batches:
        outs = []
        for row in pdf.itertuples(index=False):
            n = int(row.count)
            gaps = varint_decode(row.doc_gaps, n)
            docs = np.cumsum(gaps).astype(np.int64)
            tf = varint_decode(row.tfs, n).astype(np.int64)
            dl = varint_decode(row.dls, n).astype(np.int64)
            out = pd.DataFrame(
                {
                    "term": row.term,
                    "segment_id": np.int64(row.segment_id),
                    "doc_id": docs,
                    "tf": tf.astype(np.int32),
                    "dl": dl.astype(np.int32),
                }
            )
            if getattr(row, "positions", None) is not None:
                pdeltas = varint_decode(row.positions, int(tf.sum())).astype(np.int64)
                c = np.cumsum(pdeltas)
                starts = np.zeros(n + 1, dtype=np.int64)
                np.cumsum(tf, out=starts[1:])
                base = c[starts[:-1]] - pdeltas[starts[:-1]]
                abs_pos = (c - np.repeat(base, tf)).astype(np.int32)
                out["positions"] = np.split(abs_pos, starts[1:-1])
            else:
                out["positions"] = None
            outs.append(out)
        if outs:
            yield pd.concat(outs, ignore_index=True)


_MERGE_RELS = ("postings", "dictionary", "corpus_stats")


def _swap_in(index_dir: str, rel: str) -> None:
    """Publish <rel>.merge over <rel> (local-FS rename pair; object-store
    deployments replace this with a manifest generation pointer).

    Crash windows and their recovery (see :func:`recover_interrupted_swap`):
    between the two os.replace calls the live dir is MISSING (.old and
    .merge both present); a crash mid-SEQUENCE (one rel swapped, another
    not) leaves a mixed old/new state -- which is still query-consistent,
    because the merge preserves doc ids, tf/dl and df-sums exactly (results
    are hash-identical across the merge), and the uncommitted manifest step
    makes the re-run redo the merge idempotently."""
    live = os.path.join(index_dir, rel)
    staged = live + ".merge"
    old = live + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.replace(live, old)
    os.replace(staged, live)
    shutil.rmtree(old, ignore_errors=True)


def recover_interrupted_swap(index_dir: str) -> list[str]:
    """Repair a merge publish that crashed mid-:func:`_swap_in`: any relation
    whose live dir is missing gets the staged ``<rel>.merge`` promoted
    (staging is complete before ANY swap starts, so it is always whole), or
    failing that the ``<rel>.old`` backup restored. Cheap no-op in the
    normal case (three existence checks); called on index open and at the
    top of :func:`merge_postings`. Returns the recovered relation names."""
    recovered = []
    for rel in _MERGE_RELS:
        live = os.path.join(index_dir, rel)
        if os.path.exists(live):
            continue
        staged, old = live + ".merge", live + ".old"
        if os.path.exists(staged):
            os.replace(staged, live)
            recovered.append(rel)
        elif os.path.exists(old):
            os.replace(old, live)
            recovered.append(rel)
    return recovered


def merge_postings(
    spark: SparkSession,
    index_dir: str,
    config: BuildConfig | None = None,
    merge_id: str | None = None,
) -> dict:
    """Merge all postings runs (and dictionary/stats increments) in place.
    Returns {blocks_before, blocks_after, files_before, files_after}.

    ``config`` defaults to the layout recorded in the manifest (same
    segment_size/block_size/buckets/hot-salting as the original build).
    """
    from ..plans.manifest import read_manifest_data
    from ..query.engine import BM25Index  # config reconstruction helper

    idx = BM25Index(spark, index_dir)  # __init__ runs recover_interrupted_swap
    data_dir = idx.data_dir  # resolves a compaction generation pointer
    cfg = config or idx._config_from_manifest(merge_id or "merge-1")
    # join the EXISTING manifest (same build_id): the merge is one more step
    # of this index's history -- a fresh build_id would discard the batch
    # steps and finalize metrics (next_doc_id cursor, layout) on load
    live_build_id = (read_manifest_data(data_dir) or {}).get("build_id", "merge")
    man = Manifest(data_dir, live_build_id)

    post_path = os.path.join(data_dir, "postings")
    dict_path = os.path.join(data_dir, "dictionary")
    stats_path = os.path.join(data_dir, "corpus_stats")

    def count_files(path: str) -> int:
        return sum(len(fs) for _, _, fs in os.walk(path))

    files_before = count_files(post_path)
    post = spark.read.parquet(post_path)
    blocks_before = post.count()

    def step_merge_postings():
        pairs = post.mapInPandas(_decode_postings_kernel, schema=_PAIRS_SCHEMA)
        if not cfg.store_positions:
            pairs = pairs.drop("positions")
        # global-df hot list (appends couldn't salt; the merge can)
        d = spark.read.parquet(dict_path)
        hot_terms = [
            r["term"]
            for r in d.groupBy("term")
            .agg(F.sum("df").alias("df"))
            .filter(F.col("df") >= cfg.hot_df_threshold)
            .select("term")
            .collect()
        ]
        from .build import _make_partition_encoder

        n_salts = (
            F.when(F.col("term").isin(hot_terms), F.lit(cfg.hot_salts)).otherwise(
                F.lit(1)
            )
            if hot_terms
            else F.lit(1)
        )
        p = pairs.withColumn(
            "salt",
            ((F.col("doc_id") % cfg.segment_size) * n_salts / cfg.segment_size).cast(
                "int"
            ),
        )
        shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        enc = (
            p.repartition(shuffle_n, "term", "segment_id", "salt")
            .sortWithinPartitions("term", "segment_id", "salt", "doc_id")
            .mapInPandas(_make_partition_encoder(cfg.block_size), schema=POSTINGS_SCHEMA)
            .withColumn(
                "bucket",
                F.pmod(F.xxhash64("term"), F.lit(cfg.n_term_buckets)).cast("int"),
            )
        )
        enc.write.mode("overwrite").option(
            "compression", INDEX_PARQUET_CODEC
        ).partitionBy("bucket").parquet(post_path + ".merge")

        merged_dict = d.groupBy("term", "bucket").agg(
            F.sum("df").alias("df"), F.sum("cf").alias("cf")
        ).select("term", "df", "cf", "bucket")
        merged_dict.repartition(cfg.n_term_buckets, "bucket").write.mode(
            "overwrite"
        ).option("compression", INDEX_PARQUET_CODEC).partitionBy(
            "bucket"
        ).parquet(dict_path + ".merge")

        st = spark.read.parquet(stats_path).agg(
            F.sum("n_docs").alias("n_docs"), F.sum("sum_dl").alias("sum_dl")
        ).collect()[0]
        write_stats_parquet(
            stats_path + ".merge", int(st["n_docs"]), int(st["sum_dl"] or 0)
        )

        # audit done -> publish all three relations
        for rel in ("postings", "dictionary", "corpus_stats"):
            _swap_in(data_dir, rel)
        return blocks_before, dir_bytes(post_path), {"hot_terms": len(hot_terms)}

    man.run_step(f"merge-{merge_id or cfg.build_id}", step_merge_postings)
    merged = spark.read.parquet(post_path)
    return {
        "blocks_before": int(blocks_before),
        "blocks_after": int(merged.count()),
        "files_before": files_before,
        "files_after": count_files(post_path),
    }
