"""Stable dense doc-id assignment over (conv_id, turn_idx).

Rank-identity of BM25 top-k requires a canonical tie-break order (SURVEY.md
section 4.2): ``doc_id`` must be a deterministic, reproducible function of the
corpus -- the analog of the reference's zero-padded chunk ids whose
lexicographic order equals logical order (ChunkDocumentCreator.java:76-79).
``monotonically_increasing_id`` is NOT acceptable (partition-layout dependent).

Two implementations, asserted equal in tests:

- :func:`assign_doc_ids` (default, scalable): range-repartition by the sort
  key, sort within partitions, count rows per partition (cheap first pass on
  the persisted DF), then a mapInPandas pass adds ``offset[pid] + local_rank``.
  Two linear passes, ONE range shuffle, no global single-partition window --
  this survives 10^12 rows.
- :func:`assign_doc_ids_window` (oracle-sized corpora only): plain
  ``row_number() OVER (ORDER BY conv_id, turn_idx) - 1`` -- a single-partition
  window, used as the semantic definition in tests and DuckDB oracles.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

SORT_KEYS = ["conv_id", "turn_idx"]


def assign_doc_ids_window(df: DataFrame) -> DataFrame:
    w = Window.orderBy(*SORT_KEYS)
    return df.withColumn("doc_id", F.row_number().over(w).cast("long") - 1)


def assign_doc_ids(
    df: DataFrame, num_partitions: int | None = None, start: int = 0
) -> DataFrame:
    """Scalable stable ids: range partition -> local sort -> offset + rank.

    ``start`` offsets the id space (streaming/incremental builds allocate a
    contiguous range per micro-batch; see streaming/incremental.py).

    Only the KEY COLUMNS take the range shuffle + Python hop; the full rows
    (text payloads) join the ids afterwards -- at 10^12 rows the wide columns
    cross the wire once (the join shuffle) instead of twice, and never enter
    Python here.

    SORT_KEYS must be unique (the engine's uniqueKey contract): duplicates
    would fan out the id join n^2-style and silently duplicate rows under
    multiple doc_ids. The id kernel FAILS FAST on the first duplicate it
    sees -- range partitioning routes equal keys to the same partition and
    the partition is sorted, so adjacent-equality inside the kernel catches
    every duplicate with zero extra jobs. Callers with upsert-shaped input
    must resolve winners first (operators/transforms.upsert_by_key)."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    keys = df.select(*SORT_KEYS)
    ranged = (
        keys.repartitionByRange(num_partitions, *SORT_KEYS)
        .sortWithinPartitions(*SORT_KEYS)
        .withColumn("_pid", F.spark_partition_id())
    )
    # persist so the count pass and the id pass see the same partitioning
    ranged = ranged.persist()
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    out_schema = T.StructType(
        keys.schema.fields + [T.StructField("doc_id", T.LongType(), False)]
    )
    in_cols = keys.columns

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        prev_key: tuple | None = None  # last key of the previous Arrow batch
        for pdf in batches:
            if len(pdf) == 0:
                continue
            dup = (pdf[in_cols] == pdf[in_cols].shift()).all(axis=1)
            if prev_key is not None:
                dup.iloc[0] = tuple(pdf[in_cols].iloc[0]) == prev_key
            if dup.any():
                bad = tuple(pdf[in_cols][dup].iloc[0])
                raise ValueError(
                    f"duplicate sort key {dict(zip(in_cols, bad))}: "
                    f"{in_cols} must be unique (uniqueKey contract); "
                    "dedup/upsert the input first"
                )
            prev_key = tuple(pdf[in_cols].iloc[-1])
            pid = int(pdf["_pid"].iloc[0])
            out = pdf[in_cols].copy()
            out["doc_id"] = offsets[pid] + local + pd.RangeIndex(len(pdf))
            local += len(pdf)
            yield out

    ids = ranged.mapInPandas(add_ids, schema=out_schema)
    return df.join(ids, SORT_KEYS)
