"""Sequence packing: documents -> fixed-token-budget training sequences.

A pretraining pipeline's last hop turns tokenized documents into
fixed-length context windows. Two standard disciplines, both here:

- **Concat-and-chunk** (:func:`stream_pack`): documents are concatenated
  into ONE deterministic token stream and cut every ``budget`` tokens.
  Zero padding waste; a document may span a sequence boundary. Each doc
  row gets its global ``stream_pos`` and the ids of the first/last
  sequence it touches. This is pure arithmetic over a global running sum
  — which is the 100 TB trap: ``Window.orderBy`` with no partition key
  collapses the corpus into ONE task. The implementation is the two-pass
  distributed prefix sum instead: range-partition on the order key,
  aggregate per-partition token totals (one tiny row per partition to the
  driver), broadcast the exclusive prefix offsets back, and finish with a
  per-partition window — every task bounded by its partition, driver
  traffic bounded by the partition count.

- **Greedy bin packing** (:func:`bin_pack_greedy`): no document spans a
  sequence; each sequence is a bin of whole documents totalling at most
  ``budget`` tokens (the padding-minimizing discipline for SFT-style
  examples). First-fit with a bounded set of open bins per partition
  (unbounded first-fit is O(n x bins) time and memory); bins are packed
  independently per range partition, so the operator scales by adding
  partitions and never shuffles documents twice. Deterministic: the doc
  order inside a partition is the sorted order key, the open-bin scan is
  first-fit, and bin ids are ``partition_id * 2^33 + local_id``.

The stream discipline has an exact DuckDB twin (:func:`stream_pack_sql`)
checked in pytest — the in-suite parity pattern established by
`operators/sampling.py` (the 50 driver-gate slots each being some
operator's only oracle row).

Scale notes: ``stream_pack`` eagerly ``localCheckpoint``s the
range-partitioned frame — ``repartitionByRange`` SAMPLES its boundaries,
so a recompute after the totals were collected could re-draw boundaries
and mis-align offsets (same correctness pattern as
`operators/dedup.py`'s connected-components loop). A source table already
bucketed/sorted on the order key avoids the checkpoint entirely.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

__all__ = [
    "stream_pack",
    "bin_pack_greedy",
    "packing_stats",
    "stream_pack_sql",
]

_PID_SHIFT = 2**33  # > any realistic docs-per-partition bin count


def stream_pack(
    df: DataFrame,
    *,
    token_col: Column | str,
    order_col: str,
    budget: int,
    parts: int | None = None,
) -> DataFrame:
    """Concat-and-chunk packing. Returns ``df`` +:

    - ``n_tokens`` — the evaluated token count
    - ``stream_pos`` — the doc's first-token offset in the global stream
      (docs ordered by ``order_col`` ascending; pass the unique key — a
      non-unique order makes the stream, and therefore every position,
      ambiguous)
    - ``seq_id`` — ``floor(stream_pos / budget)``, the first sequence the
      doc touches
    - ``seq_id_end`` — the last sequence it touches
    - ``seq_spans`` — true when the doc crosses a sequence boundary
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    n = parts or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    n = int(n)

    # pass 0: range partition on the order key; pin the sampled boundaries
    # (localCheckpoint is EAGER -- the totals collected below and the rows
    # the window sees are guaranteed to be the same physical layout)
    ranked = (
        df.withColumn("n_tokens", tok.cast("long"))
        .repartitionByRange(n, F.col(order_col).asc())
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )

    # pass 1: per-partition token totals -- <= n tiny rows to the driver
    totals = {
        r["_pid"]: r["t"]
        for r in ranked.groupBy("_pid").agg(F.sum("n_tokens").alias("t")).collect()
    }
    acc, offsets = 0, {}
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid] or 0
    off_df = df.sparkSession.createDataFrame(
        [(p, o) for p, o in offsets.items()] or [(0, 0)],
        "_pid int, _offset long",
    )

    # pass 2: bounded per-partition running sum + the broadcast offset
    w = Window.partitionBy("_pid").orderBy(F.col(order_col).asc())
    local = F.sum("n_tokens").over(w) - F.col("n_tokens")
    out = (
        ranked.join(F.broadcast(off_df), "_pid")
        .withColumn("stream_pos", F.col("_offset") + local)
        .withColumn(
            "seq_id", F.floor(F.col("stream_pos") / budget).cast("long")
        )
        .withColumn(
            "seq_id_end",
            F.floor(
                (F.col("stream_pos") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
                / budget
            ).cast("long"),
        )
        .withColumn("seq_spans", F.col("seq_id_end") > F.col("seq_id"))
        .drop("_pid", "_offset")
    )
    return out


def stream_pack_sql(
    table: str, token_sql: str, order_col: str, budget: int,
    id_cols: str = "id", id_out: str | None = None,
) -> str:
    """DuckDB twin of :func:`stream_pack` (single-node window — the oracle
    can afford the global ORDER BY the Spark side must not do).
    ``id_cols`` may alias (``"doc_id AS id"``); ``id_out`` names the outer
    projection when it does (defaults to ``id_cols``)."""
    return f"""
        WITH t AS (
            SELECT {id_cols}, CAST({token_sql} AS BIGINT) AS n_tokens,
                   {order_col} AS okey
            FROM {table}
        )
        SELECT {id_out or id_cols}, n_tokens,
               sum(n_tokens) OVER (ORDER BY okey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n_tokens AS stream_pos,
               CAST(floor(stream_pos / {budget}) AS BIGINT) AS seq_id,
               CAST(floor((stream_pos + greatest(n_tokens, 1) - 1)
                          / {budget}) AS BIGINT) AS seq_id_end,
               seq_id_end > seq_id AS seq_spans
        FROM t
    """


def bin_pack_greedy(
    df: DataFrame,
    *,
    token_col: Column | str,
    order_col: str,
    budget: int,
    parts: int | None = None,
    open_bins: int = 64,
) -> DataFrame:
    """Whole-document first-fit packing. Returns ``df`` + ``n_tokens``,
    ``bin_id`` (globally unique), ``bin_overflow`` (true for a document
    alone in its bin because it exceeds ``budget`` by itself — the caller
    decides truncate vs drop).

    First-fit keeps at most ``open_bins`` bins open; when a doc fits none
    of them, the FULLEST open bin is closed to make room (bounded-lookback
    first-fit — deterministic, O(docs x open_bins), and the waste vs
    unbounded first-fit is negligible once bins are near budget).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    n = parts or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    n = int(n)

    src = (
        df.withColumn("n_tokens", tok.cast("long"))
        .repartitionByRange(n, F.col(order_col).asc())
        .sortWithinPartitions(F.col(order_col).asc())
        .withColumn("_pid", F.spark_partition_id())
    )
    schema = T.StructType(
        src.schema.fields
        + [
            T.StructField("bin_id", T.LongType()),
            T.StructField("bin_overflow", T.BooleanType()),
        ]
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # greedy state survives Arrow batch boundaries within a partition
        # (mapInPandas streams one partition's batches in order)
        bins: list[tuple[int, int]] = []  # (bin_id, tokens_used), open set
        next_id = [0]
        pid = [None]

        def place(nt: int) -> tuple[int, bool]:
            if nt > budget:
                bid = pid[0] * _PID_SHIFT + next_id[0]
                next_id[0] += 1
                return bid, True  # overflow doc: its own (closed) bin
            for i, (bid, used) in enumerate(bins):
                if used + nt <= budget:
                    bins[i] = (bid, used + nt)
                    return bid, False
            if len(bins) >= open_bins:
                # close the fullest open bin (deterministic: max by
                # (used, -bin_id) so ties close the oldest)
                j = max(range(len(bins)), key=lambda i: (bins[i][1], -bins[i][0]))
                bins.pop(j)
            bid = pid[0] * _PID_SHIFT + next_id[0]
            next_id[0] += 1
            bins.append((bid, nt))
            return bid, False

        for b in batches:
            if len(b) and pid[0] is None:
                pid[0] = int(b["_pid"].iloc[0])
            ids, ovf = [], []
            for nt in b["n_tokens"].astype("int64"):
                bid, o = place(int(nt))
                ids.append(bid)
                ovf.append(o)
            b = b.copy()
            b["bin_id"] = pd.Series(ids, dtype="int64", index=b.index)
            b["bin_overflow"] = pd.Series(ovf, dtype="bool", index=b.index)
            yield b

    return src.mapInPandas(pack, schema).drop("_pid")


def packing_stats(packed: DataFrame, budget: int, seq_col: str = "bin_id") -> DataFrame:
    """One row per sequence/bin: docs, tokens, fill ratio (milli) — the
    padding-waste audit a packing run reports."""
    return (
        packed.groupBy(seq_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("tokens"),
        )
        .withColumn(
            "fill_milli",
            F.round(F.least(F.col("tokens") / budget, F.lit(1.0)) * 1000).cast(
                "long"
            ),
        )
    )
