"""Gap-based sessionization: batch window form + custom stateful streaming
operator (SURVEY 2.10's applyInPandasWithState slot).

The reference processes crawls as bounded jobs with watchdog timeouts
(SolrSemanticIndexer.java:132-183); the unbounded-ingest analog of "activity
with a stall boundary" is sessionization: consecutive events of the same
user belong to one session until an inactivity gap exceeds ``gap_seconds``.

Two implementations, asserted equivalent by tests:

- :func:`sessionize_batch` -- pure DataFrame window functions (lag + running
  sum of gap breaks). Fully SQL-expressible, DuckDB-oracle-checked.
- :func:`sessionize_stream` -- Structured Streaming ``applyInPandasWithState``
  per user key: state = (last event ts, running session index); each
  micro-batch continues sessions across batch boundaries. Equivalence with
  the batch form holds for in-order arrival (the file-source test feeds
  ts-split files); late data would need a watermark + state timeout, noted
  below.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts_epoch", T.LongType(), False),
        T.StructField("session_idx", T.IntegerType(), False),
    ]
)

# last_ts is NULLABLE: a group whose batch iterator yielded no rows has no
# timestamp yet -- storing a 0 sentinel would make the next real event
# compare t - 0 > gap and spuriously open a new session (ADVICE r2).
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts", T.LongType(), True),
        T.StructField("session_idx", T.IntegerType(), False),
    ]
)


def sessionize_batch(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """(user_id, event_id, ts) -> + session_idx (0-based per user).
    A new session starts when the gap to the previous event exceeds
    ``gap_seconds``. Ties broken by event_id -- deterministic everywhere."""
    ts = F.unix_seconds(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(ts.asc(), F.col("event_id").asc())
    gap_break = (
        (ts - F.lag(ts).over(w)) > gap_seconds
    ).cast("int")
    return events.select(
        "user_id",
        "event_id",
        ts.alias("ts_epoch"),
        F.coalesce(
            F.sum(F.coalesce(gap_break, F.lit(0))).over(w), F.lit(0)
        ).cast("int").alias("session_idx"),
    )


def sessionize_batch_sql(gap_seconds: int = 1800) -> str:
    """DuckDB oracle twin of sessionize_batch over the events view."""
    # floor(epoch(...)): DuckDB's epoch() keeps fractional seconds while
    # Spark's unix_seconds truncates -- both sides must compare WHOLE seconds
    return f"""
    SELECT user_id, event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
           CAST(coalesce(sum(CASE WHEN floor(epoch(ts)) - prev_ts > {gap_seconds}
                                  THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY ts, event_id), 0) AS INT)
             AS session_idx
    FROM (
      SELECT user_id, event_id, ts,
             lag(floor(epoch(ts))) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events
    )
    """


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Streaming sessionization via applyInPandasWithState: per-user state
    carries (last_ts, session_idx) across micro-batches, so a session that
    spans batches keeps its index. In-order arrival per user assumed (the
    upstream source is ts-ordered); for late data, add a watermark and
    switch the state timeout to EventTimeTimeout to expire idle users."""

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        last_ts, sidx = state.get if state.exists else (None, 0)
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts_epoch", "event_id"])
            out_idx = []
            for t in pdf["ts_epoch"]:
                if last_ts is not None and t - last_ts > gap_seconds:
                    sidx += 1
                last_ts = int(t)
                out_idx.append(sidx)
            yield pd.DataFrame(
                {
                    "user_id": user_id,
                    "event_id": pdf["event_id"].to_numpy(),
                    "ts_epoch": pdf["ts_epoch"].to_numpy(),
                    "session_idx": pd.array(out_idx, dtype="int32"),
                }
            )
        state.update((int(last_ts) if last_ts is not None else None, int(sidx)))

    prepared = events.select(
        "user_id",
        "event_id",
        F.unix_seconds(F.col("ts").cast("timestamp")).alias("ts_epoch"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
