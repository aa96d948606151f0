"""Gap sessionization: batch window form vs stateful streaming operator."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.streaming.sessions import (
    sessionize_batch,
    sessionize_stream,
)

GAP = 600


def _events_pdf():
    rows = []
    eid = 0
    # user 1: three sessions (breaks at +700s and +2000s)
    for t in [0, 100, 250, 950, 1000, 3000, 3100]:
        rows.append({"user_id": 1, "event_id": eid, "ts": t}); eid += 1
    # user 2: one long session, events exactly at the gap boundary (600s is
    # NOT a break: the rule is strict >)
    for t in [0, 600, 1200, 1800]:
        rows.append({"user_id": 2, "event_id": eid, "ts": t}); eid += 1
    # user 3: single event
    rows.append({"user_id": 3, "event_id": eid, "ts": 5}); eid += 1
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pd.to_datetime(pdf["ts"] + 1_700_000_000, unit="s")
    return pdf


EXPECTED = {
    # user 1
    0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2,
    # user 2 (boundary gaps are NOT breaks)
    7: 0, 8: 0, 9: 0, 10: 0,
    # user 3
    11: 0,
}


def test_sessionize_batch_golden(spark):
    df = spark.createDataFrame(_events_pdf())
    got = {
        r["event_id"]: r["session_idx"]
        for r in sessionize_batch(df, gap_seconds=GAP).collect()
    }
    assert got == EXPECTED


def test_sessionize_stream_matches_batch_across_microbatches(spark, tmp_path_factory):
    """The stateful operator must continue sessions ACROSS micro-batches:
    events are split into ts-ordered files (one per trigger), so several
    batch boundaries fall inside open sessions."""
    tmp = str(tmp_path_factory.mktemp("sess"))
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    pdf = _events_pdf().sort_values("ts").reset_index(drop=True)
    # 4 ts-ordered files, written sequentially (file-source processes them
    # in order) -- cuts at arbitrary points INSIDE sessions
    spark_pdf = [pdf.iloc[0:3], pdf.iloc[3:6], pdf.iloc[6:9], pdf.iloc[9:]]
    for i, chunk in enumerate(spark_pdf):
        spark.createDataFrame(chunk).coalesce(1).write.parquet(
            os.path.join(src, f"part{i}")
        )
    schema = spark.createDataFrame(pdf).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/part*")
    )
    out = sessionize_stream(stream, gap_seconds=GAP)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["event_id"]: r["session_idx"]
        for r in spark.sql("select * from sessions_out").collect()
    }
    assert got == EXPECTED
    # and equals the batch form on the same input
    batch = {
        r["event_id"]: r["session_idx"]
        for r in sessionize_batch(
            spark.createDataFrame(pdf), gap_seconds=GAP
        ).collect()
    }
    assert got == batch
