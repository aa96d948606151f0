"""Exact-value coverage for P3 (date normalization) and P5 (field
truncation) — these rode the driver oracle gate through round 3
(`date_normalize`, `truncate_project`); the r4 gate rotation moved them to
pytest to free slots for the wildcard/fuzzy query rows, so the asserts
here are literal expected values, not shape checks.

Reference: SolrSemanticIndexer.java:244-276 (insertCreationDate →
yyyy-MM-dd'T'HH:mm:ss.SSS'Z'), InlineDocumentListener.java:117-123
(max-chars cap before embedding)."""

import pandas as pd
from pyspark.sql import functions as F

from solr_semantic_importer_spark.operators import transforms as TR


def test_normalize_date_iso_millis(spark):
    df = spark.createDataFrame(
        pd.DataFrame({
            "id": [1, 2],
            "ts": [pd.Timestamp("2026-02-03 04:05:06.789"),
                   pd.Timestamp("2024-01-01 00:00:00")],
        })
    )
    rows = df.select(
        "id", TR.normalize_date("ts").alias("iso")
    ).orderBy("id").collect()
    assert rows[0]["iso"] == "2026-02-03T04:05:06.789Z"
    assert rows[1]["iso"] == "2024-01-01T00:00:00.000Z"


def test_normalize_epoch_millis_exact(spark):
    # 1_700_000_000_123 ms = 2023-11-14T22:13:20.123Z
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1], "ms": [1_700_000_000_123]})
    )
    rows = df.select(TR.normalize_epoch_millis("ms").alias("iso")).collect()
    assert rows[0]["iso"] == "2023-11-14T22:13:20.123Z"


def test_orphan_anti_filter_exact(spark):
    """J3 (rode the gate as `orphan_anti` through late r4): docs whose
    stamp differs from the current crawl — the re-crawl delete set
    (SolrInserter.java delete-by-query `-crawl_id:current`)."""
    df = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [0, 1, 2, 3, 4],
            "crawl_id": ["new", "old", "new", "old", "older"],
        })
    )
    got = sorted(
        (r["doc_id"], r["crawl_id"])
        for r in TR.orphan_anti_filter(df, "crawl_id", "new").collect()
    )
    assert got == [(1, "old"), (3, "old"), (4, "older")]


def test_truncate_field_exact(spark):
    df = spark.createDataFrame(
        pd.DataFrame({
            "id": [1, 2, 3],
            "text": ["abcdefghij", "abc", None],
        })
    )
    rows = (
        df.select(
            "id",
            TR.truncate_field("text", 5).alias("t"),
            F.length(TR.truncate_field("text", 5)).alias("n"),
        )
        .orderBy("id")
        .collect()
    )
    assert (rows[0]["t"], rows[0]["n"]) == ("abcde", 5)  # capped
    assert (rows[1]["t"], rows[1]["n"]) == ("abc", 3)    # shorter untouched
    assert rows[2]["t"] is None and rows[2]["n"] is None  # null passthrough
