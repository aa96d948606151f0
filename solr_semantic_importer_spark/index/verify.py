"""Per-turn text-equality verification vs the source (north_rule clause).

The built index's stored turns are joined back to the source transcripts on
the stable key ``(conv_id, turn_idx)`` and checked for FULL equality of every
source column -- the engine-side analog of the reference's reindex
idempotence check (run the crawl twice, same result --
/root/reference/src/test/java/com/krickert/search/indexer/
SolrIndexerIntegrationTest.java:69-92).

Implemented as ONE full-outer join + aggregate (no collect of data rows):
the result is a small summary row; any mismatching keys can be returned
capped for diagnosis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY = ["conv_id", "turn_idx"]
CHECK_COLS = ["role", "text", "tool", "ts"]


def verify_turn_equality(source: DataFrame, docs: DataFrame) -> dict:
    """Returns {'n_source', 'n_index', 'n_matched', 'n_text_mismatch',
    'n_missing', 'n_extra'} -- all zeros except counts when the index stores
    the source faithfully."""
    s = source.select(*KEY, *[F.col(c).alias(f"s_{c}") for c in CHECK_COLS])
    d = docs.select(*KEY, *[F.col(c).alias(f"d_{c}") for c in CHECK_COLS])
    j = s.join(d, KEY, "full_outer")
    eq = F.lit(True)
    for c in CHECK_COLS:
        eq = eq & (
            (F.col(f"s_{c}") == F.col(f"d_{c}"))
            | (F.col(f"s_{c}").isNull() & F.col(f"d_{c}").isNull())
        )
    row = j.agg(
        F.sum(F.when(F.col("s_role").isNotNull(), 1).otherwise(0)).alias("n_source"),
        F.sum(F.when(F.col("d_role").isNotNull(), 1).otherwise(0)).alias("n_index"),
        F.sum(
            F.when(F.col("s_role").isNotNull() & F.col("d_role").isNotNull() & eq, 1)
            .otherwise(0)
        ).alias("n_matched"),
        F.sum(
            F.when(F.col("s_role").isNotNull() & F.col("d_role").isNotNull() & ~eq, 1)
            .otherwise(0)
        ).alias("n_mismatch"),
        F.sum(
            F.when(F.col("s_role").isNotNull() & F.col("d_role").isNull(), 1).otherwise(0)
        ).alias("n_missing"),
        F.sum(
            F.when(F.col("s_role").isNull() & F.col("d_role").isNotNull(), 1).otherwise(0)
        ).alias("n_extra"),
    ).collect()[0]
    return {
        "n_source": int(row["n_source"] or 0),
        "n_index": int(row["n_index"] or 0),
        "n_matched": int(row["n_matched"] or 0),
        "n_mismatch": int(row["n_mismatch"] or 0),
        "n_missing": int(row["n_missing"] or 0),
        "n_extra": int(row["n_extra"] or 0),
    }


def assert_verified(source: DataFrame, docs: DataFrame) -> dict:
    r = verify_turn_equality(source, docs)
    assert r["n_mismatch"] == 0 and r["n_missing"] == 0 and r["n_extra"] == 0, r
    assert r["n_matched"] == r["n_source"] == r["n_index"], r
    return r
