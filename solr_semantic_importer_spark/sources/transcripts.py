"""Transcripts input table (the engine's primary source).

Shape per BASELINE.json ``input_hint``:
    (conv_id: string, turn_idx: int, role: string, text: string,
     tool: string nullable, ts: timestamp)
Document unit = one turn; ``(conv_id, turn_idx)`` is the unique, stable
ordering key (the analog of the reference's zero-padded chunk ids,
ChunkDocumentCreator.java:76-79, which make lexicographic order equal
logical order).

Two deterministic constructions:

1. :func:`transcripts_from_documents` -- derives the transcripts table from
   the driver-provided ``documents.parquet`` with pure arithmetic (10 turns
   per conversation, round-robin roles, minute-spaced timestamps). The SAME
   derivation is emitted as DuckDB SQL by :func:`transcripts_duckdb_cte`, so
   every oracle-checked query sees an identical corpus on both sides, and the
   "per-turn text equality vs source" invariant is definitional: turn text
   IS the source document text.

2. :func:`generate_transcripts` -- standalone seeded generator for unit tests
   (no dependency on /root/testdata), with Zipf-head hot terms, unicode,
   punctuation, empty and NULL texts to exercise the analyzer edge cases.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TURNS_PER_CONV = 10
ROLES = ("user", "assistant", "tool")
BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def transcripts_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents(doc_id, text, ...) -> transcripts, 1 doc = 1 turn.

    conv_id = 'c%06d' % (doc_id / 10); turn_idx = doc_id % 10. Because
    doc_id is dense from 0, ordering by (conv_id, turn_idx) equals ordering
    by doc_id -- handy invariant for doc-id stability tests.
    """
    d = load_documents(spark, sf_dir)
    return d.select(
        F.format_string("c%06d", (F.col("doc_id") / 10).cast("int")).alias("conv_id"),
        (F.col("doc_id") % 10).cast("int").alias("turn_idx"),
        F.element_at(
            F.array(*[F.lit(r) for r in ROLES]), (F.col("doc_id") % 3 + 1).cast("int")
        ).alias("role"),
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 2, F.format_string("tool_%d", (F.col("doc_id") % 7).cast("int"))
        ).alias("tool"),
        F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("doc_id") * 60).alias("ts"),
    )


def transcripts_duckdb_cte() -> str:
    """DuckDB SQL producing the identical transcripts table from the
    pre-registered ``documents`` view (for oracle_sql entries)."""
    return f"""
    SELECT
      printf('c%06d', CAST(floor(doc_id / 10) AS INT)) AS conv_id,
      CAST(doc_id % 10 AS INT) AS turn_idx,
      CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
      text,
      CASE WHEN doc_id % 3 = 2 THEN printf('tool_%d', CAST(doc_id % 7 AS INT)) END AS tool,
      to_timestamp({BASE_EPOCH} + doc_id * 60)::TIMESTAMP AS ts
    FROM documents
    """


# ---------------------------------------------------------------------------
# Standalone seeded generator (FIXTURES.md fixture 1)
# ---------------------------------------------------------------------------

_VOCAB_HOT = ["the", "a", "error", "in", "tool", "call", "run", "test"]
_VOCAB_MID = [f"topic{i}" for i in range(200)]
_VOCAB_RARE = [f"rare{i:05d}" for i in range(5000)]


def generate_transcripts_pdf(
    n_convs: int = 200, turns_per_conv: int = 10, seed: int = 42
) -> pd.DataFrame:
    """Deterministic pandas corpus: Zipf-head hot terms, mid topics, rare tail,
    plus unicode/punctuation/empty/NULL rows (analyzer edge cases, P6)."""
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(n_convs):
        conv = f"c{c:06d}"
        for t in range(turns_per_conv):
            role = ROLES[(c * turns_per_conv + t) % 3]
            k = int(rng.integers(5, 60))
            words = []
            for _ in range(k):
                u = rng.random()
                if u < 0.55:
                    words.append(_VOCAB_HOT[int(rng.integers(0, len(_VOCAB_HOT)))])
                elif u < 0.9:
                    words.append(_VOCAB_MID[int(rng.integers(0, len(_VOCAB_MID)))])
                else:
                    words.append(_VOCAB_RARE[int(rng.integers(0, len(_VOCAB_RARE)))])
            text: str | None = " ".join(words)
            r = rng.random()
            if r < 0.01:
                text = None
            elif r < 0.02:
                text = ""
            elif r < 0.04:
                text = text + " café 日本語!! wi-fi 100GB"
            rows.append(
                {
                    "conv_id": conv,
                    "turn_idx": t,
                    "role": role,
                    "text": text,
                    "tool": f"tool_{t % 7}" if role == "tool" else None,
                    "ts": pd.Timestamp(BASE_EPOCH + (c * turns_per_conv + t) * 60, unit="s"),
                }
            )
    pdf = pd.DataFrame(rows)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return pdf


def generate_transcripts(
    spark: SparkSession, n_convs: int = 200, turns_per_conv: int = 10, seed: int = 42
) -> DataFrame:
    return spark.createDataFrame(
        generate_transcripts_pdf(n_convs, turns_per_conv, seed), schema=TRANSCRIPT_SCHEMA
    )


def amplify_transcripts(df: DataFrame, factor: int) -> DataFrame:
    """Deterministically scale a transcripts corpus by `factor` for bench runs:
    each replica r gets conv_id suffix '-r{r}' and a distinct rare marker token
    appended, so corpus stats shift realistically instead of duplicating docs.
    Pure DataFrame ops (explode over a literal range) -- no driver loop.
    """
    if factor <= 1:
        return df
    reps = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
    out = df.select("*", reps)
    return out.select(
        F.concat_ws("-", F.col("conv_id"), F.concat(F.lit("r"), F.col("rep"))).alias("conv_id"),
        "turn_idx",
        "role",
        F.when(
            F.col("text").isNotNull(),
            F.concat_ws(" ", F.col("text"), F.concat(F.lit("rep"), F.col("rep"))),
        ).alias("text"),
        "tool",
        "ts",
    )
