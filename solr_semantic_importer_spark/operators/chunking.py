"""Chunking: text -> overlapping windows -> child chunk documents.

Reference behavior (Layer A): the importer ships each configured field to a
gRPC chunker with options {length, overlap} (ChunkDocumentCreator.java:95-103,
config chunk-size=300 / chunk-overlap=30 at
src/test/resources/application-test.yml:86-88) and builds child docs with
  id = origDocId + "-" + fieldName + "#" + leftPad(chunkNumber, 7, '0')
  (ChunkDocumentCreator.java:76-79)
carrying parent-id / parent-collection / parent-field-name
(ChunkDocumentCreator.java:83-88; SchemaConstants.java:11-13).

Spark realization: a deterministic token-window chunker. Frozen spec (shared
with the DuckDB oracle SQL):

    toks  = analyzer tokens of the text (functions/analysis.py spec)
    step  = size - overlap  (requires 0 <= overlap < size)
    chunk i = join(toks[i*step : i*step + size], ' ')   for i*step < len(toks)

Expressed with built-in JVM functions (slice/transform/sequence) -- zero
Python in the hot path -- then ``posexplode`` preserves chunk order (O4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.analysis import tokens_col


def chunk_tokens_col(text_col: Column | str, size: int, overlap: int) -> Column:
    """array<string> of overlapping token-window chunks (JVM-side)."""
    if not (0 <= overlap < size):
        raise ValueError("require 0 <= overlap < size")
    step = size - overlap
    toks = tokens_col(text_col)
    n = F.size(toks)
    # number of windows: ceil(n / step) for n>0 else 0
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.floor((n + F.lit(step - 1)) / F.lit(step)).cast("int")
    )
    idx = F.sequence(F.lit(0), n_chunks - 1)
    return F.when(n_chunks == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            idx,
            lambda i: F.array_join(F.slice(toks, i * step + 1, size), " "),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 300,
    overlap: int = 30,
    field_name: str | None = None,
) -> DataFrame:
    """One row per chunk: chunk_id, chunk_number, parent_id, field, chunk text.

    Null/empty text yields no chunks (the reference skips null fields but
    counts the doc processed, InlineDocumentListener.java:78-81 -- the skip
    counter lives with the caller).
    """
    field = field_name or text_col
    chunks = df.select(
        F.col(id_col).alias("parent_id"),
        F.posexplode(chunk_tokens_col(text_col, size, overlap)).alias(
            "chunk_number", "chunk"
        ),
    )
    return chunks.select(
        F.format_string(
            "%s-%s#%07d", F.col("parent_id").cast("string"), F.lit(field), F.col("chunk_number")
        ).alias("chunk_id"),
        "chunk_number",
        "parent_id",
        F.lit(field).alias("parent_field_name"),
        "chunk",
    )


def chunks_duckdb_sql(parent_sql: str, id_expr: str, text_expr: str,
                      size: int, overlap: int, field: str) -> str:
    """DuckDB SQL computing the identical chunk relation (oracle)."""
    step = size - overlap
    return f"""
    WITH p AS ({parent_sql}),
    tok AS (
      SELECT {id_expr} AS parent_id,
             regexp_extract_all(lower(coalesce({text_expr}, '')), '[a-z0-9]+') AS toks
      FROM p
    ),
    w AS (
      SELECT parent_id, toks,
             unnest(generate_series(0, CAST(ceil(len(toks) / {step}.0) AS BIGINT) - 1)) AS chunk_number
      FROM tok
      WHERE len(toks) > 0
    )
    SELECT printf('%s-%s#%07d', CAST(parent_id AS VARCHAR), '{field}', chunk_number) AS chunk_id,
           CAST(chunk_number AS INT) AS chunk_number,
           parent_id,
           '{field}' AS parent_field_name,
           array_to_string(toks[chunk_number * {step} + 1 : chunk_number * {step} + {size}], ' ') AS chunk
    FROM w
    """
