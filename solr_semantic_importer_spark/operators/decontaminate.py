"""Benchmark decontamination: drop training docs that overlap an eval set.

The standard training-data hygiene step (the n-gram collision rule the
GPT-3 / PaLM / Llama reports describe): a training document is
CONTAMINATED when it shares at least ``min_overlap`` distinct word
n-grams (13-grams of normalized tokens is the published convention) with
any document of a benchmark/eval collection. The reference repo has no
analog -- this extends the engine's LLM-pipeline operator set alongside
the dedup family in :mod:`.dedup`, reusing its frozen tokenizer and
shingle extraction so dedup and decontamination agree on what an n-gram
is.

100 TB shape:
- The benchmark side is SMALL (eval suites are thousands of docs, not
  billions): its distinct n-gram hash set reduces to one long column and
  broadcast-joins against the corpus. The corpus is never shuffled.
- The corpus side is one codegen projection (tokenize -> shingle ->
  hash -> explode) feeding a broadcast-hash join; only MATCHING
  (doc, hash) rows -- rare by construction -- reach the per-doc count
  aggregate, so the shuffle after the join is contamination-sized, not
  corpus-sized.
- ``decontaminate`` finishes with a left-anti join of the docs scan
  against the (small) flagged-id set: also broadcastable.

Hashing: n-grams compare by the same 128-bit md5 key the exact-dedup op
uses (collision odds documented at `dedup.exact_dedup`), so the
broadcast set carries 16-byte keys instead of raw 13-word strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import md5_int, md5_int_sql, shingles_col

__all__ = [
    "benchmark_ngrams",
    "contamination_report",
    "decontaminate",
    "contamination_report_sql",
]


def benchmark_ngrams(
    benchmark: DataFrame, text_col: str = "text", n: int = 13
) -> DataFrame:
    """The benchmark collection's DISTINCT n-gram hash set: one column
    ``ngram_h``. Small by construction (eval suites); the caller
    broadcast-joins it. Texts shorter than ``n`` tokens contribute their
    full-token shingle (same short-text rule as the dedup shingles, so a
    tiny benchmark doc still decontaminates its exact copies)."""
    return (
        benchmark
        .select(F.explode(shingles_col(text_col, n)).alias("__ng"))
        .select(md5_int(F.col("__ng")).alias("ngram_h"))
        .distinct()
    )


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 13,
    min_overlap: int = 1,
) -> DataFrame:
    """Per-contaminated-doc report: ``(id, n_overlap, n_ngrams,
    overlap_frac)`` for every doc sharing >= ``min_overlap`` distinct
    n-grams with the benchmark. Docs with zero overlap do NOT appear
    (the report is contamination-sized; at 10^12 docs a row per clean
    doc would itself be a 10^12-row table).

    Plan: corpus-side codegen shingle projection -> explode -> broadcast
    inner join on the benchmark hash set -> groupBy(id) count (partial
    agg; only matching rows shuffle) -> >= min_overlap filter. The doc's
    total distinct n-gram count rides the SAME projection (sized before
    the explode), so no second pass over the text."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        shingles_col(text_col, n).alias("__sh"),
    ).select(
        "id",
        F.size("__sh").alias("n_ngrams"),
        F.explode("__sh").alias("__ng"),
    ).select(
        "id", "n_ngrams", md5_int(F.col("__ng")).alias("ngram_h")
    )
    bench = benchmark_ngrams(benchmark, bench_text_col, n)
    return (
        sh.join(F.broadcast(bench), "ngram_h")
        .groupBy("id", "n_ngrams")
        .agg(F.count("*").alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
        .select(
            F.col("id").alias(id_col),
            F.col("n_overlap").cast("long"),
            F.col("n_ngrams").cast("long"),
            (F.col("n_overlap") / F.col("n_ngrams"))
            .cast("double").alias("overlap_frac"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 13,
    min_overlap: int = 1,
) -> DataFrame:
    """The cleaned corpus: ``docs`` minus every contaminated doc (schema
    preserved). Left-anti join against the contamination-sized flagged
    set -- broadcastable, the corpus scan streams through once."""
    flagged = contamination_report(
        docs, benchmark, id_col, text_col, bench_text_col, n, min_overlap
    ).select(id_col)
    return docs.join(F.broadcast(flagged), id_col, "left_anti")


def contamination_report_sql(
    docs_sql: str,
    bench_sql: str,
    id_expr: str = "doc_id",
    text_expr: str = "text",
    bench_text_expr: str = "text",
    n: int = 13,
    min_overlap: int = 1,
) -> str:
    """DuckDB oracle for :func:`contamination_report` (same tokenizer,
    shingle short-text rule, and md5 hash as the Spark side)."""

    def _sh() -> str:
        # operates on the enclosing CTE's `toks` column
        return f"""list_distinct(CASE
            WHEN len(toks) >= {n} THEN
              list_transform(generate_series(0, len(toks) - {n}),
                             i -> array_to_string(toks[i + 1 : i + {n}], ' '))
            WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
            ELSE [] END)"""

    return f"""
    WITH src AS ({docs_sql}),
    tok AS (
      SELECT {id_expr} AS id,
             regexp_extract_all(lower(coalesce({text_expr}, '')), '[a-z0-9]+') AS toks
      FROM src
    ),
    sh AS (
      SELECT id, len({_sh()}) AS n_ngrams,
             unnest({_sh()}) AS s
      FROM tok
    ),
    bsrc AS ({bench_sql}),
    btok AS (
      SELECT regexp_extract_all(lower(coalesce({bench_text_expr}, '')), '[a-z0-9]+') AS toks
      FROM bsrc
    ),
    bng AS (
      SELECT DISTINCT {md5_int_sql('s')} AS ngram_h
      FROM (SELECT unnest({_sh()}) AS s FROM btok)
    )
    SELECT id AS doc_id,
           count(*)::BIGINT AS n_overlap,
           any_value(n_ngrams)::BIGINT AS n_ngrams,
           (count(*)::DOUBLE / any_value(n_ngrams)) AS overlap_frac
    FROM sh JOIN bng ON {md5_int_sql('s')} = ngram_h
    GROUP BY id
    HAVING count(*) >= {min_overlap}
    """
