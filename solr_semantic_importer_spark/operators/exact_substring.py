"""Cross-document exact-substring duplicate spans (ExactSubstr dedup).

The published rule (Lee et al. 2021, "Deduplicating Training Data Makes
Language Models Better"): any substring of at least L tokens that occurs
verbatim in more than one document is a duplicate span, and training data
quality improves when those spans are removed (not just whole-document
near-dups).  The reference implementation builds a single-node suffix
array; that cannot hold 10^12 turns.  This module is the distributed
formulation: a duplicated >=L-token substring exists iff every one of its
L-token shingles is duplicated, so the duplicated-span set is exactly the
union of the L-token shingle windows whose shingle occurs in >=
``min_doc_count`` distinct documents.  Overlapping/adjacent duplicated
windows merge into maximal spans per document.

Conventions (documented deviations from the byte-level paper setup):
- the unit is the frozen analyzer's token stream (``tokens_col`` --
  lowercased ``[a-z0-9]+`` runs), not raw bytes, so span boundaries are
  token-aligned and the DuckDB oracle can recompute them exactly;
- ``min_len`` defaults to 20 word tokens (the paper uses 50 BPE tokens;
  word tokens are ~1.3-1.5 BPE tokens each, so the thresholds are
  comparable);
- within-document repeats do NOT count -- duplication means >=
  ``min_doc_count`` DISTINCT documents share the shingle (pass a corpus
  with doc halves as separate rows to get the within-doc behavior).

Plan shape at 100 TB (all JVM-side, no Python anywhere):
1. one codegen projection per doc builds the array of 60-bit shingle
   hashes (``md5_int`` over the space-joined token window -- identical in
   DuckDB); ``posexplode`` ships only (id, pos, h) -- ~24 bytes + id per
   token, never the text;
2. duplicated hashes = groupBy(h).count_distinct(id) >= min_doc_count --
   Catalyst plans the two-phase distinct aggregate with map-side partial
   dedup, so the shuffle carries (h, id) pairs once;
3. join-back is a LEFT SEMI join of the shingle stream against the
   duplicated-hash set on h (sort-merge; AQE broadcasts it when the dup
   set is small, the common case);
4. per-doc interval merge is one ``collect_list(pos)`` groupBy (bounded
   by the doc's own token count) + a sorted-array ``F.aggregate`` fold --
   O(positions) per doc, zero further shuffles.

Reference provenance: the reference repo ships no substring dedup (its
dedup story is Solr-side overwrite-by-id -- see
``solr_semantic_importer/README.md`` crawl sections); this operator is
part of the training-data pipeline surface this engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.analysis import tokens_col, tokens_sql
from .dedup import md5_int, md5_int_sql

__all__ = [
    "shingle_hash_positions",
    "duplicate_positions",
    "duplicate_span_report",
    "remove_duplicate_spans",
    "duplicate_span_report_sql",
]


def _shingle_hashes(toks: Column, min_len: int) -> Column:
    """Array of md5_int hashes of each L-token window (empty if < L tokens).

    The guard matters: Spark's ``sequence(0, n-L)`` flips to a DESCENDING
    range when n < L (default step is -1 when start > stop), which would
    silently fabricate windows.
    """
    n = F.size(toks)
    full = F.transform(
        F.sequence(F.lit(0), n - min_len),
        lambda i: md5_int(F.array_join(F.slice(toks, i + 1, min_len), " ")),
    )
    return F.when(n >= min_len, full).otherwise(
        F.array().cast("array<bigint>")
    )


def shingle_hash_positions(
    df: DataFrame, id_col: str, text_col: str, min_len: int = 20
) -> DataFrame:
    """(id, pos, h): every L-token window's 0-based start and 60-bit hash."""
    hashed = df.select(
        F.col(id_col).alias("id"),
        _shingle_hashes(tokens_col(text_col), min_len).alias("hs"),
    )
    return hashed.select(
        "id", F.posexplode("hs").alias("pos", "h")
    ).withColumn("pos", F.col("pos").cast("long"))


def duplicate_positions(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 20,
    min_doc_count: int = 2,
) -> DataFrame:
    """(id, pos) window starts whose shingle occurs in >= min_doc_count docs."""
    sh = shingle_hash_positions(df, id_col, text_col, min_len)
    dup = (
        sh.groupBy("h")
        .agg(F.count_distinct("id").alias("nd"))
        .filter(F.col("nd") >= min_doc_count)
        .select("h")
    )
    return sh.join(dup, "h", "left_semi").select("id", "pos")


def _merged_positions(dpos: DataFrame) -> DataFrame:
    """(id, ps): sorted duplicated window starts per doc (bounded by the
    doc's own token count -- never a cross-doc collect)."""
    return dpos.groupBy("id").agg(
        F.sort_array(F.collect_list("pos")).alias("ps")
    )


def duplicate_span_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 20,
    min_doc_count: int = 2,
) -> DataFrame:
    """Per affected doc: (id, n_tokens, dup_tokens, n_spans, dup_frac_milli).

    ``dup_tokens`` counts the union of the [pos, pos+L) token intervals
    (the tokens an ExactSubstr cleaner would drop); ``n_spans`` counts the
    maximal merged intervals.  Both come out of ONE sorted-array fold:
    walking starts ascending, a window adds ``L - max(0, prev_end - pos)``
    new covered tokens and opens a new span iff ``pos > prev_end``.
    ``dup_frac_milli`` is exact integer arithmetic (``dup_tokens*1000 div
    n_tokens``) so Spark and DuckDB agree bit-for-bit.  Docs with no
    duplicated window are absent (join the corpus for zero-filled rows).
    """
    L = min_len
    ps_df = _merged_positions(
        duplicate_positions(df, id_col, text_col, min_len, min_doc_count)
    )
    zero = F.lit(0).cast("long")
    acc0 = F.struct(
        zero.alias("cov"),
        F.lit(-(1 << 60)).cast("long").alias("pe"),
        zero.alias("sp"),
    )
    folded = ps_df.select(
        "id",
        F.aggregate(
            "ps",
            acc0,
            lambda a, p: F.struct(
                (a["cov"] + L - F.greatest(zero, a["pe"] - p)).alias("cov"),
                (p + L).alias("pe"),
                (a["sp"] + F.when(p > a["pe"], F.lit(1)).otherwise(F.lit(0))).alias("sp"),
            ),
        ).alias("acc"),
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.size(tokens_col(text_col)).cast("long").alias("n_tokens"),
    )
    return (
        folded.join(base, "id")
        .select(
            "id",
            "n_tokens",
            F.col("acc.cov").alias("dup_tokens"),
            F.col("acc.sp").alias("n_spans"),
            F.expr("(acc.cov * 1000) div n_tokens").alias("dup_frac_milli"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 20,
    min_doc_count: int = 2,
) -> DataFrame:
    """(id, clean_text, n_tokens, removed_tokens): the corpus with every
    duplicated >=L-token span dropped.

    ``clean_text`` is the NORMALIZED token stream (the analyzer's
    lowercased tokens space-joined) with covered tokens removed -- span
    boundaries are token positions, so reconstruction happens in token
    space (documented deviation: the byte-level paper splices raw text).
    Docs with no duplicated span keep their full token stream.  The span
    list per doc is built by the same fold as the report (append a new
    [p, p+L) interval, or extend the last one when p <= last.e), then one
    indexed ``F.filter`` drops covered tokens -- O(tokens x spans) per
    doc, still zero Python.
    """
    L = min_len
    ps_df = _merged_positions(
        duplicate_positions(df, id_col, text_col, min_len, min_doc_count)
    )
    empty_spans = F.array().cast("array<struct<s:bigint,e:bigint>>")
    spans = ps_df.select(
        "id",
        F.aggregate(
            "ps",
            empty_spans,
            lambda acc, p: F.when(
                (F.size(acc) > 0) & (p <= F.element_at(acc, -1)["e"]),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1),
                    F.array(
                        F.struct(
                            F.element_at(acc, -1)["s"].alias("s"),
                            (p + L).alias("e"),
                        )
                    ),
                ),
            ).otherwise(
                F.concat(
                    acc,
                    F.array(F.struct(p.alias("s"), (p + L).alias("e"))),
                )
            ),
        ).alias("spans"),
    )
    base = df.select(F.col(id_col).alias("id"), tokens_col(text_col).alias("toks"))
    joined = base.join(spans, "id", "left").withColumn(
        "spans", F.coalesce("spans", empty_spans)
    )
    kept = F.filter(
        "toks",
        lambda t, i: ~F.exists(
            F.col("spans"), lambda sp: (i >= sp["s"]) & (i < sp["e"])
        ),
    )
    return joined.select(
        "id",
        F.array_join(kept, " ").alias("clean_text"),
        F.size("toks").cast("long").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).cast("long").alias("removed_tokens"),
    )


def duplicate_span_report_sql(
    source_sql: str,
    id_expr: str,
    text_expr: str,
    min_len: int = 20,
    min_doc_count: int = 2,
) -> str:
    """DuckDB oracle for :func:`duplicate_span_report` (same hash, same
    tokenizer, same integer milli arithmetic).  The covered-token count is
    recomputed the independent way -- DISTINCT exploded covered positions
    -- rather than by re-running the fold, so the two engines cross-check
    the interval algebra, not just the plumbing."""
    L = min_len
    hash_expr = md5_int_sql(f"array_to_string(toks[i + 1 : i + {L}], ' ')")
    return f"""
    WITH src AS ({source_sql}),
    tok AS (
      SELECT {id_expr} AS id, {tokens_sql(text_expr)} AS toks FROM src
    ),
    sh0 AS (
      SELECT id,
             list_transform(generate_series(0, len(toks) - {L}),
                            i -> {hash_expr}) AS hs
      FROM tok WHERE len(toks) >= {L}
    ),
    sh AS (
      SELECT id, unnest(hs) AS h,
             unnest(generate_series(0, len(hs) - 1)) AS pos
      FROM sh0
    ),
    dup AS (
      SELECT h FROM sh GROUP BY h HAVING count(DISTINCT id) >= {min_doc_count}
    ),
    dpos AS (SELECT id, pos FROM sh JOIN dup USING (h)),
    cov AS (
      SELECT DISTINCT id, unnest(generate_series(pos, pos + {L - 1})) AS cp
      FROM dpos
    ),
    covered AS (SELECT id, count(*) AS dup_tokens FROM cov GROUP BY id),
    marked AS (
      SELECT id, pos,
             CASE WHEN lag(pos) OVER (PARTITION BY id ORDER BY pos) IS NULL
                       OR pos > lag(pos) OVER (PARTITION BY id ORDER BY pos) + {L}
                  THEN 1 ELSE 0 END AS new_span
      FROM dpos
    ),
    spans AS (SELECT id, sum(new_span) AS n_spans FROM marked GROUP BY id),
    nt AS (SELECT id, len(toks)::BIGINT AS n_tokens FROM tok)
    SELECT nt.id AS id, nt.n_tokens,
           covered.dup_tokens::BIGINT AS dup_tokens,
           spans.n_spans::BIGINT AS n_spans,
           (covered.dup_tokens * 1000) // nt.n_tokens AS dup_frac_milli
    FROM covered JOIN spans USING (id) JOIN nt USING (id)
    """
