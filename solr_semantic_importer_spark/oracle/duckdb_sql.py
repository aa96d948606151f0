"""DuckDB oracle-SQL builders for the driver's correctness gate.

The driver runs each ``__spark_entry__.queries()`` entry AND the matching SQL
from ``oracle_sql()`` on the same parquet tables and compares row counts,
schemas and order-insensitive value hashes. These builders emit ANSI-ish SQL
(DuckDB dialect) that recomputes the engine's results from first principles --
independent of any engine code path.

Hash-stability rule: float-valued outputs are emitted as INTEGER milli/micro
units (e.g. score_milli = round(score * 1000)) on BOTH sides, so ulp-level
rounding differences between engines can never flip a value hash, and integer
sort keys make the top-k row SET identical by construction.
"""

from __future__ import annotations

from ..functions.analysis import analyze_text
from ..sources.transcripts import transcripts_duckdb_cte

K1 = 1.2
B = 0.75


def bm25_base_ctes() -> str:
    """CTEs: transcripts -> stable ids -> tokens -> tf/df/dl/corpus stats."""
    return f"""
    t AS ({transcripts_duckdb_cte()}),
    ids AS (
      SELECT row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS doc_id,
             conv_id, turn_idx, role, text, tool, ts
      FROM t
    ),
    docs AS (
      SELECT doc_id, conv_id, turn_idx, role, tool,
             regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS toks
      FROM ids
    ),
    lens AS (SELECT doc_id, len(toks) AS dl FROM docs),
    tfc AS (
      SELECT doc_id, term, count(*)::DOUBLE AS tf
      FROM (SELECT doc_id, unnest(toks) AS term FROM docs)
      GROUP BY doc_id, term
    ),
    dft AS (SELECT term, count(*)::DOUBLE AS df FROM tfc GROUP BY term),
    st AS (SELECT count(*)::DOUBLE AS n, avg(dl)::DOUBLE AS avgdl FROM lens)
    """


def bm25_topk_sql(
    query: str,
    k: int = 10,
    op: str = "OR",
    fq: str | None = None,
    offset: int = 0,
) -> str:
    """Full BM25 top-k oracle. fq is a SQL predicate over ids columns
    (conv_id, turn_idx, role, tool)."""
    terms = list(dict.fromkeys(analyze_text(query)))
    if not terms:
        return "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS score_milli WHERE 1=0"
    term_list = ", ".join(f"'{t}'" for t in terms)
    having = f"HAVING count(*) = {len(terms)}" if op == "AND" else ""
    fq_join = ""
    if fq is not None:
        fq_join = f"JOIN ids ON ids.doc_id = tfc.doc_id AND ({fq})"
    return f"""
    WITH {bm25_base_ctes()},
    scored AS (
      SELECT tfc.doc_id,
             sum( ln(1 + (st.n - dft.df + 0.5) / (dft.df + 0.5))
                  * tfc.tf * ({K1} + 1)
                  / (tfc.tf + {K1} * (1 - {B} + {B} * lens.dl / st.avgdl)) ) AS score
      FROM tfc
      JOIN dft USING (term)
      JOIN lens ON lens.doc_id = tfc.doc_id
      {fq_join}
      CROSS JOIN st
      WHERE tfc.term IN ({term_list})
      GROUP BY tfc.doc_id
      {having}
    )
    SELECT doc_id, CAST(round(score * 1000) AS BIGINT) AS score_milli
    FROM scored
    ORDER BY score_milli DESC, doc_id ASC
    LIMIT {k} OFFSET {offset}
    """


def term_df_top_sql(n: int = 20) -> str:
    return f"""
    WITH {bm25_base_ctes()}
    SELECT term, CAST(df AS BIGINT) AS df
    FROM dft
    ORDER BY df DESC, term ASC
    LIMIT {n}
    """


def corpus_stats_sql() -> str:
    return f"""
    WITH {bm25_base_ctes()}
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(round(avgdl * 1000) AS BIGINT) AS avgdl_milli
    FROM st
    """


def doc_lengths_sql(max_doc: int = 50) -> str:
    return f"""
    WITH {bm25_base_ctes()}
    SELECT doc_id, CAST(dl AS BIGINT) AS dl
    FROM lens WHERE doc_id < {max_doc}
    ORDER BY doc_id
    """
