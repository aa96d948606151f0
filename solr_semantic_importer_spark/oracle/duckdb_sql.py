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


def bm25_base_ctes(src_where: str | None = None, chain: str = "text_general") -> str:
    """CTEs: transcripts -> stable ids -> tokens -> tf/df/dl/corpus stats.
    ``src_where`` restricts the corpus (a predicate over transcript columns,
    e.g. "conv_id < 'c000048'") -- stats and ids are computed over the subset.
    ``chain`` picks the index-side tokenizer SQL (text_general default;
    text_splitting = the WDG chain, functions/word_delimiter.py)."""
    src = transcripts_duckdb_cte()
    if src_where:
        src = f"SELECT * FROM ({src}) WHERE {src_where}"
    if chain == "text_general":
        toks = "regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+')"
    elif chain == "text_splitting":
        from ..functions.word_delimiter import splitting_toks_sql

        toks = splitting_toks_sql("text")
    else:
        raise ValueError(f"no DuckDB tokenizer for chain {chain}")
    return f"""
    t AS ({src}),
    ids AS (
      SELECT row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS doc_id,
             conv_id, turn_idx, role, text, tool, ts
      FROM t
    ),
    docs AS (
      SELECT doc_id, conv_id, turn_idx, role, tool,
             {toks} AS toks
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
    exclude: str | None = None,
    src_where: str | None = None,
    chain: str = "text_general",
) -> str:
    """Full BM25 top-k oracle. fq is a SQL predicate over ids columns
    (conv_id, turn_idx, role, tool). ``exclude`` models delete-by-query
    tombstones: matching docs are dropped from the RESULTS while df/avgdl/N
    stay at their full-corpus values (Lucene delete-before-merge semantics).
    ``src_where`` restricts the corpus itself (stats recomputed over it).
    ``chain`` selects the analysis chain (query terms analyzed with its
    query-time variant; corpus tokenized with its index-time SQL)."""
    from ..functions.analysis import QUERY_ANALYZERS

    terms = list(dict.fromkeys(QUERY_ANALYZERS[chain](query)))
    if not terms:
        return "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS score_milli WHERE 1=0"
    term_list = ", ".join(f"'{t}'" for t in terms)
    having = f"HAVING count(*) = {len(terms)}" if op == "AND" else ""
    fq_join = ""
    if fq is not None:
        fq_join = f"JOIN ids ON ids.doc_id = tfc.doc_id AND ({fq})"
    excl = (
        f"AND tfc.doc_id NOT IN (SELECT doc_id FROM ids WHERE {exclude})"
        if exclude
        else ""
    )
    return f"""
    WITH {bm25_base_ctes(src_where, chain)},
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
      {excl}
      GROUP BY tfc.doc_id
      {having}
    )
    SELECT doc_id, CAST(round(score * 1000) AS BIGINT) AS score_milli
    FROM scored
    ORDER BY score_milli DESC, doc_id ASC
    LIMIT {k} OFFSET {offset}
    """


def transcripts_ids_cte() -> str:
    """Standalone transcripts-with-stable-doc-ids relation (for queries that
    join engine results back to stored fields)."""
    return f"""
    SELECT row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS doc_id,
           conv_id, turn_idx, role, text, tool, ts
    FROM ({transcripts_duckdb_cte()})
    """


def bm25_phrase_sql(
    phrase: str, k: int = 10, offset: int = 0, fq: str | None = None
) -> str:
    """PhraseQuery-under-BM25 oracle: positions via lateral unnest, phrase
    matches via positional self-joins, idf = sum over the phrase term array
    (duplicates counted), freq = #occurrences. ``fq`` filters results over
    ids columns (non-scoring, like the engine's semi-join)."""
    terms = list(analyze_text(phrase))
    if not terms:
        return "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS score_milli WHERE 1=0"
    joins = "\n      ".join(
        f"JOIN tokp t{j} ON t{j}.doc_id = t0.doc_id AND t{j}.pos = t0.pos + {j} "
        f"AND t{j}.term = '{t}'"
        for j, t in enumerate(terms[1:], start=1)
    )
    values = ", ".join(f"('{t}')" for t in terms)
    return f"""
    WITH {bm25_base_ctes()},
    tokp AS (
      SELECT doc_id, toks[i + 1] AS term, i AS pos
      FROM docs, UNNEST(range(len(toks))) AS u(i)
    ),
    m AS (
      SELECT t0.doc_id, t0.pos
      FROM tokp t0
      {joins}
      WHERE t0.term = '{terms[0]}'
    ),
    freqs AS (SELECT doc_id, count(*)::DOUBLE AS f FROM m GROUP BY doc_id),
    idfw AS (
      SELECT sum(ln(1 + (st.n - dft.df + 0.5) / (dft.df + 0.5))) AS w
      FROM (VALUES {values}) AS q(term) JOIN dft USING (term) CROSS JOIN st
    )
    SELECT freqs.doc_id AS doc_id,
           CAST(round(idfw.w * freqs.f * ({K1} + 1)
                / (freqs.f + {K1} * (1 - {B} + {B} * lens.dl / st.avgdl)) * 1000)
                AS BIGINT) AS score_milli
    FROM freqs
    JOIN lens ON lens.doc_id = freqs.doc_id
    {f"JOIN ids ON ids.doc_id = freqs.doc_id AND ({fq})" if fq else ""}
    CROSS JOIN st CROSS JOIN idfw
    ORDER BY score_milli DESC, freqs.doc_id ASC
    LIMIT {k} OFFSET {offset}
    """


def fuzzy_topk_sql(term: str, max_edits: int = 2, k: int = 10) -> str:
    """FuzzyQuery oracle: the expansion set = every corpus term within
    ``levenshtein(term) <= max_edits`` (DuckDB's levenshtein IS Lucene's
    FuzzyQuery edit distance), each expanded term scored with its own BM25
    and summed per doc (the engine's documented scoring; see
    BM25Index.expand_fuzzy). Exact while the expansion stays under
    FuzzyTermsEnum's maxExpansions=50 cap -- true at the gate SF, where the
    derived-transcripts vocabulary is ~31 terms."""
    return f"""
    WITH {bm25_base_ctes()},
    exp AS (SELECT term FROM dft WHERE levenshtein(term, '{term}') <= {max_edits}),
    scored AS (
      SELECT tfc.doc_id,
             sum( ln(1 + (st.n - dft.df + 0.5) / (dft.df + 0.5))
                  * tfc.tf * ({K1} + 1)
                  / (tfc.tf + {K1} * (1 - {B} + {B} * lens.dl / st.avgdl)) ) AS score
      FROM tfc
      JOIN dft USING (term)
      JOIN lens ON lens.doc_id = tfc.doc_id
      CROSS JOIN st
      WHERE tfc.term IN (SELECT term FROM exp)
      GROUP BY tfc.doc_id
    )
    SELECT doc_id, CAST(round(score * 1000) AS BIGINT) AS score_milli
    FROM scored
    ORDER BY score_milli DESC, doc_id ASC
    LIMIT {k}
    """


def wildcard_plus_term_sql(like: str, term_query: str, k: int = 10) -> str:
    """Mixed boolean `wildcard term` oracle (both SHOULD): the wildcard
    clause follows Lucene's CONSTANT_SCORE_REWRITE -- 1.0 for every doc
    holding any term LIKE the pattern -- the term clauses score plain BM25,
    and the boolean union sums matching-clause scores (minShouldMatch=1)."""
    from ..functions.analysis import analyze_text as _at

    terms = list(dict.fromkeys(_at(term_query)))
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
    WITH {bm25_base_ctes()},
    wc AS (SELECT DISTINCT doc_id FROM tfc WHERE term LIKE '{like}'),
    ts AS (
      SELECT tfc.doc_id,
             sum( ln(1 + (st.n - dft.df + 0.5) / (dft.df + 0.5))
                  * tfc.tf * ({K1} + 1)
                  / (tfc.tf + {K1} * (1 - {B} + {B} * lens.dl / st.avgdl)) ) AS score
      FROM tfc
      JOIN dft USING (term)
      JOIN lens ON lens.doc_id = tfc.doc_id
      CROSS JOIN st
      WHERE tfc.term IN ({term_list})
      GROUP BY tfc.doc_id
    ),
    ids_all AS (SELECT doc_id FROM wc UNION SELECT doc_id FROM ts),
    scored AS (
      SELECT i.doc_id,
             coalesce(ts.score, 0)
               + CASE WHEN wc.doc_id IS NOT NULL THEN 1.0 ELSE 0.0 END AS score
      FROM ids_all i
      LEFT JOIN ts ON ts.doc_id = i.doc_id
      LEFT JOIN wc ON wc.doc_id = i.doc_id
    )
    SELECT doc_id, CAST(round(score * 1000) AS BIGINT) AS score_milli
    FROM scored
    ORDER BY score_milli DESC, doc_id ASC
    LIMIT {k}
    """


def block_join_parent_sql(query: str, score_mode: str = "total") -> str:
    """ToParentBlockJoinQuery oracle over the flattened block corpus:
    per-child BM25 for the child query, aggregated per block key
    (conv_id) with the requested ScoreMode, plus the child-hit count.
    Emits the FULL parent set (the engine entry uses k past the parent
    universe) so milli-rounding ties can never straddle a top-k cut."""
    from ..functions.analysis import analyze_text as _at

    terms = list(dict.fromkeys(_at(query)))
    term_list = ", ".join(f"'{t}'" for t in terms)
    agg = {
        "none": "1.0",
        "max": "max(score)",
        "total": "sum(score)",
        "avg": "avg(score)",
        "min": "min(score)",
    }[score_mode]
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
      CROSS JOIN st
      WHERE tfc.term IN ({term_list})
      GROUP BY tfc.doc_id
    )
    SELECT ids.conv_id AS parent_id,
           CAST(round({agg} * 1000) AS BIGINT) AS score_milli,
           count(*) AS n_child_hits
    FROM scored JOIN ids ON ids.doc_id = scored.doc_id
    GROUP BY ids.conv_id
    ORDER BY score_milli DESC, parent_id ASC
    """


def facet_on_results_sql(query: str, field: str) -> str:
    """Q5 over a result set: facet counts across all docs matching any
    query term (non-scoring, like Solr facets over the match set)."""
    terms = list(dict.fromkeys(analyze_text(query)))
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
    WITH {bm25_base_ctes()},
    matched AS (SELECT DISTINCT doc_id FROM tfc WHERE term IN ({term_list}))
    SELECT ids.{field} AS {field}, count(*) AS facet_count
    FROM matched JOIN ids USING (doc_id)
    GROUP BY 1
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


def terms_prefix_sql(prefix: str, limit: int = 10, min_df: int = 1) -> str:
    """/terms component oracle: indexed terms with df, count-sorted
    (df desc, term asc -- Solr's default comparator)."""
    min_df_pred = f"AND df >= {min_df}" if min_df > 1 else ""
    return f"""
    WITH {bm25_base_ctes()}
    SELECT term, CAST(df AS BIGINT) AS df
    FROM dft
    WHERE term LIKE '{prefix}%' {min_df_pred}
    ORDER BY df DESC, term ASC
    LIMIT {limit}
    """


def stats_field_sql(query: str, field: str) -> str:
    """Stats component oracle over an ids column: min/max/count/missing/
    sum/sumOfSquares (integral at this corpus -> BIGINT) + milli mean,
    sample stddev and exact percentiles (DuckDB quantile_cont = Spark's
    percentile aggregate: both linear interpolation on the sorted set),
    over the distinct OR match set of ``query``."""
    terms = list(dict.fromkeys(analyze_text(query)))
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
    WITH {bm25_base_ctes()},
    matched AS (SELECT DISTINCT doc_id FROM tfc WHERE term IN ({term_list})),
    x AS (SELECT ids.{field}::DOUBLE AS v FROM matched JOIN ids USING (doc_id))
    SELECT CAST(min(v) AS BIGINT) AS min,
           CAST(max(v) AS BIGINT) AS max,
           CAST(count(v) AS BIGINT) AS count,
           CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS missing,
           CAST(sum(v) AS BIGINT) AS sum,
           CAST(sum(v * v) AS BIGINT) AS sum_sq,
           CAST(round(avg(v) * 1000) AS BIGINT) AS mean_milli,
           CAST(round(stddev_samp(v) * 1000) AS BIGINT) AS stddev_milli,
           CAST(round(quantile_cont(v, 0.5) * 1000) AS BIGINT) AS p50_milli,
           CAST(round(quantile_cont(v, 0.95) * 1000) AS BIGINT) AS p95_milli
    FROM x
    """


def mlt_topk_sql(
    seed_doc_id: int,
    k: int = 10,
    max_query_terms: int = 25,
    min_tf: int = 2,
    min_df: int = 5,
) -> str:
    """MoreLikeThis oracle, replicating the engine's MLT pipeline from
    first principles: the seed doc's terms gated by mlt.mintf/mlt.mindf,
    ranked by tf x idf (term-asc ties), top maxqt run as a tf-boosted OR
    BM25 query, the seed excluded."""
    return f"""
    WITH {bm25_base_ctes()},
    seedtf AS (
      SELECT term, tf FROM tfc
      WHERE doc_id = {seed_doc_id} AND tf >= {min_tf}
    ),
    cand AS (
      SELECT s.term, s.tf,
             ln(1 + (st.n - d.df + 0.5) / (d.df + 0.5)) AS idf
      FROM seedtf s JOIN dft d USING (term) CROSS JOIN st
      WHERE d.df >= {min_df}
    ),
    ranked AS (
      SELECT term, tf, idf FROM cand
      ORDER BY tf * idf DESC, term ASC LIMIT {max_query_terms}
    ),
    scored AS (
      SELECT tfc.doc_id,
             sum( r.tf * r.idf * tfc.tf * ({K1} + 1)
                  / (tfc.tf + {K1} * (1 - {B} + {B} * lens.dl / st.avgdl)) ) AS score
      FROM tfc
      JOIN ranked r USING (term)
      JOIN lens ON lens.doc_id = tfc.doc_id
      CROSS JOIN st
      GROUP BY tfc.doc_id
    )
    SELECT doc_id, CAST(round(score * 1000) AS BIGINT) AS score_milli
    FROM scored WHERE doc_id != {seed_doc_id}
    ORDER BY score_milli DESC, doc_id ASC
    LIMIT {k}
    """


def grouped_topk_sql(
    query: str, field: str, k: int = 10, group_limit: int = 1
) -> str:
    """Result-grouping oracle: the full OR BM25 match set grouped by an
    ids column; groups ranked by their head doc's (round6, doc_id) key,
    top ``group_limit`` docs per group for the top ``k`` groups."""
    terms = list(dict.fromkeys(analyze_text(query)))
    term_list = ", ".join(f"'{t}'" for t in terms)
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
      CROSS JOIN st
      WHERE tfc.term IN ({term_list})
      GROUP BY tfc.doc_id
    ),
    g AS (
      SELECT s.doc_id, s.score, ids.{field} AS group_value
      FROM scored s JOIN ids USING (doc_id)
    ),
    ing AS (
      SELECT *, row_number() OVER (
        PARTITION BY group_value ORDER BY round(score, 6) DESC, doc_id ASC
      ) AS rank_in_group
      FROM g
    ),
    heads AS (
      SELECT group_value, row_number() OVER (
        ORDER BY round(score, 6) DESC, doc_id ASC
      ) AS group_rank
      FROM ing WHERE rank_in_group = 1
      ORDER BY group_rank LIMIT {k}
    )
    SELECT h.group_value AS group_value,
           CAST(h.group_rank AS BIGINT) AS group_rank,
           CAST(i.rank_in_group AS BIGINT) AS rank_in_group,
           i.doc_id,
           CAST(round(i.score * 1000) AS BIGINT) AS score_milli
    FROM ing i JOIN heads h USING (group_value)
    WHERE i.rank_in_group <= {group_limit}
    ORDER BY h.group_rank, i.rank_in_group
    """


def doc_lengths_sql(max_doc: int = 50) -> str:
    return f"""
    WITH {bm25_base_ctes()}
    SELECT doc_id, CAST(dl AS BIGINT) AS dl
    FROM lens WHERE doc_id < {max_doc}
    ORDER BY doc_id
    """


def _matched_terms(query: str) -> str:
    terms = list(dict.fromkeys(analyze_text(query)))
    return ", ".join(f"'{t}'" for t in terms)


def boosted_topk_sql(query: str, k: int = 10) -> str:
    """search_boosted oracle: full BM25 OR score, then the SAME function
    composition the engine entry uses -- score * recip(ms(ts),3.16e-11,1,1)
    + div(turn_idx,10) + ord(role) (BoostedQuery x date recency +
    additive bfs; ord = the 1-based rank of the doc's role in the sorted
    distinct-role dictionary, recomputed first-principles here --
    engine side: query/engine.py _ord_dict). epoch_ms == Spark
    unix_millis (both are UTC-instant millis of the same parquet
    values)."""
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
      CROSS JOIN st
      WHERE tfc.term IN ({_matched_terms(query)})
      GROUP BY tfc.doc_id
    ),
    rks AS (
      SELECT role, CAST(row_number() OVER (ORDER BY role) AS DOUBLE) AS rk
      FROM (SELECT DISTINCT role FROM ids WHERE role IS NOT NULL)
    ),
    boosted AS (
      SELECT s.doc_id,
             s.score * (CAST(1 AS DOUBLE) / (3.16e-11 * epoch_ms(ids.ts) + 1))
               + (CAST(ids.turn_idx AS DOUBLE) / 10)
               + coalesce(rk.rk, 0) AS score
      FROM scored s
      JOIN ids USING (doc_id)
      LEFT JOIN rks rk ON rk.role = ids.role
    )
    SELECT doc_id, CAST(round(score * 1000) AS BIGINT) AS score_milli
    FROM boosted
    ORDER BY score_milli DESC, doc_id ASC
    LIMIT {k}
    """


def tfidf_boost_sql(query: str, bterm: str, k: int = 10) -> str:
    """Index-backed function-boost oracle: full BM25 OR score plus the
    additive bf ``product(termfreq(text,'bterm'), idf(text,'bterm'))`` --
    per-doc raw tf of the boost term times the BM25 idf of that term,
    both recomputed first-principles from the token CTEs (engine side:
    query/engine.py termfreq postings join + idf dictionary constant)."""
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
      CROSS JOIN st
      WHERE tfc.term IN ({_matched_terms(query)})
      GROUP BY tfc.doc_id
    ),
    btf AS (SELECT doc_id, tf FROM tfc WHERE term = '{bterm}'),
    bidf AS (
      SELECT ln(1 + (st.n - coalesce(d.df, 0) + 0.5)
                / (coalesce(d.df, 0) + 0.5)) AS w
      FROM st LEFT JOIN (SELECT df FROM dft WHERE term = '{bterm}') d ON TRUE
    )
    SELECT s.doc_id,
           CAST(round((s.score + coalesce(btf.tf, 0) * bidf.w) * 1000)
                AS BIGINT) AS score_milli
    FROM scored s LEFT JOIN btf USING (doc_id) CROSS JOIN bidf
    ORDER BY score_milli DESC, s.doc_id ASC
    LIMIT {k}
    """


def pivot2_sql(query: str, f1: str = "role", f2: str = "turn_idx") -> str:
    """facet.pivot oracle, 2 levels flattened to (f1, f2, cnt) rows over
    the exact OR match set -- per-level null drop; with limit >= the value
    cardinality (the entry passes 100 over a <=30-value field pair) the
    flat group-by IS the pivot's leaf table."""
    return f"""
    WITH {bm25_base_ctes()},
    matched AS (SELECT DISTINCT doc_id FROM tfc
                WHERE term IN ({_matched_terms(query)}))
    SELECT ids.{f1} AS {f1}, ids.{f2} AS {f2}, count(*) AS cnt
    FROM matched JOIN ids USING (doc_id)
    WHERE ids.{f1} IS NOT NULL AND ids.{f2} IS NOT NULL
    GROUP BY 1, 2
    """


def json_facet_terms_sql(query: str) -> str:
    """json.facet oracle: terms facet on role with a sum(dl) stat and an
    early=turn_idx<2 query subfacet, flattened to one row per bucket."""
    return f"""
    WITH {bm25_base_ctes()},
    matched AS (SELECT DISTINCT doc_id FROM tfc
                WHERE term IN ({_matched_terms(query)}))
    SELECT ids.role AS val,
           count(*) AS cnt,
           CAST(sum(lens.dl) AS BIGINT) AS dl_sum,
           CAST(count(CASE WHEN ids.turn_idx < 2 THEN 1 END) AS BIGINT)
             AS early
    FROM matched
    JOIN ids USING (doc_id)
    JOIN lens USING (doc_id)
    WHERE ids.role IS NOT NULL
    GROUP BY 1
    """


def collapse_heads_sql(query: str) -> str:
    """Collapse-qparser oracle: each conv_id group's best match by the
    engine's canonical (round6 score desc, doc_id asc) key -- the FULL
    head set (no k cut), so milli ties can never straddle a limit."""
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
      CROSS JOIN st
      WHERE tfc.term IN ({_matched_terms(query)})
      GROUP BY tfc.doc_id
    ),
    ranked AS (
      SELECT s.doc_id, s.score,
             row_number() OVER (
               PARTITION BY ids.conv_id
               ORDER BY round(s.score, 6) DESC, s.doc_id ASC
             ) AS rk
      FROM scored s JOIN ids USING (doc_id)
    )
    SELECT doc_id, CAST(round(score * 1000) AS BIGINT) AS score_milli
    FROM ranked WHERE rk = 1
    """


def geo_filter_sql(query: str, lat: float, lon: float, d_km: float) -> str:
    """{!geofilt} + geodist() oracle: the doc_id-derived lat/lon grid the
    geo entry synthesizes (integer arithmetic -- identical in both
    engines), haversine from functions/geo.py's shared SQL (valid DuckDB),
    circle filter + milli distance. Full filtered set, no k cut."""
    from ..functions.geo import haversine_sql

    hav = haversine_sql("lat", "lon", lat, lon)
    return f"""
    WITH {bm25_base_ctes()},
    matched AS (SELECT DISTINCT doc_id FROM tfc
                WHERE term IN ({_matched_terms(query)})),
    loc AS (
      SELECT doc_id,
             (doc_id % 1800) / 10.0 - 90.0 AS lat,
             ((doc_id * 7) % 3600) / 10.0 - 180.0 AS lon
      FROM ids
    )
    SELECT m.doc_id,
           CAST(round({hav} * 1000) AS BIGINT) AS dist_milli
    FROM matched m JOIN loc USING (doc_id)
    WHERE {hav} <= {d_km!r}
    """


def dismax_topk_sql(
    query: str, qf: dict[str, float], tie: float = 0.0, k: int = 10
) -> str:
    """edismax qf multi-field DisMax oracle (query/multifield.py). Each qf
    field gets its OWN first-principles tf/df/dl/avgdl CTEs over that
    column's tokens (text_general SQL tokenizer; NULL fields tokenize to
    the empty list, so n/avgdl stay index-wide -- the engine's convention);
    per (clause, field, doc) the clause's terms sum a BM25 partial weighted
    by qf_boost x clause_boost x idf_field, then per clause the fields
    combine as max + tie * (sum - max) and clauses sum per doc (the
    ExtendedDismaxQParser score formula)."""
    import re as _re

    from ..functions.analysis import QUERY_ANALYZERS

    an = QUERY_ANALYZERS["text_general"]
    clauses: list[tuple[int, float, list[str]]] = []
    for ci, tok in enumerate(query.split()):
        m = _re.search(r"\^(\d+(?:\.\d+)?)$", tok)
        cb = float(m.group(1)) if m else 1.0
        terms = an(tok[: m.start()] if m else tok)
        if len(set(terms)) != len(terms):
            # the engine weights each analyzed occurrence; this oracle's
            # posting join counts a term once -- keep gate clauses distinct
            raise ValueError(f"clause {tok!r} repeats an analyzed term")
        clauses.append((ci, cb, terms))
    parts, sels = [], []
    for f, fb in qf.items():
        parts.append(f"""
    docs_{f} AS (
      SELECT doc_id,
             regexp_extract_all(lower(coalesce({f}, '')), '[a-z0-9]+') AS toks
      FROM ids),
    lens_{f} AS (SELECT doc_id, len(toks) AS dl FROM docs_{f}),
    tfc_{f} AS (
      SELECT doc_id, term, count(*)::DOUBLE AS tf
      FROM (SELECT doc_id, unnest(toks) AS term FROM docs_{f})
      GROUP BY doc_id, term),
    dft_{f} AS (SELECT term, count(*)::DOUBLE AS df FROM tfc_{f} GROUP BY term),
    st_{f} AS (SELECT count(*)::DOUBLE AS n, avg(dl)::DOUBLE AS avgdl
               FROM lens_{f})""")
        for ci, cb, terms in clauses:
            if not terms:
                continue
            tl = ", ".join(f"'{t}'" for t in terms)
            sels.append(f"""
      SELECT {ci} AS clause, tfc.doc_id,
             sum( {fb!r} * {cb!r}
                  * ln(1 + (st.n - dft.df + 0.5) / (dft.df + 0.5))
                  * tfc.tf * ({K1} + 1)
                  / (tfc.tf + {K1} * (1 - {B} + {B} * lens.dl / st.avgdl))
                ) AS s
      FROM tfc_{f} tfc
      JOIN dft_{f} dft USING (term)
      JOIN lens_{f} lens ON lens.doc_id = tfc.doc_id
      CROSS JOIN st_{f} st
      WHERE tfc.term IN ({tl})
      GROUP BY tfc.doc_id""")
    union = "\n      UNION ALL\n".join(sels)
    return f"""
    WITH t AS ({transcripts_duckdb_cte()}),
    ids AS (
      SELECT row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS doc_id,
             conv_id, turn_idx, role, text, tool, ts
      FROM t
    ),
    {",".join(parts)},
    fs AS ({union}),
    pc AS (
      SELECT clause, doc_id,
             max(s) + {tie!r} * (sum(s) - max(s)) AS ds
      FROM fs GROUP BY clause, doc_id),
    scored AS (SELECT doc_id, sum(ds) AS score FROM pc GROUP BY doc_id)
    SELECT doc_id, CAST(round(score * 1000) AS BIGINT) AS score_milli
    FROM scored
    ORDER BY score_milli DESC, doc_id ASC
    LIMIT {k}
    """
