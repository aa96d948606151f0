"""Text analysis metrics for training-data pipelines.

Language-ID (stopword-overlap heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and rolling-hash document fingerprinting.
Everything is built-in Column expressions (codegen'd, shuffle-free per row);
each has a DuckDB-SQL twin for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .analysis import TOKEN_PATTERN, tokens_col

P = 2_147_483_647

# tiny per-language stopword profiles (public, standard function words)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "you", "that"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los", "se", "no"),
    "de": ("der", "die", "und", "das", "ist", "du", "ich", "nicht", "ein", "zu"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "du", "que", "est"),
}

BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(F.coalesce(c, F.lit("")))
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, "\\s+"))
    )


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish subword count: letter runs, digit runs, single non-alnum marks
    (over the lowercased text)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(
        F.regexp_extract_all(F.lower(F.coalesce(c, F.lit(""))), F.lit(BPE_ISH_PATTERN), F.lit(0))
    )


def _overlap(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in words])))


def lang_id_col(text_col: Column | str) -> Column:
    """Predict language by stopword-profile overlap; ties/zero -> 'und'.

    Deterministic tie-break: language key ascending (de < en < es < fr).
    """
    toks = tokens_col(text_col)
    langs = sorted(LANG_PROFILES)
    scores = [(_overlap(toks, LANG_PROFILES[lg]), lg) for lg in langs]
    best_score = scores[0][0]
    for s, _ in scores[1:]:
        best_score = F.greatest(best_score, s)
    pred = F.lit("und")
    for s, lg in reversed(scores):  # earlier langs override on ties
        pred = F.when((s == best_score) & (best_score > 0), F.lit(lg)).otherwise(pred)
    return pred


def quality_score_col(text_col: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic:
    0.4*min(n_tokens/50, 1) + 0.3*(1 - punct_ratio) + 0.3*stopword_ratio_capped
    where punct_ratio = non-[a-z0-9 ] chars / chars (lowercased),
    stopword_ratio = english-profile tokens / tokens, capped at 0.5 and
    rescaled. Empty/null text scores 0.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    low = F.lower(F.coalesce(c, F.lit("")))
    n_chars = F.length(low)
    clean = F.regexp_replace(low, "[^a-z0-9 ]", "")
    punct_ratio = (n_chars - F.length(clean)) / F.when(n_chars == 0, F.lit(None)).otherwise(n_chars)
    toks = tokens_col(c)
    n_toks = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*LANG_PROFILES["en"])))
    stop_ratio = stop_hits / F.when(n_toks == 0, F.lit(None)).otherwise(n_toks)
    score = (
        0.4 * F.least(n_toks / F.lit(50.0), F.lit(1.0))
        + 0.3 * (1.0 - F.coalesce(punct_ratio, F.lit(0.0)))
        + 0.3 * F.least(F.coalesce(stop_ratio, F.lit(0.0)) * 2.0, F.lit(1.0))
    )
    return F.when(n_toks == 0, F.lit(0.0)).otherwise(score)


def fingerprint_col(text_col: Column | str) -> Column:
    """Order-sensitive rolling-hash fingerprint of the token stream:
    fold acc = (acc*31 + (md5int(tok) % P)) % P, acc0 = 0. Empty -> 0."""
    toks = tokens_col(text_col)
    hashes = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long") % P
    )
    return F.aggregate(hashes, F.lit(0).cast("long"), lambda a, h: (a * 31 + h) % P)


# --- DuckDB twins -----------------------------------------------------------

def token_count_sql(text_expr: str) -> tuple[str, str]:
    """(whitespace_count_sql, bpe_count_sql)"""
    ws = (
        f"CASE WHEN trim(coalesce({text_expr}, '')) = '' THEN 0 "
        f"ELSE len(regexp_split_to_array(trim(coalesce({text_expr}, '')), '\\s+')) END"
    )
    bpe = f"len(regexp_extract_all(lower(coalesce({text_expr}, '')), '{BPE_ISH_PATTERN}'))"
    return ws, bpe


def lang_id_sql(text_expr: str) -> str:
    toks = f"list_distinct(regexp_extract_all(lower(coalesce({text_expr}, '')), '{TOKEN_PATTERN}'))"
    langs = sorted(LANG_PROFILES)
    ov = {
        lg: f"len(list_intersect({toks}, {list(LANG_PROFILES[lg])!r}))" for lg in langs
    }
    best = f"greatest({', '.join(ov.values())})"
    branches = " ".join(
        f"WHEN {ov[lg]} = best AND best > 0 THEN '{lg}'" for lg in langs
    )
    return f"(SELECT CASE {branches} ELSE 'und' END FROM (SELECT {best} AS best))"


def fingerprint_sql(text_expr: str) -> str:
    toks = f"regexp_extract_all(lower(coalesce({text_expr}, '')), '{TOKEN_PATTERN}')"
    hashes = f"list_transform({toks}, t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % {P})"
    return (
        f"CASE WHEN len({toks}) = 0 THEN 0 "
        f"ELSE list_reduce({hashes}, (a, h) -> (a * 31 + h) % {P}) END"
    )


def quality_score_sql(text_expr: str) -> str:
    low = f"lower(coalesce({text_expr}, ''))"
    toks = f"regexp_extract_all({low}, '{TOKEN_PATTERN}')"
    stop = list(LANG_PROFILES["en"])
    return f"""
    (SELECT CASE WHEN n_toks = 0 THEN 0.0 ELSE
        0.4 * least(n_toks / 50.0, 1.0)
      + 0.3 * (1.0 - CASE WHEN n_chars = 0 THEN 0.0 ELSE (n_chars - n_clean) * 1.0 / n_chars END)
      + 0.3 * least(CASE WHEN n_toks = 0 THEN 0.0 ELSE n_stop * 1.0 / n_toks END * 2.0, 1.0) END
     FROM (SELECT len({toks}) AS n_toks,
                  length({low}) AS n_chars,
                  length(regexp_replace({low}, '[^a-z0-9 ]', '', 'g')) AS n_clean,
                  len(list_filter({toks}, t -> list_contains({stop!r}, t))) AS n_stop))
    """


# --- repetition metrics (Gopher-style quality signals) -----------------------
#
# The repetition family of Rae et al. 2021 (Gopher, Table A1) / Penedo et
# al. 2023 (RefinedWeb): heavily self-repeating documents (boilerplate,
# scraper loops, keyword stuffing) are filtered on duplicate-line and
# repeated-n-gram fractions. Conventions used here (documented because the
# papers differ in overlap handling):
#
# - a "line" is a trimmed, non-empty '\n' segment of the raw text;
# - dup_line_frac counts occurrences BEYOND the first of each line;
# - dup_line_char_frac is those occurrences' char mass over all line chars;
# - top_ngram_char_frac(n) = max over distinct word n-grams of
#   count * len(gram) over the lowercased text's char count;
# - dup_ngram_char_frac(n) = char mass of ALL occurrences of n-grams seen
#   2+ times over the text's char count. Overlapping occurrences count
#   independently (can exceed 1 on degenerate text) -- simplified from
#   Gopher's non-overlapping character marking, monotone in the same
#   direction.
#
# Everything is a sorted-array fold (O(G log G) per doc, whole-stage
# codegen, shuffle-free) -- no explode, no groupBy: at 10^12 docs these are
# pure map-side columns like the rest of this module.


def lines_col(text_col: Column | str) -> Column:
    """Trimmed non-empty lines of the raw text."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(
        # one-arg lambda: transform() feeds (element, index) to two-arg
        # callables, and bare F.trim's optional second param would eat the
        # index as a trim-character set
        F.transform(F.split(F.coalesce(c, F.lit("")), "\n"),
                    lambda x: F.trim(x)),
        lambda x: x != "",
    )


def dup_line_frac_col(text_col: Column | str) -> Column:
    """Fraction of line occurrences that repeat an earlier line."""
    ls = lines_col(text_col)
    n = F.size(ls)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        (n - F.size(F.array_distinct(ls))) / n
    ).cast("double")


def dup_line_char_frac_col(text_col: Column | str) -> Column:
    """Char mass of repeated line occurrences over all line chars."""
    ls = lines_col(text_col)
    total = F.aggregate(
        ls, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    s = F.array_sort(ls)
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("dup"),
    )
    folded = F.aggregate(
        s, acc0,
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a["prev"], a["dup"] + F.length(x))
            .otherwise(a["dup"]).alias("dup"),
        ),
        lambda a: a["dup"],
    )
    return F.when(total == 0, F.lit(0.0)).otherwise(
        folded / total
    ).cast("double")


def word_ngrams_col(text_col: Column | str, n: int) -> Column:
    """ALL word n-grams (non-distinct, space-joined) of the frozen
    tokenizer's stream; texts under n tokens yield none (repetition of a
    sub-n text is not a signal, unlike the dedup shingles' short-text
    rule)."""
    toks = tokens_col(text_col)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _text_chars(text_col: Column | str) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.length(F.lower(F.coalesce(c, F.lit(""))))


def top_ngram_char_frac_col(text_col: Column | str, n: int = 2) -> Column:
    """max over distinct word n-grams of count*len(gram), over text chars
    (ties resolve to the larger char mass by construction)."""
    s = F.array_sort(word_ngrams_col(text_col, n))
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def _merge(a, x):
        run = F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(a["best"], run * F.length(x)).alias("best"),
        )

    best = F.aggregate(s, acc0, _merge, lambda a: a["best"])
    chars = _text_chars(text_col)
    return F.when(chars == 0, F.lit(0.0)).otherwise(best / chars).cast("double")


def dup_ngram_char_frac_col(text_col: Column | str, n: int = 5) -> Column:
    """Char mass of every occurrence of word n-grams seen 2+ times, over
    text chars."""
    s = F.array_sort(word_ngrams_col(text_col, n))
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("tot"),
    )

    def _flush(a):
        return F.when(
            a["run"] >= 2, a["tot"] + a["run"] * F.length(a["prev"])
        ).otherwise(a["tot"])

    def _merge(a, x):
        closing = (x != a["prev"]) | a["prev"].isNull()
        return F.struct(
            x.alias("prev"),
            F.when(closing, F.lit(1).cast("long"))
            .otherwise(a["run"] + 1).alias("run"),
            F.when(closing, _flush(a)).otherwise(a["tot"]).alias("tot"),
        )

    tot = F.aggregate(s, acc0, _merge, _flush)
    chars = _text_chars(text_col)
    return F.when(chars == 0, F.lit(0.0)).otherwise(tot / chars).cast("double")


# --- repetition DuckDB twins -------------------------------------------------

def _lines_sql(text_expr: str) -> str:
    return (
        f"list_filter(list_transform(string_split(coalesce({text_expr}, ''),"
        f" chr(10)), x -> trim(x)), x -> x <> '')"
    )


def _ngrams_sql(text_expr: str, n: int) -> str:
    toks = f"regexp_extract_all(lower(coalesce({text_expr}, '')), '{TOKEN_PATTERN}')"
    return f"""(SELECT CASE WHEN len(toks) >= {n} THEN
          list_transform(generate_series(0, len(toks) - {n}),
                         i -> array_to_string(toks[i + 1 : i + {n}], ' '))
        ELSE [] END FROM (SELECT {toks} AS toks))"""


def dup_line_frac_sql(text_expr: str) -> str:
    ls = _lines_sql(text_expr)
    return (
        f"(SELECT CASE WHEN len(ls) = 0 THEN 0.0 ELSE "
        f"(len(ls) - len(list_distinct(ls))) * 1.0 / len(ls) END "
        f"FROM (SELECT {ls} AS ls))"
    )


def dup_line_char_frac_sql(text_expr: str) -> str:
    ls = _lines_sql(text_expr)
    return f"""(SELECT CASE WHEN coalesce(sum(c * l), 0) = 0 THEN 0.0 ELSE
          sum(CASE WHEN c > 1 THEN (c - 1) * l ELSE 0 END) * 1.0 / sum(c * l) END
        FROM (SELECT count(*) AS c, length(ln) AS l
              FROM (SELECT unnest({ls}) AS ln) GROUP BY ln))"""


def top_ngram_char_frac_sql(text_expr: str, n: int = 2) -> str:
    g = _ngrams_sql(text_expr, n)
    chars = f"length(lower(coalesce({text_expr}, '')))"
    return f"""(SELECT CASE WHEN {chars} = 0 THEN 0.0 ELSE
          coalesce(max(c * l), 0) * 1.0 / {chars} END
        FROM (SELECT count(*) AS c, length(gr) AS l
              FROM (SELECT unnest({g}) AS gr) GROUP BY gr))"""


def dup_ngram_char_frac_sql(text_expr: str, n: int = 5) -> str:
    g = _ngrams_sql(text_expr, n)
    chars = f"length(lower(coalesce({text_expr}, '')))"
    return f"""(SELECT CASE WHEN {chars} = 0 THEN 0.0 ELSE
          coalesce(sum(CASE WHEN c >= 2 THEN c * l ELSE 0 END), 0) * 1.0 / {chars} END
        FROM (SELECT count(*) AS c, length(gr) AS l
              FROM (SELECT unnest({g}) AS gr) GROUP BY gr))"""
