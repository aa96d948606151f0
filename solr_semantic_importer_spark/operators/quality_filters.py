"""Document quality filters for training-data curation.

Two published rule families, both implemented as pure Column expressions
(whole-stage codegen, shuffle-free — at 10^12 docs these are map-side
projections like the rest of the metrics family) with DuckDB-SQL twins
for in-suite oracle parity:

- **C4 line-level cleaning** (Raffel et al. 2020, "Exploring the Limits
  of Transfer Learning...", §2.2): keep only lines that end in terminal
  punctuation, have >= `min_words` words, and do not contain the word
  "javascript"; then keep only documents that retain >= `min_lines`
  lines, contain no "lorem ipsum", no curly brace, and no blocklisted
  word. (C4's fourth step — three-sentence-span dedup — is the
  corpus-level pass `operators/exact_substring.py` implements.)
- **Gopher document quality gates** (Rae et al. 2021, Table A1): word
  count in [50, 100_000], mean word length in [3, 10], symbol-to-word
  ratio (``#`` / ellipsis) <= 0.1, bullet-started line fraction <= 0.9,
  ellipsis-ended line fraction <= 0.3, >= 80% of words containing an
  alphabetic character, and >= 2 hits from a fixed stop-word list.
  (Gopher's repetition gates — duplicate-line / repeated-n-gram
  fractions — live in `functions/text_metrics.py`.)

Conventions (the papers leave these open; both dialects use the same):
a "line" is a trimmed non-empty ``\\n`` segment; a "word" is a
whitespace-delimited segment of the trimmed text (NOT the lowercase
alnum index tokenizer — Gopher's word stats need the raw symbols);
"sentences" in C4's >= 5-sentence document rule are approximated by
retained lines (each retained line ends in terminal punctuation).

Reference scope note: the importer ships no quality filters (it indexes
everything the crawl yields — conf/application.yml pipeline); this module
is part of the training-data operator family the engine adds on top.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# C4 terminal punctuation: period, exclamation, question mark, closing quote
_C4_TERMINALS = (".", "!", "?", '"', "\u201d", "'")
# Gopher's stop-word presence list (Table A1: "the, be, to, of, and,
# that, have, with" — at least TWO must appear)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
_BULLETS = ("-", "*", "\u2022")  # hyphen, asterisk, bullet point


def _text(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(""))


def _lines(col: Column | str) -> Column:
    return F.filter(
        F.transform(F.split(_text(col), "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )


def _words(col: Column | str) -> Column:
    """Whitespace words of the trimmed text (empty text -> empty array)."""
    t = F.trim(_text(col))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, "\\s+")
    )


def _line_words(line: Column) -> Column:
    return F.split(line, "\\s+")  # lines are pre-trimmed and non-empty


# --- C4 ----------------------------------------------------------------------

def c4_clean_lines_col(text_col: Column | str, min_words: int = 3) -> Column:
    """C4's line filter: the retained lines, '\\n'-joined.

    A line survives when it ends in terminal punctuation, has at least
    ``min_words`` whitespace words, and does not contain the word
    "javascript" (case-insensitive).
    """
    terminals = F.array(*[F.lit(t) for t in _C4_TERMINALS])

    def keep(line: Column) -> Column:
        return (
            F.array_contains(terminals, F.substring(line, -1, 1))
            & (F.size(_line_words(line)) >= min_words)
            & ~F.lower(line).rlike("\\bjavascript\\b")
        )

    return F.array_join(F.filter(_lines(text_col), keep), "\n")


def c4_keep_doc_col(
    text_col: Column | str,
    cleaned_col: Column | str,
    min_lines: int = 5,
    blocklist: tuple[str, ...] = (),
) -> Column:
    """C4's document filter, evaluated on (raw text, cleaned text).

    Keeps documents whose CLEANED text retains >= ``min_lines`` lines
    (the >=5-sentence rule under the line≈sentence convention) and whose
    RAW text contains no "lorem ipsum", no ``{``, and no blocklisted
    word. ``blocklist`` is caller-supplied (C4 uses a public profanity
    list this repo does not ship); words match case-insensitively on
    word boundaries.
    """
    raw_low = F.lower(_text(text_col))
    keep = (
        (F.size(_lines(cleaned_col)) >= min_lines)
        & ~raw_low.contains("lorem ipsum")
        & ~raw_low.contains("{")
    )
    for w in blocklist:
        keep = keep & ~raw_low.rlike(_word_pattern(w))
    return keep


def _word_pattern(w: str) -> str:
    """A blocklist entry is a literal word, never a pattern — escape it,
    and spell the boundaries as character classes: ``\\b`` fails at
    non-word-char edges (``c++``) and RE2 (the DuckDB twin) has no
    lookaround."""
    return f"(^|[^0-9a-z_]){re.escape(w.lower())}([^0-9a-z_]|$)"


# --- Gopher ------------------------------------------------------------------

def gopher_signals_col(text_col: Column | str) -> Column:
    """The Table-A1 quality signals as one struct column:

    ``word_count``, ``mean_word_len``, ``symbol_word_ratio``,
    ``bullet_line_frac``, ``ellipsis_line_frac``, ``alpha_word_frac``,
    ``stop_hits``. Fractions over zero denominators are 0.0 (an empty
    doc fails the word-count gate anyway).
    """
    words = _words(text_col)
    n_words = F.size(words)
    denom_w = F.when(n_words == 0, F.lit(None)).otherwise(n_words)
    lines = _lines(text_col)
    n_lines = F.size(lines)
    denom_l = F.when(n_lines == 0, F.lit(None)).otherwise(n_lines)

    total_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
    )
    low = F.lower(_text(text_col))
    # symbol counts: '#' occurrences + ellipses ('...' greedy runs or '…')
    hashes = F.length(low) - F.length(F.regexp_replace(low, "#", ""))
    ellipses = F.size(F.regexp_extract_all(low, F.lit("\\.{3,}|\u2026"), F.lit(0)))
    bullet_lines = F.size(
        F.filter(lines, lambda l: F.substring(l, 1, 1).isin(*_BULLETS))
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda l: l.rlike("(\\.{3}|\u2026)$"))
    )
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    toks = F.array_distinct(
        F.regexp_extract_all(low, F.lit("[a-z0-9]+"), F.lit(0))
    )
    stop_hits = F.size(
        F.array_intersect(toks, F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))
    )
    return F.struct(
        n_words.cast("long").alias("word_count"),
        F.coalesce(total_chars / denom_w, F.lit(0.0)).alias("mean_word_len"),
        F.coalesce((hashes + ellipses) / denom_w, F.lit(0.0)).alias("symbol_word_ratio"),
        F.coalesce(bullet_lines / denom_l, F.lit(0.0)).alias("bullet_line_frac"),
        F.coalesce(ellipsis_lines / denom_l, F.lit(0.0)).alias("ellipsis_line_frac"),
        F.coalesce(alpha_words / denom_w, F.lit(0.0)).alias("alpha_word_frac"),
        stop_hits.cast("long").alias("stop_hits"),
    )


def gopher_keep_col(
    signals: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> Column:
    """Apply the Table-A1 thresholds to a :func:`gopher_signals_col` struct."""
    s = signals
    return (
        s["word_count"].between(min_words, max_words)
        & s["mean_word_len"].between(min_mean_word_len, max_mean_word_len)
        & (s["symbol_word_ratio"] <= max_symbol_word_ratio)
        & (s["bullet_line_frac"] <= max_bullet_line_frac)
        & (s["ellipsis_line_frac"] <= max_ellipsis_line_frac)
        & (s["alpha_word_frac"] >= min_alpha_word_frac)
        & (s["stop_hits"] >= min_stop_hits)
    )


# --- DataFrame operators ------------------------------------------------------

def quality_report(
    df: DataFrame,
    text_col: str = "text",
    c4_min_words: int = 3,
    c4_min_lines: int = 5,
    c4_blocklist: tuple[str, ...] = (),
    **gopher_thresholds,
) -> DataFrame:
    """Per-doc audit: all input columns + ``c4_text`` (cleaned),
    ``c4_keep``, ``gopher`` (signal struct), ``gopher_keep``. One
    projection, no shuffle — filter decisions stay inspectable before
    :func:`apply_quality_filters` drops rows."""
    cleaned = c4_clean_lines_col(text_col, min_words=c4_min_words)
    out = df.withColumn("c4_text", cleaned)
    out = out.withColumn(
        "c4_keep",
        c4_keep_doc_col(text_col, "c4_text", min_lines=c4_min_lines,
                        blocklist=c4_blocklist),
    )
    out = out.withColumn("gopher", gopher_signals_col(text_col))
    return out.withColumn(
        "gopher_keep", gopher_keep_col(F.col("gopher"), **gopher_thresholds)
    )


def apply_quality_filters(
    df: DataFrame, text_col: str = "text", rule: str = "both", **kwargs
) -> DataFrame:
    """Keep only passing docs. ``rule`` = 'c4' | 'gopher' | 'both'.
    C4-filtered output carries the CLEANED text in ``text_col`` (the
    paper's pipeline trains on the retained lines)."""
    if rule not in ("c4", "gopher", "both"):
        raise ValueError(f"rule must be c4|gopher|both, got {rule!r}")
    rep = quality_report(df, text_col=text_col, **kwargs)
    keep = {
        "c4": F.col("c4_keep"),
        "gopher": F.col("gopher_keep"),
        "both": F.col("c4_keep") & F.col("gopher_keep"),
    }[rule]
    out = rep.filter(keep)
    if rule in ("c4", "both"):
        out = out.withColumn(text_col, F.col("c4_text"))
    return out.drop("c4_text", "c4_keep", "gopher", "gopher_keep")


# --- DuckDB twins -------------------------------------------------------------

def _lines_sql(text_expr: str) -> str:
    return (
        f"list_filter(list_transform(string_split(coalesce({text_expr}, ''),"
        f" chr(10)), x -> trim(x)), x -> x <> '')"
    )


def _words_sql(text_expr: str) -> str:
    t = f"trim(coalesce({text_expr}, ''))"
    return f"(CASE WHEN {t} = '' THEN [] ELSE regexp_split_to_array({t}, '\\s+') END)"


def c4_clean_lines_sql(text_expr: str, min_words: int = 3) -> str:
    terminals = ", ".join("'" + t.replace("'", "''") + "'" for t in _C4_TERMINALS)
    keep = (
        f"x -> list_contains([{terminals}], x[-1]) "
        f"AND len(regexp_split_to_array(x, '\\s+')) >= {min_words} "
        f"AND NOT regexp_matches(lower(x), '\\bjavascript\\b')"
    )
    # coalesce: DuckDB's array_to_string([]) is NULL, Spark's array_join is ''
    return (
        f"coalesce(array_to_string(list_filter({_lines_sql(text_expr)},"
        f" {keep}), chr(10)), '')"
    )


def c4_keep_doc_sql(
    text_expr: str, cleaned_expr: str, min_lines: int = 5,
    blocklist: tuple[str, ...] = (),
) -> str:
    raw = f"lower(coalesce({text_expr}, ''))"
    parts = [
        f"len({_lines_sql(cleaned_expr)}) >= {min_lines}",
        f"NOT contains({raw}, 'lorem ipsum')",
        f"NOT contains({raw}, '{{')",
    ]
    parts += [
        "NOT regexp_matches({}, '{}')".format(
            raw, _word_pattern(w).replace("'", "''"))
        for w in blocklist
    ]
    return "(" + " AND ".join(parts) + ")"


def gopher_signals_sql(text_expr: str) -> dict[str, str]:
    """Column-expression twins of each :func:`gopher_signals_col` field."""
    words = _words_sql(text_expr)
    lines = _lines_sql(text_expr)
    low = f"lower(coalesce({text_expr}, ''))"
    nw = f"len({words})"
    nl = f"len({lines})"
    stop = list(GOPHER_STOPWORDS)
    return {
        "word_count": nw,
        "mean_word_len": (
            f"CASE WHEN {nw} = 0 THEN 0.0 ELSE "
            f"list_sum(list_transform({words}, w -> length(w))) * 1.0 / {nw} END"
        ),
        "symbol_word_ratio": (
            f"CASE WHEN {nw} = 0 THEN 0.0 ELSE "
            f"((length({low}) - length(replace({low}, '#', ''))) + "
            f"len(regexp_extract_all({low}, '\\.{{3,}}|\u2026'))) * 1.0 / {nw} END"
        ),
        "bullet_line_frac": (
            f"CASE WHEN {nl} = 0 THEN 0.0 ELSE "
            f"len(list_filter({lines}, l -> list_contains(['-', '*', '\u2022'],"
            f" l[1]))) * 1.0 / {nl} END"
        ),
        "ellipsis_line_frac": (
            f"CASE WHEN {nl} = 0 THEN 0.0 ELSE "
            f"len(list_filter({lines}, l -> regexp_matches(l,"
            f" '(\\.{{3}}|\u2026)$'))) * 1.0 / {nl} END"
        ),
        "alpha_word_frac": (
            f"CASE WHEN {nw} = 0 THEN 0.0 ELSE "
            f"len(list_filter({words}, w -> regexp_matches(w, '[A-Za-z]')))"
            f" * 1.0 / {nw} END"
        ),
        "stop_hits": (
            f"len(list_intersect(list_distinct(regexp_extract_all({low},"
            f" '[a-z0-9]+')), {stop!r}))"
        ),
    }


def gopher_keep_sql(text_expr: str, **thresholds) -> str:
    d = {
        "min_words": 50, "max_words": 100_000,
        "min_mean_word_len": 3.0, "max_mean_word_len": 10.0,
        "max_symbol_word_ratio": 0.1, "max_bullet_line_frac": 0.9,
        "max_ellipsis_line_frac": 0.3, "min_alpha_word_frac": 0.8,
        "min_stop_hits": 2,
    }
    bad = set(thresholds) - set(d)
    if bad:
        raise ValueError(f"unknown gopher thresholds {sorted(bad)}")
    d.update(thresholds)
    s = gopher_signals_sql(text_expr)
    return (
        f"({s['word_count']} BETWEEN {d['min_words']} AND {d['max_words']}"
        f" AND {s['mean_word_len']} BETWEEN {d['min_mean_word_len']} AND {d['max_mean_word_len']}"
        f" AND {s['symbol_word_ratio']} <= {d['max_symbol_word_ratio']}"
        f" AND {s['bullet_line_frac']} <= {d['max_bullet_line_frac']}"
        f" AND {s['ellipsis_line_frac']} <= {d['max_ellipsis_line_frac']}"
        f" AND {s['alpha_word_frac']} >= {d['min_alpha_word_frac']}"
        f" AND {s['stop_hits']} >= {d['min_stop_hits']})"
    )
