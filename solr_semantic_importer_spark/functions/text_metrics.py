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
