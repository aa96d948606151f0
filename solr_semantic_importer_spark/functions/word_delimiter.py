"""WordDelimiterGraph + the text_en_splitting analysis chain (SURVEY T6).

Reference semantics: the ``text_en_splitting`` fieldType the importer's base
configset declares (default-base-config/managed-schema.xml:393-423):

    index:  whitespace tokenize -> stop(en, ignoreCase) -> WDG(
              generateWordParts=1, generateNumberParts=1, catenateWords=1,
              catenateNumbers=1, catenateAll=0, splitOnCaseChange=1)
            -> lowercase -> porterStem
    query:  same but catenateWords=0, catenateNumbers=0 (graph-safe)

so query "wi fi" matches document "WiFi" or "wi-fi" (the schema's own
example): the index emits parts [wi, fi] plus the catenated [wifi].

Frozen spec (shared verbatim with the DuckDB oracle SQL):

- whitespace tokens = maximal runs of non-whitespace.
- stop: the whole whitespace token, lowercased, against the EN stop set
  (faithful to StopFilter-before-WDG: "The" is stopped, "the," is NOT --
  it reaches WDG and splits to "the").
- split boundaries: non-alphanumerics, lower->Upper case change,
  UPPERrun->Upper+lower boundary ("POWERShot" -> POWER, Shot), and
  alpha<->digit transitions. Part regex: [0-9]+ | [A-Z]+(?![a-z]) |
  [A-Z]?[a-z]+ (the oracle reproduces it RE2-safely with boundary-space
  insertion, asserted equal by golden tests).
- catenateWords/Numbers: per maximal same-kind run of parts (runs broken by
  the other kind, NOT by delimiters), emit the concatenation when the run
  has >= 2 parts, at the position of the run's first part.
- positions: parts take consecutive positions; catenated tokens overlap
  their run's first part; stopped and part-less tokens advance the position
  counter by one (stop-gap), so phrases never match across them.
- dl counts every emitted token INCLUDING catenated forms (documented
  deviation from Lucene's discountOverlaps norm, like the exact-dl
  deviation in SURVEY I2) -- identical in engine and oracle by sharing
  this module.

Two chains registered from this module:
- ``text_en_splitting``: the full reference chain (with Porter). Covered by
  golden + rank-identity pytest (DuckDB has no offline Porter, so no SQL
  oracle -- same situation as text_en in round 1).
- ``text_splitting``: identical minus the stem; fully expressible in DuckDB
  (see :func:`splitting_toks_sql`), used for the driver oracle entry.
"""

from __future__ import annotations

import re

from .stopwords import EN_STOPWORDS

_PART_RE = re.compile(r"[0-9]+|[A-Z]+(?![a-z])|[A-Z]?[a-z]+")


def wdg_emit(token: str, catenate: bool) -> list[tuple[str, int]]:
    """WordDelimiterGraph over ONE whitespace token: returns (form, rel_pos)
    pairs -- parts at 0..n-1, catenated run forms at their run's first part
    position. Forms keep original case (lowercase is a later filter)."""
    parts = _PART_RE.findall(token)
    if not parts:
        return []
    out = [(p, i) for i, p in enumerate(parts)]
    if catenate:
        start = 0
        for i in range(1, len(parts) + 1):
            if i == len(parts) or parts[i][0].isdigit() != parts[start][0].isdigit():
                if i - start >= 2:
                    out.append(("".join(parts[start:i]), start))
                start = i
    return out


def _positions_map(
    text: str | None, *, stem: bool, catenate: bool
) -> dict[str, list[int]]:
    m: dict[str, list[int]] = {}
    if text is None:
        return m
    if stem:
        from .stemmer import MemoStemmer

        norm = MemoStemmer()
    else:
        norm = lambda s: s  # noqa: E731
    pos = 0
    for tok in text.split():
        if tok.lower() in EN_STOPWORDS:
            pos += 1  # stop-gap
            continue
        emitted = wdg_emit(tok, catenate)
        if not emitted:
            pos += 1  # delimiter-only token: gap preserved
            continue
        n_parts = max(i for _, i in emitted) + 1
        for form, rel in emitted:
            m.setdefault(norm(form.lower()), []).append(pos + rel)
        pos += n_parts
    return m


def positions_map_en_splitting(text: str | None) -> dict[str, list[int]]:
    """Index-time text_en_splitting (catenate on, Porter)."""
    return _positions_map(text, stem=True, catenate=True)


def positions_map_splitting(text: str | None) -> dict[str, list[int]]:
    """Index-time text_splitting (catenate on, NO stem -- oracle chain)."""
    return _positions_map(text, stem=False, catenate=True)


def _query_terms(text: str | None, *, stem: bool) -> list[str]:
    """Query-time variant: catenate OFF (managed-schema.xml query analyzer)."""
    if text is None:
        return []
    if stem:
        from .stemmer import MemoStemmer

        norm = MemoStemmer()
    else:
        norm = lambda s: s  # noqa: E731
    out: list[str] = []
    for tok in text.split():
        if tok.lower() in EN_STOPWORDS:
            continue
        for form, _ in wdg_emit(tok, catenate=False):
            out.append(norm(form.lower()))
    return out


def analyze_text_en_splitting(text: str | None) -> list[str]:
    return _query_terms(text, stem=True)


def analyze_text_splitting(text: str | None) -> list[str]:
    return _query_terms(text, stem=False)


def _normalize_token_en_splitting(tok: str) -> list[str]:
    """Highlighting normalizer: a RAW surface token's indexed forms
    (original case preserved so WDG case-change splits still apply)."""
    if tok.lower() in EN_STOPWORDS:
        return []
    from .stemmer import stem_en

    return [stem_en(f.lower()) for f, _ in wdg_emit(tok, catenate=True)]


def _normalize_token_splitting(tok: str) -> list[str]:
    if tok.lower() in EN_STOPWORDS:
        return []
    return [f.lower() for f, _ in wdg_emit(tok, catenate=True)]


# ---------------------------------------------------------------------------
# DuckDB oracle SQL (text_splitting chain -- RE2-safe, no lookahead)
# ---------------------------------------------------------------------------

_STOP_LIST_SQL = "[" + ", ".join(f"'{w}'" for w in sorted(EN_STOPWORDS)) + "]"

# boundary-space insertion reproducing _PART_RE without lookahead:
# lower->Upper, UPPERrun->Upper+lower, alpha<->digit
_CASE_SPLIT_STEPS = [
    (r"([a-z])([A-Z])", r"\1 \2"),
    (r"([A-Z]+)([A-Z][a-z])", r"\1 \2"),
    (r"([A-Za-z])([0-9])", r"\1 \2"),
    (r"([0-9])([A-Za-z])", r"\1 \2"),
]


def _boundary_split_sql(expr: str) -> str:
    for pat, rep in _CASE_SPLIT_STEPS:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    return expr


def splitting_toks_sql(text_expr: str) -> str:
    """DuckDB expression: text -> the text_splitting index-chain token list
    (parts + catenated runs, lowercased, stop-filtered). Token-for-token
    identical to positions_map_splitting's bag of terms."""
    parts = (
        f"list_transform(regexp_extract_all({_boundary_split_sql('t')}, "
        "'[A-Za-z0-9]+'), p -> lower(p))"
    )
    # maximal letter runs (delimiters don't break, digits do); catenate when
    # the run holds >= 2 parts after case splitting
    word_cats = (
        "list_transform(list_filter("
        "  regexp_extract_all(t, '[A-Za-z]+([^A-Za-z0-9]*[A-Za-z]+)*'),"
        f"  r -> len(regexp_extract_all({_boundary_split_sql('r')}, '[A-Za-z]+')) >= 2),"
        "  r -> lower(regexp_replace(r, '[^A-Za-z]', '', 'g')))"
    )
    num_cats = (
        "list_transform(list_filter("
        "  regexp_extract_all(t, '[0-9]+([^A-Za-z0-9]*[0-9]+)*'),"
        "  r -> len(regexp_extract_all(r, '[0-9]+')) >= 2),"
        "  r -> regexp_replace(r, '[^0-9]', '', 'g'))"
    )
    return f"""flatten(list_transform(
      list_filter(string_split_regex(coalesce({text_expr}, ''), '\\s+'),
                  t -> len(t) > 0 AND NOT list_contains({_STOP_LIST_SQL}, lower(t))),
      t -> list_concat(list_concat({parts}, {word_cats}), {num_cats})))"""
