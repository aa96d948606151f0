"""Minor declared fieldTypes from the reference schema.

The reference's managed-schema declares, beyond the text_* language chains,
three small analysis types (default-base-config/managed-schema.xml):

- ``text_ws`` (:286-290): WhitespaceTokenizer only -- case-SENSITIVE,
  punctuation kept, tokens are the raw whitespace-separated chunks.
- ``lowercase`` (:486-491): KeywordTokenizer + LowerCaseFilter -- the whole
  field value is ONE token, lowercased (exact-match-ignoring-case fields).
- ``text_general_rev`` (:460-474): index side = text_general +
  ReversedWildcardFilter(withOriginal=true) -- every token is indexed
  twice, as itself and as ``\\u0001`` + reversed(token); query side is
  plain text_general. The reversed form turns a leading-wildcard query
  (``*ing``) into a PREFIX lookup (``\\u0001gni*``), which pushes into the
  dictionary scan as a range predicate instead of a full vocabulary scan
  -- the reason the filter exists, and exactly the shape that matters at a
  10^12-turn vocabulary. :func:`reversed_wildcard_prefix` produces that
  rewrite for use with ``BM25Index.terms(prefix=...)``.

``phonetic_en`` lives in :mod:`.phonetic` (it carries the Double Metaphone
implementation).
"""

from __future__ import annotations

import re

# ReversedWildcardFilter's marker char (Lucene uses U+0001 so reversed
# forms sort into their own dictionary range and never collide with text)
REVERSE_MARKER = "\u0001"

_WS_RE = re.compile(r"\S+")


def register_text_ws_chain(name: str = "text_ws") -> None:
    """WhitespaceTokenizer, no filters (managed-schema.xml:286-290): tokens
    are raw whitespace-separated chunks, case preserved ('Spark' != 'spark'
    on this fieldType, matching Solr)."""
    from .analysis import (
        HIGHLIGHT_TOKEN_PATTERNS,
        POSITION_ANALYZERS,
        QUERY_ANALYZERS,
        TOKEN_NORMALIZERS,
    )

    def analyze(text: str | None) -> list[str]:
        return [] if text is None else _WS_RE.findall(text)

    def positions_of(text: str | None) -> dict[str, list[int]]:
        m: dict[str, list[int]] = {}
        if text is not None:
            for i, tok in enumerate(_WS_RE.findall(text)):
                m.setdefault(tok, []).append(i)
        return m

    QUERY_ANALYZERS[name] = analyze
    POSITION_ANALYZERS[name] = positions_of
    TOKEN_NORMALIZERS[name] = lambda tok: [tok]  # verbatim, case-sensitive
    HIGHLIGHT_TOKEN_PATTERNS[name] = r"\S+"


def register_lowercase_chain(name: str = "lowercase") -> None:
    """KeywordTokenizer + lowercase (managed-schema.xml:486-491): the ENTIRE
    field value is one lowercased token -- exact match ignoring case, the
    sortable-identifier fieldType (*_s_lower dynamic fields)."""
    from .analysis import (
        HIGHLIGHT_TOKEN_PATTERNS,
        POSITION_ANALYZERS,
        QUERY_ANALYZERS,
        TOKEN_NORMALIZERS,
    )

    def analyze(text: str | None) -> list[str]:
        return [] if not text else [text.lower()]

    def positions_of(text: str | None) -> dict[str, list[int]]:
        return {} if not text else {text.lower(): [0]}

    QUERY_ANALYZERS[name] = analyze
    POSITION_ANALYZERS[name] = positions_of
    TOKEN_NORMALIZERS[name] = lambda tok: [tok.lower()]
    HIGHLIGHT_TOKEN_PATTERNS[name] = r"(?s).+"  # the whole value is the token


def reversed_wildcard_prefix(pattern: str) -> str | None:
    """Solr's leading-wildcard rewrite against a text_general_rev index:
    ``*suffix`` (or ``?suffix``) -> the dictionary PREFIX
    ``\\u0001`` + reverse(suffix), so the lookup is a range scan on the
    reversed terms instead of a full-vocabulary regex (ReversedWildcard's
    purpose; maxPosAsterisk/maxPosQuestion gate WHICH patterns qualify in
    Solr -- here any pattern with its sole wildcard leading qualifies).
    Returns None when the pattern is not a pure leading-wildcard shape."""
    if len(pattern) >= 2 and pattern[0] in "*?" and not any(
        c in "*?" for c in pattern[1:]
    ):
        return REVERSE_MARKER + pattern[:0:-1].lower()
    return None


def register_text_general_rev_chain(name: str = "text_general_rev") -> None:
    """text_general + index-time ReversedWildcardFilter(withOriginal=true)
    (managed-schema.xml:460-474): each indexed token emits its surface form
    AND marker+reversed at the same position; queries analyze as plain
    text_general (the reversed forms are only reachable through
    :func:`reversed_wildcard_prefix` lookups, exactly like Solr where the
    query parser -- not the analyzer -- consults the reversed terms).

    Norms note: each token adds exactly one reversed overlap, so dl is a
    uniform 2x of the plain chain -- dl/avgdl is unchanged per doc and
    BM25 scores are IDENTICAL to text_general's (Lucene reaches the same
    result via discountOverlaps=true; here the uniform scaling cancels)."""
    from .analysis import (
        HIGHLIGHT_TOKEN_PATTERNS,
        POSITION_ANALYZERS,
        QUERY_ANALYZERS,
        TOKEN_NORMALIZERS,
        TOKEN_RE,
        analyze_text,
    )

    def positions_of(text: str | None) -> dict[str, list[int]]:
        m: dict[str, list[int]] = {}
        if text is None:
            return m
        for i, tok in enumerate(TOKEN_RE.findall(text.lower())):
            m.setdefault(tok, []).append(i)
            m.setdefault(REVERSE_MARKER + tok[::-1], []).append(i)
        return m

    QUERY_ANALYZERS[name] = analyze_text  # query side is plain text_general
    POSITION_ANALYZERS[name] = positions_of
    TOKEN_NORMALIZERS[name] = lambda tok: [tok.lower()]
    HIGHLIGHT_TOKEN_PATTERNS[name] = "[A-Za-z0-9]+"
