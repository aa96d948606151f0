"""Text analysis: the engine's canonical analyzer chain.

Reference semantics (Layer B): the ``text_general`` index/query analysis chain
the importer's configset installs --
/root/reference/src/main/resources/default-base-config/managed-schema.xml:298-313:
StandardTokenizer -> StopFilter (stopwords.txt ships EMPTY -> no-op) ->
[query-time only: SynonymGraph from synonyms.txt] -> LowerCaseFilter.

Frozen spec (shared verbatim by the engine, the numpy oracle and the DuckDB
oracle SQL, so disagreement is impossible by construction):

    tokens(text) = regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+')

i.e. lowercase, then maximal runs of ASCII [a-z0-9]. This is a deterministic
simplification of UAX#29 word-break; it is applied identically at index and
query time. Stop set is empty (matching the shipped stopwords.txt), so hot
terms like "the" ARE indexed -- which is exactly why the index build needs
hot-term salting (see index/build.py).

Three implementations, one spec:
- ``TOKEN_RE`` / ``analyze_text`` - plain Python (oracle + query-side driver code)
- ``tokens_col`` - JVM-side Column expression (whole-stage codegen, zero Python)
- ``term_freqs_udf`` - Arrow-batched pandas UDF computing per-doc tf WITHOUT
  exploding tokens into the shuffle (SURVEY.md section 7 "10^12-turn posture":
  (doc, term, tf) is 5-10x smaller than (doc, token))
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

TOKEN_PATTERN = "[a-z0-9]+"
TOKEN_RE = re.compile(TOKEN_PATTERN)


def analyze_text(text: str | None) -> list[str]:
    """Frozen analyzer, plain-Python form (used by oracle + query parsing)."""
    if text is None:
        return []
    return TOKEN_RE.findall(text.lower())


def tokens_col(col: Column | str) -> Column:
    """Frozen analyzer as a JVM Column expression (codegen'd, no Python).

    Identical output to :func:`analyze_text` -- the pattern is pure ASCII so
    Java and Python regex semantics coincide; golden tests assert equality.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(F.coalesce(c, F.lit(""))), F.lit(TOKEN_PATTERN), F.lit(0))


def tokens_sql(expr: str) -> str:
    """Frozen analyzer as a SQL fragment valid in BOTH Spark SQL and DuckDB."""
    return f"regexp_extract_all(lower(coalesce({expr}, '')), '{TOKEN_PATTERN}')"


@pandas_udf(T.MapType(T.StringType(), T.IntegerType()))
def term_freqs_udf(texts: pd.Series) -> pd.Series:
    """text -> {term: tf} map, Arrow-batched.

    Replaces the reference's external gRPC analysis hop (the importer ships
    analysis to Solr; ChunkDocumentCreator.java:95-103 ships chunking to a
    gRPC service) with an in-engine vectorized kernel.
    """
    out = []
    findall = TOKEN_RE.findall
    for t in texts:
        if t is None:
            out.append({})
        else:
            out.append(dict(Counter(findall(t.lower()))))
    return pd.Series(out)


@pandas_udf(T.MapType(T.StringType(), T.ArrayType(T.IntegerType())))
def term_positions_udf(texts: pd.Series) -> pd.Series:
    """text -> {term: [positions]} map, Arrow-batched.

    Position = 0-based token index after analysis (Lucene stores the same
    for every indexed="true" text field by default; positionIncrementGap
    does not apply -- one value per turn). tf(t) == len(positions[t]),
    dl == total token count, so this strictly supersedes term_freqs_udf
    when the index stores positions.
    """
    out = []
    findall = TOKEN_RE.findall
    for t in texts:
        if t is None:
            out.append({})
            continue
        m: dict[str, list[int]] = {}
        for i, tok in enumerate(findall(t.lower())):
            m.setdefault(tok, []).append(i)
        out.append(m)
    return pd.Series(out)


@pandas_udf(T.IntegerType())
def doc_len_udf(texts: pd.Series) -> pd.Series:
    """text -> token count (doc length dl for BM25's b-normalization)."""
    findall = TOKEN_RE.findall
    return pd.Series(
        [0 if t is None else len(findall(t.lower())) for t in texts], dtype="int32"
    )


# --- text_en chain (T5): stop(en) -> lowercase -> Porter stem ---------------
from .stopwords import EN_STOPWORDS  # noqa: E402 (re-export, shared set)


def analyze_text_en(text: str | None) -> list[str]:
    """text_en chain, terms only (query-side): tokenize -> stop ->
    keywordMarker(protwords) -> stem (managed-schema.xml:354-381)."""
    from .stemmer import stem_en

    if text is None:
        return []
    return [
        stem_en(t)
        for t in TOKEN_RE.findall(text.lower())
        if t not in EN_STOPWORDS
    ]


def positions_map_en(text: str | None) -> dict[str, list[int]]:
    """text_en with Lucene stop-gap position semantics: surviving tokens keep
    their ORIGINAL token index, so phrases never match across a removed
    stopword (StopFilter preserves position increments)."""
    from .stemmer import MemoStemmer

    stem = MemoStemmer()
    m: dict[str, list[int]] = {}
    if text is None:
        return m
    for i, tok in enumerate(TOKEN_RE.findall(text.lower())):
        if tok in EN_STOPWORDS:
            continue
        m.setdefault(stem(tok), []).append(i)
    return m


def positions_map_general(text: str | None) -> dict[str, list[int]]:
    m: dict[str, list[int]] = {}
    if text is None:
        return m
    for i, tok in enumerate(TOKEN_RE.findall(text.lower())):
        m.setdefault(tok, []).append(i)
    return m


QUERY_ANALYZERS = {"text_general": analyze_text, "text_en": analyze_text_en}
POSITION_ANALYZERS = {
    "text_general": positions_map_general,
    "text_en": positions_map_en,
}


def _normalize_token_general(tok: str) -> list[str]:
    return [tok.lower()]


def _normalize_token_en(tok: str) -> list[str]:
    from .stemmer import stem_en

    t = tok.lower()
    return [] if t in EN_STOPWORDS else [stem_en(t)]


# RAW surface token -> the indexed form(s) it analyzes to (for highlighting:
# a surface token is highlighted iff any of its analyzed forms is a query
# term -- regex over stems like 'tabl' would never hit the stored text).
# Tokens arrive with original case (WDG chains split on case change).
TOKEN_NORMALIZERS = {
    "text_general": _normalize_token_general,
    "text_en": _normalize_token_en,
}

# how to find surface tokens in stored text, per chain: the word chains
# tokenize on alnum runs; the whitespace-tokenized WDG chains treat the
# whole whitespace token (minus surrounding punctuation) as the unit, so
# "wi-fi" highlights as one span when the query hits its catenated form.
_ALNUM_TOKEN = "[A-Za-z0-9]+"
_WS_CORE_TOKEN = r"[A-Za-z0-9](?:\S*[A-Za-z0-9])?"
HIGHLIGHT_TOKEN_PATTERNS = {
    "text_general": _ALNUM_TOKEN,
    "text_en": _ALNUM_TOKEN,
}

# per-chain STAGE metadata for the /analysis/field handler: the same
# callables the chain's normalizer composes, kept separately so the
# handler can show the token stream AFTER EACH STAGE (Solr's analysis
# screen). Chains whose analysis is not a linear token->token pipeline
# (WDG splitting, CJK/ja/th bigrams) have no entry and the handler fails
# loud for them.
CHAIN_STAGES: dict[str, dict] = {
    "text_general": {
        "token_re": TOKEN_RE, "token_transform": None,
        "stop": frozenset(), "post_stop_transform": None, "stem": None,
    },
}


def _register_text_en_stages() -> None:
    from .stemmer import stem_en

    CHAIN_STAGES["text_en"] = {
        "token_re": TOKEN_RE, "token_transform": None,
        "stop": EN_STOPWORDS, "post_stop_transform": None, "stem": stem_en,
    }


_register_text_en_stages()

# text_en_splitting / text_splitting (T6 WordDelimiterGraph chains) register
# themselves here; the bottom import is cycle-safe because word_delimiter
# only needs EN_STOPWORDS, which is already bound above.
from .word_delimiter import (  # noqa: E402
    _normalize_token_en_splitting,
    _normalize_token_splitting,
    analyze_text_en_splitting,
    analyze_text_splitting,
    positions_map_en_splitting,
    positions_map_splitting,
)

def register_analysis_chain(
    name: str,
    stop_set: frozenset[str] | set[str] = frozenset(),
    stem_fn=None,
    token_transform=None,
    post_stop_transform=None,
    token_re=None,
    highlight_pattern: str | None = None,
) -> None:
    """Register a custom analysis chain usable everywhere a built-in chain
    is (BuildConfig.analyzer, query analysis, highlighting, oracles).

    Covers the shared shape of the reference schema's 30+ language
    fieldTypes (managed-schema.xml:568+), in Lucene's filter order:
    tokenize -> [token_transform, e.g. elision] -> stop(ignoreCase) ->
    [post_stop_transform, e.g. germanNormalization] -> [stem]. Lowercasing
    happens before the transforms (the frozen tokenizer already runs on
    lowercased text). ``token_re`` overrides the default ASCII ``[a-z0-9]+``
    tokenizer (language chains pass a Unicode-letter pattern);
    ``highlight_pattern`` must be the surface-form regex matching it."""
    stop = frozenset(w.lower() for w in stop_set)
    xform = token_transform or (lambda t: t)
    post = post_stop_transform or (lambda t: t)
    stem = stem_fn or (lambda t: t)
    tre = token_re or TOKEN_RE

    def norm(tok: str) -> list[str]:
        t = xform(tok.lower())
        if not t or t in stop:
            return []
        t = post(t)
        return [stem(t)] if t else []

    def terms_of(text: str | None) -> list[str]:
        if text is None:
            return []
        out = []
        for tok in tre.findall(text.lower()):
            out.extend(norm(tok))
        return out

    def positions_of(text: str | None) -> dict[str, list[int]]:
        m: dict[str, list[int]] = {}
        if text is None:
            return m
        for i, tok in enumerate(tre.findall(text.lower())):
            for f in norm(tok):
                m.setdefault(f, []).append(i)  # stop-gap positions
        return m

    QUERY_ANALYZERS[name] = terms_of
    POSITION_ANALYZERS[name] = positions_of
    TOKEN_NORMALIZERS[name] = norm
    HIGHLIGHT_TOKEN_PATTERNS[name] = highlight_pattern or _ALNUM_TOKEN
    CHAIN_STAGES[name] = {
        "token_re": tre, "token_transform": token_transform,
        "stop": stop, "post_stop_transform": post_stop_transform,
        "stem": stem_fn,
    }


QUERY_ANALYZERS["text_en_splitting"] = analyze_text_en_splitting
QUERY_ANALYZERS["text_splitting"] = analyze_text_splitting
POSITION_ANALYZERS["text_en_splitting"] = positions_map_en_splitting
POSITION_ANALYZERS["text_splitting"] = positions_map_splitting
TOKEN_NORMALIZERS["text_en_splitting"] = _normalize_token_en_splitting
TOKEN_NORMALIZERS["text_splitting"] = _normalize_token_splitting
HIGHLIGHT_TOKEN_PATTERNS["text_en_splitting"] = _WS_CORE_TOKEN
HIGHLIGHT_TOKEN_PATTERNS["text_splitting"] = _WS_CORE_TOKEN


def make_positions_udf(chain: str = "text_general"):
    """Arrow-batched {term: [positions]} UDF for the given analysis chain."""
    if chain == "text_general":
        return term_positions_udf  # the frozen default (fast path)
    if chain != "text_en":
        if chain not in POSITION_ANALYZERS:
            raise ValueError(f"unknown analysis chain: {chain}")
        fn = POSITION_ANALYZERS[chain]

        @pandas_udf(T.MapType(T.StringType(), T.ArrayType(T.IntegerType())))
        def analyze_generic(texts: pd.Series) -> pd.Series:
            return pd.Series([fn(t) for t in texts])

        return analyze_generic

    @pandas_udf(T.MapType(T.StringType(), T.ArrayType(T.IntegerType())))
    def analyze(texts: pd.Series) -> pd.Series:
        from .stemmer import MemoStemmer

        stem = MemoStemmer()  # shared across the batch: Zipf -> high hit rate
        findall = TOKEN_RE.findall
        stop = EN_STOPWORDS
        out = []
        for t in texts:
            m: dict[str, list[int]] = {}
            if t is not None:
                for i, tok in enumerate(findall(t.lower())):
                    if tok not in stop:
                        m.setdefault(stem(tok), []).append(i)
            out.append(m)
        return pd.Series(out)

    return analyze


def make_multi_field_analyzer(gap: int = 100):
    """copyField-into-_text_ analyzer over N columns (Solr's catch-all field,
    default-base-config/managed-schema.xml `_text_` + copyField convention):
    token streams of the fields are concatenated with ``positionIncrementGap``
    positions between values (managed-schema.xml:298 gap=100), so phrases
    never match across a field boundary. dl counts real tokens only (gaps
    carry no norm weight, matching Lucene).

    Returns an Arrow-batched pandas UDF: (col1, ..., colN) -> {term: [pos]}.
    """

    @pandas_udf(T.MapType(T.StringType(), T.ArrayType(T.IntegerType())))
    def analyze_fields(*cols: pd.Series) -> pd.Series:
        findall = TOKEN_RE.findall
        out = []
        for row in zip(*cols):
            m: dict[str, list[int]] = {}
            off = 0
            for value in row:
                toks = [] if value is None else findall(value.lower())
                for i, tok in enumerate(toks):
                    m.setdefault(tok, []).append(off + i)
                off += len(toks) + gap
            out.append(m)
        return pd.Series(out)

    return analyze_fields


# --- query-time synonym expansion (T4) -------------------------------------
# Reference: SynonymGraphFilter, query-time only, managed-schema.xml:311 with
# default-base-config/synonyms.txt. The shipped file's effective entries
# (synonyms.txt:15-28), lowercased because LowerCaseFilter follows in the chain.
# "a => b" is a one-way mapping; "a,b,c" an equivalence class.
# DEFAULT_SYNONYMS below is exactly parse_synonyms_file(<shipped file>) --
# asserted by tests/test_analysis.py.


def _unescape(s: str) -> str:
    """Solr synonym-format escapes: backslash protects ',', ' ', '=' etc."""
    out, i = [], 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s):
            out.append(s[i + 1])
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def _split_unescaped(s: str, sep: str) -> list[str]:
    parts, cur, i = [], [], 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s):
            cur.append(s[i : i + 2])
            i += 2
        elif s.startswith(sep, i):
            parts.append("".join(cur))
            cur = []
            i += len(sep)
        else:
            cur.append(s[i])
            i += 1
    parts.append("".join(cur))
    return parts


def _norm_words(part: str) -> list[str]:
    """One comma-separated alternative -> its lowercased words. Multi-word
    alternatives ('foo bar') contribute each word to the expansion set --
    the bag-of-words simplification of SynonymGraphFilter's multi-token
    paths, which is equivalent under the engine's OR query semantics."""
    return [w for w in _unescape(part).strip().lower().split() if w]


def parse_synonyms_lines(lines) -> dict[str, tuple[str, ...]]:
    """Parse Solr synonyms format (SolrSynonymParser syntax): '#' comments,
    'a, b => c d' one-way mappings (every LHS maps to the RHS terms), and
    'a, b, c' equivalence classes (expand=true: each member maps to the full
    class, itself included). ignoreCase=true semantics: everything is
    lowercased, matching the LowerCaseFilter that follows in the chain."""
    mapping: dict[str, dict[str, None]] = {}
    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if "=>" in line:
            lhs, rhs = _split_unescaped(line, "=>")[:2]
            rights = [w for part in _split_unescaped(rhs, ",") for w in _norm_words(part)]
            for part in _split_unescaped(lhs, ","):
                for left in _norm_words(part):
                    mapping.setdefault(left, {}).update(dict.fromkeys(rights))
        else:
            cls = [w for part in _split_unescaped(line, ",") for w in _norm_words(part)]
            for w in cls:
                mapping.setdefault(w, {}).update(dict.fromkeys(cls))
    return {k: tuple(v) for k, v in mapping.items()}


def parse_synonyms_file(path: str) -> dict[str, tuple[str, ...]]:
    with open(path, encoding="utf-8") as f:
        return parse_synonyms_lines(f)
_EQUIV_CLASSES = [
    ("fooaaa", "baraaa", "bazaaa"),  # synonyms.txt:18
    ("gb", "gib", "gigabyte", "gigabytes"),  # synonyms.txt:21
    ("mb", "mib", "megabyte", "megabytes"),  # synonyms.txt:22
    ("television", "televisions", "tv", "tvs"),  # synonyms.txt:23
]
DEFAULT_SYNONYMS: dict[str, tuple[str, ...]] = {
    "aaafoo": ("aaabar",),  # synonyms.txt:15 (replacement)
    "bbbfoo": ("bbbfoo", "bbbbar"),  # synonyms.txt:16
    "cccfoo": ("cccbar", "cccbaz"),  # synonyms.txt:17
    "pixima": ("pixma",),  # synonyms.txt:28 (replacement)
}
for _cls in _EQUIV_CLASSES:
    for _w in _cls:
        DEFAULT_SYNONYMS[_w] = _cls


def expand_query_terms(
    terms: list[str], synonyms: dict[str, tuple[str, ...]] | None = None
) -> list[str]:
    """Query-time synonym expansion; preserves first-seen order, dedupes."""
    syn = DEFAULT_SYNONYMS if synonyms is None else synonyms
    seen: dict[str, None] = {}
    for t in terms:
        for e in syn.get(t, (t,)):
            seen.setdefault(e, None)
    return list(seen)
