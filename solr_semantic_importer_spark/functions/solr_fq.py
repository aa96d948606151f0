"""Solr/Lucene filter-query (fq) syntax -> Spark SQL expression.

The reference ships its source filters as raw Solr fq strings and appends
each one as an ``fq`` query param (HttpSolrSelectClientImpl.java:114-117
``for (String filter : filters) builder.queryParam("fq", filter)``); the
shipped test config uses ``-id:*.csv`` and ``title:*``
(application-test.yml: ``filters:`` under ``solr-config.source``). This
module parses that syntax into a Spark SQL boolean expression usable by
``BM25Index``'s filterCache (`query/engine.py:_fq_entry` keys its DocSet
cache by the fq string, exactly like Solr's filterCache).

Supported subset (a superset of every fq the reference ships):

- ``field:value`` — exact match (string fields), numeric equality when the
  docs schema says the field is numeric
- ``field:*`` — field presence (``IS NOT NULL``)
- wildcards ``*``/``?`` in values -> SQL ``LIKE`` (``%``/``_``), with
  ``\\*``/``\\?`` escapes kept literal
- ``field:"quoted phrase"`` — exact match on the quoted content
- ranges ``field:[a TO b]`` / ``{a TO b}`` (exclusive) with ``*`` as an
  open endpoint
- boolean ``AND``/``OR``/``NOT`` (also ``&&``/``||``/``!``), parentheses,
  and prefix ``+``/``-`` occurs; bare whitespace between clauses is OR
  (the default ``q.op=OR`` — solr9_response.json:9 shows the reference's
  effective param set)

Set semantics are Lucene's, translated null-safely: a document matches a
negated clause when the positive clause is NOT TRUE of it (false OR the
field is null) — Lucene computes MatchAll minus the matching DocSet, so a
doc missing ``id`` DOES match ``-id:*.csv``. Plain SQL ``NOT (id LIKE
'%.csv')`` would return NULL for those docs and wrongly drop them, so
every negation compiles to ``(expr) IS NOT TRUE``. BooleanQuery occurs
semantics: within one level, MUST(+) and MUST_NOT(-) clauses constrain the
set; SHOULD clauses are only required when no MUST clause exists (with a
MUST present they influence scoring only, and fq does not score) — see
``_Bool.to_sql``.

Field typing: pass the docs DataFrame's ``dict(df.dtypes)`` so numeric
fields compare numerically (``turn_idx:[3 TO 5]`` -> ``turn_idx >= 3``);
without it, any value that parses as a number on BOTH range endpoints is
still emitted numerically, otherwise values compare as strings (Solr's
lexicographic StrField order).
"""

from __future__ import annotations

import re

__all__ = ["parse_fq", "looks_like_solr_fq"]

_NUMERIC_TYPES = {
    "tinyint", "smallint", "int", "bigint", "float", "double",
    "decimal", "long", "short", "byte",
}

# field:... in Lucene syntax -- what a SQL expression can never contain
# (SQL uses `field = ...`, `field IN ...`; a bare `name:` is a syntax
# error in Spark SQL). Optional +/-/( prefixes, then name ':' and a value
# char. Also match a leading pure range `field:[a TO b]`.
_SOLR_FQ_RE = re.compile(r"(?:^|[\s(])[+\-!]*[A-Za-z_][\w.]*:(?=\S)")


def looks_like_solr_fq(s: str) -> bool:
    """True when the string is Lucene field-query syntax rather than a SQL
    expression. Reliable in practice: Lucene filters always contain
    ``field:`` (the reference's all-documents fq would be ``*:*``), and
    ``name:`` immediately followed by a value is a syntax error in Spark
    SQL, while SQL comparisons (``role = 'user'``) never match it."""
    return s.strip() == "*:*" or bool(_SOLR_FQ_RE.search(s))


class _FqSyntaxError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Lexer


_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lpar>\()
      | (?P<rpar>\))
      | (?P<and>AND\b|&&)
      | (?P<or>OR\b|\|\|)
      | (?P<not>NOT\b|!)
      | (?P<plus>\+)
      | (?P<minus>-)
      | (?P<field>[A-Za-z_][\w.]*)\s*:
      | (?P<quoted>"(?:[^"\\]|\\.)*")
      | (?P<lbrack>[\[{])
      | (?P<rbrack>[\]}])
      | (?P<term>(?:[^\s()\[\]{}"\\]|\\.)+)
    )""",
    re.VERBOSE,
)


def _tokenize(s: str) -> list[tuple[str, str]]:
    toks, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if m is None or m.end() == m.start():
            if s[pos:].strip() == "":
                break
            raise _FqSyntaxError(f"fq syntax error at {s[pos:]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind is None:  # pure whitespace tail
            break
        toks.append((kind, m.group(kind)))
    return toks


# ---------------------------------------------------------------------------
# AST


def _sql_str(v: str) -> str:
    return "'" + v.replace("'", "''") + "'"


_NUM_RE = re.compile(r"-?\d+(\.\d+)?")


def _unescape(term: str) -> str:
    """Drop Lucene ``\\x`` escapes (keeping x literal)."""
    return re.sub(r"\\(.)", r"\1", term)


def _wildcard_to_like(term: str) -> str | None:
    """Lucene wildcard term -> LIKE pattern, or None when the term has no
    unescaped wildcard. SQL LIKE metachars in literal text are escaped with
    ``\\`` (Spark's default LIKE escape)."""
    out, has_wild, i = [], False, 0
    while i < len(term):
        c = term[i]
        if c == "\\" and i + 1 < len(term):
            out.append(term[i + 1].replace("%", "\\%").replace("_", "\\_"))
            i += 2
            continue
        if c == "*":
            has_wild = True
            out.append("%")
        elif c == "?":
            has_wild = True
            out.append("_")
        elif c in ("%", "_"):
            out.append("\\" + c)
        else:
            out.append(c)
        i += 1
    return "".join(out) if has_wild else None


class _Leaf:
    def __init__(self, field: str, kind: str, a=None, b=None, incl=(True, True)):
        self.field, self.kind, self.a, self.b, self.incl = field, kind, a, b, incl

    def _lit(self, v: str, types: dict[str, str] | None,
             now_sec: float | None = None) -> str:
        t = (types or {}).get(self.field, "")
        base = t.split("(")[0]
        if base in _NUMERIC_TYPES:
            if _NUM_RE.fullmatch(v):
                return v
            raise _FqSyntaxError(
                f"non-numeric value {v!r} for numeric field {self.field}"
            )
        if base.startswith("timestamp"):
            # pdate semantics: the value is a Solr DateMath INSTANT --
            # an ISO instant or NOW, with /UNIT roundings and ±N UNIT
            # offsets (`ts:[NOW/DAY-7DAYS TO NOW]`). Resolved at parse
            # time (Solr DateMathParser does the same) and emitted as a
            # typed TIMESTAMP literal in both dialects; garbage fails
            # loud instead of silently casting to NULL.
            import datetime as _dt

            from .datemath import parse_instant

            try:
                sec = parse_instant(v, now_sec=now_sec)
            except ValueError as e:
                raise _FqSyntaxError(
                    f"bad date value {v!r} for field {self.field}: {e}"
                ) from e
            d = _dt.datetime.fromtimestamp(sec, _dt.timezone.utc)
            txt = d.strftime("%Y-%m-%d %H:%M:%S")
            if d.microsecond:
                txt += ".%06d" % d.microsecond
            return f"TIMESTAMP '{txt}'"
        if types is None and _NUM_RE.fullmatch(v):
            return v  # untyped: numbers compare numerically (Solr point fields)
        return _sql_str(v)

    def to_sql(self, types: dict[str, str] | None, dialect: str = "spark",
               now_sec: float | None = None) -> str:
        f = self.field
        if self.kind == "exists":  # field:*
            return f"({f} IS NOT NULL)"
        if self.kind == "like":
            # Spark's LIKE escape char is `\` by DEFAULT and its parser
            # rejects an ESCAPE clause; DuckDB is the inverse (no default
            # escape, ESCAPE clause required). Emit per dialect -- only
            # patterns whose literal text contains `_`/`%` differ.
            esc = " ESCAPE '\\'" if dialect == "duckdb" and "\\" in self.a else ""
            return f"({f} LIKE {_sql_str(self.a)}{esc})"
        if self.kind == "eq":
            return f"({f} = {self._lit(self.a, types, now_sec)})"
        # range
        parts = []
        if self.a is not None:
            parts.append(
                f"{f} {'>=' if self.incl[0] else '>'} "
                f"{self._lit(self.a, types, now_sec)}"
            )
        if self.b is not None:
            parts.append(
                f"{f} {'<=' if self.incl[1] else '<'} "
                f"{self._lit(self.b, types, now_sec)}"
            )
        if not parts:  # field:[* TO *] == presence
            return f"({f} IS NOT NULL)"
        return "(" + " AND ".join(parts) + ")"


class _MatchAll:
    def to_sql(self, types, dialect: str = "spark",
               now_sec: float | None = None) -> str:
        return "(TRUE)"


class _Not:
    def __init__(self, child):
        self.child = child

    def to_sql(self, types, dialect: str = "spark",
               now_sec: float | None = None) -> str:
        # Lucene complement: docs where the positive clause is NOT TRUE
        # (false or null) -- never plain NOT, which drops null-field docs.
        return f"(({self.child.to_sql(types, dialect, now_sec)}) IS NOT TRUE)"


class _Bool:
    """One BooleanQuery level: MUST (+/AND), SHOULD (bare/OR), MUST_NOT."""

    def __init__(self):
        self.must, self.should, self.must_not = [], [], []

    def to_sql(self, types, dialect: str = "spark",
               now_sec: float | None = None) -> str:
        must = [c.to_sql(types, dialect, now_sec) for c in self.must]
        # BooleanQuery: SHOULD clauses are optional once a MUST exists
        # (minimumNumberShouldMatch=0; they only contribute score, and fq
        # does not score). Without MUST, at least one SHOULD must match.
        if not must and self.should:
            must = ["(" + " OR ".join(
                c.to_sql(types, dialect, now_sec)
                for c in self.should) + ")"]
        for c in self.must_not:
            must.append(_Not(c).to_sql(types, dialect, now_sec))
        if not must:
            raise _FqSyntaxError("empty fq")
        return "(" + " AND ".join(must) + ")"


# ---------------------------------------------------------------------------
# Parser (precedence: OR < AND < unary +/-/NOT; Lucene's flat parser is
# famously not boolean algebra, but on the fq subset in scope -- and on
# every filter the reference ships -- this conventional reading agrees)


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks, self.i = toks, 0

    def peek(self) -> str | None:
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def take(self) -> tuple[str, str]:
        if self.i >= len(self.toks):
            raise _FqSyntaxError("unexpected end of fq")
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self):
        node = self.or_level()
        if self.i != len(self.toks):
            raise _FqSyntaxError(f"trailing tokens: {self.toks[self.i:]}")
        return node

    def or_level(self):
        """Whitespace-adjacent and OR'd AND-groups gather into one
        BooleanQuery level; prefix +/- mark MUST/MUST_NOT occurs."""
        b = _Bool()
        first = True
        while True:
            k = self.peek()
            if k is None or k == "rpar":
                break
            explicit_or = k == "or"
            if explicit_or:
                if first:
                    raise _FqSyntaxError("fq starts with OR")
                self.take()
            occur, node = self.and_level()
            getattr(b, occur).append(node)
            first = False
        if not (b.must or b.should or b.must_not):
            raise _FqSyntaxError("empty fq")
        # single plain clause: no wrapper needed
        if len(b.should) == 1 and not b.must and not b.must_not:
            return b.should[0]
        if len(b.must) == 1 and not b.should and not b.must_not:
            return b.must[0]
        return b

    def and_level(self) -> tuple[str, object]:
        occur, node = self.unary()
        while self.peek() == "and":
            self.take()
            occ2, right = self.unary()
            b = _Bool()
            # a AND b: both MUST; `a AND -b` keeps b's MUST_NOT occur
            for o, n in ((occur, node), (occ2, right)):
                getattr(b, "must" if o == "should" else o).append(n)
            occur, node = "must", b
        return occur, node

    def unary(self) -> tuple[str, object]:
        k = self.peek()
        if k == "plus":
            self.take()
            _, node = self.unary()
            return "must", node
        if k in ("minus", "not"):
            self.take()
            _, node = self.unary()
            return "must_not", node
        return "should", self.atom()

    def atom(self):
        k, v = self.take()
        if k == "lpar":
            node = self.or_level()
            if self.peek() != "rpar":
                raise _FqSyntaxError("unbalanced (")
            self.take()
            return node
        if k == "field":
            return self.value(re.match(r"[A-Za-z_][\w.]*", v).group(0))
        if k == "term" and v == "*:*":
            return _MatchAll()
        raise _FqSyntaxError(f"expected field:value, got {v!r}")

    def value(self, field: str):
        k, v = self.take()
        if k == "lpar":
            # field-scoped value group `field:(a OR b -c)` (Lucene: the
            # field becomes the local default field inside the parens);
            # occur/AND/OR semantics match the top-level grammar
            node = self.field_or_level(field)
            if self.peek() != "rpar":
                raise _FqSyntaxError(f"unbalanced ( in {field}:(...)")
            self.take()
            return node
        if k == "quoted":
            return _Leaf(field, "eq", _unescape(v[1:-1]))
        if k == "lbrack":
            lo_incl = v == "["
            lo = self.range_endpoint()
            tk, tv = self.take()
            if not (tk == "term" and tv.upper() == "TO"):
                raise _FqSyntaxError("range missing TO")
            hi = self.range_endpoint()
            rk, rv = self.take()
            if rk != "rbrack":
                raise _FqSyntaxError("unterminated range")
            return _Leaf(field, "range", lo, hi, (lo_incl, rv == "]"))
        if k == "term":
            if v == "*":
                return _Leaf(field, "exists")
            like = _wildcard_to_like(v)
            if like is not None:
                return _Leaf(field, "like", like)
            return _Leaf(field, "eq", _unescape(v))
        raise _FqSyntaxError(f"bad value for field {field}")

    def field_or_level(self, field: str):
        """or_level with every bare value bound to ``field`` -- the body
        of a ``field:(...)`` value group. Same occur gathering as the
        top level; nested parens allowed."""
        b = _Bool()
        first = True
        while True:
            k = self.peek()
            if k is None or k == "rpar":
                break
            if k == "or":
                if first:
                    raise _FqSyntaxError(f"{field}:(...) starts with OR")
                self.take()
            occur, node = self.field_and_level(field)
            getattr(b, occur).append(node)
            first = False
        if not (b.must or b.should or b.must_not):
            raise _FqSyntaxError(f"empty value group {field}:()")
        if len(b.should) == 1 and not b.must and not b.must_not:
            return b.should[0]
        if len(b.must) == 1 and not b.should and not b.must_not:
            return b.must[0]
        return b

    def field_and_level(self, field: str) -> tuple[str, object]:
        occur, node = self.field_unary(field)
        while self.peek() == "and":
            self.take()
            occ2, right = self.field_unary(field)
            b = _Bool()
            for o, n in ((occur, node), (occ2, right)):
                getattr(b, "must" if o == "should" else o).append(n)
            occur, node = "must", b
        return occur, node

    def field_unary(self, field: str) -> tuple[str, object]:
        k = self.peek()
        if k == "plus":
            self.take()
            _, node = self.field_unary(field)
            return "must", node
        if k in ("minus", "not"):
            self.take()
            _, node = self.field_unary(field)
            return "must_not", node
        if k == "lpar":
            self.take()
            node = self.field_or_level(field)
            if self.peek() != "rpar":
                raise _FqSyntaxError(f"unbalanced ( in {field}:(...)")
            self.take()
            return "should", node
        return "should", self.value(field)

    def range_endpoint(self) -> str | None:
        k, v = self.take()
        if k == "minus":
            # negative numeric endpoint: `price:[-10 TO 10]` -- the lexer
            # emits '-' as the MUST_NOT operator, so re-join it here
            k2, v2 = self.take()
            if k2 != "term":
                raise _FqSyntaxError("bad range endpoint")
            return "-" + _unescape(v2)
        if k == "quoted":
            return _unescape(v[1:-1])
        if k == "term":
            return None if v == "*" else _unescape(v)
        raise _FqSyntaxError("bad range endpoint")


def parse_fq(
    fq: str, field_types: dict[str, str] | None = None,
    dialect: str = "spark", now_sec: float | None = None,
) -> str:
    """Solr fq string -> SQL boolean expression. ``dialect`` is "spark"
    (default, the engine path) or "duckdb" (oracle/differential testing):
    the two dialects agree on everything EXCEPT escaped LIKE
    metacharacters -- Spark's LIKE escape char is ``\\`` by default and its
    parser rejects an ESCAPE clause, while DuckDB has no default escape and
    needs ``ESCAPE '\\'`` spelled out -- so a wildcard over a value
    containing literal ``_``/``%`` renders differently per dialect.
    ``field_types`` is ``dict(df.dtypes)`` of the docs relation; see module
    docstring for the accepted syntax and null semantics.

    Timestamp-field values are full Solr DateMath instants
    (``ts:[NOW/DAY-7DAYS TO NOW]``), resolved at parse time into typed
    TIMESTAMP literals (r5). ``now_sec`` pins NOW (the Solr ``NOW``
    request param). Documented deviation: the engine's filterCache keys
    DocSets by the fq STRING, so a NOW-bearing fq served from cache
    keeps its first resolution until invalidation — Solr instead
    re-resolves NOW per request and cache-misses every time (its own
    docs recommend NOW/HOUR rounding for cacheability; same advice
    here, or pass ``use_cache=False``)."""
    toks = _tokenize(fq)
    if not toks:
        raise _FqSyntaxError("empty fq")
    return _Parser(toks).parse().to_sql(field_types, dialect, now_sec)
