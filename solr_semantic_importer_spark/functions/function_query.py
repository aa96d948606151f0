"""Solr function queries -- parser + SQL compiler (Spark and DuckDB).

Solr's FunctionQParser surface (the /select side the reference's
collections expose; HttpSolrSelectClientImpl.java builds plain /select
requests, and any Solr client can attach ``bf=``/``boost=``/``sort=func()``
/ ``fq={!frange}`` to them). We implement the documented public function
grammar -- nested calls over fields and literals -- and compile it ONCE to
a SQL expression string evaluated engine-side:

- Spark dialect -> a Catalyst expression (``F.expr``): the function rides
  whole-stage codegen next to the scan, never a Python UDF, so boosting /
  function sorts / frange filters at 10^12 turns cost one projected column.
- DuckDB dialect -> the driver-gate oracle recomputes the same value
  first-principles.

Supported functions (Solr public function-query list):
  sum sub product mul div abs sqrt floor ceil log ln pow power min max
  recip linear ms if exists not and or def map field
Index-backed functions (Solr's relevance ValueSources -- they read INDEX
state, not doc columns, so they only compile after
``resolve_index_functions`` rewrites them against a live BM25Index;
``BM25Index.function_expr`` does this for every /select call site):
  termfreq(f,'t')        raw per-doc tf of the indexed term (0 if absent)
  docfreq(f,'t')         #docs containing the term (constant per query)
  totaltermfreq/ttf(f,'t') total occurrences of the term in the index
  idf(f,'t')             the similarity's idf: ln(1+(N-df+.5)/(df+.5))
  sumtotaltermfreq(f)    total #tokens indexed in the field
  maxdoc() / numdocs()   corpus size incl. / excl. deleted docs
Like Lucene, the term argument is the literal INDEXED term (not analyzed),
and df/ttf statistics ignore tombstones until a merge rewrites segments.
``scale(x, minT, maxT)`` (Lucene ScaleFloatFunction) also resolves
index-side: the engine computes min/max of ``x`` over ALL docs in the
index (one partial-agg job -- Lucene's createWeight pays the same full
traversal per query) and folds the linear transform into the expression.
Fail-loud on anything else (``ord``/``rord`` need a global sort position
per doc -- documented unsupported rather than silently wrong).

Semantics notes (public Solr docs):
- ``log`` is base-10; ``ln`` is natural.
- ``div(a,b)`` is float division.
- ``recip(x,m,a,b) = a / (m*x + b)``; with ``x = ms(date)`` this is
  Solr's canonical date-recency boost.
- ``ms(f)`` = milliseconds since epoch of a date field; ``ms(a,b)`` = the
  difference. (``ms()``/NOW is nondeterministic -- unsupported; pass a
  literal.)
- ``map(x,min,max,target[,def])`` maps values in [min,max] to target,
  else def (or x itself).
- ``exists(f)`` / ``if(test,a,b)`` / ``not``/``and``/``or`` form the
  boolean sublanguage; ``def(f,d)`` = value-or-default.
"""

from __future__ import annotations

import hashlib
import re

__all__ = [
    "parse_function_query",
    "function_to_sql",
    "fields_used",
    "parse_frange",
    "looks_like_function",
    "contains_index_functions",
    "resolve_index_functions",
    "resolve_scale_functions",
    "INDEX_FUNCTIONS",
]

_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<num>-?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)"
    r"|(?P<name>[A-Za-z_][A-Za-z0-9_]*)"
    r"|(?P<str>'[^']*'|\"[^\"]*\")"
    r"|(?P<punct>[(),])"
    r")"
)

# name -> (min_arity, max_arity); None = unbounded
_FUNCTIONS: dict[str, tuple[int, int | None]] = {
    "sum": (2, None), "sub": (2, 2), "product": (2, None), "mul": (2, None),
    "div": (2, 2), "abs": (1, 1), "sqrt": (1, 1), "floor": (1, 1),
    "ceil": (1, 1), "log": (1, 1), "ln": (1, 1), "pow": (2, 2),
    "power": (2, 2), "min": (2, None), "max": (2, None), "recip": (4, 4),
    "linear": (3, 3), "ms": (1, 2), "if": (3, 3), "exists": (1, 1),
    "not": (1, 1), "and": (2, None), "or": (2, None), "def": (2, 2),
    "map": (4, 5), "field": (1, 1),
    # geodist(F, lat, lon): Solr's spatial distance ValueSource -- F is a
    # spatial field mapped to F_lat/F_lon subfield columns (functions/geo.py)
    "geodist": (3, 3),
    # index-backed relevance ValueSources (resolved against a BM25Index
    # before SQL emission; see resolve_index_functions)
    "termfreq": (2, 2), "docfreq": (2, 2), "totaltermfreq": (2, 2),
    "ttf": (2, 2), "idf": (2, 2), "sumtotaltermfreq": (1, 1),
    "maxdoc": (0, 0), "numdocs": (0, 0),
    # ord/rord: the doc value's position in the field's sorted value
    # dictionary (per-doc, resolved like termfreq -- see
    # resolve_index_functions)
    "ord": (1, 1), "rord": (1, 1),
    # scale(x, minTarget, maxTarget): needs a global min/max pass, resolved
    # by the engine (resolve_scale_functions) before SQL emission
    "scale": (3, 3),
}

# functions whose value comes from index state, not doc columns. ttf is
# canonicalized to totaltermfreq at parse time.
INDEX_FUNCTIONS = frozenset(
    ("termfreq", "docfreq", "totaltermfreq", "idf", "sumtotaltermfreq",
     "maxdoc", "numdocs", "ord", "rord")
)

_NUMERIC_DTYPES = ("int", "bigint", "smallint", "tinyint", "float",
                   "double", "long", "decimal")


def _tokenize(s: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if m is None or m.end() == pos:
            if s[pos:].strip() == "":
                break
            raise ValueError(
                f"function query: cannot tokenize at {s[pos:]!r} in {s!r}"
            )
        pos = m.end()
        for kind in ("num", "name", "str", "punct"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    return out


def parse_function_query(s: str):
    """Parse a Solr function-query string into an AST of nested tuples:
    ``('num', float)`` | ``('field', name)`` | ``('call', fname, [args])``.
    Raises ValueError on unknown functions, bad arity, or trailing junk --
    Solr's FunctionQParser errors a malformed function the same way."""
    toks = _tokenize(s)
    if not toks:
        raise ValueError(f"empty function query: {s!r}")
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else (None, None)

    def expr():
        nonlocal pos
        kind, v = peek()
        if kind == "num":
            pos += 1
            return ("num", float(v))
        if kind == "str":
            pos += 1
            return ("str", v[1:-1])
        if kind == "name":
            pos += 1
            if peek() == ("punct", "("):
                fname = v.lower()
                if fname not in _FUNCTIONS:
                    raise ValueError(
                        f"unsupported function {v!r} (supported: "
                        f"{', '.join(sorted(_FUNCTIONS))})"
                    )
                pos += 1  # (
                if peek() == ("punct", ")"):
                    args = []
                else:
                    args = [expr()]
                    while peek() == ("punct", ","):
                        pos += 1
                        args.append(expr())
                if peek() != ("punct", ")"):
                    raise ValueError(f"expected ')' in function query {s!r}")
                pos += 1
                lo, hi = _FUNCTIONS[fname]
                if len(args) < lo or (hi is not None and len(args) > hi):
                    raise ValueError(
                        f"{fname}() takes {lo}"
                        + (f"..{hi}" if hi is not None else "+")
                        + f" args, got {len(args)}"
                    )
                if fname == "field":
                    if args[0][0] != "field":
                        raise ValueError("field() takes a field name")
                    return args[0]
                if fname == "mul":
                    fname = "product"
                if fname == "power":
                    fname = "pow"
                if fname == "ttf":
                    fname = "totaltermfreq"
                if fname in ("termfreq", "docfreq", "totaltermfreq", "idf"):
                    if args[0][0] != "field" or args[1][0] != "str":
                        raise ValueError(
                            f"{fname}(field, 'term') takes a field name and "
                            f"a quoted term literal"
                        )
                if fname == "sumtotaltermfreq" and args[0][0] != "field":
                    raise ValueError("sumtotaltermfreq() takes a field name")
                if fname == "scale" and (
                    args[1][0] != "num" or args[2][0] != "num"
                ):
                    raise ValueError(
                        "scale(x, minTarget, maxTarget) takes numeric "
                        "target literals"
                    )
                return ("call", fname, args)
            return ("field", v)
        raise ValueError(f"unexpected token in function query {s!r}")

    ast = expr()
    if pos != len(toks):
        raise ValueError(f"trailing input in function query {s!r}")
    return ast


def fields_used(ast) -> list[str]:
    """Field names an AST reads, in first-use order -- drives ReadSchema
    pruning (the docs scan projects exactly these columns)."""
    out: list[str] = []

    def walk(n):
        if n[0] == "field" and n[1] not in out:
            out.append(n[1])
        elif n[0] == "call" and n[1] in INDEX_FUNCTIONS:
            # args name the INDEXED field / term -- index state, not a
            # docs-column read (resolution replaces the whole call)
            return
        elif n[0] == "call" and n[1] == "geodist":
            # arg0 is the spatial field NAME: it reads the two subfields
            for c in (f"{n[2][0][1]}_lat", f"{n[2][0][1]}_lon"):
                if c not in out:
                    out.append(c)
            for a in n[2][1:]:
                walk(a)
        elif n[0] == "call":
            for a in n[2]:
                walk(a)

    walk(ast)
    return out


def _field_kind(name: str, types: dict[str, str]) -> str:
    if name not in types:
        raise ValueError(f"function query references unknown field {name!r}")
    dt = types[name].lower()
    if dt.startswith(_NUMERIC_DTYPES):
        return "num"
    if dt.startswith("timestamp") or dt.startswith("date"):
        return "ts"
    if dt.startswith("boolean"):
        return "bool"
    return "str"


def _check(ast, types: dict[str, str]) -> str:
    """Type-check an AST; returns its kind ('num'|'bool'|'ts'|'str').
    Mirrors Solr's ValueSource type errors (a date field in arithmetic
    outside ms() is an error, not a silent cast)."""
    kind, *rest = ast
    if kind == "num":
        return "num"
    if kind == "str":
        return "str"
    if kind == "field":
        return _field_kind(rest[0], types)
    fname, args = rest
    if fname in INDEX_FUNCTIONS:
        # shape was validated at parse time; the field names index state
        # (validated by the resolver against the live index), not a column
        return "num"
    if fname == "geodist":
        # arg0 is a spatial field NAME (not a value): resolve its
        # PointType subfield columns before any generic type-check sees it
        if args[0][0] != "field":
            raise ValueError("geodist() arg 1 must be a spatial field name")
        base = args[0][1]
        for c in (f"{base}_lat", f"{base}_lon"):
            if c not in types or _field_kind(c, types) != "num":
                raise ValueError(
                    f"spatial field {base!r}: numeric column {c!r} not in "
                    f"the docs schema (PointType subfields <F>_lat/<F>_lon)"
                )
        for i, a in enumerate(args[1:], start=2):
            if _check(a, types) != "num":
                raise ValueError(f"geodist() arg {i} must be num")
        return "num"
    kinds = [_check(a, types) for a in args]

    def need(i, want):
        if kinds[i] != want:
            raise ValueError(
                f"{fname}() arg {i + 1} must be {want}, got {kinds[i]}"
            )

    if fname == "ms":
        for i, k in enumerate(kinds):
            if k not in ("ts", "num"):
                need(i, "ts")
        return "num"
    if fname == "exists":
        return "bool"
    if fname in ("not", "and", "or"):
        for i in range(len(kinds)):
            need(i, "bool")
        return "bool"
    if fname == "if":
        need(0, "bool")
        need(1, "num")
        need(2, "num")
        return "num"
    if fname == "def":
        if kinds[0] not in ("num", "str", "ts"):
            need(0, "num")
        if kinds[1] != kinds[0]:
            raise ValueError("def() default must match the field's type")
        return kinds[0]
    # arithmetic: every arg numeric
    for i in range(len(kinds)):
        need(i, "num")
    return "num"


def function_to_sql(
    src: str | tuple, types: dict[str, str], dialect: str = "spark"
) -> tuple[str, list[str]]:
    """Compile a function query (string or parsed AST) to a SQL expression
    in the given dialect ('spark' | 'duckdb'). Returns (sql, fields_used).
    ``types``: column -> dtype of the table the expression runs over
    (``dict(df.dtypes)`` / the oracle view's schema)."""
    ast = parse_function_query(src) if isinstance(src, str) else src
    _check(ast, types)

    def emit(n) -> str:
        kind, *rest = n
        if kind == "num":
            v = rest[0]
            return repr(int(v)) if float(v).is_integer() else repr(v)
        if kind == "field":
            return rest[0]
        fname, args = rest
        if fname in INDEX_FUNCTIONS or fname == "scale":
            raise ValueError(
                f"{fname}() reads index state -- compile through "
                f"BM25Index.function_expr (resolve_index_functions), not "
                f"a bare function_to_sql"
            )
        a = [emit(x) for x in args]
        if fname == "sum":
            return "(" + " + ".join(a) + ")"
        if fname == "sub":
            return f"({a[0]} - {a[1]})"
        if fname == "product":
            return "(" + " * ".join(a) + ")"
        if fname == "div":
            # float division in both dialects (Solr div is float)
            return f"(CAST({a[0]} AS DOUBLE) / {a[1]})"
        if fname in ("abs", "sqrt", "floor", "ceil", "ln"):
            return f"{fname}({a[0]})"
        if fname == "log":
            return f"log10({a[0]})"
        if fname == "pow":
            return f"power({a[0]}, {a[1]})"
        if fname == "min":
            return "least(" + ", ".join(a) + ")"
        if fname == "max":
            return "greatest(" + ", ".join(a) + ")"
        if fname == "recip":
            x, m, aa, b = a
            return f"(CAST({aa} AS DOUBLE) / ({m} * {x} + {b}))"
        if fname == "linear":
            x, m, c = a
            return f"({m} * {x} + {c})"
        if fname == "geodist":
            from .geo import haversine_sql

            if args[1][0] != "num" or args[2][0] != "num":
                raise ValueError(
                    "geodist() needs a literal lat,lon point"
                )
            base = args[0][1]
            return haversine_sql(
                f"{base}_lat", f"{base}_lon",
                float(args[1][1]), float(args[2][1]),
            )
        if fname == "ms":
            ms_fn = "unix_millis" if dialect == "spark" else "epoch_ms"

            def to_ms(node, sql):
                k = _check(node, types)
                return f"{ms_fn}({sql})" if k == "ts" else sql

            parts = [to_ms(args[i], a[i]) for i in range(len(a))]
            if len(parts) == 1:
                return parts[0]
            return f"({parts[0]} - {parts[1]})"
        if fname == "if":
            return f"(CASE WHEN {a[0]} THEN {a[1]} ELSE {a[2]} END)"
        if fname == "exists":
            return f"({a[0]} IS NOT NULL)"
        if fname == "not":
            return f"(NOT {a[0]})"
        if fname in ("and", "or"):
            return "(" + f" {fname.upper()} ".join(a) + ")"
        if fname == "def":
            return f"coalesce({a[0]}, {a[1]})"
        if fname == "map":
            x, lo, hi, target = a[:4]
            dflt = a[4] if len(a) == 5 else x
            return (
                f"(CASE WHEN {x} >= {lo} AND {x} <= {hi} "
                f"THEN {target} ELSE {dflt} END)"
            )
        raise AssertionError(f"unreachable: {fname}")

    return emit(ast), fields_used(ast)


def contains_index_functions(ast) -> bool:
    """True when the AST has any index-backed call left unresolved."""
    kind, *rest = ast
    if kind == "call":
        if rest[0] in INDEX_FUNCTIONS:
            return True
        return any(contains_index_functions(a) for a in rest[1])
    return False


def resolve_index_functions(ast, resolver):
    """Rewrite index-backed calls against a live index. ``resolver`` is
    duck-typed (BM25Index implements it): ``index_function_value(fname,
    field, term) -> float`` for the per-query constants (docfreq /
    totaltermfreq / idf / sumtotaltermfreq / maxdoc / numdocs -- one tiny
    pruned dictionary lookup each, never a corpus scan).

    ``termfreq`` is per-DOC, so it cannot fold to a constant: each distinct
    (field, term) becomes a synthetic column reference ``__termfreq<i>``
    the caller joins from the term's pruned postings (BM25Index.term_tf_df)
    -- at 10^12 turns that join ships one term's postings, not the corpus.

    ``ord``/``rord`` are per-doc too (the doc value's 1-based position in
    the field's sorted value dictionary; Lucene OrdFieldSource /
    ReverseOrdFieldSource over the top-level reader): each distinct
    (field, reverse) becomes a synthetic column the caller fills by
    joining the field's rank dictionary (BM25Index ord machinery) --
    dictionary-sized, never a corpus shuffle.

    Returns ``(rewritten_ast, tf_cols, ord_cols)`` with tf_cols =
    ``[(column_name, field, term), ...]`` and ord_cols =
    ``[(column_name, field, reverse), ...]``, each in first-use order."""
    tf_cols: list[tuple[str, str, str]] = []
    ord_cols: list[tuple[str, str, bool]] = []
    seen: dict[tuple[str, str], str] = {}
    seen_ord: dict[tuple[str, bool], str] = {}

    def walk(n):
        kind, *rest = n
        if kind != "call":
            return n
        fname, args = rest
        if fname == "termfreq":
            key = (args[0][1], args[1][1])
            col = seen.get(key)
            if col is None:
                # content-derived name: the same (field, term) in two
                # separately-compiled expressions (bf= AND boost=) resolves
                # to ONE column, so the caller joins each term's postings
                # exactly once
                digest = hashlib.md5(
                    f"{key[0]}\x00{key[1]}".encode()
                ).hexdigest()[:10]
                col = f"__termfreq_{digest}"
                seen[key] = col
                tf_cols.append((col, key[0], key[1]))
                resolver.index_function_value("termfreq", *key)  # validate
            return ("field", col)
        if fname in ("ord", "rord"):
            if args[0][0] != "field":
                raise ValueError(f"{fname}() takes a plain field name")
            okey = (args[0][1], fname == "rord")
            col = seen_ord.get(okey)
            if col is None:
                digest = hashlib.md5(okey[0].encode()).hexdigest()[:10]
                col = f"__{fname}_{digest}"
                seen_ord[okey] = col
                ord_cols.append((col, okey[0], okey[1]))
            return ("field", col)
        if fname in INDEX_FUNCTIONS:
            field = args[0][1] if args else None
            term = args[1][1] if len(args) > 1 else None
            return ("num", float(resolver.index_function_value(fname, field, term)))
        return ("call", fname, [walk(a) for a in args])

    return walk(ast), tf_cols, ord_cols


def resolve_scale_functions(ast, minmax_fn):
    """Rewrite every ``scale(x, minT, maxT)`` call (Lucene
    ScaleFloatFunction) into the folded linear transform
    ``(x - mn) * (maxT - minT) / (mx - mn) + minT`` where ``(mn, mx)`` =
    ``minmax_fn(inner_ast)`` -- the engine computes them with ONE
    partial-agg job over the docs table per distinct inner expression
    (Lucene's createWeight pays the same full traversal). Processed
    bottom-up, so a scale nested inside another's ``x`` resolves first.
    Degenerate mn == mx maps every value to minT (Lucene divides by zero
    into NaN there; a constant is the only non-poisonous reading)."""

    def walk(n):
        kind, *rest = n
        if kind != "call":
            return n
        fname, args = rest
        args = [walk(a) for a in args]
        if fname != "scale":
            return ("call", fname, args)
        inner, tmin, tmax = args[0], args[1][1], args[2][1]
        mn, mx = minmax_fn(inner)
        if mn is None or mx is None or mx == mn:
            return ("num", float(tmin))
        k = (tmax - tmin) / (mx - mn)
        return (
            "call", "sum",
            [
                ("call", "product",
                 [("call", "sub", [inner, ("num", float(mn))]),
                  ("num", float(k))]),
                ("num", float(tmin)),
            ],
        )

    return walk(ast)


def looks_like_function(s: str) -> bool:
    """True when a sort/fl token is a function call rather than a plain
    field: a known function name followed by '('."""
    m = re.match(r"\s*([A-Za-z_][A-Za-z0-9_]*)\s*\(", s)
    return bool(m) and m.group(1).lower() in _FUNCTIONS


_FRANGE_RE = re.compile(r"^\{!frange\s+([^}]*)\}(.+)$", re.S)


def parse_frange(fq: str) -> tuple[str, dict[str, str]] | None:
    """Detect Solr's ``{!frange l=.. u=.. incl=.. incu=..}func`` filter
    qparser. Returns (function string, local params) or None. Unknown
    local params fail loud (the facade contract: callers find out)."""
    m = _FRANGE_RE.match(fq.strip())
    if m is None:
        return None
    params: dict[str, str] = {}
    for part in m.group(1).split():
        k, eq, v = part.partition("=")
        if not eq or k not in ("l", "u", "incl", "incu"):
            raise ValueError(
                f"frange: unsupported local param {part!r} (use l/u/incl/incu)"
            )
        params[k] = v
    if "l" not in params and "u" not in params:
        raise ValueError("frange needs at least one of l= / u=")
    return m.group(2).strip(), params


def frange_to_sql(
    fq: str, types: dict[str, str], dialect: str = "spark"
) -> str | None:
    """Compile an ``{!frange}`` fq to a SQL boolean expression, or None if
    the string isn't an frange. The caller keeps the ORIGINAL fq string as
    its filterCache key (Solr caches frange DocSets the same way)."""
    parsed = parse_frange(fq)
    if parsed is None:
        return None
    func, p = parsed
    sql, _ = function_to_sql(func, types, dialect)
    conds = []
    if "l" in p:
        op = ">=" if p.get("incl", "true").lower() != "false" else ">"
        conds.append(f"({sql}) {op} {float(p['l'])!r}")
    if "u" in p:
        op = "<=" if p.get("incu", "true").lower() != "false" else "<"
        conds.append(f"({sql}) {op} {float(p['u'])!r}")
    return "(" + " AND ".join(conds) + ")"
