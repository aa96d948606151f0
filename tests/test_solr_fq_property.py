"""Property-based differential test for the Solr fq -> SQL translator.

Strategy: generate a random filter AST over a fixed typed row set (string
fields with NULLs, an int field), render it to Lucene fq syntax, translate
with ``parse_fq``, execute the SQL in DuckDB, and compare the matching row
ids against an INDEPENDENT Python evaluator implementing Lucene's set
semantics directly (leaf -> match set; NOT -> universe minus set; AND ->
intersection; OR -> union; a doc with a NULL field never matches a positive
leaf but DOES match its negation). Any divergence is a translator bug --
the two sides share no code.
"""

from __future__ import annotations

import fnmatch

import duckdb
import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from solr_semantic_importer_spark.functions.solr_fq import parse_fq

TYPES = {"role": "string", "tool": "string", "turn_idx": "int"}

# fixed row universe: every (role, tool, turn_idx) combination that matters,
# including NULLs and negative ints
ROLES = ["user", "assistant", "tool", None]
TOOLS = ["search", "calc", "tool_1", None]
TURNS = [-7, -1, 0, 1, 3, 5, 12]
ROWS = [
    {"rid": i, "role": r, "tool": t, "turn_idx": n}
    for i, (r, t, n) in enumerate(
        (r, t, n) for r in ROLES for t in TOOLS for n in TURNS
    )
]


# ---------------------------------------------------------------------------
# AST: (kind, ...) tuples


_str_leaves = st.one_of(
    st.tuples(st.just("eq"), st.sampled_from(["role", "tool"]),
              st.sampled_from(["user", "assistant", "tool", "search", "calc",
                               "tool_1", "missing"])),
    st.tuples(st.just("wild"), st.sampled_from(["role", "tool"]),
              st.sampled_from(["user*", "*ol*", "tool_?", "a*t", "*", "x*"])),
    st.tuples(st.just("exists"), st.sampled_from(["role", "tool"])),
)

_int_leaves = st.one_of(
    st.tuples(st.just("eq_num"), st.just("turn_idx"),
              st.sampled_from(TURNS + [99])),
    st.tuples(
        st.just("range"), st.just("turn_idx"),
        st.sampled_from([-10, -1, 0, 2, None]),   # None = open endpoint (*)
        st.sampled_from([-2, 1, 4, 20, None]),
        st.booleans(), st.booleans(),             # inclusive lo / hi
    ),
)

_leaves = st.one_of(_str_leaves, _int_leaves)


def _trees(depth: int):
    if depth == 0:
        return _leaves
    sub = _trees(depth - 1)
    return st.one_of(
        _leaves,
        st.tuples(st.just("not"), sub),
        st.tuples(st.just("and"), sub, sub),
        st.tuples(st.just("or"), sub, sub),
    )


# ---------------------------------------------------------------------------
# Render AST -> Lucene fq string (always parenthesized + explicit operators,
# so parser precedence is not under test here -- semantics are)


def render(node) -> str:
    kind = node[0]
    if kind == "eq":
        return f"{node[1]}:{node[2]}"
    if kind == "wild":
        if node[2] == "*":
            return f"{node[1]}:*"
        return f"{node[1]}:{node[2]}"
    if kind == "exists":
        return f"{node[1]}:*"
    if kind == "eq_num":
        v = node[2]
        return (f"{node[1]}:[{v} TO {v}]" if v < 0  # bare -N lexes as NOT
                else f"{node[1]}:{v}")
    if kind == "range":
        _, f, lo, hi, li, hi_i = node
        lb, rb = ("[", "]") if (li, hi_i) == (True, True) else (
            "[" if li else "{", "]" if hi_i else "}")
        lo_s = "*" if lo is None else str(lo)
        hi_s = "*" if hi is None else str(hi)
        return f"{f}:{lb}{lo_s} TO {hi_s}{rb}"
    if kind == "not":
        return f"(NOT {render(node[1])})"
    if kind == "and":
        return f"({render(node[1])} AND {render(node[2])})"
    if kind == "or":
        return f"({render(node[1])} OR {render(node[2])})"
    raise AssertionError(kind)


# ---------------------------------------------------------------------------
# Independent evaluator: Lucene set semantics over ROWS


def matches(node) -> set[int]:
    kind = node[0]
    universe = {r["rid"] for r in ROWS}
    if kind == "eq":
        return {r["rid"] for r in ROWS if r[node[1]] == node[2]}
    if kind == "wild":
        if node[2] == "*":
            return {r["rid"] for r in ROWS if r[node[1]] is not None}
        return {
            r["rid"] for r in ROWS
            if r[node[1]] is not None and fnmatch.fnmatchcase(r[node[1]], node[2])
        }
    if kind == "exists":
        return {r["rid"] for r in ROWS if r[node[1]] is not None}
    if kind == "eq_num":
        return {r["rid"] for r in ROWS if r[node[1]] == node[2]}
    if kind == "range":
        _, f, lo, hi, li, hi_i = node
        out = set()
        for r in ROWS:
            v = r[f]
            if v is None:
                continue
            if lo is not None and (v < lo or (not li and v == lo)):
                continue
            if hi is not None and (v > hi or (not hi_i and v == hi)):
                continue
            out.add(r["rid"])
        return out
    if kind == "not":
        return universe - matches(node[1])
    if kind == "and":
        return matches(node[1]) & matches(node[2])
    if kind == "or":
        return matches(node[1]) | matches(node[2])
    raise AssertionError(kind)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("CREATE TABLE t (rid INT, role VARCHAR, tool VARCHAR, turn_idx INT)")
    c.executemany(
        "INSERT INTO t VALUES (?, ?, ?, ?)",
        [(r["rid"], r["role"], r["tool"], r["turn_idx"]) for r in ROWS],
    )
    return c


@settings(max_examples=300, deadline=None)
@given(_trees(3))
def test_fq_translation_matches_set_semantics(con, tree):
    fq = render(tree)
    sql = parse_fq(fq, TYPES, dialect="duckdb")
    got = {r[0] for r in con.execute(f"SELECT rid FROM t WHERE {sql}").fetchall()}
    assert got == matches(tree), f"fq={fq!r} sql={sql!r}"
