"""Solr streaming expressions (/stream): expression string -> DataFrame.

Solr's parallel-SQL layer exposes analytics as composable TUPLE STREAMS —
``rollup(search(coll, q=.., sort=..), over=.., sum(x))`` — documented in
the public reference guide ("Streaming Expressions"). The reference's
solrconfig ships the /stream and /export handlers enabled by default
(implicit handlers in Solr 9), so a reference user can run these today;
this module lets them keep doing so against the PySpark engine.

The mapping is the whole point of a Spark-first design: a streaming
expression IS a logical plan. Each stream function becomes one DataFrame
transformation, the composition stays lazy, and Catalyst plans the whole
tree at once (predicate pushdown through select/sort, partial aggs under
rollup, broadcast for a small hashJoin side) — where Solr executes the
tree as literal node-by-node tuple iterators, this engine hands the same
tree to an optimizer. Nothing is collected driver-side; the caller gets a
DataFrame to write/join/iterate.

Supported stream functions (each validates its param surface and fails
loud on anything else — the facade contract):

- ``search(collection, q=, [fq=], [fl=], [sort=], [rows=], [qt=])`` —
  the /export path (full sorted match set) via ``solr_export``; ``rows``
  caps it (the default /select shape). ``collection`` is positional and
  recorded but not dispatched (single-collection engine).
- ``select(stream, "field", "field as alias", ...)`` — projection/rename
- ``sort(stream, by="f asc, g desc")`` — re-sort
- ``unique(stream, over="f")`` — first tuple per ``over`` value in the
  stream's sort order (requires a sorted stream, like Solr)
- ``top(stream, n=, sort=)`` — global top-n re-sorted
- ``rollup(stream, over="a,b", sum(x), avg(x), min(x), max(x),
  count(*))`` — grouped aggregation; bucket columns + Solr-named metric
  columns (``sum(x)``...)
- ``stats(collection, q=, ...metrics)`` — one-row aggregation over the
  match set
- ``innerJoin(left, right, on="a=b, c")`` / ``leftOuterJoin`` — ordered
  merge joins; like Solr, both sides must be sorted by the join keys
  (fail loud otherwise). ``hashJoin(left, hashed=right, on=..)`` — no
  order requirement, the hashed side is broadcast when small.
- ``merge(s1, s2, on="f asc")`` — union of equally-sorted streams
- ``intersect(left, right, on=)`` / ``complement(left, right, on=)`` —
  left tuples whose key does/doesn't appear in right (semi / anti join)
- ``having(stream, <boolean evaluator>)`` — ``eq/gt/gteq/lt/lteq(field,
  value)`` plus ``and(...)/or(...)/not(...)``
- ``facet(collection, q=, buckets=, [fq=], [bucketSorts="count(*) desc"],
  [bucketSizeLimit=10], ...metrics)`` — grouped metrics over the exact
  match set (the /stream twin of facet.field + stats): one partial-agg
  shuffle, ``bucketSizeLimit`` rows out per the requested sort
- ``significantTerms(collection, q=, field=, [limit=20], [minDocFreq=5],
  [maxDocFreq=0.3], [minTermLength=4])`` — terms over-represented in the
  match set vs the corpus. Freq bounds >= 1 are absolute document
  counts, < 1 are corpus fractions (Solr's convention). Emits
  ``(term, foreground, background, score)``; score here is the
  relative-rate lift ``(fg/fg_N) / (bg/bg_N)`` — Solr's exact ranking
  heuristic is an implementation detail, so the raw foreground /
  background counts travel with every tuple for re-ranking. Foreground
  counting re-analyzes only the MATCHED docs' stored text (cost scales
  with the match set, never the corpus); background df comes from the
  index dictionary.
- ``timeseries(collection, q=, field=, start=, end=, gap=, ...metrics)``
  — per-bucket metrics over ``[start, end)`` in steps of ``gap`` (exact
  op/mm DocSet, one partial-agg shuffle of at most n_buckets rows per
  task). DATE-NATIVE over timestamp fields (Solr's actual form: ISO
  start/end + DateMath gap — ``+1DAY``/``+6HOURS``; fixed-width units
  only, ``+1MONTH`` fails loud rather than drifting; buckets emitted as
  timestamps); numeric fields keep the epoch-number form.

- ``fetch(collection, stream, on="tupleField=collField", fl="a,b")`` —
  enrich tuples with stored fields from the collection: ONE left join
  (tuple side broadcast by AQE, collection scan pruned to key+fl);
  unmatched tuples pass through unenriched, like Solr. ``batchSize`` is
  Solr's tuple-iterator page size — accepted, irrelevant to one join.
- ``random(collection, q=, [fq=], [rows=10], [fl=], [seed=])`` —
  pseudo-random docs from the match set. Deterministic md5(doc_id:seed)
  order (layout-independent, the sampling-operator convention);
  documented deviation: Solr draws a fresh seed per request, here
  ``seed`` defaults to "0" for reproducibility.
- ``cartesianProduct(stream, fieldName, [productSort=])`` — one tuple
  per value of a multivalued field (explode); the field must be an
  array column.
- ``reduce(stream, by=, group(sort=, n=))`` — one tuple per ``by``
  value carrying the group's top-n tuples per the group sort, as
  ``group`` = array<struct> of the full input tuples (Solr's
  GroupOperation emits the same data as a list of tuple maps).
  Requires the stream sorted by ``by``, like Solr.
- ``nodes(collection, stream|nodes(...), walk="src->dest",
  gather="field", [scatter="branches,leaves"], [count(*)...])`` — the
  graph-traversal expression: ONE breadth-first hop per wrap (nest for
  multi-hop, like Solr): incoming src-field values matched against the
  collection's dest field, matched docs' gather values emitted as node
  tuples (``node``/``collection``/``field``/``level``; per-node metrics
  from the matched docs). scatter=branches adds the root values at
  level 0 (default leaves-only).
- ``list(s1, s2, ...)`` / ``plist(...)`` — stream concatenation in
  argument order (plist = Solr's parallel-open variant, same output;
  Spark runs the union's branches concurrently regardless). Fields a
  branch lacks null-fill; the result advertises NO sort (a block-wise
  concatenation is not globally ordered). ``echo("text")`` — one
  ``{"echo": text}`` tuple.
- ``scoreNodes(collection, nodes(..., count(*)))`` — graph-node tf-idf:
  adds ``docFreq`` (docs carrying the node value in its gather field),
  ``numDocs`` and ``nodeScore = count(*) × log((numDocs+1)/(docFreq+1))``
  to every node tuple; raw counts travel with the tuples (Solr's exact
  smoothing is an implementation detail — documented deviation, the
  significantTerms convention).
- ``tuple(name=value, ...)`` — ONE tuple of literals and/or embedded
  stream results (embedded streams collect, capped at 10k rows each —
  fail loud past the cap where Solr would grow driver memory).
- ``let(name=stream, ..., expr)`` / ``get(name)`` — named stream
  bindings with Solr's sequential scoping, resolved by AST substitution:
  a binding IS a lazy plan, every get() reuse hands Catalyst the same
  subtree (Solr caches the materialized tuple list instead — same
  observable semantics).
- ``parallel(collection, stream, workers=, sort=)`` — validated and
  transparent: the Spark plan already executes on every executor, so
  workers= is recorded but Catalyst/AQE own the parallelism; the sort=
  merge contract is asserted on the result.
- ``knnSearch(collection, id=, qf=, k=, [fq=, mintf=, mindf=, maxqt=])``
  — text-similarity knn (MoreLikeThis-backed) through the normal top-k
  path.
- Math evaluators ``col(stream, f)`` / ``describe(col)`` /
  ``corr(col, col)`` / ``percentile(col, p)`` / ``hist(col, bins=N)`` —
  Solr materializes driver-side arrays and loops; here ``col`` stays a
  logical column and the evaluators compile to DISTRIBUTED aggregates
  (one partial-agg job each; hist = min/max + one width_bucket groupBy).
  Standalone ``col`` embeds the capped array; corr requires both columns
  to read one stream (positional alignment has no relational meaning
  across two); percentile is exact where Solr's t-digest approximates.
- ``shortestPath(collection, from=, to=, edge="srcField=dstField",
  maxDepth=, [fq=], [threads=], [partitionSize=])`` — breadth-first
  shortest paths: every minimal-length node sequence from ``from`` to
  ``to`` following docs srcField→dstField, as ``{"path": [nodes...]}``
  tuples (empty stream when none within maxDepth). One distributed
  edge join per hop, visited-set anti-join, lineage cut per hop.
- ``update(destCollection, stream, [batchSize=N])`` — index the stream's
  tuples into another collection (``run_stream_expr``'s ``collections``
  registry names it; fail loud when absent). The whole stream lands as
  ONE exactly-once staged batch through
  ``streaming.incremental.append_batch`` — Solr's ``batchSize`` is a
  transport detail of its tuple iterator, not a semantics knob, so it is
  accepted and recorded but the append is atomic (documented deviation:
  all-or-nothing where Solr can land a prefix). Emits one tuple
  ``{"totalIndexed": n, "batchNumber": id}``, Solr's result shape.
  Append-only (no overwrite-by-key): route keyed replaces through
  ``query.update_api.solr_update``.
- ``topic(checkpointCollection, collection, id=, q=, [fl=],
  [initialCheckpoint=])`` — checkpointed pub/sub: the docs matching
  ``q`` that arrived since the topic's last committed checkpoint, doc_id
  ascending. Standalone evaluation polls AND commits at eval time
  (stream-open semantics); the at-least-once pipeline form —
  ``daemon(id=, terminate=, update(dest, topic(...)))`` with the
  checkpoint committed only after the update batch lands — is the eager
  runner :func:`..streaming.topics.run_daemon` (``daemon()`` here fails
  loud pointing at it). See ``streaming/topics.py`` for the checkpoint
  protocol (conditional-put versioned JSON, doc-id high-water mark).

``search(collection, ...)`` also resolves ``collection`` through the
registry when one is passed — a cross-collection join
(``innerJoin(search(a, ...), search(b, ...), on=...)``) then reads two
real indexes.

:func:`solr_sql` is the /sql handler analog: Solr's Parallel SQL
translates SQL onto these same tuple streams; this engine hands the SQL
to Spark SQL over the LIVE (tombstone-aware) doc set instead — the
dialect is therefore a superset of Solr's subset (joins, subqueries,
window functions all work). Documented deviation: WHERE clauses are ANSI
predicates, not embedded Solr query strings.

Reference provenance: the reference consumes Solr responses over /select
(HttpSolrSelectClientImpl.java) and its solrconfig enables the implicit
/stream, /export, /sql handlers (solrconfig.xml upstream defaults) — this
module is the /stream side of that surface.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .engine import BM25Index
from .select_api import solr_export

__all__ = ["parse_stream_expr", "run_stream_expr", "TupleStream", "solr_sql"]


# --------------------------------------------------------------- parsing

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lp>\()           |
        (?P<rp>\))           |
        (?P<comma>,)         |
        (?P<eq>=)            |
        (?P<quoted>"(?:[^"\\]|\\.)*") |
        (?P<bare>[^\s(),=]+)
    )""",
    re.X,
)


@dataclass
class Call:
    name: str
    args: list[Any]            # positional: Call | str literals
    params: dict[str, Any]     # named: str -> Call | str


def _tokens(s: str):
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            raise ValueError(f"stream expression: cannot tokenize at {s[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        text = m.group(kind)
        if kind == "quoted":
            text = re.sub(r'\\(.)', r"\1", text[1:-1])
        yield kind, text
    yield "end", ""


def parse_stream_expr(s: str) -> Call:
    """Parse one streaming expression into its call tree."""
    toks = list(_tokens(s))
    pos = 0

    def peek():
        return toks[pos]

    def take(kind=None):
        nonlocal pos
        k, t = toks[pos]
        if kind and k != kind:
            raise ValueError(f"stream expression: expected {kind}, got {t!r}")
        pos += 1
        return k, t

    def parse_value(first_kind, first_text):
        # a value is a call (bare followed by '(') or a literal
        if first_kind in ("bare", "quoted") and peek()[0] == "lp":
            return parse_call(first_text)
        return first_text

    def parse_call(name: str) -> Call:
        take("lp")
        args: list[Any] = []
        params: dict[str, Any] = {}
        if peek()[0] == "rp":
            take("rp")
            return Call(name, args, params)
        while True:
            k, t = take()
            if k not in ("bare", "quoted"):
                raise ValueError(f"stream expression: unexpected {t!r} in {name}()")
            if k == "bare" and peek()[0] == "eq":
                take("eq")
                vk, vt = take()
                if vk not in ("bare", "quoted"):
                    raise ValueError(
                        f"stream expression: bad value for {t}= in {name}()"
                    )
                if t in params:
                    raise ValueError(
                        f"stream expression: duplicate param {t}= in {name}()"
                    )
                params[t] = parse_value(vk, vt)
            else:
                args.append(parse_value(k, t))
            k, t = take()
            if k == "rp":
                return Call(name, args, params)
            if k != "comma":
                raise ValueError(f"stream expression: expected ',' or ')' in {name}()")

    k, t = take()
    if k != "bare":
        raise ValueError("stream expression must start with a function name")
    call = parse_call(t)
    if peek()[0] != "end":
        raise ValueError("stream expression: trailing input after the root call")
    return call


# ------------------------------------------------------------- evaluation


@dataclass
class TupleStream:
    """A stream = its DataFrame + the sort it is known to satisfy (Solr's
    ordered-stream contract travels with the tuples; unique/innerJoin/
    merge validate it instead of silently mis-merging)."""

    df: DataFrame
    sort: tuple[tuple[str, str], ...]  # ((field, asc|desc), ...)


_METRICS = {"sum", "avg", "min", "max", "count"}


def _metric(c: Call) -> tuple[Column, str]:
    if c.name not in _METRICS or len(c.args) != 1 or c.params:
        raise ValueError(f"unsupported metric {c.name}({c.args})")
    (fld,) = c.args
    label = f"{c.name}({fld})"
    if c.name == "count":
        if fld != "*":
            raise ValueError("count takes '*' (Solr streaming count(*))")
        return F.count("*").alias("count(*)"), "count(*)"
    if not isinstance(fld, str):
        raise ValueError(f"{c.name}() takes a field name")
    return getattr(F, c.name)(fld).alias(label), label


def _metric_col(c: Call) -> Column:
    return _metric(c)[0]


def _parse_by(spec: str) -> tuple[tuple[str, str], ...]:
    out = []
    for part in str(spec).split(","):
        p = " ".join(part.split())
        if not p:
            continue
        f, _, d = p.partition(" ")
        d = d or "asc"
        if d not in ("asc", "desc"):
            raise ValueError(f"bad sort entry {part!r} (use 'field asc|desc')")
        out.append((f, d))
    if not out:
        raise ValueError("empty sort spec")
    return tuple(out)


def _sort_cols(spec) -> list[Column]:
    return [F.col(f).desc() if d == "desc" else F.col(f).asc() for f, d in spec]


def _contains_call(node, name: str) -> bool:
    """True when the expression tree under ``node`` contains a call to
    ``name`` (any depth)."""
    if not isinstance(node, Call):
        return False
    if node.name == name:
        return True
    return any(_contains_call(a, name) for a in node.args)


def _require_params(c: Call, required: set, optional: set = frozenset()):
    missing = required - set(c.params)
    if missing:
        raise ValueError(f"{c.name}(): missing params {sorted(missing)}")
    extra = set(c.params) - required - optional
    if extra:
        raise ValueError(f"{c.name}(): unsupported params {sorted(extra)}")


def _on_pairs(on: str) -> list[tuple[str, str]]:
    pairs = []
    for part in str(on).split(","):
        p = part.strip()
        if not p:
            continue
        left, eq, right = p.partition("=")
        pairs.append((left.strip(), right.strip() if eq else left.strip()))
    if not pairs:
        raise ValueError("empty on= spec")
    return pairs


def _require_sorted_by(s: TupleStream, keys: list[str], who: str):
    have = [f for f, _ in s.sort]
    if have[: len(keys)] != keys:
        raise ValueError(
            f"{who}: stream must be sorted by {keys} (is sorted by {have}) — "
            f"wrap it in sort(..., by=\"{', '.join(k + ' asc' for k in keys)}\")"
        )


def _bool_evaluator(c: Any) -> Column:
    if not isinstance(c, Call):
        raise ValueError("having(): second argument must be a boolean evaluator")
    if c.name in ("and", "or"):
        if len(c.args) < 2:
            raise ValueError(f"{c.name}() needs >= 2 arguments")
        cols = [_bool_evaluator(a) for a in c.args]
        out = cols[0]
        for x in cols[1:]:
            out = (out & x) if c.name == "and" else (out | x)
        return out
    if c.name == "not":
        if len(c.args) != 1:
            raise ValueError("not() takes one argument")
        return ~_bool_evaluator(c.args[0])
    ops = {"eq": "==", "gt": ">", "gteq": ">=", "lt": "<", "lteq": "<="}
    if c.name not in ops or len(c.args) != 2:
        raise ValueError(f"unsupported boolean evaluator {c.name}()")
    fld, val = c.args
    if isinstance(fld, Call):
        # a metric reference (count(*), sum(x)) names the rollup's output
        # column -- Solr addresses it the same way in having()
        if fld.name not in _METRICS or len(fld.args) != 1 or fld.params:
            raise ValueError(f"having(): unsupported field ref {fld.name}()")
        fld = f"{fld.name}({fld.args[0]})"
    col = F.col(f"`{fld}`")
    try:
        lit = F.lit(int(val))
    except (TypeError, ValueError):
        try:
            lit = F.lit(float(val))
        except (TypeError, ValueError):
            lit = F.lit(str(val))
    return {
        "eq": col == lit, "gt": col > lit, "gteq": col >= lit,
        "lt": col < lit, "lteq": col <= lit,
    }[c.name]


def _resolve(name, idx: BM25Index, colls) -> BM25Index:
    """A source's positional collection name -> an index: the registry
    entry when one is passed (unknown names fail loud there), else the
    bound index (single-collection mode ignores the name, like the
    pre-registry behavior)."""
    if colls is None:
        return idx
    if not isinstance(name, str) or name not in colls:
        raise ValueError(
            f"unknown collection {name!r} (registered: {sorted(colls)})"
        )
    return colls[name]


def _eval(c: Call, idx: BM25Index, colls=None) -> TupleStream:
    if c.name == "search":
        if len(c.args) != 1:
            raise ValueError("search(collection, ...) takes one positional arg")
        _require_params(c, {"q"}, {"fq", "fl", "sort", "rows", "qt"})
        idx = _resolve(c.args[0], idx, colls)
        qt = c.params.get("qt", "/export")
        if qt not in ("/export", "/select"):
            raise ValueError(f"search(): unsupported qt {qt!r}")
        sort = c.params.get("sort", "score desc")
        p = {"q": c.params["q"], "sort": sort}
        if "fq" in c.params:
            p["fq"] = c.params["fq"]
        if "fl" in c.params:
            p["fl"] = c.params["fl"]
        df = solr_export(idx, p)
        if "rows" in c.params:
            df = df.limit(int(c.params["rows"]))
        return TupleStream(df, _parse_by(sort))

    if c.name == "facet":
        if len(c.args) < 2:
            raise ValueError("facet(collection, metrics...) needs at least "
                             "one metric")
        _require_params(c, {"q", "buckets"},
                        {"fq", "bucketSorts", "bucketSizeLimit"})
        idx = _resolve(c.args[0], idx, colls)
        buckets = [b.strip() for b in str(c.params["buckets"]).split(",")
                   if b.strip()]
        pairs = [_metric(a) for a in c.args[1:] if isinstance(a, Call)]
        if len(pairs) != len(c.args) - 1 or not pairs:
            raise ValueError("facet(): every positional arg after the "
                             "collection must be a metric")
        metrics = [p[0] for p in pairs]
        limit = int(c.params.get("bucketSizeLimit", 10))
        sort_spec = _parse_by(c.params.get("bucketSorts", "count(*) desc"))
        names = {p[1] for p in pairs}
        for f, _ in sort_spec:
            if f not in names and f not in buckets:
                raise ValueError(
                    f"facet(): bucketSorts field {f!r} is neither a bucket "
                    f"nor a requested metric"
                )
        agged = _match_base(idx, c).groupBy(*buckets).agg(*metrics)
        cols = [F.col(f"`{f}`").desc() if d == "desc" else F.col(f"`{f}`").asc()
                for f, d in sort_spec]
        return TupleStream(agged.orderBy(*cols).limit(limit), sort_spec)

    if c.name == "significantTerms":
        if len(c.args) != 1:
            raise ValueError("significantTerms(collection, ...) takes one "
                             "positional arg")
        _require_params(c, {"q", "field"},
                        {"fq", "limit", "minDocFreq", "maxDocFreq",
                         "minTermLength"})
        return _significant_terms(_resolve(c.args[0], idx, colls), c)

    if c.name == "timeseries":
        if len(c.args) < 2:
            raise ValueError("timeseries(collection, metrics...) needs "
                             "at least one metric")
        _require_params(c, {"q", "field", "start", "end", "gap"}, {"fq"})
        return _timeseries(_resolve(c.args[0], idx, colls), c)

    if c.name == "stats":
        if len(c.args) < 2:
            raise ValueError("stats(collection, metrics...) needs metrics")
        _require_params(c, set(), {"q", "fq"})
        idx = _resolve(c.args[0], idx, colls)
        p = {"q": c.params.get("q", "*:*")}
        if "fq" in c.params:
            p["fq"] = c.params["fq"]
        df = solr_export(idx, p)
        metrics = [_metric_col(a) for a in c.args[1:] if isinstance(a, Call)]
        if len(metrics) != len(c.args) - 1:
            raise ValueError("stats(): every positional arg after the "
                             "collection must be a metric")
        return TupleStream(df.agg(*metrics), ())

    if c.name == "update":
        _require_params(c, set(), {"batchSize"})
        if len(c.args) != 2 or not isinstance(c.args[1], Call):
            raise ValueError("update(destCollection, stream, [batchSize=N])")
        if colls is None or not isinstance(c.args[0], str) \
                or c.args[0] not in colls:
            raise ValueError(
                f"update(): unknown destination collection {c.args[0]!r} "
                f"(registered: {sorted(colls) if colls else []})"
            )
        dest = colls[c.args[0]]
        if _contains_call(c.args[1], "topic"):
            # lazy topic() commits its checkpoint at eval time, BEFORE the
            # append job runs -- an append failure would silently lose the
            # window (at-most-once). The topic->update pipeline belongs to
            # run_daemon, whose two-phase checkpoint commits AFTER the
            # batch lands (exactly-once).
            raise ValueError(
                "update() over a topic() source must run through "
                "streaming.topics.run_daemon (daemon(update(dest, "
                "topic(...)))) -- the lazy path would commit the topic "
                "checkpoint before the append lands"
            )
        src = _eval(c.args[1], idx, colls)
        return _update_sink(dest, src)

    if c.name == "fetch":
        # fetch(collection, stream, on="tupleField=collField", fl="a,b")
        _require_params(c, {"on", "fl"}, {"batchSize"})  # batchSize is a
        # Solr transport knob (tuple-iterator page size); one join here
        if len(c.args) != 2 or not isinstance(c.args[1], Call):
            raise ValueError("fetch(collection, stream, on=.., fl=..)")
        fidx = _resolve(c.args[0], idx, colls)
        s = _eval(c.args[1], idx, colls)
        pairs = _on_pairs(c.params["on"])
        if len(pairs) != 1:
            raise ValueError("fetch(): on= takes exactly one key mapping")
        (tkey, dkey), = pairs
        fl = [f.strip() for f in str(c.params["fl"]).split(",") if f.strip()]
        if tkey not in s.df.columns:
            raise ValueError(
                f"fetch(): tuple key {tkey!r} is not in the stream "
                f"(columns: {s.df.columns})"
            )
        live = fidx._anti_dead(fidx.docs())
        unknown = [f for f in fl + [dkey] if f not in live.columns]
        if unknown:
            raise ValueError(f"fetch(): unknown collection fields {unknown}")
        clash = [f for f in fl if f in s.df.columns]
        if clash:
            raise ValueError(
                f"fetch(): fl fields {clash} already exist in the stream — "
                f"alias them away with select() first"
            )
        # the side key gets a unique name BEFORE the join: when the stream
        # itself derives from this collection (a self-join lineage), column
        # references by name/expr-id are ambiguous and can silently bind to
        # the left side — a renamed attribute cannot
        side = live.select(F.col(dkey).alias("__fetch_key"), *fl)
        # tuples left-join the collection: unmatched tuples pass through
        # unenriched (Solr's behavior). The tuple side is the small one —
        # AQE broadcasts it; the collection scan reads only dkey+fl columns.
        joined = (
            s.df.join(side, F.col(tkey) == F.col("__fetch_key"), "left")
            .drop("__fetch_key")
        )
        if s.sort:
            joined = joined.orderBy(*_sort_cols(s.sort))
        return TupleStream(joined, s.sort)

    if c.name == "nodes":
        # nodes(collection, stream|nodes(...), walk="src->dest",
        #       gather="field", [scatter="branches,leaves"], [count(*)])
        # — Solr's breadth-first graph expression ("Graph Traversal").
        # One hop per nodes() wrap, exactly like Solr: the incoming
        # tuples' src-field values are matched against the collection's
        # dest field; the matched docs' gather-field values become the
        # emitted node tuples (node/collection/field/level). Nesting
        # nodes() walks further (walk="node->..."). Distributed shape =
        # the {!graph} hop: distinct src keys (shuffle sized by the
        # stream), one semi/inner join against the docs scan, gather
        # distinct — never the corpus on the wire.
        _require_params(c, {"walk", "gather"}, {"scatter"})
        if len(c.args) < 2 or not isinstance(c.args[1], Call):
            raise ValueError("nodes(collection, stream, walk=.., gather=..)")
        nidx = _resolve(c.args[0], idx, colls)
        s = _eval(c.args[1], idx, colls)
        metrics = [_metric(a) for a in c.args[2:] if isinstance(a, Call)]
        if len(metrics) != len(c.args) - 2:
            raise ValueError(
                "nodes(): positional args after the stream must be metrics"
            )
        walk = str(c.params["walk"])
        src, arrow, dest = walk.partition("->")
        src, dest = src.strip(), dest.strip()
        if not arrow or not src or not dest:
            raise ValueError(f"nodes(): walk must be 'src->dest', got {walk!r}")
        gather = str(c.params["gather"]).strip()
        scatter = {x.strip() for x in
                   str(c.params.get("scatter", "leaves")).split(",") if x.strip()}
        bad_sc = scatter - {"branches", "leaves"}
        if bad_sc:
            raise ValueError(f"nodes(): scatter takes branches/leaves, "
                             f"got {sorted(bad_sc)}")
        if src not in s.df.columns:
            raise ValueError(
                f"nodes(): walk src {src!r} is not in the stream "
                f"(columns: {s.df.columns})"
            )
        live = nidx._anti_dead(nidx.docs())
        unknown = [f for f in (dest, gather) if f not in live.columns]
        if unknown:
            raise ValueError(f"nodes(): unknown collection fields {unknown}")
        keys = (
            s.df.select(F.col(src).alias("__walk_key"))
            .where(F.col("__walk_key").isNotNull()).distinct()
        )
        hop = live.join(keys, F.col(dest) == F.col("__walk_key"), "semi")
        node_col = F.col(gather).cast("string")
        gathered = hop.where(node_col.isNotNull())
        if metrics:
            leaves = gathered.groupBy(node_col.alias("node")) \
                .agg(*[m[0] for m in metrics])
        else:
            leaves = gathered.select(node_col.alias("node")).distinct()
        leaves = (
            leaves
            .withColumn("collection", F.lit(str(c.args[0])))
            .withColumn("field", F.lit(gather))
            .withColumn("level", F.lit(1))
        )
        out = leaves
        if "branches" in scatter:
            roots = (
                s.df.select(F.col(src).cast("string").alias("node"))
                .where(F.col("node").isNotNull()).distinct()
                .withColumn("collection", F.lit(str(c.args[0])))
                .withColumn("field", F.lit(src))
                .withColumn("level", F.lit(0))
            )
            out = roots.unionByName(out, allowMissingColumns=True)
        if "leaves" not in scatter:
            out = out.where(F.col("level") == 0)
        out = out.orderBy(F.col("level").asc(), F.col("node").asc())
        return TupleStream(out, (("level", "asc"), ("node", "asc")))

    if c.name == "shortestPath":
        # shortestPath(collection, from=, to=, edge="srcField=dstField",
        #              maxDepth=, [fq=], [threads=], [partitionSize=]) --
        # Solr's breadth-first shortest-path expression: walk docs whose
        # srcField matches the current node, stepping to their dstField
        # values; emit EVERY path of the minimal length from `from` to
        # `to` as {"path": [nodes...]}, empty when none within maxDepth.
        # threads/partitionSize are Solr's traversal transport knobs --
        # accepted, irrelevant here (each hop is ONE distributed join).
        # Scale shape: per hop, frontier |paths| x distinct-edge join +
        # anti-join against the visited set, lineage cut per hop
        # (localCheckpoint) exactly like json.facet's domain.graph; the
        # corpus never ships, only the frontier and the matched edges.
        _require_params(c, {"from", "to", "edge", "maxDepth"},
                        {"fq", "threads", "partitionSize"})
        if len(c.args) != 1:
            raise ValueError("shortestPath(collection, from=, to=, edge=)")
        nidx = _resolve(c.args[0], idx, colls)
        edge = str(c.params["edge"])
        sfld, eq, dfld = (x.strip() for x in edge.partition("="))
        if not eq or not sfld or not dfld:
            raise ValueError(
                f"shortestPath(): edge must be 'srcField=dstField', "
                f"got {edge!r}"
            )
        live = nidx._anti_dead(nidx.docs())
        unknown = [f for f in (sfld, dfld) if f not in live.columns]
        if unknown:
            raise ValueError(
                f"shortestPath(): unknown edge fields {unknown}"
            )
        if "fq" in c.params:
            live = nidx._apply_fq(live, c.params["fq"])
        frm, dst = str(c.params["from"]), str(c.params["to"])
        max_depth = int(c.params["maxDepth"])
        if max_depth < 1:
            raise ValueError("shortestPath(): maxDepth must be >= 1")
        spark = nidx.spark
        path_t = "path array<string>"
        edges = (
            live.select(F.col(sfld).cast("string").alias("_sp_src"),
                        F.col(dfld).cast("string").alias("_sp_dst"))
            .dropna().distinct()
        )
        if frm == dst:
            # zero-hop path -- but only for a node the (fq-filtered)
            # graph actually contains; never fabricate a ghost node
            known = edges.filter((F.col("_sp_src") == frm)
                                 | (F.col("_sp_dst") == frm))
            rows0 = [([frm],)] if known.take(1) else []
            return TupleStream(spark.createDataFrame(rows0, path_t), ())
        frontier = spark.createDataFrame(
            [(frm, [frm])], f"node string, {path_t}")
        visited = spark.createDataFrame([(frm,)], "node string")
        found = None
        for _depth in range(max_depth):
            nxt = (
                frontier.join(edges, F.col("node") == F.col("_sp_src"))
                .select(F.col("_sp_dst").alias("node"),
                        F.concat("path", F.array("_sp_dst")).alias("path"))
                .join(visited, "node", "left_anti")
                .localCheckpoint(eager=True)
            )
            hits = nxt.filter(F.col("node") == dst)
            if hits.take(1):
                found = hits
                break
            new_nodes = nxt.select("node").distinct() \
                .localCheckpoint(eager=True)
            if not new_nodes.take(1):
                break  # graph exhausted: no path exists
            visited = visited.unionByName(new_nodes) \
                .localCheckpoint(eager=True)
            frontier = nxt
        df = (spark.createDataFrame([], path_t) if found is None
              else found.select("path").distinct()
              .orderBy(F.concat_ws("\x1f", "path")))
        return TupleStream(df, ())

    if c.name == "random":
        # random(collection, q=.., [fq=], [rows=10], [fl=], [seed=])
        _require_params(c, {"q"}, {"fq", "rows", "fl", "seed"})
        if len(c.args) != 1:
            raise ValueError("random(collection, ...) takes one positional arg")
        ridx = _resolve(c.args[0], idx, colls)
        rows = int(c.params.get("rows", 10))
        seed = str(c.params.get("seed", "0"))  # documented deviation: Solr
        # draws a fresh seed per request; a fixed default keeps runs
        # reproducible (pass seed= to vary)
        base = _match_base(ridx, c)
        # layout-independent pseudo-random order (same convention as
        # operators/sampling.py): md5 over the doc key + seed
        rnd = F.md5(F.concat_ws(":", F.col("doc_id").cast("string"),
                                F.lit(seed)))
        df = base.orderBy(rnd.asc(), F.col("doc_id").asc()).limit(rows)
        if "fl" in c.params:
            cols = [f.strip() for f in str(c.params["fl"]).split(",")
                    if f.strip()]
            unknown = [f for f in cols if f not in df.columns]
            if unknown:
                raise ValueError(
                    f"random(): unknown fl fields {unknown} (stored fields "
                    f"only — random tuples carry no score)"
                )
            df = df.select(*cols)
        return TupleStream(df, ())

    if c.name in ("list", "plist"):
        # list(s1, s2, ...) / plist(...) -- concatenate streams in
        # argument order (plist is Solr's parallel-open variant: same
        # output contract, and Spark schedules the union's branches
        # concurrently anyway). Tuples missing a field another stream
        # carries emit it as null (Solr tuples simply lack the key --
        # closest relational shape, documented).
        if not c.args or not all(isinstance(a, Call) for a in c.args):
            raise ValueError(f"{c.name}(stream, stream, ...)")
        _require_params(c, set(), {"zkHost"})
        parts = [_eval(a, idx, colls) for a in c.args]
        dfs = [p.df.withColumn("__list_ord", F.lit(i)) for i, p in
               enumerate(parts)]
        u = dfs[0]
        for d in dfs[1:]:
            u = u.unionByName(d, allowMissingColumns=True)
        # argument order is the stream order (list contract). Within one
        # stream: when every branch declares the SAME sort, it is
        # re-asserted after the union; otherwise intra-stream order is
        # unspecified (Solr's list gives per-stream iteration order --
        # a relational union cannot, documented).
        common = parts[0].sort if all(
            p.sort == parts[0].sort and p.sort for p in parts) else ()
        u = u.orderBy("__list_ord", *_sort_cols(common)).drop("__list_ord")
        # NOT globally sorted by `common` (stream-1 block then stream-2
        # block): advertise no sort so unique/merge/innerJoin fail loud
        return TupleStream(u, ())

    if c.name == "echo":
        # echo("text") -- one tuple {"echo": text} (Solr's sanity probe)
        if len(c.args) != 1 or isinstance(c.args[0], Call):
            raise ValueError('echo("text")')
        return TupleStream(
            idx.spark.createDataFrame([(str(c.args[0]),)], "echo string"),
            ())

    if c.name == "scoreNodes":
        # scoreNodes(collection, nodes(...)) -- Solr's graph-node scorer:
        # each node tuple gains docFreq (docs carrying the node value in
        # its gather field), numDocs, and nodeScore = count(*) x
        # log((numDocs + 1) / (docFreq + 1)) -- tf-idf shape per the Solr
        # ref guide ("scoreNodes ... using tf-idf"; rare nodes outrank
        # ubiquitous ones). Solr's exact smoothing constants are an
        # implementation detail, so like significantTerms the RAW
        # docFreq/numDocs travel with every tuple for re-ranking under any
        # convention (documented deviation).
        # Plan: distinct (field, node) pairs from the (small) node stream
        # broadcast against ONE live docs scan per gather field ->
        # per-node doc counts; numDocs is the live count, no extra job.
        if len(c.args) != 2 or not isinstance(c.args[1], Call):
            raise ValueError("scoreNodes(collection, nodes(...))")
        _require_params(c, set(), set())
        nidx = _resolve(c.args[0], idx, colls)
        s = _eval(c.args[1], idx, colls)
        needed = {"node", "field", "count(*)"}
        missing = needed - set(s.df.columns)
        if missing:
            raise ValueError(
                f"scoreNodes(): stream lacks {sorted(missing)} -- wrap a "
                f"nodes(...) expression carrying count(*)"
            )
        live = nidx._anti_dead(nidx.docs())
        n_docs = live.count()
        # node streams are small by the gather contract: resolve the
        # gather fields driver-side, one df job per distinct field
        fields = [r["field"] for r in s.df.select("field").distinct()
                  .collect()]
        unknown = [f for f in fields if f not in live.columns]
        if unknown:
            raise ValueError(
                f"scoreNodes(): node fields not in the collection: "
                f"{unknown}"
            )
        df = s.df
        freqs = None
        for f in fields:
            part = (
                live.select(F.col(f).cast("string").alias("node"))
                .where(F.col("node").isNotNull())
                .join(F.broadcast(
                    df.filter(F.col("field") == f)
                    .select("node").distinct()), "node")
                .groupBy("node").agg(F.count("*").alias("docFreq"))
                .withColumn("field", F.lit(f))
            )
            freqs = part if freqs is None else freqs.unionByName(part)
        out = df.join(F.broadcast(freqs), ["node", "field"], "left")
        out = (
            out.withColumn("docFreq", F.coalesce("docFreq", F.lit(0)))
            .withColumn("numDocs", F.lit(int(n_docs)))
            .withColumn(
                "nodeScore",
                F.col("count(*)") * F.log(
                    (F.lit(float(n_docs) + 1.0))
                    / (F.col("docFreq") + F.lit(1.0))),
            )
        )
        return TupleStream(out, ())

    if c.name == "topic":
        # standalone topic(): poll + commit AT EVAL TIME -- stream-open
        # checkpoint semantics (Solr's TopicStream persists checkpoints on
        # open/close, not per-tuple ack). For the at-least-once pipeline
        # shape -- daemon(update(dest, topic(...))) with the checkpoint
        # committed only after the batch lands -- use
        # streaming.topics.run_daemon.
        from ..streaming.topics import TopicStream

        _require_params(c, {"id", "q"}, {"fl", "initialCheckpoint"})
        if len(c.args) != 2:
            raise ValueError("topic(checkpointCollection, collection, ...)")
        fl = c.params.get("fl")
        ts = TopicStream(
            _resolve(c.args[1], idx, colls),
            _resolve(c.args[0], idx, colls),
            str(c.params["id"]), str(c.params["q"]),
            fl=[f.strip() for f in str(fl).split(",")] if fl else None,
            initial_checkpoint=int(c.params.get("initialCheckpoint", 0)),
        )
        # materialize the window BEFORE committing so the returned frame
        # is the committed window, not a live re-read past the checkpoint
        win = ts.poll().localCheckpoint(eager=True)
        ts.commit()
        return TupleStream(win, (("doc_id", "asc"),))

    if c.name == "daemon":
        raise ValueError(
            "daemon() is an eager runner, not a lazy stream: use "
            "solr_semantic_importer_spark.streaming.topics.run_daemon"
        )

    if c.name == "tuple":
        # tuple(a="x", b=search(...)) -- ONE tuple whose values are
        # literals or embedded stream results. Solr materializes embedded
        # streams into the tuple, so we collect them -- bounded at
        # _TUPLE_EMBED_CAP rows per embed (fail loud past it rather than
        # OOM the driver; Solr pays the same memory unbounded).
        if c.args or not c.params:
            raise ValueError("tuple(name=value, ...) takes named params only")
        from pyspark.sql import types as T

        fields, data = [], {}
        for name, v in c.params.items():
            if isinstance(v, Call):
                sub = _eval(v, idx, colls)
                rows = sub.df.limit(_TUPLE_EMBED_CAP + 1).collect()
                if len(rows) > _TUPLE_EMBED_CAP:
                    raise ValueError(
                        f"tuple(): embedded stream {name}= exceeds "
                        f"{_TUPLE_EMBED_CAP} rows -- page it or aggregate "
                        f"before embedding"
                    )
                fields.append(T.StructField(name, T.ArrayType(sub.df.schema)))
                data[name] = rows
            else:
                fields.append(T.StructField(name, T.StringType()))
                data[name] = str(v)
        df = idx.spark.createDataFrame([data], T.StructType(fields))
        return TupleStream(df, ())

    if c.name == "let":
        # let(a=stream, b=stream, expr) -- bind named streams; get(name)
        # inside expr (or a LATER binding, Solr's sequential scoping)
        # replays the binding. Spark-shaped: substitution at the AST
        # level -- a binding IS a lazy plan, so every get() reuse hands
        # Catalyst the same subtree; Solr instead caches the materialized
        # tuple list driver-side (same observable semantics, no driver
        # memory here).
        if len(c.args) != 1 or not isinstance(c.args[0], Call) or not c.params:
            raise ValueError("let(name=stream, ..., stream)")

        def _subst(node, env, shadowed=frozenset()):
            if not isinstance(node, Call):
                return node
            if node.name == "get":
                if (len(node.args) != 1 or node.params
                        or not isinstance(node.args[0], str)):
                    raise ValueError("get() takes one binding name")
                nm = node.args[0]
                if nm in shadowed:
                    return node  # a nested let rebinds it: resolved there
                if nm not in env:
                    raise ValueError(
                        f"get(): unknown let binding {node.args!r} "
                        f"(bound: {sorted(env)})"
                    )
                return env[nm]
            if node.name == "let":
                # nested let: names it rebinds SHADOW the outer ones
                # everywhere inside it -- those get()s are left for the
                # inner let's own (sequential) resolution; un-shadowed
                # outer names still substitute
                sh = shadowed | set(node.params)
                return Call("let",
                            [_subst(a, env, sh) for a in node.args],
                            {k2: _subst(v2, env, sh)
                             for k2, v2 in node.params.items()})
            return Call(node.name,
                        [_subst(a, env, shadowed) for a in node.args],
                        {k2: _subst(v2, env, shadowed)
                         for k2, v2 in node.params.items()})

        resolved: dict[str, Call] = {}
        for name, v in c.params.items():
            if not isinstance(v, Call):
                raise ValueError(f"let(): {name}= must be a stream")
            resolved[name] = _subst(v, dict(resolved))
        return _eval(_subst(c.args[0], resolved), idx, colls)

    if c.name == "get":
        raise ValueError("get() is only valid inside let()")

    if c.name == "col":
        # col(stream, fieldName) -- Solr's array extractor. Standalone
        # (embedded in tuple()/let()) it materializes ONE tuple whose
        # single column holds the values in stream order (capped like
        # tuple() embeds); inside describe()/corr()/hist()/percentile()
        # it never materializes -- those compile to distributed
        # aggregates over the underlying stream (the Spark-first reading
        # of Solr's driver-side array math).
        s, fld = _col_ref(c, idx, colls)
        rows = s.df.select(fld).limit(_TUPLE_EMBED_CAP + 1).collect()
        if len(rows) > _TUPLE_EMBED_CAP:
            raise ValueError(
                f"col(): materializing more than {_TUPLE_EMBED_CAP} values "
                f"-- use describe()/hist()/percentile() (distributed) "
                f"instead of the raw array"
            )
        from pyspark.sql import types as T

        dt = s.df.schema[fld].dataType
        return TupleStream(
            idx.spark.createDataFrame(
                [{fld: [r[0] for r in rows]}],
                T.StructType([T.StructField(fld, T.ArrayType(dt))]),
            ),
            (),
        )

    if c.name == "describe":
        # describe(col(stream, f)) -- Solr's summary-statistics evaluator
        # as ONE distributed partial agg (Solr collects the array and
        # loops; the result tuple is identical)
        if len(c.args) != 1 or c.params:
            raise ValueError("describe(col(stream, f))")
        s, fld = _col_ref(_as_col(c.args[0], "describe"), idx, colls)
        x = F.col(fld).cast("double")
        row = s.df.agg(
            F.count(x).alias("N"), F.avg(x).alias("mean"),
            F.min(x).alias("min"), F.max(x).alias("max"),
            F.stddev_samp(x).alias("stdev"), F.var_samp(x).alias("var"),
            F.sum(x * x).alias("sumsq"), F.sum(x).alias("sum"),
        ).collect()[0]
        return TupleStream(idx.spark.createDataFrame(
            [row.asDict()],
            "N long, mean double, min double, max double, stdev double, "
            "var double, sumsq double, sum double"), ())

    if c.name == "corr":
        # corr(col(s, x), col(s, y)) -- Pearson correlation compiled to
        # Spark's corr aggregate. Both columns must come from the SAME
        # stream expression (Solr's arrays are positionally aligned;
        # only a shared source guarantees that relationally)
        if len(c.args) != 2 or c.params:
            raise ValueError("corr(col(stream, x), col(stream, y))")
        (s1, f1), (s2, f2) = (_col_ref(_as_col(a, "corr") , idx, colls)
                              for a in c.args)
        if c.args[0].args[0] != c.args[1].args[0]:
            raise ValueError(
                "corr(): both columns must read ONE stream (positional "
                "alignment has no relational meaning across two streams)"
            )
        row = s1.df.agg(F.corr(F.col(f1).cast("double"),
                               F.col(f2).cast("double")).alias("corr")
                        ).collect()[0]
        return TupleStream(idx.spark.createDataFrame(
            [row.asDict()], "corr double"), ())

    if c.name == "percentile":
        # percentile(col(stream, f), p) -- EXACT linear interpolation via
        # Spark's percentile aggregate (Solr's t-digest is approximate;
        # exact is strictly more accurate, the json.facet convention)
        if len(c.args) != 2 or c.params or isinstance(c.args[1], Call):
            raise ValueError("percentile(col(stream, f), p)")
        s, fld = _col_ref(_as_col(c.args[0], "percentile"), idx, colls)
        p = float(c.args[1])
        if not 0 <= p <= 100:
            raise ValueError("percentile(): p in [0, 100]")
        row = s.df.agg(F.expr(
            f"percentile(cast({fld} as double), {p / 100.0!r})"
        ).alias("percentile")).collect()[0]
        return TupleStream(idx.spark.createDataFrame(
            [row.asDict()], "percentile double"), ())

    if c.name == "hist":
        # hist(col(stream, f), bins=N) -- equal-width histogram: one
        # min/max agg, then ONE width_bucket groupBy (two partial-agg
        # jobs total; the corpus never reaches the driver). Emits one
        # tuple per bin: (bin, lo, hi, count), empty bins included.
        if len(c.args) != 1:
            raise ValueError("hist(col(stream, f), bins=N)")
        _require_params(c, set(), {"bins"})
        bins = int(c.params.get("bins", 10))
        if bins < 1:
            raise ValueError("hist(): bins must be >= 1")
        s, fld = _col_ref(_as_col(c.args[0], "hist"), idx, colls)
        x = F.col(fld).cast("double")
        mr = s.df.agg(F.min(x).alias("mn"), F.max(x).alias("mx")
                      ).collect()[0]
        mn, mx = mr["mn"], mr["mx"]
        if mn is None:
            return TupleStream(idx.spark.createDataFrame(
                [], "bin long, lo double, hi double, count long"),
                (("bin", "asc"),))
        width = ((mx - mn) / bins) or 1.0  # degenerate: all values equal
        counts = {
            int(r["b"]): int(r["n"])
            # null x never buckets (min/max above already ignore nulls;
            # without this filter a null row produced a null bucket and
            # int(None) crashed — r5 ADVICE fix)
            for r in s.df.filter(x.isNotNull()).select(
                F.least(F.floor((x - F.lit(mn)) / F.lit(width)),
                        F.lit(bins - 1)).alias("b"))
            .groupBy("b").agg(F.count("*").alias("n")).collect()
        }
        rows = [{"bin": i, "lo": mn + i * width, "hi": mn + (i + 1) * width,
                 "count": counts.get(i, 0)} for i in range(bins)]
        return TupleStream(
            idx.spark.createDataFrame(rows).select("bin", "lo", "hi",
                                                   "count"),
            (("bin", "asc"),))

    if c.name == "parallel":
        # parallel(collection, stream, workers=N, sort="f asc") -- Solr
        # partitions the wrapped stream across N worker nodes and
        # merge-sorts their outputs. The Spark plan is ALREADY executed
        # by every executor (that is the point of declaring streams as
        # DataFrames -- Catalyst/AQE pick the parallelism), so workers=
        # is validated and recorded but does not re-partition anything;
        # the sort= merge contract is asserted on the result, which is
        # what downstream consumers depend on.
        if len(c.args) != 2 or not isinstance(c.args[1], Call):
            raise ValueError("parallel(collection, stream, workers=, sort=)")
        _require_params(c, {"workers", "sort"}, set())
        _resolve(c.args[0], idx, colls)  # validates the collection name
        if int(c.params["workers"]) < 1:
            raise ValueError("parallel(): workers must be >= 1")
        spec = _parse_by(c.params["sort"])
        inner = _eval(c.args[1], idx, colls)
        for fld, _ in spec:
            if fld not in inner.df.columns:
                raise ValueError(
                    f"parallel(): sort field {fld!r} not in the stream"
                )
        return TupleStream(inner.df.orderBy(*_sort_cols(spec)), spec)

    if c.name == "knnSearch":
        # knnSearch(collection, id=, qf=, k=) -- Solr's text-similarity
        # knn stream source (MoreLikeThis-backed): the k docs most
        # similar to doc `id` by re-analyzed term overlap, through the
        # normal top-k path (engine.more_like_this). qf must name the
        # analyzed text field (single-text-field engine); optional
        # mintf/mindf/maxqt map to the MLT gates.
        if len(c.args) != 1:
            raise ValueError("knnSearch(collection, id=, qf=, k=)")
        _require_params(c, {"id", "qf", "k"}, {"fq", "mintf", "mindf",
                                               "maxqt"})
        nidx = _resolve(c.args[0], idx, colls)
        if str(c.params["qf"]) not in ("text", "_text_"):
            raise ValueError(
                "knnSearch(): qf must name the analyzed text field "
                "('text' or '_text_' -- single-text-field engine)"
            )
        df = nidx.more_like_this(
            int(c.params["id"]), k=int(c.params["k"]),
            max_query_terms=int(c.params.get("maxqt", 25)),
            min_tf=int(c.params.get("mintf", 2)),
            min_df=int(c.params.get("mindf", 5)),
            fq=c.params.get("fq"),
        )
        return TupleStream(df, (("score", "desc"), ("doc_id", "asc")))


    # every other function decorates a stream given as the first arg
    if not c.args or not isinstance(c.args[0], Call):
        raise ValueError(f"{c.name}(): first argument must be a stream")
    s = _eval(c.args[0], idx, colls)

    if c.name == "cartesianProduct":
        # cartesianProduct(stream, fieldName, [productSort="f asc"])
        _require_params(c, set(), {"productSort"})
        if len(c.args) != 2 or isinstance(c.args[1], Call):
            raise ValueError("cartesianProduct(stream, fieldName)")
        fld = str(c.args[1]).strip()
        if fld not in s.df.columns:
            raise ValueError(f"cartesianProduct(): unknown field {fld!r}")
        if not s.df.schema[fld].dataType.typeName().startswith("array"):
            raise ValueError(
                f"cartesianProduct(): field {fld!r} is not multivalued"
            )
        df = s.df.withColumn(fld, F.explode(fld))
        # the stream's sort survives for keys other than the exploded one;
        # productSort orders the emitted tuples within/after it
        sort = tuple(x for x in s.sort if x[0] != fld)
        if "productSort" in c.params:
            extra = _parse_by(c.params["productSort"])
            sort = sort + tuple(x for x in extra if x not in sort)
        if sort:
            df = df.orderBy(*_sort_cols(sort))
        return TupleStream(df, sort)

    if c.name == "reduce":
        # reduce(stream, by="f", group(sort="g desc", n=5)) — one tuple per
        # by-value carrying the group's top-n tuples. Solr emits the group
        # head's fields plus a "group" list of tuple maps; here the output
        # is the by-fields plus `group` = array<struct> of the FULL input
        # tuples, top-n per the group sort (same information, columnar
        # shape). Requires the stream sorted by `by` (Solr's contract).
        _require_params(c, {"by"})
        if len(c.args) != 2 or not isinstance(c.args[1], Call) \
                or c.args[1].name != "group":
            raise ValueError('reduce(stream, by=.., group(sort=.., n=..))')
        g = c.args[1]
        _require_params(g, {"sort", "n"})
        if g.args:
            raise ValueError("group(): takes only sort= and n=")
        by = [x.strip() for x in str(c.params["by"]).split(",") if x.strip()]
        _require_sorted_by(s, by, "reduce()")
        gsort = _parse_by(g.params["sort"])
        n = int(g.params["n"])
        if n <= 0:
            raise ValueError("group(): n must be >= 1")
        others = [f for f in s.df.columns if f not in by]
        if not others:
            raise ValueError(
                "reduce(): the stream carries only the by= fields — "
                "there is nothing to group"
            )
        w = Window.partitionBy(*by).orderBy(*_sort_cols(gsort))
        ranked = s.df.withColumn("__rn", F.row_number().over(w)) \
            .filter(F.col("__rn") <= n)
        # collect (rn, tuple) and sort by rn: order-correct under any
        # group-sort direction/type without encoding tricks
        packed = F.struct(F.col("__rn").alias("rn"),
                          F.struct(*[F.col(f) for f in others]).alias("t"))
        df = (
            ranked.groupBy(*by)
            .agg(F.array_sort(F.collect_list(packed)).alias("__g"))
            .withColumn("group", F.transform("__g", lambda x: x["t"]))
            .drop("__g")
            .orderBy(*_sort_cols(tuple((f, d) for f, d in s.sort
                                       if f in by)))
        )
        return TupleStream(df, tuple(x for x in s.sort if x[0] in by))

    if c.name == "select":
        _require_params(c, set())
        if len(c.args) < 2:
            raise ValueError("select(stream, fields...) needs fields")
        cols, renames = [], {}
        for a in c.args[1:]:
            if isinstance(a, Call):
                raise ValueError("select(): evaluators are unsupported")
            m = re.match(r"^(\S+)(?:\s+as\s+(\S+))?$", a.strip())
            if not m:
                raise ValueError(f"select(): bad field spec {a!r}")
            src, alias = m.group(1), m.group(2)
            cols.append(F.col(src).alias(alias) if alias else F.col(src))
            if alias:
                renames[src] = alias
        # sortedness survives the projection only for the key prefix that
        # is still present (a dropped sort key breaks the ordered-stream
        # contract from that position on)
        kept = {(renames.get(src, src)) for src in
                (a.strip().split()[0] for a in c.args[1:])}
        sort_list: list[tuple[str, str]] = []
        for f, d in s.sort:
            f2 = renames.get(f, f)
            if f2 not in kept:
                break
            sort_list.append((f2, d))
        return TupleStream(s.df.select(*cols), tuple(sort_list))

    if c.name == "sort":
        _require_params(c, {"by"})
        spec = _parse_by(c.params["by"])
        return TupleStream(s.df.orderBy(*_sort_cols(spec)), spec)

    if c.name == "unique":
        _require_params(c, {"over"})
        over = [x.strip() for x in str(c.params["over"]).split(",") if x.strip()]
        _require_sorted_by(s, over, "unique()")
        tail = [x for x in s.sort if x[0] not in over]
        order = _sort_cols(tail) or [F.lit(1)]
        w = Window.partitionBy(*over).orderBy(*order)
        df = (
            s.df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .orderBy(*_sort_cols(s.sort))
        )
        return TupleStream(df, s.sort)

    if c.name == "top":
        _require_params(c, {"n", "sort"})
        spec = _parse_by(c.params["sort"])
        df = s.df.orderBy(*_sort_cols(spec)).limit(int(c.params["n"]))
        return TupleStream(df, spec)

    if c.name == "rollup":
        _require_params(c, {"over"})
        over = [x.strip() for x in str(c.params["over"]).split(",") if x.strip()]
        metrics = [_metric_col(a) for a in c.args[1:] if isinstance(a, Call)]
        if len(metrics) != len(c.args) - 1:
            raise ValueError("rollup(stream, over=.., metrics...) — every "
                             "positional arg after the stream must be a metric")
        if not metrics:
            raise ValueError("rollup() needs at least one metric")
        df = s.df.groupBy(*over).agg(*metrics).orderBy(*[F.col(f) for f in over])
        return TupleStream(df, tuple((f, "asc") for f in over))

    if c.name == "having":
        _require_params(c, set())
        if len(c.args) != 2:
            raise ValueError("having(stream, evaluator)")
        return TupleStream(s.df.filter(_bool_evaluator(c.args[1])), s.sort)

    if c.name in ("innerJoin", "leftOuterJoin", "hashJoin",
                  "intersect", "complement", "merge"):
        if c.name == "hashJoin":
            _require_params(c, {"hashed", "on"})
            right_call = c.params["hashed"]
            if not isinstance(right_call, Call):
                raise ValueError("hashJoin(): hashed= must be a stream")
            r = _eval(right_call, idx, colls)
        else:
            _require_params(c, {"on"})
            if len(c.args) != 2 or not isinstance(c.args[1], Call):
                raise ValueError(f"{c.name}(left, right, on=..)")
            r = _eval(c.args[1], idx, colls)

        if c.name == "merge":
            spec = _parse_by(c.params["on"])
            for side, nm in ((s, "left"), (r, "right")):
                if side.sort[: len(spec)] != spec:
                    raise ValueError(
                        f"merge(): {nm} stream must be sorted by the on= "
                        f"spec {list(spec)} (is {list(side.sort)})"
                    )
            df = s.df.unionByName(r.df).orderBy(*_sort_cols(spec))
            return TupleStream(df, spec)

        pairs = _on_pairs(c.params["on"])
        lkeys = [a for a, _ in pairs]
        if c.name in ("innerJoin", "leftOuterJoin"):
            # Solr's merge joins demand both sides sorted by the keys
            _require_sorted_by(s, lkeys, f"{c.name}() left")
            _require_sorted_by(r, [b for _, b in pairs], f"{c.name}() right")
        cond = None
        for a, b in pairs:
            e = s.df[a] == r.df[b]
            cond = e if cond is None else (cond & e)
        how = {"innerJoin": "inner", "leftOuterJoin": "left",
               "hashJoin": "inner", "intersect": "semi",
               "complement": "anti"}[c.name]
        rdf = F.broadcast(r.df) if c.name == "hashJoin" else r.df
        joined = s.df.join(rdf, cond, how)
        if how in ("semi", "anti"):
            df = joined.orderBy(*_sort_cols(s.sort)) if s.sort else joined
            return TupleStream(df, s.sort)
        # drop the right-side duplicate key columns (Solr emits one key)
        for a, b in pairs:
            if b in r.df.columns and a in s.df.columns:
                joined = joined.drop(r.df[b])
        sort = s.sort if c.name != "hashJoin" else ()
        if sort:
            joined = joined.orderBy(*_sort_cols(sort))
        return TupleStream(joined, sort)

    raise ValueError(f"unsupported stream function {c.name}()")


_TUPLE_EMBED_CAP = 10_000  # rows per embedded stream in tuple()


def _as_col(a, fname: str) -> Call:
    """Validate an evaluator argument is a ``col(...)`` call."""
    if not isinstance(a, Call) or a.name != "col":
        raise ValueError(f"{fname}() takes col(stream, field) arguments")
    return a


def _col_ref(c: Call, idx, colls) -> tuple[TupleStream, str]:
    """Resolve a ``col(stream, field)`` call -> (evaluated stream, field
    name), validating the field exists on the stream."""
    if (len(c.args) != 2 or c.params or not isinstance(c.args[0], Call)
            or isinstance(c.args[1], Call)):
        raise ValueError("col(stream, fieldName)")
    s = _eval(c.args[0], idx, colls)
    fld = str(c.args[1])
    if fld not in s.df.columns:
        raise ValueError(f"col(): unknown field {fld!r} in the stream")
    return s, fld


def _match_base(idx: BM25Index, c: Call) -> DataFrame:
    """The exact (op-free) DocSet for a stream source's q/fq params,
    joined back to the stored docs — *:* takes the live filtered scan."""
    q = str(c.params["q"])
    fq = c.params.get("fq")
    if q.strip() == "*:*":
        return idx._anti_dead(idx._apply_fq(idx.docs(), fq))
    return idx._matched_ids(q, fq=fq).join(idx.docs(), "doc_id")


def _freq_bound(v: Any, n_docs: int, name: str) -> int:
    x = float(v)
    if x < 0:
        raise ValueError(f"significantTerms(): {name} must be >= 0")
    return int(x) if x >= 1 else int(x * n_docs)


def _significant_terms(idx: BM25Index, c: Call) -> TupleStream:
    from ..functions.analysis import tokens_col

    if idx.analyzer_chain != "text_general":
        raise ValueError(
            "significantTerms(): foreground re-analysis is implemented for "
            f"the text_general chain (index uses {idx.analyzer_chain!r})"
        )
    field = str(c.params["field"])
    if field not in idx.docs().columns:
        raise ValueError(f"significantTerms(): unknown field {field!r}")
    limit = int(c.params.get("limit", 20))
    min_df = _freq_bound(c.params.get("minDocFreq", 5), idx.n_docs, "minDocFreq")
    max_df = _freq_bound(c.params.get("maxDocFreq", 0.3), idx.n_docs, "maxDocFreq")
    min_len = int(c.params.get("minTermLength", 4))

    base = _match_base(idx, c)
    fg_n = base.count()
    if fg_n == 0:
        return TupleStream(
            idx.spark.createDataFrame(
                [], "term string, foreground long, background long, score double"
            ),
            (("score", "desc"), ("term", "asc")),
        )
    # distinct terms per matched doc -> per-term foreground doc frequency
    fg = (
        base.select(
            F.explode(F.array_distinct(tokens_col(field))).alias("term")
        )
        .groupBy("term")
        .agg(F.count("*").alias("foreground"))
    )
    bg = idx.dictionary().select("term", F.col("df").alias("background"))
    lift = (F.col("foreground") / F.lit(float(fg_n))) / (
        F.col("background") / F.lit(float(idx.n_docs))
    )
    df = (
        fg.join(bg, "term")
        .filter(
            (F.col("background") >= min_df)
            & (F.col("background") <= max_df)
            & (F.length("term") >= min_len)
        )
        .withColumn("score", F.round(lift, 6))
        .orderBy(F.col("score").desc(), F.col("term").asc())
        .limit(limit)
    )
    return TupleStream(df, (("score", "desc"), ("term", "asc")))


def _timeseries(idx: BM25Index, c: Call) -> TupleStream:
    """timeseries(collection, q=, field=, start=, end=, gap=, metrics...).
    Date-native over timestamp fields (Solr's actual form: ISO start/end
    + DateMath gap, bucket column emitted as a timestamp); numeric fields
    keep the epoch-number form. Fixed-width gaps bucket by arithmetic;
    +NMONTHS/+NYEARS step REAL calendar months (boundaries enumerated
    driver-side, assignment one codegen array expression — see
    functions/datemath.py). tz-naive instants are UTC, never the host
    zone. Exact op-free DocSet, ONE partial-agg shuffle of at most
    n_buckets rows per task either way."""
    from ..functions.datemath import (
        boundary_bucket_expr, month_bucket_starts, parse_gap, parse_instant,
    )

    field = str(c.params["field"])
    is_ts = dict(idx.docs().dtypes).get(field, "").startswith("timestamp")
    if is_ts:
        # start/end are full DateMath instants (ISO or NOW±.../UNIT)
        start = parse_instant(c.params["start"])
        end = parse_instant(c.params["end"])
        gap_kind, gap = parse_gap(c.params["gap"])
    else:
        start, end, gap = (
            float(c.params[k]) for k in ("start", "end", "gap"))
        gap_kind = "sec"
    if gap <= 0 or end <= start:
        raise ValueError("timeseries(): needs gap > 0 and end > start")
    metrics = [_metric_col(a) for a in c.args[1:] if isinstance(a, Call)]
    if len(metrics) != len(c.args) - 1 or not metrics:
        raise ValueError("timeseries(): every positional arg after the "
                         "collection must be a metric")
    x = F.col(field).cast("double")  # timestamps cast to epoch seconds
    if gap_kind == "months":
        sec = boundary_bucket_expr(
            x, month_bucket_starts(start, end, int(gap))[:-1])
    else:
        sec = F.lit(start) + F.floor((x - start) / gap) * gap
    bucket = (F.timestamp_seconds(sec) if is_ts else sec).alias(field)
    df = (
        _match_base(idx, c)
        .filter((x >= start) & (x < end))
        .groupBy(bucket)
        .agg(*metrics)
        .orderBy(F.col(field).asc())
    )
    return TupleStream(df, ((field, "asc"),))


def solr_sql(idx: BM25Index, sql: str, collection: str = "collection") -> DataFrame:
    """Solr /sql handler analog: run SQL over the LIVE doc set.

    Solr's Parallel SQL interface compiles SQL onto the same tuple streams
    :func:`run_stream_expr` evaluates; this engine skips the translation
    and registers the tombstone-aware doc table as a temp view named
    ``collection``, handing the statement to Spark SQL (a superset of
    Solr's SQL subset — joins, subqueries and window functions included).
    Documented deviation: WHERE clauses are ANSI predicates, not embedded
    Solr query strings."""
    idx._anti_dead(idx.docs()).createOrReplaceTempView(collection)
    return idx.spark.sql(sql)


def next_batch_id(dest: BM25Index) -> int:
    """The next free ``batch-<id>`` slot in ``dest``'s manifest (the
    shared helper lives in streaming/incremental.py)."""
    from ..streaming.incremental import next_batch_id as _next

    return _next(dest.data_dir)


def _update_sink(
    dest: BM25Index, src: TupleStream, batch_id: int | None = None
) -> TupleStream:
    """Land a stream in ``dest`` as one exactly-once staged batch (see the
    module docstring's update() entry). ``batch_id``: normally the next
    free slot; an explicit id (the daemon's two-phase replay protocol --
    streaming/topics.py) makes a re-send of an already-committed batch a
    NO-OP that reports the landed row count instead of an error."""
    from ..plans.manifest import Manifest, read_manifest_data
    from ..streaming.incremental import append_batch

    data_dir = dest.data_dir
    live = (read_manifest_data(data_dir) or {}).get("build_id", "update")
    cfg = dest._config_from_manifest(live)
    expected = [c0 for c0 in dest.docs().columns
                if c0 not in ("doc_id", "dl", "segment_id", "tfmap")]
    missing = [c0 for c0 in expected if c0 not in src.df.columns]
    if missing:
        raise ValueError(
            f"update(): stream is missing destination fields {missing}"
        )
    batch = src.df.select(*expected)
    explicit = batch_id is not None
    nxt = int(batch_id) if explicit else next_batch_id(dest)
    if not append_batch(batch, data_dir, cfg, batch_id=nxt) and not explicit:
        raise RuntimeError(f"update(): batch id {nxt} already committed")
    n = int(Manifest(data_dir, cfg.build_id)
            .steps[f"batch-{nxt}"].rows)
    out = dest.spark.createDataFrame(
        [(n, nxt)], "totalIndexed long, batchNumber long"
    )
    return TupleStream(out, ())


def run_stream_expr(
    idx: BM25Index, expr: str, collections: dict[str, BM25Index] | None = None
) -> DataFrame:
    """Parse + evaluate a streaming expression against the index. Returns
    the composed (lazy) DataFrame — the /stream response body is one
    ``toLocalIterator()`` away, a parquet export one ``write`` away.

    ``collections``: name -> BM25Index registry; source functions resolve
    their positional collection arg through it (and ``update()`` requires
    it for the destination). Without a registry the bound ``idx`` serves
    every name — the single-collection mode."""
    return _eval(parse_stream_expr(expr), idx, collections).df
