"""Solr JSON Facet API (``json.facet``) -- declarative nested facets.

The modern Solr facet surface (the /select side the reference's collections
expose; any SolrJ/HTTP client can attach ``json.facet`` to the requests
HttpSolrSelectClientImpl.java builds). Supported subset, evaluated
Spark-first -- every facet node is ONE DataFrame aggregation job over the
domain (never a job per bucket):

- **stat facets** (string form): ``"x": "sum(dl)"`` with
  sum/avg/min/max/unique/missing/countvals/sumsq/variance/stddev/hll
  over a field OR a function query (``"sum(div(turn_idx,dl))"`` --
  `functions/function_query.py` grammar).
  ``unique`` is exact countDistinct (Solr's is exact below 100 values,
  approximate above -- documented deviation: ours is always exact).
  ``variance``/``stddev`` are the corrected-sample forms (Solr since
  SOLR-11725; Spark ``var_samp``/``stddev_samp``). ``hll`` is Spark's
  HyperLogLog++ ``approx_count_distinct`` (documented deviation: Solr's
  HLLAgg is a different HLL implementation, so the approximate value may
  differ between engines; both converge on the true cardinality and the
  Spark sketch is exact at small cardinalities via its sparse mode).
  ``percentile(dl, 50, 90)``: EXACT linear-interpolation percentiles
  (Spark's percentile aggregate; Solr uses a t-digest APPROXIMATION --
  ours is strictly more accurate; a single percentile yields a number,
  several yield a list, Solr's response shape). The exact aggregate's
  state is a counts map bounded by the field's distinct-value count per
  bucket -- right for the bounded-cardinality numerics facet stats run
  over; swap percentile_approx for unbounded doubles at 10^12 rows.
- **terms facets**: ``{type: terms, field, limit (default 10), offset,
  mincount (default 1), sort ("count desc" | "index asc" | "<stat> desc"),
  missing: bool, allBuckets: bool, facet: {nested}}``. Nested stats and
  query subfacets ride the SAME groupBy as the bucket counts (conditional
  aggregates); nested terms facets re-aggregate the domain with the parent
  field prefixed (one extra job per nesting LEVEL, cut per parent with a
  row_number window -- the pivot_facet plan shape).
- **query facets**: ``{type: query, q: <filter>, facet: {stats}}`` -- the
  ``q`` is a filter over doc fields (Solr fq grammar via
  `functions/solr_fq.py`, or SQL). Full-text scored queries inside a
  facet are unsupported (fail loud) -- the reference never nests them.
- **range facets**: ``{type: range, field, start, end, gap, facet:
  {stats}}`` -- half-open ``[lo, hi)`` buckets derived in-plan
  (``floor((x-start)/gap)``), zero buckets filled driver-side (Solr range
  default mincount 0). A range facet may also nest UNDER a terms facet
  (one groupBy over (parent, bucket), parents x n_buckets rows out).

Top-level facet nodes take ``domain: {excludeTags | filter | query |
join}`` (multi-select faceting, domain narrowing, domain replacement,
same-collection join mapping -- see ``_node_base``). Unsupported spec
keys (refine/overrequest/graph domains...) raise ValueError -- the
facade's fail-loud contract. Response shape matches
Solr: ``{"count": N, "<name>": {"buckets": [{"val", "count", ...stats,
...subfacets}], "missing"?, "allBuckets"?}, "<stat>": value}``.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, functions as F

__all__ = ["json_facet"]

_STAT_RE = re.compile(
    r"^\s*(sum|avg|min|max|unique|missing|percentile"
    r"|countvals|sumsq|variance|stddev|hll)\s*\((.+)\)\s*$", re.S
)


def _split_top_level(s: str) -> list[str]:
    """Split on commas outside parentheses/quotes (percentile's arg list
    may itself be a function query with commas)."""
    out, depth, q, start = [], 0, None, 0
    for i, ch in enumerate(s):
        if q:
            if ch == q:
                q = None
        elif ch in "'\"":
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(s[start:i])
            start = i + 1
    out.append(s[start:])
    return [p.strip() for p in out]

_TERMS_KEYS = {"type", "field", "limit", "offset", "mincount", "sort",
               "missing", "allBuckets", "facet", "domain"}
_QUERY_KEYS = {"type", "q", "facet", "domain"}
_RANGE_KEYS = {"type", "field", "start", "end", "gap", "facet", "domain"}


def _arg_sql(idx, arg: str) -> str:
    """A stat's argument: a plain field name or a function query."""
    types = dict(idx.docs().dtypes)
    if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", arg.strip()):
        f = arg.strip()
        if f not in types:
            raise ValueError(f"json.facet stat over unknown field {f!r}")
        return f
    from ..functions.function_query import function_to_sql

    return function_to_sql(arg, types)[0]


def _stat_agg(idx, name: str, spec: str):
    """One stat facet -> one Spark aggregate Column aliased to its name."""
    m = _STAT_RE.match(spec)
    if m is None:
        raise ValueError(
            f"unsupported json.facet stat {spec!r} (use sum/avg/min/max/"
            f"unique/missing/countvals/sumsq/variance/stddev/hll"
            f"(field-or-function) or percentile(arg, p...))"
        )
    fn, arg = m.group(1), m.group(2)
    if fn == "percentile":
        parts = _split_top_level(arg)
        if len(parts) < 2:
            raise ValueError(
                f"percentile stat {spec!r}: need percentile(arg, p1[, p2...])"
            )
        try:
            ps = [float(p) for p in parts[1:]]
        except ValueError:
            raise ValueError(
                f"percentile stat {spec!r}: percentiles must be numbers"
            ) from None
        if any(not 0.0 <= p <= 100.0 for p in ps):
            raise ValueError(f"percentile stat {spec!r}: p not in [0, 100]")
        col = F.expr(_arg_sql(idx, parts[0])).cast("double")
        if len(ps) == 1:
            return F.percentile(col, F.lit(ps[0] / 100.0)).alias(name)
        return F.percentile(
            col, F.array(*[F.lit(p / 100.0) for p in ps])
        ).alias(name)
    if fn == "missing":
        return F.count(
            F.when(F.expr(_arg_sql(idx, arg)).isNull(), 1)
        ).alias(name)
    col = F.expr(_arg_sql(idx, arg))
    if fn == "unique":
        return F.countDistinct(col).alias(name)
    if fn == "countvals":
        # Solr CountValsAgg: number of (non-null) values in the bucket.
        return F.count(col).alias(name)
    if fn == "sumsq":
        # double accumulation like Solr's SumsqAgg (and safe from int
        # overflow at 10^12 rows).
        d = col.cast("double")
        return F.sum(d * d).alias(name)
    if fn == "variance":
        return F.var_samp(col.cast("double")).alias(name)
    if fn == "stddev":
        return F.stddev_samp(col.cast("double")).alias(name)
    if fn == "hll":
        return F.approx_count_distinct(col).alias(name)
    return getattr(F, fn)(col).alias(name)


def _filter_sql(idx, q: str) -> str:
    """A query-facet ``q``: Solr fq grammar or SQL over doc fields."""
    from ..functions.solr_fq import looks_like_solr_fq, parse_fq

    if looks_like_solr_fq(q):
        return parse_fq(q, dict(idx.docs().dtypes))
    return q


def _split_subspecs(idx, sub: dict) -> tuple[list, dict, dict]:
    """A ``facet:{...}`` block -> (agg columns ridable on the parent's
    groupBy, nested terms specs, nested range specs). Stats and query
    subfacets become conditional aggregates (zero extra jobs)."""
    aggs, terms, ranges = [], {}, {}
    for name, s in sub.items():
        if isinstance(s, str):
            aggs.append((name, _stat_agg(idx, name, s)))
        elif isinstance(s, dict) and s.get("type") == "query":
            bad = set(s) - _QUERY_KEYS
            if bad or s.get("facet") or s.get("domain"):
                raise ValueError(
                    f"nested query facet {name!r}: only q supported, got "
                    f"{sorted(bad) or 'nested facet/domain'}"
                )
            aggs.append((
                name,
                F.count(F.when(F.expr(_filter_sql(idx, s["q"])), 1))
                .alias(name),
            ))
        elif isinstance(s, dict) and s.get("type") == "terms":
            terms[name] = s
        elif isinstance(s, dict) and s.get("type") == "range":
            bad = set(s) - _RANGE_KEYS
            if bad or s.get("facet") or s.get("domain"):
                raise ValueError(
                    f"nested range facet {name!r}: only field/start/end/gap "
                    f"supported, got {sorted(bad) or 'nested facet/domain'}"
                )
            ranges[name] = s
        else:
            raise ValueError(f"unsupported json.facet entry {name!r}: {s!r}")
    return aggs, terms, ranges


def _sort_key(sort, stat_names: list[str]):
    """Parse a terms-facet sort: 'count desc' (default) | 'index asc' |
    '<stat> desc' | {'<key>': 'asc'|'desc'}."""
    if sort is None:
        return "count", "desc"
    if isinstance(sort, dict):
        if len(sort) != 1:
            raise ValueError(f"json.facet sort takes one key, got {sort!r}")
        (k, d), = sort.items()
    else:
        parts = str(sort).split()
        k = parts[0]
        d = parts[1] if len(parts) > 1 else "desc"
    if d not in ("asc", "desc"):
        raise ValueError(f"json.facet sort direction must be asc|desc: {sort!r}")
    if k not in ("count", "index") and k not in stat_names:
        raise ValueError(f"json.facet sort key {k!r} is not a sibling stat")
    return k, d


def _terms_facet(
    idx, base: DataFrame, spec: dict, prefix: list[str],
    parents: DataFrame | None,
) -> dict[tuple, list[dict]]:
    """Evaluate one terms facet node. ``prefix`` = ancestor bucket fields;
    ``parents`` = surviving ancestor paths (semi-joined so deeper levels
    only aggregate buckets that made their parents' cut). Returns
    {parent path tuple -> bucket list} -- the caller stitches them into
    its own buckets. ONE aggregation job per node."""
    bad = set(spec) - _TERMS_KEYS
    if bad:
        raise ValueError(f"unsupported terms facet keys: {sorted(bad)}")
    if prefix and (spec.get("missing") or spec.get("allBuckets")
                   or spec.get("domain")):
        raise ValueError(
            "missing/allBuckets/domain on a NESTED terms facet are "
            "unsupported (top level only)"
        )
    field = spec["field"]
    limit = int(spec.get("limit", 10))
    offset = int(spec.get("offset", 0))
    mincount = int(spec.get("mincount", 1))
    sub = spec.get("facet", {}) or {}
    named = _split_subspecs(idx, sub)
    aggs = [c for _, c in named[0]]
    stat_names = [n for n, _ in named[0]]
    subterms, subranges = named[1], named[2]
    key, direction = _sort_key(spec.get("sort"), stat_names)

    lvl = base.filter(F.col(field).isNotNull())
    if parents is not None:
        lvl = lvl.join(F.broadcast(parents), prefix, "left_semi")
    lvl = lvl.groupBy(*prefix, field).agg(
        F.count("*").alias("count"), *aggs
    )
    if mincount > 0:
        lvl = lvl.filter(F.col("count") >= mincount)
    if key == "index":
        order = [F.col(field).asc() if direction == "asc"
                 else F.col(field).desc()]
    else:
        c = F.col(key)
        order = [c.desc() if direction == "desc" else c.asc(),
                 F.col(field).asc()]
    if not prefix:
        cut = lvl.orderBy(*order)
        if offset:
            cut = cut.offset(offset)
        if limit >= 0:
            cut = cut.limit(limit)
    else:
        from pyspark.sql.window import Window

        w = Window.partitionBy(*prefix).orderBy(*order)
        cut = lvl.withColumn("__r", F.row_number().over(w))
        lo, hi = offset, (offset + limit) if limit >= 0 else None
        cond = F.col("__r") > lo
        if hi is not None:
            cond = cond & (F.col("__r") <= hi)
        cut = cut.filter(cond).drop("__r")
    rows = cut.collect()

    # deterministic bucket order after collect (windows don't order
    # output). NULL stat values follow Spark's plan convention (nulls
    # first on asc, last on desc) so the re-sort agrees with the in-plan
    # cut; _Rev wraps any comparable type (min/max over strings included)
    def _okey(r):
        if key == "index":
            v = r[field]
            return (v,) if direction == "asc" else (_Rev(v),)
        v = r[key]
        if v is None:
            return ((0, 0, r[field]) if direction == "asc"
                    else (1, 0, r[field]))
        if direction == "asc":
            return (1, v, r[field])
        return (0, _Rev(v), r[field])

    grouped: dict[tuple, list] = {}
    for r in rows:
        grouped.setdefault(tuple(r[f] for f in prefix), []).append(r)
    for lst in grouped.values():
        lst.sort(key=_okey)

    # nested terms: one job per child node, parents = this node's survivors
    child_results: dict[str, dict[tuple, list[dict]]] = {}
    range_results: dict[str, dict[tuple, list[dict]]] = {}
    if (subterms or subranges) and rows:
        surv = idx.spark.createDataFrame(
            [[r[f] for f in prefix] + [r[field]] for r in rows],
            prefix + [field],
        )
        for cname, cspec in subterms.items():
            child_results[cname] = _terms_facet(
                idx, base, cspec, prefix + [field], surv
            )
        for cname, cspec in subranges.items():
            range_results[cname] = _range_facet_grouped(
                idx, base, cspec, prefix + [field], surv
            )

    out: dict[tuple, list[dict]] = {}
    for path, lst in grouped.items():
        buckets = []
        for r in lst:
            b: dict[str, Any] = {"val": r[field], "count": int(r["count"])}
            for sn in stat_names:
                b[sn] = _py(r[sn])
            for cname, cres in child_results.items():
                b[cname] = {
                    "buckets": cres.get(path + (r[field],), []),
                }
            for cname, cres in range_results.items():
                b[cname] = {
                    "buckets": cres.get(path + (r[field],), []),
                }
            buckets.append(b)
        out[path] = buckets
    return out


def _range_bucket_parts(idx, spec: dict):
    """Resolve a json.facet range spec for NUMERIC or DATE fields:
    returns ``(x, bucket_index_expr, labels, lo, hi)`` — the cast value
    column, a codegen long bucket-index expression, the per-bucket
    ``val`` labels (numbers, or ISO-8601 strings at the REAL calendar
    boundaries for date fields), and the [lo, hi) filter bounds.

    Date fields take ISO start/end (tz-naive = UTC) and DateMath gaps
    including variable-width +NMONTHS/+NYEARS (functions/datemath.py:
    boundaries stepped from the original start with per-boundary
    day-of-month clamping); bucket assignment stays one codegen
    expression over a literal boundary array. Buckets cover [start, end)
    (this engine's range convention — values past ``end`` never
    count)."""
    import datetime as _dt

    from ..functions.datemath import (
        month_bucket_starts,
        parse_gap,
        parse_instant,
    )

    field = spec["field"]
    is_date = dict(idx.docs().dtypes).get(field, "").startswith("timestamp")
    if not is_date:
        start, end, gap = (float(spec["start"]), float(spec["end"]),
                           float(spec["gap"]))
        if gap <= 0 or end <= start:
            raise ValueError("range facet needs gap > 0 and end > start")
        c = F.col(field)
        n_buckets = int(-(-(end - start) // gap))
        labels = []
        for i in range(n_buckets):
            lo = start + i * gap
            labels.append(int(lo) if float(lo).is_integer() else lo)
        return c, F.floor((c - start) / gap).cast("long"), labels, start, end
    start = parse_instant(spec["start"])
    end = parse_instant(spec["end"])
    kind, gap = parse_gap(spec["gap"])
    if end <= start:
        raise ValueError("range facet needs end > start")
    x = F.col(field).cast("double")
    if kind == "months":
        starts = month_bucket_starts(start, end, int(gap))[:-1]
    else:
        starts, b = [], start
        while b < end:
            starts.append(b)
            b += gap
    arr = F.array(*[F.lit(float(v)) for v in starts])
    bucket = (F.size(F.filter(arr, lambda bb: bb <= x)) - 1).cast("long")
    labels = [
        _dt.datetime.fromtimestamp(v, _dt.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ")
        for v in starts
    ]
    return x, bucket, labels, start, end


def _range_facet_grouped(
    idx, base: DataFrame, spec: dict, prefix: list[str],
    parents: DataFrame,
) -> dict[tuple, list[dict]]:
    """A range facet NESTED under a terms facet: ONE groupBy over
    (parent path, derived bucket) semi-joined to the surviving parents,
    zero buckets filled per parent driver-side (bounded: parents x
    n_buckets rows, a response-sized constant). Numeric or date fields
    (see :func:`_range_bucket_parts`)."""
    c, bucket, labels, start, end = _range_bucket_parts(idx, spec)
    rows = (
        base.join(F.broadcast(parents), prefix, "left_semi")
        .filter(c.isNotNull() & (c >= start) & (c < end))
        .groupBy(*prefix, bucket.alias("__b"))
        .agg(F.count("*").alias("count"))
        .collect()
    )
    got: dict[tuple, dict[int, int]] = {}
    for r in rows:
        got.setdefault(tuple(r[f] for f in prefix), {})[int(r["__b"])] = \
            int(r["count"])
    out: dict[tuple, list[dict]] = {}
    for p in [tuple(r[f] for f in prefix) for r in parents.collect()]:
        buckets = []
        for i, val in enumerate(labels):
            buckets.append(
                {"val": val, "count": got.get(p, {}).get(i, 0)}
            )
        out[p] = buckets
    return out


class _Rev:
    """Descending comparator wrapper for index-desc bucket sorts."""

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return other.v < self.v

    def __eq__(self, other):
        return self.v == other.v


def _py(v):
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return v


def _extras(idx, base, spec, field, aggs, stat_names) -> dict:
    """missing / allBuckets companion aggregates for one terms facet --
    one extra agg job each, over the domain (Solr computes them outside
    the bucket limit)."""
    out = {}
    if spec.get("missing"):
        row = base.filter(F.col(field).isNull()).agg(
            F.count("*").alias("count"), *aggs
        ).collect()[0]
        out["missing"] = {"count": int(row["count"]),
                          **{s: _py(row[s]) for s in stat_names}}
    if spec.get("allBuckets"):
        row = base.filter(F.col(field).isNotNull()).agg(
            F.count("*").alias("count"), *aggs
        ).collect()[0]
        out["allBuckets"] = {"count": int(row["count"]),
                             **{s: _py(row[s]) for s in stat_names}}
    return out


def _node_base(idx, q, fq, op, mm, spec, tagged_fq, default_base):
    """A facet node's domain. Default = the q+fq match set; ``domain``
    keys adjust it the Solr way:

    - ``excludeTags: [...]`` -- multi-select faceting: count the DocSet
      WITHOUT the tagged filters (each variant is its own filterCache
      entry).
    - ``filter: <fq> | [<fq>...]`` -- NARROW the domain with extra
      filters (Solr fq grammar; composes after excludeTags, each filter
      a cached DocSet semi/anti-join like any fq).
    - ``query: <fq> | [<fq>...]`` -- REPLACE the domain entirely: the
      node counts the docs matching these filters over the live corpus,
      ignoring the request's q/fq (Solr domain.query semantics). Mutually
      exclusive with excludeTags (Solr applies excludeTags to the
      request filters, which query discards -- combining them is a
      contradiction we fail loud on).

    - ``join: {from: F, to: T}`` -- MAP the domain through a
      same-collection join (Solr domain.join): the node's domain becomes
      every live doc whose T value appears among the F values of the
      current domain. Applied after excludeTags/query, before filter
      (Solr's documented order: filter narrows the JOINED domain).
      Distributed shape mirrors the {!join} qparser: distinct F keys
      (shuffle sized by the domain, never the corpus) -> LEFT SEMI join
      on T, AQE-broadcastable when the key set is small.

    - ``graph: {from: F, to: T, maxDepth?: N, returnRoot?: bool}`` --
      the TRANSITIVE closure of the join step (Solr domain.graph /
      {!graph} semantics: breadth-first edge walk): hop k+1 adds every
      live doc whose T value appears among the frontier's F values.
      ``maxDepth`` bounds the hops (-1 = until fixpoint, the Solr
      default); ``returnRoot`` keeps the starting domain in the result
      (default true, like Solr). Each round shuffles only the NEW key
      set (visited keys are anti-joined away, so cyclic graphs
      converge); frontiers are localCheckpoint-ed per round -- the same
      flat-lineage discipline as connected components, without which an
      iterative plan grows exponentially. One final semi join
      materializes the reached ids against the live docs.

    - ``blockChildren: "<parent filter>"`` / ``blockParent: "<parent
      filter>"`` -- block-join domain mapping (Solr ToChildren/ToParent
      domain changes). Block adaptation (same as the {!parent}/{!child}
      qparsers, BM25Index.block_join_parent): the corpus is a flattened
      block -- conv_id is the block key, turns are the children, parent
      docs are virtual -- so the parent-filter string is accepted (it
      names the parent set in a true nested index) but not interpreted.
      blockChildren expands the domain to EVERY live turn of the
      domain's blocks; blockParent collapses it to one block-head row
      per block (the block's lowest live doc_id -- each matching block
      counts once, field values read from the head turn). Shape: block
      keys = a domain-sized distinct + one semi join; heads = one
      partial-agg min per block key. Applied after excludeTags/query,
      before filter, exclusive with join/graph (one domain transform
      per node, like Solr).

    Unknown domain keys (refine/overrequest...) fail loud."""
    dom = spec.get("domain")
    if dom is None:
        return default_base
    bad = set(dom) - {"excludeTags", "filter", "query", "join", "graph",
                      "blockChildren", "blockParent"}
    if bad:
        raise ValueError(
            f"json.facet domain supports excludeTags/filter/query/join/"
            f"graph/blockChildren/blockParent, got {sorted(bad)}"
        )
    transforms = [k for k in ("join", "graph", "blockChildren",
                              "blockParent") if k in dom]
    if len(transforms) > 1:
        raise ValueError(
            f"json.facet domain transforms (join/graph/blockChildren/"
            f"blockParent) are exclusive, got {transforms}"
        )

    def _as_list(v):
        return list(v) if isinstance(v, (list, tuple)) else [v]

    if "query" in dom:
        if "excludeTags" in dom:
            raise ValueError(
                "domain.query replaces the domain; it cannot combine "
                "with excludeTags"
            )
        base = idx._facet_base("*:*", _as_list(dom["query"]), op, mm)
    elif "excludeTags" in dom:
        ex = frozenset(_as_list(dom["excludeTags"]))
        if tagged_fq is None:
            raise ValueError(
                "domain.excludeTags needs tagged fq filters ({!tag=..}) on "
                "the request"
            )
        kept = [f for tags, f in tagged_fq if not (tags & ex)]
        base = idx._facet_base(q, kept or None, op, mm)
    else:
        base = default_base
    if "join" in dom:
        j = dom["join"]
        if not isinstance(j, dict) or set(j) != {"from", "to"}:
            raise ValueError(
                "json.facet domain.join takes exactly {from: F, to: T}"
            )
        live = idx._anti_dead(idx.docs())
        missing = [c for c in (j["from"], j["to"]) if c not in live.columns]
        if missing:
            raise ValueError(
                f"json.facet domain.join: unknown fields {missing}"
            )
        from pyspark.sql import functions as F
        # renamed key: base and live share lineage (same docs relation),
        # a by-name reference would bind ambiguously in the self-join
        keys = (
            base.select(F.col(j["from"]).alias("__join_key"))
            .where(F.col("__join_key").isNotNull()).distinct()
        )
        base = live.join(
            keys, F.col(j["to"]) == F.col("__join_key"), "semi"
        )
    if "graph" in dom:
        base = _graph_domain(idx, base, dom["graph"])
    if "blockChildren" in dom or "blockParent" in dom:
        key = "blockChildren" if "blockChildren" in dom else "blockParent"
        if not isinstance(dom[key], str) or not dom[key].strip():
            raise ValueError(
                f"json.facet domain.{key} takes the parent-filter string"
            )
        from pyspark.sql import functions as F
        live = idx._anti_dead(idx.docs())
        # renamed key: base and live share lineage (see domain.join)
        keys = (
            base.select(F.col("conv_id").alias("__block_key"))
            .where(F.col("__block_key").isNotNull()).distinct()
        )
        if key == "blockChildren":
            base = live.join(
                keys, F.col("conv_id") == F.col("__block_key"), "semi"
            )
        else:
            heads = live.groupBy(
                F.col("conv_id").alias("__h_conv")
            ).agg(F.min("doc_id").alias("__h_doc"))
            base = (
                live.join(
                    heads,
                    (F.col("conv_id") == F.col("__h_conv"))
                    & (F.col("doc_id") == F.col("__h_doc")),
                    "semi",
                )
                .join(keys, F.col("conv_id") == F.col("__block_key"), "semi")
            )
    if "filter" in dom:
        for f in _as_list(dom["filter"]):
            base = idx._apply_fq(base, f)
    return base


_GRAPH_MAX_ROUNDS = 1000  # runaway backstop, far above any real depth


def _graph_domain(idx, base, g):
    """See ``_node_base``: breadth-first closure of the join step."""
    from pyspark.sql import functions as F

    if not isinstance(g, dict):
        raise ValueError("json.facet domain.graph takes an object")
    g = dict(g)
    try:
        frm, to = g.pop("from"), g.pop("to")
    except KeyError:
        raise ValueError("json.facet domain.graph needs from= and to=")
    max_depth = int(g.pop("maxDepth", -1))
    return_root = bool(g.pop("returnRoot", True))
    if g:
        raise ValueError(
            f"json.facet domain.graph: unsupported keys {sorted(g)} "
            f"(traversalFilter is not implemented)"
        )
    live = idx._anti_dead(idx.docs())
    missing = [c for c in (frm, to) if c not in live.columns]
    if missing:
        raise ValueError(f"json.facet domain.graph: unknown fields {missing}")

    frontier = base
    visited_keys = None   # __gk frames, accumulated
    reached_ids = None    # doc_id frames, accumulated
    depth = 0
    while max_depth < 0 or depth < max_depth:
        if depth >= _GRAPH_MAX_ROUNDS:
            raise RuntimeError(
                f"json.facet domain.graph did not converge within "
                f"{_GRAPH_MAX_ROUNDS} hops"
            )
        keys = (
            frontier.select(F.col(frm).alias("__gk"))
            .where(F.col("__gk").isNotNull()).distinct()
        )
        if visited_keys is not None:
            keys = keys.join(visited_keys, "__gk", "anti")
        keys = keys.localCheckpoint()  # flat lineage per round
        if keys.count() == 0:
            break
        visited_keys = (
            keys if visited_keys is None
            else visited_keys.unionByName(keys).localCheckpoint()
        )
        frontier = live.join(keys, F.col(to) == F.col("__gk"), "semi")
        ids = frontier.select("doc_id")
        reached_ids = (
            ids if reached_ids is None else reached_ids.unionByName(ids)
        )
        depth += 1

    root_ids = base.select("doc_id")
    if reached_ids is None:
        all_ids = root_ids if return_root else root_ids.limit(0)
    else:
        all_ids = (
            reached_ids.unionByName(root_ids) if return_root else reached_ids
        )
    return live.join(all_ids.distinct(), "doc_id", "semi")


def json_facet(
    idx, q: str, facets: dict,
    fq: str | list[str] | None = None,
    op: str = "OR", mm: int | str | None = None,
    tagged_fq: list | None = None,
) -> dict:
    """Evaluate a ``json.facet`` spec over the exact match set of
    (q, fq, op, mm). Returns Solr's JSON facet response shape under the
    usual ``facets`` key: ``{"count": <domain size>, ...}``.
    ``tagged_fq``: the request's (tags, filter) pairs, enabling per-facet
    ``domain: {excludeTags}`` multi-select domains."""
    base = idx._facet_base(q, fq, op, mm)
    out: dict[str, Any] = {"count": int(base.count())}

    # batch every top-level stat into ONE aggregation job
    stat_aggs, names = [], []
    for name, s in facets.items():
        if isinstance(s, str):
            stat_aggs.append(_stat_agg(idx, name, s))
            names.append(name)
    if stat_aggs:
        row = base.agg(*stat_aggs).collect()[0]
        for n in names:
            out[n] = _py(row[n])

    for name, s in facets.items():
        if isinstance(s, str):
            continue
        if not isinstance(s, dict):
            raise ValueError(f"unsupported json.facet entry {name!r}: {s!r}")
        t = s.get("type")
        if t == "terms":
            nb = _node_base(idx, q, fq, op, mm, s, tagged_fq, base)
            sub = s.get("facet", {}) or {}
            named, _, _ = _split_subspecs(idx, sub)
            aggs = [c for _, c in named]
            stat_names = [n for n, _ in named]
            res = _terms_facet(idx, nb, s, [], None)
            node: dict[str, Any] = {"buckets": res.get((), [])}
            node.update(_extras(idx, nb, s, s["field"], aggs, stat_names))
            out[name] = node
        elif t == "query":
            bad = set(s) - _QUERY_KEYS
            if bad:
                raise ValueError(f"unsupported query facet keys: {sorted(bad)}")
            dom = _node_base(idx, q, fq, op, mm, s, tagged_fq, base).filter(
                F.expr(_filter_sql(idx, s["q"]))
            )
            sub = s.get("facet", {}) or {}
            named, subterms, subranges = _split_subspecs(idx, sub)
            if subterms or subranges:
                raise ValueError(
                    "bucket facets nested under a query facet are unsupported"
                )
            aggs = [c for _, c in named]
            stat_names = [n for n, _ in named]
            row = dom.agg(F.count("*").alias("count"), *aggs).collect()[0]
            out[name] = {"count": int(row["count"]),
                         **{sn: _py(row[sn]) for sn in stat_names}}
        elif t == "range":
            bad = set(s) - _RANGE_KEYS
            if bad:
                raise ValueError(f"unsupported range facet keys: {sorted(bad)}")
            sub = s.get("facet", {}) or {}
            named, subterms, subranges = _split_subspecs(idx, sub)
            if subterms or subranges:
                raise ValueError(
                    "bucket facets nested under a range facet are unsupported"
                )
            aggs = [c for _, c in named]
            stat_names = [n for n, _ in named]
            c, bucket, labels, start, end = _range_bucket_parts(idx, s)
            rows = (
                _node_base(idx, q, fq, op, mm, s, tagged_fq, base)
                .filter(c.isNotNull() & (c >= start) & (c < end))
                .groupBy(bucket.alias("__b"))
                .agg(F.count("*").alias("count"), *aggs)
                .collect()
            )
            got = {int(r["__b"]): r for r in rows}
            buckets = []
            for i, val in enumerate(labels):
                r = got.get(i)
                b = {"val": val, "count": int(r["count"]) if r else 0}
                if r is not None:
                    for sn in stat_names:
                        b[sn] = _py(r[sn])
                buckets.append(b)
            out[name] = {"buckets": buckets}
        elif t == "heatmap":
            # {type: heatmap, field, [gridLevel | distErr], [geom]} --
            # the json.facet twin of classic facet.heatmap: same RPT grid
            # counts over the main query's exact DocSet
            # (engine.facet_heatmap), same response keys. Domain
            # modifiers are classic-heatmap-unsupported too: fail loud.
            from .select_api import _parse_heatmap_geom

            bad = set(s) - {"type", "field", "gridLevel", "distErr", "geom"}
            if bad:
                raise ValueError(
                    f"unsupported heatmap facet keys: {sorted(bad)}")
            if "field" not in s:
                raise ValueError("heatmap facet needs field")
            out[name] = idx.facet_heatmap(
                q,
                s["field"],
                grid_level=(int(s["gridLevel"])
                            if "gridLevel" in s else None),
                dist_err=(float(s["distErr"]) if "distErr" in s else None),
                geom=_parse_heatmap_geom(s.get("geom")),
                fq=fq, op=op, mm=mm,
            )
        else:
            raise ValueError(
                f"unsupported json.facet type {t!r} for {name!r} "
                f"(terms|query|range|stat string)"
            )
    return out
