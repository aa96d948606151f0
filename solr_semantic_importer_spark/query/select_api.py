"""Solr ``/select`` facade: param dict in, Solr JSON response shape out.

The reference talks to Solr exclusively through ``/select`` param maps —
``HttpSolrSelectClientImpl.java createSolrRequest`` builds
``q=*:*&wt=json&start=N*size&rows=size`` plus one ``fq`` per configured
filter, and consumes the JSON shape in ``solr9_response.json``
(``responseHeader``/``response.numFound``/``response.docs``). This module
lets a reference user keep that exact interface against the PySpark
engine: :func:`solr_select` maps the supported param surface onto
``BM25Index`` calls and returns the same response dict shape;
:func:`select_pages` reproduces the importer's pagination loop
(``SolrSemanticIndexer``: page until ``start`` passes ``numFound``).

Supported params (everything the reference sends, plus the query-side
components its solrconfig enables):

- ``q`` (default ``*:*``), ``q.op`` (``OR``/``AND``); per-clause Lucene
  boosts (``spark^2 window``) parsed from ``q``; a q that is exactly one
  quoted phrase (``"a b"``, sloppy ``"a b"~2``) runs as a Lucene
  Phrase/SloppyPhraseQuery; Lucene occur operators ``+clause`` (MUST) /
  ``-clause`` (MUST_NOT) on term AND phrase clauses run as a
  BooleanQuery (every MUST, no MUST_NOT, >= minShouldMatch SHOULDs; a
  pure-negative q follows Solr's ``*:* -clauses`` rewrite). numFound,
  facets, sorts and cursors all operate on the structured DocSet;
  grouping and debugQuery fail loud on structured q
- ``mm`` — minimum-should-match for OR queries (int or ``'NN%'``,
  percentage of the clause count rounded down, the mm spec's rule)
- ``defType`` (``lucene`` default / ``edismax``) with ``pf``/``pf2``/
  ``pf3`` + ``ps``/``ps2``/``ps3`` — edismax phrase boosting: each phrase
  window (full query / bigrams / trigrams) scores as an extra SHOULD
  phrase clause, so ranking moves while the DocSet (numFound, facets)
  never does — appended to the boolean scorer under the default
  ``q.op=OR``; routed as rank-only boost queries (``bq``) under
  ``q.op=AND`` / ``mm``, where a q-appended clause would become required
  or inflate the mm clause count (Solr's phrase boosts sit outside the
  main query's op/mm). Single-field engine, each pf names the ``_text_``
  catch-all (optionally boosted); also honored by /export
- ``fq`` — one string or a list (Solr sends one param per filter); Solr
  filter syntax or SQL, per `functions/solr_fq.py`
- ``start``/``rows`` (Solr defaults 0/10)
- ``fl`` — comma-separated stored-field list; ``*`` = every stored field;
  ``score`` is returned only when requested (Solr semantics); default =
  all stored fields; an entry may be a FUNCTION pseudo-field
  (``fl=dist:geodist(loc,10,-20)`` or a bare function) computed for the
  page's docs in one isin-pruned job, or the ``[explain]`` doc
  transformer (per-doc BM25 breakdown whose total equals the score
  exactly)
- ``sort`` — ``score desc`` (default) or comma-separated ``<field>
  asc|desc`` terms, Solr's multi-field syntax (match-all scans sort the
  live filtered table; scored queries sort the full match set, Solr's
  field-sort-over-DocSet behavior; sort fields need not be in ``fl``);
  an entry may be a FUNCTION QUERY (``sort=recip(ms(ts),1,1,1) desc`` —
  Solr sorts by any ValueSource; `functions/function_query.py` grammar)
- ``bf`` (repeatable, additive) / ``boost`` (multiplicative) /
  ``bq`` (repeatable boost QUERIES whose BM25 score adds to matching
  docs) — Solr boosting: final score = ``score * boost + sum(bf) +
  sum(bq score)``; requires the relevance sort, fails loud otherwise
- ``fq={!frange l=.. u=.. incl=.. incu=..}func`` — Solr's function-range
  filter qparser; the DocSet is filter-cached under the original string
- ``facet=true&facet.field=F`` (repeatable) → ``facet_counts.facet_fields``
  as Solr's flat ``[val, count, val, count, ...]`` arrays; bucket params
  ``facet.limit`` (default 100, -1 unlimited) / ``facet.offset`` /
  ``facet.mincount`` / ``facet.sort`` (count|index) / ``facet.prefix`` /
  ``facet.contains`` (+ ``facet.contains.ignoreCase``) /
  ``facet.missing`` honored globally or per-field via ``f.<field>.facet.X``;
  ``facet.query`` (repeatable, fq grammar) → ``facet_counts.facet_queries``;
  ``facet.range.other`` (before|after|between|all|none) adds the
  out-of-range counts to each ``facet_ranges`` entry; ``facet.pivot=f1,f2``
  (repeatable) → ``facet_counts.facet_pivot`` nested trees
  (``facet.pivot.mincount`` default 1, ``facet.limit`` per level)
- ``json.facet`` (dict or JSON string) — the JSON Facet API subset
  (terms/query/range facets, nested stats and subfacets; see
  `query/json_facet.py`) → the Solr ``facets`` response key
- ``fq={!collapse field=F}`` + ``expand=true``/``expand.rows`` — the
  collapse qparser (result set = each group's best doc, numFound = group
  count, grouped segment kernels) and ExpandComponent (``expanded``
  section with each page group's other members)
- ``hl=true`` (``hl.fragsize``/``hl.snippets``/``hl.tag.pre|post`` aka
  ``hl.simple.pre|post``, ``hl.q`` (highlight a different query's terms),
  ``hl.maxAnalyzedChars`` (cap analyzed prefix), ``hl.fl`` (this engine
  stores ONE highlightable field -- ``text`` or ``*`` accepted, others
  fail loud) honored; snippets > 1 returns up to that many
  non-overlapping fragments) → ``highlighting`` map keyed by doc id
- ``spellcheck=true&spellcheck.q=words...`` → per-token
  ``spellcheck.suggestions`` (flat [token, {...}] list) +
  ``correctlySpelled``; the reference /spell handler's full param set is
  honored (solrconfig.xml:738-758): ``spellcheck.count``,
  ``spellcheck.extendedResults`` (word/freq dicts + origFreq vs plain
  word lists), ``spellcheck.alternativeTermCount`` (suggestions for
  in-index terms), ``spellcheck.maxResultsForSuggest``,
  ``spellcheck.dictionary=default,wordbreak`` (WordBreakSolrSpellChecker:
  breakWords + combineWords), ``spellcheck.collate`` +
  ``spellcheck.maxCollations``/``maxCollationTries`` (rank-ordered
  candidate collations, hit-verified under op/fq/mm when tries > 0) /
  ``collateExtendedResults``
- ``facet.interval=F`` + ``f.F.facet.interval.set=[a,b]`` (repeatable;
  ``[a,b]``/``(a,b)``/``*`` bounds) — interval facets, all sets counted in
  ONE conditional-aggregate job → ``facet_counts.facet_intervals``
- ``elevateIds``/``excludeIds`` — QueryElevationComponent: elevated docs
  lead the page in the given order (marked ``[elevated]: true``, score 0
  when they don't match), excluded docs drop (exclude wins on overlap);
  numFound adjusts for elevated non-matches and excluded matches
- ``tv=true`` (+ ``tv.positions``/``tv.df``/``tv.tf_idf``) —
  TermVectorComponent: per page doc, term → tf[, positions][, df][,
  tf-idf] under ``termVectors`` (vectors re-derived with the index's
  analysis chain; df from one pruned dictionary scan)
- ``minExactCount`` (Solr 8.6+) — numFound for scored score-sorted
  requests is exact up to this many hits, a lower bound beyond it
  (``numFoundExact: false``), computed from the SAME top-k pass as the
  page instead of a second postings decode; omit for Solr's exact default
- ``rq={!rerank reRankQuery=$rqq reRankDocs=N reRankWeight=W}`` — the
  ReRank qparser: the main query's top-N window is rescored as
  ``score + W x reRankQuery score`` (docs outside the window, and window
  docs the rerank query misses, keep their original score; O(window)
  rerank cost, the reRankDocs contract)
- ``cursorMark`` (Solr deep paging) — ``*`` starts a cursor; the response
  carries ``nextCursorMark``; an unchanged mark means exhaustion. Requires
  ``start=0``; serves the canonical sort (score-keyed token) AND plain
  stored-field sorts, scored or match-all (field-value keyset token —
  the predicate filters before the top-k, so every page is O(page), no
  offset re-rank; function/mixed-score sorts fail loud).
  :func:`select_cursor_pages` is the bulk-export loop

The facade is the DRIVER-SIDE rim of the engine: every listed param maps
onto the distributed paths (WAND kernels, filter cache, docid-pushdown
stored fetch); only the ≤``rows`` result page is ever collected.
"""

from __future__ import annotations

import base64
import datetime
import heapq
import json
import re
import time
from typing import Any, Iterator

from pyspark.sql import functions as F

from ..functions.datemath import month_bucket_starts, parse_gap, parse_instant
from ..functions.function_query import looks_like_function
from .engine import (
    BM25Index,
    CURSOR_START,
    decode_cursor_mark,
    encode_cursor_mark,
)

__all__ = ["solr_select", "select_pages", "select_cursor_pages",
           "solr_export", "solr_get", "solr_suggest"]

_RESERVED = {"q", "q.op", "fq", "start", "rows", "fl", "sort", "facet",
             "NOW",  # Solr NOW request param (epoch millis): pins DateMath
             "facet.field", "facet.range", "facet.query", "facet.pivot",
             "facet.pivot.mincount", "json.facet", "expand", "expand.rows",
             "tv", "tv.positions", "tv.df", "tv.tf_idf", "hl",
             "hl.fragsize", "hl.snippets", "hl.tag.pre", "hl.tag.post",
             "hl.simple.pre", "hl.simple.post", "hl.q", "hl.fl",
             "hl.maxAnalyzedChars", "spellcheck",
             "spellcheck.q", "spellcheck.collate", "spellcheck.count",
             "spellcheck.extendedResults", "spellcheck.alternativeTermCount",
             "spellcheck.maxResultsForSuggest", "spellcheck.dictionary",
             "spellcheck.collateExtendedResults", "spellcheck.maxCollations",
             "spellcheck.maxCollationTries", "defType", "pf", "pf2", "pf3",
             "ps", "ps2", "ps3", "wt", "indent",
             "useParams", "minExactCount", "omitHeader", "echoParams",
             "cursorMark", "mm", "debugQuery", "bf", "bq", "boost",
             "elevateIds", "excludeIds", "facet.interval", "rq", "rqq",
             "group", "group.field", "group.limit", "group.ngroups",
             "group.sort", "group.func", "group.query", "group.format",
             "group.main",
             "stats", "stats.field",
             "mlt", "mlt.fl", "mlt.count", "mlt.mintf", "mlt.mindf",
             "mlt.maxqt", "mlt.boost", "mlt.interestingTerms",
             "facet.heatmap", "facet.heatmap.geom", "facet.heatmap.gridLevel",
             "facet.heatmap.distErr", "facet.heatmap.format", "qf", "tie",
             # performance HINTS (public Solr params that steer its
             # internal algorithm choice without changing result
             # semantics): accepted and echoed, Catalyst owns the actual
             # strategy. timeAllowed is best-effort in Solr -- always
             # returning the complete result is a conforming superset.
             "facet.method", "facet.threads", "facet.enum.cache.minDf",
             "timeAllowed"}

# facet.range.{start,end,gap} and the facet.field bucket params
# (limit/offset/mincount/sort/prefix/missing), globally or per-field
# (Solr's f.<field>. prefix override convention)
_FACET_RANGE_RE = re.compile(
    r"^(?:f\.[^.]+\.)?facet\.range\.(start|end|gap|other|include|hardend)$"
)
_FACET_PARAM_RE = re.compile(
    r"^(?:f\.[^.]+\.)?facet\.(limit|offset|mincount|sort|prefix|missing|contains(?:\.ignoreCase)?)$"
)
_FACET_INTERVAL_RE = re.compile(
    r"^(?:facet\.interval|f\.[^.]+\.facet\.interval\.set)$"
)

# Solr multi-select faceting: fq may be tagged ({!tag=a,b}<filter>) and a
# facet.field entry may exclude tagged filters ({!ex=a[,b]}field, optional
# key= rename) -- the facet then counts the DocSet WITHOUT those filters
# while docs/numFound keep them (the canonical faceted-navigation pattern)
_TAG_RE = re.compile(r"^\{!tag=([\w,]+)\}(.*)$", re.S)
_EX_RE = re.compile(r"^\{!ex=([\w,]+)(?:\s+key=(\w+))?\}(.+)$")
_KEY_RE = re.compile(r"^\{!key=(\w+)\}(.+)$")  # rename without exclusion


def _split_tagged_fq(raw: list) -> list[tuple[frozenset, Any]]:
    """fq entries -> (tags, filter) pairs. Only the plain-tag prefix form
    ``{!tag=x}<filter>`` is recognized (a tag inside another qparser's
    local params is unsupported -- fail loud there, not silently wrong)."""
    out = []
    for f in raw:
        m = _TAG_RE.match(str(f).strip()) if isinstance(f, str) else None
        if m is not None:
            rest = m.group(2).strip()
            if rest.startswith("{!"):
                raise ValueError(
                    f"{{!tag=}} cannot wrap another qparser: {f!r} "
                    f"(tag plain filters only)"
                )
            out.append((frozenset(m.group(1).split(",")), rest))
        else:
            out.append((frozenset(), f))
    return out


def _as_list(v) -> list:
    if v is None:
        return []
    return list(v) if isinstance(v, (list, tuple)) else [v]


def _truthy(v) -> bool:
    return str(v).lower() in ("true", "on", "1")


_HEATMAP_GEOM_RE = re.compile(
    r'^\[\s*"?\s*(-?[\d.]+)\s+(-?[\d.]+)\s*"?\s+TO\s+'
    r'"?\s*(-?[\d.]+)\s+(-?[\d.]+)\s*"?\s*\]$'
)


def _parse_heatmap_geom(v) -> tuple[float, float, float, float] | None:
    """Solr facet.heatmap.geom syntax: ``["minX minY" TO "maxX maxY"]``
    (X = longitude first, per Solr's spatial rectangle grammar). Returns
    (minLon, minLat, maxLon, maxLat) or None for the world default."""
    if v is None:
        return None
    m = _HEATMAP_GEOM_RE.match(str(v).strip())
    if m is None:
        raise ValueError(
            f'facet.heatmap.geom: expected ["minX minY" TO "maxX maxY"], '
            f"got {v!r}"
        )
    return (float(m.group(1)), float(m.group(2)),
            float(m.group(3)), float(m.group(4)))


def _num(v: float):
    """Render integral floats as ints (Solr range facets echo the field's
    numeric type; the synthetic corpus uses integer fields)."""
    return int(v) if float(v).is_integer() else v


def _split_sort(sort: str) -> list[str]:
    """Split a Solr sort spec on commas OUTSIDE parentheses -- function
    sorts (``recip(ms(ts),1,1,1) desc``) carry commas of their own."""
    parts, depth, cur = [], 0, []
    for ch in sort:
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        depth += ch == "("
        depth -= ch == ")"
        cur.append(ch)
    parts.append("".join(cur))
    return parts


# Solr's schema ships `random_*` as a dynamic RandomSortField: the seed
# lives in the field name, so `sort=random_1234 asc` is a stable shuffle
_RANDOM_SORT_RE = re.compile(r"random_\w+")


def _parse_sort(sort: str) -> list[tuple[str, str]]:
    """Solr sort spec -> [(field-or-function, 'asc'|'desc'), ...].
    Multi-entry sorts are comma-separated, Solr's syntax; each entry is a
    field name or a function query (``sort=sum(turn_idx,1) desc`` -- Solr
    sorts by any ValueSource); malformed entries raise."""
    out = []
    for part in _split_sort(sort):
        p = " ".join(part.split())
        f, _, d = p.rpartition(" ")
        if not f or d not in ("asc", "desc"):
            raise ValueError(
                f"unsupported sort: {sort!r} (use '<field> asc|desc'"
                f"[, '<field> asc|desc' ...])"
            )
        out.append((f, d))
    return out


def _sort_cols(df, sort_spec: list[tuple[str, str]], idx=None) -> list:
    """Spark sort columns for a parsed sort spec over ``df``; 'score'
    sorts on the canonical round-6 key; a function entry compiles to one
    codegen'd expression (``idx.function_expr``) over the frame."""
    cols = []
    for f, d in sort_spec:
        if f == "score":
            c = F.round(F.col("score"), 6)
        elif _RANDOM_SORT_RE.fullmatch(f):
            # Solr RandomSortField (dynamic field random_*): a stable
            # pseudo-random order keyed by the seed in the field name --
            # same md5(doc_id:seed) convention as the random() stream
            # source, deterministic across pages and executors
            c = F.md5(F.concat_ws(
                ":", F.col("doc_id").cast("string"), F.lit(f)))
        elif looks_like_function(f):
            c = F.expr(idx.function_expr(f)[0])
        else:
            c = df[f]
        cols.append(c.desc() if d == "desc" else c.asc())
    return cols


def _sort_fields(sort_spec: list[tuple[str, str]], idx) -> list[str]:
    """Doc fields a parsed sort spec reads (function entries expand to the
    fields their expression uses) -- drives the stored-side projection."""
    need: list[str] = []
    for f, _ in sort_spec:
        if _RANDOM_SORT_RE.fullmatch(f):
            continue  # keyed on doc_id, always present
        if looks_like_function(f):
            need.extend(idx.function_expr(f)[1])
        elif f not in ("score", "doc_id"):
            need.append(f)
    return list(dict.fromkeys(need))


# --- field-sort cursorMark (Solr CursorMarkParams over arbitrary sorts) ------
#
# Solr cursors work with ANY sort ending in the uniqueKey tiebreaker: the
# token embeds the last row's SORT VALUES, and the next page filters
# "after (values, doc_id)" under the sort order -- keyset pagination, never
# an offset re-rank. The engine's canonical cursor (engine.py) covers the
# relevance sort; these helpers cover plain stored-field sorts (functions
# and mixed score sorts fail loud -- their values are not stored, so a
# stateless token cannot restate them).


def encode_field_cursor(values: list, doc_id: int, sort: str) -> str:
    """Token = {v: [sort values], d: doc_id, k: normalized sort} -- the
    sort travels with the token so a page requested under a DIFFERENT sort
    fails loud instead of silently mis-paging (Solr couples cursorMark to
    the sort the same way)."""
    def enc(v):
        if isinstance(v, datetime.datetime):
            return {"t": "ts", "v": v.isoformat(sep=" ")}
        if isinstance(v, datetime.date):  # date.isoformat takes no sep
            return {"t": "ts", "v": v.isoformat()}
        if v is None or isinstance(v, (bool, int, float, str)):
            return v
        raise ValueError(
            f"cursorMark requires atomic sort values, got {type(v).__name__}"
        )
    payload = json.dumps({"v": [enc(v) for v in values],
                          "d": int(doc_id), "k": sort})
    return base64.urlsafe_b64encode(payload.encode()).decode()


def decode_field_cursor(
    token: str | None, sort: str
) -> tuple[list, int] | None:
    """'*'/None -> first page; otherwise (values, doc_id). Values come
    back JSON-typed (timestamps as strings) -- the predicate builder casts
    them to the column type, so lossless round-trip."""
    if token is None or token == CURSOR_START:
        return None
    try:
        p = json.loads(base64.urlsafe_b64decode(token.encode()).decode())
        vals, d, k = list(p["v"]), int(p["d"]), str(p["k"])
    except (ValueError, TypeError, KeyError) as e:
        raise ValueError(f"unable to parse cursorMark: {token!r}") from e
    if k != sort:
        raise ValueError(
            f"cursorMark was created for sort {k!r}; this request sorts "
            f"{sort!r}"
        )
    return [v["v"] if isinstance(v, dict) else v for v in vals], d


def _field_cursor_predicate(df, sort_spec, values, doc_id):
    """Keyset predicate 'row sorts strictly after (values, doc_id)' under
    ``sort_spec`` + doc_id tiebreak, with Spark/Solr null placement
    (asc = nulls first, desc = nulls last): the lexicographic OR-chain
    (k1 after v1) OR (k1 = v1 AND k2 after v2) OR ... OR (all = AND
    doc_id > d). One codegen'd boolean over the scan -- no state, no
    offset."""
    if len(values) != len(sort_spec):
        raise ValueError(
            f"cursorMark carries {len(values)} sort values for "
            f"{len(sort_spec)} sort fields"
        )

    def typed(fld, v):
        return F.lit(v).cast(df.schema[fld].dataType)

    pred = None
    eq_chain = F.lit(True)
    for (fld, d), v in zip(sort_spec, values):
        c = df[fld]
        if d == "asc":  # nulls first: everything non-null is after null
            after = c.isNotNull() if v is None else (c > typed(fld, v))
        else:  # nulls last: null is after every value; nothing after null
            after = F.lit(False) if v is None else (
                c.isNull() | (c < typed(fld, v)))
        pred = (eq_chain & after) if pred is None else (
            pred | (eq_chain & after))
        eq_chain = eq_chain & (
            c.isNull() if v is None else c.eqNullSafe(typed(fld, v)))
    return pred | (eq_chain & (df["doc_id"] > int(doc_id)))


def _field_cursor_ok(sort_spec, idx) -> bool:
    """A sort a field cursor can serve: plain atomic stored columns."""
    types = dict(idx.docs().dtypes)
    for f, _ in sort_spec:
        if f == "score" or looks_like_function(f):
            return False
        t = types.get(f)
        if t is None or t.startswith(("array", "struct", "map")):
            return False
    return True


_PF_FIELD_RE = re.compile(r"^([A-Za-z_]\w*)(?:\^(\d+(?:\.\d+)?))?$")
_PLAIN_TERMS_Q_RE = re.compile(r'^[^"+:*?~^]+$')


def _validate_edismax(params: dict) -> None:
    """defType gate: ``lucene`` (default) or ``edismax``; the pf/ps family
    is edismax-only and each ps requires its pf (Solr param coherence,
    checked up-front so every dispatch path fails loud, not just the main
    one)."""
    dt = str(params.get("defType", "lucene"))
    if dt not in ("lucene", "edismax"):
        raise ValueError(f"unsupported defType: {dt!r}")
    present = [p for p in ("pf", "pf2", "pf3", "ps", "ps2", "ps3",
                           "qf", "tie") if p in params]
    if present and dt != "edismax":
        raise ValueError(f"{present} require defType=edismax")
    if "tie" in params and "qf" not in params:
        raise ValueError("tie requires qf (the DisMax field list)")
    for sp, pp in (("ps", "pf"), ("ps2", "pf2"), ("ps3", "pf3")):
        if sp in params and pp not in params:
            raise ValueError(f"{sp} requires {pp}")


def _edismax_phrase_clauses(q: str, params: dict) -> list[str]:
    """edismax phrase boosting (pf/pf2/pf3 + ps/ps2/ps3): build the phrase
    clause for each window (the full query for pf, consecutive bigrams for
    pf2, trigrams for pf3) carrying the pf field's ``^boost`` -- exactly
    the SHOULD phrase queries Lucene's ExtendedDismaxQParser builds on top
    of the main query. ps slops the pf phrase; ps2/ps3 default to ps
    (Solr). The caller decides how to attach them (see ``_apply_edismax``)
    so the DocSet (numFound, facets, filters) never changes and only
    ranking moves.

    Single-field engine subset (the schema's ``df=_text_`` catch-all is
    the only indexed field): each pf entry must name it (``_text_`` or its
    stored source ``text``), one field per param -- multi-field pf lists
    fail loud, as does a non-plain q (quotes / occur prefixes / field
    clauses / wildcards / boosts), where Solr's interaction rules need
    per-field indexes this engine deliberately doesn't have."""
    if not any(p in params for p in ("pf", "pf2", "pf3")):
        return []
    if q.strip() == "*:*":
        return []  # no terms to phrase: pf is a no-op on match-all
    if not _PLAIN_TERMS_Q_RE.match(q) or re.search(r"(^|\s)-", q):
        raise ValueError(
            "pf/pf2/pf3 require a plain term query (no quotes, occur "
            f"prefixes, field clauses, wildcards or boosts): {q!r}"
        )
    words = q.split()
    clauses: list[str] = []
    for pfp, psp, n in (("pf", "ps", len(words)), ("pf2", "ps2", 2),
                        ("pf3", "ps3", 3)):
        if pfp not in params or len(words) < max(n, 2):
            continue
        raw = str(params[pfp]).strip()
        m = _PF_FIELD_RE.match(raw)
        if m is None:
            raise ValueError(
                f"{pfp} supports exactly one field of the single-field "
                f"engine, optionally boosted: {raw!r}"
            )
        fld, boost = m.group(1), m.group(2)
        if fld not in ("_text_", "text"):
            raise ValueError(
                f"{pfp} must name the indexed catch-all field "
                f"(_text_ or text), got {fld!r}"
            )
        slop = int(params.get(psp, params.get("ps", 0)))
        for i in range(len(words) - n + 1):
            ph = '"' + " ".join(words[i:i + n]) + '"'
            if slop:
                ph += f"~{slop}"
            if boost:
                ph += f"^{boost}"
            clauses.append(ph)
    return clauses


def _apply_edismax(
    q: str, params: dict, op: str, mm,
) -> tuple[str, list[str]]:
    """Attach the edismax pf phrases so the DocSet is ALWAYS the main
    query's. Under the default ``q.op=OR`` with no ``mm``, appending the
    phrases as extra SHOULD clauses on the boolean scorer is score- and
    DocSet-identical to Solr's optional phrase clauses (a phrase can only
    match docs its terms already match), so they ride the plain q string
    and every path (cursorMark, field sorts, /export) works unchanged.
    Under ``q.op=AND`` or ``mm``, a clause appended to q would become
    REQUIRED / would inflate the mm clause count -- Solr's phrase boosts
    sit OUTSIDE the main query's op/mm, so they route as boost queries
    (``bq``: score adds on matching docs, match set untouched) instead.
    The bq route is ALSO taken when the request asks for an explain
    (debugQuery / fl=[explain]): the boosted-component pipeline keeps
    each bq's contribution as its own column, so the breakdown folds to
    the response score bit-exactly — where a pf-rewritten q embeds
    phrase clauses the per-term explain kernels cannot decompose (r5:
    closes the last explain fail-loud). Returns ``(q, extra_bq)``;
    exactly one of the two carries the phrases."""
    if str(params.get("defType", "lucene")) != "edismax":
        return q, []
    phrases = _edismax_phrase_clauses(q, params)
    if not phrases:
        return q, []
    want_explain = (
        _truthy(params.get("debugQuery", False))
        or "[explain]" in str(params.get("fl", ""))
    )
    if op == "AND" or mm is not None or want_explain:
        return q, phrases
    return q + " " + " ".join(phrases), []


# qf dispatch: params the multi-field DisMax path implements. Anything
# else in the request raises (the facade's fail-loud contract -- a facet
# or cursorMark silently dropped would misreport the response).
_QF_ALLOWED = {"q", "qf", "tie", "q.op", "mm", "fq", "start", "rows", "fl",
               "sort", "defType", "wt", "indent", "omitHeader", "echoParams",
               "useParams", "pf", "pf2", "pf3", "ps", "ps2", "ps3"}


def _qf_select(idx, params: dict[str, Any], t0: float) -> dict[str, Any]:
    """``qf=`` requests: edismax DisMax over a per-field index family
    (:class:`.multifield.MultiFieldIndex`). Single-field handles fail loud
    -- their only indexed field is the ``_text_`` catch-all, so a qf list
    has no per-field postings to score."""
    from .multifield import MultiFieldIndex

    if not isinstance(idx, MultiFieldIndex):
        raise ValueError(
            "qf requires a multi-field index family (build with "
            "build_multi_field_index); this handle indexes only the "
            "_text_ catch-all"
        )
    extra = sorted(set(params) - _QF_ALLOWED)
    if extra:
        raise ValueError(
            f"params not supported with qf (multi-field DisMax path): {extra}"
        )
    sort = " ".join(str(params.get("sort", "score desc")).split())
    if sort != "score desc":
        raise ValueError("qf supports only the relevance sort (score desc)")
    q = str(params.get("q", "*:*"))
    if q.strip() == "*:*":
        raise ValueError("qf needs a term query (use the plain path for *:*)")
    op = str(params.get("q.op", "OR")).upper()
    mm = params.get("mm")
    tie = float(params.get("tie", 0.0))
    fq = _as_list(params.get("fq")) or None
    start = int(params.get("start", 0))
    rows = int(params.get("rows", 10))
    fl = params.get("fl")
    fl = [f.strip() for f in str(fl).split(",")] if isinstance(fl, str) else fl
    if fl:
        bad = [f for f in fl if f != "score"
               and (":" in f or f.startswith("[") or looks_like_function(f))]
        if bad:
            raise ValueError(f"qf fl supports plain stored fields: {bad}")
    want_score = bool(fl) and "score" in fl
    fetch_fl = None if (not fl or "*" in fl) else (
        [f for f in fl if f != "score"] or None)
    qf, kw = params["qf"], dict(tie=tie, op=op, mm=mm, fq=fq)
    # pf phrase boosts rerank within the main match set (search side only;
    # numFound is pf-independent -- Lucene's optional phrase clauses can't
    # match a doc the main query misses)
    pf_kw = {p: params[p] for p in ("pf", "pf2", "pf3") if p in params}
    for sp in ("ps", "ps2", "ps3"):
        if sp in params:
            pf_kw[sp] = int(params[sp])
    num_found = idx.count_matches(q, qf, **kw)
    df = idx.search(q, qf, k=rows, offset=start, with_stored=True,
                    fl=fetch_fl, **kw, **pf_kw)
    docs = []
    for r in df.collect():
        d = r.asDict()
        if not want_score:
            d.pop("score", None)  # Solr: score only when fl asks for it
        docs.append(d)
    return {
        "responseHeader": {
            "status": 0,
            "QTime": int((time.monotonic() - t0) * 1000),
            "params": {k: params[k] for k in sorted(params, key=str)},
        },
        "response": {
            "numFound": num_found,
            "start": start,
            "numFoundExact": True,
            "docs": docs,
        },
    }


_CHILD_FL_RE = re.compile(r"^\[child(?:\s+([^\]]*))?\]$")


def _parse_child_fl(opts: str | None) -> dict:
    """``fl=[child limit=N childFilter=<fq>]`` options. Unknown options
    fail loud (the facade contract). Solr's default limit is 10."""
    out = {"limit": 10, "childFilter": None}
    for part in (opts or "").split():
        k, eq, v = part.partition("=")
        if not eq or k not in ("limit", "childFilter"):
            raise ValueError(
                f"[child] supports limit=/childFilter=, got {part!r}"
            )
        out[k] = int(v) if k == "limit" else v.strip("'\"")
    if out["limit"] < 1:
        raise ValueError("[child] limit must be >= 1")
    return out


def _child_docs(idx, page_ids: list[int], opt: dict) -> dict[int, list]:
    """The ``[child]`` transformer under the flattened-block adaptation
    (conv_id = block key, turns = children, parents virtual -- the
    {!parent}/{!child} qparser convention): each page doc's children are
    the OTHER live turns of its block, turn order, capped at ``limit``;
    ``childFilter`` narrows them with the Solr fq grammar.

    Plan: the page side (<= rows ids) broadcasts against ONE live docs
    scan keyed on conv_id; a per-page-doc row_number window bounds the
    output at page x limit rows before collect -- block size never
    reaches the driver."""
    from pyspark.sql.window import Window

    live = idx._anti_dead(idx.docs())
    page = live.filter(F.col("doc_id").isin(page_ids)).select(
        F.col("doc_id").alias("__pid"), F.col("conv_id").alias("__pconv")
    )
    kids = live.join(
        F.broadcast(page),
        (F.col("conv_id") == F.col("__pconv"))
        & (F.col("doc_id") != F.col("__pid")),
    )
    if opt["childFilter"]:
        kids = idx._apply_fq(kids, opt["childFilter"])
    w = Window.partitionBy("__pid").orderBy("turn_idx", "doc_id")
    kids = (
        kids.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(opt["limit"]))
        .drop("__rn", "__pconv")
    )
    out: dict[int, list] = {}
    for r in kids.collect():
        d = r.asDict()
        pid = d.pop("__pid")
        out.setdefault(int(pid), []).append(d)
    for v in out.values():
        v.sort(key=lambda d: (d.get("turn_idx"), d.get("doc_id")))
    return out


def _boosted_explain(idx, q: str, page_ids: list[int], *, bf, boost, bq,
                     op: str, fq, mm, comps=None) -> list[dict]:
    """debugQuery/fl=[explain] under bf/bq/boost: each page doc's exact
    score components (:meth:`BM25Index.explain_boosted` -- the ranking
    pipeline itself, so ``base*boost + Σbf + Σbq == score`` bit-exactly),
    plus the per-term lexical breakdown of ``base`` when q is a flat term
    query. For ``*:*`` or phrase/boolean-structured q the base stays a
    single exact leaf (``details`` None) -- the per-term kernels can't
    decompose those, but the component values still sum to the response
    score."""
    if comps is None:
        comps = idx.explain_boosted(q, page_ids, bf=bf, boost=boost,
                                    bq=bq, op=op, fq=fq, mm=mm)
    details = _lexical_details(idx, q, page_ids)
    for c in comps:
        c["details"] = (
            None if details is None
            else sorted(details.get(c["doc_id"], []),
                        key=lambda d: -d["contribution"])
        )
    return comps


def _lexical_details(idx, q: str, page_ids: list[int]) -> dict | None:
    """Per-term BM25 rows (idx.explain) for the page's docs, keyed by
    doc_id -- or None when q has no per-term decomposition (``*:*`` or
    phrase/boolean-structured)."""
    if q.strip() == "*:*":
        return None
    try:
        details: dict[int, list] = {}
        for r in idx.explain(q, page_ids).collect():
            details.setdefault(int(r["doc_id"]), []).append({
                "term": r["term"], "tf": r["tf"], "dl": r["dl"],
                "weight": r["weight"],
                "contribution": r["contribution"],
            })
        return details
    except ValueError:
        return None  # structured q: base stays a single exact leaf


def _rerank_explain(idx, q: str, page_ids: list[int],
                    comps: dict[int, dict]) -> list[dict]:
    """debugQuery entries under ``rq={!rerank}``: each page doc's exact
    base/rerank decomposition (search_reranked's own driver arithmetic,
    so ``base + rerank == score`` bit-exactly) plus the per-term lexical
    breakdown of ``base`` when q is a flat term query."""
    details = _lexical_details(idx, q, page_ids)
    out = []
    for did in page_ids:
        c = comps[did]
        out.append({
            "doc_id": did,
            "score": c["base"] + c["rerank"],
            "base": c["base"],
            "rerank": c["rerank"],
            "in_window": c["in_window"],
            "details": (
                None if details is None
                else sorted(details.get(did, []),
                            key=lambda d: -d["contribution"])
            ),
        })
    return out


def _ltr_explain(idx, q: str, page_ids: list[int],
                 comps: dict[int, dict]) -> list[dict]:
    """debugQuery entries under ``rq={!ltr}``: window docs carry the
    model's contribution breakdown (per-feature for LinearModel, per-tree
    for trees; in-order sum == the REPLACED score bit-exactly -- LTR
    rescoring replaces, it does not add) plus the raw feature vector;
    tail docs keep their original BM25 score. The per-term lexical
    breakdown of the original score rides along for flat term queries."""
    details = _lexical_details(idx, q, page_ids)
    out = []
    for did in page_ids:
        c = comps[did]
        e = {
            "doc_id": did,
            "in_window": c["in_window"],
            "base": c["base"],
            "details": (
                None if details is None
                else sorted(details.get(did, []),
                            key=lambda d: -d["contribution"])
            ),
        }
        if c["in_window"]:
            s = None
            for _, v in c["model"]:
                s = v if s is None else s + v
            e["score"] = 0.0 if s is None else s
            e["model"] = list(c["model"])
            e["features"] = dict(c["features"])
        else:
            e["score"] = c["base"]
        out.append(e)
    return out


def _render_ltr_explain(c: dict, model_name: str) -> str:
    """Lucene-style text tree for one :func:`_ltr_explain` entry."""
    if not c["in_window"]:
        lines = [f"{c['score']} = original score "
                 f"(outside reRankDocs window, model {model_name} "
                 f"not applied)"]
        if c.get("details"):
            for d in c["details"]:
                lines.append(
                    f"  {d['contribution']} = weight(_text_:{d['term']}) "
                    f"[tf={d['tf']}, dl={d['dl']}, weight={d['weight']}]")
        return "\n".join(lines)
    lines = [f"{c['score']} = LTRModel({model_name}), sum of:"]
    for lbl, v in c["model"]:
        lines.append(f"  {v} = {lbl}")
    fv = ", ".join(f"{k}={v:g}" for k, v in c["features"].items())
    lines.append(f"  features: {fv}")
    lines.append(f"  (replaces original score {c['base']})")
    return "\n".join(lines)


def _render_rerank_explain(c: dict, rqq: str, weight: float) -> str:
    """Lucene-style text tree for one :func:`_rerank_explain` entry."""
    lines = [f"{c['score']} = sum of:"]
    if c.get("details"):
        lines.append(f"  {c['base']} = main query, sum of:")
        for d in c["details"]:
            lines.append(
                f"    {d['contribution']} = weight(_text_:{d['term']}) "
                f"[tf={d['tf']}, dl={d['dl']}, weight={d['weight']}]")
    else:
        lines.append(f"  {c['base']} = main query")
    if c["in_window"]:
        lines.append(
            f"  {c['rerank']} = reRankWeight {weight} x "
            f"reRankQuery({rqq})")
    else:
        lines.append("  0.0 = outside reRankDocs window (not rescored)")
    return "\n".join(lines)


def _render_boosted_explain(c: dict, *, bf, boost, bq) -> str:
    """Lucene-style text tree for one :func:`_boosted_explain` entry (the
    fl=[explain] transformer's string form). Every displayed number is the
    exact double the ranking computed; the top line's value is the doc's
    reported score."""
    bfs = [bf] if isinstance(bf, str) else list(bf or [])
    bqs = [bq] if isinstance(bq, str) else list(bq or [])
    base_lines = []
    if c.get("details"):
        base_lines.append(f"{c['base']} = main query, sum of:")
        for d in c["details"]:
            base_lines.append(
                f"  {d['contribution']} = weight(_text_:{d['term']}) "
                f"[tf={d['tf']}, dl={d['dl']}, weight={d['weight']}]")
    else:
        base_lines.append(f"{c['base']} = main query")
    lines = [f"{c['score']} = sum of:"]
    if "boost" in c:
        lines.append(f"  {c['base'] * c['boost']} = product of:")
        lines += ["    " + ln for ln in base_lines]
        lines.append(f"    {c['boost']} = FunctionQuery({boost})")
    else:
        lines += ["  " + ln for ln in base_lines]
    for v, src in zip(c["bf"], bfs):
        lines.append(f"  {v} = FunctionQuery({src})")
    for v, src in zip(c["bq"], bqs):
        lines.append(f"  {v} = bq({src})")
    return "\n".join(lines)


def solr_select(
    idx: BM25Index, params: dict[str, Any], *,
    known_num_found: int | None = None,
    known_num_found_exact: bool = True,
) -> dict[str, Any]:
    """Execute one ``/select`` request against a :class:`BM25Index`. See
    module docstring for the param surface; unknown params raise (the
    caller finds out their filter is unsupported instead of silently
    getting unfiltered results).

    ``known_num_found`` (keyword-only, not a Solr param): a numFound the
    caller already holds for THIS query/fq/op/mm -- used by
    :func:`select_cursor_pages` so a cursor walk counts the match set once
    on page 1 instead of paying a full postings decode per page (the cost
    the cursor exists to avoid)."""
    unknown = {
        p for p in set(params) - _RESERVED
        if not (_FACET_RANGE_RE.match(p) or _FACET_PARAM_RE.match(p)
                or _FACET_INTERVAL_RE.match(p))
    }
    if unknown:
        raise ValueError(f"unsupported /select params: {sorted(unknown)}")
    fm = params.get("facet.method")
    if fm is not None and str(fm) not in ("enum", "fc", "fcs", "uif"):
        raise ValueError(
            f"facet.method must be enum|fc|fcs|uif, got {fm!r}")
    _validate_edismax(params)
    t0 = time.monotonic()
    if "qf" in params:
        return _qf_select(idx, params, t0)
    params = _rewrite_knn_fq(idx, params)
    if _truthy(params.get("group", False)):
        return _grouped_select(idx, params, t0)
    all_fq = _as_list(params.get("fq"))
    coll = [f for f in all_fq if _COLLAPSE_RE.match(str(f))]
    if coll:
        if len(coll) > 1:
            raise ValueError("at most one {!collapse} fq is supported")
        return _collapse_select(
            idx, params, t0, str(coll[0]),
            [f for f in all_fq if not _COLLAPSE_RE.match(str(f))],
        )
    if _truthy(params.get("expand", False)):
        raise ValueError("expand=true requires an {!collapse} fq")
    bj = _BJ_Q_RE.match(str(params.get("q", "")).strip())
    if bj is not None:
        return _block_join_select(idx, params, t0, bj)
    knn_m = _KNN_Q_RE.match(str(params.get("q", "")).strip())
    if knn_m is not None:
        return _knn_select(idx, params, t0, knn_m)
    q = str(params.get("q", "*:*"))
    op = str(params.get("q.op", "OR")).upper()
    mm = params.get("mm")
    # q_main: the phrase-free query. Its DocSet equals the rewritten q's
    # by construction, so pure COUNT/facet work runs on it and never pays
    # the appended phrases' positional decodes.
    q_main = q
    q, pf_bq = _apply_edismax(q, params, op, mm)
    fq_tagged = _split_tagged_fq(_as_list(params.get("fq")))
    fq = [f for _, f in fq_tagged] or None

    def _fq_excluding(ex_tags: frozenset):
        """The fq list without filters carrying any excluded tag -- the
        multi-select facet domain (each variant is its own filterCache
        entry, so repeated requests pay nothing extra)."""
        kept = [f for tags, f in fq_tagged if not (tags & ex_tags)]
        return kept or None
    start = int(params.get("start", 0))
    rows = int(params.get("rows", 10))
    fl = params.get("fl")
    # paren-aware split: function pseudo-fields carry commas
    fl = [f.strip() for f in _split_sort(fl)] if isinstance(fl, str) else fl
    # Solr fl renames: `alias:field` displays `field` under `alias`;
    # fetch by the source name, rename in the response docs below
    renames: dict[str, str] = {}
    func_fl: dict[str, str] = {}  # alias -> function query (Solr fl=f:func())
    want_explain = False  # fl=[explain] doc transformer
    want_features = False  # fl=[features] (LTR feature-vector transformer)
    child_opt = None      # fl=[child ...] (block-sibling transformer)
    extra_transformers: set[str] = set()  # [docid] / [shard]
    if fl:
        norm = []
        for f in fl:
            if f == "[explain]":
                want_explain = True
                continue
            if f == "[features]":
                want_features = True
                continue
            cm = _CHILD_FL_RE.match(f)
            if cm is not None:
                child_opt = _parse_child_fl(cm.group(1))
                continue
            if f in ("[docid]", "[shard]"):
                # [docid]: Lucene's internal doc id -- HERE it coincides
                # with the uniqueKey by construction (stable (conv_id,
                # turn_idx) assignment IS the internal id). [shard]: the
                # single-collection engine serves every doc itself; the
                # index handle's data dir is the shard identifier.
                extra_transformers.add(f)
                continue
            if "*" in f and f != "*" and not f.startswith("["):
                # Solr fl field globs (fl=conv_*): expand against the
                # stored schema; a glob matching nothing contributes no
                # columns (Solr's behavior -- an empty expansion is a
                # valid result, not an unsupported param)
                import fnmatch

                norm.extend(c for c in idx.docs().columns
                            if fnmatch.fnmatchcase(c, f))
                continue
            if ":" in f:
                alias, src = f.split(":", 1)
                if looks_like_function(src):
                    func_fl[alias] = src
                    continue  # computed below, never a stored fetch
                renames[src] = alias
                norm.append(src)
            elif looks_like_function(f):
                func_fl[f] = f  # Solr: bare function keys under itself
                continue
            else:
                norm.append(f)
        if not [f for f in norm if f != "score"]:
            # an EXPLICIT fl that expanded to no stored columns — pseudo
            # fields only, fl=score alone, or an all-glob miss (fl=zzz_*)
            # — fetches by id alone. Never fall through to the fl-unset
            # every-field path: Solr returns no stored fields for a glob
            # that matches nothing (r5 ADVICE fix).
            norm.append("doc_id")
        fl = norm
    want_score = bool(fl) and "score" in fl
    if fl and "*" in fl:
        fetch_fl = None  # Solr fl=* : every stored field (score iff asked)
    else:
        fetch_fl = [f for f in (fl or []) if f != "score"] or None
    sort = " ".join(str(params.get("sort", "score desc")).split())
    # sort_spec is None only for the relevance sort; 'doc_id asc' keeps a
    # spec so the SCORED dispatch (which special-cases only 'score desc')
    # can serve it through the field-sort branch (match-all still takes
    # its dedicated doc-id path below)
    sort_spec = None if sort == "score desc" else _parse_sort(sort)

    match_all = q.strip() == "*:*"
    mec = params.get("minExactCount")
    cursor = params.get("cursorMark")
    def _ids(name):
        v = params.get(name)
        if v is None:
            return []
        parts = v if isinstance(v, (list, tuple)) else str(v).split(",")
        return [int(x) for x in parts if str(x).strip()]

    elevate, exclude = _ids("elevateIds"), _ids("excludeIds")
    exclude_set = set(exclude)
    elevate = [i for i in elevate if i not in exclude_set]  # exclude wins
    bf = _as_list(params.get("bf")) or None
    bq = _as_list(params.get("bq")) or None
    if pf_bq:
        # pf under q.op=AND / mm / explain rides the bq machinery
        # (rank-only score add), so it inherits bq's dispatch
        # constraints -- fail with a pf-specific message rather than a
        # confusing bq one
        if sort != "score desc":
            raise ValueError(
                "pf with q.op=AND, mm or explain requires "
                "sort='score desc'"
            )
        if cursor is not None:
            raise ValueError(
                "pf with q.op=AND, mm or explain does not support "
                "cursorMark"
            )
        bq = (bq or []) + pf_bq
    boost = params.get("boost")
    rerank_ctx = None  # (components, rqq, weight) when {!rerank} explains
    ltr_ctx = None     # (components, model name) when {!ltr} explains
    boosted_ctx = None  # components when bf/bq/boost explains (one job)
    _expl_entries: list = []  # memo shared by fl=[explain] and debugQuery

    def _explain_entries(pids: list[int]) -> list[dict]:
        """The page's explain entries, computed ONCE per request even
        when debugQuery and fl=[explain] are both set (each entry costs
        real Spark jobs: the component pipeline + the lexical kernel)."""
        if not _expl_entries:
            if rerank_ctx is not None:
                _expl_entries.append(
                    _rerank_explain(idx, q, pids, rerank_ctx[0]))
            elif ltr_ctx is not None:
                _expl_entries.append(_ltr_explain(idx, q, pids, ltr_ctx[0]))
            else:
                _expl_entries.append(_boosted_explain(
                    idx, q, pids, bf=bf, boost=boost, bq=bq,
                    op=op, fq=fq, mm=mm, comps=boosted_ctx))
        return _expl_entries[0]

    if isinstance(boost, (list, tuple)):
        raise ValueError("boost: pass one function (multiple unsupported)")
    if bf or boost or bq:
        # function boosting re-ranks by score, so it composes with the
        # relevance sort only; other orderings would silently report
        # un-boosted scores -- fail loud (facade contract)
        if sort != "score desc":
            raise ValueError("bf/bq/boost require sort='score desc'")
        if cursor is not None:
            raise ValueError("bf/bq/boost do not support cursorMark")
    if ((_truthy(params.get("debugQuery", False)) or want_explain)
            and q != q_main):
        # bf/bq/boost, {!rerank} and {!ltr} explains route through exact
        # component breakdowns (engine.explain_boosted / the rerankers'
        # return_components); a pf-rewritten q embeds phrase clauses the
        # per-term kernels can't decompose -- that still fails loud,
        # never explains wrong
        raise ValueError(
            "debugQuery/fl=[explain] do not compose with pf-in-q"
        )
    if elevate or exclude:
        if (match_all or sort != "score desc" or start != 0
                or cursor is not None or bf or bq or boost
                or mec is not None):
            raise ValueError(
                "elevateIds/excludeIds require a scored q with the "
                "relevance sort at start=0 (no cursor/boost/minExactCount)"
            )
    if cursor is not None:
        # Solr CursorMarkParams contract: cursors start at start=0 and the
        # sort must end in the uniqueKey tiebreaker (doc_id, appended
        # implicitly on every path here). Served sorts: the canonical
        # relevance/doc-id sorts (engine.py score-keyed token) and plain
        # stored-field sorts (field-value keyset token); function sorts
        # and mixed score sorts have no stored values to restate.
        if start != 0:
            raise ValueError("cursorMark requires start=0 (Solr CursorMarkParams)")
        if sort not in ("score desc", "doc_id asc") and not (
                sort_spec is not None and _field_cursor_ok(sort_spec, idx)):
            raise ValueError(
                f"cursorMark requires the canonical sort or a plain "
                f"stored-field sort, got {sort!r}"
            )
    num_found: int
    num_found_exact = True

    # numFound strategy per path (Solr: every response carries it):
    # - match-all: live-doc count under fq -- metadata-cheap, always exact
    #   (the importer's pagination loop depends on it).
    # - scored + score sort, no minExactCount: Solr's default is an EXACT
    #   total, which costs a full postings decode on top of the top-k pass
    #   (Lucene's collector counts every hit too).
    # - scored + score sort + minExactCount=N (Solr 8.6+ param): fetch the
    #   top max(N, start+rows) once; if fewer came back the count is exact,
    #   otherwise report that lower bound with numFoundExact=false. The
    #   result-cache window makes the page fetch below a driver-side replay
    #   of the SAME pass -- numFound costs zero extra postings decodes,
    #   which at 10^12 turns halves the per-request work.
    # - scored + field sort: the full match set is materialized for the
    #   sort anyway; count THAT instead of decoding postings a second time.
    if known_num_found is not None:
        num_found = int(known_num_found)
        num_found_exact = bool(known_num_found_exact)  # page-1 verdict carries
    elif match_all:
        num_found = idx.count_matches(q, op=op, fq=fq, mm=mm)
    elif (sort == "score desc" and mec is not None
          and not (bf or boost or bq)
          and max(int(mec), start + rows) <= idx.QUERY_RESULT_MAX_DOCS):
        w = max(int(mec), start + rows)
        n_head = idx.search(q, k=w, op=op, fq=fq, mm=mm).count()
        num_found = n_head
        num_found_exact = n_head < w
    elif sort == "score desc":
        # no minExactCount, or a threshold past the result-cache window
        # (where the cheap lower bound can't be taken from the top-k pass):
        # Solr's exact default; q_main — counting never decodes positions
        num_found = idx.count_matches(q_main, op=op, fq=fq, mm=mm)
    else:
        num_found = -1  # filled from the field-sort match set below

    next_cursor: str | None = None
    rq = params.get("rq")
    feat_map: dict | None = None
    if rq is not None and re.match(r"^\{!ltr[\s}]", str(rq).strip()):
        m = re.match(r"^\{!ltr\s+([^}]*)\}\s*$", str(rq).strip())
        if m is None:
            raise ValueError(f"cannot parse rq: {rq!r} (use {{!ltr ...}})")
        lp = dict(_BJ_LP_RE.findall(m.group(1)))
        bad = {p for p in lp if p not in ("model", "reRankDocs")
               and not p.startswith("efi.")}
        if bad or "model" not in lp:
            raise ValueError(
                f"{{!ltr}} needs model= (+ reRankDocs/efi.*), got {sorted(lp)}"
            )
        if (match_all or sort != "score desc" or cursor is not None
                or bf or bq or boost or elevate or exclude):
            raise ValueError(
                "rq={!ltr} requires a scored q with the relevance sort "
                "(no cursor/boost/elevation)"
            )
        store = getattr(idx, "ltr_models", {})
        mname = lp["model"].strip("'\"")
        if mname not in store:
            raise ValueError(
                f"unknown LTR model {mname!r} (registered: {sorted(store)}; "
                "use functions.ltr.register_ltr_model)"
            )
        efi = {p: str(v).strip("'\"") for p, v in lp.items()
               if p.startswith("efi.")}
        want_comps = _truthy(params.get("debugQuery", False)) or want_explain
        res = idx.search_ltr(
            q, store[mname], k=rows,
            rerank_docs=int(lp.get("reRankDocs", 200)),
            efi=efi, op=op, fq=fq, mm=mm, offset=start,
            with_stored=True, fl=fetch_fl, return_features=True,
            return_components=want_comps,
        )
        if want_comps:
            df, feat_map, ltr_comps = res
            ltr_ctx = (ltr_comps, mname)
        else:
            df, feat_map = res
        rows_out = [r.asDict() for r in df.collect()]
    elif rq is not None:
        m = re.match(r"^\{!rerank\s+([^}]*)\}\s*$", str(rq).strip())
        if m is None:
            raise ValueError(
                f"cannot parse rq: {rq!r} (use {{!rerank ...}} or {{!ltr ...}})"
            )
        lp = dict(_BJ_LP_RE.findall(m.group(1)))
        bad = set(lp) - {"reRankQuery", "reRankDocs", "reRankWeight"}
        if bad or "reRankQuery" not in lp:
            raise ValueError(
                f"{{!rerank}} needs reRankQuery (+ reRankDocs/reRankWeight), "
                f"got {sorted(lp)}"
            )
        rqq = lp["reRankQuery"].strip("'\"")
        if rqq.startswith("$"):  # Solr param dereference ($rqq convention)
            ref = params.get(rqq[1:])
            if ref is None:
                raise ValueError(f"rq references missing param {rqq!r}")
            rqq = str(ref)
        if (match_all or sort != "score desc" or cursor is not None
                or bf or bq or boost or elevate or exclude):
            raise ValueError(
                "rq={!rerank} requires a scored q with the relevance sort "
                "(no cursor/boost/elevation)"
            )
        w = float(lp.get("reRankWeight", 2.0))
        if w < 0:
            raise ValueError(
                "reRankWeight must be >= 0 (negative weights break the "
                "window-above-tail rescore invariant)"
            )
        want_comps = _truthy(params.get("debugQuery", False)) or want_explain
        res = idx.search_reranked(
            q, rqq, k=rows,
            rerank_docs=int(lp.get("reRankDocs", 200)),
            rerank_weight=w,
            op=op, fq=fq, mm=mm, offset=start,
            with_stored=True, fl=fetch_fl,
            return_components=want_comps,
        )
        if want_comps:
            df, rr_comps = res
            rerank_ctx = (rr_comps, rqq, w)
        else:
            df = res
        rows_out = [r.asDict() for r in df.collect()]
    elif (bf or boost or bq) and (match_all or sort == "score desc"):
        if _truthy(params.get("debugQuery", False)) or want_explain:
            # one evaluation feeds BOTH the page and its breakdown: the
            # components frame is persisted in-engine, so the explain can
            # never disagree with the returned scores (and the debug
            # request pays one scoring job, not two)
            rows_out, boosted_ctx = idx.search_boosted_with_components(
                q, k=rows, bf=bf, boost=boost, bq=bq, op=op, fq=fq,
                mm=mm, offset=start, fl=fetch_fl,
            )
        else:
            df = idx.search_boosted(
                q, k=rows, bf=bf, boost=boost, bq=bq, op=op, fq=fq,
                offset=start, mm=mm, with_stored=True, fl=fetch_fl,
            )
            rows_out = [r.asDict() for r in df.collect()]
    elif match_all:
        sort_need: list[str] = []
        if cursor is not None and sort in ("score desc", "doc_id asc"):
            after = decode_cursor_mark(cursor)
            page = idx.match_all(
                k=rows, fq=fq, after_doc=after[1] if after else None
            )
        elif sort in ("score desc", "doc_id asc"):
            page = idx.match_all(k=rows, fq=fq, offset=start)
        else:
            # field sort (possibly multi-field, Solr comma syntax) over the
            # live filtered scan (TakeOrderedAndProject: the orderBy+limit
            # never materializes a full sort). A cursor page restates the
            # keyset predicate instead of paying offset re-ranks.
            live = idx._anti_dead(idx._apply_fq(idx.docs(), fq))
            if cursor is not None:
                sort_need = _sort_fields(sort_spec, idx)
                fafter = decode_field_cursor(cursor, sort)
                if fafter is not None:
                    live = live.filter(_field_cursor_predicate(
                        live, sort_spec, *fafter))
            ordered = live.orderBy(
                *_sort_cols(live, sort_spec, idx), "doc_id"
            ).select("doc_id", F.lit(1.0).alias("score"), *sort_need)
            page = (ordered.limit(rows) if cursor is not None
                    else ordered.offset(start).limit(rows) if start
                    else ordered.limit(rows))
        # the page is <= rows rows: take its order driver-side, then fetch
        # stored fields by doc_id (docid-pushdown scan) and re-order to it
        page_rows = page.collect()
        order = [r["doc_id"] for r in page_rows]
        scores = {r["doc_id"]: r["score"] for r in page_rows}
        fetched = {
            r["doc_id"]: r.asDict()
            for r in idx._stored_side(fetch_fl)
            .filter(F.col("doc_id").isin(order) if order else F.lit(False))
            .collect()
        }
        rows_out = [
            {**fetched.get(i, {"doc_id": i}), "score": scores[i]} for i in order
        ]
        if cursor is not None:
            if not order:
                next_cursor = cursor  # exhausted: Solr's unchanged-mark stop
            elif sort in ("score desc", "doc_id asc"):
                next_cursor = encode_cursor_mark(1.0, int(order[-1]))
            else:
                last = page_rows[-1]
                next_cursor = encode_field_cursor(
                    [last[f] for f in (f0 for f0, _ in sort_spec)],
                    int(order[-1]), sort)
    elif sort == "score desc":
        if cursor is not None:
            page_rows, next_cursor = idx.search_cursor(
                q, k=rows, cursor=cursor, op=op, fq=fq, mm=mm,
                with_stored=True, fl=fetch_fl,
            )
            rows_out = [r.asDict() for r in page_rows]
        elif elevate or exclude:
            # QueryElevationComponent: excluded docs drop, elevated docs
            # lead the page in the given order with [elevated]: true
            # (Solr's fl=[elevated] marker). Overfetch covers the removed
            # slots; membership/score lookups are isin-pruned small jobs.
            esc = {
                r["doc_id"]: r["score"]
                for r in idx.score_matches(q, op=op, fq=fq, mm=mm)
                .filter(F.col("doc_id").isin(elevate)).collect()
            } if elevate else {}
            efetched = {
                r["doc_id"]: r.asDict()
                for r in idx._stored_side(fetch_fl)
                .filter(F.col("doc_id").isin(elevate)).collect()
            } if elevate else {}
            # Solr QueryElevationComponent drops unknown ids -- never
            # fabricate a phantom document for an id the corpus lacks
            elevate = [i for i in elevate if i in efetched]
            over = rows + len(elevate) + len(exclude)
            df = idx.search(q, k=over, op=op, fq=fq, mm=mm,
                            with_stored=True, fl=fetch_fl)
            eset, xset = set(elevate), set(exclude)
            rest = [
                r.asDict() for r in df.collect()
                if r["doc_id"] not in eset and r["doc_id"] not in xset
            ][: max(0, rows - len(elevate))]
            elev_docs = []
            for i in elevate:
                d = dict(efetched.get(i, {"doc_id": i}))
                # Solr elevates docs even when they don't match q (score 0)
                d["score"] = float(esc.get(i, 0.0))
                d["[elevated]"] = True
                elev_docs.append(d)
            rows_out = (elev_docs + rest)[:rows]
            # numFound: elevated non-matches add, excluded matches drop
            num_found += sum(1 for i in elevate if i not in esc)
            if exclude:
                num_found -= (
                    idx._matched_ids(q, op=op, fq=fq, mm=mm)
                    .filter(F.col("doc_id").isin(list(xset))).count()
                )
        else:
            df = idx.search(
                q, k=rows, op=op, fq=fq, offset=start, mm=mm,
                with_stored=True, fl=fetch_fl,
            )
            rows_out = [r.asDict() for r in df.collect()]
    else:
        # Solr field sort (possibly multi-field) over a scored query: the
        # MATCH SET ordered by the fields (scores still reported when fl
        # asks). Plan: pruned postings decode -> scored match set (+fq,
        # tombstones) -> join stored -> TakeOrderedAndProject. Sort fields
        # need not be in fl (Solr sorts on docValues): they join in for
        # the sort and are dropped from the response below.
        matched = idx.score_matches(q, op=op, fq=fq, mm=mm)
        if num_found < 0:
            num_found = matched.count()  # the sort needs every match anyway
        need = _sort_fields(sort_spec, idx)
        side_fl = (
            None if fetch_fl is None
            else list(dict.fromkeys(fetch_fl + need))
        )
        joined = matched.join(idx._stored_side(side_fl), "doc_id")
        if cursor is not None:
            # keyset page over the scored match set: the cursor predicate
            # filters BEFORE the TakeOrderedAndProject, so each page emits
            # `rows` rows -- never an offset prefix re-rank
            fafter = decode_field_cursor(cursor, sort)
            if fafter is not None:
                joined = joined.filter(_field_cursor_predicate(
                    joined, sort_spec, *fafter))
        ordered = joined.orderBy(*_sort_cols(joined, sort_spec, idx), "doc_id")
        page = (ordered.limit(rows) if cursor is not None
                else ordered.offset(start).limit(rows) if start
                else ordered.limit(rows))
        keep = None if fetch_fl is None else set(fetch_fl) | {"doc_id", "score"}
        raw_rows = [r.asDict() for r in page.collect()]
        rows_out = [
            {k: v for k, v in r.items() if keep is None or k in keep}
            for r in raw_rows
        ]
        if cursor is not None:
            if not raw_rows:
                next_cursor = cursor  # exhausted: Solr's unchanged-mark stop
            else:
                last = raw_rows[-1]
                next_cursor = encode_field_cursor(
                    [last[f] for f, _ in sort_spec],
                    int(last["doc_id"]), sort)

    if want_features and feat_map is None:
        raise ValueError("fl=[features] requires rq={!ltr ...} (the LTR "
                         "feature-vector transformer)")

    expl: dict[int, str] = {}
    if want_explain and rows_out:
        # fl=[explain] doc transformer: the per-term BM25 breakdown for
        # the page's docs, formatted Lucene-style (sum of contributions =
        # the doc's score exactly). Structured/match-all q fail loud in
        # idx.explain, matching debugQuery's contract; under bf/bq/boost
        # the breakdown nests the exact components instead.
        page_ids = [x["doc_id"] for x in rows_out]
        if rerank_ctx is not None:
            for c in _explain_entries(page_ids):
                expl[c["doc_id"]] = _render_rerank_explain(
                    c, rerank_ctx[1], rerank_ctx[2])
        elif ltr_ctx is not None:
            for c in _explain_entries(page_ids):
                expl[c["doc_id"]] = _render_ltr_explain(c, ltr_ctx[1])
        elif bf or bq or boost:
            for c in _explain_entries(page_ids):
                expl[c["doc_id"]] = _render_boosted_explain(
                    c, bf=bf, boost=boost, bq=bq)
        elif match_all:
            raise ValueError("fl=[explain] needs a scored q (not *:*)")
        else:
            by_doc: dict[int, list] = {}
            for r in idx.explain(q, page_ids).collect():
                by_doc.setdefault(r["doc_id"], []).append(r)
            for i, terms_ in by_doc.items():
                terms_.sort(key=lambda r: -r["contribution"])
                total = sum(r["contribution"] for r in terms_)
                lines = [f"{total} = sum of:"]
                for r in terms_:
                    lines.append(
                        f"  {r['contribution']} = weight(_text_:{r['term']}) "
                        f"[tf={r['tf']}, dl={r['dl']}, weight={r['weight']}]"
                    )
                expl[i] = "\n".join(lines)

    child_map: dict[int, list] = {}
    if child_opt is not None and rows_out:
        child_map = _child_docs(
            idx, [int(r["doc_id"]) for r in rows_out], child_opt)

    fvals: dict[int, dict] = {}
    if func_fl and rows_out:
        # fl function pseudo-fields: ONE isin-pruned job computes every
        # requested function for the page's <= rows ids
        fsel = idx.docs().filter(
            F.col("doc_id").isin([r["doc_id"] for r in rows_out])
        ).select(
            "doc_id",
            *[F.expr(idx.function_expr(srcf)[0]).alias(alias)
              for alias, srcf in func_fl.items()],
        )
        fvals = {r["doc_id"]: r.asDict() for r in fsel.collect()}

    docs = []
    for r in rows_out:
        d = dict(r)
        if not want_score:
            d.pop("score", None)
        if renames:
            d = {renames.get(k2, k2): v for k2, v in d.items()}
        if func_fl:
            fv = fvals.get(d.get("doc_id"), {})
            for alias in func_fl:
                d[alias] = fv.get(alias)
        if want_explain:
            d["[explain]"] = expl.get(d.get("doc_id"), "")
        if want_features:
            d["[features]"] = feat_map.get(d.get("doc_id"), "")
        if child_opt is not None:
            d["_childDocuments_"] = child_map.get(d.get("doc_id"), [])
        if "[docid]" in extra_transformers:
            d["[docid]"] = d.get("doc_id")
        if "[shard]" in extra_transformers:
            d["[shard]"] = idx.data_dir
        docs.append(d)

    resp: dict[str, Any] = {
        "responseHeader": {
            "status": 0,
            "QTime": int((time.monotonic() - t0) * 1000),
            "params": {k: params[k] for k in sorted(params, key=str)},
        },
        "response": {
            "numFound": num_found,
            "start": start,
            "numFoundExact": num_found_exact,
            "docs": docs,
        },
    }
    if next_cursor is not None:
        resp["nextCursorMark"] = next_cursor

    if _truthy(params.get("facet", False)):
        def _fparam(field, name, default):
            # f.<field>.facet.X beats global facet.X (Solr override rule)
            return params.get(f"f.{field}.facet.{name}",
                              params.get(f"facet.{name}", default))

        ff: dict[str, list] = {}
        for field in _as_list(params.get("facet.field")):
            # {!ex=tag[,tag]}field (optional key=): multi-select exclusion
            # -- this facet counts the DocSet WITHOUT the tagged filters
            label, facet_fq = str(field), fq
            exm = _EX_RE.match(str(field).strip())
            if exm is not None:
                field = exm.group(3)
                label = exm.group(2) or field
                facet_fq = _fq_excluding(frozenset(exm.group(1).split(",")))
            else:
                km = _KEY_RE.match(str(field).strip())
                if km is not None:  # {!key=label}field: rename only
                    field, label = km.group(2), km.group(1)
            limit = int(_fparam(field, "limit", 100))  # Solr default
            sort = _fparam(field, "sort", None)
            # ordered + sliced INSIDE the plan: `limit` buckets reach the
            # driver, never a high-cardinality field's bucket universe
            counts = idx.facet(
                q_main, field, fq=facet_fq, op=op, mm=mm,
                prefix=_fparam(field, "prefix", None),
                contains=_fparam(field, "contains", None),
                contains_ignore_case=_truthy(
                    _fparam(field, "contains.ignoreCase", False)),
                mincount=int(_fparam(field, "mincount", 0)),
                limit=limit, offset=int(_fparam(field, "offset", 0)),
                sort=str(sort) if sort is not None else None,
            ).collect()
            pairs = [(r[field], r["facet_count"]) for r in counts]
            if limit < 0 and sort is None:
                # unlimited + unordered aggregate: present count-desc like
                # Solr's default rendering of a full bucket list
                pairs.sort(key=lambda p: (-p[1], str(p[0])))
            flat: list = []
            for val, cnt in pairs:  # Solr's flat [val, count, ...] array
                flat.extend([val, int(cnt)])
            if _truthy(_fparam(field, "missing", False)):
                # Solr appends the null-value count as a trailing pair
                # keyed null, outside the bucket limit/sort
                flat.extend([
                    None,
                    idx.facet_missing_count(
                        q_main, field, fq=facet_fq, op=op, mm=mm
                    ),
                ])
            ff[label] = flat
        resp["facet_counts"] = {"facet_fields": ff}

        fintervals: dict[str, dict] = {}
        for ifield in _as_list(params.get("facet.interval")):
            sets = _as_list(params.get(f"f.{ifield}.facet.interval.set"))
            if not sets:
                raise ValueError(
                    f"facet.interval={ifield} needs "
                    f"f.{ifield}.facet.interval.set entries"
                )
            fintervals[ifield] = idx.facet_intervals(
                q_main, ifield, [str(s) for s in sets], fq=fq, op=op, mm=mm
            )
        if fintervals:
            resp["facet_counts"]["facet_intervals"] = fintervals

        fpivots: dict[str, list] = {}
        for pivot in _as_list(params.get("facet.pivot")):
            pfields = [f.strip() for f in str(pivot).split(",") if f.strip()]
            fpivots[",".join(pfields)] = idx.pivot_facet(
                q_main, pfields, fq=fq, op=op, mm=mm,
                limit=int(params.get("facet.limit", 100)),
                mincount=int(params.get("facet.pivot.mincount", 1)),
            )
        if fpivots:
            resp["facet_counts"]["facet_pivot"] = fpivots

        fqueries: dict[str, int] = {}
        for fquery in _as_list(params.get("facet.query")):
            fqueries[str(fquery)] = idx.facet_query_count(
                q_main, str(fquery), fq=fq, op=op, mm=mm
            )
        if fqueries:
            resp["facet_counts"]["facet_queries"] = fqueries

        fr: dict[str, dict] = {}
        for field in _as_list(params.get("facet.range")):
            is_date = dict(idx.docs().dtypes).get(field, "").startswith(
                "timestamp"
            )

            def _raw(name, f=field):
                # f.<field>.facet.range.X beats global (Solr override rule)
                v = params.get(f"f.{f}.facet.range.{name}",
                               params.get(f"facet.range.{name}"))
                if v is None:
                    raise ValueError(
                        f"facet.range={f} needs facet.range.{name}"
                    )
                return v

            if is_date:
                # DATE range facet: start/end are full DateMath INSTANTS
                # (ISO or NOW with /UNIT roundings and ±N UNIT offsets;
                # tz-naive = UTC, never the host zone), gap is DateMath.
                # Fixed-width units step seconds; +NMONTHS/+NYEARS step
                # REAL calendar months (day-clamped from the original
                # start, Solr RangeEndpointCalculator semantics). The
                # Solr ``NOW`` request param (epoch millis) pins NOW.
                now_p = params.get("NOW")
                now_sec = int(now_p) / 1000.0 if now_p is not None else None
                lo = parse_instant(_raw("start"), now_sec=now_sec)
                hi = parse_instant(_raw("end"), now_sec=now_sec)
                gap_kind, gap = parse_gap(_raw("gap"))
            else:
                lo, hi = float(_raw("start")), float(_raw("end"))
                gap_kind, gap = "sec", float(_raw("gap"))

            def _label(sec, date=is_date):
                if not date:
                    return _num(sec)
                import datetime as _dt

                return _dt.datetime.fromtimestamp(
                    sec, _dt.timezone.utc
                ).strftime("%Y-%m-%dT%H:%M:%SZ")

            # facet.range.include (r5): `lower` (default, [lo, hi)) or
            # `upper` ((lo, hi]). edge/outer/all need boundary values to
            # count in TWO buckets (Solr documents the double count) --
            # fail loud rather than emit a single-bucket approximation.
            inc = [str(v) for v in _as_list(
                params.get(f"f.{field}.facet.range.include",
                           params.get("facet.range.include", "lower")))]
            bad_inc = set(inc) - {"lower", "upper"}
            if bad_inc or set(inc) == {"lower", "upper"}:
                raise ValueError(
                    f"facet.range.include supports lower|upper (one of), "
                    f"got {inc!r} (edge/outer/all and lower+upper "
                    f"double-count boundary values)"
                )
            upper_incl = inc == ["upper"]
            hardend = _truthy(
                params.get(f"f.{field}.facet.range.hardend",
                           params.get("facet.range.hardend", False)))

            if gap_kind == "months":
                bounds = month_bucket_starts(lo, hi, int(gap))
                b_starts = bounds[:-1]
                # hardend: the last bucket truncates at the raw end
                b_end = hi if hardend else bounds[-1]
                got = {
                    round(float(r["bucket_start"]), 9): int(r["facet_count"])
                    for r in idx.facet_range_buckets(
                        q_main, field, b_starts, b_end,
                        fq=fq, op=op, mm=mm, upper_incl=upper_incl,
                    ).collect()
                }
                flat = []
                for b in b_starts:  # Solr emits EVERY bucket, zeros included
                    flat.extend([_label(b), got.get(round(b, 9), 0)])
                end_label = _label(b_end)
            else:
                # keys rounded to 9 places: the engine computes bucket
                # starts as start + floor(..)*gap in double math; i*gap
                # here must land on the same representation for
                # fractional gaps
                got = {
                    round(float(r["bucket_start"]), 9): int(r["facet_count"])
                    for r in idx.facet_range(
                        q_main, field, lo, hi, gap, fq=fq, op=op, mm=mm,
                        upper_incl=upper_incl, hardend=hardend,
                    ).collect()
                }
                flat = []
                i = 0
                while lo + i * gap < hi:  # every bucket, zeros included
                    b = lo + i * gap
                    flat.extend([_label(b), got.get(round(b, 9), 0)])
                    i += 1
                end_label = _label(hi if hardend else lo + i * gap)
            fr[field] = {
                "counts": flat,
                "gap": (params.get(f"f.{field}.facet.range.gap",
                                   params.get("facet.range.gap"))
                        if is_date else _num(gap)),
                "start": _label(lo), "end": end_label,
            }
            other = params.get(f"f.{field}.facet.range.other",
                               params.get("facet.range.other", "none"))
            if str(other) not in ("none", "before", "after", "between", "all"):
                raise ValueError(
                    f"facet.range.other must be none|before|after|between"
                    f"|all, got {other!r}"
                )
            if str(other) != "none":
                bef, bet, aft = idx.facet_range_other(
                    q_main, field, lo, hi, fq=fq, op=op, mm=mm,
                    upper_incl=upper_incl,
                )
                vals = {"before": bef, "between": bet, "after": aft}
                for key in (
                    ("before", "between", "after") if other == "all"
                    else (str(other),)
                ):
                    fr[field][key] = vals[key]
        if fr:
            resp["facet_counts"]["facet_ranges"] = fr

        fh: dict[str, dict] = {}
        for hfield in _as_list(params.get("facet.heatmap")):
            fmt = str(params.get("facet.heatmap.format", "ints2D"))
            if fmt != "ints2D":
                raise ValueError(
                    f"facet.heatmap.format={fmt!r}: this engine renders "
                    f"ints2D only (png is a Solr-UI rendering concern)"
                )
            gl = params.get("facet.heatmap.gridLevel")
            de = params.get("facet.heatmap.distErr")
            fh[str(hfield)] = idx.facet_heatmap(
                q_main, str(hfield),
                grid_level=int(gl) if gl is not None else None,
                dist_err=float(de) if de is not None else None,
                geom=_parse_heatmap_geom(params.get("facet.heatmap.geom")),
                fq=fq, op=op, mm=mm,
            )
        if fh:
            resp["facet_counts"]["facet_heatmaps"] = fh

    jf = params.get("json.facet")
    if jf:
        import json as _json

        from .json_facet import json_facet

        spec = _json.loads(jf) if isinstance(jf, str) else dict(jf)
        resp["facets"] = json_facet(
            idx, q_main, spec, fq=fq, op=op, mm=mm, tagged_fq=fq_tagged
        )

    if _truthy(params.get("hl", False)) and not match_all:
        fragsize = params.get("hl.fragsize")
        n_snip = int(params.get("hl.snippets", 1))
        # Solr accepts both the hl.tag.* (unified) and hl.simple.*
        # (original highlighter) spellings for the markup pair
        pre = str(params.get("hl.tag.pre",
                             params.get("hl.simple.pre", "<em>")))
        post = str(params.get("hl.tag.post",
                              params.get("hl.simple.post", "</em>")))
        hl_fl = params.get("hl.fl")
        if hl_fl is not None:
            fields = {f.strip() for f in str(hl_fl).split(",") if f.strip()}
            if not fields <= {"text", "*"}:
                raise ValueError(
                    f"hl.fl: this engine stores one highlightable field "
                    f"('text'); got {sorted(fields)}"
                )
        mac = params.get("hl.maxAnalyzedChars")
        hl_rows = idx.highlight(
            q, k=start + rows, fq=fq, pre=pre, post=post,
            fragsize=int(fragsize) if fragsize is not None else None,
            snippets=n_snip,
            hl_q=params.get("hl.q"),
            max_analyzed_chars=int(mac) if mac is not None else None,
        ).collect()[start:start + rows]
        resp["highlighting"] = {
            str(r["doc_id"]): {
                "text": (
                    list(r["highlighted"] or [])
                    if n_snip > 1 else [r["highlighted"]]
                )
            }
            for r in hl_rows
        }

    if _truthy(params.get("tv", False)):
        # TermVectorComponent: vectors for THIS page's docs (Solr's scope)
        vecs = idx.term_vectors(
            [d["doc_id"] for d in docs],
            with_positions=_truthy(params.get("tv.positions", False)),
            with_df=_truthy(params.get("tv.df", False)),
            with_tf_idf=_truthy(params.get("tv.tf_idf", False)),
        )
        resp["termVectors"] = {
            str(i): {"text": tv} for i, tv in vecs.items()
        }

    if _truthy(params.get("mlt", False)):
        # MoreLikeThisComponent: for each page doc, the top mlt.count
        # similar docs. mlt.fl must name the indexed catch-all (this
        # engine indexes _text_ only -- any other field fails loud rather
        # than silently computing similarity over the wrong text).
        mlt_fl = params.get("mlt.fl")
        if mlt_fl is None:
            raise ValueError("mlt=true requires mlt.fl")
        if str(mlt_fl) not in ("_text_", "text"):
            raise ValueError(
                f"mlt.fl={mlt_fl!r}: only the indexed catch-all "
                f"(_text_/text) is supported"
            )
        mlt_count = int(params.get("mlt.count", 5))
        mlt_kw = dict(
            max_query_terms=int(params.get("mlt.maxqt", 25)),
            min_tf=int(params.get("mlt.mintf", 2)),
            min_df=int(params.get("mlt.mindf", 5)),
        )
        mlt_boost = _truthy(params.get("mlt.boost", False))
        iterms = str(params.get("mlt.interestingTerms", "none"))
        if iterms not in ("none", "list", "details"):
            raise ValueError(
                f"mlt.interestingTerms must be none|list|details: {iterms!r}"
            )
        sections: dict[str, list] = {}
        terms_out: dict[str, Any] = {}
        for d in docs:
            seed = d.get("doc_id")
            sections[str(seed)] = idx.more_like_this(
                seed, k=mlt_count, boost=mlt_boost, **mlt_kw
            ).collect()
            if iterms != "none":
                ranked = idx.mlt_terms(seed, **mlt_kw)
                if iterms == "list":
                    terms_out[str(seed)] = [f"_text_:{t}" for t, _ in ranked]
                else:  # details: term -> boost (1.0 unless mlt.boost)
                    terms_out[str(seed)] = {
                        f"_text_:{t}": (float(tf) if mlt_boost else 1.0)
                        for t, tf in ranked
                    }
        # one stored-field fetch for every similar doc across the page
        all_ids = sorted({r["doc_id"] for rs in sections.values() for r in rs})
        stored = {}
        if all_ids:
            stored = {
                r["doc_id"]: r.asDict()
                for r in idx.docs()
                .filter(F.col("doc_id").isin(all_ids)).collect()
            }
        resp["moreLikeThis"] = {}
        for seed, rs in sections.items():
            mdocs = []
            for r in rs:
                md = dict(stored.get(r["doc_id"], {"doc_id": r["doc_id"]}))
                md["score"] = r["score"]
                mdocs.append(md)
            # numFound = returned docs (bounded by mlt.count) -- documented
            # deviation: Solr reports the MLT query's full match count,
            # which would cost an extra count job per page doc
            resp["moreLikeThis"][seed] = {
                "numFound": len(mdocs), "start": 0, "docs": mdocs,
            }
        if iterms != "none":
            resp["interestingTerms"] = terms_out

    if _truthy(params.get("stats", False)):
        sf: dict[str, Any] = {}
        for field in _as_list(params.get("stats.field")):
            # Solr local-param form: stats.field={!percentiles='1,99.9'}F
            pcts: list[float] = []
            m_p = re.match(r"^\{!percentiles='([^']*)'\}(.+)$", field)
            if m_p:
                pcts = [float(x) for x in m_p.group(1).split(",") if x.strip()]
                field = m_p.group(2)
            elif field.startswith("{!"):
                raise ValueError(
                    f"stats.field local params: only "
                    f"{{!percentiles='..'}} is supported, got {field!r}"
                )
            row = idx.stats_field(
                q_main, field, fq=fq, op=op, mm=mm, percentiles=pcts or None
            ).collect()[0]
            d = {k: row[k] for k in row.asDict() if not k.startswith("p")}
            if pcts:
                # Solr keys the percentiles map by the requested value
                d["percentiles"] = {
                    str(float(p)): row[
                        "p" + str(float(p)).rstrip("0").rstrip(".").replace(".", "_")
                    ]
                    for p in pcts
                }
            sf[field] = d
        resp["stats"] = {"stats_fields": sf}

    if _truthy(params.get("debugQuery", False)) and (
            not match_all or bf or bq or boost):
        # Solr debugQuery explain for the PAGE's docs: per-term BM25
        # breakdown (Solr renders a text tree; the structured form carries
        # the same numbers -- tf, dl, idf-weight, contribution, total).
        # Boosted requests carry the exact components of the reported
        # score (base/boost/bf/bq from the ranking pipeline itself) with
        # the per-term lexical detail nested under `base` when q is a
        # flat term query.
        page_ids = [int(d["doc_id"]) for d in docs]
        explain: dict[str, Any] = {}
        if ltr_ctx is not None:
            for c in _explain_entries(page_ids):
                e: dict[str, Any] = {
                    "score": c["score"],
                    "inRerankWindow": c["in_window"],
                    "originalScore": c["base"],
                }
                if c["in_window"]:
                    e["model"] = [[lbl, v] for lbl, v in c["model"]]
                    e["features"] = c["features"]
                if c.get("details") is not None:
                    e["details"] = c["details"]
                explain[str(c["doc_id"])] = e
        elif rerank_ctx is not None:
            for c in _explain_entries(page_ids):
                e: dict[str, Any] = {
                    "score": c["score"],
                    "components": {"base": c["base"],
                                   "rerank": c["rerank"]},
                    "inRerankWindow": c["in_window"],
                }
                if c.get("details") is not None:
                    e["details"] = c["details"]
                explain[str(c["doc_id"])] = e
        elif bf or bq or boost:
            for c in _explain_entries(page_ids):
                e: dict[str, Any] = {
                    "score": c["score"],
                    "components": {k: c[k] for k in
                                   ("base", "boost", "bf", "bq") if k in c},
                }
                if c.get("details") is not None:
                    e["details"] = c["details"]
                explain[str(c["doc_id"])] = e
        else:
            exp_rows = (
                idx.explain(q, page_ids).collect() if page_ids else []
            )
            for r in exp_rows:
                e = explain.setdefault(
                    str(r["doc_id"]), {"score": 0.0, "details": []}
                )
                e["details"].append(
                    {
                        "term": r["term"],
                        "tf": r["tf"],
                        "dl": r["dl"],
                        "weight": r["weight"],
                        "contribution": r["contribution"],
                    }
                )
                e["score"] += r["contribution"]
        resp["debug"] = {"explain": explain, "QParser": "LuceneQParser"}

    if _truthy(params.get("spellcheck", False)):
        resp["spellcheck"] = _spellcheck_section(
            idx, params, q_main, resp["response"]["numFound"],
            op=op, fq=fq, mm=mm,
        )
    # response-writer params (Solr common query params)
    echo = str(params.get("echoParams", "explicit")).lower()
    if echo not in ("explicit", "all", "none"):
        raise ValueError(f"echoParams must be explicit|all|none: {echo!r}")
    if echo == "none":
        resp["responseHeader"].pop("params", None)
    if _truthy(params.get("omitHeader", False)):
        resp.pop("responseHeader", None)
    return resp


def _spellcheck_section(
    idx: BM25Index,
    params: dict,
    q: str,
    num_found: int,
    *,
    op: str,
    fq,
    mm,
) -> dict:
    """SpellCheckComponent response section with the reference /spell
    handler's configured params (solrconfig.xml:680-758).

    ``spellcheck.q`` is analyzed per-token; each token needing correction
    gets a suggestions entry (Solr's flat [token, {...}] list). SuggestMode
    parity with DirectSolrSpellChecker: tokens ABSENT from the index get up
    to ``spellcheck.count`` suggestions (SUGGEST_WHEN_NOT_IN_INDEX); tokens
    present in the index get suggestions only when
    ``spellcheck.alternativeTermCount`` > 0 (SUGGEST_ALWAYS with that
    count), and ``suggest()`` still applies the maxQueryFrequency gate so
    common terms are never "corrected". A
    ``spellcheck.maxResultsForSuggest`` below the main query's numFound
    disables correction for the request (Solr: the query matched plenty,
    report correctlySpelled=true with no suggestions).

    ``spellcheck.dictionary`` (comma list, default "default") adds the
    solrconfig's second checker: ``wordbreak`` = WordBreakSolrSpellChecker
    (combineWords=true, breakWords=true). Break suggestions ("errorin" ->
    "error in") append to the token's entry after the direct ones; combine
    suggestions span two tokens and appear as entries keyed by the original
    pair ("topi c42" -> suggestion "topic42"), Solr's multi-token span
    shape. Pair entries are response-only: collations substitute per-token
    options (break suggestions participate via their token; combined words
    would need span-aware substitution, documented out).

    ``spellcheck.collate``: candidate collations are enumerated lazily in
    suggestion-rank order (a heap over per-token option indices -- the
    rank-0 combination first, never materializing the cross product). With
    ``maxCollationTries`` > 0 each candidate is verified with one
    ``count_matches`` under the request's own op/fq/mm and zero-hit
    candidates drop (Solr collation verification, at most `tries`
    verifications); with tries=0 the top combination is returned unverified
    (Solr's default). Up to ``maxCollations`` survive.
    ``collateExtendedResults`` switches the entry from the bare collation
    string to {collationQuery, hits, misspellingsAndCorrections}; extended
    hits are verified on demand when tries=0."""
    sq = str(params.get("spellcheck.q", q))
    count = int(params.get("spellcheck.count", 10))
    alt_count = int(params.get("spellcheck.alternativeTermCount", 0))
    extended = _truthy(params.get("spellcheck.extendedResults", False))
    dicts = [d.strip() for d in
             str(params.get("spellcheck.dictionary", "default")).split(",")
             if d.strip()]
    unknown = set(dicts) - {"default", "wordbreak"}
    if unknown:
        raise ValueError(
            f"unknown spellcheck.dictionary {sorted(unknown)} "
            "(supported: default, wordbreak)"
        )
    tokens = list(dict.fromkeys(
        t for surface in sq.split() for t in idx.analyze_query(surface)
    ))
    dfs = idx._dfs(tokens)
    max_res = params.get("spellcheck.maxResultsForSuggest")
    gate_open = max_res is None or num_found <= int(max_res)

    # entry key -> ranked (word, freq) options; token keys feed collations,
    # pair keys (combineWords spans) are response-only
    options: dict[str, list[tuple[str, int]]] = {}
    if gate_open:
        for t in tokens:
            sugs: list[tuple[str, int]] = []
            if "default" in dicts:
                n_sug = count if dfs.get(t, 0) == 0 else alt_count
                if n_sug > 0:
                    sugs += [(r["term"], int(r["df"]))
                             for r in idx.suggest(t, n=n_sug).collect()]
            if "wordbreak" in dicts and dfs.get(t, 0) == 0:
                seen = {w for w, _ in sugs}
                sugs += [(s["word"], int(s["freq"]))
                         for s in idx.break_suggestions(t, n=count)
                         if s["word"] not in seen]
            if sugs:
                options[t] = sugs[:count]
        if "wordbreak" in dicts:
            for s in idx.combine_suggestions(tokens, n=count):
                key = " ".join(s["tokens"])
                options.setdefault(key, []).append(
                    (s["word"], int(s["freq"]))
                )

    flat: list = []
    for key, sugs in options.items():
        entry: dict = {"numFound": len(sugs)}
        if extended:
            entry["origFreq"] = int(dfs.get(key, 0))
            entry["suggestion"] = [
                {"word": w, "freq": f} for w, f in sugs
            ]
        else:
            entry["suggestion"] = [w for w, _ in sugs]
        flat += [key, entry]
    section: dict = {
        "suggestions": flat,
        # Solr: false as soon as any query token is absent from the index
        # (freq 0); a closed maxResultsForSuggest gate reports true
        "correctlySpelled": (
            all(dfs.get(t, 0) > 0 for t in tokens) if gate_open else True
        ),
    }

    corrected = [t for t in tokens if t in options]
    if _truthy(params.get("spellcheck.collate", False)) and corrected:
        max_coll = int(params.get("spellcheck.maxCollations", 1))
        tries = int(params.get("spellcheck.maxCollationTries", 0))
        coll_ext = _truthy(
            params.get("spellcheck.collateExtendedResults", False)
        )
        lens = [len(options[t]) for t in corrected]
        # tries=0: no verification -- the first maxCollations candidates
        # return as-is (Solr SpellCheckCollator), so the candidate budget
        # is maxCollations, not 1
        budget = tries if tries > 0 else max_coll
        start = (0,) * len(corrected)
        heap: list[tuple[int, tuple[int, ...]]] = [(0, start)]
        seen_c = {start}
        flat_c: list = []
        n_out = 0
        while heap and budget > 0 and n_out < max_coll:
            rank, combo = heapq.heappop(heap)
            for p in range(len(combo)):
                if combo[p] + 1 < lens[p]:
                    nxt = combo[:p] + (combo[p] + 1,) + combo[p + 1:]
                    if nxt not in seen_c:
                        seen_c.add(nxt)
                        heapq.heappush(heap, (rank + 1, nxt))
            budget -= 1
            repl = {t: options[t][i][0]
                    for t, i in zip(corrected, combo)}
            cq = " ".join(repl.get(t, t) for t in tokens)
            hits: int | None = None
            if tries > 0:
                hits = idx.count_matches(cq, op=op, fq=fq, mm=mm)
                if hits == 0:
                    continue
            n_out += 1
            if coll_ext:
                if hits is None:
                    hits = idx.count_matches(cq, op=op, fq=fq, mm=mm)
                flat_c += ["collation", {
                    "collationQuery": cq,
                    "hits": hits,
                    "misspellingsAndCorrections": [
                        x for t in tokens if t in repl
                        for x in (t, repl[t])
                    ],
                }]
            else:
                flat_c += ["collation", cq]
        if flat_c:
            section["collations"] = flat_c
    return section


_BJ_Q_RE = re.compile(r"^\{!(?P<kind>parent|child)(?P<lp>[^}]*)\}(?P<inner>.+)$")
_KNN_Q_RE = re.compile(r"^\{!knn(?P<lp>[^}]*)\}\s*(?P<vec>\[[^\]]*\])\s*$")

# the component surface the knn path serves; any other component param
# present on a {!knn} request fails loud (facets/hl/etc over a vector
# DocSet are not implemented — the caller finds out, never silently no-op)
_KNN_ALLOWED = {"q", "fq", "start", "rows", "fl", "sort", "wt", "indent",
                "omitHeader", "echoParams", "minExactCount"}


def _rewrite_knn_fq(idx, params: dict) -> dict:
    """Hybrid retrieval: an ``fq={!knn f=F topK=N}[v,...]`` entry filters
    the main query's DocSet to the vector query's topK docs (Solr 9: a
    knn clause anywhere but ``q`` acts as a filter over the whole index —
    the standard lexical+vector hybrid request). The entry is rewritten
    to a ``doc_id IN (...)`` filter (<= topK ids, computed once here), so
    every downstream path — WAND kernels, filterCache, facets, grouping,
    collapse — sees an ordinary cacheable filter."""
    raw = params.get("fq")
    if raw is None:
        return params
    fqs = raw if isinstance(raw, (list, tuple)) else [raw]
    if not any(isinstance(f, str) and _KNN_Q_RE.match(f.strip()) for f in fqs):
        return params
    out = []
    for f in fqs:
        m = _KNN_Q_RE.match(f.strip()) if isinstance(f, str) else None
        if m is None:
            out.append(f)
            continue
        lps = dict(
            kv.split("=", 1) for kv in str(m.group("lp")).split() if "=" in kv
        )
        bad = set(lps) - {"f", "topK"}
        if bad or "f" not in lps:
            raise ValueError(
                f"fq {{!knn}}: needs f= (+ topK), got {sorted(lps)}"
            )
        try:
            vec = [float(x) for x in json.loads(m.group("vec"))]
        except (ValueError, TypeError) as e:
            raise ValueError(
                f"invalid fq {{!knn}} vector {m.group('vec')!r}"
            ) from e
        ids = [
            int(r["doc_id"])
            for r in idx.knn(lps["f"], vec, int(lps.get("topK", 10))).collect()
        ]
        out.append(
            f"doc_id IN ({', '.join(map(str, ids))})" if ids else "doc_id < 0"
        )
    p2 = dict(params)
    p2["fq"] = out if len(out) > 1 or isinstance(raw, (list, tuple)) else out[0]
    return p2


def _knn_select(idx, params: dict, t0: float, m) -> dict:
    """Solr 9 dense-vector KNN on /select: ``q={!knn f=F topK=N}[v,...]``.

    fq pre-filters the candidate set (Solr 9.1 default), topK defaults to
    10 (Solr's default), start/rows page WITHIN the topK result (Solr:
    the knn query produces topK docs; paging past them yields nothing),
    numFound = the docs the vector query produced. Scores are cosine
    similarities (DenseVectorField default), returned only when fl asks
    for score — the main path's convention."""
    extra = set(params) - _KNN_ALLOWED
    if extra:
        raise ValueError(
            f"{{!knn}} does not support components: {sorted(extra)}"
        )
    sort = " ".join(str(params.get("sort", "score desc")).split())
    if sort != "score desc":
        raise ValueError("{!knn} supports only the relevance sort "
                         "(sort='score desc')")
    lps = dict(
        kv.split("=", 1) for kv in str(m.group("lp")).split() if "=" in kv
    )
    bad = set(lps) - {"f", "topK"}
    if bad:
        raise ValueError(f"unsupported {{!knn}} local params: {sorted(bad)}")
    if "f" not in lps:
        raise ValueError("{!knn} requires f=<vector field>")
    try:
        vec = json.loads(m.group("vec"))
        vec = [float(x) for x in vec]
    except (ValueError, TypeError) as e:
        raise ValueError(
            f"invalid {{!knn}} query vector {m.group('vec')!r}"
        ) from e
    top_k = int(lps.get("topK", 10))
    fq = _as_list(params.get("fq")) or None
    start = int(params.get("start", 0))
    rows = int(params.get("rows", 10))
    fl = params.get("fl")
    fl = [f.strip() for f in fl.split(",")] if isinstance(fl, str) else fl
    want_score = fl is not None and "score" in fl
    norm_fl = [f for f in fl if f != "score"] if fl is not None else None
    if norm_fl is not None:
        unknown_fl = [f for f in norm_fl if f not in idx.docs().columns]
        if unknown_fl:
            raise ValueError(f"{{!knn}} fl: unknown fields {unknown_fl}")

    hits = idx.knn(lps["f"], vec, top_k, fq=fq).collect()  # <= topK rows
    page = hits[start:start + rows]
    if page:
        out = idx._from_doclist(
            [{"doc_id": r["doc_id"], "score": r["score"]} for r in page],
            with_stored=True, order_key="round6", fl=norm_fl,
        )
        docs = []
        for r in out.collect():
            d = r.asDict()
            if not want_score:
                d.pop("score", None)
            docs.append(d)
    else:
        docs = []
    return {
        "responseHeader": {
            "status": 0,
            "QTime": int((time.monotonic() - t0) * 1000),
            "params": {k: params[k] for k in sorted(params, key=str)},
        },
        "response": {
            "numFound": len(hits),
            "start": start,
            "numFoundExact": True,
            "docs": docs,
        },
    }
_BJ_LP_RE = re.compile(r"""(\w[\w.]*)=("[^"]*"|'[^']*'|[^\s}]+)""")


_COLLAPSE_RE = re.compile(r"^\{!collapse\s+([^}]*)\}\s*$")


def _collapse_select(
    idx: BM25Index, params: dict[str, Any], t0: float,
    collapse_fq: str, fqs: list,
) -> dict[str, Any]:
    """Solr collapse qparser (``fq={!collapse field=F min=|max=|sort=|
    nullPolicy=}``) + ExpandComponent (``expand=true``): the result set
    collapses to one doc per group -- the group's best by relevance
    (default), or by ``min=``/``max=`` of a numeric field or function, or
    the top doc under a ``sort=`` spec -- and the page is ordered by each
    head's own relevance score (Solr: the collapsed doc keeps its score
    and the main sort applies). numFound = the number of groups.
    ``nullPolicy``: ignore (default, null-field docs drop) / expand
    (null docs pass through as themselves) / collapse (one null group).
    ``hint=top_fc`` is accepted and ignored (a Lucene FieldCache
    performance hint -- no semantic effect). ``expand=true`` adds the
    ``expanded`` section: per page-group, the top ``expand.rows``
    (default 5) OTHER members by relevance (Solr's default expand.sort).

    The default relevance+ignore path rides the grouped segment kernels
    (groups x 1 rows per segment, never the full match set); the min/max/
    sort/nullPolicy paths ride :meth:`BM25Index.collapse_heads` (plain
    min/max = one partial-agg shuffle; sort/function = one window over
    the match set). Other components fail loud."""
    lp = dict(_BJ_LP_RE.findall(_COLLAPSE_RE.match(collapse_fq).group(1)))
    lp = {k: v.strip("'\"") for k, v in lp.items()}
    bad = set(lp) - {"field", "nullPolicy", "min", "max", "sort", "hint"}
    if bad or "field" not in lp:
        raise ValueError(
            f"{{!collapse}} supports field=/min=/max=/sort=/nullPolicy=/"
            f"hint=, got {lp!r}"
        )
    if sum(k in lp for k in ("min", "max", "sort")) > 1:
        raise ValueError("{!collapse} takes at most one of min=/max=/sort=")
    if lp.get("hint", "top_fc") != "top_fc":
        raise ValueError("{!collapse} hint= supports top_fc only")
    null_policy = lp.get("nullPolicy", "ignore")
    if null_policy not in ("ignore", "expand", "collapse"):
        raise ValueError(
            f"{{!collapse}} nullPolicy must be ignore|expand|collapse, "
            f"got {null_policy!r}"
        )
    head_by = None
    if "min" in lp:
        head_by = ("min", lp["min"])
    elif "max" in lp:
        head_by = ("max", lp["max"])
    elif "sort" in lp:
        head_by = ("sort", _parse_sort(lp["sort"]))
    field = lp["field"]
    for p in ("cursorMark", "minExactCount", "sort", "bf", "bq", "boost",
              "json.facet", "group", "elevateIds", "excludeIds", "rq",
              "tv", "pf", "pf2", "pf3"):
        if p in params:
            raise ValueError(f"{{!collapse}} does not support {p}")
    for p in ("facet", "hl", "stats", "debugQuery", "spellcheck", "mlt"):
        if _truthy(params.get(p, False)):
            raise ValueError(f"{{!collapse}} does not support {p}")

    q = str(params.get("q", "*:*"))
    op = str(params.get("q.op", "OR")).upper()
    mm = params.get("mm")
    fq = fqs or None
    start = int(params.get("start", 0))
    rows = int(params.get("rows", 10))
    fl = params.get("fl")
    fl = [f.strip() for f in fl.split(",")] if isinstance(fl, str) else fl
    want_score = bool(fl) and "score" in fl
    fetch_fl = None if (not fl or "*" in fl) else \
        [f for f in fl if f != "score"]

    match_all = q.strip() == "*:*"
    if head_by is not None or null_policy != "ignore":
        heads_df = idx.collapse_heads(
            q, field, head_by=head_by, null_policy=null_policy,
            op=op, fq=fq, mm=mm,
        )
        num_found = heads_df.count()
        key = F.round(F.col("score"), 6)
        ordered = heads_df.orderBy(key.desc(), F.col("doc_id").asc())
        page = ordered.offset(start).limit(rows) if start else \
            ordered.limit(rows)
        head_rows = [(r["group_value"], r["doc_id"], r["score"])
                     for r in page.collect()]
    elif match_all:
        live = idx._anti_dead(idx._apply_fq(idx.docs(), fq)).filter(
            F.col(field).isNotNull()
        )
        heads_df = (
            live.groupBy(field).agg(F.min("doc_id").alias("doc_id"))
            .orderBy("doc_id")
        )
        num_found = heads_df.count()  # one partial-agg count job
        page = heads_df.offset(start).limit(rows) if start else \
            heads_df.limit(rows)
        head_rows = [(r[field], r["doc_id"], 1.0) for r in page.collect()]
    else:
        grouped = idx.search_grouped(
            q, field, k=start + rows, group_limit=1, op=op, fq=fq, mm=mm,
        ).collect()
        head_rows = [(r["group_value"], r["doc_id"], r["score"])
                     for r in grouped][start:]
        matched = idx._matched_ids(q, op=op, fq=fq, mm=mm)
        num_found = (
            matched.join(idx.docs().select("doc_id", field), "doc_id")
            .filter(F.col(field).isNotNull())
            .select(field).distinct().count()
        )

    order = [d for _, d, _ in head_rows]
    scores = {d: s for _, d, s in head_rows}
    fetched = {
        r["doc_id"]: r.asDict()
        for r in idx._stored_side(fetch_fl)
        .filter(F.col("doc_id").isin(order) if order else F.lit(False))
        .collect()
    }
    docs = []
    for i in order:
        d = dict(fetched.get(i, {"doc_id": i}))
        if want_score:  # Solr: score only when fl asks
            d["score"] = scores[i]
        docs.append(d)

    resp: dict[str, Any] = {
        "responseHeader": {
            "status": 0,
            "QTime": int((time.monotonic() - t0) * 1000),
            "params": {k: params[k] for k in sorted(params, key=str)},
        },
        "response": {
            "numFound": int(num_found),
            "start": start,
            "numFoundExact": True,
            "docs": docs,
        },
    }

    if _truthy(params.get("expand", False)):
        per_group = int(params.get("expand.rows", 5))
        # a null group key has no entry in Solr's expanded section (the
        # section is keyed by field value): nullPolicy=expand heads and
        # the nullPolicy=collapse null group are page docs, never expanded
        gvals = [g for g, _, _ in head_rows if g is not None]
        if match_all:
            # expand over the live set: other members by doc_id order
            from pyspark.sql.window import Window

            live = idx._anti_dead(idx._apply_fq(idx.docs(), fq)).filter(
                F.col(field).isNotNull()
            )
            others = live.filter(
                F.col(field).isin(gvals) & ~F.col("doc_id").isin(order)
            )
            w = Window.partitionBy(field).orderBy("doc_id")
            top = (
                others.withColumn("__r", F.row_number().over(w))
                .filter(F.col("__r") <= per_group)
                .select(field, "doc_id").collect()
            )
            counts = {
                r[field]: int(r["n"]) for r in
                others.groupBy(field).agg(F.count("*").alias("n")).collect()
            }
            groups: dict = {}
            for r in sorted(top, key=lambda r: r["doc_id"]):
                groups.setdefault(r[field], []).append(
                    {"doc_id": r["doc_id"], "score": 1.0}
                )
        else:
            graw, counts = idx.expand_groups(
                q, field, gvals, order, per_group=per_group,
                op=op, fq=fq, mm=mm,
            )
            groups = {
                g: [{"doc_id": r["doc_id"], "score": r["score"]} for r in lst]
                for g, lst in graw.items()
            }
        exp_ids = [d["doc_id"] for lst in groups.values() for d in lst]
        efetched = {
            r["doc_id"]: r.asDict()
            for r in idx._stored_side(fetch_fl)
            .filter(F.col("doc_id").isin(exp_ids) if exp_ids else F.lit(False))
            .collect()
        }
        expanded: dict[str, Any] = {}
        for g in gvals:
            lst = groups.get(g, [])
            edocs = []
            for e in lst:
                d = dict(efetched.get(e["doc_id"], {"doc_id": e["doc_id"]}))
                if want_score:
                    d["score"] = e["score"]
                edocs.append(d)
            expanded[str(g)] = {
                "numFound": int(counts.get(g, 0)),
                "start": 0,
                "docs": edocs,
            }
        resp["expanded"] = expanded
    return resp


def _block_join_select(
    idx: BM25Index, params: dict[str, Any], t0: float, m: "re.Match"
) -> dict[str, Any]:
    """Solr block-join qparsers on /select: ``q={!parent which=...
    score=mode}childQ`` returns matching parents, ``q={!child of=...}q``
    returns the children of matching parents carrying the parent score
    (BlockJoinParentQParser / BlockJoinChildQParser).

    Block adaptation (see BM25Index.block_join_parent): the corpus is a
    flattened block structure -- conv_id is the block key -- so the
    ``which=``/``of=`` parent filter is implicit; the local param is
    accepted (it names the parent set in a true nested index) and any
    OTHER local param raises. Parent docs are virtual (the block key),
    so parent responses carry (parent_id, score, numChildHits) rather
    than stored fields; child responses fetch the children's stored
    fields like any docs page.

    Fail-loud contract: components this path does not implement
    (cursorMark, facet/facet.range, hl, stats, debugQuery, spellcheck,
    group, minExactCount, sort, start) raise instead of being dropped."""
    for p in ("cursorMark", "minExactCount", "sort", "bf", "bq", "boost",
              "json.facet", "elevateIds", "excludeIds", "rq", "tv",
              "expand", "pf", "pf2", "pf3"):
        if p in params:
            raise ValueError(f"block-join q does not support {p}")
    if int(params.get("start", 0)) != 0:
        raise ValueError("block-join q does not support start (use rows)")
    for p in ("facet", "hl", "stats", "debugQuery", "spellcheck", "group",
              "mlt"):
        if _truthy(params.get(p, False)):
            raise ValueError(f"block-join q does not support {p}")
    kind = m.group("kind")
    lps = dict(_BJ_LP_RE.findall(m.group("lp")))
    lps = {k: v.strip("'\"") for k, v in lps.items()}
    allowed = {"which", "score"} if kind == "parent" else {"of"}
    bad = set(lps) - allowed
    if bad:
        raise ValueError(
            f"unsupported {{!{kind}}} local params: {sorted(bad)}"
        )
    score_mode = lps.get("score", "none")
    inner = m.group("inner").strip()
    op = str(params.get("q.op", "OR")).upper()
    mm = params.get("mm")
    fq = _as_list(params.get("fq")) or None
    rows = int(params.get("rows", 10))

    if kind == "parent":
        page = idx.block_join_parent(
            inner, k=rows, score_mode=score_mode, op=op, fq=fq, mm=mm
        ).collect()
        num_found = (
            idx.score_matches(inner, op=op, fq=fq, mm=mm)
            .join(idx.docs().select("doc_id", "conv_id"), "doc_id")
            .select("conv_id").distinct().count()
        )
        docs = [
            {
                "parent_id": r["parent_id"],
                "score": float(r["score"]),
                "numChildHits": int(r["n_child_hits"]),
            }
            for r in page
        ]
    else:
        kids = idx.block_join_children(
            inner, k=rows, op=op, fq=fq, mm=mm
        ).limit(rows).collect()
        ids = [int(r["doc_id"]) for r in kids]
        fl = params.get("fl")
        fl = [f.strip() for f in fl.split(",")] if isinstance(fl, str) else fl
        fetch_fl = [f for f in (fl or []) if f != "score"] or None
        fetched = {
            r["doc_id"]: r.asDict()
            for r in idx._stored_side(fetch_fl)
            .filter(F.col("doc_id").isin(ids) if ids else F.lit(False))
            .collect()
        }
        docs = [
            {**fetched.get(int(r["doc_id"]), {"doc_id": int(r["doc_id"])}),
             "score": float(r["score"])}
            for r in kids
        ]
        # children of ALL matching parents (numFound counts the full
        # child DocSet, the page is the top parents' children)
        heads = (
            idx.score_matches(inner, op=op, fq=fq, mm=mm)
            .join(idx.docs().select("doc_id", "conv_id"), "doc_id")
            .select("conv_id").distinct()
        )
        num_found = (
            idx._anti_dead(idx.docs())
            .select("doc_id", "conv_id")
            .join(F.broadcast(heads), "conv_id")
            .count()
        )

    return {
        "responseHeader": {
            "status": 0,
            "QTime": int((time.monotonic() - t0) * 1000),
            "params": {k: str(v) for k, v in params.items()},
        },
        "response": {
            "numFound": num_found,
            "start": 0,
            "numFoundExact": True,
            "docs": docs,
        },
    }


def _grouped_select(
    idx: BM25Index, params: dict[str, Any], t0: float
) -> dict[str, Any]:
    """Solr result grouping response (``group=true&group.field=F``): the
    ``grouped`` section replaces ``response`` (Solr's shape). ``rows`` =
    number of groups, ``group.limit`` = docs per group (Solr defaults
    10/1); ``group.ngroups=true`` adds the distinct-group count.

    Fail-loud contract: components the grouped path does not implement
    (cursorMark, facet/facet.range, hl, stats, debugQuery, spellcheck,
    minExactCount, sort, start) raise instead of passing _RESERVED
    validation and then being silently dropped."""
    for p in ("cursorMark", "minExactCount", "sort", "bf", "bq", "boost",
              "json.facet", "elevateIds", "excludeIds", "rq", "tv",
              "expand", "pf", "pf2", "pf3"):
        if p in params:
            raise ValueError(f"group=true does not support {p}")
    if int(params.get("start", 0)) != 0:
        raise ValueError("group=true does not support start (use rows)")
    for p in ("facet", "hl", "stats", "debugQuery", "spellcheck", "mlt"):
        if _truthy(params.get(p, False)):
            raise ValueError(f"group=true does not support {p}")
    q = str(params.get("q", "*:*"))
    if q.strip() == "*:*":
        raise ValueError("group=true needs a scored q (not *:*)")
    field = params.get("group.field")
    gfunc = params.get("group.func")
    gqueries = _as_list(params.get("group.query"))
    n_modes = sum(1 for x in (field, gfunc, gqueries) if x)
    if n_modes != 1:
        raise ValueError(
            "group=true requires exactly one of group.field / group.func "
            "/ group.query"
        )
    op = str(params.get("q.op", "OR")).upper()
    mm = params.get("mm")
    fq = _as_list(params.get("fq")) or None
    rows = int(params.get("rows", 10))
    limit = int(params.get("group.limit", 1))
    gsort = " ".join(str(params.get("group.sort", "score desc")).split())
    gspec = None if gsort == "score desc" else _parse_sort(gsort)
    fl = params.get("fl")
    fl = [f.strip() for f in fl.split(",")] if isinstance(fl, str) else fl
    want_score = bool(fl) and "score" in fl
    fetch_fl = [f for f in (fl or []) if f != "score"] or None

    if gqueries:
        # Solr group.query: each query names one group -- its doclist is
        # the top group.limit docs matching main q AND that query (the
        # query string rides the fq machinery: Solr grammar or SQL, one
        # filter-cached DocSet each), numFound = the intersection count.
        if gspec is not None or _truthy(params.get("group.ngroups", False)):
            raise ValueError(
                "group.query does not support group.sort/group.ngroups"
            )
        if _truthy(params.get("group.main", False)) or \
                str(params.get("group.format", "grouped")) != "grouped":
            raise ValueError(
                "group.query supports group.format=grouped only"
            )
        return _group_query_select(
            idx, params, t0, q, [str(g) for g in gqueries],
            op=op, mm=mm, fq=fq, limit=limit,
            fl=fl, fetch_fl=fetch_fl, want_score=want_score,
        )
    if gfunc:
        if gspec is not None:
            raise ValueError("group.func does not support group.sort")
        page = idx.search_grouped_func(
            q, str(gfunc), k=rows, group_limit=limit, op=op, fq=fq, mm=mm,
        ).collect()
    else:
        page = idx.search_grouped(
            q, field, k=rows, group_limit=limit, op=op, fq=fq, mm=mm,
            group_sort=gspec,
        ).collect()
    matches = idx.count_matches(q, op=op, fq=fq, mm=mm)

    # stored fields for the <= rows*limit page docs: docid-pushdown fetch
    ids = [int(r["doc_id"]) for r in page]
    fetched = {
        r["doc_id"]: r.asDict()
        for r in idx._stored_side(fetch_fl)
        .filter(F.col("doc_id").isin(ids) if ids else F.lit(False))
        .collect()
    }
    # per-group totals for the page's group values (<= rows values)
    gvals = sorted({r["group_value"] for r in page})
    matched = idx.score_matches(q, op=op, fq=fq, mm=mm)
    if gfunc:
        sql, gf_fields = idx.function_expr(str(gfunc))
        gv = matched.join(
            idx.docs().select("doc_id", *gf_fields), "doc_id"
        ).select(F.expr(sql).alias("__gv"))
    else:
        gv = matched.join(
            idx.docs().select("doc_id", field), "doc_id"
        ).select(F.col(field).alias("__gv"))
    totals = {
        r["__gv"]: int(r["n"])
        for r in gv
        .filter(F.col("__gv").isin(gvals) if gvals else F.lit(False))
        .groupBy("__gv")
        .agg(F.count("*").alias("n"))
        .collect()
    }

    groups: list[dict[str, Any]] = []
    by_rank: dict[int, dict[str, Any]] = {}
    flat_docs: list[dict] = []
    for r in sorted(page, key=lambda r: (r["group_rank"], r["rank_in_group"])):
        g = by_rank.get(r["group_rank"])
        if g is None:
            g = {
                "groupValue": r["group_value"],
                "doclist": {
                    "numFound": totals.get(r["group_value"], 0),
                    "start": 0,
                    "docs": [],
                },
            }
            by_rank[r["group_rank"]] = g
            groups.append(g)
        d = dict(fetched.get(int(r["doc_id"]), {"doc_id": int(r["doc_id"])}))
        if want_score:  # Solr returns score only when fl asks
            d["score"] = r["score"]
        else:
            d.pop("score", None)
        g["doclist"]["docs"].append(d)
        flat_docs.append(d)

    header = {
        "status": 0,
        "QTime": int((time.monotonic() - t0) * 1000),
        "params": {k: params[k] for k in sorted(params, key=str)},
    }
    fmt = str(params.get("group.format", "grouped"))
    if fmt not in ("grouped", "simple"):
        raise ValueError(f"group.format must be grouped|simple: {fmt!r}")
    if _truthy(params.get("group.main", False)):
        # Solr group.main=true: the (format-forced-simple) flattened
        # doclist REPLACES the main result list; numFound = matches
        return {
            "responseHeader": header,
            "response": {
                "numFound": matches, "start": 0, "docs": flat_docs,
            },
        }
    if fmt == "simple":
        # Solr simple format: groups flattened (group order, then
        # rank-in-group) into one doclist per grouped key
        section = {
            "matches": matches,
            "doclist": {"numFound": matches, "start": 0, "docs": flat_docs},
        }
    else:
        section = {"matches": matches, "groups": groups}
    if _truthy(params.get("group.ngroups", False)):
        section["ngroups"] = gv.distinct().count()
    return {
        "responseHeader": header,
        "grouped": {str(field or gfunc): section},
    }


def _group_query_select(
    idx: BM25Index, params: dict[str, Any], t0: float, q: str,
    gqueries: list[str], *, op, mm, fq, limit, fl, fetch_fl, want_score,
) -> dict[str, Any]:
    """Solr ``group.query``: the grouped section keyed by each query
    string -- its doclist = top ``group.limit`` docs matching the main q
    AND that query (composed as one more fq: Solr grammar or SQL, each a
    filter-cached DocSet), numFound = the intersection count."""
    matches = idx.count_matches(q, op=op, fq=fq, mm=mm)
    grouped: dict[str, Any] = {}
    for gq in gqueries:
        gfq = ([*fq] if fq else []) + [gq]
        hits = idx.search(
            q, k=limit, op=op, fq=gfq, mm=mm,
            with_stored=True, fl=fetch_fl,
        ).collect()
        n = idx.count_matches(q, op=op, fq=gfq, mm=mm)
        docs = []
        for r in hits:
            d = r.asDict()
            if not want_score:
                d.pop("score", None)
            docs.append(d)
        grouped[gq] = {
            "matches": matches,
            "doclist": {"numFound": n, "start": 0, "docs": docs},
        }
    return {
        "responseHeader": {
            "status": 0,
            "QTime": int((time.monotonic() - t0) * 1000),
            "params": {k: params[k] for k in sorted(params, key=str)},
        },
        "grouped": grouped,
    }


def solr_suggest(idx: BM25Index, params: dict[str, Any]) -> dict[str, Any]:
    """Solr ``/suggest`` handler (SuggestComponent): complete the LAST
    token of ``suggest.q`` against the live dictionary, weight = term df
    (Solr's DocumentDictionaryFactory weights by a stored field; the
    index-frequency weight is the FreeTextSuggester default). The prefix
    pushes into the dictionary scan as a StartsWith predicate and only
    ``suggest.count`` rows (default 10) reach the driver -- at a
    10^12-turn vocabulary the scan reads matching row groups only.

    Params: ``suggest`` (must be truthy), ``suggest.q``,
    ``suggest.count``, ``suggest.dictionary`` (label echoed in the
    response, Solr's named-suggester convention). Response is Solr's
    suggest shape: suggest -> dictionary -> q -> {numFound, suggestions:
    [{term, weight}]}."""
    t0 = time.monotonic()
    known = {"suggest", "suggest.q", "suggest.count", "suggest.dictionary"}
    unknown = set(params) - known
    if unknown:
        raise ValueError(f"unsupported /suggest params: {sorted(unknown)}")
    if not _truthy(params.get("suggest", True)):
        raise ValueError("suggest=false on /suggest")
    sq = str(params.get("suggest.q", ""))
    if not sq.strip():
        raise ValueError("/suggest needs suggest.q")
    count = int(params.get("suggest.count", 10))
    name = str(params.get("suggest.dictionary", "default"))
    toks = idx.analyze_query(sq)
    prefix = toks[-1] if toks else sq.strip().lower()
    rows = idx.terms(prefix=prefix, limit=count, sort="count").collect()
    return {
        "responseHeader": {
            "status": 0,
            "QTime": int((time.monotonic() - t0) * 1000),
        },
        "suggest": {
            name: {
                sq: {
                    "numFound": len(rows),
                    "suggestions": [
                        {"term": r["term"], "weight": int(r["df"])}
                        for r in rows
                    ],
                }
            }
        },
    }


def solr_export(idx: BM25Index, params: dict[str, Any]):
    """Solr ``/export`` handler analog: the FULL sorted result set.

    Solr's /export streams every match (sort + fl required, no rows cap) --
    the API Solr tells you to use when start/rows paging would melt. A
    Spark engine's natural form for that stream is the distributed
    DataFrame itself: write it to parquet, join it downstream, or
    ``toLocalIterator()`` it; nothing is ever collected driver-side here
    and the sort is a TakeOrderedAndProject-free full orderBy only if the
    consumer actually requires a total order (Spark keeps it lazy).

    Supported params: ``q`` (default ``*:*``), ``q.op``, ``mm``, ``fq``,
    ``fl`` (comma list; default all stored fields + score), ``sort``
    (``score desc`` default, or ``<field> asc|desc``)."""
    q = str(params.get("q", "*:*"))
    _validate_edismax(params)
    op = str(params.get("q.op", "OR")).upper()
    mm = params.get("mm")
    # score_matches takes structured q; under op=AND/mm the phrases attach
    # as rank-only score additions below instead (same rule as solr_select)
    q, pf_bq = _apply_edismax(q, params, op, mm)
    fq = _as_list(params.get("fq")) or None
    fl = params.get("fl")
    fl = [f.strip() for f in fl.split(",")] if isinstance(fl, str) else fl
    sort = " ".join(str(params.get("sort", "score desc")).split())
    spec = _parse_sort(sort)  # multi-field Solr comma syntax accepted

    if q.strip() == "*:*":
        base = idx._anti_dead(idx._apply_fq(idx.docs(), fq))
        out = base.select(F.lit(1.0).alias("score"), *base.columns)
    else:
        matched = idx.score_matches(q, op=op, fq=fq, mm=mm)
        for ph in pf_bq:
            # pf phrase under op=AND/mm: rank-only score add (the bq
            # composition search_boosted uses) -- a left join on the match
            # set, so the exported row set is exactly the main query's
            side = (idx.score_matches(ph, fq=fq)
                    .withColumnRenamed("score", "__pf"))
            matched = matched.join(side, "doc_id", "left").select(
                "doc_id",
                (F.col("score") + F.coalesce(F.col("__pf"), F.lit(0.0)))
                .alias("score"),
            )
        # sort fields need not appear in fl (Solr: docValues, not fl), so
        # the field-list projection happens AFTER the sort key is applied
        out = matched.join(idx.docs(), "doc_id")
    out = out.orderBy(*_sort_cols(out, spec, idx), "doc_id")
    if fl:
        out = out.select(*fl) if "doc_id" in fl else out.select("doc_id", *fl)
    return out


def solr_get(
    idx: BM25Index, ids: list[int], fl: list[str] | None = None
) -> dict[str, Any]:
    """Solr ``/get`` (real-time get) analog: fetch docs by id, no scoring,
    no search. Tombstone-aware (a deleted doc is not returned, like RTG
    after deleteByQuery+commit). The id list pushes into the docs parquet
    scan as ``doc_id IN (...)`` row-group pruning — k row groups read, not
    a table scan. Returns Solr's ``{"response": {"numFound": n, "docs":
    [...]}}`` shape (RTG multi-id form)."""
    ids = [int(i) for i in ids]
    if not ids:
        return {"response": {"numFound": 0, "start": 0, "docs": []}}
    fetched = idx._anti_dead(
        idx._stored_side(fl).filter(F.col("doc_id").isin(ids))
    ).collect()
    by_id = {r["doc_id"]: r.asDict() for r in fetched}
    docs = [by_id[i] for i in ids if i in by_id]
    return {"response": {"numFound": len(docs), "start": 0, "docs": docs}}


def select_pages(
    idx: BM25Index, params: dict[str, Any], page_size: int = 100
) -> Iterator[dict[str, Any]]:
    """The importer's crawl loop (SolrSemanticIndexer pages ``/select``
    with start = page * pagination-size until the collection is
    exhausted): yield full response dicts page by page. ``start``/``rows``
    in params are overridden."""
    start = 0
    while True:
        page = dict(params, start=start, rows=page_size)
        resp = solr_select(idx, page)
        yield resp
        start += page_size
        if start >= resp["response"]["numFound"]:
            return


def select_cursor_pages(
    idx: BM25Index, params: dict[str, Any], page_size: int = 100
) -> Iterator[dict[str, Any]]:
    """The crawl loop the importer SHOULD run at 10^12 turns: cursorMark
    pagination (Solr's documented deep-paging pattern -- start/rows repaging
    re-ranks the offset prefix on every page, O(depth) per request, while a
    cursor page is O(page)). Yields response dicts until Solr's stop
    condition: nextCursorMark == the mark the page was requested with."""
    mark = str(params.get("cursorMark", "*"))
    num_found: int | None = None  # counted ONCE on the first page, carried
    nf_exact = True
    while True:
        page = dict(params, cursorMark=mark, start=0, rows=page_size)
        resp = solr_select(idx, page, known_num_found=num_found,
                           known_num_found_exact=nf_exact)
        num_found = int(resp["response"]["numFound"])
        nf_exact = bool(resp["response"]["numFoundExact"])
        yield resp
        nxt = resp["nextCursorMark"]
        if nxt == mark:
            return
        mark = nxt
