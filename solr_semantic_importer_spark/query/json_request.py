"""Solr JSON Request API: the ``/select`` JSON body mapped onto the facade.

Solr 5+ accepts queries as a structured JSON body alongside the classic
param map (the form the reference's ``HttpSolrSelectClientImpl`` sends —
``createSolrRequest`` builds ``q=*:*&start=..&rows=..`` + fq params). This
module implements the documented body surface so a user of either request
style can run against the PySpark engine:

- ``query``   → ``q``. A string passes through the normal query parsers;
  a dict is the query DSL — supported wrappers:
    * ``{"lucene":  {"query": "...", ["q.op": "AND|OR"]}}``
    * ``{"edismax": {"query": "...", [pf/pf2/pf3/ps/ps2/ps3/mm/bq/bf...]}}``
      (extra keys become the matching request params, defType=edismax)
    * ``{"bool": {"must": [...], "should": [...], "must_not": [...]}}``
      where each clause is a single term, a quoted phrase, or a NESTED
      ``{"bool": ...}`` object (composed into Lucene occur-prefix syntax
      ``+must should -must_not``, nested bools as parenthesized groups
      ``+(x y)`` — exactly the BooleanQuery the string form parses to
      since grouped-boolean support landed).
- ``filter``  → ``fq`` (string or list; APPENDS to any fq in ``params`` —
  filters are multi-valued in Solr, all are ANDed)
- ``fields``  → ``fl`` (string or list)
- ``sort``    → ``sort``
- ``offset``  → ``start``;  ``limit`` → ``rows``
- ``facet``   → ``json.facet`` (the JSON Facet API dict, verbatim)
- ``params``  → classic query params merged into the request

Single-valued keys given BOTH at the body top level and inside ``params``
(or the caller's extra params) raise — Solr 400s on conflicting
non-multiValued params, and this facade's contract is fail-loud, never
silently-pick-one. Unknown body keys raise (same contract
``solr_select`` applies to unknown params).
"""

from __future__ import annotations

import json
import re
from typing import Any

from .engine import BM25Index
from .select_api import solr_select

__all__ = ["solr_select_json", "json_body_to_params"]

_BODY_KEYS = {"query", "filter", "fields", "sort", "offset", "limit",
              "facet", "params"}

# one boolean-DSL clause: a bare term (no whitespace / occur / field
# syntax that would change meaning under the composed string) or a quoted
# phrase with optional ~slop / ^boost suffixes
_TERM_CLAUSE_RE = re.compile(r'^[^\s"+\-(){}\[\]]+$')
_PHRASE_CLAUSE_RE = re.compile(r'^"[^"]+"(~\d+)?(\^\d+(\.\d+)?)?$')


def _dsl_clause(c: Any, where: str) -> str:
    """One ``bool`` DSL clause -> its occur-composable string form. A
    nested ``{"bool": ...}`` object composes to a parenthesized group
    (the engine's grouped-boolean parser evaluates it as a nested
    BooleanQuery)."""
    if isinstance(c, dict):
        if set(c) == {"bool"}:
            return "(" + _bool_dsl(c["bool"]) + ")"
        raise ValueError(
            f"json body: bool.{where} clause object must be "
            f"{{'bool': ...}}, got keys {sorted(c)}"
        )
    if not isinstance(c, str):
        raise ValueError(
            f"json body: bool.{where} clause must be a string "
            f"(term or quoted phrase) or a nested {{'bool': ...}}, "
            f"got {type(c).__name__}"
        )
    c = c.strip()
    if _TERM_CLAUSE_RE.match(c) or _PHRASE_CLAUSE_RE.match(c):
        return c
    raise ValueError(
        f"json body: unsupported bool.{where} clause {c!r} "
        "(single term or quoted phrase only; nested boolean/field syntax "
        "must be sent as a string query)"
    )


def _bool_dsl(spec: Any) -> str:
    """A ``bool`` DSL object -> the occur-prefix query string."""
    if not isinstance(spec, dict):
        raise ValueError("json body: 'bool' takes an object")
    bad = set(spec) - {"must", "should", "must_not"}
    if bad:
        raise ValueError(f"json body: unsupported bool keys {sorted(bad)}")
    parts: list[str] = []
    for occ, prefix in (("must", "+"), ("should", ""), ("must_not", "-")):
        cl = spec.get(occ, [])
        cl = [cl] if isinstance(cl, (str, dict)) else cl
        parts.extend(prefix + _dsl_clause(c, occ) for c in cl)
    if not parts:
        raise ValueError("json body: empty bool query")
    return " ".join(parts)


def _query_dsl(q: Any) -> tuple[str, dict[str, Any]]:
    """The ``query`` body key -> (q string, extra params it implies)."""
    if isinstance(q, str):
        return q, {}
    if not isinstance(q, dict) or len(q) != 1:
        raise ValueError(
            "json body: 'query' must be a string or a one-key DSL object "
            "({'lucene': ...} / {'edismax': ...} / {'bool': ...})"
        )
    (kind, spec), = q.items()
    if kind == "bool":
        return _bool_dsl(spec), {}
    if kind in ("lucene", "edismax"):
        if not isinstance(spec, dict) or "query" not in spec:
            raise ValueError(f"json body: {{'{kind}': ...}} needs a 'query'")
        extra = {k: v for k, v in spec.items() if k != "query"}
        qs = spec["query"]
        if not isinstance(qs, str):
            raise ValueError(f"json body: {kind}.query must be a string")
        if kind == "edismax":
            extra["defType"] = "edismax"
        return qs, extra
    raise ValueError(f"json body: unsupported query DSL {{'{kind}': ...}}")


def json_body_to_params(body: dict | str) -> dict[str, Any]:
    """Translate a JSON Request API body into the classic param dict
    ``solr_select`` takes. Pure translation — no index needed — so tests
    and callers can inspect the merge."""
    if isinstance(body, str):
        body = json.loads(body)
    if not isinstance(body, dict):
        raise ValueError("json body must be an object")
    unknown = set(body) - _BODY_KEYS
    if unknown:
        raise ValueError(f"unsupported json body keys: {sorted(unknown)}")

    inner = body.get("params", {})
    if not isinstance(inner, dict):
        raise ValueError("json body: 'params' must be an object")
    out: dict[str, Any] = dict(inner)

    def _set(param: str, value: Any) -> None:
        if param in out:
            raise ValueError(
                f"json body: {param!r} given both at the body top level "
                f"and in params — conflicting values are an error"
            )
        out[param] = value

    if "query" in body:
        qs, extra = _query_dsl(body["query"])
        _set("q", qs)
        for k, v in extra.items():
            _set(k, v)
    if "filter" in body:
        flt = body["filter"]
        flt = [flt] if isinstance(flt, str) else list(flt)
        prior = out.get("fq", [])
        prior = [prior] if isinstance(prior, str) else list(prior)
        out["fq"] = prior + flt  # multi-valued: appends, never conflicts
    if "fields" in body:
        fl = body["fields"]
        fl = fl if isinstance(fl, str) else ",".join(fl)
        _set("fl", fl)
    if "sort" in body:
        _set("sort", body["sort"])
    if "offset" in body:
        _set("start", _nonneg_int(body["offset"], "offset"))
    if "limit" in body:
        _set("rows", _nonneg_int(body["limit"], "limit"))
    if "facet" in body:
        if not isinstance(body["facet"], dict):
            raise ValueError("json body: 'facet' must be an object "
                             "(the JSON Facet API)")
        _set("json.facet", body["facet"])
    return out


def _nonneg_int(v: Any, name: str) -> int:
    if isinstance(v, bool) or not isinstance(v, int) or v < 0:
        raise ValueError(f"json body: {name} must be a non-negative integer")
    return v


def solr_select_json(idx: BM25Index, body: dict | str) -> dict[str, Any]:
    """Execute one JSON Request API query: translate the body and run it
    through :func:`solr_select` (same response shape, same fail-loud param
    validation on the merged result)."""
    return solr_select(idx, json_body_to_params(body))
