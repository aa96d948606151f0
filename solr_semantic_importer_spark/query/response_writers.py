"""Solr response writers: the ``wt`` param's serializations.

The reference consumes ``wt=json`` (HttpSolrSelectClientImpl.java sends
wt=json and parses the solr9_response.json shape -- that dict IS what
:func:`solr_select` returns). These writers render the same dict the way
Solr's other writers would, so a caller that expected ``wt=xml`` or
``wt=csv`` from Solr can keep its parser:

- ``json``: the dict serialized (sorted keys off -- Solr preserves
  insertion order).
- ``xml``: Solr's classic XML shape -- ``<response>`` root, ``<lst>`` for
  maps, ``<arr>`` for lists, ``<result name="response" numFound=..>``
  for the doc list, typed leaf elements (str/int/long/float/double/bool/
  date/null).
- ``csv``: Solr's CSV writer -- one row per doc over the union of
  returned field names (fl order first), multivalued fields joined, the
  header always present.

:func:`render_response` dispatches on wt; unknown wt fails loud.
"""

from __future__ import annotations

import datetime
import json
from typing import Any
from xml.sax.saxutils import escape, quoteattr

__all__ = ["render_response", "to_xml", "to_csv"]


def _xml_leaf(name: str | None, v: Any) -> str:
    nm = f" name={quoteattr(str(name))}" if name is not None else ""
    if v is None:
        return f"<null{nm}/>"
    if isinstance(v, bool):
        return f"<bool{nm}>{str(v).lower()}</bool>"
    if isinstance(v, int):
        tag = "int" if -(2 ** 31) <= v < 2 ** 31 else "long"
        return f"<{tag}{nm}>{v}</{tag}>"
    if isinstance(v, float):
        return f"<double{nm}>{v}</double>"
    if isinstance(v, datetime.datetime):
        return f"<date{nm}>{v.strftime('%Y-%m-%dT%H:%M:%SZ')}</date>"
    return f"<str{nm}>{escape(str(v))}</str>"


def _xml_value(name: str | None, v: Any) -> str:
    nm = f" name={quoteattr(str(name))}" if name is not None else ""
    if isinstance(v, dict):
        inner = "".join(_xml_value(k, x) for k, x in v.items())
        return f"<lst{nm}>{inner}</lst>"
    if isinstance(v, (list, tuple)):
        inner = "".join(_xml_value(None, x) for x in v)
        return f"<arr{nm}>{inner}</arr>"
    return _xml_leaf(name, v)


def to_xml(resp: dict) -> str:
    """The /select response dict as Solr's classic XML writer shape."""
    parts = ['<?xml version="1.0" encoding="UTF-8"?>', "<response>"]
    for key, v in resp.items():
        if key == "response" and isinstance(v, dict) and "docs" in v:
            attrs = "".join(
                f" {a}={quoteattr(str(v[a]).lower() if isinstance(v[a], bool) else str(v[a]))}"
                for a in ("numFound", "start", "numFoundExact")
                if a in v
            )
            docs = "".join(
                "<doc>" + "".join(_xml_value(k, x) for k, x in d.items())
                + "</doc>"
                for d in v["docs"]
            )
            parts.append(f'<result name="response"{attrs}>{docs}</result>')
        else:
            parts.append(_xml_value(key, v))
    parts.append("</response>")
    return "".join(parts)


def _csv_cell(v: Any) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):  # Solr renders lowercase true/false
        return str(v).lower()
    if isinstance(v, (list, tuple)):  # Solr joins multivalued with ','
        return _csv_cell(",".join(
            str(x).lower() if isinstance(x, bool) else str(x) for x in v
        ))
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%SZ")
    s = str(v)
    if any(c in s for c in ',"\n\r'):
        return '"' + s.replace('"', '""') + '"'
    return s


def to_csv(resp: dict) -> str:
    """The doc list as Solr's CSV writer output (header always present;
    column order = first-seen field order across the page's docs)."""
    docs = resp.get("response", {}).get("docs", [])
    cols: list[str] = []
    for d in docs:
        for k in d:
            if k not in cols:
                cols.append(k)
    lines = [",".join(_csv_cell(c) for c in cols)]
    for d in docs:
        lines.append(",".join(_csv_cell(d.get(c)) for c in cols))
    return "\n".join(lines) + "\n"


def render_response(resp: dict, wt: str = "json") -> str:
    """Serialize a /select response dict per the ``wt`` param."""
    w = (wt or "json").lower()
    if w == "json":
        return json.dumps(resp, default=_json_default)
    if w == "xml":
        return to_xml(resp)
    if w == "csv":
        return to_csv(resp)
    raise ValueError(f"unsupported wt: {wt!r} (json|xml|csv)")


def _json_default(v):
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%SZ")
    raise TypeError(f"not JSON serializable: {type(v)}")
