"""Solr LukeRequestHandler analog: index/schema/field introspection.

Solr's implicit ``/admin/luke`` handler reports index statistics
(numDocs/maxDoc/deletedDocs/version/segmentCount), per-field info
(type, docs-with-value, distinct indexed terms), and per-field top
terms. The reference inspects collection/schema state through SolrJ
admin calls before indexing (SolrAdminService/SolrSchemaService in the
importer — collection existence, field checks); this handler is that
introspection surface over the PySpark engine's own metadata.

Scale notes: the ``index`` section reads only the manifest + corpus
stats (driver-side metadata) plus one tombstone count; ``segmentCount``
is a partition-column-only distinct (no data columns leave parquet).
The ``fields`` section is ONE aggregation job computing every
requested field's non-null count in a single pass over the docs scan;
``topTerms`` is a dictionary top-k (``TakeOrderedAndProject``, never a
full collect). Nothing here decodes postings.

Response shape follows Solr's: ``topTerms`` is the flat
``[term, freq, term, freq, ...]`` NamedList rendering.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

from ..plans.manifest import _latest_version
from .engine import BM25Index

__all__ = ["solr_luke", "solr_segments"]

# engine-internal doc columns never reported as user fields
_INTERNAL = ("dl", "segment_id")

_TYPE_MAP = {
    "string": "string",
    "long": "plong",
    "integer": "pint",
    "double": "pdouble",
    "float": "pfloat",
    "timestamp": "pdate",
    "date": "pdate",
    "boolean": "boolean",
    "binary": "binary",
}


def _solr_type(idx: BM25Index, name: str, dtype) -> str:
    tn = dtype.typeName()
    if name == "text":
        return idx.analyzer_chain
    if tn == "array":
        el = dtype.elementType.typeName()
        return "knn_vector" if el in ("float", "double") else f"multi_{el}"
    return _TYPE_MAP.get(tn, tn)


def solr_luke(idx: BM25Index, params: dict[str, Any] | None = None) -> dict:
    """Run one /admin/luke request. Params: ``show`` (``index`` |
    ``schema`` | default = index + fields), ``fl`` (restrict the fields
    section), ``numTerms`` (top terms per indexed field, default 10,
    0 disables). Anything else — including Solr's per-document
    ``id``/``docId`` view (that's real-time get, ``solr_get``) — fails
    loud."""
    params = dict(params or {})
    show = params.pop("show", None)
    fl = params.pop("fl", None)
    num_terms = int(params.pop("numTerms", 10))
    if params:
        raise ValueError(
            f"unsupported /admin/luke params {sorted(params)} "
            f"(per-doc id/docId view is solr_get)"
        )
    if show not in (None, "index", "schema"):
        raise ValueError(f"luke: unsupported show={show!r}")
    if num_terms < 0:
        raise ValueError("luke: numTerms must be >= 0")

    deleted = idx._n_tombstoned()
    seg_count = idx.docs().select("segment_id").distinct().count()
    resp: dict[str, Any] = {
        "responseHeader": {"status": 0},
        "index": {
            "numDocs": idx.n_docs - deleted,
            "maxDoc": idx.n_docs,
            "deletedDocs": deleted,
            "version": _latest_version(idx.index_dir),
            "segmentCount": seg_count,
            "current": True,
            "hasDeletions": deleted > 0,
        },
    }
    if show == "index":
        return resp

    if show == "schema":
        fin = idx._finalize_metrics
        resp["schema"] = {
            "uniqueKeyField": "doc_id",
            "defaultSearchField": "text",
            "analyzer": idx.analyzer_chain,
            "copyFields": list(fin.get("copy_fields") or []),
            "positionIncrementGap": fin.get("position_increment_gap"),
            "storePositions": fin.get("store_positions"),
        }
        return resp

    schema = {f.name: f.dataType for f in idx.docs().schema.fields
              if f.name not in _INTERNAL}
    names = list(schema)
    if fl is not None:
        names = [f.strip() for f in str(fl).split(",") if f.strip()]
        unknown = [f for f in names if f not in schema]
        if unknown:
            raise ValueError(f"luke: unknown fields {unknown}")

    # one pass: every field's docs-with-value count
    counts_row = idx.docs().agg(
        *[F.count(F.col(f)).alias(f) for f in names]
    ).collect()[0]

    fields: dict[str, Any] = {}
    for f in names:
        info: dict[str, Any] = {
            "type": _solr_type(idx, f, schema[f]),
            "docs": int(counts_row[f]),
            "indexed": f == "text",
            "stored": True,
        }
        if f == "text":
            # per-batch appends write dictionary df INCREMENTS (one row
            # per term per batch; streaming/incremental.py) — aggregate,
            # never read rows as terms
            d = idx.dictionary().groupBy("term").agg(F.sum("df").alias("df"))
            info["distinct"] = d.count()
            if num_terms:
                top = (
                    d.orderBy(F.col("df").desc(), F.col("term").asc())
                    .limit(num_terms)
                    .collect()
                )
                flat: list[Any] = []
                for r in top:
                    flat += [r["term"], int(r["df"])]
                info["topTerms"] = flat
        fields[f] = info
    resp["fields"] = fields
    return resp


def solr_segments(idx: BM25Index) -> dict:
    """Solr's ``/admin/segments`` analog: per-segment doc/delete counts.

    ONE aggregation job over the docs scan (grouped by the partition
    column, so at 10^12 docs the shuffle carries n_segments rows), plus
    one tombstone-side join when deletes exist. ``sizeInBytes``/
    per-segment file sizes are storage-layer facts the manifest owns;
    the engine-level answer is row counts (documented deviation).
    """
    docs = idx.docs().groupBy("segment_id").agg(
        F.count("*").alias("docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )
    dead = idx._tombstones_df()
    if dead is not None:
        per_seg_dead = (
            idx.docs().select("doc_id", "segment_id")
            .join(dead, "doc_id", "left_semi")
            .groupBy("segment_id").agg(F.count("*").alias("delCount"))
        )
        docs = docs.join(per_seg_dead, "segment_id", "left")
    rows = docs.orderBy("segment_id").collect()
    return {
        "responseHeader": {"status": 0},
        "segments": {
            str(r["segment_id"]): {
                "name": str(r["segment_id"]),
                "docCount": int(r["docs"]),
                "delCount": int(r["delCount"] or 0) if dead is not None else 0,
                "minDoc": int(r["min_doc"]),
                "maxDoc": int(r["max_doc"]),
            }
            for r in rows
        },
    }
