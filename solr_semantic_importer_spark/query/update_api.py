"""Solr ``/update`` handler: the JSON command format against a live index.

The reference writes through SolrJ (``SolrSemanticIndexer`` builds
SolrInputDocuments; deletes go through deleteByQuery —
SolrAdminActions.java:228-264). Solr's JSON /update wire format (public
"Uploading Data with Index Handlers") carries the same operations:

    {"add": {"doc": {...}}, "add": {"doc": {...}},
     "delete": {"query": "-crawl_id:5"},
     "commit": {}}

(yes, with REPEATED keys — :func:`parse_update_body` parses JSON text
with an object-pairs hook so every command survives; Python callers can
equivalently pass a list of ``(op, payload)`` pairs.)

Mapping onto the engine:

- ``add`` — docs are collected per request and indexed as ONE new
  micro-batch through ``streaming.incremental.append_batch`` (the
  exactly-once staged-publish protocol; the batch id continues the
  index's committed sequence). With ``unique_key`` given, adds default to
  ``overwrite=true`` (Solr's default): existing docs with the incoming
  keys are tombstoned FIRST, so the new versions are the only live ones —
  Solr's updateLog replace, expressed as delete+add like Lucene does
  internally. ``"overwrite": false`` skips the tombstoning (Solr's
  duplicate-tolerant fast path).
- ``delete`` — ``{"id": v}`` / ``{"id": [v, ...]}`` needs ``unique_key``
  and tombstones by key; ``{"query": s}`` accepts Solr fq syntax or a
  SQL predicate (same dual grammar as ``BM25Index.delete_by_query``).
- ``commit`` — appends already publish atomically (manifest commit =
  Solr's hard commit); the command is acknowledged and counted so client
  loops that end with a commit keep working. Searchers see the batch by
  constructing a fresh ``BM25Index`` (Solr's searcher reopen).
- ``optimize`` — tiered merge of all postings runs
  (``index.merge.merge_postings``; Lucene forceMerge analog).

The request returns ``{"responseHeader": {"status": 0, "QTime": ms},
"adds": n, "deletes": n, ...}``. Commands execute IN ORDER (Solr
applies them sequentially) — an add-then-delete-by-query in one request
deletes the freshly added docs, exactly like Solr.

Scale shape: adds ship through the same staged append the streaming path
uses (never a rewrite of existing segments); deletes are tombstone
appends (the id list is pushed into the docs scan, a delete-query stays
a DataFrame end to end); nothing here collects the corpus.
"""

from __future__ import annotations

import json
import time
from typing import Any

from pyspark.sql import SparkSession

from ..index.build import BuildConfig
from .engine import BM25Index

__all__ = ["solr_update", "parse_update_body"]

_OPS = {"add", "delete", "commit", "optimize"}


def parse_update_body(body: str | list | dict) -> list[tuple[str, Any]]:
    """Normalize an /update body into ordered (op, payload) pairs.

    - JSON text: parsed with an object-pairs hook (repeated ``add`` /
      ``delete`` keys are the documented wire format). A top-level JSON
      ARRAY is the bare-docs shorthand: every element is an add.
    - list of dicts (docs): the same shorthand, already parsed.
    - dict: single-occurrence commands (Python dicts can't repeat keys).
    """
    if isinstance(body, str):
        # objects WITHOUT duplicate keys parse as plain dicts; an object
        # WITH duplicates (the top-level command envelope's wire format)
        # keeps its ordered pairs — duplicate keys anywhere else (inside a
        # doc / payload) are invalid in Solr too, so the pairs form only
        # ever appears at the top
        def hook(pairs):
            keys = [k for k, _ in pairs]
            if len(set(keys)) == len(keys):
                return dict(pairs)
            return ("__dup__", pairs)

        parsed = json.loads(body, object_pairs_hook=hook)

        def no_nested_dups(v):
            if isinstance(v, tuple):
                raise ValueError("/update: duplicate keys inside a payload")
            if isinstance(v, dict):
                for x in v.values():
                    no_nested_dups(x)
            elif isinstance(v, list):
                for x in v:
                    no_nested_dups(x)

        if isinstance(parsed, tuple):
            pairs = parsed[1]
            for _, v in pairs:
                no_nested_dups(v)
            return list(pairs)
        if isinstance(parsed, dict):
            for v in parsed.values():
                no_nested_dups(v)
            return list(parsed.items())
        if isinstance(parsed, list):
            if all(isinstance(d, dict) for d in parsed):
                return [("add", {"doc": d}) for d in parsed]
        raise ValueError("cannot parse /update body")
    if isinstance(body, list):
        if all(isinstance(d, dict) and "doc" not in d for d in body):
            return [("add", {"doc": d}) for d in body]
        raise ValueError(
            "/update list body must be bare documents (the JSON-array form)"
        )
    if isinstance(body, dict):
        return list(body.items())
    raise ValueError(f"unsupported /update body type {type(body).__name__}")


def solr_update(
    spark: SparkSession,
    index_dir: str,
    cfg: BuildConfig,
    body: str | list | dict,
    *,
    unique_key: str | None = None,
) -> dict[str, Any]:
    """Execute one /update request. See module docstring for semantics."""
    from ..plans.manifest import read_manifest_data
    from ..streaming.incremental import append_batch

    live = (read_manifest_data(index_dir) or {}).get("build_id")
    if live is not None and live != cfg.build_id:
        # a different build_id makes Manifest discard the index's step
        # history (doc-id cursor included) -- appending under it would
        # silently restart doc ids at 0
        raise ValueError(
            f"/update: cfg.build_id {cfg.build_id!r} != index build_id "
            f"{live!r} (pass the BuildConfig the index was built with)"
        )
    t0 = time.monotonic()
    cmds = parse_update_body(body)
    bad = [op for op, _ in cmds if op not in _OPS]
    if bad:
        raise ValueError(f"unsupported /update commands: {sorted(set(bad))}")

    counts = {"adds": 0, "deletes": 0, "commits": 0, "optimizes": 0}
    pending: list[tuple[dict, bool]] = []  # (doc, overwrite), flushed in order

    def flush_adds():
        if not pending:
            return
        docs = [d for d, _ in pending]
        if unique_key is not None:
            missing = [d for d in docs if unique_key not in d]
            if missing:
                raise ValueError(
                    f"/update add: docs missing uniqueKey {unique_key!r}"
                )
            over_keys = [d[unique_key] for d, ow in pending if ow]
            if over_keys:
                idx = BM25Index(spark, index_dir)
                if unique_key not in idx.docs().columns:
                    raise ValueError(
                        f"uniqueKey {unique_key!r} is not a stored field"
                    )
                ks = ", ".join(repr(k) for k in set(over_keys))
                counts["deletes"] += idx.delete_by_query(
                    f"{unique_key} IN ({ks})"
                )
        # adds must carry exactly the index's input fields -- a drifting
        # schema would union into the docs parquet silently (fail loud,
        # Solr rejects unknown fields on a closed schema too)
        idx0 = BM25Index(spark, index_dir)
        expected = [c for c in idx0.docs().columns
                    if c not in ("doc_id", "dl", "segment_id", "tfmap")]
        for d in docs:
            if sorted(d) != sorted(expected):
                raise ValueError(
                    f"/update add: doc fields {sorted(d)} != index input "
                    f"fields {sorted(expected)}"
                )
        batch = spark.createDataFrame(
            [tuple(d[c] for c in expected) for d in docs],
            idx0.docs().select(*expected).schema,
        )
        from ..streaming.incremental import next_batch_id

        nxt = next_batch_id(index_dir)
        if not append_batch(batch, index_dir, cfg, batch_id=nxt):
            raise RuntimeError(f"/update: batch id {nxt} already committed")
        counts["adds"] += len(docs)
        pending.clear()

    for op, payload in cmds:
        if op == "add":
            # a list payload is the Python-side spelling (dicts can't
            # repeat the "add" key the way the JSON wire format does)
            adds = payload if isinstance(payload, list) else [payload]
            for a in adds:
                if not isinstance(a, dict) or "doc" not in a:
                    raise ValueError('/update add needs {"doc": {...}}')
                extra = set(a) - {"doc", "overwrite", "commitWithin"}
                if extra:
                    raise ValueError(
                        f"/update add: unsupported keys {sorted(extra)}"
                    )
                # Solr's default is overwrite=true; without a unique_key
                # that contract can't be honored -- fail loud rather than
                # silently appending duplicates
                ow = bool(a.get("overwrite", True))
                if ow and unique_key is None:
                    raise ValueError(
                        "/update add with overwrite needs unique_key= "
                        '(or pass "overwrite": false for append-only adds)'
                    )
                pending.append((dict(a["doc"]), ow))
        elif op == "delete":
            flush_adds()  # order matters: adds before this delete land first
            idx = BM25Index(spark, index_dir)
            # accepted shapes (Solr's + the Python list-of-commands
            # spelling): {"query": s} | {"id": v} | "id" | [ids or
            # command dicts]
            items = payload if isinstance(payload, list) else [payload]
            for it in items:
                if isinstance(it, dict) and "query" in it:
                    if "id" in it:
                        raise ValueError(
                            "/update delete: a command takes query OR id, "
                            "not both"
                        )
                    counts["deletes"] += idx.delete_by_query(str(it["query"]))
                    continue
                did = it.get("id") if isinstance(it, dict) else it
                if did is None:
                    raise ValueError(f"/update delete: bad payload {it!r}")
                if unique_key is None:
                    raise ValueError("/update delete-by-id needs unique_key=")
                dids = did if isinstance(did, list) else [did]
                ks = ", ".join(repr(i) for i in dids)
                counts["deletes"] += idx.delete_by_query(
                    f"{unique_key} IN ({ks})"
                )
        elif op == "commit":
            flush_adds()
            counts["commits"] += 1
        else:  # optimize
            flush_adds()
            from ..index.merge import merge_postings

            merge_postings(spark, index_dir)
            counts["optimizes"] += 1
    flush_adds()

    return {
        "responseHeader": {
            "status": 0,
            "QTime": int((time.monotonic() - t0) * 1000),
        },
        **counts,
    }
