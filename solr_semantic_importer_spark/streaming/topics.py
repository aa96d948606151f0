"""Solr ``topic()`` pub/sub streams + the ``daemon()`` runner.

Solr's TopicStream (streaming expressions) is checkpointed pub/sub over an
index: each run returns the docs matching ``q`` that arrived AFTER the
topic's persisted checkpoint, then advances the checkpoint; ``daemon(...,
update(dest, topic(...)))`` loops that pipeline, which is how Solr users
build incremental index-to-index ETL. The reference's crawl loop is the
batch cousin of exactly this shape (SolrSemanticIndexer.java:132-183 polls
a source collection and pushes to a destination).

Engine adaptation (documented):

- Solr checkpoints ``_version_`` high-water marks per shard, stored as a
  document in the checkpoint collection. This engine's doc ids are
  monotone with append order (every ``append_batch`` allocates the next
  contiguous range from the manifest -- streaming/incremental.py), so ONE
  doc-id high-water mark is the complete checkpoint, stored as a
  conditional-put versioned JSON under
  ``<checkpoint collection dir>/topics/<id>/`` (the same create-exclusive
  protocol as the index manifest: concurrent committers of the same
  window resolve to exactly one winner -- a second consumer replaying the
  window gets ``ManifestConflictError`` instead of silently double-
  advancing).
- Delivery: :meth:`TopicStream.poll` returns the window ``[checkpoint,
  high_water)`` WITHOUT advancing; :meth:`TopicStream.commit` advances
  (at-least-once, Solr's own topic guarantee). :func:`run_daemon`
  upgrades the topic->update pipeline to EXACTLY-ONCE with a two-phase
  checkpoint (intent record pinning window bounds + destination batch id,
  then the idempotent append, then the seal -- see its docstring).

Plan shape at 10^12 turns: the window predicate ``doc_id >= ck`` is a
plain comparison on the postings-decode output (and on the docs scan for
``*:*`` topics); new docs live in the NEWEST segments, whose per-segment
doc-id ranges the bucketed parquet layout keeps together, so the scan cost
tracks the window size, not corpus size. The high-water mark is one
max(doc_id) over parquet footer statistics.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, functions as F

from ..plans.manifest import (
    _conditional_put,
    _latest_version,
    read_manifest_data,
)
from ..query.engine import BM25Index

__all__ = ["TopicStream", "run_daemon"]


class TopicStream:
    """One named topic over ``idx``: poll/commit cycles deliver each doc
    matching ``q`` exactly once (per committed checkpoint lineage)."""

    def __init__(
        self,
        idx: BM25Index,
        checkpoint_idx: BM25Index,
        topic_id: str,
        q: str,
        fl: list[str] | None = None,
        initial_checkpoint: int = 0,
    ):
        if not topic_id:
            raise ValueError("topic id required")
        self.idx = idx
        self.q = str(q)
        self.fl = list(fl) if fl else None
        # anchor checkpoints at the collection ROOT, not data_dir: a
        # compaction re-roots data_dir to <root>/gen-N/, which would
        # orphan every topic checkpoint (and generation GC would delete
        # them) -- the root survives compactions
        self.ckpt_dir = os.path.join(
            checkpoint_idx.index_dir, "topics", str(topic_id))
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.initial = int(initial_checkpoint)
        self._pending_hi: int | None = None
        self._version: int | None = None

    # -- checkpoint state -------------------------------------------------------

    def checkpoint(self) -> int:
        """The committed next-doc-id to deliver from (initialCheckpoint
        when the topic has never committed)."""
        self._version = _latest_version(self.ckpt_dir)
        data = read_manifest_data(self.ckpt_dir) if self._version else None
        return self.initial if data is None else int(data["checkpoint"])

    def high_water(self) -> int:
        """Current exclusive upper bound: max assigned doc_id + 1 (one
        footer-statistics max over the docs relation)."""
        row = self.idx.docs().agg(F.max("doc_id").alias("m")).first()
        return 0 if row["m"] is None else int(row["m"]) + 1

    # -- the poll/commit cycle --------------------------------------------------

    def window(self, ck: int, hi: int) -> DataFrame:
        """Docs matching ``q`` with ``ck <= doc_id < hi``, doc_id
        ascending (Solr topics emit in _version_ order), projected to
        ``fl`` + doc_id."""
        if self.q.strip() == "*:*":
            matches = self.idx._anti_dead(
                self.idx.docs().select("doc_id"))
        else:
            matches = self.idx.score_matches(self.q).select("doc_id")
        win = matches.filter(
            (F.col("doc_id") >= int(ck)) & (F.col("doc_id") < int(hi)))
        # default projection = the STORED fields; dl/segment_id/tfmap are
        # internal index state and never belong in a /stream tuple
        cols = [c for c in (self.fl or self.idx.docs().columns)
                if c not in ("doc_id", "tfmap", "dl", "segment_id")]
        bad = [c for c in cols if c not in self.idx.docs().columns]
        if bad:
            raise ValueError(f"topic fl fields not stored: {bad}")
        out = win.join(self.idx.docs().select("doc_id", *cols), "doc_id")
        return out.orderBy("doc_id")

    def poll(self) -> DataFrame:
        """The next undelivered window. Does NOT advance the checkpoint --
        call :meth:`commit` after the window is durably processed."""
        ck = self.checkpoint()
        hi = self.high_water()
        self._pending_hi = hi
        return self.window(ck, hi)

    def commit(self) -> int:
        """Advance the checkpoint to the last :meth:`poll`'s high-water
        mark (conditional put: a concurrent commit of the same window
        raises ManifestConflictError -- exactly one consumer wins)."""
        if self._pending_hi is None:
            raise RuntimeError("topic commit() without a prior poll()")
        ver = self._version if self._version is not None else 0
        _conditional_put(
            self.ckpt_dir, ver,
            {"checkpoint": int(self._pending_hi), "q": self.q},
        )
        self._version = ver + 1
        self._pending_hi = None
        return self._version


def run_daemon(
    idx: BM25Index,
    expr: str,
    collections: dict[str, BM25Index] | None = None,
    max_runs: int = 1,
) -> list[dict]:
    """Solr ``daemon(id=, runInterval=, terminate=, update(dest,
    topic(...)))``: loop the inner topic->update pipeline, EXACTLY-ONCE
    end-to-end via a two-phase checkpoint:

    1. *intent*: conditional-put ``{checkpoint: ck, pending_hi: hi,
       batch_id: B}`` (B = the destination's next free batch slot) --
       claims the window and pins its destination identity;
    2. *land*: ``update()`` the window as batch B (manifest-committed,
       idempotent per id);
    3. *seal*: conditional-put ``{checkpoint: hi}``.

    A crash after (1) replays with the SAME window bounds and the SAME
    batch id, so the re-append is a no-op and the seal completes -- no
    window is ever skipped or double-indexed, at any crash point. The
    conditional puts also serialize concurrent daemons on one topic:
    exactly one claims each window. Single-writer destination assumed
    while a claim is pending (another writer taking slot B would make the
    replay collide loudly, not silently).

    ``terminate=true`` (Solr semantics) stops when a poll returns no rows;
    otherwise the loop runs ``max_runs`` iterations, sleeping
    ``runInterval`` ms between them (capped at 1s -- this runner is the
    test/driver harness; production pacing is a scheduler concern).
    Returns one ``{"batchIndexed": n, "iteration": i}`` per non-empty
    iteration."""
    from ..query.stream_expr import (
        Call, TupleStream, _require_params, _resolve, _update_sink,
        next_batch_id, parse_stream_expr,
    )

    c = parse_stream_expr(expr)
    if c.name != "daemon":
        raise ValueError("run_daemon needs a daemon(...) expression")
    _require_params(c, {"id"}, {"runInterval", "terminate"})
    if len(c.args) != 1 or not isinstance(c.args[0], Call) \
            or c.args[0].name != "update":
        raise ValueError("daemon() wraps exactly one update(dest, topic())")
    upd = c.args[0]
    if len(upd.args) != 2 or not isinstance(upd.args[1], Call) \
            or upd.args[1].name != "topic":
        raise ValueError("daemon update() must wrap a topic() source")
    dest = _resolve(upd.args[0], idx, collections)
    top = upd.args[1]
    _require_params(top, {"id", "q"}, {"fl", "initialCheckpoint"})
    if len(top.args) != 2:
        raise ValueError("topic(checkpointCollection, collection, ...)")
    ckpt_idx = _resolve(top.args[0], idx, collections)
    src_idx = _resolve(top.args[1], idx, collections)
    fl = top.params.get("fl")
    ts = TopicStream(
        src_idx, ckpt_idx, str(top.params["id"]), str(top.params["q"]),
        fl=[f.strip() for f in str(fl).split(",")] if fl else None,
        initial_checkpoint=int(top.params.get("initialCheckpoint", 0)),
    )
    terminate = str(c.params.get("terminate", "false")).lower() == "true"
    interval_s = min(int(c.params.get("runInterval", 0)), 1000) / 1000.0
    out: list[dict] = []
    for i in range(int(max_runs)):
        ver = _latest_version(ts.ckpt_dir)
        data = read_manifest_data(ts.ckpt_dir) if ver else None
        ck = ts.initial if data is None else int(data["checkpoint"])
        if data is not None and "pending_hi" in data:
            hi, bid = int(data["pending_hi"]), int(data["batch_id"])  # replay
        else:
            hi, bid = ts.high_water(), next_batch_id(dest)
            if hi > ck:
                _conditional_put(ts.ckpt_dir, ver, {
                    "checkpoint": ck, "pending_hi": hi, "batch_id": bid,
                    "q": ts.q,
                })
                ver += 1
        win = ts.window(ck, hi) if hi > ck else None
        if win is None or not win.take(1):
            if hi > ck:  # claimed but empty: seal forward
                _conditional_put(ts.ckpt_dir, ver, {"checkpoint": hi,
                                                    "q": ts.q})
            if terminate:
                break
            if interval_s and i + 1 < max_runs:
                time.sleep(interval_s)
            continue
        res = _update_sink(dest, TupleStream(win, (("doc_id", "asc"),)),
                           batch_id=bid)
        n = res.df.first()["totalIndexed"]
        _conditional_put(ts.ckpt_dir, ver, {"checkpoint": hi, "q": ts.q})
        out.append({"batchIndexed": int(n), "iteration": i})
        if interval_s and i + 1 < max_runs:
            time.sleep(interval_s)
    return out
