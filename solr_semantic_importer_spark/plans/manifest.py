"""Build manifest: resumable checkpoints + per-partition lineage & metrics.

The parquet-backed stand-in for Iceberg snapshot lineage (no Iceberg runtime
jar is available offline; the seam is documented in SURVEY.md section 7 M0).
Semantics it reproduces from the reference:

- soft/hard commit visibility (solrconfig.xml:292-306, SolrAdminActions
  commit at SolrSemanticIndexer.java:108-112): a build step is visible iff
  its manifest entry is committed; writers write to their own directory
  first, then commit the entry (write-audit-publish).
- crawl tracking/metrics (tracker/IndexingTracker.java:25-30,114-133):
  each step records row counts, bytes and duration -> postings/sec,
  bytes/partition, skew factor are derivable per build.
- resume: a re-run with the same build_id skips committed steps
  (idempotence analog of the reference's run-twice integration test,
  SolrIndexerIntegrationTest.java:69-92).

The manifest is a JSON file updated via atomic rename; at cluster scale the
same protocol runs against an object store with conditional puts, or is
replaced outright by Iceberg snapshot commits (the code seam: Manifest).
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import asdict, dataclass, field


@dataclass
class StepRecord:
    name: str
    status: str = "pending"  # pending | committed
    rows: int = 0
    bytes: int = 0
    duration_sec: float = 0.0
    metrics: dict = field(default_factory=dict)


class Manifest:
    def __init__(self, index_dir: str, build_id: str):
        self.path = os.path.join(index_dir, "_manifest.json")
        self.index_dir = index_dir
        self.build_id = build_id
        self.steps: dict[str, StepRecord] = {}
        self._load()

    def _load(self) -> None:
        if os.path.exists(self.path):
            with open(self.path) as f:
                data = json.load(f)
            if data.get("build_id") == self.build_id:
                self.steps = {
                    k: StepRecord(**v) for k, v in data.get("steps", {}).items()
                }
            # different build_id -> fresh build; old steps are not reusable

    def _flush(self) -> None:
        data = {
            "build_id": self.build_id,
            "steps": {k: asdict(v) for k, v in self.steps.items()},
        }
        fd, tmp = tempfile.mkstemp(dir=self.index_dir, prefix="._manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(data, f, indent=1)
        os.replace(tmp, self.path)

    def is_committed(self, name: str) -> bool:
        s = self.steps.get(name)
        return s is not None and s.status == "committed"

    def commit(self, name: str, rows: int = 0, bytes_: int = 0,
               duration_sec: float = 0.0, **metrics) -> None:
        self.steps[name] = StepRecord(
            name=name, status="committed", rows=rows, bytes=bytes_,
            duration_sec=duration_sec, metrics=metrics,
        )
        self._flush()

    def run_step(self, name: str, fn):
        """Run fn() unless already committed; fn returns (rows, bytes, metrics)."""
        if self.is_committed(name):
            return False
        t0 = time.monotonic()
        rows, nbytes, metrics = fn()
        self.commit(name, rows, nbytes, time.monotonic() - t0, **metrics)
        return True


HISTORY_MAX = 100  # reference: indexer.max-history-size (application.yml:35-36)


class BuildHistory:
    """A4: ring buffer of the last HISTORY_MAX build summaries
    (IndexingTracker.java:165-174 keeps the last 100 job statuses)."""

    def __init__(self, index_dir: str):
        self.path = os.path.join(index_dir, "_history.json")
        self.index_dir = index_dir

    def record(self, build_id: str, **summary) -> None:
        hist = self.entries()
        hist.append({"build_id": build_id, "recorded_at": time.time(), **summary})
        hist = hist[-HISTORY_MAX:]
        fd, tmp = tempfile.mkstemp(dir=self.index_dir, prefix="._history")
        with os.fdopen(fd, "w") as f:
            json.dump(hist, f, indent=1)
        os.replace(tmp, self.path)

    def entries(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return json.load(f)


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total
