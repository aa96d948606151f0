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

Commit protocol (object-store-safe): every flush writes an IMMUTABLE
versioned file ``_manifest.v<N>.json`` via create-exclusive -- the local-FS
realization of an object store's conditional put (if-none-match) / DynamoDB
conditional write; Iceberg's snapshot commit is the same shape. Two racing
writers both target version N+1; exactly one create succeeds, the loser gets
:class:`ManifestConflictError` and must reload before retrying. Readers
resolve the HIGHEST version, so they only ever observe fully-written
manifests. ``_manifest.json`` is maintained as a human/legacy convenience
pointer via atomic rename (never the source of truth when version files
exist).

Compaction publishes through the same seam: the new index is built into an
immutable ``gen-<id>/`` subdirectory and :func:`publish_generation` commits
a pointer manifest {"generation": "gen-<id>"} as the next version -- no
directory rename of live data anywhere (query/engine.py BM25Index re-roots
on the pointer).
"""

from __future__ import annotations

import json
import os
import re
import tempfile
import time
from dataclasses import asdict, dataclass, field

_VERSION_RE = re.compile(r"^_manifest\.v(\d+)\.json$")


class ManifestConflictError(RuntimeError):
    """A concurrent writer committed the manifest version this writer
    targeted (conditional put failed). Reload and retry, or abort."""


def _latest_version(index_dir: str) -> int:
    best = 0
    try:
        names = os.listdir(index_dir)
    except FileNotFoundError:
        return 0
    for n in names:
        m = _VERSION_RE.match(n)
        if m:
            best = max(best, int(m.group(1)))
    return best


def read_manifest_data(index_dir: str) -> dict | None:
    """Highest committed manifest version (or the legacy pointer file)."""
    ver = _latest_version(index_dir)
    path = (
        os.path.join(index_dir, f"_manifest.v{ver}.json")
        if ver
        else os.path.join(index_dir, "_manifest.json")
    )
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


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
        self._version = _latest_version(self.index_dir)
        data = read_manifest_data(self.index_dir)
        if data is not None and data.get("build_id") == self.build_id:
            self.steps = {
                k: StepRecord(**v) for k, v in data.get("steps", {}).items()
            }
        # different build_id -> fresh build; old steps are not reusable

    def _flush(self) -> None:
        data = {
            "build_id": self.build_id,
            "steps": {k: asdict(v) for k, v in self.steps.items()},
        }
        self._version = _conditional_put(self.index_dir, self._version, data)

    def reload(self) -> None:
        """Re-read the latest committed version (after a conflict)."""
        self.steps = {}
        self._load()

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


def _conditional_put(index_dir: str, expected_version: int, data: dict) -> int:
    """Commit ``data`` as version expected_version+1 via create-exclusive.
    Returns the committed version; raises ManifestConflictError if another
    writer got there first (the conditional-put failure mode)."""
    nxt = expected_version + 1
    vpath = os.path.join(index_dir, f"_manifest.v{nxt}.json")
    try:
        fd = os.open(vpath, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
    except FileExistsError:
        raise ManifestConflictError(
            f"manifest version {nxt} already committed by a concurrent "
            f"writer in {index_dir}; reload and retry"
        ) from None
    with os.fdopen(fd, "w") as f:
        json.dump(data, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    # best-effort human/legacy pointer; version files are the truth
    fd2, tmp = tempfile.mkstemp(dir=index_dir, prefix="._manifest")
    with os.fdopen(fd2, "w") as f:
        json.dump(data, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, "_manifest.json"))
    return nxt


def publish_generation(index_dir: str, gen: str) -> None:
    """Atomically point ``index_dir`` at the immutable generation subdir
    ``gen`` (copy-then-commit compaction: data was fully written under
    ``<index_dir>/<gen>/`` first; this is the only publish step). Raises
    ManifestConflictError if a concurrent publisher won -- the loser's
    generation directory is simply never referenced."""
    cur = read_manifest_data(index_dir) or {}
    _conditional_put(
        index_dir,
        _latest_version(index_dir),
        {"build_id": cur.get("build_id", "generation-pointer"), "generation": gen},
    )


def referenced_generations(index_dir: str, keep_versions: int = 2) -> set[str]:
    """Generations referenced by the newest ``keep_versions`` manifest
    versions (a reader holding any of those manifests can still be live)."""
    latest = _latest_version(index_dir)
    gens: set[str] = set()
    for v in range(max(1, latest - keep_versions + 1), latest + 1):
        path = os.path.join(index_dir, f"_manifest.v{v}.json")
        if os.path.exists(path):
            with open(path) as f:
                g = json.load(f).get("generation")
            if g:
                gens.add(g)
    return gens


def prune_generations(index_dir: str, keep_versions: int = 2) -> list[str]:
    """GC superseded compaction generations: delete ``gen-*`` subdirectories
    not referenced by the newest ``keep_versions`` manifest versions
    (Iceberg's expire-snapshots analog). The pre-compaction relations at the
    index ROOT are never touched -- they are the rollback basis for wiping
    every generation pointer. Returns the removed directory names."""
    import shutil

    keep = referenced_generations(index_dir, keep_versions)
    removed = []
    for name in sorted(os.listdir(index_dir)):
        full = os.path.join(index_dir, name)
        if name.startswith("gen-") and os.path.isdir(full) and name not in keep:
            shutil.rmtree(full, ignore_errors=True)
            removed.append(name)
    return removed


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
