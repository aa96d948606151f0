"""Index backup/restore -- the Solr ``/replication?command=backup`` +
Collections API BACKUP/RESTORE analog.

Solr's backup pins a Lucene commit point (IndexDeletionPolicy) and copies
the files that commit references; restore materializes a new core from
them. This engine's commit point IS the manifest version (plans/manifest.py
conditional-put protocol), so a backup is:

1. recover any interrupted merge swap, then read the LATEST committed
   manifest version V;
2. copy each relation's files, keeping only what V references: base-build
   files always (V's ``finalize``/merge steps own them), ``b<id>-``
   batch-prefixed files only for batch ids COMMITTED in V (an in-flight
   append's staged/moved files are excluded -- the restored index is
   exactly the V view, never a torn batch);
3. write V's manifest data as the backup's version 1 -- the backup is a
   self-contained, immediately-openable index dir with a fresh version
   lineage.

Excluded by design: ``topics/`` consumer checkpoints (operational state of
downstream readers, not index data -- Solr backups likewise carry the
index, not client cursors), ``_history.json`` (runtime ring buffer),
staging/swap leftovers, ``.crc``/dot files and ``_SUCCESS`` markers.

Concurrency contract: single writer quiesced during the copy (Solr's
backup holds the commit point but also assumes the files it pins stay
put; here a concurrent MERGE could swap a relation dir mid-copy). Readers
are unaffected. Restore targets an empty/new directory and never touches
a live index.

Scale note: at 10^12 turns this file-copy loop is the LOCAL-FS seam of
the object-store reality (same as plans/manifest.py): on S3/HDFS backup
is a manifest-pinned server-side copy of the same file set, embarrassingly
parallel per file; the selection logic (committed-batch filter + manifest
rewrite) is identical.
"""

from __future__ import annotations

import os
import re
import shutil

from ..plans.manifest import (
    _conditional_put,
    _latest_version,
    read_manifest_data,
)

__all__ = ["backup_index", "restore_index"]

_BATCH_FILE_RE = re.compile(r"^b(\d+)-")
_SKIP_DIR_RE = re.compile(r"^(_staging_|topics$)|\.(merge|old)$")


def _committed_batches(data: dict) -> set[int]:
    return {
        int(name.split("-", 1)[1])
        for name, st in (data.get("steps") or {}).items()
        if name.startswith("batch-") and st.get("status") == "committed"
    }


def backup_index(
    index_dir: str, backup_dir: str, base_backup: str | None = None
) -> dict:
    """Snapshot ``index_dir``'s latest committed manifest version into
    ``backup_dir`` (must not already contain a backup). Returns
    ``{"manifest_version", "files", "bytes", "linked"}``.

    ``base_backup``: a previous backup to take an INCREMENTAL snapshot
    against (Solr 8.9+ incremental backups): a file whose relpath + size
    match the base is hard-linked instead of copied -- correct because
    every relation file is immutable once published (parquet part names
    are write-unique; merges swap whole directories, they never rewrite a
    file in place), so name+size identity is content identity. Cost is
    O(delta files); on an object store this maps to the shared-repository
    file reuse Solr's incremental backups do."""
    from ..index.merge import recover_interrupted_swap

    recover_interrupted_swap(index_dir)
    ver = _latest_version(index_dir)
    data = read_manifest_data(index_dir)
    if not ver or data is None:
        raise ValueError(f"{index_dir!r} has no committed manifest to back up")
    if data.get("generation"):
        # generation-pointer manifest: the real index lives in the subdir
        return backup_index(
            os.path.join(index_dir, data["generation"]), backup_dir,
            base_backup=base_backup)
    if os.path.exists(os.path.join(backup_dir, "_manifest.v1.json")):
        raise ValueError(f"{backup_dir!r} already holds a backup")
    if base_backup is not None and not os.path.exists(
            os.path.join(base_backup, "_manifest.v1.json")):
        raise ValueError(f"base_backup {base_backup!r} is not a backup")
    committed = _committed_batches(data)
    os.makedirs(backup_dir, exist_ok=True)
    n_files = n_bytes = n_linked = 0
    for entry in sorted(os.listdir(index_dir)):
        src = os.path.join(index_dir, entry)
        if not os.path.isdir(src) or _SKIP_DIR_RE.search(entry):
            continue  # manifests/history handled below; state dirs skipped
        for root, dirs, files in os.walk(src):
            dirs[:] = [d for d in dirs if not _SKIP_DIR_RE.search(d)]
            rel_root = os.path.relpath(root, index_dir)
            for f in files:
                if f.startswith(".") or f == "_SUCCESS":
                    continue
                m = _BATCH_FILE_RE.match(f)
                if m and int(m.group(1)) not in committed:
                    continue  # torn/in-flight batch: not part of version V
                sp = os.path.join(root, f)
                dst_dir = os.path.join(backup_dir, rel_root)
                os.makedirs(dst_dir, exist_ok=True)
                dp = os.path.join(dst_dir, f)
                bp = (os.path.join(base_backup, rel_root, f)
                      if base_backup is not None else None)
                if (bp is not None and os.path.exists(bp)
                        and os.path.getsize(bp) == os.path.getsize(sp)):
                    try:
                        os.link(bp, dp)  # immutable file: share it
                        n_linked += 1
                        continue
                    except OSError:
                        pass  # cross-device: fall through to a copy
                shutil.copy2(sp, dp)
                n_files += 1
                n_bytes += os.path.getsize(sp)
    # V's data becomes the backup's version 1 (fresh lineage)
    _conditional_put(backup_dir, 0, data)
    return {"manifest_version": ver, "files": n_files, "bytes": n_bytes,
            "linked": n_linked}


def restore_index(backup_dir: str, dest_dir: str) -> str:
    """Materialize a backup as a new index dir (Collections API RESTORE).
    ``dest_dir`` must not exist or be empty; returns it. The restored dir
    is byte-identical to the backup (which is itself a valid index dir --
    restore exists so the backup can stay immutable while the restored
    copy takes writes)."""
    if not os.path.exists(os.path.join(backup_dir, "_manifest.v1.json")):
        raise ValueError(f"{backup_dir!r} is not a backup (no manifest)")
    if os.path.exists(dest_dir) and os.listdir(dest_dir):
        raise ValueError(f"restore target {dest_dir!r} is not empty")
    shutil.copytree(backup_dir, dest_dir, dirs_exist_ok=True)
    # sanity: the restored manifest parses and references its steps
    data = read_manifest_data(dest_dir)
    if data is None or not data.get("steps"):
        raise RuntimeError(f"restored manifest unreadable in {dest_dir!r}")
    return dest_dir
