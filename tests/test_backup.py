"""backup_index / restore_index: manifest-version-pinned snapshots
(Solr /replication backup + Collections API RESTORE analog)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.index.backup import (
    backup_index,
    restore_index,
)
from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.plans.manifest import read_manifest_data
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.sources.transcripts import (
    generate_transcripts,
)
from solr_semantic_importer_spark.streaming.incremental import append_batch

CFG = dict(segment_size=64, block_size=16, n_term_buckets=4,
           hot_df_threshold=40, hot_salts=4)
STORED = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _mk_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bksrc"))
    build_index(spark, generate_transcripts(
        spark, n_convs=10, turns_per_conv=4, seed=41), d,
        BuildConfig(build_id="bk", **CFG))
    idx = BM25Index(spark, d)
    batch = generate_transcripts(
        spark, n_convs=3, turns_per_conv=4, seed=42
    ).withColumn("conv_id", F.concat(F.lit("x"), F.col("conv_id")))
    assert append_batch(batch.select(*STORED), d,
                        idx._config_from_manifest("bk"), batch_id=0)
    idx = BM25Index(spark, d)
    idx.delete_by_query("role = 'tool' AND turn_idx = 0")
    return d, BM25Index(spark, d)


def _results(idx, q="error call"):
    return [(r["doc_id"], r["score"])
            for r in idx.search(q, k=20, use_cache=False).collect()]


def test_backup_restore_roundtrip(spark, tmp_path_factory):
    d, idx = _mk_index(spark, tmp_path_factory)
    at_backup = _results(idx)
    n_at_backup = idx.docs().count()
    bdir = str(tmp_path_factory.mktemp("bk")) + "/snap"
    info = backup_index(d, bdir)
    assert info["files"] > 0 and info["bytes"] > 0
    assert info["manifest_version"] >= 1

    # mutate the original AFTER the backup
    batch = generate_transcripts(
        spark, n_convs=2, turns_per_conv=4, seed=43
    ).withColumn("conv_id", F.concat(F.lit("y"), F.col("conv_id")))
    append_batch(batch.select(*STORED), d,
                 idx._config_from_manifest("bk"), batch_id=1)
    BM25Index(spark, d).delete_by_query("role = 'user'")
    assert _results(BM25Index(spark, d)) != at_backup  # original moved on

    # the backup is itself an openable index pinned at backup time
    bidx = BM25Index(spark, bdir)
    assert bidx.docs().count() == n_at_backup
    assert _results(bidx) == at_backup

    # restore elsewhere: identical again, and writable independently
    rdir = str(tmp_path_factory.mktemp("bkr")) + "/restored"
    restore_index(bdir, rdir)
    ridx = BM25Index(spark, rdir)
    assert _results(ridx) == at_backup
    ridx.delete_by_query("role = 'assistant'")
    assert _results(BM25Index(spark, bdir)) == at_backup  # backup untouched


def test_backup_excludes_torn_batch(spark, tmp_path_factory):
    d, idx = _mk_index(spark, tmp_path_factory)
    n = idx.docs().count()
    # simulate a crash mid-append: moved-in files of an UNCOMMITTED batch
    seg0 = os.path.join(d, "docs", "segment_id=0")
    src = [f for f in os.listdir(seg0) if f.startswith("b0-")][0]
    shutil.copy2(os.path.join(seg0, src),
                 os.path.join(seg0, "b7-" + src[3:]))
    assert BM25Index(spark, d).docs().count() > n  # torn batch IS visible
    bdir = str(tmp_path_factory.mktemp("bk2")) + "/snap"
    backup_index(d, bdir)
    # ... but the backup pins the committed view only
    assert BM25Index(spark, bdir).docs().count() == n
    data = read_manifest_data(bdir)
    assert "batch-0" in data["steps"] and "batch-7" not in data["steps"]


def test_backup_restore_fail_loud(spark, tmp_path_factory):
    d, _ = _mk_index(spark, tmp_path_factory)
    bdir = str(tmp_path_factory.mktemp("bk3")) + "/snap"
    backup_index(d, bdir)
    with pytest.raises(ValueError, match="already holds a backup"):
        backup_index(d, bdir)
    empty = str(tmp_path_factory.mktemp("bk4"))
    with pytest.raises(ValueError, match="no committed manifest"):
        backup_index(empty, empty + "/snap")
    with pytest.raises(ValueError, match="not a backup"):
        restore_index(empty, empty + "/dest")
    occupied = str(tmp_path_factory.mktemp("bk5"))
    with open(os.path.join(occupied, "junk"), "w") as fh:
        fh.write("x")
    with pytest.raises(ValueError, match="not empty"):
        restore_index(bdir, occupied)


def test_incremental_backup_links_unchanged_files(spark, tmp_path_factory):
    d, idx = _mk_index(spark, tmp_path_factory)
    b1 = str(tmp_path_factory.mktemp("bki")) + "/full"
    info1 = backup_index(d, b1)
    assert info1["linked"] == 0 and info1["files"] > 0

    # new arrivals on the live index, then an incremental snapshot
    batch = generate_transcripts(
        spark, n_convs=2, turns_per_conv=4, seed=45
    ).withColumn("conv_id", F.concat(F.lit("z"), F.col("conv_id")))
    append_batch(batch.select(*STORED), d,
                 idx._config_from_manifest("bk"), batch_id=1)
    live = BM25Index(spark, d)
    at_b2 = _results(live)
    b2 = str(tmp_path_factory.mktemp("bki2")) + "/incr"
    info2 = backup_index(d, b2, base_backup=b1)
    # the base's files are shared, only the delta is copied
    assert info2["linked"] >= info1["files"] - 2  # stats rows may change
    assert 0 < info2["files"] < info1["files"]
    # the incremental backup is complete and pinned at its own time
    assert _results(BM25Index(spark, b2)) == at_b2
    # the base backup still reflects ITS time
    assert BM25Index(spark, b1).docs().count() < live.docs().count()
    with pytest.raises(ValueError, match="not a backup"):
        backup_index(d, b2 + "x", base_backup=str(tmp_path_factory.mktemp("e")))
