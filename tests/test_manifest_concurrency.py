"""Object-store-safe commits: conditional-put manifest versions + generation
publish. Two racing writers -> exactly one wins; readers never observe a
half-committed index."""

import os

import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.plans.manifest import (
    Manifest,
    ManifestConflictError,
    _conditional_put,
    _latest_version,
    publish_generation,
    read_manifest_data,
)
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


def test_conditional_put_two_writers_one_wins(tmp_path):
    d = str(tmp_path)
    a = Manifest(d, "b1")
    b = Manifest(d, "b1")  # loaded at the same version as a
    a.commit("s1", rows=1)
    with pytest.raises(ManifestConflictError):
        b.commit("s2", rows=2)  # targets the version a already took
    # loser reloads, sees the winner's commit, then retries successfully
    b.reload()
    assert b.is_committed("s1")
    b.commit("s2", rows=2)
    fresh = Manifest(d, "b1")
    assert fresh.is_committed("s1") and fresh.is_committed("s2")
    assert _latest_version(d) == 2


def test_versions_are_immutable_and_readers_see_latest(tmp_path):
    d = str(tmp_path)
    m = Manifest(d, "b1")
    m.commit("s1", rows=1)
    v1 = os.path.join(d, "_manifest.v1.json")
    assert os.path.exists(v1)
    raw1 = open(v1).read()
    m.commit("s2", rows=2)
    assert open(v1).read() == raw1  # v1 never rewritten
    assert "s2" in (read_manifest_data(d) or {}).get("steps", {})


def test_racing_compaction_publish_one_wins(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=30, turns_per_conv=4, seed=21)
    idx_dir = str(tmp_path_factory.mktemp("race")) + "/idx"
    build_index(spark, df, idx_dir, BuildConfig(build_id="r0", **CFG))
    idx = BM25Index(spark, idx_dir)
    idx.delete_by_query("role = 'tool'")
    stale_version = _latest_version(idx_dir)  # both racers start here

    idx2 = idx.compact(BuildConfig(build_id="winner", **CFG))  # racer A wins
    assert "winner" in idx2.data_dir

    # racer B prepared its generation against the pre-compact version; its
    # conditional publish must FAIL, and its generation is never referenced
    with pytest.raises(ManifestConflictError):
        _conditional_put(
            idx_dir, stale_version,
            {"build_id": "loser", "generation": "gen-loser"},
        )
    reader = BM25Index(spark, idx_dir)
    assert reader.data_dir == idx2.data_dir  # winner's generation
    rows = reader.search("error in tool", k=5, with_stored=True).collect()
    assert rows and all(r["role"] != "tool" for r in rows)
    # the old (pre-compact) handle still reads its own complete generation
    assert idx.search("error in tool", k=5).count() == 5


def test_lifecycle_stream_merge_delete_compact_merge(spark, tmp_path_factory):
    """Full index lifecycle across every mutation path: streamed batches ->
    tiered merge -> majority delete -> generation-publish compaction ->
    merge of the live generation. Results stay consistent at each step."""
    from solr_semantic_importer_spark.index.merge import merge_postings
    from solr_semantic_importer_spark.streaming.incremental import append_batch

    df = generate_transcripts(spark, n_convs=40, turns_per_conv=5, seed=31)
    idx_dir = str(tmp_path_factory.mktemp("life")) + "/idx"
    cfg = BuildConfig(build_id="lf", **CFG)
    ordered = df.orderBy("conv_id", "turn_idx").collect()
    for i in range(4):
        chunk = spark.createDataFrame(ordered[i * 50 : (i + 1) * 50], df.schema)
        append_batch(chunk, idx_dir, cfg, i)

    idx = BM25Index(spark, idx_dir)
    q = "error in tool call"
    def res(ix):
        return [(r["doc_id"], round(r["score"], 6)) for r in ix.search(q, k=15).collect()]

    before = res(idx)
    merge_postings(spark, idx_dir, merge_id="m1")
    idx = BM25Index(spark, idx_dir)
    assert res(idx) == before

    n_del = idx.delete_by_query("role = 'tool'")
    assert n_del > 0
    live_rows = idx.search(q, k=15, with_stored=True).collect()
    assert live_rows and all(r["role"] != "tool" for r in live_rows)

    idx2 = idx.compact()  # config reconstructed from the streamed manifest
    assert idx2.data_dir != idx_dir  # generation published
    assert idx2.n_docs == df.filter(F.col("role") != "tool").count()
    # compacted == fresh build over the live subset (ids re-minted by the
    # same stable key order, so doc ids and scores match exactly)
    fresh_dir = str(tmp_path_factory.mktemp("life2")) + "/idx"
    build_index(spark, df.filter(F.col("role") != "tool"), fresh_dir,
                BuildConfig(build_id="lf2", **CFG))
    fresh = BM25Index(spark, fresh_dir)
    assert res(idx2) == res(fresh)

    # merge of the live GENERATION (path resolution through the pointer)
    stats = merge_postings(spark, idx_dir, merge_id="m2")
    assert stats["files_after"] <= stats["files_before"]
    assert res(BM25Index(spark, idx_dir)) == res(fresh)


def test_publish_generation_then_further_writes(spark, tmp_path_factory):
    """delete-by-query and re-compaction keep working after a publish (all
    paths re-rooted on the live generation)."""
    df = generate_transcripts(spark, n_convs=20, turns_per_conv=4, seed=22)
    idx_dir = str(tmp_path_factory.mktemp("gen2")) + "/idx"
    build_index(spark, df, idx_dir, BuildConfig(build_id="g0", **CFG))
    idx = BM25Index(spark, idx_dir)
    idx.delete_by_query("role = 'tool'")
    c1 = idx.compact(BuildConfig(build_id="c1", **CFG))
    # tombstones live under the generation now
    n = c1.delete_by_query("role = 'assistant'")
    assert n > 0
    assert os.path.exists(os.path.join(c1.data_dir, "tombstones"))
    c2 = c1.compact(BuildConfig(build_id="c2", **CFG))
    assert c2.data_dir != c1.data_dir
    rows = c2.search("error tool call", k=10, with_stored=True).collect()
    assert rows and all(r["role"] == "user" for r in rows)
    assert c2.n_docs == df.filter(F.col("role") == "user").count()


def test_merge_swap_crash_recovery(spark, tmp_path_factory):
    """A merge publish killed between _swap_in's two renames leaves the live
    relation dir MISSING (.old + complete .merge siblings present); opening
    the index must repair it and serve identical results (ADVICE r2)."""
    import shutil

    from solr_semantic_importer_spark.index.merge import recover_interrupted_swap

    df = generate_transcripts(spark, n_convs=20, turns_per_conv=4, seed=33)
    idx_dir = str(tmp_path_factory.mktemp("crash")) + "/idx"
    build_index(spark, df, idx_dir, BuildConfig(build_id="cr", **CFG))
    before = [
        (r["doc_id"], round(r["score"], 6))
        for r in BM25Index(spark, idx_dir).search("error tool", k=10).collect()
    ]

    # simulate the exact mid-swap crash window for the postings relation:
    # staging fully written, live renamed away, staged not yet promoted
    live = os.path.join(idx_dir, "postings")
    shutil.copytree(live, live + ".merge")
    os.replace(live, live + ".old")
    assert not os.path.exists(live)

    idx = BM25Index(spark, idx_dir)  # open repairs via recover_interrupted_swap
    assert os.path.exists(live)
    assert not os.path.exists(live + ".merge")
    got = [
        (r["doc_id"], round(r["score"], 6))
        for r in idx.search("error tool", k=10).collect()
    ]
    assert got == before
    # idempotent: a second recovery pass is a no-op
    assert recover_interrupted_swap(idx_dir) == []


def test_compact_prunes_superseded_generations(spark, tmp_path_factory):
    """Each compaction GCs generations no longer referenced by the newest
    manifest versions, so disk does not grow by a full index copy per
    compact (ADVICE r2). keep_versions=2 keeps the immediately-previous
    generation for readers holding the old manifest."""
    df = generate_transcripts(spark, n_convs=20, turns_per_conv=4, seed=34)
    idx_dir = str(tmp_path_factory.mktemp("gc")) + "/idx"
    build_index(spark, df, idx_dir, BuildConfig(build_id="g0", **CFG))
    idx = BM25Index(spark, idx_dir)
    c1 = idx.compact(BuildConfig(build_id="c1", **CFG))
    c2 = c1.compact(BuildConfig(build_id="c2", **CFG))
    c3 = c2.compact(BuildConfig(build_id="c3", **CFG))
    gens = sorted(
        n for n in os.listdir(idx_dir)
        if n.startswith("gen-") and os.path.isdir(os.path.join(idx_dir, n))
    )
    # c1's generation was referenced only by a manifest 2 versions back -> GC'd
    assert not any("c1" in g for g in gens)
    assert any("c2" in g for g in gens) and any("c3" in g for g in gens)
    assert c3.search("error tool", k=5).count() == 5
