"""LukeRequestHandler analog: index stats, field info, top terms."""

import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.luke_api import solr_luke
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=30, turns_per_conv=5, seed=3)
    d = str(tmp_path_factory.mktemp("luke"))
    build_index(spark, df, d, BuildConfig(build_id="lk", **CFG))
    return BM25Index(spark, d)


def test_index_section(idx):
    r = solr_luke(idx, {"show": "index"})
    assert r["index"]["numDocs"] == r["index"]["maxDoc"] == 150
    assert r["index"]["deletedDocs"] == 0
    assert not r["index"]["hasDeletions"]
    assert r["index"]["segmentCount"] == idx.docs() \
        .select("segment_id").distinct().count()
    assert r["index"]["version"] >= 1
    assert "fields" not in r


def test_fields_section_counts_and_types(idx):
    r = solr_luke(idx)
    f = r["fields"]
    assert f["text"]["type"] == "text_general" and f["text"]["indexed"]
    assert f["doc_id"]["type"] == "plong"
    assert f["ts"]["type"] == "pdate"
    assert "dl" not in f and "segment_id" not in f
    # docs-with-value: tool is null on non-tool turns
    n_tool = idx.docs().filter(F.col("tool").isNotNull()).count()
    assert f["tool"]["docs"] == n_tool < 150
    # the generator emits some null-text turns (the P6 null-skip fixture)
    n_text = idx.docs().filter(F.col("text").isNotNull()).count()
    assert f["text"]["docs"] == n_text
    assert f["text"]["distinct"] == idx.dictionary().count()


def test_top_terms_match_dictionary(idx):
    r = solr_luke(idx, {"fl": "text", "numTerms": 5})
    flat = r["fields"]["text"]["topTerms"]
    assert len(flat) == 10
    want = [
        (x["term"], x["df"])
        for x in idx.dictionary()
        .orderBy(F.col("df").desc(), F.col("term").asc()).limit(5).collect()
    ]
    assert list(zip(flat[::2], flat[1::2])) == want
    # numTerms=0 disables
    r0 = solr_luke(idx, {"fl": "text", "numTerms": 0})
    assert "topTerms" not in r0["fields"]["text"]


def test_schema_section(idx):
    r = solr_luke(idx, {"show": "schema"})
    assert r["schema"]["analyzer"] == "text_general"
    assert r["schema"]["uniqueKeyField"] == "doc_id"


def test_deletes_reflected(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=10, turns_per_conv=4, seed=9)
    d = str(tmp_path_factory.mktemp("luke2"))
    build_index(spark, df, d, BuildConfig(build_id="lk2", **CFG))
    idx = BM25Index(spark, d)
    idx.delete_by_query("role = 'tool'")
    idx2 = BM25Index(spark, d)
    n_dead = idx2._n_tombstoned()
    r = solr_luke(idx2, {"show": "index"})
    assert n_dead > 0
    assert r["index"]["deletedDocs"] == n_dead
    assert r["index"]["numDocs"] == 40 - n_dead
    assert r["index"]["maxDoc"] == 40 and r["index"]["hasDeletions"]


def test_appended_index_aggregates_dictionary(spark, tmp_path_factory):
    # per-batch appends write dictionary df INCREMENTS (one row per term
    # per batch) — distinct/topTerms must aggregate, not read rows
    from pyspark.sql import functions as F2
    from solr_semantic_importer_spark.streaming.incremental import append_batch
    df = generate_transcripts(spark, n_convs=8, turns_per_conv=4, seed=5)
    d = str(tmp_path_factory.mktemp("luke3"))
    build_index(spark, df, d, BuildConfig(build_id="lk3", **CFG))
    more = generate_transcripts(spark, n_convs=6, turns_per_conv=4, seed=6) \
        .withColumn("conv_id", F2.concat(F2.lit("b"), F2.col("conv_id")))
    append_batch(more, d, BuildConfig(build_id="lk3", **CFG), batch_id=1)
    idx = BM25Index(spark, d)
    r = solr_luke(idx, {"fl": "text", "numTerms": 3})
    d_rows = idx.dictionary().count()
    n_terms = idx.dictionary().select("term").distinct().count()
    assert n_terms < d_rows  # increments really are present
    assert r["fields"]["text"]["distinct"] == n_terms
    want = [
        (x["term"], x["df"]) for x in
        idx.dictionary().groupBy("term").agg(F2.sum("df").alias("df"))
        .orderBy(F2.col("df").desc(), F2.col("term").asc()).limit(3).collect()
    ]
    flat = r["fields"]["text"]["topTerms"]
    assert list(zip(flat[::2], flat[1::2])) == want


def test_fail_loud(idx):
    with pytest.raises(ValueError, match="unsupported /admin/luke"):
        solr_luke(idx, {"id": "7"})
    with pytest.raises(ValueError, match="unknown fields"):
        solr_luke(idx, {"fl": "nope"})
    with pytest.raises(ValueError, match="show"):
        solr_luke(idx, {"show": "doc"})


def test_segments_handler(spark, tmp_path_factory):
    from solr_semantic_importer_spark.query.luke_api import solr_segments
    df = generate_transcripts(spark, n_convs=12, turns_per_conv=4, seed=7)
    d = str(tmp_path_factory.mktemp("seg"))
    build_index(spark, df, d, BuildConfig(build_id="sg", **CFG))
    idx = BM25Index(spark, d)
    r = solr_segments(idx)
    segs = r["segments"]
    assert sum(s["docCount"] for s in segs.values()) == 48
    assert all(s["delCount"] == 0 for s in segs.values())
    # per-segment doc-id ranges are disjoint and ordered
    ranges = sorted((s["minDoc"], s["maxDoc"]) for s in segs.values())
    for (a, b), (c, e) in zip(ranges, ranges[1:]):
        assert b < c
    idx.delete_by_query("role = 'tool'")
    idx2 = BM25Index(spark, d)
    r2 = solr_segments(idx2)
    assert sum(s["delCount"] for s in r2["segments"].values()) \
        == idx2._n_tombstoned() > 0
