"""Importer-shaped end-to-end pipeline: the reference's crawl lifecycle
(seed source -> transforms -> chunking -> index -> query -> orphan delete)
run as ONE flow through this engine's operators -- the "a user of the
reference could switch" demonstration (SolrSemanticIndexer.java:93-130
orchestration; chunking ChunkDocumentCreator.java:60-103)."""

import json
import os

from pyspark.sql import functions as F

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.operators import chunking as CH
from solr_semantic_importer_spark.operators import transforms as TR
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.sources.files import seed_json


def test_crawl_pipeline_end_to_end(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("e2e"))
    # --- S7 seed source: JSON docs with internal fields to strip ---
    seed_path = os.path.join(tmp, "seed.json")
    docs = [
        {
            "id": f"doc{i:03d}",
            "title": f"title {i}",
            "body": " ".join(
                ["alpha beta gamma delta epsilon zeta eta theta"] * 4
                + [f"marker{i % 5}"]
            ),
            "creation_date": 1_700_000_000_000 + i * 1000,
            "_version_": 171234,
        }
        for i in range(40)
    ]
    with open(seed_path, "w") as f:
        json.dump(docs, f)
    src = seed_json(spark, seed_path)
    assert "_version_" not in src.columns  # P2

    # --- P3/P4/P5 transforms: date normalize, crawl stamp, truncate ---
    crawled = TR.stamp_crawl(src, "crawl-e2e-1").select(
        "id", "title", "crawl_id",
        TR.normalize_epoch_millis("creation_date").alias("creation_date"),
        TR.truncate_field("body", 500).alias("body"),
    )

    # --- T7/P7 chunking: body -> overlapping chunks with synthesized ids ---
    chunks = CH.chunk_documents(
        crawled, "id", "body", size=12, overlap=3, field_name="body"
    )
    assert chunks.filter(F.col("chunk_id").isNull()).count() == 0

    # --- I1: index the chunks (chunk id becomes the stable sort key) ---
    t = chunks.select(
        F.col("parent_id").alias("conv_id"),
        F.col("chunk_number").cast("int").alias("turn_idx"),
        F.col("chunk").alias("text"),
    )
    idx_dir = os.path.join(tmp, "idx")
    build_index(spark, t, idx_dir, BuildConfig(
        build_id="e2e", segment_size=64, block_size=16, n_term_buckets=4))
    idx = BM25Index(spark, idx_dir)
    assert idx.n_docs == chunks.count()

    # --- Q1/Q4: query; rare marker term ranks its chunks first ---
    hits = idx.search("marker3 alpha", k=10, with_stored=True).collect()
    assert hits
    top_parents = {r["conv_id"] for r in hits[:3]}
    assert all(int(p[3:]) % 5 == 3 for p in top_parents)

    # --- J2: parent-chunk join round trip ---
    joined = chunks.join(
        F.broadcast(crawled.select(F.col("id").alias("parent_id"), "crawl_id")),
        "parent_id",
    )
    assert joined.filter(F.col("crawl_id") != "crawl-e2e-1").count() == 0

    # --- J3/I5: a re-crawl orphan delete (`-crawl_id:X`) via tombstones ---
    n = idx.delete_by_query("conv_id >= 'doc030'")
    assert n == idx.docs().filter(F.col("conv_id") >= "doc030").count()
    live = idx.search("marker3 alpha", k=50, with_stored=True).collect()
    assert live and all(r["conv_id"] < "doc030" for r in live)
