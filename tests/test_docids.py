"""Doc-id stability: scalable assignment == window definition, repartition-proof."""

from pyspark.sql import functions as F

from solr_semantic_importer_spark.index.docids import (
    assign_doc_ids,
    assign_doc_ids_window,
)
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts


def test_scalable_equals_window(spark):
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=7, seed=7)
    a = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in assign_doc_ids(df, num_partitions=5).collect()
    }
    b = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in assign_doc_ids_window(df).collect()
    }
    assert a == b
    assert sorted(a.values()) == list(range(len(a)))


def test_duplicate_keys_fail_fast(spark):
    import pytest

    df = generate_transcripts(spark, n_convs=10, turns_per_conv=4, seed=1)
    dup = df.unionByName(df.limit(3))  # re-ingest shape: same (conv_id, turn_idx)
    with pytest.raises(Exception, match="duplicate sort key"):
        assign_doc_ids(dup, num_partitions=4).count()
    # unique input still assigns cleanly
    assert assign_doc_ids(df, num_partitions=4).count() == df.count()


def test_stable_under_input_partitioning(spark):
    df = generate_transcripts(spark, n_convs=30, turns_per_conv=5, seed=3)
    shuffled = df.repartition(13, "role")  # scramble the input layout
    a = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in assign_doc_ids(df, num_partitions=4).collect()
    }
    b = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in assign_doc_ids(shuffled, num_partitions=9).collect()
    }
    assert a == b
