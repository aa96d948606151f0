"""Schema admin (I6/I7) + copyField multi-field indexing with position gap."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.operators.schema_admin import (
    VectorFieldSpec,
    add_columns,
    shard_layout,
    validated_vector_field,
)
from solr_semantic_importer_spark.query.engine import BM25Index


def test_vector_field_created_when_absent(spark):
    df = spark.createDataFrame([(1,)], "id long")
    out, name = validated_vector_field(df, VectorFieldSpec("title_vector", 384))
    assert name == "title_vector"
    assert isinstance(out.schema["title_vector"].dataType, T.ArrayType)


def test_vector_field_valid_passthrough(spark):
    df = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, None)],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("v", T.ArrayType(T.FloatType())),
            ]
        ),
    )
    out, name = validated_vector_field(df, VectorFieldSpec("v", 2))
    assert name == "v" and out is df


def test_vector_field_renamed_on_mismatch(spark):
    # wrong dims -> fallback name {field}_{similarity}_{dims}
    # (VectorFieldValidator.java:62-79)
    df = spark.createDataFrame(
        [(1, [0.1, 0.2, 0.3])],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("v", T.ArrayType(T.FloatType())),
            ]
        ),
    )
    out, name = validated_vector_field(df, VectorFieldSpec("v", 2))
    assert name == "v_cosine_2"
    assert "v_cosine_2" in out.columns and "v" in out.columns
    # wrong type (not a float array)
    df2 = spark.createDataFrame([(1, "not-a-vector")], "id long, v string")
    out2, name2 = validated_vector_field(df2, VectorFieldSpec("v", 2))
    assert name2 == "v_cosine_2"


def test_add_columns_and_shards(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    out = add_columns(df, {"extra": "string", "score": "double", "id": "long"})
    assert out.columns == ["id", "extra", "score"]
    sharded = shard_layout(out, 3, "id")
    assert sharded.rdd.getNumPartitions() == 3


@pytest.fixture(scope="module")
def multifield_index(spark, tmp_path_factory):
    rows = [
        ("c0", 0, "user", "alpha beta", "gamma delta", None),
        ("c0", 1, "user", "beta gamma", "alpha alpha", None),
        ("c1", 0, "user", "delta", "beta", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, title string, body string, tool string"
    ).withColumn("ts", F.current_timestamp()).withColumn("text", F.col("title"))
    idx_dir = str(tmp_path_factory.mktemp("mf"))
    cfg = BuildConfig(
        segment_size=16, block_size=4, n_term_buckets=2, hot_df_threshold=100,
        hot_salts=2, build_id="mf", copy_fields=("title", "body"),
    )
    build_index(spark, df, idx_dir, cfg)
    return BM25Index(spark, idx_dir)


def test_multifield_tf_and_dl(multifield_index):
    idx = multifield_index
    # doc 0 = (c0,0): title "alpha beta" + body "gamma delta" -> dl 4
    dls = {r["doc_id"]: r["dl"] for r in idx.docs().select("doc_id", "dl").collect()}
    assert dls == {0: 4, 1: 4, 2: 2}
    # df across both fields: alpha appears in docs 0 and 1
    assert idx._dfs(["alpha"])["alpha"] == 2


def test_multifield_phrase_within_field_matches(multifield_index):
    got = [r["doc_id"] for r in multifield_index.search_phrase("alpha beta", k=5).collect()]
    assert got == [0]  # title of doc 0 only


def test_multifield_phrase_never_crosses_field_boundary(multifield_index):
    # "beta gamma" occurs inside doc 1's title; in doc 0 "beta" ends the
    # title and "gamma" starts the body -- the 100-position gap must prevent
    # a cross-field match (positionIncrementGap semantics)
    got = [r["doc_id"] for r in multifield_index.search_phrase("beta gamma", k=5).collect()]
    assert got == [1]


def test_infer_string_field_types_edges(spark):
    import pandas as pd

    from solr_semantic_importer_spark.operators.schema_admin import (
        infer_string_field_types,
    )

    pdf = pd.DataFrame(
        {
            "longs": ["1", "42", None],
            "doubles": ["1.5", "2", "-0.25"],
            "bools": ["true", "FALSE", None],
            "zero_one": ["1", "0", "1"],        # NOT boolean (Solr default set)
            "dates": ["2024-01-01 00:00:00", "2024-06-05 10:11:12", None],
            "mixed": ["1", "x", "2"],           # stays string
            "all_null": pd.array([None, None, None], dtype="object"),
        }
    )
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField(c, T.StringType()) for c in pdf.columns])
    out = infer_string_field_types(spark.createDataFrame(pdf, schema=schema))
    t = dict(out.dtypes)
    assert t["longs"] == "bigint"
    assert t["doubles"] == "double"
    assert t["bools"] == "boolean"
    assert t["zero_one"] == "bigint"   # longs win over the strict boolean set
    assert t["dates"] == "timestamp"
    assert t["mixed"] == "string"
    assert t["all_null"] == "string"   # nothing to infer from
    rows = out.orderBy("longs").collect()
    assert any(r["bools"] in (True, False) for r in rows)
