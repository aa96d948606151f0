"""Multimodal binary-column plumbing + nested flatten + JSON round-trip."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from solr_semantic_importer_spark.operators import multimodal as MM
from solr_semantic_importer_spark.operators.flatten import explode_map, flatten_columns
from solr_semantic_importer_spark.operators.transforms import docs_to_json, parse_json_docs


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(F.col("doc_id") < 60)
    return MM.attach_binary_payload(d).persist()


def test_payload_and_meta_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    meta = media.schema["media_meta"].dataType
    assert isinstance(meta, T.StructType)
    assert [f.name for f in meta.fields] == [
        "media_type", "width", "height", "n_frames", "sample_rate", "codec",
    ]
    # payload is the utf-8 text; deterministic
    r = media.filter(F.col("doc_id") == 1).select("text", "payload").collect()[0]
    assert bytes(r["payload"]) == (r["text"] or "").encode("utf-8")


def test_extract_features_matches_oracle(media):
    rows = {r["doc_id"]: r for r in MM.extract_features(media).collect()}
    src = media.select("doc_id", "payload").collect()
    assert len(rows) == len(src)
    for s in src:
        n, mean, hist = MM.fake_feature_oracle(bytes(s["payload"]))
        r = rows[s["doc_id"]]
        assert r["n_bytes"] == n
        assert abs(r["mean_byte"] - mean) < 1e-6
        assert list(r["histogram"]) == hist


def test_resize_shape_and_determinism(media):
    out = MM.resize_images(media, out_w=4, out_h=3).collect()
    imgs = media.filter(F.col("media_meta.media_type") == "image").count()
    assert len(out) == imgs and imgs > 0
    for r in out:
        assert len(bytes(r["pixels"])) == 4 * 3
    again = {r["doc_id"]: bytes(r["pixels"]) for r in MM.resize_images(media, 4, 3).collect()}
    for r in out:
        assert bytes(r["pixels"]) == again[r["doc_id"]]


def test_frame_sampling(media):
    frames = MM.sample_frames(media, every_nth=2).collect()
    vids = {
        r["doc_id"]: r["n_frames"]
        for r in media.filter(F.col("media_meta.media_type") == "video")
        .select("doc_id", F.col("media_meta.n_frames").alias("n_frames"))
        .collect()
    }
    assert vids
    by_doc = {}
    for f in frames:
        by_doc.setdefault(f["doc_id"], []).append(f["frame_idx"])
    for doc, idxs in by_doc.items():
        assert sorted(idxs) == list(range(0, vids[doc], 2))


def test_real_backend_is_stubbed(media):
    with pytest.raises(NotImplementedError):
        MM.extract_features(media, backend="real")
    with pytest.raises(NotImplementedError):
        MM.resize_images(media, 2, 2, backend="real")
    with pytest.raises(NotImplementedError):
        MM.sample_frames(media, backend="real")


def test_flatten_struct_and_map(spark):
    df = spark.createDataFrame(
        [
            (1, {"a": {"b": 2, "c": "x"}, "d": 3}, {"k1": "v1", "k2": "v2"}, [10, 20]),
            (2, {"a": {"b": 5, "c": "y"}, "d": 6}, {"k1": "w1"}, [30]),
        ],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField(
                    "nested",
                    T.StructType(
                        [
                            T.StructField(
                                "a",
                                T.StructType(
                                    [T.StructField("b", T.LongType()), T.StructField("c", T.StringType())]
                                ),
                            ),
                            T.StructField("d", T.LongType()),
                        ]
                    ),
                ),
                T.StructField("m", T.MapType(T.StringType(), T.StringType())),
                T.StructField("arr", T.ArrayType(T.LongType())),
            ]
        ),
    )
    flat = flatten_columns(df, map_keys={"m": ["k1", "k2"]})
    assert flat.columns == ["id", "nested_a_b", "nested_a_c", "nested_d", "m_k1", "m_k2", "arr"]
    r = {x["id"]: x for x in flat.collect()}
    assert r[1]["nested_a_b"] == 2 and r[1]["m_k2"] == "v2" and r[2]["m_k2"] is None
    assert list(r[1]["arr"]) == [10, 20]  # repeated stays multi-valued

    long = explode_map(df.select("id", "m"), "m")
    assert long.columns == ["id", "key", "value"]
    assert long.count() == 3


def test_json_roundtrip_strips_version(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    with_ver = d.withColumn("_version_", F.lit(1700000000000))
    js = docs_to_json(with_ver)
    assert "doc_json" in js.columns and "_version_" not in js.columns
    schema = T.StructType(
        d.schema.fields + [T.StructField("_version_", T.LongType())]
    )
    back = parse_json_docs(js.select("doc_json"), schema)
    assert back.columns == d.columns  # _version_ stripped (JsonToSolrDocParser.java:81)
    orig = sorted((r["doc_id"], r["text"]) for r in d.collect())
    rt = sorted((r["doc_id"], r["text"]) for r in back.collect())
    assert orig == rt
