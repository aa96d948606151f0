"""S5 protobuf wire decode + Solr-style flattening
(ProtobufToSolrDocument.java:22-155; fixture shape src/test/resources/person.proto)."""

import json
import math

import pandas as pd
import pytest

from solr_semantic_importer_spark.sources.protobuf import (
    DURATION_SPEC,
    FieldSpec,
    MessageSpec,
    decode_flat,
    decode_message,
    decode_protobuf_column,
    encode_message,
    encode_protobuf_column,
)

# the reference test fixture: person.proto {int32 id=1; string name=2; string email=3}
PERSON = MessageSpec(
    "Person",
    [
        FieldSpec(1, "id", "int32"),
        FieldSpec(2, "name", "string"),
        FieldSpec(3, "email", "string"),
    ],
)


def test_decode_person_hand_encoded_bytes():
    # classic wire-format example: field 1 varint 150 == 08 96 01; strings
    # are tag, length, utf8. Bytes written BY HAND, independent of our encoder.
    buf = bytes(
        [0x08, 0x96, 0x01]                       # id = 150
        + [0x12, 0x03] + list(b"Ada")            # name = "Ada"
        + [0x1A, 0x05] + list(b"a@b.c")          # email = "a@b.c"
    )
    assert decode_flat(PERSON, buf) == {"id": 150, "name": "Ada", "email": "a@b.c"}


def test_decode_skips_unknown_fields_and_last_wins():
    # unknown field 9 (varint) + field 1 set twice (proto3 last-one-wins)
    buf = bytes([0x48, 0x2A, 0x08, 0x01, 0x08, 0x02])
    assert decode_flat(PERSON, buf) == {"id": 2}


def test_negative_and_zigzag_ints():
    spec = MessageSpec(
        "N",
        [FieldSpec(1, "a", "int32"), FieldSpec(2, "b", "sint64"),
         FieldSpec(3, "c", "bool")],
    )
    buf = encode_message(spec, {"a": -3, "b": -7, "c": True})
    assert decode_message(spec, buf) == {"a": -3, "b": -7, "c": True}


def test_packed_repeated_varints_decode():
    spec = MessageSpec("P", [FieldSpec(1, "xs", "int32", repeated=True)])
    # hand-built packed encoding: tag (1<<3|2), len 3, varints 1 2 150? ->
    # 150 needs two bytes, use [1, 2, 3]
    buf = bytes([0x0A, 0x03, 0x01, 0x02, 0x03])
    assert decode_message(spec, buf) == {"xs": [1, 2, 3]}
    # unpacked form of the same field decodes identically
    buf2 = bytes([0x08, 0x01, 0x08, 0x02, 0x08, 0x03])
    assert decode_message(spec, buf2) == {"xs": [1, 2, 3]}


NESTED = MessageSpec(
    "Event",
    [
        FieldSpec(1, "id", "int32"),
        FieldSpec(2, "name", "string"),
        FieldSpec(3, "meta", "message", message=MessageSpec(
            "Meta",
            [FieldSpec(1, "user", "string"), FieldSpec(2, "value", "double")],
        )),
        FieldSpec(4, "tags", "string", repeated=True),
        FieldSpec(5, "counts", "map", map_key="string", map_value="int64"),
        FieldSpec(6, "ts", "timestamp"),
        FieldSpec(7, "took", "duration"),
    ],
)


def test_roundtrip_nested_repeated_map_timestamp():
    values = {
        "id": 42,
        "name": "purchase",
        "meta": {"user": "u7", "value": 3.25},
        "tags": ["a", "b"],
        "counts": {"n": 5, "m": 9},
        "ts": 1704067200123,          # epoch millis
        "took": (100, 500_000_000),   # 100.5s
    }
    flat = decode_flat(NESTED, encode_message(NESTED, values))
    assert flat == {
        "id": 42,
        "name": "purchase",
        "meta_user": "u7",            # nested -> underscore join
        "meta_value": 3.25,
        "tags": ["a", "b"],           # repeated -> array
        "counts_n": 5,                # map -> key suffix
        "counts_m": 9,
        "ts": "2024-01-01T00:00:00.123Z",   # Timestamp -> ISO millis
        "took": "PT1M40.5S",          # Duration -> java toString form
    }


def test_float_fixed_kinds_roundtrip():
    spec = MessageSpec(
        "F",
        [FieldSpec(1, "d", "double"), FieldSpec(2, "f", "float"),
         FieldSpec(3, "x", "fixed64"), FieldSpec(4, "y", "fixed32")],
    )
    got = decode_message(spec, encode_message(spec, {"d": -2.5, "f": 0.5, "x": 99, "y": -4}))
    assert got["d"] == -2.5 and math.isclose(got["f"], 0.5)
    assert got["x"] == 99 and got["y"] == -4


def test_spark_decode_column_roundtrip(spark):
    from solr_semantic_importer_spark.operators.transforms import parse_json_docs
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    df = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2, 3], "name": ["x", "y", None], "val": [1.5, -2.0, 0.25]})
    )
    enc = encode_protobuf_column(
        df, NESTED,
        {"id": F.col("id").cast("int"), "name": F.col("name"),
         "meta": F.struct(F.lit("u").alias("user"), F.col("val").alias("value"))},
    )
    dec = decode_protobuf_column(enc, "proto_bytes", NESTED)
    schema = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("meta_user", T.StringType()),
        T.StructField("meta_value", T.DoubleType()),
    ])
    rows = parse_json_docs(dec.select("doc_json"), schema).orderBy("id").collect()
    assert [(r["id"], r["name"], r["meta_user"], r["meta_value"]) for r in rows] == [
        (1, "x", "u", 1.5), (2, "y", "u", -2.0), (3, None, "u", 0.25),
    ]


def test_truncated_input_raises():
    with pytest.raises(ValueError):
        decode_message(PERSON, bytes([0x08]))  # tag then nothing


def test_java_duration_negative_and_edges():
    """java.time.Duration.toString() formats component signs individually
    ('PT-1M-40.5S'), and integer nano math keeps precision past 2^53 ns."""
    from solr_semantic_importer_spark.sources.protobuf import _java_duration

    assert _java_duration(100, 500_000_000) == "PT1M40.5S"
    assert _java_duration(-100, -500_000_000) == "PT-1M-40.5S"
    assert _java_duration(0, -500_000_000) == "PT-0.5S"
    assert _java_duration(-1, 0) == "PT-1S"
    assert _java_duration(0, 0) == "PT0S"
    assert _java_duration(3600, 0) == "PT1H"
    assert _java_duration(-3661, 0) == "PT-1H-1M-1S"
    assert _java_duration(10_000_000, 1) == "PT2777H46M40.000000001S"
