"""Analyzer golden tests: the three implementations of the frozen spec agree."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.functions.analysis import (
    analyze_text,
    expand_query_terms,
    tokens_col,
    tokens_sql,
)

GOLDEN = [
    (None, []),
    ("", []),
    ("Hello, World!", ["hello", "world"]),
    ("wi-fi 100GB  café 日本語", ["wi", "fi", "100gb", "caf"]),
    ("The THE the", ["the", "the", "the"]),  # stopwords.txt is empty -> kept
    ("a1b2 c3", ["a1b2", "c3"]),
    ("  punct...only!!! ", ["punct", "only"]),
    ("UPPER lower 42", ["upper", "lower", "42"]),
]


def test_analyze_text_golden():
    for text, want in GOLDEN:
        assert analyze_text(text) == want, text


def test_jvm_tokens_match_python(spark):
    pdf = pd.DataFrame({"text": [t for t, _ in GOLDEN]})
    df = spark.createDataFrame(pdf)
    got = [r["toks"] for r in df.select(tokens_col("text").alias("toks")).collect()]
    assert got == [want for _, want in GOLDEN]


def test_duckdb_tokens_match_python():
    con = duckdb.connect()
    for text, want in GOLDEN:
        (got,) = con.execute(
            f"SELECT {tokens_sql('?')}", [text]
        ).fetchone()
        assert list(got) == want, text


def test_synonym_expansion():
    assert expand_query_terms(["tv"]) == ["television", "televisions", "tv", "tvs"]
    assert expand_query_terms(["aaafoo"]) == ["aaabar"]  # one-way mapping
    assert expand_query_terms(["pixima", "x"]) == ["pixma", "x"]
    assert expand_query_terms(["gb", "gb"]) == ["gb", "gib", "gigabyte", "gigabytes"]


def test_term_freqs_udf(spark):
    from solr_semantic_importer_spark.functions.analysis import term_freqs_udf

    df = spark.createDataFrame(pd.DataFrame({"text": ["the the cat", None, ""]}))
    rows = df.select(term_freqs_udf("text").alias("tf")).collect()
    assert rows[0]["tf"] == {"the": 2, "cat": 1}
    assert rows[1]["tf"] == {}
    assert rows[2]["tf"] == {}
