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


# entry lines semantically identical to the configset the importer installs
# (default-base-config/synonyms.txt effective entries)
_SYN_FIXTURE = """
# one-way mappings
aaafoo => aaabar
bbbfoo => bbbfoo bbbbar
cccfoo => cccbar cccbaz
fooaaa,baraaa,bazaaa

GB,gib,gigabyte,gigabytes
MB,mib,megabyte,megabytes
Television, Televisions, TV, TVs

pixima => pixma
"""


def test_parse_synonyms_reproduces_default_mapping():
    from solr_semantic_importer_spark.functions.analysis import (
        DEFAULT_SYNONYMS,
        parse_synonyms_lines,
    )

    parsed = parse_synonyms_lines(_SYN_FIXTURE.splitlines())
    assert parsed == DEFAULT_SYNONYMS


def test_parse_synonyms_shipped_reference_file():
    import os

    from solr_semantic_importer_spark.functions.analysis import (
        DEFAULT_SYNONYMS,
        parse_synonyms_file,
    )

    path = "/root/reference/src/main/resources/default-base-config/synonyms.txt"
    if not os.path.exists(path):
        pytest.skip("reference configset not available")
    assert parse_synonyms_file(path) == DEFAULT_SYNONYMS


def test_parse_synonyms_edge_cases():
    from solr_semantic_importer_spark.functions.analysis import parse_synonyms_lines

    parsed = parse_synonyms_lines(
        [
            "a, b => c d, e",           # multi-LHS, multi-word + plain RHS
            "x\\,y => z",               # escaped comma inside a term
            "  # comment",
            "",
            "P, q ,R",                  # whitespace + case normalization
        ]
    )
    assert parsed["a"] == ("c", "d", "e") and parsed["b"] == ("c", "d", "e")
    assert parsed["x,y"] == ("z",)
    assert parsed["p"] == parsed["q"] == parsed["r"] == ("p", "q", "r")


def test_custom_synonyms_in_query(spark, tmp_path_factory):
    """A user-supplied synonyms file drives query expansion end to end."""
    from solr_semantic_importer_spark.functions.analysis import parse_synonyms_lines
    from solr_semantic_importer_spark.index.build import BuildConfig, build_index
    from solr_semantic_importer_spark.query.engine import BM25Index
    from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

    df = generate_transcripts(spark, n_convs=20, turns_per_conv=4, seed=9)
    idx_dir = str(tmp_path_factory.mktemp("syn"))
    build_index(spark, df, idx_dir, BuildConfig(
        build_id="syn", segment_size=64, block_size=16, n_term_buckets=2))
    idx = BM25Index(spark, idx_dir)
    syn = parse_synonyms_lines(["failure => error"])
    # 'failure' is OOV; with the custom mapping it must match 'error' docs
    assert idx.search("failure", k=5).count() == 0
    expanded = idx.search("failure", k=5, synonyms=syn, mode="exhaustive")
    baseline = idx.search("error", k=5, mode="exhaustive")
    assert [r["doc_id"] for r in expanded.collect()] == [
        r["doc_id"] for r in baseline.collect()
    ]


def test_register_custom_language_chain_end_to_end(spark, tmp_path_factory):
    """The chain factory covers the reference's 30+ language fieldType shape:
    a registered stop+transform+stem chain works through build, query,
    highlighting, and the Python oracle without any engine changes."""
    from solr_semantic_importer_spark.functions.analysis import (
        QUERY_ANALYZERS,
        register_analysis_chain,
    )
    from solr_semantic_importer_spark.index.build import BuildConfig, build_index
    from solr_semantic_importer_spark.index.docids import assign_doc_ids_window
    from solr_semantic_importer_spark.oracle.bm25_ref import BM25Oracle
    from solr_semantic_importer_spark.query.engine import BM25Index
    from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

    # French-ish toy chain: elision transform + stop set + plural-strip stem
    register_analysis_chain(
        "text_toy_fr",
        stop_set={"le", "la", "the", "in"},
        stem_fn=lambda t: t[:-1] if t.endswith("s") and len(t) > 3 else t,
        token_transform=lambda t: t[2:] if t.startswith(("l'", "d'")) else t,
    )
    assert QUERY_ANALYZERS["text_toy_fr"]("The errors in tool calls") == [
        "error", "tool", "call",
    ]

    df = generate_transcripts(spark, n_convs=25, turns_per_conv=4, seed=17)
    idx_dir = str(tmp_path_factory.mktemp("lang"))
    build_index(spark, df, idx_dir, BuildConfig(
        build_id="fr", segment_size=64, block_size=16, n_term_buckets=2,
        analyzer="text_toy_fr"))
    idx = BM25Index(spark, idx_dir)
    assert idx.analyzer_chain == "text_toy_fr"
    docs = [(r["doc_id"], r["text"])
            for r in assign_doc_ids_window(df).select("doc_id", "text").collect()]
    oracle = BM25Oracle(docs, analyzer="text_toy_fr")
    got = [(r["doc_id"], round(r["score"], 6)) for r in idx.search("errors tools", k=10).collect()]
    want = [(d, round(s, 6)) for d, s in oracle.search("errors tools", k=10)]
    assert got == want and got
    hl = idx.highlight("errors", k=3).collect()
    assert any("<em>error" in (r["highlighted"] or "") for r in hl)


def test_term_freqs_udf(spark):
    from solr_semantic_importer_spark.functions.analysis import term_freqs_udf

    df = spark.createDataFrame(pd.DataFrame({"text": ["the the cat", None, ""]}))
    rows = df.select(term_freqs_udf("text").alias("tf")).collect()
    assert rows[0]["tf"] == {"the": 2, "cat": 1}
    assert rows[1]["tf"] == {}
    assert rows[2]["tf"] == {}
