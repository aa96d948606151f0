"""T6 WordDelimiterGraph + text_en_splitting chain (managed-schema.xml:393-423)."""

import duckdb
import pytest
from collections import Counter

from solr_semantic_importer_spark.functions.analysis import (
    QUERY_ANALYZERS,
    TOKEN_NORMALIZERS,
)
from solr_semantic_importer_spark.functions.word_delimiter import (
    analyze_text_en_splitting,
    positions_map_en_splitting,
    positions_map_splitting,
    splitting_toks_sql,
    wdg_emit,
)
from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.index.docids import assign_doc_ids_window
from solr_semantic_importer_spark.oracle.bm25_ref import BM25Oracle
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

# golden cases from the Lucene WDG javadoc / Solr schema comments
GOLDEN_EMIT = [
    # split on non-alphanumerics + catenateWords
    ("wi-fi", [("wi", 0), ("fi", 1), ("wifi", 0)]),
    # splitOnCaseChange + catenateWords
    ("WiFi", [("Wi", 0), ("Fi", 1), ("WiFi", 0)]),
    # UPPER-run -> Upper+lower boundary
    ("POWERShot", [("POWER", 0), ("Shot", 1), ("POWERShot", 0)]),
    # alpha<->digit boundaries; digit run of one part not catenated
    ("PowerShot500", [("Power", 0), ("Shot", 1), ("500", 2), ("PowerShot", 0)]),
    ("SD500", [("SD", 0), ("500", 1)]),
    # alternating kinds: no run reaches 2 parts
    ("j2se", [("j", 0), ("2", 1), ("se", 2)]),
    # catenateNumbers
    ("123-456", [("123", 0), ("456", 1), ("123456", 0)]),
    # delimiters alone vanish
    ("---", []),
    ("hello", [("hello", 0)]),
]


@pytest.mark.parametrize("tok,want", GOLDEN_EMIT)
def test_wdg_emit_golden(tok, want):
    assert wdg_emit(tok, catenate=True) == want


def test_wdg_query_variant_no_catenate():
    assert wdg_emit("wi-fi", catenate=False) == [("wi", 0), ("fi", 1)]


def test_chain_index_vs_query_variants():
    # index chain emits catenated forms; query chain does not (schema's
    # catenateWords=0 at query time), and both Porter-stem
    pm = positions_map_en_splitting("Wi-Fi routers are failing")
    assert pm["wi"] == [0] and pm["fi"] == [1] and pm["wifi"] == [0]
    assert pm["router"] == [2] and pm["fail"] == [4]  # "are" stop-gap at 3
    assert analyze_text_en_splitting("Wi-Fi routers failing") == [
        "wi", "fi", "router", "fail",
    ]
    # schema example: query "wi fi" matches indexed "WiFi"
    q = QUERY_ANALYZERS["text_en_splitting"]("wi fi")
    assert set(q) <= set(positions_map_en_splitting("WiFi").keys())
    # query "wifi" matches indexed "wi-fi" via the catenated form
    assert "wifi" in positions_map_en_splitting("wi-fi")


def test_stop_before_wdg_is_literal():
    # StopFilter runs BEFORE WDG on whitespace tokens: "The" is stopped,
    # "the," is not (it reaches WDG and splits down to "the")
    pm = positions_map_splitting("The the, THE")
    assert pm == {"the": [1]}


def test_splitting_sql_matches_python():
    con = duckdb.connect()
    sql = f"SELECT {splitting_toks_sql('?')}"
    cases = [
        None, "", "WiFi wi-fi wi fi", "PowerShot500 SD500 POWERShot j2se",
        "The the, THE. a-b-c 100GB", "abc-123-def 123-456 Wi-Fi2000",
        "café 日本語!! --- A aB ABc", "MixedCASE lowerUPPER x1 1x",
    ]
    for c in cases:
        py = Counter()
        for t, ps in positions_map_splitting(c).items():
            py[t] += len(ps)
        (got,) = con.execute(sql, [c]).fetchone()
        assert Counter(got) == py, c


def test_splitting_sql_matches_python_property():
    """Hypothesis: the frozen WDG spec is identical in Python and DuckDB for
    arbitrary text (case changes, digits, punctuation, unicode, whitespace)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    con = duckdb.connect()
    sql = f"SELECT {splitting_toks_sql('?')}"
    alphabet = st.sampled_from(
        list("abcXYZ09 -_.!?\t\n/\\'\"éФ中") + ["Wi", "FI", "500", "the", "The."]
    )
    texts = st.lists(alphabet, max_size=30).map("".join)

    @given(texts)
    @settings(max_examples=150, deadline=None)
    def check(text):
        py = Counter()
        for t, ps in positions_map_splitting(text).items():
            py[t] += len(ps)
        (got,) = con.execute(sql, [text]).fetchone()
        assert Counter(got) == py, repr(text)

    check()


def test_highlight_normalizer_splitting():
    n = TOKEN_NORMALIZERS["text_en_splitting"]
    assert "wifi" in n("Wi-Fi")  # raw case: WDG splits + catenates
    assert "wifi" in n("WiFi")
    assert n("The") == []


@pytest.fixture(scope="module")
def split_corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=50, turns_per_conv=5, seed=13)
    idx_dir = str(tmp_path_factory.mktemp("wdg"))
    cfg = BuildConfig(segment_size=100, block_size=16, n_term_buckets=4,
                      hot_df_threshold=50, hot_salts=4, build_id="wdg",
                      analyzer="text_en_splitting")
    build_index(spark, df, idx_dir, cfg)
    docs = [
        (r["doc_id"], r["text"])
        for r in assign_doc_ids_window(df).select("doc_id", "text").collect()
    ]
    return BM25Index(spark, idx_dir), BM25Oracle(docs, analyzer="text_en_splitting")


@pytest.mark.parametrize("q", [
    "wi-fi 100GB errors",    # the generator's unicode rows carry "wi-fi 100GB"
    "wifi gb",               # catenated + split forms
    "the tool calls",        # stop + stem
    "topic42 topics",
])
def test_text_en_splitting_rank_identical(split_corpus, q):
    idx, oracle = split_corpus
    assert idx.analyzer_chain == "text_en_splitting"
    got = [(r["doc_id"], r["score"]) for r in idx.search(q, k=10).collect()]
    want = oracle.search(q, k=10)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-9
