"""Round-4 fieldType closures: text_ko (the last schema language) plus the
minor declared types -- text_ws, lowercase, phonetic_en (Double Metaphone),
text_general_rev (ReversedWildcard). Golden analyzers + end-to-end indexes,
modeled on test_lang_chains.py's ja/th cases."""

import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.functions.analysis import QUERY_ANALYZERS
from solr_semantic_importer_spark.functions.field_types import (
    REVERSE_MARKER,
    register_lowercase_chain,
    register_text_general_rev_chain,
    register_text_ws_chain,
    reversed_wildcard_prefix,
)
from solr_semantic_importer_spark.functions.lang_chains import (
    make_korean_fallback_analyzer,
    register_korean_fallback_chain,
)
from solr_semantic_importer_spark.functions.phonetic import (
    double_metaphone,
    register_phonetic_en_chain,
)
from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index

REF_LANG = "/root/reference/src/main/resources/default-base-config/lang"


def test_register_reference_configset_covers_every_fieldtype():
    """One call -> every analysis fieldType the schema declares resolves."""
    from solr_semantic_importer_spark.functions.lang_chains import (
        register_reference_configset,
    )

    register_reference_configset(REF_LANG)
    for name in ("text_general", "text_en", "text_en_splitting", "text_fr",
                 "text_de", "text_ru", "text_cjk", "text_ja", "text_th",
                 "text_ko", "text_ws", "lowercase", "phonetic_en",
                 "text_general_rev"):
        assert name in QUERY_ANALYZERS, f"fieldType missing: {name}"
    # idempotent: a second call registers nothing new and overwrites nothing
    assert register_reference_configset(REF_LANG) == []


def _mini_index(spark, tmp_path_factory, name, analyzer, texts):
    rows = [("c0", i, "user", t, None) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.current_timestamp())
    idx_dir = str(tmp_path_factory.mktemp(name))
    build_index(
        spark, df, idx_dir,
        BuildConfig(build_id=name, analyzer=analyzer, segment_size=64,
                    n_term_buckets=4, hot_df_threshold=100),
    )
    return BM25Index(spark, idx_dir)


# -- text_ko -----------------------------------------------------------------

def test_korean_fallback_analyzer_golden():
    a = make_korean_fallback_analyzer()
    # hangul runs -> overlapping syllable bigrams
    assert a("한국어 처리") == ["한국", "국어", "처리"]
    # a lone syllable emits itself
    assert a("밥") == ["밥"]
    # noun+particle eojeol shares the bare noun's bigram (학교에 vs 학교)
    assert a("학교에") == ["학교", "교에"]
    assert a("학교") == ["학교"]
    # mixed script splits at the boundary; latin run is one lowercased word
    assert a("spark로 분석") == ["spark", "로", "분석"]
    # hanja runs bigram like the text_cjk han class
    assert a("大韓民國") == ["大韓", "韓民", "民國"]
    # width fold: full-width latin -> ascii
    assert a("ＳＰＡＲＫ 테스트") == ["spark", "테스", "스트"]
    assert a(None) == []
    assert a("") == []


def test_korean_fallback_stop_set():
    a = make_korean_fallback_analyzer(frozenset({"그리고"}))
    # a whole-run stopword surface form drops; bigrams of other runs stay
    assert a("그리고 학교") == ["학교"]


def test_register_korean_chain_registers(tmp_path):
    register_korean_fallback_chain(REF_LANG, name="tzz_ko")
    assert QUERY_ANALYZERS["tzz_ko"]("한국어") == ["한국", "국어"]
    # no stopwords_ko.txt ships -> empty stop set, lang_dir optional
    register_korean_fallback_chain(None, name="tzz_ko2")
    assert QUERY_ANALYZERS["tzz_ko2"]("한국어") == ["한국", "국어"]


def test_text_ko_end_to_end_index(spark, tmp_path_factory):
    register_korean_fallback_chain(REF_LANG)
    idx = _mini_index(spark, tmp_path_factory, "ko", "text_ko", [
        "한국어를 공부합니다",          # studying Korean
        "학교에 갑니다",                # going to school
        "spark로 한국어 데이터 분석",   # analyzing Korean data with spark
    ])
    # bigram overlap: the bare noun query matches the noun+particle eojeol
    assert {r["doc_id"] for r in idx.search("한국어", k=5).collect()} == {0, 2}
    assert [r["doc_id"] for r in idx.search("학교", k=5).collect()] == [1]
    assert [r["doc_id"] for r in idx.search("spark", k=5).collect()] == [2]
    # phrase over the bigram stream works (consecutive bigram positions)
    assert [r["doc_id"] for r in idx.search_phrase("한국어", k=5).collect()] == [0, 2]


# -- phonetic_en (Double Metaphone) -------------------------------------------

def test_double_metaphone_golden():
    # canonical pairs from Philips' published algorithm / commons-codec
    assert double_metaphone("smith") == ("SM0", "XMT")
    assert double_metaphone("smyth") == ("SM0", "XMT")
    assert double_metaphone("schmidt") == ("XMT", "SMT")
    assert double_metaphone("jose") == ("HS", "HS")
    assert double_metaphone("thomas") == ("TMS", "TMS")
    assert double_metaphone("school") == ("SKL", "SKL")
    assert double_metaphone("knight") == ("NT", "NT")
    assert double_metaphone("philip") == ("FLP", "FLP")
    assert double_metaphone("wright") == ("RT", "RT")
    assert double_metaphone("ghost") == ("KST", "KST")
    assert double_metaphone("maurice") == ("MRS", "MRS")
    assert double_metaphone("island") == ("ALNT", "ALNT")  # silent s
    assert double_metaphone("caesar") == ("SSR", "SSR")
    assert double_metaphone("dumb") == ("TM", "TM")  # silent b
    assert double_metaphone("campbell") == ("KMPL", "KMPL")
    assert double_metaphone("zhao") == ("J", "J")
    assert double_metaphone("cough") == ("KF", "KF")
    assert double_metaphone("edge") == ("AJ", "AJ")
    assert double_metaphone("edgar") == ("ATKR", "ATKR")
    # sound-alike names collide on at least one code
    assert double_metaphone("catherine") == double_metaphone("katherine")
    assert double_metaphone("wasserman")[1] == double_metaphone("vasserman")[0]
    # non-letters
    assert double_metaphone("12345") == ("", "")
    assert double_metaphone("") == ("", "")


def test_double_metaphone_properties():
    """Property sweep (hypothesis): codes stay in the DM alphabet, respect
    max_len, are case-insensitive, and never crash on arbitrary text."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = set("AFHJKLMNPRSTX0")

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=24))
    def check(s):
        p, a = double_metaphone(s)
        assert set(p) <= alphabet and set(a) <= alphabet
        assert len(p) <= 4 and len(a) <= 4
        assert (p, a) == double_metaphone(s.upper()) == double_metaphone(s.lower())

    check()


def test_phonetic_en_chain_analyzer():
    register_phonetic_en_chain(name="tzz_phon")
    a = QUERY_ANALYZERS["tzz_phon"]
    # inject=false: primary replaces the token; differing alternate emitted
    # at the same position
    assert a("Smith") == ["SM0", "XMT"]
    assert a("Thomas") == ["TMS"]  # primary == alternate -> one form
    assert a("john 42") == ["JN", "AN", "42"]  # digits pass through
    assert a(None) == []


def test_phonetic_en_end_to_end_index(spark, tmp_path_factory):
    register_phonetic_en_chain()
    idx = _mini_index(spark, tmp_path_factory, "phon", "phonetic_en", [
        "John Smith from accounting",
        "Report by Jon Smyth",
        "completely unrelated text",
    ])
    # sound-alike query retrieves both spellings
    assert {r["doc_id"] for r in idx.search("smith", k=5).collect()} == {0, 1}
    assert {r["doc_id"] for r in idx.search("Smyth", k=5).collect()} == {0, 1}
    assert {r["doc_id"] for r in idx.search("jon", k=5).collect()} == {0, 1}


# -- text_ws ------------------------------------------------------------------

def test_text_ws_analyzer():
    register_text_ws_chain(name="tzz_ws")
    a = QUERY_ANALYZERS["tzz_ws"]
    # whitespace-only splitting: case and punctuation preserved
    assert a("Hello, World! foo-bar") == ["Hello,", "World!", "foo-bar"]
    assert a("  a  b ") == ["a", "b"]
    assert a(None) == []


def test_text_ws_end_to_end_case_sensitive(spark, tmp_path_factory):
    register_text_ws_chain()
    idx = _mini_index(spark, tmp_path_factory, "ws", "text_ws", [
        "Spark rocks",
        "spark rocks",
    ])
    # case-SENSITIVE: 'Spark' and 'spark' are distinct terms
    assert [r["doc_id"] for r in idx.search("Spark", k=5).collect()] == [0]
    assert [r["doc_id"] for r in idx.search("spark", k=5).collect()] == [1]
    assert {r["doc_id"] for r in idx.search("rocks", k=5).collect()} == {0, 1}


# -- lowercase (keyword tokenizer) ---------------------------------------------

def test_lowercase_chain_analyzer():
    register_lowercase_chain(name="tzz_low")
    a = QUERY_ANALYZERS["tzz_low"]
    # the ENTIRE value is one lowercased token
    assert a("Hello World") == ["hello world"]
    assert a("") == []
    assert a(None) == []


def test_lowercase_end_to_end_exact_match(spark, tmp_path_factory):
    register_lowercase_chain()
    idx = _mini_index(spark, tmp_path_factory, "low", "lowercase", [
        "Exact Match Value",
        "Exact Match",
    ])
    # whole-value exact match ignoring case (like Solr, the multi-word
    # value is addressed as a QUOTED phrase -- the keyword chain analyzes
    # it to one token; a sub-phrase is NOT a match). search() would split
    # the bare string into whitespace clauses, exactly as Solr's lucene
    # qparser does.
    assert [r["doc_id"]
            for r in idx.search_phrase("exact match VALUE", k=5).collect()] == [0]
    assert [r["doc_id"]
            for r in idx.search_phrase("EXACT MATCH", k=5).collect()] == [1]
    assert idx.search_phrase("match value", k=5).collect() == []


# -- text_general_rev (ReversedWildcard) ----------------------------------------

def test_reversed_wildcard_prefix_rewrite():
    assert reversed_wildcard_prefix("*ing") == REVERSE_MARKER + "gni"
    assert reversed_wildcard_prefix("?at") == REVERSE_MARKER + "ta"
    assert reversed_wildcard_prefix("ing*") is None  # trailing: normal prefix
    assert reversed_wildcard_prefix("*i*g") is None  # multiple wildcards
    assert reversed_wildcard_prefix("*") is None


def test_text_general_rev_end_to_end(spark, tmp_path_factory):
    register_text_general_rev_chain()
    idx = _mini_index(spark, tmp_path_factory, "rev", "text_general_rev", [
        "running and jumping fast",
        "walked slowly home",
        "sing a song",
    ])
    # query side analyzes as plain text_general: normal search unaffected
    assert [r["doc_id"] for r in idx.search("running", k=5).collect()] == [0]
    # leading-wildcard *ing -> dictionary PREFIX lookup on reversed terms
    # (a range scan, never a vocabulary regex) via the standard /terms path
    pref = reversed_wildcard_prefix("*ing")
    hits = {r["term"] for r in idx.terms(prefix=pref, limit=100).collect()}
    assert hits == {
        REVERSE_MARKER + w[::-1] for w in ("running", "jumping", "sing")
    }
    # BM25 scores are identical to the plain chain (uniform dl scaling
    # cancels): each doc's dl is exactly 2x its token count
    docs = {r["doc_id"]: r["dl"] for r in idx.docs().collect()}
    assert docs[0] == 8 and docs[1] == 6 and docs[2] == 6
