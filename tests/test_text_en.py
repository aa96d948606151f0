"""Porter stemmer golden cases + text_en analyzer chain parity (SURVEY T5)."""

import pytest

from solr_semantic_importer_spark.functions.analysis import (
    EN_STOPWORDS,
    analyze_text_en,
    positions_map_en,
)
from solr_semantic_importer_spark.functions.stemmer import porter_stem
from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.index.docids import assign_doc_ids_window
from solr_semantic_importer_spark.oracle.bm25_ref import BM25Oracle
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

# classic vectors from Porter's published examples
GOLDEN = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"),
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
    ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
    ("hissing", "hiss"), ("fizzed", "fizz"), ("failing", "fail"),
    ("filing", "file"),
    ("happy", "happi"), ("sky", "sky"),
    ("relational", "relat"), ("conditional", "condit"),
    ("rational", "ration"), ("valenci", "valenc"), ("hesitanci", "hesit"),
    ("digitizer", "digit"), ("conformabli", "conform"),
    ("radicalli", "radic"), ("differentli", "differ"), ("vileli", "vile"),
    ("analogousli", "analog"), ("vietnamization", "vietnam"),
    ("predication", "predic"), ("operator", "oper"),
    ("feudalism", "feudal"), ("decisiveness", "decis"),
    ("hopefulness", "hope"), ("callousness", "callous"),
    ("formaliti", "formal"), ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"), ("formative", "form"), ("formalize", "formal"),
    ("electriciti", "electr"), ("electrical", "electr"), ("hopeful", "hope"),
    ("goodness", "good"),
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"), ("defensible", "defens"),
    ("irritant", "irrit"), ("replacement", "replac"),
    ("adjustment", "adjust"), ("dependent", "depend"),
    ("adoption", "adopt"), ("homologou", "homolog"),
    ("communism", "commun"), ("activate", "activ"),
    ("angulariti", "angular"), ("homologous", "homolog"),
    ("effective", "effect"), ("bowdlerize", "bowdler"),
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
]


@pytest.mark.parametrize("word,stem", GOLDEN)
def test_porter_golden(word, stem):
    assert porter_stem(word) == stem


def test_protwords_protected_from_stemming():
    """KeywordMarkerFilter (managed-schema.xml:360): protwords.txt members
    bypass Porter in every text_en form -- Porter WOULD stem both."""
    from solr_semantic_importer_spark.functions.stemmer import (
        DEFAULT_PROTWORDS,
        MemoStemmer,
        stem_en,
    )
    from solr_semantic_importer_spark.functions.word_delimiter import (
        analyze_text_en_splitting,
    )

    assert porter_stem("dontstems") == "dontstem"  # unprotected Porter stems it
    assert stem_en("dontstems") == "dontstems"
    assert stem_en("zwhacky") == "zwhacky"
    assert MemoStemmer()("dontstems") == "dontstems"
    assert analyze_text_en("dontstems zwhacky running") == [
        "dontstems", "zwhacky", "run"
    ]
    assert positions_map_en("a dontstems")["dontstems"] == [1]
    assert analyze_text_en_splitting("dontstems") == ["dontstems"]
    assert DEFAULT_PROTWORDS == frozenset({"dontstems", "zwhacky"})


def test_parse_protwords_shipped_reference_file():
    import os

    from solr_semantic_importer_spark.functions.stemmer import (
        DEFAULT_PROTWORDS,
        parse_protwords_file,
    )

    path = "/root/reference/src/main/resources/default-base-config/protwords.txt"
    if not os.path.exists(path):
        pytest.skip("reference configset not available")
    assert parse_protwords_file(path) == DEFAULT_PROTWORDS


def test_text_en_chain():
    # stop words removed, survivors stemmed, original positions kept
    text = "The running dogs are jumping over the fences"
    assert analyze_text_en(text) == ["run", "dog", "jump", "over", "fenc"]
    pm = positions_map_en(text)
    # "running" at token index 1, "dogs" at 2, "jumping" at 4 ...
    assert pm["run"] == [1] and pm["dog"] == [2] and pm["jump"] == [4]
    assert "the" not in pm and "are" not in pm
    assert "the" in EN_STOPWORDS


@pytest.fixture(scope="module")
def en_corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=60, turns_per_conv=5, seed=5)
    idx_dir = str(tmp_path_factory.mktemp("en"))
    cfg = BuildConfig(segment_size=100, block_size=16, n_term_buckets=4,
                      hot_df_threshold=50, hot_salts=4, build_id="en",
                      analyzer="text_en")
    build_index(spark, df, idx_dir, cfg)
    docs = [
        (r["doc_id"], r["text"])
        for r in assign_doc_ids_window(df).select("doc_id", "text").collect()
    ]
    return BM25Index(spark, idx_dir), BM25Oracle(docs, analyzer="text_en")


@pytest.mark.parametrize("q", [
    "errors in tool calls",   # stems to error/tool/call; "in" stopped
    "the testing runs",       # "the" stopped
    "topic42 topics",
    "zzz_unknown",
])
def test_text_en_rank_identical(en_corpus, q, spark):
    idx, oracle = en_corpus
    assert idx.analyzer_chain == "text_en"
    got = [(r["doc_id"], r["score"]) for r in idx.search(q, k=10).collect()]
    want = oracle.search(q, k=10)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-9


def test_text_en_highlight_wraps_surface_forms(en_corpus):
    """Query stems ('tabl', 'run') never appear literally in stored text;
    highlighting must re-analyze the surface tokens and wrap inflected
    forms like 'running'/'errors' (ADVICE: regex-on-stems misses them)."""
    idx, _ = en_corpus
    rows = idx.highlight("errors running", k=10).collect()
    assert rows
    marked_any = False
    for r in rows:
        text = r["text"] or ""
        hl = r["highlighted"]
        assert hl.replace("<em>", "").replace("</em>", "") == (r["text"] or hl)
        for surface in ("error", "errors", "running", "run", "runs"):
            if f"<em>{surface}</em>" in hl:
                marked_any = True
    assert marked_any


def test_text_en_phrase_stop_gap(en_corpus):
    idx, oracle = en_corpus
    # "error in tool": "in" is stopped -> phrase becomes stemmed
    # ["error", "tool"] with a POSITION GAP preserved, so it only matches
    # docs where "tool" directly follows... per stop-gap semantics the
    # engine and oracle must agree exactly either way.
    got = [(r["doc_id"], round(r["score"], 6))
           for r in idx.search_phrase("error in tool", k=10).collect()]
    want = [(d, round(s, 6)) for d, s in oracle.search_phrase("error in tool", k=10)]
    assert got == want
