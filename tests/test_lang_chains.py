"""Language chains from a configset lang/ dir: parsers, stemmers, and an
end-to-end text_fr index (build + stem-conflated query + highlight)."""

import os

import pytest

from solr_semantic_importer_spark.functions.analysis import QUERY_ANALYZERS
from solr_semantic_importer_spark.functions.lang_chains import (
    french_minimal_stem,
    german_minimal_stem,
    german_normalize,
    parse_stopwords_file,
    parse_wordlist_file,
    portuguese_minimal_stem,
    register_language_chains,
)

REF_LANG = "/root/reference/src/main/resources/default-base-config/lang"


def test_snowball_stopword_parser(tmp_path):
    p = tmp_path / "stopwords_xx.txt"
    p.write_text(
        " | header comment\n"
        "au             |  a + le\n"
        "ces            |  these\n"
        "\n"
        "de\n",
        encoding="utf-8",
    )
    assert parse_stopwords_file(str(p)) == frozenset({"au", "ces", "de"})


def test_wordset_stopword_parser(tmp_path):
    p = tmp_path / "stopwords_yy.txt"
    p.write_text("# comment\nthe  an\na\n", encoding="utf-8")
    assert parse_stopwords_file(str(p)) == frozenset({"the", "an", "a"})


def test_wordset_with_pipe_char_not_missniffed(tmp_path):
    # a '#'-commented wordset file containing a '|' somewhere must NOT be
    # sniffed as snowball (which would stop the literal token '#' and drop
    # all but the first word per line)
    p = tmp_path / "stopwords_zz.txt"
    p.write_text("# entries may contain | chars\nfoo bar\nbaz\n", encoding="utf-8")
    assert parse_stopwords_file(str(p)) == frozenset({"foo", "bar", "baz"})


def test_cjk_bigram_chain():
    from solr_semantic_importer_spark.functions.lang_chains import (
        cjk_bigram_tokens,
        register_cjk_bigram_chain,
    )

    # overlapping bigrams over the ideograph run; latin run stays a word;
    # NFKC folds full-width latin (Ｓｐａｒｋ) to ascii
    assert cjk_bigram_tokens("東京都 spark") == ["東京", "京都", "spark"]
    assert cjk_bigram_tokens("犬 Ｓｐａｒｋ") == ["犬", "spark"]
    register_cjk_bigram_chain()
    assert QUERY_ANALYZERS["text_cjk"]("東京は") == ["東京", "京は"]


def test_contractions_parser(tmp_path):
    p = tmp_path / "contractions_fr.txt"
    p.write_text("# Set of French contractions\nl\nqu\n", encoding="utf-8")
    assert parse_wordlist_file(str(p)) == ["l", "qu"]


def test_french_minimal_stem_rules():
    assert french_minimal_stem("chevaux") == "cheval"
    assert french_minimal_stem("tables") == "tabl"
    assert french_minimal_stem("table") == "table"  # < 6 chars: unchanged
    assert french_minimal_stem("continuer") == "continu"
    assert french_minimal_stem("baux") == "baux"  # < 6 chars


def test_german_minimal_stem_and_normalize():
    assert german_normalize("über") == "uber"
    assert german_normalize("straße") == "strasse"
    assert german_minimal_stem("katzen") == "katz"
    assert german_minimal_stem("bilder") == "bild"
    assert german_minimal_stem("haus") == "haus"  # < 5 chars
    assert german_minimal_stem("frauen") == "frau"


def test_portuguese_minimal_stem_rules():
    assert portuguese_minimal_stem("nações") == "nação"
    assert portuguese_minimal_stem("animais") == "animal"
    assert portuguese_minimal_stem("papéis") == "papel"
    assert portuguese_minimal_stem("livros") == "livro"
    assert portuguese_minimal_stem("mar") == "mar"


@pytest.mark.skipif(not os.path.isdir(REF_LANG), reason="reference absent")
def test_register_all_reference_language_chains():
    # fresh prefix -> registration count is independent of what other
    # tests already registered in this process
    fresh = register_language_chains(REF_LANG, prefix="tzz_")
    # 31 stopwords_XX.txt shipped; ja and th are excluded (their Lucene
    # chains need kuromoji/ThaiTokenizer -- regex tokenization would emit
    # whole clauses and silently return zero hits; text_cjk is the
    # schema's own no-dictionary fallback)
    assert len(fresh) == 29
    assert {"tzz_fr", "tzz_de", "tzz_ru"} <= set(fresh)
    assert not {"tzz_ja", "tzz_th"} & set(fresh)
    # default prefix: text_en must never be downgraded to stop-only by a
    # configset that happens to ship stopwords_en.txt
    names = register_language_chains(REF_LANG)
    assert "text_en" not in names
    from solr_semantic_importer_spark.functions.analysis import analyze_text_en

    assert QUERY_ANALYZERS["text_en"] is analyze_text_en  # built-in intact
    fr = QUERY_ANALYZERS["text_fr"]
    # elision particle 'l' (contractions_fr.txt) and stopwords ('de',
    # 'les', and 'été' -- être's participle IS a snowball stopword)
    # dropped; accented tokens stay whole; plurals stem minimally
    assert fr("l'été de les cafés tables") == ["cafés", "tabl"]
    de = QUERY_ANALYZERS["text_de"]
    # 'die' stopworded pre-normalization; umlaut folded post-stop, then stem
    assert de("die Häuser") == ["haus"]


def test_text_cjk_end_to_end_index(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from solr_semantic_importer_spark.functions.lang_chains import (
        register_cjk_bigram_chain,
    )
    from solr_semantic_importer_spark.index.build import BuildConfig, build_index
    from solr_semantic_importer_spark.query.engine import BM25Index

    register_cjk_bigram_chain()
    rows = [
        ("c0", 0, "user", "東京都に住んでいます", None),
        ("c0", 1, "assistant", "京都はきれいです", None),
        ("c0", 2, "user", "spark is fast", None),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.current_timestamp())
    idx_dir = str(tmp_path_factory.mktemp("cjk"))
    build_index(
        spark, df, idx_dir,
        BuildConfig(build_id="cjk", analyzer="text_cjk", segment_size=64,
                    n_term_buckets=4, hot_df_threshold=100),
    )
    idx = BM25Index(spark, idx_dir)
    # query 東京 -> bigram 東京 matches doc 0 only; 京都 matches both docs
    # (doc 0 via the overlapping 京都 bigram in 東京都)
    assert [r["doc_id"] for r in idx.search("東京", k=5).collect()] == [0]
    assert {r["doc_id"] for r in idx.search("京都", k=5).collect()} == {0, 1}
    assert [r["doc_id"] for r in idx.search("spark", k=5).collect()] == [2]


@pytest.mark.skipif(not os.path.isdir(REF_LANG), reason="reference absent")
def test_text_fr_end_to_end_index(spark, tmp_path_factory):
    from solr_semantic_importer_spark.index.build import BuildConfig, build_index
    from solr_semantic_importer_spark.query.engine import BM25Index

    register_language_chains(REF_LANG, languages=["fr"])
    rows = [
        ("c0", 0, "user", "les chevaux galopent dans les champs", None),
        ("c0", 1, "assistant", "un cheval galope vite", None),
        ("c0", 2, "user", "la table est grande", None),
    ]
    df = spark.createDataFrame(
        [(c, i, r, t, tool) for c, i, r, t, tool in rows],
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", __import__("pyspark").sql.functions.current_timestamp())
    idx_dir = str(tmp_path_factory.mktemp("fr"))
    build_index(
        spark, df, idx_dir,
        BuildConfig(build_id="fr", analyzer="text_fr", segment_size=64,
                    n_term_buckets=4, hot_df_threshold=100),
    )
    idx = BM25Index(spark, idx_dir)
    # singular query matches the plural document: both stem via the chain
    # ('chevaux' -> 'cheval', query 'cheval' < 6 chars stays 'cheval')
    hits = [r["doc_id"] for r in idx.search("cheval", k=5).collect()]
    assert len(hits) == 2  # docs 0 (chevaux) and 1 (cheval)
    # stopwords ('les', 'la', 'dans') never hit the dictionary
    assert idx.search("les", k=5).collect() == []


def test_stoptags_parser(tmp_path):
    from solr_semantic_importer_spark.functions.lang_chains import (
        parse_stoptags_file,
    )

    p = tmp_path / "stoptags_ja.txt"
    p.write_text("# comment\n助詞\n助詞-格助詞-一般\n記号\n\n", encoding="utf-8")
    tags = parse_stoptags_file(str(p))
    assert tags == {"助詞", "助詞-格助詞-一般", "記号"}


@pytest.mark.skipif(not os.path.isdir(REF_LANG), reason="reference absent")
def test_japanese_fallback_analyzer_golden():
    from solr_semantic_importer_spark.functions.lang_chains import (
        register_japanese_fallback_chain,
    )

    register_japanese_fallback_chain(REF_LANG, name="tzz_ja")
    a = QUERY_ANALYZERS["tzz_ja"]
    # kanji runs -> overlapping bigrams; the particles の/は/で and the
    # auxiliary ます are stopword surface forms and drop out
    assert a("日本語の形態素解析") == ["日本", "本語", "形態", "態素", "素解", "解析"]
    # katakanaStem: one trailing ー drops at length >= 4 ...
    assert a("コンピューター") == ["コンピュータ"]
    # ... but NOT below the minimumLength=4 gate
    assert a("ケーキ") == ["ケーキ"]
    # cjkWidth + lowercase: full-width romaji folds to ascii, half-width
    # katakana folds to full width and joins the adjacent katakana run
    assert a("ＡＢＣとﾃｽﾄデータ") == ["abc", "テストデータ"]
    # whole-run hiragana particles drop; content hiragana bigrams survive
    assert a("これはペンです") == ["れは", "ペン"]
    # 々 continues a kanji word
    assert a("人々") == ["人々"]
    # punctuation is discarded (kuromoji discardPunctuation / 記号 tags)
    assert a("完了。") == ["完了"]


@pytest.mark.skipif(not os.path.isdir(REF_LANG), reason="reference absent")
def test_text_ja_end_to_end_index(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from solr_semantic_importer_spark.functions.lang_chains import (
        register_japanese_fallback_chain,
    )
    from solr_semantic_importer_spark.index.build import BuildConfig, build_index
    from solr_semantic_importer_spark.query.engine import BM25Index

    register_japanese_fallback_chain(REF_LANG)
    rows = [
        ("c0", 0, "user", "東京都に住んでいます", None),
        ("c0", 1, "assistant", "京都はきれいな町です", None),
        ("c0", 2, "user", "コンピューターで解析します", None),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.current_timestamp())
    idx_dir = str(tmp_path_factory.mktemp("ja"))
    build_index(
        spark, df, idx_dir,
        BuildConfig(build_id="ja", analyzer="text_ja", segment_size=64,
                    n_term_buckets=4, hot_df_threshold=100),
    )
    idx = BM25Index(spark, idx_dir)
    # bigram overlap: 東京 hits doc 0; 京都 hits both (overlapping bigram
    # inside 東京都)
    assert [r["doc_id"] for r in idx.search("東京", k=5).collect()] == [0]
    assert {r["doc_id"] for r in idx.search("京都", k=5).collect()} == {0, 1}
    # the katakana-stemmed query form matches the stemmed indexed form
    assert [r["doc_id"] for r in idx.search("コンピューター", k=5).collect()] == [2]
    assert [r["doc_id"] for r in idx.search("コンピュータ", k=5).collect()] == [2]
    # a pure-particle query analyzes to nothing -> zero hits
    assert idx.search("のです", k=5).collect() == []


@pytest.mark.skipif(not os.path.isdir(REF_LANG), reason="reference absent")
def test_thai_fallback_analyzer_golden():
    from solr_semantic_importer_spark.functions.lang_chains import (
        register_thai_fallback_chain,
    )

    register_thai_fallback_chain(REF_LANG, name="tzz_th")
    a = QUERY_ANALYZERS["tzz_th"]
    # character clusters (leading vowel + consonant + combining marks)
    # -> overlapping bigrams: ภาษาไทย = ภา|ษา|ไท|ย
    assert a("ภาษาไทย") == ["ภาษา", "ษาไท", "ไทย"]
    # a single-cluster run emits itself
    assert a("แมว") == ["แมว"]
    # a run that IS a stopword surface form drops whole (ที่ = "that/at")
    assert a("ที่") == []
    # the stop filter also drops stopword BIGRAMS inside longer runs:
    # สวัสดีครับ = ส|วั|ส|ดี|ค|รั|บ -> 6 bigrams, minus รับ (stopword)
    assert a("สวัสดีครับ") == ["สวั", "วัส", "สดี", "ดีค", "ครั"]
    # mixed script: non-Thai runs tokenize as lowercased words
    assert a("this is MIXED ไทย text") == ["this", "is", "mixed", "ไทย", "text"]
    assert a(None) == []
    assert a("") == []


@pytest.mark.skipif(not os.path.isdir(REF_LANG), reason="reference absent")
def test_text_th_end_to_end_index(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from solr_semantic_importer_spark.functions.lang_chains import (
        register_thai_fallback_chain,
    )
    from solr_semantic_importer_spark.index.build import BuildConfig, build_index
    from solr_semantic_importer_spark.query.engine import BM25Index

    register_thai_fallback_chain(REF_LANG)
    rows = [
        ("c0", 0, "user", "ผมพูดภาษาไทยได้", None),      # I can speak Thai
        ("c0", 1, "assistant", "แมวนอนบนเสื่อ", None),    # the cat sleeps on the mat
        ("c0", 2, "user", "ภาษาอังกฤษยากมาก", None),      # English is very hard
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.current_timestamp())
    idx_dir = str(tmp_path_factory.mktemp("th"))
    build_index(
        spark, df, idx_dir,
        BuildConfig(build_id="th", analyzer="text_th", segment_size=64,
                    n_term_buckets=4, hot_df_threshold=100),
    )
    idx = BM25Index(spark, idx_dir)
    # ภาษา (language) is a shared cluster bigram of docs 0 and 2
    assert {r["doc_id"] for r in idx.search("ภาษา", k=5).collect()} == {0, 2}
    # ไทย only in doc 0; แมว only in doc 1
    assert [r["doc_id"] for r in idx.search("ภาษาไทย", k=5).collect()][0] == 0
    assert [r["doc_id"] for r in idx.search("แมว", k=5).collect()] == [1]
    # a pure-stopword query analyzes to nothing -> zero hits
    assert idx.search("ที่", k=5).collect() == []


# --- Arabic / Persian normalization (session-4 r4) ---------------------------


def test_arabic_normalizer_golden():
    from solr_semantic_importer_spark.functions.lang_chains import (
        arabic_normalize,
    )
    # hamza-alef forms fold to bare alef, diacritics and tatweel drop
    assert arabic_normalize("أُمّـة") == "امه"
    assert arabic_normalize("إلى") == "الي"
    assert arabic_normalize("آمن") == "امن"
    assert arabic_normalize("مكتبة") == "مكتبه"
    assert arabic_normalize("kitab") == "kitab"  # non-Arabic untouched


def test_arabic_stemmer_golden():
    from solr_semantic_importer_spark.functions.lang_chains import arabic_stem
    assert arabic_stem("الكتاب") == "كتاب"      # al- article
    assert arabic_stem("والكتاب") == "كتاب"     # wal-
    assert arabic_stem("كتابها") == "كتاب"      # -ha
    assert arabic_stem("مسلمون") == "مسلم"      # -un plural
    # ONE prefix only; too-short words keep their prefix
    assert arabic_stem("لل") == "لل"
    assert arabic_stem("وب") == "وب"


def test_persian_normalizer_golden():
    from solr_semantic_importer_spark.functions.lang_chains import (
        persian_normalize,
    )
    assert persian_normalize("كتابي") == "کتابی"   # kaf + arabic yeh fold
    assert persian_normalize("ۀ") == "ه"


def test_fa_chain_zwnj_and_normalization():
    # the schema's persian charFilter (ZWNJ -> space) is a structural
    # no-op under the regex tokenizer: ZWNJ already splits token runs
    register_language_chains(REF_LANG, languages=["fa"], prefix="t4_",
                             overwrite=True)
    terms = QUERY_ANALYZERS["t4_fa"]("می‌خواهم کتابي")
    assert "کتابی" in terms          # arabic yeh normalized to farsi yeh
    assert all("‌" not in t for t in terms)
    # stopword matching happens on NORMALIZED forms
    stop_raw = "که"  # a Persian stopword from the shipped file
    assert QUERY_ANALYZERS["t4_fa"](stop_raw) == []


def test_ar_chain_end_to_end():
    register_language_chains(REF_LANG, languages=["ar"], prefix="t4_",
                             overwrite=True)
    an = QUERY_ANALYZERS["t4_ar"]
    # article-prefixed and suffixed forms conflate with the bare stem
    assert an("الكتاب") == an("كتاب") != []
    # normalization applies before stemming: teh marbuta form conflates
    assert an("مكتبة")[0].endswith("ه") or an("مكتبة") == an("مكتبه")


def test_text_fa_end_to_end_index(spark, tmp_path_factory):
    from solr_semantic_importer_spark.index.build import BuildConfig, build_index
    from solr_semantic_importer_spark.query.engine import BM25Index

    register_language_chains(REF_LANG, languages=["fa"])
    rows = [
        # doc 0 writes with ARABIC yeh/kaf (كتابي); doc 1 with Farsi forms
        ("c0", 0, "user", "این كتابي بزرگ است", None),
        ("c0", 1, "assistant", "کتابی کوچک", None),
        ("c0", 2, "user", "می‌خواهم بروم", None),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", __import__("pyspark").sql.functions.current_timestamp())
    idx_dir = str(tmp_path_factory.mktemp("fa"))
    build_index(
        spark, df, idx_dir,
        BuildConfig(build_id="fa", analyzer="text_fa", segment_size=64,
                    n_term_buckets=4, hot_df_threshold=100),
    )
    idx = BM25Index(spark, idx_dir)
    # the Farsi-spelled query matches the Arabic-spelled document: both
    # normalize to the same term (yeh/kaf folding)
    hits = [r["doc_id"] for r in idx.search("کتابی", k=5).collect()]
    assert len(hits) == 2
    # ZWNJ splits the compound: its halves are searchable terms
    assert idx.search("خواهم", k=5).collect() != []
