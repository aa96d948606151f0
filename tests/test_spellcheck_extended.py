"""/spell handler parity: WordBreakSolrSpellChecker (combineWords /
breakWords, solrconfig.xml:715-722) and the extended SpellCheckComponent
params the reference's /spell handler configures (solrconfig.xml:738-758:
count, extendedResults, alternativeTermCount, maxResultsForSuggest,
collate, collateExtendedResults, maxCollations, maxCollationTries)."""

import pytest

from solr_semantic_importer_spark.functions.analysis import analyze_text
from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=30, turns_per_conv=5, seed=29)
    idx_dir = str(tmp_path_factory.mktemp("spell"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="spell", **CFG))
    return BM25Index(spark, idx_dir)


@pytest.fixture(scope="module")
def dfm(corpus):
    out: dict = {}
    for r in corpus.docs().select("text").collect():
        for t in set(analyze_text(r["text"] or "")):
            out[t] = out.get(t, 0) + 1
    return out


def test_breakwords_engine_brute_force(corpus, dfm):
    """break_suggestions = every split of the token into two dictionary
    words, ranked by summed df desc (Lucene suggestWordBreaks, 1 change)."""
    got = corpus.break_suggestions("errorin", n=10)
    want = []
    t = "errorin"
    for i in range(1, len(t)):
        l, r = t[:i], t[i:]
        if dfm.get(l, 0) >= 1 and dfm.get(r, 0) >= 1:
            want.append({"word": f"{l} {r}", "freq": dfm[l] + dfm[r]})
    want.sort(key=lambda s: (-s["freq"], s["word"]))
    assert got == want
    assert {"word": "error in", "freq": dfm["error"] + dfm["in"]} in got
    # gibberish splits into no dictionary pair
    assert corpus.break_suggestions("zqxjkvw") == []


def test_combinewords_engine(corpus, dfm):
    """combine_suggestions merges an adjacent pair into a dictionary word
    when at least one side is itself a misspelling."""
    topic = next(t for t in sorted(dfm) if t.startswith("topic"))
    a, b = topic[:4], topic[4:]          # "topi" + "cN" -> "topicN"
    assert dfm.get(a, 0) == 0            # the left shard is not a word
    got = corpus.combine_suggestions([a, b], n=5)
    assert {"tokens": (a, b), "word": topic, "freq": dfm[topic]} in got
    # two correctly-spelled adjacent words never combine
    assert corpus.combine_suggestions(["error", "in"], n=5) == []


def test_facade_wordbreak_dictionary(corpus, dfm):
    sp = solr_select(corpus, {
        "q": "*:*", "rows": 0, "spellcheck": "true",
        "spellcheck.q": "errorin",
        "spellcheck.dictionary": "default,wordbreak",
    })["spellcheck"]
    entries = dict(zip(sp["suggestions"][::2], sp["suggestions"][1::2]))
    assert "error in" in entries["errorin"]["suggestion"]

    topic = next(t for t in sorted(dfm) if t.startswith("topic"))
    sq = f"{topic[:4]} {topic[4:]}"
    sp2 = solr_select(corpus, {
        "q": "*:*", "rows": 0, "spellcheck": "true", "spellcheck.q": sq,
        "spellcheck.dictionary": "default,wordbreak",
        "spellcheck.extendedResults": "true",
    })["spellcheck"]
    entries2 = dict(zip(sp2["suggestions"][::2], sp2["suggestions"][1::2]))
    # combineWords entry spans the original pair, Solr's multi-token shape
    assert sq in entries2
    combo = entries2[sq]["suggestion"][0]
    assert combo == {"word": topic, "freq": dfm[topic]}


def test_wordbreak_absent_without_dictionary_param(corpus):
    sp = solr_select(corpus, {
        "q": "*:*", "rows": 0, "spellcheck": "true",
        "spellcheck.q": "errorin",
    })["spellcheck"]
    entries = dict(zip(sp["suggestions"][::2], sp["suggestions"][1::2]))
    assert "error in" not in entries.get("errorin", {}).get("suggestion", [])


def test_unknown_dictionary_fails_loud(corpus):
    with pytest.raises(ValueError, match="spellcheck.dictionary"):
        solr_select(corpus, {
            "q": "*:*", "spellcheck": "true", "spellcheck.q": "errox",
            "spellcheck.dictionary": "default,nope",
        })


def test_alternative_term_count(corpus, dfm):
    """SuggestMode parity: an IN-INDEX term gets no entry by default
    (SUGGEST_WHEN_NOT_IN_INDEX) and up to alternativeTermCount suggestions
    when the param is set (SUGGEST_ALWAYS)."""
    rare = next(t for t in sorted(dfm) if t.startswith("rare")
                and dfm[t] == 1)
    base = {"q": "*:*", "rows": 0, "spellcheck": "true",
            "spellcheck.q": rare}
    sp = solr_select(corpus, base)["spellcheck"]
    assert sp["suggestions"] == []
    assert sp["correctlySpelled"]  # the term IS in the index

    sp2 = solr_select(corpus, {
        **base, "spellcheck.alternativeTermCount": "3",
        "spellcheck.extendedResults": "true",
    })["spellcheck"]
    entries = dict(zip(sp2["suggestions"][::2], sp2["suggestions"][1::2]))
    assert rare in entries
    ent = entries[rare]
    assert ent["origFreq"] == 1
    assert 1 <= len(ent["suggestion"]) <= 3
    assert all(s["word"] != rare and s["freq"] >= 1
               for s in ent["suggestion"])


def test_max_results_for_suggest_gate(corpus):
    """numFound above maxResultsForSuggest disables correction entirely."""
    base = {"q": "error", "rows": 0, "spellcheck": "true",
            "spellcheck.q": "topix42", "spellcheck.collate": "true"}
    sp = solr_select(corpus, {
        **base, "spellcheck.maxResultsForSuggest": "1",
    })["spellcheck"]
    assert sp["suggestions"] == [] and sp["correctlySpelled"]
    assert "collations" not in sp

    sp2 = solr_select(corpus, {
        **base, "spellcheck.maxResultsForSuggest": "1000000",
    })["spellcheck"]
    assert not sp2["correctlySpelled"] and sp2["suggestions"]


def test_count_caps_suggestions(corpus):
    sp = solr_select(corpus, {
        "q": "*:*", "rows": 0, "spellcheck": "true",
        "spellcheck.q": "topix42", "spellcheck.count": "2",
    })["spellcheck"]
    entries = dict(zip(sp["suggestions"][::2], sp["suggestions"][1::2]))
    assert 1 <= len(entries["topix42"]["suggestion"]) <= 2


def test_collations_ranked_verified(corpus):
    """maxCollations candidates in suggestion-rank order, each hit-verified
    under the request (maxCollationTries > 0)."""
    sp = solr_select(corpus, {
        "q": "*:*", "rows": 0, "spellcheck": "true",
        "spellcheck.q": "errox topix42", "spellcheck.collate": "true",
        "spellcheck.maxCollations": "3", "spellcheck.maxCollationTries": "10",
        "spellcheck.collateExtendedResults": "true",
        "spellcheck.extendedResults": "true",
    })["spellcheck"]
    entries = dict(zip(sp["suggestions"][::2], sp["suggestions"][1::2]))
    colls = sp["collations"][1::2]
    assert 1 <= len(colls) <= 3
    top = " ".join(entries[t]["suggestion"][0]["word"]
                   for t in ("errox", "topix42"))
    assert colls[0]["collationQuery"] == top
    for c in colls:
        assert c["hits"] == corpus.count_matches(c["collationQuery"]) > 0
        mc = c["misspellingsAndCorrections"]
        assert mc[0] == "errox" and mc[2] == "topix42"
    # collation queries are distinct and rank-ordered (first = all-top)
    assert len({c["collationQuery"] for c in colls}) == len(colls)


def test_collation_plain_and_unverified(corpus):
    """tries=0: exactly one unverified top-combination collation; without
    collateExtendedResults the entry is the bare query string."""
    sp = solr_select(corpus, {
        "q": "*:*", "rows": 0, "spellcheck": "true",
        "spellcheck.q": "errox", "spellcheck.collate": "true",
    })["spellcheck"]
    assert sp["collations"][0] == "collation"
    assert isinstance(sp["collations"][1], str)
    assert len(sp["collations"]) == 2
