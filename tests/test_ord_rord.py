"""ord()/rord() ValueSources (Lucene OrdFieldSource/ReverseOrdFieldSource):
the doc value's 1-based position in the field's sorted value dictionary,
resolved per-doc via a dictionary-rank join in bf=/boost= -- the same
envelope as termfreq(). Missing value -> 0; rord = n_terms + 1 - ord."""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=6, seed=23)
    idx_dir = str(tmp_path_factory.mktemp("ordrord"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="ord", **CFG))
    return df, BM25Index(spark, idx_dir)


def _rank_map(idx, field):
    vals = sorted(
        r[field]
        for r in idx.docs().select(field).distinct().collect()
        if r[field] is not None
    )
    return {v: i + 1 for i, v in enumerate(vals)}, len(vals)


def test_ord_adds_dictionary_rank(corpus):
    _, idx = corpus
    ranks, _ = _rank_map(idx, "role")
    base = {r["doc_id"]: r["score"]
            for r in idx.score_matches("error").collect()}
    roles = {r["doc_id"]: r["role"]
             for r in idx.docs().select("doc_id", "role").collect()}
    top = idx.search_boosted("error", k=10, bf="ord(role)").collect()
    assert top
    for r in top:
        expect = base[r["doc_id"]] + float(ranks[roles[r["doc_id"]]])
        assert r["score"] == pytest.approx(expect, abs=1e-12)


def test_rord_is_reverse_rank(corpus):
    _, idx = corpus
    ranks, n = _rank_map(idx, "conv_id")
    convs = {r["doc_id"]: r["conv_id"]
             for r in idx.docs().select("doc_id", "conv_id").collect()}
    base = {r["doc_id"]: r["score"]
            for r in idx.score_matches("tool").collect()}
    top = idx.search_boosted("tool", k=10, bf="rord(conv_id)").collect()
    for r in top:
        expect = base[r["doc_id"]] + float(n + 1 - ranks[convs[r["doc_id"]]])
        assert r["score"] == pytest.approx(expect, abs=1e-12)


def test_ord_missing_value_is_zero(corpus):
    _, idx = corpus
    # `tool` is NULL on non-tool turns: their ord(tool) contribution is 0
    tools = {r["doc_id"]: r["tool"]
             for r in idx.docs().select("doc_id", "tool").collect()}
    null_ids = [i for i, v in tools.items() if v is None]
    assert null_ids, "fixture needs docs with a NULL tool field"
    base = {r["doc_id"]: r["score"]
            for r in idx.score_matches("the").collect()}
    ranks, _ = _rank_map(idx, "tool")
    for r in idx.search_boosted("the", k=50, bf="ord(tool)").collect():
        rank = ranks.get(tools[r["doc_id"]], 0)
        assert r["score"] == pytest.approx(
            base[r["doc_id"]] + float(rank), abs=1e-12)


def test_ord_in_multiplicative_boost(corpus):
    _, idx = corpus
    ranks, _ = _rank_map(idx, "role")
    roles = {r["doc_id"]: r["role"]
             for r in idx.docs().select("doc_id", "role").collect()}
    base = {r["doc_id"]: r["score"]
            for r in idx.score_matches("error").collect()}
    for r in idx.search_boosted("error", k=8,
                                boost="sum(ord(role),1)").collect():
        expect = base[r["doc_id"]] * (ranks[roles[r["doc_id"]]] + 1.0)
        assert r["score"] == pytest.approx(expect, abs=1e-12)


def test_explain_boosted_carries_ord_exactly(corpus):
    _, idx = corpus
    top = idx.search_boosted("error", k=5, bf="ord(role)").collect()
    ids = [r["doc_id"] for r in top]
    comps = {c["doc_id"]: c for c in
             idx.explain_boosted("error", ids, bf="ord(role)")}
    for r in top:
        c = comps[r["doc_id"]]
        assert c["base"] + c["bf"][0] == r["score"]


def test_ord_fails_loud_outside_boost_sites(corpus):
    _, idx = corpus
    with pytest.raises(ValueError, match="per-doc"):
        solr_select(idx, {"q": "error", "sort": "ord(role) asc"})
    # frange compiles with a bare function_to_sql; its fail-loud message
    # differs but the contract (no silent wrong DocSet) holds
    with pytest.raises(ValueError, match="per-doc|index state"):
        solr_select(idx, {"q": "error", "fq": "{!frange l=1}rord(role)"})


def test_ord_above_cap_goes_distributed(corpus, monkeypatch):
    """r5 (VERDICT item 6): past ORD_MAX_DICT the rank dictionary is
    built DISTRIBUTED (range-partition -> per-partition counts ->
    broadcast prefix offsets -> per-partition row_number) instead of
    failing loud. Forcing the switch at 10 distinct values makes the
    40-conv conv_id field take the distributed path; results must equal
    the brute-force global rank (and therefore the in-heap path)."""
    import solr_semantic_importer_spark.query.engine as eng
    _, idx = corpus
    ranks, n = _rank_map(idx, "conv_id")
    assert n > 10  # the fixture must actually cross the forced cap
    base = {r["doc_id"]: r["score"]
            for r in idx.score_matches("error").collect()}
    convs = {r["doc_id"]: r["conv_id"]
             for r in idx.docs().select("doc_id", "conv_id").collect()}

    monkeypatch.setattr(eng, "ORD_MAX_DICT", 10)
    idx._ord_cache = {}  # drop any rank dict cached by earlier tests
    try:
        top = idx.search_boosted("error", k=15, bf="ord(conv_id)").collect()
        assert top
        for r in top:
            expect = base[r["doc_id"]] + float(ranks[convs[r["doc_id"]]])
            assert r["score"] == pytest.approx(expect, abs=1e-12)
        # rord over the distributed dictionary too
        top2 = idx.search_boosted("error", k=15,
                                  bf="rord(conv_id)").collect()
        for r in top2:
            expect = base[r["doc_id"]] + float(
                n + 1 - ranks[convs[r["doc_id"]]])
            assert r["score"] == pytest.approx(expect, abs=1e-12)
    finally:
        idx._ord_cache = {}  # don't leak forced-path dicts to other tests


def test_ord_rank_distributed_matches_brute(corpus):
    # the distributed ranker directly: global 1-based rank over a
    # near-unique value set (every doc_id distinct) with no single-task
    # sort anywhere
    _, idx = corpus
    vals = idx.docs().select("doc_id").distinct()
    got = {
        r["doc_id"]: r["__ord_rank"]
        for r in idx._ord_rank_distributed(vals, "doc_id").collect()
    }
    ordered = sorted(got)
    assert len(got) == len(ordered)
    for i, v in enumerate(ordered):
        assert got[v] == i + 1


def test_ord_arg_must_be_plain_field(corpus):
    _, idx = corpus
    with pytest.raises(ValueError, match="plain field"):
        idx.search_boosted("error", bf="ord(sum(turn_idx,1))").collect()
    with pytest.raises(ValueError, match="unknown field"):
        idx.search_boosted("error", bf="ord(nosuchfield)").collect()
