"""Round-4 ADVICE regression tests.

1. facet / facet.range respect q.op=AND and mm (Solr facets the EXACT
   filtered DocSet the response's numFound/docs reflect).
2. select_cursor_pages counts the match set once, not once per page.
3. the search_after keyset predicate uses one rounding convention per
   path (np.round kernels on WAND; np.round Arrow predicate on
   exhaustive) -- walks are rank-identical across modes.
4. a malformed cursorMark raises a clean ValueError, not a raw
   base64/json traceback.
5. the grouped /select path fails loud on components it drops.
"""

import base64

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index, decode_cursor_mark
from solr_semantic_importer_spark.query.select_api import (
    select_cursor_pages,
    solr_select,
)
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=60, turns_per_conv=6, seed=44)
    idx_dir = str(tmp_path_factory.mktemp("advr4"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="advr4", **CFG))
    return df, BM25Index(spark, idx_dir)


def _matched_set(idx, q, op="OR", mm=None, fq=None):
    return {
        int(r["doc_id"])
        for r in idx._matched_ids(q, op=op, fq=fq, mm=mm).collect()
    }


def _brute_facet(idx, doc_ids, field):
    want = {}
    for r in idx.docs().select("doc_id", field).collect():
        if int(r["doc_id"]) in doc_ids:
            want[r[field]] = want.get(r[field], 0) + 1
    return want


def test_facet_respects_op_and(corpus):
    _, idx = corpus
    q = "error tool"
    and_set = _matched_set(idx, q, op="AND")
    or_set = _matched_set(idx, q, op="OR")
    assert and_set and and_set != or_set  # corpus must discriminate
    got = {
        r["role"]: int(r["facet_count"])
        for r in idx.facet(q, "role", op="AND").collect()
    }
    assert got == _brute_facet(idx, and_set, "role")
    assert sum(got.values()) == len(and_set)


def test_facet_respects_mm(corpus):
    _, idx = corpus
    q = "error tool the"
    mm_set = _matched_set(idx, q, mm=2)
    or_set = _matched_set(idx, q)
    assert mm_set and mm_set != or_set
    got = {
        r["role"]: int(r["facet_count"])
        for r in idx.facet(q, "role", mm=2).collect()
    }
    assert got == _brute_facet(idx, mm_set, "role")


def test_facet_range_respects_op_and(corpus):
    _, idx = corpus
    q = "error tool"
    and_set = _matched_set(idx, q, op="AND")
    rows = idx.facet_range(q, "turn_idx", 0, 6, 2, op="AND").collect()
    got = {float(r["bucket_start"]): int(r["facet_count"]) for r in rows}
    want = {}
    for r in idx.docs().select("doc_id", "turn_idx").collect():
        if int(r["doc_id"]) not in and_set:
            continue
        v = float(r["turn_idx"])
        if 0 <= v < 6:
            b = float(0 + int(v // 2) * 2)
            want[b] = want.get(b, 0) + 1
    assert got == want
    assert sum(got.values()) <= len(and_set)


def test_select_facet_counts_match_response_docset(corpus):
    """The /select response's facet section must count the same DocSet its
    numFound reports when q.op=AND / mm are set."""
    _, idx = corpus
    resp = solr_select(idx, {
        "q": "error tool", "q.op": "AND", "rows": 0,
        "facet": "true", "facet.field": "role",
    })
    flat = resp["facet_counts"]["facet_fields"]["role"]
    assert sum(flat[1::2]) == resp["response"]["numFound"]
    resp2 = solr_select(idx, {
        "q": "error tool the", "mm": 2, "rows": 0,
        "facet": "true", "facet.field": "role",
    })
    flat2 = resp2["facet_counts"]["facet_fields"]["role"]
    assert sum(flat2[1::2]) == resp2["response"]["numFound"]


def test_facet_match_all(corpus):
    """idx.facet('*:*', f) counts every live doc under fq (MatchAllDocs),
    not the empty set the no-terms path would produce."""
    _, idx = corpus
    got = {
        r["role"]: int(r["facet_count"])
        for r in idx.facet("*:*", "role").collect()
    }
    assert sum(got.values()) == idx.docs().count()
    under_fq = {
        r["role"]: int(r["facet_count"])
        for r in idx.facet("*:*", "role", fq="role != 'tool'").collect()
    }
    assert "tool" not in under_fq and under_fq


def test_cursor_pages_count_once(corpus, monkeypatch):
    """A cursor walk computes numFound on page 1 and carries it: no
    O(full-match-set) count job per page."""
    _, idx = corpus
    calls = {"n": 0}
    orig = BM25Index.count_matches

    def counting(self, *a, **kw):
        calls["n"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(BM25Index, "count_matches", counting)
    pages = list(select_cursor_pages(idx, {"q": "error"}, page_size=3))
    assert len(pages) >= 3  # a real multi-page walk
    assert calls["n"] == 1
    nf = {p["response"]["numFound"] for p in pages}
    assert nf == {orig(idx, "error")}  # carried value is the exact count


def test_cursor_pages_carry_inexactness(corpus):
    """A cursor walk whose page-1 count used minExactCount (a lower
    bound) must keep reporting numFoundExact=false on carried pages."""
    _, idx = corpus
    exact = idx.count_matches("error")
    pages = list(select_cursor_pages(
        idx, {"q": "error", "minExactCount": 3}, page_size=3))
    if not pages[0]["response"]["numFoundExact"]:
        assert all(not p["response"]["numFoundExact"] for p in pages)
        assert pages[0]["response"]["numFound"] <= exact
    else:  # fewer matches than the window: exact verdict carries instead
        assert pages[0]["response"]["numFound"] == exact


def test_cursor_walk_rank_identity_exhaustive_vs_wand(corpus):
    """The exhaustive-mode cursor path (Arrow np.round keyset predicate)
    walks the identical sequence as the WAND path (kernel-enforced
    keyset) and as the unpaged ranking."""
    _, idx = corpus
    full = [(int(r["doc_id"]), round(float(r["score"]), 6))
            for r in idx.search("error in tool", k=50, use_cache=False,
                                mode="exhaustive").collect()]

    def walk(mode):
        out, cursor = [], "*"
        while True:
            rows, nxt = idx.search_cursor(
                "error in tool", k=7, cursor=cursor, mode=mode)
            out.extend(
                (int(r["doc_id"]), round(float(r["score"]), 6)) for r in rows
            )
            if nxt == cursor:
                return out
            cursor = nxt

    we, ww = walk("exhaustive"), walk("wand")
    assert we == ww  # both conventions walk the identical total order
    assert we[: len(full)] == full
    assert len(we) > len(full)  # the walk really went past page depth k


def test_malformed_cursor_mark_raises_cleanly(corpus):
    for bad in ["zzz-not-base64", base64.urlsafe_b64encode(b"[1,2,3]").decode(),
                base64.urlsafe_b64encode(b"{\"a\":1}").decode(),
                base64.urlsafe_b64encode(b"not json").decode()]:
        with pytest.raises(ValueError, match="unable to parse cursorMark"):
            decode_cursor_mark(bad)
    _, idx = corpus
    with pytest.raises(ValueError, match="unable to parse cursorMark"):
        solr_select(idx, {"q": "error", "cursorMark": "garbage!!"})


def test_grouped_select_fails_loud_on_dropped_components(corpus):
    _, idx = corpus
    base = {"q": "error", "group": "true", "group.field": "conv_id"}
    for extra in ({"cursorMark": "*"}, {"minExactCount": 10},
                  {"sort": "ts desc"}, {"start": 3},
                  {"facet": "true", "facet.field": "role"},
                  {"hl": "true"}, {"stats": "true", "stats.field": "dl"},
                  {"debugQuery": "true"}, {"spellcheck": "true"}):
        with pytest.raises(ValueError, match="group=true does not support"):
            solr_select(idx, {**base, **extra})
    # falsy component flags remain harmless
    assert "grouped" in solr_select(idx, {**base, "facet": "false"})


# ---- late-r4 self-review regression fixes ----

def _mk_idx(spark, tmp_path_factory, name, seed):
    from solr_semantic_importer_spark.index.build import BuildConfig, build_index
    from solr_semantic_importer_spark.query.engine import BM25Index
    from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

    df = generate_transcripts(spark, n_convs=30, turns_per_conv=5, seed=seed)
    d = str(tmp_path_factory.mktemp(name))
    build_index(spark, df, d, BuildConfig(
        build_id=name, segment_size=100, block_size=16, n_term_buckets=4,
        hot_df_threshold=50, hot_salts=4))
    return BM25Index(spark, d)


@pytest.fixture(scope="module")
def rev_idx(spark, tmp_path_factory):
    return _mk_idx(spark, tmp_path_factory, "rev", 41)


def test_terms_qparser_rejects_unknown_local_params(rev_idx):
    with pytest.raises(ValueError):
        rev_idx.score_matches(
            "error", fq="{!terms f=role separator=|}a|b").count()
    with pytest.raises(ValueError):
        rev_idx.score_matches(
            "error", fq="{!terms f=turn_idx}1,dl").count()


def test_component_paths_reject_rq_tv_expand(rev_idx):
    from solr_semantic_importer_spark.query.select_api import solr_select

    base = {"q": "error", "group": "true", "group.field": "conv_id"}
    for extra in ({"rq": "{!rerank reRankQuery=x}"}, {"tv": "true"},
                  {"expand": "true"}):
        with pytest.raises(ValueError):
            solr_select(rev_idx, {**base, **extra})
    coll = {"q": "error", "fq": "{!collapse field=conv_id}"}
    for extra in ({"rq": "{!rerank reRankQuery=x}"}, {"tv": "true"}):
        with pytest.raises(ValueError):
            solr_select(rev_idx, {**coll, **extra})


def test_rerank_rejects_negative_weight(rev_idx):
    from solr_semantic_importer_spark.query.select_api import solr_select

    with pytest.raises(ValueError):
        solr_select(rev_idx, {
            "q": "error",
            "rq": "{!rerank reRankQuery=merge reRankWeight=-1}",
        })


def test_elevate_unknown_id_dropped(rev_idx):
    from solr_semantic_importer_spark.query.select_api import solr_select

    base = solr_select(rev_idx, {"q": "error", "rows": 3, "fl": "doc_id"})
    resp = solr_select(rev_idx, {
        "q": "error", "rows": 3, "elevateIds": "999999999",
        "fl": "doc_id",
    })
    # phantom id never fabricated; numFound unchanged
    assert [d["doc_id"] for d in resp["response"]["docs"]] == \
        [d["doc_id"] for d in base["response"]["docs"]]
    assert resp["response"]["numFound"] == base["response"]["numFound"]


def test_boost_function_may_read_doc_id(rev_idx):
    got = rev_idx.search_boosted(
        "error", k=5, bf=["div(doc_id,1000)"]).collect()
    base = {r["doc_id"]: r["score"]
            for r in rev_idx.score_matches("error").collect()}
    want = sorted(
        ((i, s + i / 1000.0) for i, s in base.items()),
        key=lambda t: (-round(t[1], 6), t[0]),
    )[:5]
    assert [r["doc_id"] for r in got] == [i for i, _ in want]


def test_grouped_by_nullable_field_drops_null_group(rev_idx):
    # tool is null on non-tool turns: the null group must not occupy a
    # head slot and then vanish in the equi-join
    page = rev_idx.search_grouped("error tool", "tool", k=10,
                                  group_limit=1).collect()
    vals = [r["group_value"] for r in page]
    assert vals and all(v is not None for v in vals)
    # ranks are contiguous (no silently-dropped head slot)
    assert sorted({r["group_rank"] for r in page}) == \
        list(range(1, len(set(vals)) + 1))


def test_hl_tag_with_dollar(rev_idx):
    from solr_semantic_importer_spark.query.select_api import solr_select

    resp = solr_select(rev_idx, {
        "q": "error", "rows": 2, "hl": "true",
        "hl.tag.pre": "$$", "hl.tag.post": "$1", "fl": "doc_id",
    })
    frags = [v["text"][0] for v in resp["highlighting"].values()]
    assert any("$$" in f for f in frags)  # literal, not a group ref


def test_fl_score_plus_pseudo_field_only(rev_idx):
    from solr_semantic_importer_spark.query.select_api import solr_select

    resp = solr_select(rev_idx, {
        "q": "error", "rows": 2, "fl": "score,plus:sum(turn_idx,1)",
    })
    for d in resp["response"]["docs"]:
        assert set(d) == {"doc_id", "score", "plus"}


def test_json_facet_null_stat_sort(rev_idx):
    from solr_semantic_importer_spark.query.json_facet import json_facet

    # min(tool) is NULL for buckets whose docs all lack tool -- the
    # driver-side re-sort must not TypeError and must match nulls-last
    got = json_facet(rev_idx, "*:*", {
        "by_role": {"type": "terms", "field": "role",
                    "sort": {"t": "desc"}, "facet": {"t": "min(tool)"}},
    })
    vals = [b["t"] for b in got["by_role"]["buckets"]]
    nn = [v for v in vals if v is not None]
    assert vals == sorted(nn, reverse=True) + [None] * (len(vals) - len(nn))
    with pytest.raises(ValueError):  # nested missing fails loud
        json_facet(rev_idx, "*:*", {
            "a": {"type": "terms", "field": "role",
                  "facet": {"b": {"type": "terms", "field": "turn_idx",
                                  "missing": True}}},
        })
