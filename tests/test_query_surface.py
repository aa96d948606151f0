"""Q6 suggest, Q7 highlight, I5 delete-by-query tombstones, A4 history."""

import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.oracle.bm25_ref import BM25Oracle
from solr_semantic_importer_spark.index.docids import assign_doc_ids_window
from solr_semantic_importer_spark.plans.manifest import BuildHistory
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=80, turns_per_conv=6, seed=11)
    idx_dir = str(tmp_path_factory.mktemp("qs"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="qs", **CFG))
    return df, BM25Index(spark, idx_dir), idx_dir


def test_suggest_corrects_rare_typo(corpus):
    _, idx, _ = corpus
    # "topix42" is an OOV typo at distance 1 from the real "topic42"
    got = [r["term"] for r in idx.suggest("topix42", n=5).collect()]
    assert got, "expected suggestions"
    assert "topic42" in got
    # a frequent term is NOT corrected (maxQueryFrequency gate): "error" is
    # in the hot vocab, so its df/N far exceeds 0.01
    assert idx.suggest("error").collect() == []
    # below minQueryLength -> no suggestions (minQueryLength=4)
    assert idx.suggest("th").collect() == []


def test_highlight_wraps_terms(corpus):
    _, idx, _ = corpus
    rows = idx.highlight("error tool", k=5).collect()
    assert rows
    for r in rows:
        if r["text"] and ("error" in r["text"] or "tool" in r["text"]):
            assert "<em>" in r["highlighted"]
            # highlighted text minus markers == original
            assert (
                r["highlighted"].replace("<em>", "").replace("</em>", "")
                == r["text"]
            )


def test_delete_by_query_tombstones(corpus, spark):
    df, idx, idx_dir = corpus
    before = [r["doc_id"] for r in idx.search("error in tool", k=20).collect()]
    tool_ids = {
        r["doc_id"]
        for r in assign_doc_ids_window(df)
        .filter(F.col("role") == "tool")
        .select("doc_id")
        .collect()
    }
    n = idx.delete_by_query("role = 'tool'")
    assert n == len(tool_ids)
    # every query path excludes tombstoned docs
    for kw in (dict(mode="wand"), dict(mode="exhaustive"), dict(fq="role IS NOT NULL")):
        got = [r["doc_id"] for r in idx.search("error in tool", k=20, **kw).collect()]
        assert not (set(got) & tool_ids)
    ph = [r["doc_id"] for r in idx.search_phrase("error in", k=20).collect()]
    assert not (set(ph) & tool_ids)
    # scores of surviving docs unchanged (df frozen until compaction,
    # matching Lucene's delete-then-merge behavior)
    after = [r["doc_id"] for r in idx.search("error in tool", k=20).collect()]
    expect = [d for d in before if d not in tool_ids]
    # the head of the filtered pre-delete ranking must be preserved
    assert after[: len(expect[:10])][:5] == expect[:5]
    # oracle cross-check: BM25 over live docs with frozen (full-corpus) stats
    ids_text = [
        (r["doc_id"], r["text"])
        for r in assign_doc_ids_window(df).select("doc_id", "text").collect()
    ]
    oracle = BM25Oracle(ids_text)
    want = [
        d for d, _ in oracle.search("error in tool", k=200)
        if d not in tool_ids
    ][:20]
    assert after == want


def test_match_all(corpus):
    df, idx, _ = corpus
    # the module fixture may already carry tombstones from the delete test
    tdf = idx._tombstones_df()
    dead = set() if tdf is None else {r["doc_id"] for r in tdf.collect()}
    live = [d for d in range(idx.n_docs) if d not in dead]
    rows = idx.match_all(k=7).collect()
    assert [r["doc_id"] for r in rows] == live[:7]
    assert all(r["score"] == 1.0 for r in rows)
    paged = idx.match_all(k=3, offset=2).collect()
    assert [r["doc_id"] for r in paged] == live[2:5]
    filtered = idx.match_all(k=5, fq="role = 'user'").collect()
    assert len(filtered) == 5


def test_compaction_applies_deletes_and_refreshes_stats(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=5, seed=3)
    idx_dir = str(tmp_path_factory.mktemp("cp")) + "/idx"
    build_index(spark, df, idx_dir, BuildConfig(build_id="c1", **CFG))
    idx = BM25Index(spark, idx_dir)
    n_before = idx.n_docs
    idx.delete_by_query("role = 'tool'")
    idx2 = idx.compact(BuildConfig(build_id="c2", **CFG))
    live_df = df.filter(F.col("role") != "tool")
    assert idx2.n_docs == live_df.count() < n_before
    # compacted index == fresh build over the live subset (stats refreshed)
    fresh_dir = str(tmp_path_factory.mktemp("cp2")) + "/idx"
    build_index(spark, live_df, fresh_dir, BuildConfig(build_id="c3", **CFG))
    fresh = BM25Index(spark, fresh_dir)
    for q in ["error in tool call", "the", "topic7"]:
        a = [(r["doc_id"], round(r["score"], 6)) for r in idx2.search(q, k=10).collect()]
        b = [(r["doc_id"], round(r["score"], 6)) for r in fresh.search(q, k=10).collect()]
        assert a == b
    # tombstones gone after compaction
    assert idx2._tombstones_df() is None


def test_fq_wand_zone_path_matches_exhaustive(corpus):
    """fq no longer disables WAND: the allowed-doc set is cogrouped into the
    segment kernels and the zone path must agree with exhaustive scoring."""
    _, idx, _ = corpus
    idx.exhaustive_cutoff = 0  # force the zone-skipping branch on tiny data
    try:
        for fq in ("role = 'user'", "role != 'tool'"):
            w = [
                (r["doc_id"], round(r["score"], 6))
                for r in idx.search("error in tool", k=10, fq=fq, mode="wand").collect()
            ]
            e = [
                (r["doc_id"], round(r["score"], 6))
                for r in idx.search(
                    "error in tool", k=10, fq=fq, mode="exhaustive"
                ).collect()
            ]
            assert w and w == e
    finally:
        del idx.exhaustive_cutoff


def test_filter_cache_and_null_fq_semantics(corpus):
    """Solr-filterCache analog: repeated fq strings hit a persisted LRU
    entry instead of re-scanning docs, and the EXCLUDE (complement)
    representation must treat NULL-predicate docs as non-matching (Solr fq
    requires a positive match): `tool != 'x'` is NULL on turns with no tool,
    and those docs must stay filtered out even when the cached side is the
    complement set."""
    df, idx, _ = corpus
    # broad fq with NULLs -> majority matches -> EXCLUDE representation;
    # the complement must contain the NULL-predicate docs.
    fq = "tool IS NULL OR tool != 'tool_1'"
    expect = idx._anti_dead(idx.docs().filter(fq)).count()
    assert idx.match_all(k=10**6, fq=fq).count() == expect
    assert idx._filter_cache[fq][0] == idx._FQ_EXCLUDE
    # selective fq -> INCLUDE representation, and WAND/exhaustive agree
    fq2 = "tool = 'tool_1'"
    w = [(r["doc_id"], round(r["score"], 6))
         for r in idx.search("error", k=10, fq=fq2, mode="wand").collect()]
    e = [(r["doc_id"], round(r["score"], 6))
         for r in idx.search("error", k=10, fq=fq2, mode="exhaustive").collect()]
    assert w == e
    assert idx._filter_cache[fq2][0] == idx._FQ_INCLUDE
    # cache entries are persisted DataFrames, reused across query shapes
    assert idx._filter_cache[fq2][1].storageLevel.useMemory
    # LRU eviction unpersists the oldest entry
    old_max = idx.FILTER_CACHE_MAX
    idx.FILTER_CACHE_MAX = 1
    try:
        victim = idx._filter_cache[fq][1]
        idx.search("error", k=3, fq="role = 'assistant'").collect()
        assert list(idx._filter_cache) == ["role = 'assistant'"]
        assert not victim.storageLevel.useMemory  # unpersisted
    finally:
        idx.FILTER_CACHE_MAX = old_max


def test_query_result_cache(corpus):
    """Solr queryResultCache analog: the ordered DocList of a query is kept
    driver-side at window granularity (queryResultWindowSize=20), so a
    repeated query or a later page of the same query never re-scores; the
    cache agrees exactly with the engine and is dropped when docs die."""
    _, idx, _ = corpus
    idx._result_cache.clear()
    key = lambda rows: [(r["doc_id"], round(r["score"], 6)) for r in rows]
    a = key(idx.search("error tool", k=5).collect())
    assert len(idx._result_cache) == 1
    ((rows, complete),) = idx._result_cache.values()
    assert complete or len(rows) == idx.QUERY_RESULT_WINDOW
    # a later page of the same query is served from the same entry
    b = key(idx.search("error tool", k=5, offset=5).collect())
    assert len(idx._result_cache) == 1
    # cache agrees with the engine bit-for-bit
    assert a == key(idx.search("error tool", k=5, use_cache=False).collect())
    assert b == key(
        idx.search("error tool", k=5, offset=5, use_cache=False).collect()
    )
    # with_stored on a hit joins stored fields in cached order
    st = idx.search("error tool", k=5, with_stored=True).collect()
    assert key(st) == a and "text" in st[0].asDict()
    # delete-by-query invalidates cached DocLists (searcher-reopen analog)
    idx.delete_by_query("conv_id = 'no-such-conv'")
    assert len(idx._result_cache) == 0


def test_fl_field_list(corpus):
    """Solr fl: only the requested stored fields come back, on both the
    cached-DocList path and the uncached path, and the projection prunes
    the docs ReadSchema."""
    import contextlib
    import io

    _, idx, _ = corpus
    idx._result_cache.clear()
    r = idx.search("error tool", k=3, fl=["conv_id", "role"]).collect()
    assert set(r[0].asDict()) == {"doc_id", "score", "conv_id", "role"}
    r2 = idx.search(
        "error tool", k=3, fl=["conv_id", "role"], use_cache=False
    ).collect()
    assert [(x["doc_id"], x["conv_id"], x["role"]) for x in r] == [
        (x["doc_id"], x["conv_id"], x["role"]) for x in r2
    ]
    p = idx.search_phrase("error in", k=3, fl=["conv_id"])
    assert set(p.columns) == {"doc_id", "score", "conv_id"}
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        idx.search("error tool", k=3, fl=["conv_id"]).explain("formatted")
    plan = buf.getvalue()
    docs_schemas = [
        ln for ln in plan.splitlines()
        if "ReadSchema" in ln and "conv_id" in ln
    ]
    assert docs_schemas and all("text" not in ln for ln in docs_schemas)


def test_stored_field_fetch_pushes_docid_filter(corpus):
    """with_stored on a cached DocList must push `doc_id IN (...)` into the
    docs parquet scan (row-group pruning), never scan the whole table."""
    import contextlib
    import io

    _, idx, _ = corpus
    idx._result_cache.clear()
    df = idx.search("error tool", k=5, with_stored=True)  # populates + hits
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    pushed = [
        ln for ln in plan.splitlines()
        if "PushedFilters" in ln and "In(doc_id" in ln
    ]
    assert pushed, f"no doc_id IN pushdown in plan:\n{plan[:2000]}"


def test_massive_delete_stays_distributed(spark, tmp_path_factory):
    """Delete ~2/3 of the corpus (the reference's `-crawl_id:X` shape can
    tombstone everything): the engine must hold tombstones only as a
    DataFrame -- no driver-side id set, no closure-captured arrays."""
    from pyspark.sql import DataFrame

    df = generate_transcripts(spark, n_convs=60, turns_per_conv=5, seed=7)
    idx_dir = str(tmp_path_factory.mktemp("bigdel")) + "/idx"
    build_index(spark, df, idx_dir, BuildConfig(build_id="bd", **CFG))
    idx = BM25Index(spark, idx_dir)
    n = idx.delete_by_query("role IN ('tool', 'assistant')")
    assert n >= idx.n_docs * 0.5
    # the handle exposes tombstones ONLY as a DataFrame
    tdf = idx._tombstones_df()
    assert isinstance(tdf, DataFrame)
    assert not any(
        isinstance(getattr(idx, a), (set, frozenset))
        for a in vars(idx)
    ), "driver-side tombstone id set resurrected"
    # every query path excludes the deleted majority
    idx.exhaustive_cutoff = 0  # zone path must see the cogrouped dead ids
    try:
        for kw in (
            dict(mode="wand"),
            dict(mode="exhaustive"),
            dict(mode="wand", fq="role IS NOT NULL"),
        ):
            rows = idx.search(
                "error in tool", k=30, with_stored=True, **kw
            ).collect()
            assert rows and all(r["role"] == "user" for r in rows)
    finally:
        del idx.exhaustive_cutoff
    live = idx.match_all(k=10_000).collect()
    assert len(live) == idx.n_docs - n


def test_compact_without_config_preserves_build_config(spark, tmp_path_factory):
    """ADVICE: compact() with config=None must reconstruct the original
    BuildConfig from the manifest (analyzer, layout), not revert to defaults."""
    df = generate_transcripts(spark, n_convs=30, turns_per_conv=4, seed=5)
    idx_dir = str(tmp_path_factory.mktemp("cfgkeep")) + "/idx"
    build_index(
        spark, df, idx_dir,
        BuildConfig(build_id="ck1", analyzer="text_en", **CFG),
    )
    idx = BM25Index(spark, idx_dir)
    idx.delete_by_query("role = 'tool'")
    idx2 = idx.compact()
    assert idx2.analyzer_chain == "text_en"
    fin = idx2._finalize_metrics
    assert int(fin["segment_size"]) == CFG["segment_size"]
    assert int(fin["block_size"]) == CFG["block_size"]
    assert int(fin["n_term_buckets"]) == CFG["n_term_buckets"]
    # stemmed query still works post-compaction (chain preserved end to end)
    assert idx2.analyze_query("errors running") == ["error", "run"]


def test_build_history_recorded(corpus):
    _, _, idx_dir = corpus
    hist = BuildHistory(idx_dir).entries()
    assert len(hist) >= 1
    last = hist[-1]
    assert last["build_id"] == "qs" and last["n_docs"] > 0
    assert "docs_per_sec" in last and "postings" in last
