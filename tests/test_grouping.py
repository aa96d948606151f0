"""Solr result grouping: top group_limit docs per group, groups ordered by
their head doc's (round6 score, doc_id) key. Verified against a brute-force
pandas regroup of the full exhaustive match set. group.field=conv_id is the
domain's canonical use: best matching turns per conversation."""

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
    idx_dir = str(tmp_path_factory.mktemp("grp"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="grp", **CFG))
    return df, BM25Index(spark, idx_dir)


def _brute_groups(idx, q, field, k, limit, op="OR", fq=None, mm=None):
    rows = idx.score_matches(q, op=op, fq=fq, mm=mm).collect()
    scores = {r["doc_id"]: r["score"] for r in rows}
    fld = {
        r["doc_id"]: r[field]
        for r in idx.docs().select("doc_id", field).collect()
        if r["doc_id"] in scores
    }
    by_group: dict = {}
    for d, s in scores.items():
        by_group.setdefault(fld[d], []).append((round(s, 6), d))
    for g in by_group.values():
        g.sort(key=lambda x: (-x[0], x[1]))
    ordered = sorted(by_group.items(), key=lambda kv: (-kv[1][0][0], kv[1][0][1]))
    return [
        (gv, [(doc, s) for s, doc in docs[:limit]])
        for gv, docs in ordered[:k]
    ]


def test_grouped_matches_bruteforce(corpus):
    _, idx = corpus
    q, field, k, limit = "error tool", "conv_id", 5, 2
    got_rows = idx.search_grouped(q, field, k=k, group_limit=limit).collect()
    got: dict = {}
    order = []
    for r in sorted(got_rows, key=lambda r: (r["group_rank"], r["rank_in_group"])):
        if r["group_value"] not in got:
            order.append(r["group_value"])
        got.setdefault(r["group_value"], []).append(
            (r["doc_id"], round(r["score"], 6))
        )
    want = _brute_groups(idx, q, field, k, limit)
    assert order == [gv for gv, _ in want]
    for gv, docs in want:
        assert got[gv] == docs


def test_grouped_head_is_flat_top1(corpus):
    """The first group's head IS the flat #1 doc (Solr invariant)."""
    _, idx = corpus
    top = idx.search("error", k=1, use_cache=False).collect()[0]
    g = idx.search_grouped("error", "conv_id", k=1).collect()
    head = [r for r in g if r["group_rank"] == 1 and r["rank_in_group"] == 1][0]
    assert head["doc_id"] == top["doc_id"]


def _assert_grouped_equals_brute(idx, q, field, k, limit, **kw):
    got_rows = idx.search_grouped(q, field, k=k, group_limit=limit, **kw).collect()
    got: dict = {}
    order = []
    for r in sorted(got_rows, key=lambda r: (r["group_rank"], r["rank_in_group"])):
        if r["group_value"] not in got:
            order.append(r["group_value"])
        got.setdefault(r["group_value"], []).append(
            (r["doc_id"], round(r["score"], 6))
        )
    want = _brute_groups(idx, q, field, k, limit, **kw)
    assert order == [gv for gv, _ in want]
    for gv, docs in want:
        assert got[gv] == docs
    return got


def test_grouped_collapse_cross_segment_groups(corpus):
    """group.field=role spans every segment (conv_id is segment-clustered,
    role is not): the per-segment collapse must union correctly across
    segments before the global window cut."""
    _, idx = corpus
    got = _assert_grouped_equals_brute(idx, "error tool", "role", 3, 4)
    assert len(got) == 3  # all three roles matched somewhere


def test_grouped_collapse_under_fq_and_mm(corpus):
    """fq and op/mm filter BEFORE the collapse -- a filtered-out doc must
    not evict a live doc from its group's per-segment top-limit."""
    _, idx = corpus
    _assert_grouped_equals_brute(
        idx, "error tool", "conv_id", 4, 2, fq="role != 'tool'"
    )
    _assert_grouped_equals_brute(idx, "error tool", "conv_id", 4, 2, op="AND")
    _assert_grouped_equals_brute(idx, "error tool the", "conv_id", 4, 2, mm=2)


def test_grouped_collapse_after_delete(spark, tmp_path_factory):
    from solr_semantic_importer_spark.sources.transcripts import (
        generate_transcripts,
    )

    df = generate_transcripts(spark, n_convs=30, turns_per_conv=6, seed=77)
    idx_dir = str(tmp_path_factory.mktemp("grpdel"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="grpdel", **CFG))
    idx = BM25Index(spark, idx_dir)
    before = idx.search_grouped("error", "conv_id", k=5, group_limit=2).collect()
    n = idx.delete_by_query("role = 'user'")
    assert n > 0
    got = _assert_grouped_equals_brute(idx, "error", "conv_id", 5, 2)
    # tombstoned docs are really gone from the grouped page
    dead = {
        r["doc_id"]
        for r in idx.docs().filter("role = 'user'").select("doc_id").collect()
    }
    for docs in got.values():
        assert not ({d for d, _ in docs} & dead)
    assert before  # sanity: the pre-delete page existed


def test_gmap_field_value_cache(corpus):
    """The fieldValueCache analog: the first grouped query persists the
    field's doc->group map; repeated queries reuse it (entry present,
    results identical), and release() unpersists."""
    _, idx = corpus
    idx._gmap_cache.clear()
    r1 = idx.search_grouped("error", "conv_id", k=3, group_limit=1).collect()
    assert "conv_id" in idx._gmap_cache
    assert idx._gmap_cache["conv_id"].storageLevel.useMemory
    r2 = idx.search_grouped("error", "conv_id", k=3, group_limit=1).collect()
    assert [tuple(r) for r in r1] == [tuple(r) for r in r2]
    idx.release()
    assert not idx._gmap_cache


def test_select_grouped_shape(corpus):
    _, idx = corpus
    resp = solr_select(idx, {
        "q": "error tool", "group": "true", "group.field": "conv_id",
        "rows": 3, "group.limit": 2, "group.ngroups": "true",
        "fl": "doc_id,conv_id,score",
    })
    assert "response" not in resp  # Solr: grouped replaces response
    sec = resp["grouped"]["conv_id"]
    assert sec["matches"] == idx.count_matches("error tool")
    assert sec["ngroups"] >= len(sec["groups"])
    assert len(sec["groups"]) == 3
    want = _brute_groups(idx, "error tool", "conv_id", 3, 2)
    for g, (gv, docs) in zip(sec["groups"], want):
        assert g["groupValue"] == gv
        assert [d["doc_id"] for d in g["doclist"]["docs"]] == [d for d, _ in docs]
        assert g["doclist"]["numFound"] >= len(docs)
        assert all(d["conv_id"] == gv for d in g["doclist"]["docs"])


def test_select_grouped_validation(corpus):
    _, idx = corpus
    with pytest.raises(ValueError, match="group.field"):
        solr_select(idx, {"q": "error", "group": "true"})
    with pytest.raises(ValueError, match="scored"):
        solr_select(idx, {"q": "*:*", "group": "true", "group.field": "conv_id"})


def test_group_sort_within_group(corpus):
    """group.sort orders (and selects) docs WITHIN each group by the field,
    while group ordering stays each group's best score -- Solr's split.
    Verified brute-force from the full match set."""
    _, idx = corpus
    q, field, k, lim = "error tool", "conv_id", 4, 2
    rows = idx.search_grouped(
        q, field, k=k, group_limit=lim, group_sort=[("turn_idx", "asc")]
    ).collect()
    # brute force: full scored match set joined to (conv_id, turn_idx)
    full = {
        int(r["doc_id"]): float(r["score"])
        for r in idx.score_matches(q).collect()
    }
    meta = {
        int(r["doc_id"]): (r[field], int(r["turn_idx"]))
        for r in idx.docs().select("doc_id", field, "turn_idx").collect()
    }
    by_group: dict = {}
    for d, s in full.items():
        by_group.setdefault(meta[d][0], []).append((d, s))
    # group order: best (round6 score, -doc_id) per group
    order = sorted(
        by_group,
        key=lambda g: max(
            (round(s, 6), -d) for d, s in by_group[g]
        ),
        reverse=True,
    )[:k]
    want = []
    for gr, gv in enumerate(order, start=1):
        members = sorted(by_group[gv], key=lambda ds: (meta[ds[0]][1], ds[0]))
        for rig, (d, s) in enumerate(members[:lim], start=1):
            want.append((gv, gr, rig, d))
    got = [
        (r["group_value"], int(r["group_rank"]),
         int(r["rank_in_group"]), int(r["doc_id"]))
        for r in rows
    ]
    assert got == want


def test_group_sort_through_facade(corpus):
    """/select group.sort: within-group docs come back field-ordered."""
    _, idx = corpus
    resp = solr_select(idx, {
        "q": "error tool", "group": "true", "group.field": "conv_id",
        "rows": 3, "group.limit": 3, "group.sort": "turn_idx desc",
        "fl": "doc_id,turn_idx",
    })
    for g in resp["grouped"]["conv_id"]["groups"]:
        ts = [d["turn_idx"] for d in g["doclist"]["docs"]]
        assert ts == sorted(ts, reverse=True)


def test_group_format_simple_and_main(corpus):
    """group.format=simple flattens the groups into one doclist (group
    order, then rank-in-group); group.main=true makes that list the main
    response."""
    _, idx = corpus
    base = {"q": "error test", "rows": 4, "group": "true",
            "group.field": "conv_id", "group.limit": 2, "fl": "doc_id,score"}
    grouped = solr_select(idx, base)
    sec = grouped["grouped"]["conv_id"]
    want_flat = [d["doc_id"] for g in sec["groups"]
                 for d in g["doclist"]["docs"]]

    simple = solr_select(idx, {**base, "group.format": "simple"})
    ssec = simple["grouped"]["conv_id"]
    assert "groups" not in ssec
    assert ssec["doclist"]["numFound"] == sec["matches"]
    assert [d["doc_id"] for d in ssec["doclist"]["docs"]] == want_flat

    main = solr_select(idx, {**base, "group.main": "true"})
    assert "grouped" not in main
    assert main["response"]["numFound"] == sec["matches"]
    assert [d["doc_id"] for d in main["response"]["docs"]] == want_flat

    with pytest.raises(ValueError):
        solr_select(idx, {**base, "group.format": "flat"})
    with pytest.raises(ValueError):  # group.query path: grouped only
        solr_select(idx, {"q": "error", "group": "true",
                          "group.query": "turn_idx < 2",
                          "group.main": "true"})
