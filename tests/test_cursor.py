"""CursorMark deep paging (Solr CursorMarkParams semantics).

Rank-identity contract: walking a cursor page-by-page must reproduce the
one-shot top-k list EXACTLY (same doc_ids, same scores, same order) on
every scoring path — WAND zone kernels, the small-segment vector path,
conjunction (q.op=AND), exhaustive parity mode, and under fq — because the
keyset predicate is applied BEFORE each segment-local top-k. start/rows
paging is O(depth) per page; the cursor is the 10^12-turn export path.
"""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import (
    CURSOR_START,
    BM25Index,
    decode_cursor_mark,
    encode_cursor_mark,
)
from solr_semantic_importer_spark.query.select_api import (
    select_cursor_pages,
    solr_select,
)
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=60, turns_per_conv=6, seed=77)
    idx_dir = str(tmp_path_factory.mktemp("cursor"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="cursor", **CFG))
    return df, BM25Index(spark, idx_dir)


def _walk(idx, query, page, limit=10_000, **kw):
    """Collect (doc_id, score) pairs by cursor pages until exhaustion."""
    out, mark = [], CURSOR_START
    while len(out) < limit:
        rows, nxt = idx.search_cursor(query, k=page, cursor=mark, **kw)
        out.extend((r["doc_id"], round(r["score"], 6)) for r in rows)
        if nxt == mark:
            break
        mark = nxt
    return out


def _oneshot(idx, query, n, **kw):
    rows = idx.search(query, k=n, use_cache=False, **kw).collect()
    return [(r["doc_id"], round(r["score"], 6)) for r in rows]


def test_cursor_walk_equals_oneshot_or(corpus):
    _, idx = corpus
    full = _oneshot(idx, "error tool the", 10_000)
    assert len(full) > 10  # needs multiple pages to mean anything
    assert _walk(idx, "error tool the", page=3) == full


def test_cursor_page_size_one_crosses_ties(corpus):
    """k=1 pages put every tie on a page boundary; doc_id keyset must
    resolve each one."""
    _, idx = corpus
    full = _oneshot(idx, "the", 40)
    assert _walk(idx, "the", page=1, limit=40)[:40] == full


def test_cursor_zone_path(corpus):
    """Force the block-max zone kernel (exhaustive_cutoff=0): filtering
    before the local top-k must not disturb theta-skipping exactness."""
    _, idx = corpus
    full = _oneshot(idx, "error tool the", 10_000)
    idx.exhaustive_cutoff = 0
    try:
        assert _walk(idx, "error tool the", page=4) == full
    finally:
        del idx.exhaustive_cutoff


def test_cursor_with_fq_and_modes(corpus):
    _, idx = corpus
    fq = "role = 'user'"
    assert _walk(idx, "error tool", page=3, fq=fq) == _oneshot(
        idx, "error tool", 10_000, fq=fq
    )
    # conjunction kernel
    assert _walk(idx, "error tool", page=3, op="AND") == _oneshot(
        idx, "error tool", 10_000, op="AND"
    )
    # exhaustive parity path takes the SQL keyset predicate
    assert _walk(idx, "error tool", page=3, mode="exhaustive") == _oneshot(
        idx, "error tool", 10_000, mode="exhaustive"
    )


def test_cursor_exhaustion_returns_same_mark(corpus):
    _, idx = corpus
    n = len(_oneshot(idx, "error", 10_000))
    mark = CURSOR_START
    seen = 0
    for _ in range(n + 2):
        rows, nxt = idx.search_cursor("error", k=7, cursor=mark)
        if nxt == mark:
            assert not rows  # the empty page IS the stop signal
            break
        seen += len(rows)
        mark = nxt
    assert seen == n


def test_cursor_token_roundtrip():
    tok = encode_cursor_mark(3.1415929, 42)
    assert decode_cursor_mark(tok) == (3.141593, 42)  # round6 canonical key
    assert decode_cursor_mark(CURSOR_START) is None
    assert decode_cursor_mark(None) is None


def test_select_cursor_pages_scored(corpus):
    """/select facade: cursor walk == start/rows walk, doc for doc."""
    _, idx = corpus
    params = {"q": "error tool", "fl": "doc_id,score"}
    by_cursor = [
        d["doc_id"]
        for resp in select_cursor_pages(idx, params, page_size=3)
        for d in resp["response"]["docs"]
    ]
    by_offset = []
    start = 0
    while True:
        resp = solr_select(idx, {**params, "start": start, "rows": 3})
        docs = resp["response"]["docs"]
        by_offset.extend(d["doc_id"] for d in docs)
        start += 3
        if start >= resp["response"]["numFound"]:
            break
    assert by_cursor == by_offset
    # every response carried a nextCursorMark and numFound
    resp = solr_select(idx, {**params, "cursorMark": "*", "rows": 3})
    assert "nextCursorMark" in resp
    assert resp["response"]["numFound"] == len(by_offset)


def test_select_cursor_match_all_export(corpus):
    """Bulk export: q=*:* cursor pages cover every live doc exactly once,
    in doc_id order (the importer's 10^12-row crawl shape)."""
    _, idx = corpus
    got = [
        d["doc_id"]
        for resp in select_cursor_pages(
            idx, {"q": "*:*", "fq": "role:user", "fl": "doc_id"}, page_size=50
        )
        for d in resp["response"]["docs"]
    ]
    want = [
        r["doc_id"]
        for r in idx.docs().filter("role = 'user'").orderBy("doc_id").collect()
    ]
    assert got == want


def test_select_cursor_validation(corpus):
    _, idx = corpus
    with pytest.raises(ValueError, match="start=0"):
        solr_select(idx, {"q": "error", "cursorMark": "*", "start": 5})
    # ts desc is now a served field-sort cursor (test_cursor_field_sort);
    # function sorts still have no stored values for a stateless token
    with pytest.raises(ValueError, match="canonical sort"):
        solr_select(idx, {"q": "error", "cursorMark": "*",
                          "sort": "sum(turn_idx,1) desc"})
