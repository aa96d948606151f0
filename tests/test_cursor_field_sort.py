"""cursorMark under plain stored-field sorts (scored and match-all):
keyset pagination vs a collected-corpus reference with Spark/Solr null
placement (asc = nulls first, desc = nulls last), doc_id tiebreak."""

import functools

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import (
    select_cursor_pages,
    solr_select,
)
from solr_semantic_importer_spark.sources.transcripts import (
    generate_transcripts,
)

CFG = dict(segment_size=64, block_size=16, n_term_buckets=4,
           hot_df_threshold=40, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=30, turns_per_conv=5, seed=51)
    d = str(tmp_path_factory.mktemp("cfs"))
    build_index(spark, df, d, BuildConfig(build_id="cfs", **CFG))
    idx = BM25Index(spark, d)
    rows = idx.docs().collect()
    return idx, rows


def _cmp(spec):
    """Comparator matching Spark's orderBy: per-key asc nulls-first /
    desc nulls-last, then doc_id asc."""
    def cmp(a, b):
        for fld, d in spec:
            x, y = a[fld], b[fld]
            if x == y:
                continue
            if x is None:
                return -1 if d == "asc" else 1
            if y is None:
                return 1 if d == "asc" else -1
            lt = x < y
            return (-1 if lt else 1) if d == "asc" else (1 if lt else -1)
        return -1 if a["doc_id"] < b["doc_id"] else 1
    return functools.cmp_to_key(cmp)


def _walk(idx, params, page_size):
    ids, pages = [], 0
    for resp in select_cursor_pages(idx, params, page_size=page_size):
        got = [d["doc_id"] for d in resp["response"]["docs"]]
        assert len(got) <= page_size
        ids.extend(got)
        pages += 1
    return ids, pages


def test_match_all_nullable_field_cursor_asc_desc(corpus):
    idx, rows = corpus
    for sort in ("tool asc", "tool desc", "role asc, turn_idx desc"):
        spec = [tuple(p.rsplit(" ", 1)) for p in sort.split(",")]
        spec = [(f.strip(), d) for f, d in spec]
        want = [r["doc_id"] for r in sorted(rows, key=_cmp(spec))]
        ids, pages = _walk(idx, {"q": "*:*", "sort": sort,
                                 "cursorMark": "*"}, 17)
        assert ids == want and pages >= len(want) // 17


def test_scored_query_field_cursor(corpus):
    idx, rows = corpus
    match = {r["doc_id"] for r in idx.score_matches("error call").collect()}
    spec = [("dl", "desc")]
    want = [r["doc_id"] for r in sorted(
        (r for r in rows if r["doc_id"] in match), key=_cmp(spec))]
    ids, pages = _walk(idx, {"q": "error call", "sort": "dl desc",
                             "cursorMark": "*"}, 13)
    assert ids == want and pages >= 2
    # numFound is carried, exact, and stable across pages
    resp = solr_select(idx, {"q": "error call", "sort": "dl desc",
                             "cursorMark": "*", "rows": 13})
    assert resp["response"]["numFound"] == len(want)


def test_timestamp_sort_token_roundtrip(corpus):
    idx, rows = corpus
    spec = [("ts", "desc")]
    want = [r["doc_id"] for r in sorted(rows, key=_cmp(spec))]
    ids, _ = _walk(idx, {"q": "*:*", "sort": "ts desc",
                         "cursorMark": "*"}, 23)
    assert ids == want


def test_direct_page_equals_walk_page(corpus):
    idx, _ = corpus
    p1 = solr_select(idx, {"q": "*:*", "sort": "tool asc", "rows": 11,
                           "cursorMark": "*"})
    p2 = solr_select(idx, {"q": "*:*", "sort": "tool asc", "rows": 11,
                           "cursorMark": p1["nextCursorMark"]})
    walk = list(select_cursor_pages(idx, {"q": "*:*", "sort": "tool asc",
                                          "cursorMark": "*"}, page_size=11))
    assert [d["doc_id"] for d in p2["response"]["docs"]] == \
        [d["doc_id"] for d in walk[1]["response"]["docs"]]


def test_field_cursor_fail_loud(corpus):
    idx, _ = corpus
    with pytest.raises(ValueError, match="canonical sort or a plain"):
        solr_select(idx, {"q": "*:*", "sort": "sum(turn_idx,1) asc",
                          "cursorMark": "*", "rows": 5})
    with pytest.raises(ValueError, match="canonical sort or a plain"):
        solr_select(idx, {"q": "error", "sort": "score desc, dl asc",
                          "cursorMark": "*", "rows": 5})
    p1 = solr_select(idx, {"q": "*:*", "sort": "tool asc", "rows": 5,
                           "cursorMark": "*"})
    with pytest.raises(ValueError, match="created for sort"):
        solr_select(idx, {"q": "*:*", "sort": "role asc", "rows": 5,
                          "cursorMark": p1["nextCursorMark"]})
    with pytest.raises(ValueError, match="unable to parse"):
        solr_select(idx, {"q": "*:*", "sort": "tool asc", "rows": 5,
                          "cursorMark": "@@@notb64@@@"})


def test_scored_doc_id_sort_and_cursor(corpus):
    """Review fix: a scored q with sort='doc_id asc' dispatches through
    the field-sort branch (sort_spec no longer None) instead of crashing,
    and its cursor walk is a doc-id keyset."""
    idx, rows = corpus
    match = sorted(r["doc_id"]
                   for r in idx.score_matches("error call").collect())
    resp = solr_select(idx, {"q": "error call", "sort": "doc_id asc",
                             "rows": 7})
    assert [d["doc_id"] for d in resp["response"]["docs"]] == match[:7]
    ids, _ = _walk(idx, {"q": "error call", "sort": "doc_id asc",
                         "cursorMark": "*"}, 7)
    assert ids == match
