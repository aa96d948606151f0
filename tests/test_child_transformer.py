"""fl=[child] doc transformer under the flattened-block adaptation:
each page doc carries its block's OTHER live turns (turn order, capped
at limit, childFilter narrows) as _childDocuments_."""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=30, turns_per_conv=6, seed=17)
    d = str(tmp_path_factory.mktemp("childfl"))
    build_index(spark, df, d, BuildConfig(build_id="childfl", **CFG))
    idx = BM25Index(spark, d)
    by_doc = {r["doc_id"]: r.asDict()
              for r in idx.docs().select(
                  "doc_id", "conv_id", "turn_idx", "role").collect()}
    return idx, by_doc


def test_child_returns_block_siblings(corpus):
    idx, by_doc = corpus
    resp = solr_select(idx, {"q": "error", "rows": 4,
                             "fl": "doc_id,score,[child]"})
    assert resp["response"]["docs"]
    for d in resp["response"]["docs"]:
        me = by_doc[d["doc_id"]]
        kids = d["_childDocuments_"]
        expect = sorted(
            (v for v in by_doc.values()
             if v["conv_id"] == me["conv_id"] and v["doc_id"] != d["doc_id"]),
            key=lambda v: (v["turn_idx"], v["doc_id"]),
        )
        assert [k["doc_id"] for k in kids] == [e["doc_id"] for e in expect]
        assert len(kids) == 5  # 6-turn blocks, self excluded
        assert all("text" in k for k in kids)  # full stored child docs


def test_child_limit_and_filter(corpus):
    idx, by_doc = corpus
    resp = solr_select(idx, {
        "q": "error", "rows": 3,
        "fl": "doc_id,[child limit=2 childFilter=role:user]",
    })
    for d in resp["response"]["docs"]:
        kids = d["_childDocuments_"]
        assert len(kids) <= 2
        assert all(k["role"] == "user" for k in kids)


def test_child_excludes_tombstones(spark, tmp_path):
    df = generate_transcripts(spark, n_convs=8, turns_per_conv=5, seed=19)
    d = str(tmp_path / "idx")
    build_index(spark, df, d, BuildConfig(build_id="childts", **CFG))
    idx = BM25Index(spark, d)
    assert idx.delete_by_query("role = 'tool'") > 0
    resp = solr_select(idx, {"q": "error", "rows": 3,
                             "fl": "doc_id,[child]"})
    for doc in resp["response"]["docs"]:
        assert all(k["role"] != "tool" for k in doc["_childDocuments_"])


def test_child_validation(corpus):
    idx, _ = corpus
    with pytest.raises(ValueError, match="limit=/childFilter="):
        solr_select(idx, {"q": "error", "fl": "doc_id,[child nope=1]"})
    with pytest.raises(ValueError, match="limit must be"):
        solr_select(idx, {"q": "error", "fl": "doc_id,[child limit=0]"})
