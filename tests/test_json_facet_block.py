"""json.facet blockChildren/blockParent domains under the flattened-block
adaptation (conv_id = block key, turns = children, parents virtual --
same as the {!parent}/{!child} qparsers): blockChildren expands the
domain to every live turn of the domain's blocks; blockParent collapses
to one block-head row per block."""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=6, seed=31)
    idx_dir = str(tmp_path_factory.mktemp("jfblock"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="jfb", **CFG))
    return df, BM25Index(spark, idx_dir)


def _match_rows(idx, q):
    return (
        idx.score_matches(q)
        .join(idx.docs(), "doc_id")
        .select("doc_id", "conv_id", "role")
        .collect()
    )


def test_block_children_expands_to_whole_blocks(corpus):
    _, idx = corpus
    q = "error"
    convs = {r["conv_id"] for r in _match_rows(idx, q)}
    expected = {}
    for r in idx.docs().select("conv_id", "role").collect():
        if r["conv_id"] in convs:
            expected[r["role"]] = expected.get(r["role"], 0) + 1
    resp = solr_select(idx, {
        "q": q, "rows": 0,
        "json.facet": {
            "kids": {
                "type": "terms", "field": "role", "limit": -1,
                "domain": {"blockChildren": "is_parent:true"},
            }
        },
    })
    got = {b["val"]: b["count"] for b in resp["facets"]["kids"]["buckets"]}
    assert got == expected


def test_block_parent_counts_each_block_once(corpus):
    _, idx = corpus
    q = "error"
    convs = {r["conv_id"] for r in _match_rows(idx, q)}
    # head turn = lowest doc_id per block
    heads = {}
    for r in idx.docs().select("doc_id", "conv_id", "role").collect():
        cur = heads.get(r["conv_id"])
        if cur is None or r["doc_id"] < cur[0]:
            heads[r["conv_id"]] = (r["doc_id"], r["role"])
    expected = {}
    for c in convs:
        role = heads[c][1]
        expected[role] = expected.get(role, 0) + 1
    resp = solr_select(idx, {
        "q": q, "rows": 0,
        "json.facet": {
            "parents": {
                "type": "terms", "field": "role", "limit": -1,
                "domain": {"blockParent": "is_parent:true"},
            }
        },
    })
    got = {b["val"]: b["count"]
           for b in resp["facets"]["parents"]["buckets"]}
    assert got == expected
    assert sum(got.values()) == len(convs)


def test_block_children_respects_tombstones(spark, tmp_path):
    # own index: delete_by_query mutates the handle's tombstone state
    df = generate_transcripts(spark, n_convs=12, turns_per_conv=5, seed=41)
    d = str(tmp_path / "idx")
    build_index(spark, df, d, BuildConfig(build_id="jfbt", **CFG))
    idx = BM25Index(spark, d)
    assert idx.delete_by_query("role = 'tool'") > 0
    resp = solr_select(idx, {
        "q": "error", "rows": 0,
        "json.facet": {
            "kids": {"type": "terms", "field": "role", "limit": -1,
                     "domain": {"blockChildren": "is_parent:true"}}
        },
    })
    got = {b["val"]: b["count"] for b in resp["facets"]["kids"]["buckets"]}
    assert got and "tool" not in got  # tombstoned children never counted


def test_block_domain_validation(corpus):
    _, idx = corpus
    with pytest.raises(ValueError, match="exclusive"):
        solr_select(idx, {
            "q": "error", "rows": 0,
            "json.facet": {"x": {
                "type": "terms", "field": "role",
                "domain": {"blockChildren": "a:b", "blockParent": "a:b"},
            }},
        })
    with pytest.raises(ValueError, match="exclusive"):
        solr_select(idx, {
            "q": "error", "rows": 0,
            "json.facet": {"x": {
                "type": "terms", "field": "role",
                "domain": {"blockParent": "a:b",
                           "join": {"from": "conv_id", "to": "conv_id"}},
            }},
        })
    with pytest.raises(ValueError, match="parent-filter string"):
        solr_select(idx, {
            "q": "error", "rows": 0,
            "json.facet": {"x": {
                "type": "terms", "field": "role",
                "domain": {"blockChildren": ""},
            }},
        })


def test_block_children_composes_with_filter(corpus):
    _, idx = corpus
    q = "error"
    convs = {r["conv_id"] for r in _match_rows(idx, q)}
    expected = sum(
        1 for r in idx.docs().select("conv_id", "role").collect()
        if r["conv_id"] in convs and r["role"] == "user"
    )
    resp = solr_select(idx, {
        "q": q, "rows": 0,
        "json.facet": {
            "kids": {
                "type": "query", "q": "*:*",
                "domain": {"blockChildren": "is_parent:true",
                           "filter": "role:user"},
            }
        },
    })
    assert resp["facets"]["kids"]["count"] == expected
