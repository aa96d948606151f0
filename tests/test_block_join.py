"""Block-join queries: Lucene ToParentBlockJoinQuery / ToChildBlockJoinQuery
via Solr's ``{!parent which=...}`` / ``{!child of=...}`` qparsers.

The corpus is a flattened block structure (conv_id = block key, turns =
children), mirroring the reference's parent-with-nested-chunk-children
shape (InlineDocumentListener.java:106-115). Verification is brute-force:
parent scores must equal the requested aggregation over the INDEPENDENT
child match set (score_matches), and child results must carry exactly
their parent's block-join score."""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=6, seed=7)
    idx_dir = str(tmp_path_factory.mktemp("bj"))
    build_index(spark, df, idx_dir, BuildConfig(
        build_id="bj", segment_size=64, block_size=16, n_term_buckets=4))
    return df, BM25Index(spark, idx_dir)


def _child_scores(idx, q, **kw):
    """Independent child match set joined to its block key."""
    rows = (
        idx.score_matches(q, **kw)
        .join(idx.docs().select("doc_id", "conv_id"), "doc_id")
        .collect()
    )
    by_parent: dict[str, list[float]] = {}
    for r in rows:
        by_parent.setdefault(r["conv_id"], []).append(float(r["score"]))
    return by_parent


@pytest.mark.parametrize("mode,agg", [
    ("none", lambda ss: 1.0),
    ("max", max),
    ("total", sum),
    ("min", min),
    ("avg", lambda ss: sum(ss) / len(ss)),
])
def test_parent_score_modes_brute_force(corpus, mode, agg):
    _, idx = corpus
    q = "error tool"
    want = {p: agg(ss) for p, ss in _child_scores(idx, q).items()}
    got = idx.block_join_parent(q, k=10_000, score_mode=mode).collect()
    assert {r["parent_id"] for r in got} == set(want)
    for r in got:
        assert float(r["score"]) == pytest.approx(
            want[r["parent_id"]], rel=1e-9), (mode, r["parent_id"])
        assert r["n_child_hits"] == len(
            _child_scores(idx, q)[r["parent_id"]])


def test_parent_topk_ordering(corpus):
    _, idx = corpus
    full = idx.block_join_parent("error tool", k=10_000,
                                 score_mode="max").collect()
    keys = [(-round(float(r["score"]), 6), r["parent_id"]) for r in full]
    assert keys == sorted(keys)  # (round6 desc, parent_id asc) total order
    top3 = idx.block_join_parent("error tool", k=3, score_mode="max").collect()
    assert [r["parent_id"] for r in top3] == [r["parent_id"] for r in full[:3]]


def test_parent_fq_and_op_shape_child_set(corpus):
    _, idx = corpus
    base = _child_scores(idx, "error tool", fq="role = 'user'")
    got = idx.block_join_parent(
        "error tool", k=10_000, score_mode="total", fq="role = 'user'"
    ).collect()
    assert {r["parent_id"] for r in got} == set(base)
    and_set = _child_scores(idx, "error tool", op="AND")
    got_and = idx.block_join_parent("error tool", k=10_000, op="AND").collect()
    assert {r["parent_id"] for r in got_and} == set(and_set)


def test_children_carry_parent_score_in_block_order(corpus):
    df, idx = corpus
    heads = {
        r["parent_id"]: float(r["score"])
        for r in idx.block_join_parent("error tool", k=5,
                                       score_mode="max").collect()
    }
    kids = idx.block_join_children("error tool", k=5,
                                   score_mode="max").collect()
    assert {r["parent_id"] for r in kids} == set(heads)
    for r in kids:
        assert float(r["score"]) == pytest.approx(heads[r["parent_id"]])
    # every LIVE child of each head parent appears, in doc_id block order
    per_parent: dict[str, list[int]] = {}
    for r in kids:
        per_parent.setdefault(r["parent_id"], []).append(int(r["doc_id"]))
    docs = idx.docs().select("doc_id", "conv_id").collect()
    for p, ids in per_parent.items():
        want = sorted(int(d["doc_id"]) for d in docs if d["conv_id"] == p)
        assert ids == want


def test_invalid_score_mode_raises(corpus):
    _, idx = corpus
    with pytest.raises(ValueError, match="score mode"):
        idx.block_join_parent("error", score_mode="sumsq")


def test_select_facade_parent(corpus):
    _, idx = corpus
    resp = solr_select(idx, {
        "q": "{!parent which='role:parent' score=max}error tool", "rows": 4,
    })
    docs = resp["response"]["docs"]
    assert len(docs) == 4
    want = idx.block_join_parent("error tool", k=4, score_mode="max").collect()
    assert [d["parent_id"] for d in docs] == [r["parent_id"] for r in want]
    assert all(d["numChildHits"] >= 1 for d in docs)
    # numFound = ALL matching parents, not the page
    n_parents = len(_child_scores(idx, "error tool"))
    assert resp["response"]["numFound"] == n_parents


def test_select_facade_child(corpus):
    _, idx = corpus
    resp = solr_select(idx, {
        "q": "{!child of='role:parent'}error tool", "rows": 6,
        "fl": "conv_id,turn_idx,score",
    })
    docs = resp["response"]["docs"]
    assert len(docs) == 6
    assert all("conv_id" in d and "turn_idx" in d and "score" in d
               for d in docs)
    # numFound counts children of every matching parent
    by_parent = _child_scores(idx, "error tool")
    live = idx.docs().select("conv_id").collect()
    want = sum(1 for r in live if r["conv_id"] in by_parent)
    assert resp["response"]["numFound"] == want


def test_select_facade_fail_loud(corpus):
    _, idx = corpus
    with pytest.raises(ValueError, match="does not support facet"):
        solr_select(idx, {"q": "{!parent}error", "facet": "true",
                          "facet.field": "role"})
    with pytest.raises(ValueError, match="does not support sort"):
        solr_select(idx, {"q": "{!parent}error", "sort": "turn_idx asc"})
    with pytest.raises(ValueError, match="local params"):
        solr_select(idx, {"q": "{!parent tag=x}error"})
    with pytest.raises(ValueError, match="local params"):
        solr_select(idx, {"q": "{!child score=max}error"})
