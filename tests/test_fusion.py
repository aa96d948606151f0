"""Reciprocal rank fusion: hand-computed values, tie determinism."""

import pytest

from solr_semantic_importer_spark.operators.fusion import ranked, rrf_fuse


def test_rrf_matches_hand_computed(spark):
    a = spark.createDataFrame(
        [(1, 10.0), (2, 9.0), (3, 8.0)], ["doc_id", "score"]
    )
    b = spark.createDataFrame(
        [(2, 0.9), (4, 0.8), (1, 0.7)], ["doc_id", "score"]
    )
    out = rrf_fuse([ranked(a, "score"), ranked(b, "score")], k=4).collect()
    got = {r["doc_id"]: r["rrf_micro"] for r in out}
    # hand-computed: 1/(60+rank) summed per doc, micro-rounded
    expect = {
        1: round((1 / 61 + 1 / 63) * 1e6),  # rank 1 in a, rank 3 in b
        2: round((1 / 62 + 1 / 61) * 1e6),  # rank 2 in a, rank 1 in b
        3: round((1 / 63) * 1e6),
        4: round((1 / 62) * 1e6),
    }
    assert got == expect
    # doc 2 beats doc 1 (1/62+1/61 > 1/61+1/63)
    assert [r["doc_id"] for r in out][:2] == [2, 1]


def test_rrf_score_ties_break_by_id(spark):
    a = spark.createDataFrame([(7, 1.0), (5, 1.0)], ["doc_id", "score"])
    # equal scores: rank ordering must fall back to doc_id asc -> 5 ranks 1
    r = {x["doc_id"]: x["rank"] for x in ranked(a, "score").collect()}
    assert r == {5: 1, 7: 2}
    out = rrf_fuse([ranked(a, "score")], k=2).collect()
    assert [x["doc_id"] for x in out] == [5, 7]


def test_rrf_requires_input():
    with pytest.raises(ValueError):
        rrf_fuse([])
