"""Near-dup clustering: candidate pairs -> connected components -> dedup.

Brute-force union-find oracle on adversarial topologies (long chains --
the pointer-doubling case -- stars, cliques, isolated pairs), then the
end-to-end keep/drop contract over the LSH pair op."""

import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.operators.dedup import (
    connected_components,
    lsh_candidate_pairs,
    minhash_signature,
    neardup_dedup,
)


def _uf(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min of component
    comp = {}
    for x in parent:
        root = find(x)
        comp.setdefault(root, []).append(x)
    out = {}
    for members in comp.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


TOPOLOGIES = [
    # 64-node chain (plain propagation needs 63 rounds, doubling ~log),
    # a star, two cliques and an isolated pair, all in ONE graph so the
    # Spark-loop cost is paid once (host-load-friendly test sizing)
    [(i, i + 1) for i in range(63)]
    + [(100, 100 + i) for i in range(1, 8)]
    + [(a, b) for a in range(200, 204) for b in range(a + 1, 204)]
    + [(300, 301)],
    # chain given in DESCENDING id order (labels must still flow to min)
    [(i + 1, i) for i in range(30)],
]


@pytest.mark.parametrize("edges", TOPOLOGIES)
def test_components_match_union_find(spark, edges):
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a long, id_b long"
    )
    got = {r["id"]: r["component"]
           for r in connected_components(pairs).collect()}
    assert got == _uf(edges)


def test_nonconvergence_fails_loud(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=1)


def test_neardup_dedup_end_to_end(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again"),
        (1, "the quick brown fox jumps over the lazy dog again today"),
        (2, "the quick brown fox jumps over the lazy dog again now"),
        (3, "completely unrelated text about spark physical plans"),
        (4, "another standalone document with its own words entirely"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = minhash_signature(docs, "doc_id", "text", n_hashes=16, k=3)
    pairs = lsh_candidate_pairs(sig, n_hashes=16, band_size=4)
    got_pairs = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got_pairs  # the near-dups must actually collide
    kept = {r["doc_id"] for r in neardup_dedup(docs, pairs).collect()}
    comp = _uf(got_pairs)
    want = ({i for i, _ in rows} - set(comp)) | {m for m in comp.values()}
    assert kept == want
    # the canonical member of the near-dup cluster is its min id
    assert 0 in kept and not {1, 2} <= kept
