"""Per-segment HNSW ANN (Q8): recall, determinism, Spark plumbing.

Reference parity target: solr.DenseVectorField with hnswMaxConnections=16 /
hnswBeamWidth=100 / cosine (default-chunk-config/managed-schema.xml:13),
which Lucene answers by searching every segment's graph and merging --
reproduced here as one graph per Spark partition + global top-k merge.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.operators.hnsw import (
    HNSWGraph,
    build_hnsw_segments,
    hnsw_topk,
)
from solr_semantic_importer_spark.operators.similarity import cosine_topk


def _random_vecs(n, d, seed=7):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, d)).astype(np.float32)


def test_graph_deterministic_and_roundtrips():
    V = _random_vecs(300, 32)
    g1, g2 = HNSWGraph(32), HNSWGraph(32)
    for i in range(len(V)):
        g1.add(i, V[i])
        g2.add(i, V[i])
    assert g1.to_bytes() == g2.to_bytes()
    rt = HNSWGraph.from_bytes(g1.to_bytes())
    assert rt.search(V[5], 5) == g1.search(V[5], 5)


def test_recall_on_isotropic_vectors():
    """ef_search=100 (the schema's beam width) on 2000 isotropic random
    vectors -- the adversarial no-cluster case -- must stay >= 0.95
    recall@10; float64 rescore makes hits score-identical to brute force."""
    N, d = 2000, 64
    V = _random_vecs(N, d)
    g = HNSWGraph(d, M=16, ef_construction=100)
    for i in range(N):
        g.add(i, V[i])
    V64 = V.astype(np.float64)
    n64 = np.linalg.norm(V64, axis=1)
    recalls = []
    for qi in range(0, N, 200):
        cos = np.round(V64 @ V64[qi] / (n64 * n64[qi]), 6)
        exact_ids = set(int(i) for i in np.lexsort((np.arange(N), -cos))[:10])
        got = g.search(V[qi], 10, ef_search=100)
        recalls.append(len(set(i for i, _ in got) & exact_ids) / 10)
        for gid, gcos in got:
            if gid in exact_ids:
                assert gcos == float(cos[gid])
    assert np.mean(recalls) >= 0.95


def test_bulk_build_deterministic_connected_and_exact_at_covered_beam():
    """The exact-kNN bulk path (empty graph): double-build byte equality,
    full reachability (covered beam == exact brute force, the oracle
    regime), and high pruned-beam recall."""
    N, d = 1500, 48
    V = _random_vecs(N, d, seed=11)
    g1, g2 = HNSWGraph(d, M=16, ef_construction=100), HNSWGraph(d, M=16, ef_construction=100)
    g1.add_batch(np.arange(N), V)
    g2.add_batch(np.arange(N), V)
    assert g1.to_bytes() == g2.to_bytes()
    V64 = V.astype(np.float64)
    n64 = np.linalg.norm(V64, axis=1)
    recalls = []
    for qi in range(0, N, 150):
        cos = np.round(V64 @ V64[qi] / (n64 * n64[qi]), 6)
        exact = [int(i) for i in np.lexsort((np.arange(N), -cos))[:10]]
        # covered beam (ef = N) must equal exact ids AND scores
        got_full = g1.search(V[qi], 10, ef_search=N)
        assert [i for i, _ in got_full] == exact
        got = g1.search(V[qi], 10, ef_search=100)
        recalls.append(len({i for i, _ in got} & set(exact)) / 10)
    assert np.mean(recalls) >= 0.95


def test_incremental_add_batch_on_nonempty_graph():
    """The batched-insertion path (non-empty graph): deterministic, every
    node searchable, covered-beam exact after the increment."""
    N, d = 900, 48
    V = _random_vecs(N, d, seed=13)
    def build():
        g = HNSWGraph(d, M=16, ef_construction=100)
        g.add_batch(np.arange(500), V[:500])       # bulk path
        g.add_batch(np.arange(500, N), V[500:])    # incremental batched path
        return g
    g1, g2 = build(), build()
    assert g1.to_bytes() == g2.to_bytes()
    assert g1._n == N and len(g1.ids) == N
    V64 = V.astype(np.float64)
    n64 = np.linalg.norm(V64, axis=1)
    for qi in (3, 600, 899):
        cos = np.round(V64 @ V64[qi] / (n64 * n64[qi]), 6)
        exact = [int(i) for i in np.lexsort((np.arange(N), -cos))[:10]]
        got = g1.search(V[qi], 10, ef_search=N)
        assert [i for i, _ in got] == exact  # late nodes fully reachable


def test_zero_norm_vectors_do_not_crash():
    g = HNSWGraph(8)
    g.add(0, np.zeros(8, dtype=np.float32))
    g.add(1, np.ones(8, dtype=np.float32))
    out = g.search(np.ones(8, dtype=np.float32), 2)
    assert out[0][0] == 1 and out[0][1] == pytest.approx(1.0)


def test_spark_segments_match_exact_topk(spark):
    """8 graphs over sf0.01 embeddings; merged per-segment top-ks equal the
    exact cosine top-k (ids AND 1e-6-rounded scores)."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    graphs = build_hnsw_segments(emb, n_segments=8).cache()
    assert graphs.count() == 8
    assert (
        graphs.agg(F.sum("n_vectors")).collect()[0][0] == emb.count()
    )  # every vector in exactly one graph
    for qid in (0, 7):
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == qid).collect()[0]["embedding"]
        ]
        approx = [
            (r["vec_id"], round(r["cosine"], 6))
            for r in hnsw_topk(graphs, qv, k=10).collect()
        ]
        exact = [
            (r["vec_id"], round(r["cosine"], 6))
            for r in cosine_topk(emb, qv, k=10).collect()
        ]
        assert approx == exact
    graphs.unpersist()


def test_persisted_hnsw_index_roundtrip(spark, tmp_path_factory):
    from solr_semantic_importer_spark.operators.hnsw import (
        HNSWIndex,
        write_hnsw_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    path = str(tmp_path_factory.mktemp("hnsw")) + "/idx"
    write_hnsw_index(emb, path, n_segments=4)
    idx = HNSWIndex(spark, path)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 3).collect()[0]["embedding"]]
    got = [(r["vec_id"], round(r["cosine"], 6)) for r in idx.topk(qv, k=5).collect()]
    live = [
        (r["vec_id"], round(r["cosine"], 6))
        for r in hnsw_topk(build_hnsw_segments(emb, n_segments=4), qv, k=5).collect()
    ]
    assert got == live and got[0][0] == 3
