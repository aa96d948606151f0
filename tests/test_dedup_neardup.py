"""Banded-LSH embedding near-dup: recall, bucket caps, oracle parity."""

import logging

import numpy as np
import pandas as pd
import pytest

from solr_semantic_importer_spark.operators.dedup import (
    embedding_neardup_pairs,
    embedding_neardup_sql,
)

DIM = 32


def _emb_df(spark, mat: np.ndarray, ids: list[int]):
    pdf = pd.DataFrame(
        {"vec_id": ids, "embedding": [row.astype(float).tolist() for row in mat]}
    )
    return spark.createDataFrame(pdf)


def test_banded_neardup_recall_on_injected_dups(spark):
    """50 injected near-duplicates at cosine ~0.9992 (orthogonal noise,
    eps=0.04): banded 4x8 LSH must recover >= 0.95 of them."""
    rng = np.random.default_rng(0)
    base = rng.standard_normal((200, DIM))
    noise = rng.standard_normal((50, DIM))
    v = base[:50]
    # exactly-orthogonal noise -> cosine is deterministically 1/sqrt(1+eps^2)
    u = noise - (np.sum(noise * v, axis=1, keepdims=True) / np.sum(v * v, axis=1, keepdims=True)) * v
    u = u / np.linalg.norm(u, axis=1, keepdims=True) * np.linalg.norm(v, axis=1, keepdims=True)
    near = v + 0.04 * u
    assert np.allclose(
        np.sum(near * v, axis=1)
        / (np.linalg.norm(near, axis=1) * np.linalg.norm(v, axis=1)),
        1 / np.sqrt(1 + 0.04**2),
    )
    mat = np.vstack([base, near])
    ids = list(range(200)) + [1000 + i for i in range(50)]
    pairs = embedding_neardup_pairs(_emb_df(spark, mat, ids), threshold=0.998)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    hits = sum((i, 1000 + i) in got for i in range(50))
    assert hits / 50 >= 0.95


def test_bucket_cap_excludes_and_logs(spark, caplog):
    """A degenerate 100-member identical cluster lands in ONE bucket per
    band; with max_bucket=10 it is excluded from candidates and logged --
    never silently truncated."""
    rng = np.random.default_rng(1)
    hot = np.tile(rng.standard_normal(DIM), (100, 1))
    others = rng.standard_normal((20, DIM))
    mat = np.vstack([hot, others])
    ids = list(range(120))
    df = _emb_df(spark, mat, ids)
    with caplog.at_level(logging.WARNING):
        capped = embedding_neardup_pairs(df, threshold=0.999, max_bucket=10).count()
    assert "oversized" in caplog.text
    assert capped == 0  # the whole cluster was capped out, in every band
    # uncapped: the cluster floods candidates quadratically (the scale
    # hazard the cap exists for)
    full = embedding_neardup_pairs(df, threshold=0.999).count()
    assert full == 100 * 99 // 2


def test_banded_matches_duckdb_oracle(spark):
    import duckdb

    rng = np.random.default_rng(7)
    base = rng.standard_normal((80, DIM))
    mat = np.vstack([base, base[:10] * 1.3])  # scaled copies: cosine 1.0
    ids = list(range(80)) + [500 + i for i in range(10)]
    df = _emb_df(spark, mat, ids)
    got = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in embedding_neardup_pairs(df, threshold=0.999).collect()
    }
    con = duckdb.connect()
    con.register("embeddings", pd.DataFrame(
        {"vec_id": ids, "embedding": [row.astype(float).tolist() for row in mat]}
    ))
    sql = embedding_neardup_sql(0.999, dim=DIM)
    want = {(a, b, c) for a, b, c in con.execute(sql).fetchall()}
    assert got == want and len(want) >= 10
