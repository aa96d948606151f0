"""Solr 9 {!knn} dense-vector qparser (engine.knn + /select dispatch):
brute-force numpy parity, fq pre-filter semantics, tombstone awareness,
paging within topK, and fail-loud validation."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)
DIM = 8


def _vec(i: int) -> list[float]:
    """Deterministic unit-ish vector per doc (hash-free, reproducible)."""
    return [round(math.sin(0.7 * i + 1.3 * j), 6) for j in range(DIM)]


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=6, seed=11)
    # stamp a dense vector column BEFORE indexing -- the docs table stores
    # every input column, so {!knn} reads it back like any stored field
    rows = df.collect()
    data = [(r.conv_id, r.turn_idx, _vec(i)) for i, r in enumerate(rows)]
    vecs = spark.createDataFrame(
        data,
        T.StructType([
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]),
    )
    df = df.join(vecs, ["conv_id", "turn_idx"])
    d = str(tmp_path_factory.mktemp("knn"))
    build_index(spark, df, d, BuildConfig(build_id="knn", **CFG))
    return BM25Index(spark, d)


def _brute(idx, qv, k, role=None):
    docs = idx.docs().select("doc_id", "embedding", "role").collect()
    q = np.array(qv)
    out = []
    for r in docs:
        if role is not None and r.role != role:
            continue
        v = np.array(r.embedding, dtype=np.float64)
        c = float(np.dot(v, q) / (np.linalg.norm(v) * np.linalg.norm(q)))
        out.append((round(c, 6), r.doc_id))
    out.sort(key=lambda x: (-x[0], x[1]))
    return [(d, s) for s, d in out[:k]]


QV = _vec(3)


def test_knn_matches_brute_force(corpus):
    got = [(r.doc_id, r.score) for r in corpus.knn("embedding", QV, 10).collect()]
    assert got == _brute(corpus, QV, 10)


def test_knn_fq_prefilters(corpus):
    got = [
        (r.doc_id, r.score)
        for r in corpus.knn("embedding", QV, 10, fq="role:user").collect()
    ]
    assert got == _brute(corpus, QV, 10, role="user")


def test_knn_select_response_shape_and_paging(corpus):
    resp = solr_select(corpus, {
        "q": f"{{!knn f=embedding topK=7}}{QV}",
        "fl": "doc_id,role,score", "rows": 4,
    })
    assert resp["response"]["numFound"] == 7
    docs = resp["response"]["docs"]
    assert len(docs) == 4
    want = _brute(corpus, QV, 7)
    assert [(d["doc_id"], d["score"]) for d in docs] == want[:4]
    assert set(docs[0]) == {"doc_id", "role", "score"}
    # page 2 within the topK window; paging past it yields nothing
    resp2 = solr_select(corpus, {
        "q": f"{{!knn f=embedding topK=7}}{QV}",
        "fl": "doc_id,score", "start": 4, "rows": 4,
    })
    assert [(d["doc_id"], d["score"]) for d in resp2["response"]["docs"]] == want[4:]
    resp3 = solr_select(corpus, {
        "q": f"{{!knn f=embedding topK=7}}{QV}", "start": 10, "rows": 4,
    })
    assert resp3["response"]["docs"] == []
    # score omitted unless fl requests it (main-path convention)
    assert "score" not in resp3["response"]["docs"] or True
    resp4 = solr_select(corpus, {
        "q": f"{{!knn f=embedding topK=3}}{QV}", "fl": "doc_id",
    })
    assert all("score" not in d for d in resp4["response"]["docs"])


def test_knn_excludes_tombstoned_docs(corpus, spark, tmp_path_factory):
    # fresh index (module corpus is shared) -- delete then re-query
    df = generate_transcripts(spark, n_convs=10, turns_per_conv=4, seed=13)
    rows = df.collect()
    data = [(r.conv_id, r.turn_idx, _vec(i)) for i, r in enumerate(rows)]
    vecs = spark.createDataFrame(
        data, "conv_id string, turn_idx int, embedding array<float>"
    )
    d = str(tmp_path_factory.mktemp("knn2"))
    build_index(spark, df.join(vecs, ["conv_id", "turn_idx"]), d,
                BuildConfig(build_id="knn2", **CFG))
    idx = BM25Index(spark, d)
    before = [r.doc_id for r in idx.knn("embedding", QV, 5).collect()]
    idx.delete_by_query(f"doc_id = {before[0]}")
    after = [r.doc_id for r in idx.knn("embedding", QV, 5).collect()]
    assert before[0] not in after
    assert after[:4] == before[1:5]


def test_knn_validation_fails_loud(corpus):
    with pytest.raises(ValueError, match="unknown field"):
        corpus.knn("nope", QV, 5)
    with pytest.raises(ValueError, match="expected"):
        corpus.knn("role", QV, 5)  # not a vector column
    with pytest.raises(ValueError, match="topK"):
        corpus.knn("embedding", QV, 0)
    with pytest.raises(ValueError, match="empty query vector"):
        corpus.knn("embedding", [], 5)
    with pytest.raises(ValueError, match="requires f="):
        solr_select(corpus, {"q": f"{{!knn topK=3}}{QV}"})
    with pytest.raises(ValueError, match="local params"):
        solr_select(corpus, {"q": f"{{!knn f=embedding k=3}}{QV}"})
    with pytest.raises(ValueError, match="invalid .!knn. query vector"):
        solr_select(corpus, {"q": "{!knn f=embedding}[1, oops]"})
    with pytest.raises(ValueError, match="does not support components"):
        solr_select(corpus, {
            "q": f"{{!knn f=embedding}}{QV}", "facet": "true",
            "facet.field": "role",
        })
    with pytest.raises(ValueError, match="relevance sort"):
        solr_select(corpus, {
            "q": f"{{!knn f=embedding}}{QV}", "sort": "doc_id asc",
        })
    with pytest.raises(ValueError, match="unknown fields"):
        solr_select(corpus, {
            "q": f"{{!knn f=embedding}}{QV}", "fl": "doc_id,nope",
        })


def test_hybrid_fq_knn_filters_lexical_query(corpus):
    # vector top-20 as a filter on a BM25 query: the hybrid request
    resp = solr_select(corpus, {
        "q": "error in tool",
        "fq": f"{{!knn f=embedding topK=20}}{QV}",
        "fl": "doc_id,score", "rows": 50,
    })
    knn_ids = {d for d, _ in _brute(corpus, QV, 20)}
    docs = resp["response"]["docs"]
    assert docs and all(d["doc_id"] in knn_ids for d in docs)
    # equals the engine's own search restricted to those ids
    want = corpus.search(
        "error in tool", k=50,
        fq=f"doc_id IN ({', '.join(map(str, sorted(knn_ids)))})",
        use_cache=False,
    ).collect()
    assert [(d["doc_id"], round(d["score"], 6)) for d in docs] == [
        (r.doc_id, round(r.score, 6)) for r in want
    ]
    # composes with other filters (list form) + facet over the hybrid set
    resp2 = solr_select(corpus, {
        "q": "error in tool",
        "fq": [f"{{!knn f=embedding topK=20}}{QV}", "role:user"],
        "rows": 50, "facet": "true", "facet.field": "role",
    })
    for d in resp2["response"]["docs"]:
        assert d["doc_id"] in knn_ids and d["role"] == "user"
    ff = resp2["facet_counts"]["facet_fields"]["role"]
    assert dict(zip(ff[::2], ff[1::2])).keys() <= {"user"}
    with pytest.raises(ValueError, match="needs f="):
        solr_select(corpus, {"q": "*:*", "fq": f"{{!knn topK=3}}{QV}"})
