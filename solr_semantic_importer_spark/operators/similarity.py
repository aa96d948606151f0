"""Similarity search over embedding columns (array<float>).

The reference stores 384-dim dense vectors with cosine HNSW in Solr
(default-chunk-config/managed-schema.xml:13,453; created dynamically by
VectorFieldValidator.java:172-199) and queries them with {!knn}. Spark has no
vector index; the engine provides:

- brute-force cosine top-k: exact baseline, one pass, JVM-side float64 math
  (zip_with + aggregate inside whole-stage codegen).
- LSH-bucketed ANN: random-hyperplane signatures from a DETERMINISTIC
  hyperplane matrix (seeded numpy, embedded as literal arrays into the plan,
  and into the DuckDB oracle SQL) -> candidates share the query's bucket ->
  exact cosine re-rank. At scale the bucket column is a partition/bucketing
  key, so a query prunes to matching files.

All orderings use (round(sim, 6) DESC, vec_id ASC) for deterministic ranks.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_sim(a: Column, b: Column) -> Column:
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    df = embeddings
    if exclude_id is not None:
        df = df.filter(F.col(id_col) != exclude_id)
    scored = df.select(
        F.col(id_col),
        F.round(cosine_sim(F.col(vec_col), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes, shared with the oracle SQL."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6)


def lsh_bucket_col(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id: sum_j (dot(v, r_j) > 0) << j."""
    v = vec_col.cast("array<double>")
    acc = F.lit(0)
    for j, row in enumerate(planes):
        r = F.array(*[F.lit(float(x)) for x in row])
        acc = acc + F.when(_dot(v, r) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return acc.cast("int")


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: filter to the query's LSH bucket, exact cosine re-rank inside it.

    Recall < 1 by construction (probe multiple buckets / fewer planes to
    raise it); the brute-force path is the correctness baseline.
    """
    planes = hyperplanes(len(query_vec), n_planes, seed)
    qv = np.array(query_vec, dtype=np.float64)
    qbucket = int(sum((1 << j) for j in range(n_planes) if planes[j] @ qv > 0))
    bucketed = embeddings.withColumn("_bucket", lsh_bucket_col(F.col(vec_col), planes))
    cands = bucketed.filter(F.col("_bucket") == qbucket)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cands.select(
            F.col(id_col), F.round(cosine_sim(F.col(vec_col), q), 6).alias("cosine")
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _vec_sql(vec: np.ndarray | list[float]) -> str:
    return "[" + ", ".join(f"{float(x)!r}" for x in vec) + "]"


def cosine_topk_sql(query_vec: list[float], k: int, exclude_id: int | None = None,
                    table: str = "embeddings") -> str:
    """DuckDB oracle for cosine_topk (embedding column cast to double)."""
    where = f"WHERE vec_id != {exclude_id}" if exclude_id is not None else ""
    q = _vec_sql(query_vec)
    return f"""
    SELECT vec_id,
           round(list_dot_product(emb, {q}) /
                 (sqrt(list_dot_product(emb, emb)) * sqrt(list_dot_product({q}, {q}))), 6) AS cosine
    FROM (SELECT vec_id, embedding::DOUBLE[] AS emb FROM {table} {where})
    ORDER BY cosine DESC, vec_id ASC LIMIT {k}
    """


def ann_lsh_topk_sql(query_vec: list[float], k: int, n_planes: int = 8,
                     seed: int = 42, table: str = "embeddings") -> str:
    planes = hyperplanes(len(query_vec), n_planes, seed)
    qv = np.array(query_vec, dtype=np.float64)
    qbucket = int(sum((1 << j) for j in range(n_planes) if planes[j] @ qv > 0))
    bucket_expr = " + ".join(
        f"(CASE WHEN list_dot_product(emb, {_vec_sql(planes[j])}) > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(n_planes)
    )
    q = _vec_sql(query_vec)
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM {table}),
    b AS (SELECT vec_id, emb, {bucket_expr} AS bucket FROM e)
    SELECT vec_id,
           round(list_dot_product(emb, {q}) /
                 (sqrt(list_dot_product(emb, emb)) * sqrt(list_dot_product({q}, {q}))), 6) AS cosine
    FROM b WHERE bucket = {qbucket}
    ORDER BY cosine DESC, vec_id ASC LIMIT {k}
    """
