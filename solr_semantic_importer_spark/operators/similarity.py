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
import pandas as pd
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


def probe_buckets(
    query_vec: list[float], n_planes: int, seed: int, n_probes: int
) -> list[int]:
    """Multi-probe LSH probe sequence (Lv et al., VLDB'07): the query's own
    bucket first, then buckets obtained by flipping plane sign bits in
    increasing total-margin order -- the planes the query is CLOSEST to are
    the likeliest to separate it from a true neighbor, so those flips are
    probed first. Deterministic, computed driver-side (tiny), shared
    verbatim with the DuckDB oracle as literal bucket ids."""
    import heapq
    import itertools

    planes = hyperplanes(len(query_vec), n_planes, seed)
    qv = np.array(query_vec, dtype=np.float64)
    dots = planes @ qv
    qbucket = int(sum((1 << j) for j in range(n_planes) if dots[j] > 0))
    if n_probes <= 1:
        return [qbucket]
    margins = np.abs(dots)
    order = np.argsort(margins, kind="stable")  # cheapest flips first
    # enumerate flip subsets in increasing sum-of-margins order via a heap
    heap: list[tuple[float, tuple[int, ...]]] = []
    seen = set()
    first = (float(margins[order[0]]), (0,))
    heapq.heappush(heap, first)
    seen.add((0,))
    out = [qbucket]
    while heap and len(out) < n_probes:
        cost, subset = heapq.heappop(heap)
        mask = 0
        for pos in subset:
            mask |= 1 << int(order[pos])
        out.append(qbucket ^ mask)
        last = subset[-1]
        if last + 1 < n_planes:
            # classic shift/expand successors keep the enumeration ordered
            shifted = subset[:-1] + (last + 1,)
            expanded = subset + (last + 1,)
            for nxt in (shifted, expanded):
                if nxt not in seen:
                    seen.add(nxt)
                    c = float(sum(margins[order[p]] for p in nxt))
                    heapq.heappush(heap, (c, nxt))
    return out


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 1,
) -> DataFrame:
    """ANN: filter to the query's LSH bucket (plus the ``n_probes - 1``
    nearest perturbed buckets, multi-probe), exact cosine re-rank inside.

    Recall rises with n_probes at ~linear candidate cost; the brute-force
    path is the correctness baseline. At scale the bucket column is a
    partition/bucketing key, so probing b buckets prunes to b file groups.
    """
    planes = hyperplanes(len(query_vec), n_planes, seed)
    buckets = probe_buckets(query_vec, n_planes, seed, n_probes)
    bucketed = embeddings.withColumn("_bucket", lsh_bucket_col(F.col(vec_col), planes))
    cands = bucketed.filter(F.col("_bucket").isin(buckets))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cands.select(
            F.col(id_col), F.round(cosine_sim(F.col(vec_col), q), 6).alias("cosine")
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer + probed exact re-rank
# ---------------------------------------------------------------------------

def ivf_train(
    emb: DataFrame,
    k: int = 16,
    iters: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic k-means coarse quantizer, Spark-native Lloyd iterations:
    init = the k ids with the smallest md5-of-id hash (seeded, data-order
    independent), then ``iters`` rounds of assign (JVM-side argmin over
    literal centroids) -> per-cluster element-wise mean (one groupBy over
    F.posexplode). Only the k x dim centroid matrix ever reaches the driver.

    This is the IVF counterpart of the LSH path: build-time the corpus is
    partitioned by nearest centroid (a partition/bucketing key at scale);
    query-time only the nprobe nearest lists are scanned.
    """
    d = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    # seeded, order-independent init: rank ids by md5(seed||id)
    init = (
        d.withColumn("h", F.md5(F.concat(F.lit(str(seed)), F.col("id").cast("string"))))
        .orderBy("h")
        .limit(k)
        .select("v")
        .collect()
    )
    centroids = np.array([r["v"] for r in init], dtype=np.float64)
    for _ in range(iters):
        assigned = d.withColumn(
            "cid", _nearest_centroid_col(F.col("v"), centroids)
        )
        rows = (
            assigned.select("cid", F.posexplode("v").alias("i", "x"))
            .groupBy("cid", "i")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = centroids.copy()
        by_cid: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cid.setdefault(r["cid"], {})[r["i"]] = r["m"]
        for cid, comp in by_cid.items():
            new[cid] = [comp[i] for i in range(len(comp))]
        # round so re-training is bit-stable across partition layouts
        centroids = np.round(new, 6)
    return centroids


def _nearest_centroid_col(v: Column, centroids: np.ndarray) -> Column:
    """argmin_c ||v - c||^2 as an Arrow-batched matrix product (a literal
    per-centroid JVM expression explodes codegen at k x dim scale); distance
    rounded to 1e-6 and np.argmin's first-index tie-break = lowest centroid
    id, so assignments are deterministic across engines and layouts."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    C = np.ascontiguousarray(centroids, dtype=np.float64)
    c_norm = (C**2).sum(axis=1)

    @pandas_udf(T.IntegerType())
    def assign(vs: pd.Series) -> pd.Series:
        V = np.array(vs.tolist(), dtype=np.float64)
        if V.ndim != 2:
            return pd.Series(np.zeros(len(vs), dtype=np.int32))
        D = np.round((V**2).sum(axis=1)[:, None] - 2.0 * V @ C.T + c_norm[None, :], 6)
        return pd.Series(np.argmin(D, axis=1).astype(np.int32))

    return assign(v)


def ivf_assign(
    emb: DataFrame, centroids: np.ndarray,
    vec_col: str = "embedding", out_col: str = "ivf_cid",
) -> DataFrame:
    """Attach the coarse-quantizer cell id (the IVF list key; at scale,
    write partitioned/bucketed by it so queries prune to nprobe lists)."""
    return emb.withColumn(
        out_col, _nearest_centroid_col(F.col(vec_col).cast("array<double>"), centroids)
    )


def ivf_topk(
    emb: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF query: rank cells by centroid distance driver-side (k x dim,
    tiny), scan the nprobe nearest lists, exact cosine re-rank inside."""
    qv = np.array(query_vec, dtype=np.float64)
    dist = np.round(((centroids - qv) ** 2).sum(axis=1), 6)
    order = np.lexsort((np.arange(len(centroids)), dist))
    probe = [int(c) for c in order[:nprobe]]
    cands = ivf_assign(emb, centroids, vec_col=vec_col).filter(
        F.col("ivf_cid").isin(probe)
    )
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
                     seed: int = 42, table: str = "embeddings",
                     n_probes: int = 1) -> str:
    """DuckDB oracle: the probe-bucket list is the SAME driver-side literal
    sequence the engine uses (probe_buckets), so multi-probe is oracle-exact."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    buckets = probe_buckets(query_vec, n_planes, seed, n_probes)
    bucket_expr = " + ".join(
        f"(CASE WHEN list_dot_product(emb, {_vec_sql(planes[j])}) > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(n_planes)
    )
    q = _vec_sql(query_vec)
    in_list = ", ".join(str(b) for b in buckets)
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM {table}),
    b AS (SELECT vec_id, emb, {bucket_expr} AS bucket FROM e)
    SELECT vec_id,
           round(list_dot_product(emb, {q}) /
                 (sqrt(list_dot_product(emb, emb)) * sqrt(list_dot_product({q}, {q}))), 6) AS cosine
    FROM b WHERE bucket IN ({in_list})
    ORDER BY cosine DESC, vec_id ASC LIMIT {k}
    """
