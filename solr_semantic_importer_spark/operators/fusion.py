"""Hybrid-retrieval rank fusion (reciprocal rank fusion, RRF).

The reference's end state is a Solr collection holding BOTH a text field
and a DenseVectorField per chunk (default-chunk-config/managed-schema.xml),
i.e. exactly the setup hybrid lexical+vector retrieval runs on; RRF
(Cormack et al., SIGIR'09) is the standard score-free fusion Solr users
apply over a text query and a `{!knn}` query. Spark-shaped here:

- inputs are TOP-N ranked lists (small by construction -- a WAND top-k and
  an ANN top-k), so the rank window runs over <=N rows per list, never the
  corpus; everything downstream of the two retrievers is a few-row plan
- rrf_score(d) = sum over lists of 1 / (k0 + rank_d); ranks are dense
  per-list positions ordered by (score desc, id asc) so fusion is
  deterministic under score ties

At 10^12 docs the expensive parts are the retrievers (which prune --
block-max WAND, segment HNSW); fusion itself touches 2N rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ranked", "rrf_fuse"]


def ranked(df: DataFrame, score_col: str, id_col: str = "doc_id") -> DataFrame:
    """(id, rank) from a scored list: rank 1 = best, ties broken by id so
    every engine computes identical ranks. Input is a top-N list (small);
    the single-partition window is over N rows, not the corpus."""
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    return df.select(id_col, F.row_number().over(w).alias("rank"))


def rrf_fuse(
    lists: list[DataFrame],
    k: int = 10,
    k0: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fuse (id, rank) lists: top-k by sum(1/(k0+rank)) desc, id asc.
    k0=60 is the RRF constant from Cormack et al. Returns
    DataFrame(id, rrf_micro) with the score as a micro-scaled integer
    (hash-stable across engines)."""
    if not lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    u = lists[0]
    for df in lists[1:]:
        u = u.unionByName(df)
    return (
        u.groupBy(id_col)
        .agg(
            F.round(
                F.sum(1.0 / (F.lit(float(k0)) + F.col("rank"))) * 1_000_000
            )
            .cast("long")
            .alias("rrf_micro")
        )
        .orderBy(F.col("rrf_micro").desc(), F.col(id_col).asc())
        .limit(k)
    )
