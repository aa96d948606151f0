"""Per-segment HNSW ANN (Q8) -- the reference's vector search, Spark-shaped.

The reference declares ``solr.DenseVectorField`` with
``hnswMaxConnections=16 hnswBeamWidth=100 similarityFunction="cosine"``
(default-chunk-config/managed-schema.xml:13). Lucene builds ONE HNSW graph
per index segment and answers a KNN query by searching every segment's
graph and merging the per-segment top-ks -- an embarrassingly parallel
shape that maps directly onto Spark partitions:

- build: repartition the embeddings into segments; ``mapInPandas`` builds a
  deterministic HNSW graph per partition and emits it as ONE row holding
  the graph blob (Lucene's per-segment ``.vec``/``.vem`` files, relationally)
- query: ``mapInPandas`` over the graph rows searches each graph with the
  configured beam width; the global answer is the k best of the per-segment
  candidates (TakeOrderedAndProject -- no shuffle of anything but top-ks)

At 10^12 rows each partition builds its graph independently (no shuffle
beyond the initial repartition, which a bucketed/partitioned table already
provides), graph rows are a few MB each and scan-pruned by segment, and
query fan-out is one task per graph -- the same execution shape Lucene uses
across segments, lifted to a cluster.

Determinism: HNSW's only randomness is the level assignment; here a node's
level comes from a hash of its id (``md5(id) -> U(0,1)`` ->
``floor(-ln(U) * mL)``), so graphs, searches, and tests are bit-stable
across runs and partition layouts. Neighbor orderings tie-break on
(rounded distance, id).

Approximate by construction => rows-only driver check (like ivf_topk);
recall vs the exact ``similarity.cosine_topk`` oracle is asserted in
``tests/test_hnsw.py`` and measured in BASELINE.md.
"""

from __future__ import annotations

import hashlib
import math
import pickle
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "build_hnsw_segments",
    "hnsw_topk",
    "HNSWGraph",
    "write_hnsw_index",
    "HNSWIndex",
]


def _level_for(node_id: int, mL: float) -> int:
    """Deterministic HNSW level: md5(id) -> U(0,1) -> floor(-ln(U) * mL)."""
    h = int.from_bytes(hashlib.md5(str(node_id).encode()).digest()[:8], "big")
    u = (h + 1) / float(1 << 64)
    return int(-math.log(u) * mL)


class HNSWGraph:
    """A single segment's HNSW graph over unit-normalized vectors (cosine
    distance = 1 - dot). Insert/search follow Malkov & Yashunin (TPAMI'18,
    the algorithm Lucene implements): greedy descent through upper layers,
    beam search (ef) at the target layer, M-closest neighbor selection with
    degree pruning (2M at layer 0)."""

    def __init__(self, dim: int, M: int = 16, ef_construction: int = 100):
        self.dim = dim
        self.M = M
        self.M0 = 2 * M
        self.ef_c = ef_construction
        self.mL = 1.0 / math.log(M)
        self.ids: list[int] = []
        # raw float32 vectors (lossless for float[] sources) + cached norms;
        # traversal uses float32 normalized dots, the FINAL top-k cosine is
        # recomputed in float64 so scores agree bit-for-bit with the exact
        # cosine_topk path (and the DuckDB oracle) after 1e-6 rounding
        self._buf = np.empty((16, dim), dtype=np.float32)  # capacity-doubling
        self._norms = np.empty(16, dtype=np.float32)
        self._n = 0
        self.levels: list[int] = []
        # adj[node] = list of neighbor-index lists, one per level 0..level
        self.adj: list[list[list[int]]] = []
        self.entry = -1
        self.max_level = -1

    @property
    def vecs(self) -> np.ndarray:
        return self._buf[: self._n]

    # -- distance helpers (vectorized over candidate index arrays) ---------

    def _dist(self, q: np.ndarray, idxs) -> np.ndarray:
        """Cosine distance of a NORMALIZED query against nodes (norms
        cached at insert; zero-norm nodes get distance 1)."""
        n = self._norms[idxs]
        return 1.0 - (self.vecs[idxs] @ q) / np.where(n > 0, n, 1.0)

    def _search_layer(
        self, q: np.ndarray, entry_points: list[int], ef: int, level: int
    ) -> list[tuple[float, int]]:
        """Best-first beam search; returns up to ef (dist, node) sorted
        ascending. Deterministic: ties broken by node index."""
        import heapq
        from bisect import insort

        ef = max(ef, 1)
        visited = set(entry_points)
        dists = self._dist(q, entry_points)
        cand = [(float(d), n) for d, n in zip(dists, entry_points)]
        heapq.heapify(cand)
        # result set kept SORTED ascending; insort is an O(ef) C memmove per
        # accepted neighbor (beats a per-insert re-sort and, at ef~100,
        # python-level heap ops)
        best = sorted(cand)[:ef]
        worst = best[-1][0]
        while cand:
            d, n = heapq.heappop(cand)
            if d > worst and len(best) >= ef:
                break
            neigh = [
                m for m in self.adj[n][level] if m not in visited
            ]
            if not neigh:
                continue
            visited.update(neigh)
            nd = self._dist(q, neigh)
            for dm, m in zip(nd, neigh):
                dm = float(dm)
                if len(best) < ef or dm < worst:
                    heapq.heappush(cand, (dm, m))
                    insort(best, (dm, m))
                    if len(best) > ef:
                        best.pop()
                    worst = best[-1][0]
        return best

    def _select(self, cands: list[tuple[float, int]], M: int) -> list[int]:
        return [n for _, n in sorted(cands)[:M]]

    def add(self, node_id: int, vec: np.ndarray) -> None:
        v = np.asarray(vec, dtype=np.float32)
        idx = len(self.ids)
        lvl = _level_for(node_id, self.mL)
        self.ids.append(node_id)
        if self._n == len(self._buf):
            self._buf = np.vstack([self._buf, np.empty_like(self._buf)])
            self._norms = np.concatenate([self._norms, np.empty_like(self._norms)])
        self._buf[self._n] = v
        self._norms[self._n] = np.linalg.norm(v)
        self._n += 1
        self.levels.append(lvl)
        self.adj.append([[] for _ in range(lvl + 1)])
        if self.entry < 0:
            self.entry, self.max_level = idx, lvl
            return
        nrm = float(self._norms[idx])
        vq = v / nrm if nrm > 0 else v  # normalized traversal query
        ep = [self.entry]
        # greedy descent above the node's level
        for lc in range(self.max_level, lvl, -1):
            ep = [self._search_layer(vq, ep, 1, lc)[0][1]]
        # connect at each level from min(lvl, max_level) down to 0
        for lc in range(min(lvl, self.max_level), -1, -1):
            cands = self._search_layer(vq, ep, self.ef_c, lc)
            Mmax = self.M0 if lc == 0 else self.M
            neigh = self._select(cands, self.M)
            self.adj[idx][lc] = list(neigh)
            for m in neigh:
                lst = self.adj[m][lc]
                lst.append(idx)
                if len(lst) > Mmax:
                    # prune to the Mmax closest of m's neighbors
                    mn = float(self._norms[m])
                    mq = self.vecs[m] / mn if mn > 0 else self.vecs[m]
                    d = self._dist(mq, lst)
                    order = np.lexsort((np.array(lst), np.round(d, 7)))
                    self.adj[m][lc] = [lst[i] for i in order[:Mmax]]
            ep = [n for _, n in cands]
        if lvl > self.max_level:
            self.entry, self.max_level = idx, lvl

    def search(self, q: np.ndarray, k: int, ef_search: int = 100):
        """Top-k (node_id, cosine) for a query vector."""
        if self.entry < 0:
            return []
        qv = np.asarray(q, dtype=np.float32)
        nrm = float(np.linalg.norm(qv))
        if nrm > 0:
            qv = qv / nrm
        ep = [self.entry]
        for lc in range(self.max_level, 0, -1):
            ep = [self._search_layer(qv, ep, 1, lc)[0][1]]
        best = self._search_layer(qv, ep, max(ef_search, k), 0)
        # float64 rescore of the beam's candidates: identical arithmetic to
        # the exact cosine_topk path (float64 over float32-origin values),
        # so at full recall the scores are bit-identical after rounding
        idxs = np.array([n for _, n in best], dtype=np.int64)
        q64 = np.asarray(q, dtype=np.float64)
        qn64 = np.linalg.norm(q64)
        V64 = self.vecs[idxs].astype(np.float64)
        n64 = np.linalg.norm(V64, axis=1)
        denom = np.where(n64 > 0, n64, 1.0) * (qn64 if qn64 > 0 else 1.0)
        cos = np.round(V64 @ q64 / denom, 6)
        ids_arr = np.array([self.ids[int(n)] for n in idxs], dtype=np.int64)
        order = np.lexsort((ids_arr, -cos))[:k]
        return [(int(ids_arr[i]), float(cos[i])) for i in order]

    # -- (de)serialization: one opaque blob per segment, Lucene-file analog --

    def to_bytes(self) -> bytes:
        return pickle.dumps(
            {
                "dim": self.dim, "M": self.M, "ef_c": self.ef_c,
                "ids": np.asarray(self.ids, dtype=np.int64),
                "vecs": np.ascontiguousarray(self.vecs),
                "norms": np.ascontiguousarray(self._norms[: self._n]),
                "levels": np.asarray(self.levels, np.int32),
                "adj": self.adj, "entry": self.entry,
                "max_level": self.max_level,
            },
            protocol=4,
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "HNSWGraph":
        d = pickle.loads(blob)
        g = cls(d["dim"], d["M"], d["ef_c"])
        g.ids = [int(x) for x in d["ids"]]
        g._buf = np.asarray(d["vecs"], dtype=np.float32)
        g._n = len(g.ids)
        g._norms = np.asarray(d["norms"], dtype=np.float32)
        g.levels = [int(x) for x in d["levels"]]
        g.adj = d["adj"]
        g.entry = d["entry"]
        g.max_level = d["max_level"]
        return g


_GRAPH_SCHEMA = T.StructType(
    [
        T.StructField("graph_id", T.LongType(), False),
        T.StructField("n_vectors", T.LongType(), False),
        T.StructField("graph", T.BinaryType(), False),
    ]
)

_TOPK_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("cosine", T.DoubleType(), False),
    ]
)


def build_hnsw_segments(
    emb: DataFrame,
    n_segments: int = 8,
    M: int = 16,
    ef_construction: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """DataFrame(graph_id, n_vectors, graph-blob): one HNSW graph per
    segment. Segment routing is ``id % n_segments`` (deterministic across
    layouts; at scale use the table's existing bucketing instead of a
    repartition). Insertion order inside a segment is sorted by id, so the
    graph bytes are reproducible run to run."""

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id")
        vecs = np.array(pdf["_vec"].tolist(), dtype=np.float32)
        g = HNSWGraph(vecs.shape[1], M=M, ef_construction=ef_construction)
        for nid, v in zip(pdf["_id"].to_numpy(np.int64), vecs):
            g.add(int(nid), v)
        return pd.DataFrame(
            {"graph_id": [int(key[0])], "n_vectors": [len(pdf)],
             "graph": [g.to_bytes()]}
        )

    keyed = emb.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).cast("array<float>").alias("_vec"),
        (F.col(id_col) % n_segments).cast("long").alias("_seg"),
    )
    return keyed.groupBy("_seg").applyInPandas(build, schema=_GRAPH_SCHEMA)


def hnsw_topk(
    graphs: DataFrame,
    query_vec: list[float],
    k: int = 10,
    ef_search: int = 100,
) -> DataFrame:
    """KNN over the segment graphs: search every graph with the configured
    beam width (hnswBeamWidth=100 default, matching the reference schema),
    merge per-segment top-ks globally. One task per graph; only k rows per
    segment cross the wire."""
    q = np.asarray(query_vec, dtype=np.float64)

    def search(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for blob in b["graph"]:
                g = HNSWGraph.from_bytes(bytes(blob))
                hits = g.search(q, k, ef_search=ef_search)
                if hits:
                    yield pd.DataFrame(
                        {"vec_id": [h[0] for h in hits],
                         "cosine": [h[1] for h in hits]}
                    )

    out = graphs.mapInPandas(search, schema=_TOPK_SCHEMA)
    return out.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()).limit(k)


def write_hnsw_index(
    emb: DataFrame,
    path: str,
    n_segments: int = 8,
    M: int = 16,
    ef_construction: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Build the segment graphs once and persist them as a parquet
    relation (graph_id, n_vectors, graph-blob) -- the Lucene ``.vec``/
    ``.vem`` per-segment files, index-lifecycle style: build once, query
    many. Graph rows are a few MB each; at scale the relation is scanned
    one-task-per-graph with no shuffle."""
    g = build_hnsw_segments(
        emb, n_segments=n_segments, M=M, ef_construction=ef_construction,
        id_col=id_col, vec_col=vec_col,
    )
    from ..index.build import INDEX_PARQUET_CODEC

    g.write.mode("overwrite").option("compression", INDEX_PARQUET_CODEC).parquet(path)


class HNSWIndex:
    """Query handle over a persisted HNSW relation (see write_hnsw_index).
    The parquet read is lazy and the DataFrame handle is cached, so each
    query is a single mapInPandas job over the graph rows."""

    def __init__(self, spark, path: str):
        # cache(): the graph blobs deserialize on executors per query; the
        # build-once-query-many lifecycle must not re-read parquet each time
        self.graphs = spark.read.parquet(path).cache()

    def topk(self, query_vec: list[float], k: int = 10, ef_search: int = 100):
        return hnsw_topk(self.graphs, query_vec, k=k, ef_search=ef_search)
