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

Approximate by construction, but the oracle entry sizes the beam to cover
the segment (full recall) and rescores in float64, so ``hnsw_topk_emb`` is
hash-exact vs the DuckDB cosine oracle; pruned-beam recall is asserted in
``tests/test_hnsw.py`` and measured in BASELINE.md.

Build throughput (VERDICT r2 item #8): insertion is vectorized -- packed 2D
level-0 adjacency gathered per beam batch, stamp-array visited/expanded
sets, one matmul per batch -- and OpenBLAS is pinned to 1 thread in-process
(Spark tasks are the parallelism; 2-thread BLAS dispatch on tiny gemv cost
~9x). Measured dim=96 M=16 efc=100: 299 -> 1,357 nodes/s single worker
(4.5x); 4,083 -> 11,607 nodes/s aggregate on local[32] x 32 segments
(2.8x, host-contended). Graph shape params unchanged.
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


_BLAS_PINNED = False


def _pin_blas_single_thread() -> None:
    """Pin OpenBLAS to one thread for this process (idempotent).

    The graph kernels issue thousands of tiny gemv calls (beam-batch x dim
    matmuls); OpenBLAS's multi-thread dispatch costs ~9x on that shape
    (measured: 93 -> 796 nodes/s at dim=96 just from pinning). Parallelism
    belongs to Spark tasks -- one graph per partition -- so in-kernel BLAS
    threads only oversubscribe the executor. Done via ctypes on the
    already-loaded openblas (env vars are too late once numpy is up)."""
    global _BLAS_PINNED
    if _BLAS_PINNED:
        return
    _BLAS_PINNED = True
    import ctypes

    try:
        with open("/proc/self/maps") as f:
            libs = {
                line.rsplit(None, 1)[-1]
                for line in f
                if "openblas" in line and ".so" in line.rsplit(None, 1)[-1]
            }
    except OSError:
        return
    for path in libs:
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            continue
        for sym in ("openblas_set_num_threads64_", "openblas_set_num_threads"):
            fn = getattr(lib, sym, None)
            if fn is not None:
                fn(1)
                break


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
        _pin_blas_single_thread()
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
        # pre-normalized float32 copy: traversal distance is one matmul
        # (1 - Vn @ q) with no per-call norm divide; the float64 top-k
        # rescore still reads the RAW buffer
        self._vn = np.empty((16, dim), dtype=np.float32)
        self._n = 0
        self.levels: list[int] = []
        # level-0 adjacency as ONE 2D array (row per node, capacity M0+1:
        # one slot of slack so append-then-prune never reallocates): a beam
        # batch gathers all its neighbor rows in a single fancy index.
        # Upper levels (a ~1/ln(M) fraction of nodes) keep per-node arrays.
        self._adj0 = np.zeros((16, 2 * M + 1), dtype=np.int64)
        self._deg0 = np.zeros(16, dtype=np.int64)
        self._hi: list[list[np.ndarray]] = []  # per node: arrays for levels 1..lvl
        self._hideg: list[list[int]] = []
        # stamp-based visited/expanded marking: x[i] == stamp means set in
        # the CURRENT beam search; bumping the stamp clears in O(1)
        self._seen = np.zeros(16, dtype=np.int64)
        self._estamp = np.zeros(16, dtype=np.int64)
        self._stamp = 0
        self.entry = -1
        self.max_level = -1

    @property
    def vecs(self) -> np.ndarray:
        return self._buf[: self._n]

    @property
    def adj(self) -> list[list[list[int]]]:
        """Adjacency as plain nested lists (serialization/introspection
        view of the packed arrays)."""
        out = []
        for n in range(self._n):
            levels = [list(map(int, self._adj0[n, : self._deg0[n]]))]
            for a, d in zip(self._hi[n], self._hideg[n]):
                levels.append(list(map(int, a[:d])))
            out.append(levels)
        return out

    def _neighbors(self, n: int, level: int) -> np.ndarray:
        if level == 0:
            return self._adj0[n, : self._deg0[n]]
        return self._hi[n][level - 1][: self._hideg[n][level - 1]]

    _BEAM_BATCH = 16  # candidates expanded per vectorized iteration (swept
    # 4/8/16/32/64 at dim=96: 770/1000/1364/1327/964 nodes/s; 16 wins)

    def _greedy_descent(self, q: np.ndarray, ep: int, level: int) -> int:
        """Upper-layer hill climb (the ef=1 search): move to the (dist,
        node)-smallest neighbor while it improves. One gather + one matmul
        per hop; deterministic ties on node index."""
        Vn = self._vn
        curd = float(1.0 - Vn[ep] @ q)
        cur = ep
        while True:
            arr = self._neighbors(cur, level)
            if not len(arr):
                return cur
            nd = 1.0 - Vn[arr] @ q
            i = int(np.lexsort((arr, nd))[0])
            if (float(nd[i]), int(arr[i])) < (curd, cur):
                curd, cur = float(nd[i]), int(arr[i])
            else:
                return cur

    def _search_layer(
        self, q: np.ndarray, entry_points: list[int], ef: int, level: int
    ) -> list[tuple[float, int]]:
        """Beam search; returns up to ef (dist, node) sorted ascending.
        Deterministic: ties broken by node index.

        Vectorized batch form (r3, the VERDICT item-8 rewrite): the result
        set lives in sorted numpy arrays; each iteration expands the
        ``_BEAM_BATCH`` closest unexpanded candidates at once -- one 2D
        fancy index over the packed level-0 adjacency, one stamp-array
        visited test, one matmul against the pre-normalized vector buffer,
        one lexsort merge (same-node duplicates land adjacent under the
        (dist, node) sort and are masked there) -- instead of per-neighbor
        python heap/insort traffic. Expanded flags are a second stamp array
        indexed by node. Candidates are only ever expanded from the current
        result set; terminates when every member has been expanded."""
        ef = max(ef, 1)
        Vn = self._vn
        self._stamp += 1
        stamp = self._stamp
        seen, estamp = self._seen, self._estamp
        adj0, deg0 = self._adj0, self._deg0
        eps = np.asarray(entry_points, dtype=np.int64)
        seen[eps] = stamp
        d0 = 1.0 - Vn[eps] @ q
        order = np.lexsort((eps, d0))[:ef]
        best_d, best_n = d0[order], eps[order]
        B = self._BEAM_BATCH
        col = np.arange(adj0.shape[1], dtype=np.int64)
        while True:
            take = np.flatnonzero(estamp[best_n] != stamp)[:B]
            if not len(take):
                break
            tn = best_n[take]
            estamp[tn] = stamp
            if level == 0:
                rows = adj0[tn]  # one (B, M0+1) gather
                allnb = rows[col[None, :] < deg0[tn][:, None]]
            else:
                parts = [self._neighbors(n, level) for n in tn.tolist()]
                allnb = np.concatenate(parts) if len(parts) > 1 else parts[0]
            if not len(allnb):
                continue
            unv = allnb[seen[allnb] != stamp]
            if not len(unv):
                continue
            seen[unv] = stamp  # in-batch duplicates survive; merge dedups
            nd = 1.0 - Vn[unv] @ q
            if len(best_n) >= ef:
                keep = nd < best_d[-1]
                if not keep.any():
                    continue
                unv, nd = unv[keep], nd[keep]
            md = np.concatenate([best_d, nd])
            mn = np.concatenate([best_n, unv])
            order = np.lexsort((mn, md))
            mn = mn[order]
            # drop duplicate nodes (identical (dist, node) sorts adjacent)
            if len(mn) > 1:
                first = np.empty(len(mn), dtype=bool)
                first[0] = True
                np.not_equal(mn[1:], mn[:-1], out=first[1:])
                order = order[first][:ef]
                mn = mn[first][:ef]
            else:
                order = order[:ef]
            best_d, best_n = md[order], mn
        return list(zip(best_d.tolist(), best_n.tolist()))

    def _select(self, cands: list[tuple[float, int]], M: int) -> list[int]:
        return [n for _, n in sorted(cands)[:M]]

    def add(self, node_id: int, vec: np.ndarray) -> None:
        v = np.asarray(vec, dtype=np.float32)
        idx = len(self.ids)
        lvl = _level_for(node_id, self.mL)
        self.ids.append(node_id)
        if self._n == len(self._buf):
            self._buf = np.vstack([self._buf, np.empty_like(self._buf)])
            self._vn = np.vstack([self._vn, np.empty_like(self._vn)])
            self._norms = np.concatenate([self._norms, np.empty_like(self._norms)])
            self._seen = np.concatenate([self._seen, np.zeros_like(self._seen)])
            self._estamp = np.concatenate([self._estamp, np.zeros_like(self._estamp)])
            self._adj0 = np.vstack([self._adj0, np.zeros_like(self._adj0)])
            self._deg0 = np.concatenate([self._deg0, np.zeros_like(self._deg0)])
        self._buf[self._n] = v
        nv = np.float32(np.linalg.norm(v))  # float32: bit-stable vs the
        self._norms[self._n] = nv           # from_bytes _vn recompute
        self._vn[self._n] = v / nv if nv > 0 else v
        self._n += 1
        self.levels.append(lvl)
        cap = self.M + 1
        self._hi.append([np.empty(cap, dtype=np.int64) for _ in range(lvl)])
        self._hideg.append([0] * lvl)
        if self.entry < 0:
            self.entry, self.max_level = idx, lvl
            return
        vq = self._vn[idx]  # normalized traversal query
        ep = [self.entry]
        # greedy descent above the node's level
        for lc in range(self.max_level, lvl, -1):
            ep = [self._greedy_descent(vq, ep[0], lc)]
        # connect at each level from min(lvl, max_level) down to 0
        for lc in range(min(lvl, self.max_level), -1, -1):
            cands = self._search_layer(vq, ep, self.ef_c, lc)
            Mmax = self.M0 if lc == 0 else self.M
            neigh = self._select(cands, self.M)
            if lc == 0:
                self._adj0[idx, : len(neigh)] = neigh
                self._deg0[idx] = len(neigh)
            else:
                a = self._hi[idx][lc - 1]
                a[: len(neigh)] = neigh
                self._hideg[idx][lc - 1] = len(neigh)
            for m in neigh:
                if lc == 0:
                    am = self._adj0[m]
                    dm = int(self._deg0[m])
                else:
                    am = self._hi[m][lc - 1]
                    dm = self._hideg[m][lc - 1]
                am[dm] = idx
                dm += 1
                if dm > Mmax:
                    # prune to the Mmax closest of m's neighbors
                    lst = am[:dm]
                    d = 1.0 - self._vn[lst] @ self._vn[m]
                    order = np.lexsort((lst, np.round(d, 7)))
                    am[:Mmax] = lst[order[:Mmax]]  # fancy index copies: safe
                    dm = Mmax
                if lc == 0:
                    self._deg0[m] = dm
                else:
                    self._hideg[m][lc - 1] = dm
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
            ep = [self._greedy_descent(qv, ep[0], lc)]
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
        safe = np.where(g._norms > 0, g._norms, 1.0).astype(np.float32)
        g._vn = g._buf / safe[:, None]
        g.levels = [int(x) for x in d["levels"]]
        n = max(g._n, 1)
        g._adj0 = np.zeros((n, g.M0 + 1), dtype=np.int64)
        g._deg0 = np.zeros(n, dtype=np.int64)
        g._hi, g._hideg = [], []
        cap = g.M + 1
        for i, levels in enumerate(d["adj"]):
            l0 = levels[0]
            g._adj0[i, : len(l0)] = l0
            g._deg0[i] = len(l0)
            arrs, degs = [], []
            for lst in levels[1:]:
                a = np.empty(cap, dtype=np.int64)
                a[: len(lst)] = lst
                arrs.append(a)
                degs.append(len(lst))
            g._hi.append(arrs)
            g._hideg.append(degs)
        g._seen = np.zeros(n, dtype=np.int64)
        g._estamp = np.zeros(n, dtype=np.int64)
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
