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
  predicates evaluated on the docs table; on the WAND path the allowed ids
  are COGROUPED into each segment kernel (bounded by segment_size per call)
  so zone skipping stays exact under fq; on exhaustive paths a semi-join.
  A per-index LRU filter cache (Solr's filterCache analog) persists each
  fq's minority doc-id set, so repeated fq strings never re-scan docs.
  fq strings may be Solr/Lucene filter syntax (``-id:*.csv``, ``title:*``
  -- the shapes the reference configures; translated by
  functions/solr_fq.py) or Spark SQL expressions, and a LIST of fq
  strings applies Solr's one-param-per-filter AND semantics with one
  cached DocSet per fq.
- deletes (I5): tombstones stay a DataFrame end to end -- anti-joins on
  exhaustive/match-all/phrase paths, cogrouped per-segment arrays on the
  WAND path. Nothing is collected driver-side (a `-crawl_id:X`-shaped delete
  can cover ~the whole corpus).
- paging (O1): offset/limit after the canonical sort.

All floats are float64; ordering key = (round(score, 6) DESC, doc_id ASC) so
mathematically-tied docs order identically everywhere (SURVEY section 7
"rank identity").
"""

from __future__ import annotations

import base64
import json
import math
import os
import re
from collections import OrderedDict
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import B, K1
from ..functions.analysis import QUERY_ANALYZERS, expand_query_terms
from ..functions.solr_fq import looks_like_solr_fq, parse_fq
from ..functions.codec import varint_decode

_SCORE_ROW = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

# ord()/rord() dictionary path switch: up to this many distinct values
# the rank dictionary sorts in ONE window task (the same in-heap-ords
# envelope Lucene needs per reader); above it the rank is computed
# DISTRIBUTED via range-partitioned two-pass prefix sums (see _ord_dict)
# -- where Lucene's ords-array would OOM, this engine keeps going.
ORD_MAX_DICT = 50_000_000


def _comp_rows_to_dicts(rows, bfs, bq, boost, ids: list[int]) -> list[dict]:
    """Collected ``_boosted_components`` rows -> the explain dicts
    (doc_id/score/base/bf/bq[/boost]), ordered like ``ids``."""
    nbq = len([bq] if isinstance(bq, str) else (bq or []))
    out = []
    for r in rows:
        d = {"doc_id": int(r["doc_id"]), "score": r["score"],
             "base": r["__base"],
             "bf": [r[f"__bf{i}"] for i in range(len(bfs))],
             "bq": [r[f"__bq{j}"] for j in range(nbq)]}
        if boost is not None:
            d["boost"] = r["__boost"]
        out.append(d)
    out.sort(key=lambda d: ids.index(d["doc_id"]))
    return out

# Solr CursorMark deep paging (CursorMarkParams): '*' starts a cursor, every
# response carries a nextCursorMark, and an UNCHANGED mark means the result
# set is exhausted. start=N paging re-ranks the top N+rows on every page --
# O(depth) per page, which is exactly what dies at 10^12 turns; the cursor
# is a keyset predicate on the canonical sort (round(score,6) DESC, doc_id
# ASC), so page 10^6 costs the same postings work as page 1. Solr requires
# the uniqueKey tiebreaker on cursor sorts for the same reason.
CURSOR_START = "*"


def encode_cursor_mark(score: float, doc_id: int) -> str:
    """Encode the last row's sort position as an opaque URL-safe token.
    Stateless server-side, exactly like Solr's totem: the token embeds the
    sort VALUES, not an offset, so it stays valid across index updates
    (later pages just see the index as it is now)."""
    payload = json.dumps([float(np.round(score, 6)), int(doc_id)])
    return base64.urlsafe_b64encode(payload.encode()).decode()


def decode_cursor_mark(token: str | None) -> tuple[float, int] | None:
    """'*'/None -> None (first page); otherwise (round6_score, doc_id).
    A malformed/truncated token raises a clean ValueError -- Solr's
    'unable to parse cursorMark' error, not a raw base64/json traceback."""
    if token is None or token == CURSOR_START:
        return None
    try:
        payload = json.loads(base64.urlsafe_b64decode(token.encode()).decode())
        s6, d = payload
        return float(s6), int(d)
    except (ValueError, TypeError) as e:  # binascii/json errors are ValueError
        raise ValueError(f"unable to parse cursorMark: {token!r}") from e


def sloppy_phrase_freq(plists, slop: int) -> float:
    """Lucene SloppyPhraseScorer.phraseFreq for ONE document: ``plists`` is
    one sorted array of OFFSET-ADJUSTED positions (position - phrase slot)
    per phrase slot; a phrase alignment's matchLength = max(adjusted) -
    min(adjusted), and an alignment counts when matchLength <= slop,
    contributing 1/(1+matchLength) to the sloppy frequency.

    The enumeration IS the published greedy pass (Lucene's
    SloppyPhraseScorer semantics, implemented from its documented
    behavior): keep all slots in a min-heap on adjusted position, advance
    the minimum slot; when it overtakes the next-smallest, the current
    window is as tight as it gets -- emit it if within slop, re-seed from
    the new minimum. Repeated-term phrases use the same simple pass (no
    repeat-collision reassignment), a documented deviation; distinct-term
    phrases -- the overwhelmingly common case -- follow Lucene exactly.

    Pure driver/test-visible helper; the segment kernels call it per
    candidate doc (candidates are already the conjunction of the terms'
    doc lists, so the loop runs over matched docs only, never the corpus).
    """
    import heapq

    m = len(plists)
    idxs = [0] * m
    heap = []
    end = None
    for j, pl in enumerate(plists):
        p = int(pl[0])
        end = p if end is None or p > end else end
        heapq.heappush(heap, (p, j))
    pos, j = heapq.heappop(heap)
    match_len = end - pos
    freq = 0.0
    while True:
        idxs[j] += 1
        if idxs[j] >= len(plists[j]):
            break
        p = int(plists[j][idxs[j]])
        if p > end:
            end = p
        if heap and p > heap[0][0]:
            # the advanced slot overtook the next-smallest: the window
            # ending here is final -- emit, then re-seed from the new min
            if match_len <= slop:
                freq += 1.0 / (1.0 + match_len)
            heapq.heappush(heap, (p, j))
            pos, j = heapq.heappop(heap)
            match_len = end - pos
        else:
            ml2 = end - p
            if ml2 < match_len:
                match_len = ml2
    if match_len <= slop:
        freq += 1.0 / (1.0 + match_len)
    return freq


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
        from ..plans.manifest import read_manifest_data

        self.spark = spark
        self.index_dir = index_dir
        # compaction publishes an immutable generation subdir behind a
        # manifest pointer (plans/manifest.publish_generation) -- re-root all
        # data paths on it; readers never see a half-swapped directory.
        data = read_manifest_data(index_dir) or {}
        gen = data.get("generation")
        self.data_dir = os.path.join(index_dir, gen) if gen else index_dir
        if gen:
            data = read_manifest_data(self.data_dir) or {}
        # a merge publish that crashed mid-swap leaves a live relation dir
        # missing (.old/.merge siblings present); repair before any read
        from ..index.merge import recover_interrupted_swap

        recover_interrupted_swap(self.data_dir)
        # corpus_stats may hold one row per batch (streaming/incremental
        # appends, streaming/incremental.py) -- aggregate additively.
        srow = (
            spark.read.parquet(os.path.join(self.data_dir, "corpus_stats"))
            .agg(F.sum("n_docs").alias("n"), F.sum("sum_dl").alias("s"))
            .collect()[0]
        )
        self.n_docs = int(srow["n"] or 0)
        self.sum_dl = int(srow["s"] or 0)
        self.avgdl = (float(srow["s"]) / self.n_docs) if self.n_docs else 0.0
        fin = data.get("steps", {}).get("finalize", {}).get("metrics", {})
        self._finalize_metrics = fin
        self.n_term_buckets = int(fin.get("n_term_buckets", 16))
        self.segment_size = int(fin.get("segment_size", 1 << 20))
        # query analysis MUST use the chain the index was built with
        self.analyzer_chain = fin.get("analyzer", "text_general")
        if self.analyzer_chain not in QUERY_ANALYZERS:
            raise ValueError(
                f"index was built with analysis chain '{self.analyzer_chain}', "
                "which is not registered in this process -- call "
                "functions.analysis.register_analysis_chain first"
            )
        self._analyze = QUERY_ANALYZERS[self.analyzer_chain]
        self._bucket_cache: dict[str, int] = {}
        self._df_cache: dict[str, int] | None = None
        self._filter_cache: OrderedDict[str, tuple[int, DataFrame]] = OrderedDict()
        # fieldValueCache analog (Solr's implicit cache backing grouping /
        # field faceting): group_field -> PERSISTED (segment_id, doc_id,
        # kind, gkey) map, so repeated grouped queries never re-scan the
        # docs table for the same field
        self._gmap_cache: OrderedDict[str, DataFrame] = OrderedDict()
        # queryResultCache: (terms, op, mode, fq, order_key) -> (DocList
        # rows, complete?). complete=True means the query has fewer matches
        # than the fetched window, so ANY page is answerable from the entry.
        self._result_cache: OrderedDict[tuple, tuple[list, bool]] = OrderedDict()
        # cross-core registry (the Solr container's core list): name ->
        # BM25Index, consulted by {!join fromIndex=name}. Callers register
        # handles explicitly -- there is no global state.
        self.collections: dict[str, "BM25Index"] = {}

    def warm(self, queries: list[str] | None = None) -> float:
        """Searcher warming -- the Solr firstSearcher/newSearcher listener
        analog (solrconfig.xml event listeners; ``useColdSearcher=false``
        makes the first real query wait on exactly this work). One call
        moves every first-query one-time cost into index-open:

        - file listings for the docs/dictionary/postings relations,
        - the driver-side df + bucket maps (one dictionary pass),
        - the given warming queries through the scoring kernels, which
          spawns the executor python-worker pool and warms codegen; the
          default is the index's single highest-df term, the hottest
          possible posting list (Solr configs replay representative
          production queries here).

        Returns wall seconds spent. Benchmarks report it separately: a
        cold query against a warmed searcher measures the engine, not
        process startup."""
        import time as _time

        t0 = _time.monotonic()
        # spawn the executor python-worker pool at FULL width first (one
        # Arrow no-op task per 2x task slot; spark.python.worker.reuse keeps
        # the workers). A single warming query only touches as many slots
        # as it has segments, so without this the first wide query still
        # pays worker-spawn + Arrow-init on the remaining slots.
        n = self.spark.sparkContext.defaultParallelism
        self.spark.range(0, 2 * n, 1, 2 * n).mapInPandas(
            lambda it: it, schema="id long"
        ).count()
        self.docs()
        self.dictionary()
        self._postings()
        self._dfs([])
        if queries is None:
            if self._df_cache:
                hot = max(self._df_cache, key=lambda t: (self._df_cache[t], t))
                queries = [hot]
            else:
                queries = []
        for q in queries:
            self.search(q, k=10, use_cache=False).collect()
        return _time.monotonic() - t0

    def _buckets(self, terms: list[str]) -> list[int]:
        missing = [t for t in terms if t not in self._bucket_cache]
        if missing:
            self._bucket_cache.update(
                _buckets_of(missing, self.n_term_buckets, self.spark)
            )
        return sorted({self._bucket_cache[t] for t in terms})

    # -- pieces --------------------------------------------------------------
    # DataFrame handles are cached per index: re-reading re-lists files and
    # re-infers partitioning on every call, which costs a driver round-trip
    # per query at no benefit (the underlying files are immutable between
    # manifest commits).

    def docs(self) -> DataFrame:
        if not hasattr(self, "_docs_df"):
            self._docs_df = self.spark.read.parquet(os.path.join(self.data_dir, "docs"))
        return self._docs_df

    def dictionary(self) -> DataFrame:
        if not hasattr(self, "_dict_df"):
            self._dict_df = self.spark.read.parquet(
                os.path.join(self.data_dir, "dictionary")
            )
        return self._dict_df

    def _postings(self) -> DataFrame:
        if not hasattr(self, "_post_df"):
            self._post_df = self.spark.read.parquet(
                os.path.join(self.data_dir, "postings")
            )
        return self._post_df

    def analyze_query(
        self, query: str, synonyms: bool | dict = False
    ) -> list[str]:
        """``synonyms``: False (off), True (the shipped default mapping), or
        a mapping from functions.analysis.parse_synonyms_file (user files)."""
        terms = self._analyze(query)
        if synonyms:
            terms = expand_query_terms(
                terms, synonyms if isinstance(synonyms, dict) else None
            )
        return list(dict.fromkeys(terms))

    _BOOST_RE = re.compile(r"\^(\d+(?:\.\d+)?)$")

    def parse_boosted_query(
        self, query: str, synonyms: bool | dict = False
    ) -> tuple[list[str], dict[str, float]]:
        """Lucene per-clause boost syntax: ``spark^2 window`` weights the
        ``spark`` clause 2x (Solr standard query parser ``^`` on a term).
        Each whitespace clause may carry one trailing ``^<float>``; the
        boost applies to every analyzed term the clause yields (synonym
        expansions inherit the original clause's boost, Solr behavior).
        The same term boosted twice keeps the larger boost. Returns
        (ordered unique terms, {term: boost != 1.0})."""
        terms: list[str] = []
        boosts: dict[str, float] = {}
        for clause in query.split():
            m = self._BOOST_RE.search(clause)
            b = float(m.group(1)) if m else 1.0
            text = clause[: m.start()] if m else clause
            for t in self.analyze_query(text, synonyms=synonyms):
                terms.append(t)
                boosts[t] = max(boosts.get(t, 0.0), b)
        return (
            list(dict.fromkeys(terms)),
            {t: b for t, b in boosts.items() if b != 1.0},
        )

    DICT_CACHE_MAX = 1_000_000  # load df map driver-side below this many terms

    def _dfs(self, terms: list[str]) -> dict[str, int]:
        """term -> df. Small dictionaries (known from the manifest row count)
        are loaded driver-side ONCE -- later queries cost zero jobs here. Big
        dictionaries fall back to a pruned per-query lookup (bucket partition
        pruning + term pushdown), which is the 10^12-turn path."""
        if self._df_cache is None:
            # parquet metadata count: cheap one-time job
            n_terms = self.dictionary().count()
            if 0 < n_terms <= self.DICT_CACHE_MAX:
                rows = (
                    self.dictionary()
                    .groupBy("term")
                    .agg(F.sum("df").alias("df"), F.first("bucket").alias("b"))
                    .collect()
                )
                self._df_cache = {r["term"]: int(r["df"]) for r in rows}
                # piggyback term -> bucket on the same collect: every known
                # term's bucket is now resolvable with ZERO jobs, so
                # postings/dictionary pruning never pays the per-query
                # literal-column job in _buckets_of (~1.4 s first call,
                # ~60 ms warm). OOV terms drop out before bucket lookup.
                for r in rows:
                    self._bucket_cache.setdefault(r["term"], int(r["b"]))
            else:
                self._df_cache = {}  # sentinel: too big, always query
        if self._df_cache:
            return {t: self._df_cache[t] for t in terms if t in self._df_cache}
        buckets = self._buckets(terms)
        d = (
            self.dictionary()
            .filter(F.col("bucket").isin(buckets) & F.col("term").isin(terms))
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
            .collect()
        )
        return {r["term"]: int(r["df"]) for r in d}

    def idf_map(self, terms: list[str]) -> dict[str, float]:
        if not terms:
            return {}
        n = self.n_docs
        return {
            t: math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for t, df in self._dfs(terms).items()
        }

    def postings_for(self, terms: list[str]) -> DataFrame:
        buckets = self._buckets(terms)
        return self._postings().filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )

    # -- index-backed function queries (Solr relevance ValueSources) -----------

    def _check_indexed_field(self, field: str) -> None:
        """termfreq/docfreq/... name the INDEXED field. This engine indexes
        one catch-all stream (``text``, or copy_fields concatenated into
        ``_text_`` -- Solr's copyField semantics, managed-schema.xml:298),
        so both spellings address the same postings."""
        ok = {"text", "_text_"}
        ok.update(self._finalize_metrics.get("copy_fields") or ())
        if field not in ok:
            raise ValueError(
                f"index function references unindexed field {field!r} "
                f"(indexed: {sorted(ok)})"
            )

    def index_function_value(self, fname: str, field=None, term=None) -> float:
        """Per-query CONSTANT value of an index-backed function (everything
        except per-doc termfreq). Each is a driver-side scalar from the
        dictionary/manifest -- a pruned lookup, never a corpus job. Like
        Lucene, df/ttf/N ignore tombstones until a merge rewrites segments;
        numdocs() is the one deletes-aware reader (Solr parity)."""
        if field is not None:
            self._check_indexed_field(field)
        if fname == "termfreq":
            return 0.0  # validation-only call; per-doc value comes from a join
        if fname == "docfreq":
            return float(self._dfs([term]).get(term, 0))
        if fname == "idf":
            df = self._dfs([term]).get(term, 0)
            return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))
        if fname == "totaltermfreq":
            row = (
                self.term_tf_df(term, "tf")
                .agg(F.sum("tf").alias("s"))
                .collect()[0]
            )
            return float(row["s"] or 0)
        if fname == "sumtotaltermfreq":
            return float(self.sum_dl)
        if fname == "maxdoc":
            return float(self.n_docs)
        if fname == "numdocs":
            return float(self.n_docs - self._n_tombstoned())
        raise ValueError(f"unknown index function {fname!r}")

    def _n_tombstoned(self) -> int:
        if getattr(self, "_n_dead_cache", None) is None:
            dead = self._tombstones_df()
            self._n_dead_cache = 0 if dead is None else dead.count()
        return self._n_dead_cache

    def term_tf_df(self, term: str, colname: str = "tf") -> DataFrame:
        """Per-doc raw term frequency of ONE indexed term:
        DataFrame(doc_id, <colname>). Bucket + term pushdown prune the
        postings scan to the term's rows; the decode reads only the
        doc_gaps/tfs streams (positions never leave parquet). Docs without
        the term are absent -- callers left-join and coalesce to 0."""

        def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                for row in pdf.itertuples(index=False):
                    gaps = varint_decode(row.doc_gaps, row.count)
                    docs = np.cumsum(gaps).astype(np.int64)
                    tf = varint_decode(row.tfs, row.count).astype(np.int64)
                    yield pd.DataFrame({"doc_id": docs, colname: tf})

        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField(colname, T.LongType(), False),
            ]
        )
        return (
            self.postings_for([term])
            .select("term", "count", "doc_gaps", "tfs")
            .mapInPandas(decode, schema=schema)
        )

    # -- scoring paths ---------------------------------------------------------

    def _decode_score_df(
        self, terms: list[str], idf: dict[str, float]
    ) -> DataFrame:
        """Exhaustive: decode all blocks of the query terms -> (doc_id, partial).
        Tombstones are NOT applied here -- callers anti-join the tombstone
        relation after aggregation (distributed, never driver-side)."""
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

        # column-prune BEFORE the kernel: term scoring never reads the
        # positions stream, so it must not leave the parquet scan
        cols = ["term", "count", "doc_gaps", "tfs", "dls"]
        return self.postings_for(terms).select(*cols).mapInPandas(
            decode, schema=_SCORE_ROW
        )

    @staticmethod
    def _norm_mm(mm: int | str | None, n_clauses: int) -> int | None:
        """Solr minimum-should-match: int, or 'NN%' of the query's clause
        count rounded DOWN (the mm spec's percentage rule). None/<=1 -> no
        constraint (plain OR)."""
        if mm is None:
            return None
        if isinstance(mm, str) and mm.strip().endswith("%"):
            mm = (n_clauses * int(mm.strip()[:-1])) // 100
        mm = int(mm)
        return mm if mm > 1 else None

    def search(
        self,
        query: str,
        k: int = 10,
        op: str = "OR",
        synonyms: bool | dict = False,
        fq: str | list[str] | None = None,
        offset: int = 0,
        mode: str = "wand",
        with_stored: bool = False,
        order_key: str = "round6",
        use_cache: bool = True,
        fl: list[str] | None = None,
        mm: int | str | None = None,
    ) -> DataFrame:
        """Top-k BM25. Returns DataFrame(doc_id, score[, stored fields]).

        fl: Solr field-list -- return only these stored fields (implies
        with_stored); the projection reaches the docs parquet scan as
        ReadSchema pruning, so a 2-field fl reads 2 columns at 10^12 rows.

        order_key: 'round6' (canonical: round(score,6) desc, doc_id asc) or
        'milli' (integer key round(score*1000) -- used for cross-engine
        hash-stable comparisons; same semantics, coarser ties).

        use_cache: Solr queryResultCache analog (solrconfig.xml:400-402,
        queryResultWindowSize=20, queryResultMaxDocsCached=200 in the
        reference's semantic-example config): the ordered DocList of a
        (terms, op, mode, fq, sort) key is kept in a driver-side LRU --
        bounded at QUERY_RESULT_MAX_DOCS rows per entry, exactly Solr's
        granularity -- so a repeated query or a later page of the same query
        is served without touching the postings. Invalidated by
        delete_by_query (Solr drops it on searcher reopen). Pass False to
        force scoring (benchmarks do, so latency numbers measure the
        engine, not the cache).

        mm: Solr minimum-should-match (int or 'NN%'): an OR query only
        matches docs containing >= mm of its clauses. q.op=AND is mm=all;
        mm is ignored under AND.

        Per-clause boosts: Lucene ``term^2.5`` syntax is parsed from the
        query string; boosted weights multiply idf everywhere, so WAND
        block upper bounds scale with them and skipping stays exact.

        A ``q`` that is exactly one quoted phrase (``"a b"``, ``"a b"~2``)
        routes to :meth:`search_phrase` (Lucene phrase clause semantics);
        op/mm/synonyms don't apply to a phrase clause."""
        pq = self.parse_phrase_q(query)
        if pq is not None:
            return self.search_phrase(
                pq[0], k=k, fq=fq, offset=offset, with_stored=with_stored,
                order_key=order_key, fl=fl, slop=pq[1],
            )
        cl = self.parse_boolean_q(query, op=op)
        if cl is not None:
            # occurs already carry op (parse-time promotion) -- no second
            scored = self.boolean_matches(cl, op="OR", fq=fq, mm=mm)
            return self._finish(scored, k, offset, with_stored, order_key, fl)
        terms, boosts = self.parse_boosted_query(query, synonyms=synonyms)
        mm = self._norm_mm(mm, len(terms)) if op != "AND" else None
        fq = self._norm_fq(fq)
        idf = self.idf_map(terms)
        if boosts:
            idf = {t: w * boosts.get(t, 1.0) for t, w in idf.items()}
        if fl is not None:
            with_stored = True
        empty = self.spark.createDataFrame([], _SCORE_ROW)
        # an OOV conjunct empties an AND query (Solr BooleanQuery MUST
        # clause with no postings); under OR, OOV terms contribute nothing
        # -- but they still count as unmatchable mm clauses (Lucene: mm
        # over the clause count, an OOV SHOULD clause can never match)
        if op == "AND" and any(t not in idf for t in terms):
            return self._finish(empty, k, offset, with_stored, order_key, fl)
        terms = [t for t in terms if t in idf]
        if not terms or (mm is not None and mm > len(terms)):
            return self._finish(empty, k, offset, with_stored, order_key, fl)

        need = k + offset
        ckey = (tuple(terms), tuple(sorted(boosts.items())), mm, op, mode,
                fq, order_key)
        if use_cache and need <= self.QUERY_RESULT_MAX_DOCS:
            ent = self._result_cache.get(ckey)
            if ent is not None and (ent[1] or len(ent[0]) >= need):
                self._result_cache.move_to_end(ckey)
                return self._from_doclist(
                    ent[0][offset:need], with_stored, order_key, fl
                )
            # fetch a window-rounded superset so later pages of the same
            # query are cache hits (Solr queryResultWindowSize behavior)
            w = self.QUERY_RESULT_WINDOW
            fetch = min(-(-need // w) * w, self.QUERY_RESULT_MAX_DOCS)
            scored = self._scored_frame(terms, idf, fetch, op, mode, fq, mm=mm)
            rows = self._finish(scored, fetch, 0, False, order_key).collect()
            self._result_cache[ckey] = (rows, len(rows) < fetch)
            self._result_cache.move_to_end(ckey)  # overwrite must refresh LRU
            while len(self._result_cache) > self.RESULT_CACHE_MAX:
                self._result_cache.popitem(last=False)
            return self._from_doclist(rows[offset:need], with_stored, order_key, fl)

        scored = self._scored_frame(terms, idf, need, op, mode, fq, mm=mm)
        return self._finish(scored, k, offset, with_stored, order_key, fl)

    def search_after(
        self,
        query: str,
        k: int = 10,
        cursor: str | None = CURSOR_START,
        op: str = "OR",
        synonyms: bool | dict = False,
        fq: str | list[str] | None = None,
        mode: str = "wand",
        with_stored: bool = False,
        fl: list[str] | None = None,
        mm: int | str | None = None,
    ) -> DataFrame:
        """One cursorMark page: the k rows strictly AFTER ``cursor`` under
        the canonical sort (round(score,6) DESC, doc_id ASC). Solr's
        CursorMark semantics: ``'*'`` starts the cursor; the sort is pinned
        to score + the uniqueKey tiebreaker (Solr rejects cursor sorts
        without the uniqueKey for the same total-order reason).

        Scale: ``start=N`` paging makes page depth cost O(N + k) per page
        -- the top N+k must be re-ranked every request, which at 10^12
        turns makes deep export quadratic. The cursor is a keyset
        predicate pushed INSIDE the WAND segment kernels (filter before
        each local top-k), so every page does the same bounded work as
        page 1 and only k rows ever cross the wire.

        Quoted-phrase ``q`` pages the full phrase match set with the same
        np.round keyset predicate as the exhaustive paths (the phrase
        kernel scores every match, so the cursor applies as a filter)."""
        st = self.structured_matches(query, op=op, fq=fq, mm=mm)
        if st is not None:
            after = decode_cursor_mark(cursor)
            if fl is not None:
                with_stored = True
            if after is not None:
                st = self._keyset_filter(st, after)
            return self._finish(st, k, 0, with_stored, "round6", fl)
        terms, boosts = self.parse_boosted_query(query, synonyms=synonyms)
        mm = self._norm_mm(mm, len(terms)) if op != "AND" else None
        fq = self._norm_fq(fq)
        idf = self.idf_map(terms)
        if boosts:
            idf = {t: w * boosts.get(t, 1.0) for t, w in idf.items()}
        after = decode_cursor_mark(cursor)
        if fl is not None:
            with_stored = True
        empty = self.spark.createDataFrame([], _SCORE_ROW)
        if op == "AND" and any(t not in idf for t in terms):
            return self._finish(empty, k, 0, with_stored, "round6", fl)
        terms = [t for t in terms if t in idf]
        if not terms or (mm is not None and mm > len(terms)):
            return self._finish(empty, k, 0, with_stored, "round6", fl)
        scored = self._scored_frame(terms, idf, k, op, mode, fq, after=after, mm=mm)
        if after is not None and mode != "wand":
            scored = self._keyset_filter(scored, after)
        return self._finish(scored, k, 0, with_stored, "round6", fl)

    @staticmethod
    def _keyset_filter(scored: DataFrame, after: tuple[float, int]) -> DataFrame:
        """Cursor keyset predicate for paths that score EVERY match
        (exhaustive term scoring, phrase kernels): keep rows strictly after
        (round6_score, doc_id). The WAND path is NOT re-filtered through
        this: its kernels already enforced the keyset with np.round -- the
        same half-even convention encode_cursor_mark uses -- and a SQL
        F.round (HALF_UP on the shortest decimal repr) restatement could
        disagree on a boundary score and silently drop a row the kernel
        correctly kept. One rounding convention per path."""
        from pyspark.sql.functions import pandas_udf

        a_s, a_d = after

        @pandas_udf(T.BooleanType())
        def _after_ok(score: pd.Series, doc_id: pd.Series) -> pd.Series:
            key = np.round(score.to_numpy(np.float64), 6)
            d = doc_id.to_numpy(np.int64)
            return pd.Series((key < a_s) | ((key == a_s) & (d > a_d)))

        return scored.filter(_after_ok(F.col("score"), F.col("doc_id")))

    def search_cursor(
        self, query: str, k: int = 10, cursor: str | None = CURSOR_START, **kw
    ) -> tuple[list, str]:
        """Driver-side cursor step: (page rows, nextCursorMark). Solr
        computes nextCursorMark from the page's last row; returning the
        SAME mark signals exhaustion (the client's stop condition)."""
        rows = self.search_after(query, k=k, cursor=cursor, **kw).collect()
        if not rows:
            return rows, cursor if cursor is not None else CURSOR_START
        last = rows[-1]
        return rows, encode_cursor_mark(float(last["score"]), int(last["doc_id"]))

    def search_many(
        self,
        queries: dict[str, str] | list[str],
        k: int = 10,
        op: str = "OR",
        synonyms: bool | dict = False,
        fq: str | list[str] | None = None,
        mm: int | str | None = None,
    ) -> DataFrame:
        """Batch retrieval: the whole query WORKLOAD in one pruned postings
        scan. Returns DataFrame(query_id, doc_id, score, rank) where each
        query's rows are exactly its ``search(q, k)`` top-k (rank 1..k
        under the canonical round6/doc_id sort; scores may differ from the
        single-query path in the last float bits -- summation order -- but
        never at the round-6 ordering key).

        Why it exists: one /select call per query re-scans the postings per
        request. Offline workloads (evaluation sets, hard-negative mining
        for training data, relevance regression suites) ask thousands of
        queries against the same index; at 10^12 turns the scan dominates,
        so the batch path prunes ONE scan to the union of all query terms
        and decodes each posting block ONCE per segment, sharing it across
        every query that references the term (driver-side loop over N
        spark jobs becomes 1 job). Boosts (``term^2``) and ``mm`` apply
        per query; ``fq``/tombstones are shared across the batch (one
        cogrouped minority side, same as :meth:`search`).

        Scale shape: kernel memory stays bounded by segment_size x
        union-term count; the global cut is a query_id-partitioned window
        over at most n_segments x k rows per query, never the corpus."""
        if not isinstance(queries, dict):
            queries = {q: q for q in queries}
        # phrase / mixed queries in the workload run through their own
        # scorers (the batch kernel scores terms only); their match frames
        # join the term batch before the shared per-query window cut, so
        # one job still serves the whole workload
        special = {
            qid: qs for qid, qs in queries.items()
            if self.parse_phrase_q(qs) is not None
            or self.parse_boolean_q(qs) is not None
        }
        queries = {q: s for q, s in queries.items() if q not in special}
        wmaps: dict[str, dict[str, float]] = {}
        mms: dict[str, int] = {}
        for qid, qs in queries.items():
            terms, boosts = self.parse_boosted_query(qs, synonyms=synonyms)
            q_mm = self._norm_mm(mm, len(terms)) if op != "AND" else None
            idf = self.idf_map(terms)
            if boosts:
                idf = {t: w * boosts.get(t, 1.0) for t, w in idf.items()}
            if op == "AND" and any(t not in idf for t in terms):
                continue  # unmatchable conjunction: no rows for this query
            present = {t: idf[t] for t in terms if t in idf}
            if not present or (q_mm is not None and q_mm > len(present)):
                continue
            wmaps[qid] = present
            mms[qid] = (
                len(present) if op == "AND" else (q_mm if q_mm else 1)
            )
        out_schema = T.StructType(
            [
                T.StructField("query_id", T.StringType(), False),
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("score", T.DoubleType(), False),
            ]
        )
        special_frames = []
        for qid, qs in sorted(special.items()):
            f = self.structured_matches(qs, op=op, fq=fq, mm=mm)
            special_frames.append(
                f.select(
                    F.lit(qid).alias("query_id"),
                    F.col("doc_id"), F.col("score"),
                )
            )
        if not wmaps and not special_frames:
            empty = self.spark.createDataFrame([], out_schema)
            return empty.withColumn("rank", F.lit(1))
        union_terms = sorted({t for w in wmaps.values() for t in w})
        k1, b, avgdl = K1, B, self.avgdl
        kk = max(k, 1)
        qitems = sorted(wmaps.items())  # deterministic kernel iteration
        qmms = dict(mms)

        def score_segment_multi(pdf: pd.DataFrame, side: pd.DataFrame | None):
            # absent cogroup sides arrive column-less (r5 fuzz finding;
            # see _wand_segments.cogrouped). Empty left: nothing to
            # score. Empty side keeps its semantics: an include-repr fq
            # with no rows for this segment allows NOTHING.
            if "term" not in pdf.columns or not len(pdf):
                return pd.DataFrame(
                    {"query_id": [], "doc_id": [], "score": []}
                ).astype({"query_id": "str", "doc_id": "int64",
                          "score": "float64"})
            if side is not None and "kind" not in side.columns:
                side = pd.DataFrame({
                    "doc_id": pd.Series([], dtype="int64"),
                    "kind": pd.Series([], dtype="int64"),
                })
            dead = allowed = excluded = None
            if side is not None:
                dead = np.sort(
                    side.loc[side["kind"] == 0, "doc_id"].to_numpy(np.int64)
                )
                inc = np.sort(
                    side.loc[side["kind"] == 1, "doc_id"].to_numpy(np.int64)
                )
                exc = np.sort(
                    side.loc[side["kind"] == 2, "doc_id"].to_numpy(np.int64)
                )
                allowed = inc if fq_repr == 1 else None
                excluded = exc if fq_repr == 2 else None
            # decode every block of every union term ONCE; bucket by term
            by_term: dict[str, tuple[np.ndarray, np.ndarray]] = {}
            for term, g in pdf.groupby("term", sort=False):
                pd_, ps_ = [], []
                for row in g.itertuples(index=False):
                    gaps = varint_decode(row.doc_gaps, row.count)
                    docs = np.cumsum(gaps).astype(np.int64)
                    tf = varint_decode(row.tfs, row.count).astype(np.float64)
                    dl = varint_decode(row.dls, row.count).astype(np.float64)
                    if allowed is not None or excluded is not None or (
                        dead is not None and dead.size
                    ):
                        live = (
                            np.isin(docs, allowed)
                            if allowed is not None
                            else np.ones(len(docs), dtype=bool)
                        )
                        if excluded is not None and excluded.size:
                            live &= ~np.isin(docs, excluded)
                        if dead is not None and dead.size:
                            live &= ~np.isin(docs, dead)
                        docs, tf, dl = docs[live], tf[live], dl[live]
                    denom = tf + k1 * (
                        1.0 - b + b * (dl / avgdl if avgdl else 1.0)
                    )
                    pd_.append(docs)
                    ps_.append(tf * (k1 + 1.0) / denom)
                if pd_:
                    by_term[term] = (np.concatenate(pd_), np.concatenate(ps_))
            outs = []
            for qid, wmap in qitems:
                parts_d = [by_term[t][0] for t in wmap if t in by_term]
                if not parts_d:
                    continue
                parts_s = [
                    wmap[t] * by_term[t][1] for t in wmap if t in by_term
                ]
                cat_d = np.concatenate(parts_d)
                uniq, inv = np.unique(cat_d, return_inverse=True)
                sums = np.zeros(len(uniq), dtype=np.float64)
                np.add.at(sums, inv, np.concatenate(parts_s))
                need_nt = qmms[qid]
                if need_nt > 1:
                    m = np.bincount(inv, minlength=len(uniq)) >= need_nt
                    uniq, sums = uniq[m], sums[m]
                order = np.lexsort((uniq, -np.round(sums, 6)))[:kk]
                outs.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "doc_id": uniq[order],
                            "score": sums[order],
                        }
                    )
                )
            if not outs:
                return pd.DataFrame(
                    {"query_id": [], "doc_id": [], "score": []}
                ).astype({"query_id": "str", "doc_id": "int64",
                          "score": "float64"})
            return pd.concat(outs, ignore_index=True)

        pruned = self.postings_for(union_terms).select(
            "term", "segment_id", "count", "doc_gaps", "tfs", "dls"
        )
        side, fq_repr = self._side_frame(self._norm_fq(fq))
        if side is None:
            locals_df = pruned.groupBy("segment_id").applyInPandas(
                lambda key, pdf: score_segment_multi(pdf, None),
                schema=out_schema,
            )
        else:
            locals_df = (
                pruned.groupBy("segment_id")
                .cogroup(side.groupBy("segment_id"))
                .applyInPandas(
                    lambda left, right: score_segment_multi(left, right),
                    schema=out_schema,
                )
            )
        if not wmaps:
            locals_df = self.spark.createDataFrame([], out_schema)
        for sf in special_frames:
            locals_df = locals_df.unionByName(sf)
        from pyspark.sql.window import Window

        key = F.round(F.col("score"), 6)
        w = Window.partitionBy("query_id").orderBy(
            key.desc(), F.col("doc_id").asc()
        )
        return (
            locals_df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    def _scored_frame(
        self,
        terms: list[str],
        idf: dict[str, float],
        need: int,
        op: str,
        mode: str,
        fq: str | None,
        after: tuple[float, int] | None = None,
        mm: int | None = None,
    ) -> DataFrame:
        """The (doc_id, score) relation for a parsed query: block-max WAND
        segment kernels on the fast path, exhaustive decode + aggregate on
        the parity/AND paths. ``after``: cursorMark keyset position (WAND
        kernels filter before their local top-k; exhaustive callers apply
        the equivalent SQL predicate on the returned relation). ``mm``:
        pre-normalized minimum-should-match clause count."""
        if mode == "wand":
            return self._wand_segments(
                terms, idf, need, fq, op=op, after=after, mm=mm
            )
        partials = self._decode_score_df(terms, idf)
        if op == "AND" or mm is not None:
            agg = partials.groupBy("doc_id").agg(
                F.sum("score").alias("score"), F.count("*").alias("nt")
            )
            need_nt = len(terms) if op == "AND" else mm
            cmp = F.col("nt") == need_nt if op == "AND" else F.col("nt") >= need_nt
            scored = agg.filter(cmp).drop("nt")
        else:
            scored = partials.groupBy("doc_id").agg(F.sum("score").alias("score"))
        return self._anti_dead(self._apply_fq(scored, fq))

    def _from_doclist(
        self, rows: list, with_stored: bool, order_key: str,
        fl: list[str] | None = None,
    ) -> DataFrame:
        """Rebuild a result DataFrame from a cached DocList (ordered
        (doc_id, score) rows, Solr queryResultCache granularity). The list
        is bounded by QUERY_RESULT_MAX_DOCS, so broadcasting it into the
        stored-field join is always safe."""
        df = self.spark.createDataFrame(
            [(int(r["doc_id"]), float(r["score"])) for r in rows], _SCORE_ROW
        )
        if order_key == "milli":
            key = F.round(F.col("score") * 1000).cast("long")
        else:
            key = F.round(F.col("score"), 6)
        # the canonical sort is applied even on the bare (doc_id, score)
        # path: a local relation's row order is NOT a plan guarantee -- any
        # downstream repartition would silently lose it (ADVICE r2). The
        # frame is <= QUERY_RESULT_MAX_DOCS rows, so the sort is free.
        if not with_stored:
            return df.orderBy(key.desc(), F.col("doc_id").asc())
        if with_stored:
            # the doc ids are known driver-side, so the stored-field fetch
            # pushes doc_id IN (...) into the docs parquet scan: row-group
            # min/max stats prune the read to the k hit groups instead of
            # scanning the corpus (docs are written in doc_id order). This
            # is the Solr documentCache/stored-fields access shape: fetch by
            # docid, never a table scan.
            ids = [int(r["doc_id"]) for r in rows]
            stored = self._stored_side(fl).filter(F.col("doc_id").isin(ids))
            df = stored.join(F.broadcast(df), "doc_id").select(
                "doc_id", "score", *[c for c in stored.columns if c != "doc_id"]
            ).orderBy(key.desc(), F.col("doc_id").asc())
        return df

    def _stored_side(self, fl: list[str] | None) -> DataFrame:
        """The docs relation projected to Solr's ``fl`` field list (None =
        all stored fields). The select reaches the parquet scan as
        ReadSchema pruning, so fl=["conv_id"] reads one column, not the
        row."""
        if fl is None:
            return self.docs()
        cols = [c for c in fl if c != "doc_id"]
        return self.docs().select("doc_id", *cols)

    def _finish(
        self, scored: DataFrame, k: int, offset: int, with_stored: bool,
        order_key: str = "round6", fl: list[str] | None = None,
    ) -> DataFrame:
        if order_key == "milli":
            key = F.round(F.col("score") * 1000).cast("long")
        else:
            key = F.round(F.col("score"), 6)
        out = scored.orderBy(key.desc(), F.col("doc_id").asc())
        out = out.offset(offset).limit(k) if offset else out.limit(k)
        if with_stored or fl is not None:
            out = out.join(self._stored_side(fl), "doc_id", "left").orderBy(
                key.desc(), F.col("doc_id").asc()
            )
        return out

    def terms(
        self,
        prefix: str = "",
        limit: int = 10,
        min_df: int = 1,
        sort: str = "count",
    ) -> DataFrame:
        """Solr /terms component: enumerate indexed terms with their df.
        ``sort='count'`` (df desc, Solr's default) or ``'index'`` (term
        asc). The prefix pushes into the dictionary scan as a
        StartsWith/range predicate — at a 10^12-turn vocabulary the scan
        reads only the matching row groups, and ``limit`` rows reach the
        driver."""
        d = self.dictionary()
        if prefix:
            d = d.filter(F.col("term").startswith(prefix))
        agg = d.groupBy("term").agg(F.sum("df").cast("long").alias("df"))
        if min_df > 1:
            agg = agg.filter(F.col("df") >= min_df)
        if sort == "index":
            out = agg.orderBy(F.col("term").asc())
        else:
            out = agg.orderBy(F.col("df").desc(), F.col("term").asc())
        return out.limit(limit)

    def function_expr(self, func: str, dialect: str = "spark") -> tuple[str, list[str]]:
        """Compile a Solr function-query string against this index's docs
        schema. Returns (SQL expression, fields it reads). Spark dialect
        expressions ride whole-stage codegen (``F.expr``), never Python.
        Index-backed CONSTANTS (docfreq/idf/ttf/sumtotaltermfreq/maxdoc/
        numdocs) fold to literals here, so they work in every function site
        (sort, fl, frange, json.facet); per-doc ``termfreq``/``ord``/
        ``rord`` need a join -- only bf=/boost= wires that
        (function_expr_indexed)."""
        sql, fields, tf_cols, ord_cols = self.function_expr_indexed(
            func, dialect)
        if tf_cols or ord_cols:
            raise ValueError(
                "termfreq()/ord()/rord() are per-doc (need a postings or "
                "dictionary-rank join) -- supported in bf=/boost= "
                "(search_boosted), not in this function site"
            )
        return sql, fields

    def function_expr_indexed(
        self, func: str, dialect: str = "spark"
    ) -> tuple[str, list[str], list[tuple[str, str, str]],
               list[tuple[str, str, bool]]]:
        """function_expr + per-doc termfreq/ord support: returns (sql,
        fields, tf_cols, ord_cols). Each tf_col (column, field, term) must
        be left-joined from ``term_tf_df(term, column)`` (missing -> 0);
        each ord_col (column, field, reverse) must be filled from the
        field's rank dictionary (:meth:`_ord_dict`) before evaluating the
        expression."""
        from ..functions.function_query import (
            function_to_sql,
            parse_function_query,
            resolve_index_functions,
            resolve_scale_functions,
        )

        ast = parse_function_query(func)
        ast = resolve_scale_functions(ast, self._scale_minmax)
        ast, tf_cols, ord_cols = resolve_index_functions(ast, self)
        types = dict(self.docs().dtypes)
        for _, fld, _ in ord_cols:  # fail here, not in the joins' analyzer
            if fld not in types:
                raise ValueError(f"ord/rord: unknown field {fld!r}")
        types.update({c: "bigint" for c, _, _ in tf_cols})
        types.update({c: "bigint" for c, _, _ in ord_cols})
        sql, fields = function_to_sql(ast, types, dialect)
        return sql, fields, tf_cols, ord_cols

    def _scale_minmax(self, inner_ast) -> tuple[float | None, float | None]:
        """scale()'s global (min, max) of the inner expression over ALL
        docs in the index -- deleted docs included, like Lucene's
        ScaleFloatFunction, whose createWeight iterates the whole reader
        without consulting liveDocs. One partial-agg job per DISTINCT
        inner expression per index handle (cached: repeated scale boosts
        cost zero extra jobs)."""
        from ..functions.function_query import function_to_sql

        sql, _ = function_to_sql(inner_ast, dict(self.docs().dtypes))
        if not hasattr(self, "_scale_cache"):
            self._scale_cache: dict[str, tuple] = {}
        if sql not in self._scale_cache:
            row = self.docs().agg(
                F.expr(f"min({sql})").alias("mn"),
                F.expr(f"max({sql})").alias("mx"),
            ).collect()[0]
            self._scale_cache[sql] = (
                None if row["mn"] is None else float(row["mn"]),
                None if row["mx"] is None else float(row["mx"]),
            )
        return self._scale_cache[sql]

    def _ord_dict(self, field: str) -> tuple[DataFrame, int]:
        """``ord()``/``rord()``'s rank dictionary: the field's DISTINCT
        non-null values with 1-based positions in sorted order (Lucene
        OrdFieldSource over the top-level reader -- our ords are global,
        the deterministic reading of Lucene's per-reader ordinals; deleted
        docs' values stay in the dictionary until a merge drops them, like
        the terms dict). Returns (DataFrame[field, __ord_rank], n_terms).

        Scale: the row_number window sorts the DICTIONARY, not the corpus.
        Cardinality is counted FIRST (a plain partial-agg job, no
        window); up to ``ORD_MAX_DICT`` distinct values the rank is one
        window task (the memory-resident-ords envelope Lucene itself
        needs per reader), and ABOVE it the rank goes distributed
        (:meth:`_ord_rank_distributed`): range-partition the distinct
        values, per-partition counts to the driver (<= n_partitions
        rows), broadcast exclusive prefix offsets, per-partition local
        row_number -- the packing.py two-pass prefix-sum pattern, so a
        near-unique field (doc ids, raw timestamps) ranks without ever
        funnelling into one task. Lucene OOMs on that same field; this
        engine exceeds the reference here (VERDICT r4 item 6). The
        ranked dictionary is persisted on the handle (filterCache
        discipline): repeated boosted queries and their explain jobs
        reuse one build."""
        if not hasattr(self, "_ord_cache"):
            self._ord_cache: dict[str, tuple[DataFrame, int]] = {}
        if field not in self._ord_cache:
            from pyspark.sql.window import Window

            if field not in dict(self.docs().dtypes):
                raise ValueError(f"ord/rord: unknown field {field!r}")
            vals = (
                self.docs().select(field)
                .filter(F.col(field).isNotNull())
                .distinct()
            )
            n = vals.count()
            if n > ORD_MAX_DICT:
                d = self._ord_rank_distributed(vals, field).persist()
            else:
                d = vals.withColumn(
                    "__ord_rank",
                    F.row_number().over(
                        Window.orderBy(F.col(field).asc())
                    ).cast("long"),
                ).persist()
            self._ord_cache[field] = (d, n)
        return self._ord_cache[field]

    def _ord_rank_distributed(self, vals: DataFrame, field: str) -> DataFrame:
        """Global 1-based rank over a HIGH-cardinality distinct-value set
        without a single-task sort: range-partition on the value (disjoint
        ordered ranges), pin the sampled boundaries with localCheckpoint
        (re-evaluation would re-sample them -- the packing.py/
        connected-components discipline), per-partition counts to the
        driver (one row per partition), broadcast exclusive prefix
        offsets as a literal array, and add a PER-PARTITION row_number.
        Every window task holds one range partition -- bounded by
        partition sizing, never by field cardinality."""
        from pyspark.sql.window import Window

        p = max(
            1, int(self.spark.conf.get("spark.sql.shuffle.partitions", "32"))
        )
        part = (
            vals.repartitionByRange(p, F.col(field).asc())
            .withColumn("__ord_pid", F.spark_partition_id())
            .localCheckpoint()
        )
        sizes = {
            int(r["__ord_pid"]): int(r["count"])
            for r in part.groupBy("__ord_pid").count().collect()
        }
        offs, acc = [], 0
        for pid in range(p):
            offs.append(acc)
            acc += sizes.get(pid, 0)
        off_col = F.element_at(
            F.array(*[F.lit(o) for o in offs]), F.col("__ord_pid") + 1
        )
        local = F.row_number().over(
            Window.partitionBy("__ord_pid").orderBy(F.col(field).asc())
        )
        return part.withColumn(
            "__ord_rank", (off_col + local).cast("long")
        ).drop("__ord_pid")

    def search_boosted(
        self,
        query: str,
        k: int = 10,
        bf: str | list[str] | None = None,
        boost: str | None = None,
        bq: str | list[str] | None = None,
        op: str = "OR",
        fq: str | list[str] | None = None,
        mm: int | str | None = None,
        offset: int = 0,
        with_stored: bool = False,
        order_key: str = "round6",
        fl: list[str] | None = None,
        mode: str = "wand",
    ) -> DataFrame:
        """Solr function boosting: ``bf`` (additive boost functions, edismax
        bf= -- each compiles to a function over doc fields ADDED to the
        relevance score) and ``boost`` (multiplicative, Solr's {!boost
        b=func} / edismax boost= -- BoostedQuery semantics). Combined as
        Lucene composes them: ``score * boost + sum(bf)`` (boost wraps the
        main query; bf functions are extra SHOULD clauses added after).
        ``bq`` (boost queries, repeatable): each is a full query whose
        BM25 score adds to matching docs -- ``+ sum(bq score)`` after the
        function terms (also an extra SHOULD clause in Lucene).

        A function can re-rank ANY match, so the general path scores the
        full match set exactly (Solr pays the same: boosted queries
        collect every match). For the common bf / non-negative boost
        shapes (no bq) the bound IS recoverable -- every function value
        is capped by one cached corpus-wide min/max partial-agg job -- so
        ``mode='wand'`` (default) first tries :meth:`_boosted_wand_frame`:
        lexical top-k seeds an exact boosted theta, then the WAND kernels
        collect only docs whose lexical score could still reach
        ``theta - Σmax_bf`` (threshold mode), and the bf join runs over
        that candidate set instead of the full match set -- a hot-term bf
        query stops being a linear pass (VERDICT r4 item 5; beats the
        reference, which always collects every match). Rank-identical to
        the exhaustive path by construction (see _boosted_wand_frame's
        margin analysis); ``mode='exhaustive'`` forces the full scoring.

        Plan (either path): pruned postings decode -> scored frame ->
        join the docs projection of ONLY the fields the functions read
        (ReadSchema pruning at 10^12 turns: a recip(ms(ts),..) boost
        reads one column) -> one whole-stage-codegen projection ->
        TakeOrderedAndProject. ``q=*:*`` scores 1.0 per live doc
        (MatchAllDocsQuery), so ``boost`` alone turns it into a pure
        function ranking."""
        bfs = [bf] if isinstance(bf, str) else list(bf or [])
        if not bfs and boost is None and not bq:
            return self.search(
                query, k=k, op=op, fq=fq, offset=offset, mm=mm,
                with_stored=with_stored, order_key=order_key, fl=fl,
            )
        if (mode == "wand" and (bfs or boost is not None) and not bq
                and query.strip() != "*:*"):
            pruned = self._boosted_wand_frame(
                query, bfs, k + offset, op=op, fq=fq, mm=mm, boost=boost
            )
            if pruned is not None:
                return self._finish(
                    pruned.select("doc_id", "score"),
                    k, offset, with_stored, order_key, fl,
                )
        scored = self._boosted_components(
            query, bfs, boost, bq, op=op, fq=fq, mm=mm
        ).select("doc_id", "score")
        return self._finish(scored, k, offset, with_stored, order_key, fl)

    def _bf_minmax(self, sql: str) -> tuple[float, float] | None:
        """Cached corpus-wide (min, max) of a boost function expression
        (one column-pruned partial-agg job per distinct expr per handle --
        the scale() cache discipline). Valid bounds for every match set:
        match sets are subsets of the docs table, and tombstoned docs only
        widen them. None when the corpus is empty or a bound is not
        finite (no usable bound -> caller falls back to exhaustive)."""
        if not hasattr(self, "_bfmax_cache"):
            self._bfmax_cache: dict[str, tuple[float, float] | None] = {}
        if sql not in self._bfmax_cache:
            row = self.docs().agg(
                F.min(F.expr(sql).cast("double")).alias("mn"),
                F.max(F.expr(sql).cast("double")).alias("mx"),
            ).collect()[0]
            mn, mx = row["mn"], row["mx"]
            ok = (
                mn is not None and mx is not None
                and math.isfinite(float(mn)) and math.isfinite(float(mx))
            )
            self._bfmax_cache[sql] = (float(mn), float(mx)) if ok else None
        return self._bfmax_cache[sql]

    def _boosted_wand_frame(
        self,
        query: str,
        bfs: list[str],
        need: int,
        op: str = "OR",
        fq: str | list[str] | None = None,
        mm: int | str | None = None,
        boost: str | None = None,
    ) -> DataFrame | None:
        """bf/boost-WAND pruning (VERDICT r4 item 5): the boosted
        top-``need`` without scoring the full match set, or None when the
        pruned path doesn't apply (phrase/boolean-syntax q, index-backed
        bf terms whose per-doc value has no corpus-wide max job,
        unbounded bf, a possibly-negative multiplicative boost, or a
        match set no larger than the page).

        Exactness: seed = lexical WAND top-need, boosted exactly; theta =
        the need-th boosted seed score is a LOWER bound on the true
        need-th boosted score (the true order statistic ranges over a
        superset). With B = Σ_i max_corpus(bf_i) and M =
        max_corpus(boost) (boost requires min_corpus >= 0 so base*boost
        <= base*M for the always-positive BM25 base; M := 1 without a
        boost), any doc outside the candidate set has lexical <
        (theta - B - 1e-6)/M - 1e-6, hence boosted < theta -
        1e-6*(1 + M) < theta - 1e-6 -- strictly below the true need-th
        even after round-6 tie handling (a 1e-6 gap survives rounding),
        so it can never displace the top-need. The candidate pass reuses
        the WAND zone machinery in threshold mode: zones provably under
        the threshold never decode a byte."""
        if (self.parse_phrase_q(query) is not None
                or self.parse_boolean_q(query, op=op) is not None):
            return None
        # crossover gate: the pruned path pays ~3 extra driver-visible
        # jobs (seed search + seed collect + threshold pass). Below this
        # many estimated matches the exhaustive single pass is cheaper --
        # measured on this host: q_boost warm 0.89 s exhaustive vs 1.48 s
        # pruned at a 160k-turn corpus, pruned wins from ~10^6 matches up
        # (BASELINE.md "bf-WAND crossover"). df is a dictionary lookup,
        # no jobs.
        est_terms, _ = self.parse_boosted_query(query, synonyms=False)
        dfs = self._dfs([t for t in est_terms])
        est_matches = (
            min(dfs.values(), default=0) if op == "AND"
            else sum(dfs.values())
        )
        if est_matches < self.PRUNED_BOOST_MIN_MATCHES:
            return None
        # negative-verdict cache: when a (bfs, boost, op) combo proved
        # function-DOMINATED (theta never clears Σmax_bf because the bf
        # range exceeds the boosted seed spread -- e.g. a recency boost
        # that shrinks base to noise), no query of that shape can prune;
        # remember it so only the FIRST probe pays the seed jobs
        # (measured: a failed probe costs ~6 s at 5M turns).
        nk = (tuple(bfs), boost, op)
        if not hasattr(self, "_bfwand_skip"):
            self._bfwand_skip: set = set()
        if nk in self._bfwand_skip:
            return None
        exprs = [self.function_expr_indexed(f) for f in bfs]
        boost_expr = (
            self.function_expr_indexed(boost) if boost is not None else None
        )
        if any(tfs or ords for _, _, tfs, ords in exprs):
            return None  # per-doc termfreq/ord bf: no corpus-max job shape
        if boost_expr is not None and (boost_expr[2] or boost_expr[3]):
            return None
        maxes = [self._bf_minmax(sql) for sql, _, _, _ in exprs]
        if any(m is None for m in maxes):
            return None
        bound = float(sum(mx for _, mx in maxes))
        max_boost = 1.0
        if boost_expr is not None:
            bm = self._bf_minmax(boost_expr[0])
            if bm is None or bm[0] < 0.0 or bm[1] <= 0.0:
                return None  # negative boost breaks the monotone bound
            max_boost = bm[1]
        # the seed may ride the queryResultCache: a repeated boosted query
        # (or one sharing its lexical part with a plain query) skips the
        # whole seed search
        lex = self.search(
            query, k=need, op=op, fq=fq, mm=mm, use_cache=True
        ).select("doc_id", "score")
        seed = self._boosted_components(
            query, bfs, boost, None, op=op, fq=fq, mm=mm, base_scores=lex
        )
        seed_scores = sorted(
            (float(r["score"]) for r in seed.select("score").collect()),
            reverse=True,
        )
        if len(seed_scores) < max(need, 1):
            return None  # match set fits the page: exhaustive is trivial
        tmin = (seed_scores[need - 1] - bound - 1e-6) / max_boost
        if tmin <= 1e-6:
            # bound too loose: the threshold prunes nothing -- the shape
            # is function-dominated, remember so later queries skip the
            # probe entirely
            self._bfwand_skip.add(nk)
            return None
        terms, boosts = self.parse_boosted_query(query, synonyms=False)
        mm_n = self._norm_mm(mm, len(terms)) if op != "AND" else None
        fq_n = self._norm_fq(fq)
        idf = self.idf_map(terms)
        if boosts:
            idf = {t: w * boosts.get(t, 1.0) for t, w in idf.items()}
        if op == "AND" and any(t not in idf for t in terms):
            return None
        terms = [t for t in terms if t in idf]
        if not terms or (mm_n is not None and mm_n > len(terms)):
            return None
        cand = self._wand_segments(
            terms, idf, need, fq_n, op=op, mm=mm_n, min_score=tmin
        )
        return self._boosted_components(
            query, bfs, boost, None, op=op, fq=fq, mm=mm, base_scores=cand
        )

    def _boosted_components(
        self,
        query: str,
        bfs: list[str],
        boost: str | None,
        bq: str | list[str] | None,
        op: str = "OR",
        fq: str | list[str] | None = None,
        mm: int | str | None = None,
        base_scores: DataFrame | None = None,
    ) -> DataFrame:
        """The boosted-score pipeline with every component kept as its own
        column: ``__base`` (lexical BM25 / 1.0 for ``*:*``), ``__boost``
        (multiplicative function value, when given), ``__bf0..`` (additive
        function values), ``__bq0..`` (boost-query scores, 0.0 where the bq
        misses), and ``score`` -- the total, folded from THESE columns in
        the same order Lucene composes them (``base*boost + Σbf``, then
        ``+bq`` sequentially), so the components sum to ``score``
        bit-exactly. :meth:`search_boosted` drops the components;
        :meth:`explain_boosted` reports them (debugQuery under boosts).

        ``base_scores``: override the lexical (doc_id, score) frame --
        the bf-WAND path passes its pruned candidate set (or the seed
        page) so the function joins run over candidates instead of the
        full match set."""
        if base_scores is not None:
            base = base_scores
        elif query.strip() == "*:*":
            base = self._anti_dead(
                self._apply_fq(self.docs().select("doc_id"), self._norm_fq(fq))
            ).withColumn("score", F.lit(1.0))
        else:
            base = self.score_matches(query, op=op, fq=fq, mm=mm)
        exprs = [self.function_expr_indexed(f) for f in bfs]
        boost_expr = (
            self.function_expr_indexed(boost) if boost is not None else None
        )
        all_exprs = exprs + ([boost_expr] if boost_expr else [])
        tf_cols = {
            (col, term) for _, _, tfs, _ in all_exprs for col, _, term in tfs
        }
        ord_cols = {
            (col, fld, rev)
            for _, _, _, ords in all_exprs for col, fld, rev in ords
        }
        tf_names = {col for col, _ in tf_cols}
        ord_names = {col for col, _, _ in ord_cols}
        need = sorted(
            ({c for _, fields, _, _ in exprs for c in fields}
             | set(boost_expr[1] if boost_expr else [])
             | {fld for _, fld, _ in ord_cols})  # rank joins key on the
            - {"doc_id"} - tf_names - ord_names  # doc's field value
        )   # doc_id is the join key; tf/ord cols join from postings/dict
        scored = base
        if need:
            scored = scored.join(
                self.docs().select("doc_id", *need), "doc_id"
            )
        # per-doc termfreq(): one pruned single-term postings decode per
        # distinct term, left-joined (absent -> tf 0). The joined side is
        # df(term) rows -- never the corpus.
        for col, term in sorted(tf_cols):
            scored = scored.join(
                self.term_tf_df(term, col), "doc_id", "left"
            ).withColumn(col, F.coalesce(F.col(col), F.lit(0)))
        # ord()/rord(): join the field's sorted-value rank dictionary on
        # the doc's field value (dictionary-sized side; the match set never
        # reshuffles on more than its own rows). Missing value -> 0, rord
        # = n_terms + 1 - ord (Lucene ReverseOrdFieldSource, 1-based).
        for col, fld, rev in sorted(ord_cols):
            rank_df, n_terms = self._ord_dict(fld)
            tmp = col + "__r"
            scored = scored.join(
                rank_df.withColumnRenamed("__ord_rank", tmp), fld, "left"
            )
            val = (F.lit(int(n_terms) + 1) - F.col(tmp)) if rev else F.col(tmp)
            scored = scored.withColumn(
                col, F.coalesce(val, F.lit(0)).cast("long")
            ).drop(tmp)
        scored = scored.withColumn("__base", F.col("score").cast("double"))
        comps = ["__base"]
        if boost_expr is not None:
            scored = scored.withColumn(
                "__boost", F.expr(boost_expr[0]).cast("double"))
            comps.append("__boost")
        for i, (sql, _, _, _) in enumerate(exprs):
            scored = scored.withColumn(f"__bf{i}", F.expr(sql).cast("double"))
            comps.append(f"__bf{i}")
        total = F.col("__base")
        if boost_expr is not None:
            total = total * F.col("__boost")
        for i in range(len(exprs)):
            total = total + F.col(f"__bf{i}")
        scored = scored.select(
            "doc_id", *comps, total.cast("double").alias("score")
        )
        if bq:
            # Solr bq (boost query): each bq is a full query whose score
            # ADDS to matching docs' relevance (Lucene: an extra SHOULD
            # clause -- it boosts but never matches on its own). One scored
            # match set per bq, left-joined on doc_id; a doc outside the bq
            # set gains 0.
            for j, bquery in enumerate([bq] if isinstance(bq, str) else bq):
                side = self.score_matches(
                    bquery, fq=fq
                ).withColumnRenamed("score", "__s")
                scored = (
                    scored.join(side, "doc_id", "left")
                    .withColumn(
                        f"__bq{j}", F.coalesce(F.col("__s"), F.lit(0.0)))
                    .drop("__s")
                    .withColumn(
                        "score", F.col("score") + F.col(f"__bq{j}"))
                )
                comps.append(f"__bq{j}")
        return scored.select("doc_id", *comps, "score")

    def explain_boosted(
        self,
        query: str,
        doc_ids: list[int],
        bf: str | list[str] | None = None,
        boost: str | None = None,
        bq: str | list[str] | None = None,
        op: str = "OR",
        fq: str | list[str] | None = None,
        mm: int | str | None = None,
    ) -> list[dict]:
        """debugQuery breakdown for a boosted query: per requested doc, the
        exact components of the reported score -- ``base`` (lexical BM25),
        ``boost`` (multiplicative function value, when given), ``bf``
        (additive function values, request order), ``bq`` (boost-query
        score adds, request order), and ``score`` (the total). Values come
        from the SAME Spark pipeline :meth:`search_boosted` ranks with
        (:meth:`_boosted_components`), filtered to the page's ids, so
        ``base*boost + Σbf + Σbq == score`` bit-exactly within this
        result. Note this RE-RUNS the pipeline: equality with a
        previously returned page relies on the committed index + fixed
        plan being deterministic (it is in practice, but partial-agg
        merge order is not contractually pinned) -- /select's debugQuery
        path therefore uses :meth:`search_boosted_with_components`, which
        reads page and breakdown from one persisted evaluation and is
        exact by construction.

        Cost: one boosted-scoring job cut to ``len(doc_ids)`` rows before
        collect (the filter sits above per-doc-independent projections, so
        Catalyst pushes it below the joins; only the page ships)."""
        ids = [int(i) for i in doc_ids]
        if not ids:
            return []
        bfs = [bf] if isinstance(bf, str) else list(bf or [])
        rows = (
            self._boosted_components(query, bfs, boost, bq,
                                     op=op, fq=fq, mm=mm)
            .filter(F.col("doc_id").isin(ids))
            .collect()
        )
        return _comp_rows_to_dicts(rows, bfs, bq, boost, ids)

    def search_boosted_with_components(
        self,
        query: str,
        k: int = 10,
        bf: str | list[str] | None = None,
        boost: str | None = None,
        bq: str | list[str] | None = None,
        op: str = "OR",
        fq: str | list[str] | None = None,
        mm: int | str | None = None,
        offset: int = 0,
        fl: list[str] | None = None,
    ) -> tuple[list[dict], list[dict]]:
        """:meth:`search_boosted` + the page's exact component breakdown
        from ONE evaluation: the components frame is persisted, then both
        the top-k page and the per-doc components read it -- so even if a
        RE-RUN of the distributed aggregation associated floats
        differently (partial-agg merge order is plan-stable but not
        contractually guaranteed), the breakdown the caller renders can
        never disagree with the scores it returned. /select's debugQuery
        path uses this; it also halves the work of a debug request (no
        second scoring job). Returns ``(page_rows, components)``."""
        bfs = [bf] if isinstance(bf, str) else list(bf or [])
        comp = self._boosted_components(
            query, bfs, boost, bq, op=op, fq=fq, mm=mm
        ).persist()
        try:
            df = self._finish(
                comp.select("doc_id", "score"), k, offset, True,
                "round6", fl,
            )
            rows = [r.asDict() for r in df.collect()]
            ids = [int(r["doc_id"]) for r in rows]
            crows = (
                comp.filter(F.col("doc_id").isin(ids)).collect()
                if ids else []
            )
            return rows, _comp_rows_to_dicts(crows, bfs, bq, boost, ids)
        finally:
            comp.unpersist()

    def mlt_terms(
        self,
        doc_id: int,
        max_query_terms: int = 25,
        min_tf: int = 2,
        min_df: int = 5,
    ) -> list[tuple[str, int]]:
        """The MLT "interesting terms" of ``doc_id``: the seed doc's terms
        ranked by tf×idf under Solr's MLT gates (mlt.mintf, mlt.mindf,
        mlt.maxqt). Returns [(term, seed_tf)] in rank order -- the term
        vector is re-derived by re-analyzing the stored text (the chain is
        deterministic, so this IS the term vector). One stored-text fetch
        by doc_id pushdown + one bounded dictionary lookup."""
        row = (
            self.docs()
            .filter(F.col("doc_id") == int(doc_id))
            .select("text")
            .collect()
        )
        if not row or not row[0]["text"]:
            return []
        tf_counts: dict[str, int] = {}
        for t in self._analyze(row[0]["text"]):
            tf_counts[t] = tf_counts.get(t, 0) + 1
        cands = [t for t, c in tf_counts.items() if c >= min_tf]
        dfs = self._dfs(cands)
        idf = self.idf_map([t for t in cands if dfs.get(t, 0) >= min_df])
        ranked = sorted(
            idf, key=lambda t: (-tf_counts[t] * idf[t], t)
        )[:max_query_terms]
        return [(t, tf_counts[t]) for t in ranked]

    def more_like_this(
        self,
        doc_id: int,
        k: int = 10,
        max_query_terms: int = 25,
        min_tf: int = 2,
        min_df: int = 5,
        fq: str | list[str] | None = None,
        order_key: str = "round6",
        boost: bool = True,
    ) -> DataFrame:
        """Solr MoreLikeThis: find docs similar to ``doc_id``. The seed
        doc's "interesting terms" (``mlt_terms``) are run as an OR query
        through the normal WAND top-k path (Solr builds exactly this
        BooleanQuery from the term vector). ``boost=True`` weights each
        term by the seed doc's tf (Solr mlt.boost=true); ``boost=False``
        runs the plain unweighted terms (Solr's component default). The
        seed doc itself is excluded.

        Driver cost: one stored-text fetch by doc_id pushdown + one
        bounded term ranking; the similarity query then scales like any
        other top-k search."""
        ranked = self.mlt_terms(
            doc_id, max_query_terms=max_query_terms,
            min_tf=min_tf, min_df=min_df,
        )
        if not ranked:
            return self.spark.createDataFrame([], _SCORE_ROW)
        # ask for k+1 and drop the seed (it always matches itself best)
        if boost:
            q = " ".join(f"{t}^{tf}" for t, tf in ranked)
        else:
            q = " ".join(t for t, _ in ranked)
        out = self.search(
            q, k=k + 1, fq=fq, use_cache=False, order_key=order_key
        )
        if order_key == "milli":
            key = F.round(F.col("score") * 1000).cast("long")
        else:
            key = F.round(F.col("score"), 6)
        return (
            out.filter(F.col("doc_id") != int(doc_id))
            .orderBy(key.desc(), F.col("doc_id").asc())
            .limit(k)
        )

    def stats_field(
        self,
        query: str,
        field: str,
        fq: str | list[str] | None = None,
        op: str = "OR",
        mm: int | str | None = None,
        percentiles: list[float] | None = None,
    ) -> DataFrame:
        """Solr stats component (``stats=true&stats.field=F``): one row of
        min/max/count/missing/sum/sumOfSquares/mean/stddev over the match
        set's ``field`` values (stddev is Solr's sample form,
        ``stddev_samp``). One partial-agg pass -- a single scalar row
        crosses the wire regardless of corpus size.

        ``percentiles`` (Solr ``{!percentiles='1,99,99.9'}``): adds one
        ``p<NN>`` double column per requested percentile. EXACT linear
        interpolation (Spark's percentile aggregate), a documented
        deviation from Solr's t-digest APPROXIMATION -- strictly more
        accurate. Scale note: the exact aggregate's state is a per-group
        counts map bounded by the field's DISTINCT value count (fine for
        the bounded-cardinality numerics stats runs over, e.g. lengths /
        turn indexes); for unbounded-cardinality doubles at 10^12 rows,
        swap in percentile_approx -- same call shape, Solr-equivalent
        accuracy contract.

        String fields return Solr's string-stats shape (lexicographic
        min/max + count/missing, no arithmetic block) instead of silently
        casting to null doubles."""
        dtypes = dict(self.docs().dtypes)
        if field not in dtypes:
            raise ValueError(f"stats.field: unknown field {field!r}")
        if query.strip() == "*:*":
            base = self._anti_dead(self._apply_fq(self.docs(), fq))
        else:
            matched = self.score_matches(query, op=op, fq=fq, mm=mm)
            base = matched.join(self.docs().select("doc_id", field), "doc_id")
        if dtypes[field] == "string":
            if percentiles:
                raise ValueError(
                    f"percentiles need a numeric field, {field!r} is string"
                )
            c = F.col(field)
            return base.agg(
                F.min(c).alias("min"),
                F.max(c).alias("max"),
                F.count(c).alias("count"),
                F.sum(F.when(c.isNull(), 1).otherwise(0)).alias("missing"),
            )
        x = F.col(field).cast("double")
        aggs = [
            F.min(x).alias("min"),
            F.max(x).alias("max"),
            F.count(x).alias("count"),
            F.sum(F.when(x.isNull(), 1).otherwise(0)).alias("missing"),
            F.sum(x).alias("sum"),
            F.sum(x * x).alias("sumOfSquares"),
            F.avg(x).alias("mean"),
            F.stddev_samp(x).alias("stddev"),
        ]
        for p in percentiles or []:
            if not 0.0 <= float(p) <= 100.0:
                raise ValueError(f"percentile {p!r} not in [0, 100]")
            name = "p" + str(float(p)).rstrip("0").rstrip(".").replace(".", "_")
            aggs.append(F.percentile(x, F.lit(float(p) / 100.0)).alias(name))
        return base.agg(*aggs)

    GMAP_CACHE_MAX = 16

    def _gmap_entry(self, group_field: str) -> DataFrame:
        """Solr fieldValueCache analog (the implicit cache Solr grouping
        and field faceting lean on): the (segment_id, doc_id, kind=3,
        gkey) doc->group map of a field, PERSISTED distributed
        (MEMORY_AND_DISK) on first grouped use and LRU-evicted at
        GMAP_CACHE_MAX fields -- repeated grouped queries on the same
        field (the conv_id pattern) never re-scan the docs table. Safe
        across delete_by_query (tombstones travel as separate kind-0
        rows); compact/merge return a fresh handle; :meth:`release`
        unpersists."""
        from pyspark import StorageLevel

        ent = self._gmap_cache.get(group_field)
        if ent is not None:
            self._gmap_cache.move_to_end(group_field)
            return ent
        gmap = self.docs().select(
            (F.col("doc_id") / self.segment_size).cast("long").alias(
                "segment_id"
            ),
            "doc_id",
            F.lit(3).alias("kind"),
            F.col(group_field).cast("string").alias("gkey"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        self._gmap_cache[group_field] = gmap
        while len(self._gmap_cache) > self.GMAP_CACHE_MAX:
            _, old = self._gmap_cache.popitem(last=False)
            old.unpersist()
        return gmap

    def _grouped_matches(
        self,
        query: str,
        group_field: str,
        group_limit: int,
        op: str = "OR",
        synonyms: bool | dict = False,
        fq: str | list[str] | None = None,
        mm: int | str | None = None,
    ) -> DataFrame:
        """The grouped-query candidate relation: exact per-doc BM25 scores,
        COLLAPSED inside each segment kernel to the top ``group_limit``
        docs per group (canonical round6/doc_id order). Exactness: a doc's
        postings for every query term live in its segment, so per-doc
        scores and mm/AND clause counts are complete per kernel call; and
        a group's global top-limit docs are contained in the union of its
        per-segment top-limits. fq/tombstones filter BEFORE the collapse
        (a dead doc outranking a live one inside a group must not evict
        it), cogrouped as minority doc-id sets alongside the segment's
        doc->group map (kind=3 rows; segment_id = doc_id // segment_size,
        so routing needs no join and each kernel sees only its own
        segment's map, bounded by segment_size)."""
        if (self.parse_phrase_q(query) is not None
                or self.parse_boolean_q(query) is not None):
            # the term-scoring collapse kernels can't evaluate positional
            # or occur-structured matches -- fail loud (facade contract)
            # rather than grouping a bag-of-words approximation
            raise ValueError(
                "grouping does not support phrase/boolean-structured queries"
            )
        terms, boosts = self.parse_boosted_query(query, synonyms=synonyms)
        mm_n = self._norm_mm(mm, len(terms)) if op != "AND" else None
        fq = self._norm_fq(fq)
        idf = self.idf_map(terms)
        if boosts:
            idf = {t: w * boosts.get(t, 1.0) for t, w in idf.items()}
        empty = self.spark.createDataFrame([], _SCORE_ROW)
        if op == "AND" and any(t not in idf for t in terms):
            return empty
        terms = [t for t in terms if t in idf]
        if not terms or (mm_n is not None and mm_n > len(terms)):
            return empty

        k1, b, avgdl = K1, B, self.avgdl
        bidf = dict(idf)
        n_query_terms = len(terms)
        lim = max(int(group_limit), 1)
        need_nt = n_query_terms if op == "AND" else (mm_n or 1)
        is_and = op == "AND"

        post = self.postings_for(terms).select(
            "term", "segment_id", "count", "doc_gaps", "tfs", "dls"
        )
        side, fq_repr = self._side_frame(fq)
        # only segments holding postings of the query terms can match --
        # prune the (big, cached) doc->group map to them before it enters
        # the cogroup shuffle; the distinct segment list is n_segments
        # rows, always broadcastable, so a selective query never ships the
        # whole corpus's group map
        gmap = self._gmap_entry(group_field).join(
            F.broadcast(post.select("segment_id").distinct()),
            "segment_id",
            "left_semi",
        )
        if side is not None:
            side = side.withColumn(
                "gkey", F.lit(None).cast("string")
            ).unionByName(gmap)
        else:
            side = gmap
        FQ_INCLUDE, FQ_EXCLUDE = self._FQ_INCLUDE, self._FQ_EXCLUDE

        def collapse(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            res_empty = pd.DataFrame({"doc_id": [], "score": []}).astype(
                {"doc_id": "int64", "score": "float64"}
            )
            # absent cogroup sides arrive column-less (r5 fuzz finding;
            # see _wand_segments.cogrouped)
            if "term" not in left.columns or not len(left):
                return res_empty
            if "kind" not in right.columns:
                right = pd.DataFrame({
                    "doc_id": pd.Series([], dtype="int64"),
                    "kind": pd.Series([], dtype="int64"),
                })
            left = left[left["term"].map(bidf.__contains__)]
            if not len(left):
                return res_empty
            if is_and and left["term"].nunique() < n_query_terms:
                return res_empty  # a conjunct is absent from this segment
            dead = np.sort(
                right.loc[right["kind"] == 0, "doc_id"].to_numpy(np.int64)
            )
            allowed = excluded = None
            if fq_repr == FQ_INCLUDE:
                allowed = np.sort(
                    right.loc[right["kind"] == FQ_INCLUDE, "doc_id"]
                    .to_numpy(np.int64)
                )
            elif fq_repr == FQ_EXCLUDE:
                excluded = np.sort(
                    right.loc[right["kind"] == FQ_EXCLUDE, "doc_id"]
                    .to_numpy(np.int64)
                )
            g = right[right["kind"] == 3]
            gdocs = g["doc_id"].to_numpy(np.int64)
            gkeys = g["gkey"].to_numpy(object)
            o = np.argsort(gdocs)
            gdocs, gkeys = gdocs[o], gkeys[o]

            w = left["term"].map(bidf).to_numpy(np.float64)
            parts_d, parts_s = [], []
            for i, row in enumerate(left.itertuples(index=False)):
                gaps = varint_decode(row.doc_gaps, row.count)
                docs = np.cumsum(gaps).astype(np.int64)
                tf = varint_decode(row.tfs, row.count).astype(np.float64)
                dl = varint_decode(row.dls, row.count).astype(np.float64)
                if allowed is not None or excluded is not None or dead.size:
                    live = (
                        np.isin(docs, allowed)
                        if allowed is not None
                        else np.ones(len(docs), dtype=bool)
                    )
                    if excluded is not None and excluded.size:
                        live &= ~np.isin(docs, excluded)
                    if dead.size:
                        live &= ~np.isin(docs, dead)
                    docs, tf, dl = docs[live], tf[live], dl[live]
                denom = tf + k1 * (
                    1.0 - b + b * (dl / avgdl if avgdl else 1.0)
                )
                parts_d.append(docs)
                parts_s.append(w[i] * tf * (k1 + 1.0) / denom)
            cat = np.concatenate(parts_d) if parts_d else np.empty(0, np.int64)
            if not len(cat):
                return res_empty
            uniq, inv = np.unique(cat, return_inverse=True)
            sums = np.zeros(len(uniq), dtype=np.float64)
            np.add.at(sums, inv, np.concatenate(parts_s))
            if need_nt > 1:
                m = np.bincount(inv, minlength=len(uniq)) >= need_nt
                uniq, sums = uniq[m], sums[m]
            if not len(uniq):
                return res_empty
            # doc -> group key via the sorted segment map; a doc missing
            # from the map (never happens for live docs) gets its own ""
            # bucket, and null group values share one group (Solr's null
            # group semantics)
            pos = np.searchsorted(gdocs, uniq)
            pos_c = np.minimum(pos, max(len(gdocs) - 1, 0))
            gk = gkeys[pos_c].copy() if len(gdocs) else np.full(
                len(uniq), None, dtype=object
            )
            if len(gdocs):
                gk[gdocs[pos_c] != uniq] = None
            codes, _ = pd.factorize(gk, use_na_sentinel=False)
            # per-group top-limit under (round6 desc, doc asc): sort by
            # (group, -round6, doc), then positional rank within group
            order = np.lexsort((uniq, -np.round(sums, 6), codes))
            cs = codes[order]
            idx = np.arange(len(cs))
            new_grp = np.ones(len(cs), dtype=bool)
            new_grp[1:] = cs[1:] != cs[:-1]
            grp_start = np.maximum.accumulate(np.where(new_grp, idx, 0))
            keep = order[(idx - grp_start) < lim]
            return pd.DataFrame({"doc_id": uniq[keep], "score": sums[keep]})

        return (
            post.groupBy("segment_id")
            .cogroup(side.groupBy("segment_id"))
            .applyInPandas(collapse, schema=_SCORE_ROW)
        )

    def search_grouped(
        self,
        query: str,
        group_field: str,
        k: int = 10,
        group_limit: int = 1,
        op: str = "OR",
        synonyms: bool | dict = False,
        fq: str | list[str] | None = None,
        mm: int | str | None = None,
        group_sort: list[tuple[str, str]] | None = None,
    ) -> DataFrame:
        """Solr result grouping (``group=true&group.field=F``): the top
        ``group_limit`` docs of each group, for the top ``k`` groups
        ordered by their best doc's (round6 score, doc_id) key. On the
        transcripts corpus ``group_field='conv_id'`` answers "the best
        matching turns per conversation" -- Solr's canonical use.

        ``group_sort`` (Solr ``group.sort``, [(field, 'asc'|'desc'), ...]):
        order -- and therefore SELECT -- the docs within each group by
        these keys instead of relevance; group ordering itself stays the
        request's ``sort`` (each group's best score), Solr's split. A
        group.sort request can't use the score-collapse kernels (the
        per-group top-by-field isn't a subset of the per-segment
        top-by-score), so it scores the full match set exhaustively --
        Solr's grouping collects the full match set here too.

        Returns (group_value, group_rank, rank_in_group, doc_id, score),
        ordered. The k-th group's head can sit arbitrarily deep in the
        flat ranking when one group dominates, so every group must be
        SEEN -- but not every match must survive: the segment kernels
        collapse to the per-group top ``group_limit`` rows (Solr's
        collapse qparser shape; a group's global top-limit is a subset of
        the union of its per-segment top-limits, so the collapse is
        exact). Only groups-in-segment x limit rows per segment reach the
        window stage, instead of the full match set -- at 10^12 turns
        grouping by conv_id that's a ~turns-per-conversation-fold
        reduction before any shuffle. Then one window per group for
        rank_in_group and a broadcast join of the k group heads (k rows)
        cut the output. Nothing group-related is ever collected
        driver-side."""
        from pyspark.sql.window import Window

        key = F.round(F.col("score"), 6)
        if group_sort is not None:
            matched = self.score_matches(query, op=op, fq=fq, mm=mm)
            extra = [
                f for f, _ in group_sort
                if f not in ("score", "doc_id", group_field)
            ]
            joined = matched.join(
                self.docs().select("doc_id", group_field, *extra), "doc_id"
            ).filter(F.col(group_field).isNotNull())
            cols = []
            for f, d in group_sort:
                c = key if f == "score" else F.col(f)
                cols.append(c.desc() if d == "desc" else c.asc())
            wg = Window.partitionBy(group_field).orderBy(
                *cols, F.col("doc_id").asc()
            )
        else:
            matched = self._grouped_matches(
                query, group_field, group_limit, op=op, synonyms=synonyms,
                fq=fq, mm=mm,
            )
            # null-group docs drop (collapse nullPolicy=ignore; a null key
            # would take a head slot in limit(k) and then vanish in the
            # equi-join, silently shorting the page). Documented deviation
            # from Solr field grouping's explicit null group.
            joined = matched.join(
                self.docs().select("doc_id", group_field), "doc_id"
            ).filter(F.col(group_field).isNotNull())
            wg = Window.partitionBy(group_field).orderBy(
                key.desc(), F.col("doc_id").asc()
            )
        in_group = joined.withColumn(
            "rank_in_group", F.row_number().over(wg)
        ).filter(F.col("rank_in_group") <= group_limit)
        if group_sort is not None:
            # group ordering = each group's best (round6 score, doc_id) over
            # the FULL match set (the within-group leader under group.sort
            # need not be the group's best-scoring doc)
            horder = [F.col("b.k").desc(), F.col("b.nd").desc()]
            heads = (
                joined.groupBy(group_field)
                .agg(
                    F.max(
                        F.struct(
                            key.alias("k"), (-F.col("doc_id")).alias("nd")
                        )
                    ).alias("b")
                )
                .orderBy(*horder)
                .limit(k)
                .select(
                    F.col(group_field),
                    F.row_number()
                    .over(Window.orderBy(*horder))
                    .alias("group_rank"),
                )
            )
        else:
            heads = (
                in_group.filter(F.col("rank_in_group") == 1)
                .orderBy(key.desc(), F.col("doc_id").asc())
                .limit(k)
                .select(
                    F.col(group_field),
                    F.row_number()
                    .over(
                        Window.orderBy(key.desc(), F.col("doc_id").asc())
                    )
                    .alias("group_rank"),
                )
            )
        return (
            in_group.join(F.broadcast(heads), group_field)
            .select(
                F.col(group_field).alias("group_value"),
                "group_rank",
                "rank_in_group",
                "doc_id",
                "score",
            )
            .orderBy("group_rank", "rank_in_group")
        )

    BLOCK_JOIN_SCORE_MODES = ("none", "max", "total", "avg", "min")

    def term_vectors(
        self,
        doc_ids: list[int],
        with_positions: bool = False,
        with_df: bool = False,
        with_tf_idf: bool = False,
    ) -> dict[int, dict]:
        """Solr TermVectorComponent (``tv=true``): per requested doc, the
        term -> {tf[, positions][, df][, tf-idf]} map. Solr reads stored
        term vectors from the index; we re-tokenize the stored text with
        the SAME analysis chain the index was built with, which yields the
        identical vector (the chain is deterministic) without paying a
        doc-major decode of the term-major postings layout.

        Page-shaped by contract (<= rows ids, like Solr's component):
        stored text arrives via the docid-pushdown scan; df for the union
        of the page's terms comes from ONE In(term,...)-pruned dictionary
        scan; tf-idf = tf * 1/df (Solr TermVectorComponent's formula)."""
        if not doc_ids:
            return {}
        rows = (
            self.docs().select("doc_id", "text")
            .filter(F.col("doc_id").isin(list(doc_ids)))
            .collect()
        )
        vecs: dict[int, dict] = {}
        all_terms: set[str] = set()
        for r in rows:
            toks = self._analyze(r["text"] or "")
            tv: dict[str, dict] = {}
            for pos, t in enumerate(toks):
                ent = tv.setdefault(t, {"tf": 0})
                ent["tf"] += 1
                if with_positions:
                    ent.setdefault("positions", []).append(pos)
            vecs[r["doc_id"]] = tv
            all_terms.update(tv)
        if (with_df or with_tf_idf) and all_terms:
            dfm = {
                r["term"]: int(r["df"])
                for r in self.dictionary()
                .filter(F.col("term").isin(sorted(all_terms)))
                .groupBy("term").agg(F.sum("df").alias("df"))
                .collect()
            }
            for tv in vecs.values():
                for t, ent in tv.items():
                    d = dfm.get(t, 0)
                    if with_df:
                        ent["df"] = d
                    if with_tf_idf and d:
                        ent["tf-idf"] = ent["tf"] / d
        return vecs

    def expand_groups(
        self,
        query: str,
        field: str,
        group_values: list,
        exclude_ids: list[int],
        per_group: int = 5,
        op: str = "OR",
        fq: str | list[str] | None = None,
        mm: int | str | None = None,
    ) -> tuple[dict, dict]:
        """Solr ExpandComponent: for each collapsed group on the current
        page, the top ``per_group`` OTHER matching members by relevance.
        Returns ({group_value: [Row(doc_id, score), ...]},
        {group_value: total expandable count}).

        ``group_values``/``exclude_ids`` come from the page (<= rows
        entries), so the isin filters broadcast as literals into the scan;
        the match set is cut to page groups BEFORE the per-group window,
        and only <= len(group_values) * per_group rows plus one count row
        per group reach the driver."""
        from pyspark.sql.window import Window

        if not group_values:
            return {}, {}
        matched = self.score_matches(query, op=op, fq=fq, mm=mm)
        joined = (
            matched.join(self.docs().select("doc_id", field), "doc_id")
            .filter(F.col(field).isin(group_values))
            .filter(~F.col("doc_id").isin(exclude_ids))
        )
        key = F.round(F.col("score"), 6)
        w = Window.partitionBy(field).orderBy(key.desc(), F.col("doc_id").asc())
        top = (
            joined.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= per_group)
            .select(field, "doc_id", "score")
            .collect()
        )
        counts = {
            r[field]: int(r["n"])
            for r in joined.groupBy(field).agg(F.count("*").alias("n")).collect()
        }
        groups: dict = {}
        for r in top:
            groups.setdefault(r[field], []).append(r)
        for lst in groups.values():
            lst.sort(key=lambda r: (-round(r["score"], 6), r["doc_id"]))
        return groups, counts

    def collapse_heads(
        self,
        query: str,
        field: str,
        head_by: tuple | None = None,
        null_policy: str = "ignore",
        op: str = "OR",
        fq: str | list[str] | None = None,
        mm: int | str | None = None,
    ) -> DataFrame:
        """Solr CollapsingQParserPlugin head selection (``fq={!collapse
        field=F min=|max=|sort=|nullPolicy=}``): ONE row per collapsed
        group -- (group_value, doc_id, score) -- where the head is the
        group member chosen by ``head_by``:

        - ``None``: highest (round6 score, lowest doc_id) -- Solr's
          default relevance selector.
        - ``('min'|'max', field_or_func)``: smallest/largest value of a
          numeric field (or function query); group members with a null
          criterion never win the slot (an all-null group falls back to
          its lowest doc_id), ties break to the lowest doc_id.
        - ``('sort', [(key, 'asc'|'desc'), ...])``: top doc per group
          under the sort spec ('score' = the round6 relevance key,
          function queries compile through :meth:`function_expr`); nulls
          sort last, final tie-break doc_id asc.

        ``null_policy`` is Solr's: 'ignore' drops null-``field`` docs
        from the result set, 'expand' passes each through as its own
        head, 'collapse' folds them into ONE null group (Spark groupBy /
        window partitioning already treats the null key as a single
        group, so that path is the plain grouped plan).

        Scale shape: the relevance and plain-field min/max selectors are
        ONE partial-agg shuffle (``groupBy(field).agg(max(struct(...)))``
        -- map-side combine, groups-not-matches cross the wire). The
        sort/function selectors need every member's computed key side by
        side, so they pay one window shuffle of the match set -- the same
        cost Solr's collapse pays collecting the full DocSet. The score
        source is :meth:`score_matches` (field-selected heads still
        report their own relevance score, Solr's contract); ``*:*``
        short-circuits to the live fq'd scan with score 1.0."""
        from pyspark.sql.window import Window

        from ..functions.function_query import looks_like_function

        if null_policy not in ("ignore", "expand", "collapse"):
            raise ValueError(
                f"nullPolicy must be ignore|expand|collapse, got {null_policy!r}"
            )
        mode = head_by[0] if head_by else "score"
        if mode not in ("score", "min", "max", "sort"):
            raise ValueError(f"collapse head_by mode {mode!r} unsupported")

        if query.strip() == "*:*":
            base = (
                self._anti_dead(self._apply_fq(self.docs(), fq))
                .select("doc_id")
                .withColumn("score", F.lit(1.0))
            )
        else:
            base = self.score_matches(query, op=op, fq=fq, mm=mm)

        # columns the selector reads; function keys compile to SQL over the
        # docs frame, so join the full row and let Catalyst prune to what
        # the expression actually references
        skey = F.round(F.col("score"), 6)

        def _key_col(name: str):
            if name == "score":
                return skey
            if looks_like_function(name):
                return F.expr(self.function_expr(name)[0])
            if name not in self.docs().columns:
                raise ValueError(f"collapse criterion references unknown "
                                 f"field {name!r}")
            return F.col(name)

        need: list[str] = [field]
        keys = ([head_by[1]] if mode in ("min", "max")
                else [f for f, _ in head_by[1]] if mode == "sort" else [])
        any_func = any(looks_like_function(k) for k in keys)
        for k in keys:
            if k == "score" or looks_like_function(k):
                continue
            if k not in self.docs().columns:
                raise ValueError(
                    f"collapse criterion references unknown field {k!r}"
                )
            if k not in need:
                need.append(k)
        side = self.docs() if any_func else self.docs().select("doc_id", *need)
        joined = base.join(side, "doc_id")

        nulls = None
        grp = joined
        if null_policy == "ignore":
            grp = joined.filter(F.col(field).isNotNull())
        elif null_policy == "expand":
            nulls = joined.filter(F.col(field).isNull()).select(
                F.col(field).alias("group_value"), "doc_id", "score"
            )
            grp = joined.filter(F.col(field).isNotNull())

        func_minmax = mode in ("min", "max") and looks_like_function(head_by[1])
        if mode == "sort" or func_minmax:
            spec = (head_by[1] if mode == "sort" else
                    [(head_by[1], "asc" if mode == "min" else "desc")])
            cols = []
            for f_, d_ in spec:
                c = _key_col(f_)
                cols.append(c.desc_nulls_last() if d_ == "desc"
                            else c.asc_nulls_last())
            w = Window.partitionBy(field).orderBy(*cols, F.col("doc_id").asc())
            heads = (
                grp.withColumn("__r", F.row_number().over(w))
                .filter(F.col("__r") == 1)
                .select(F.col(field).alias("group_value"), "doc_id", "score")
            )
        else:
            if mode == "score":
                k = skey
            else:
                x = _key_col(head_by[1]).cast("double")
                k = F.coalesce(x if mode == "max" else -x,
                               F.lit(float("-inf")))
            pick = F.max(
                F.struct(
                    k.alias("k"),
                    (-F.col("doc_id")).alias("nd"),
                    F.col("score").alias("s"),
                )
            ).alias("h")
            heads = (
                grp.groupBy(field)
                .agg(pick)
                .select(
                    F.col(field).alias("group_value"),
                    (-F.col("h.nd")).cast("long").alias("doc_id"),
                    F.col("h.s").alias("score"),
                )
            )
        if nulls is not None:
            heads = heads.unionByName(nulls)
        return heads

    def search_reranked(
        self,
        query: str,
        rerank_query: str,
        k: int = 10,
        rerank_docs: int = 200,
        rerank_weight: float = 2.0,
        op: str = "OR",
        fq: str | list[str] | None = None,
        mm: int | str | None = None,
        offset: int = 0,
        with_stored: bool = False,
        order_key: str = "round6",
        fl: list[str] | None = None,
        return_components: bool = False,
    ) -> DataFrame:
        """Lucene/Solr ReRankQParser (``rq={!rerank reRankQuery=..
        reRankDocs=N reRankWeight=W}``): run the main query, take its top
        ``rerank_docs`` hits, and add ``W x reRankQuery score`` to those
        that also match the rerank query (ReRankQuery.rescore semantics:
        docs outside the window, and window docs the rerank query misses,
        keep their original score). Docs below the window keep their
        original ranking -- the final page may interleave boosted window
        docs with unboosted ones only within the window; Solr cuts the
        page from the rescored window followed by the tail, and so do we.

        Plan: the main top-window pass is the normal WAND top-k (window =
        reRankDocs, a driver-side list <= N); the rerank side scores once
        (pruned postings decode) and is cut to the window ids by an isin
        pushdown BEFORE collecting <= N rows. Nothing beyond the window
        is ever rescored -- the rerank cost is O(window), not O(match
        set), exactly the contract reRankDocs exists for."""
        need = offset + k
        window = self.search(
            query, k=max(int(rerank_docs), need), op=op, fq=fq, mm=mm,
            order_key=order_key,
        ).collect()
        win = window[: int(rerank_docs)]
        tail = window[int(rerank_docs):]
        ids = [r["doc_id"] for r in win]
        if ids:
            rr = {
                r["doc_id"]: r["score"]
                for r in self.score_matches(rerank_query, fq=fq)
                .filter(F.col("doc_id").isin(ids))
                .collect()
            }
        else:
            rr = {}
        rescored = [
            (r["doc_id"],
             r["score"] + float(rerank_weight) * rr.get(r["doc_id"], 0.0))
            for r in win
        ]
        # cut with the SAME key convention the result frame sorts by;
        # rescoring only ever raises window scores, and every window doc
        # already outscored every tail doc, so window-then-tail IS the
        # global score order
        if order_key == "milli":
            rescored.sort(key=lambda t: (-int(round(t[1] * 1000)), t[0]))
        else:
            rescored.sort(key=lambda t: (-round(t[1], 6), t[0]))
        page = (rescored + [(r["doc_id"], r["score"]) for r in tail])
        page = page[offset:need]
        df = self._from_doclist(
            [{"doc_id": int(d), "score": float(s)} for d, s in page],
            with_stored, order_key, fl,
        )
        if not return_components:
            return df
        # debugQuery support: the exact decomposition of each page doc's
        # score -- base (main-query score) + rerank (W x reRankQuery
        # score inside the window, 0.0 outside it or where the rerank
        # query misses). Same driver-side arithmetic as the rescore above,
        # so base + rerank == score bit-exactly.
        winset = set(ids)
        orig = {r["doc_id"]: float(r["score"]) for r in window}
        comps = {
            int(d): {
                "base": orig[d],
                "rerank": (float(rerank_weight) * rr[d]
                           if d in winset and d in rr else 0.0),
                "in_window": d in winset,
            }
            for d, _ in page
        }
        return df, comps

    def search_ltr(
        self,
        query: str,
        model,
        k: int = 10,
        rerank_docs: int = 200,
        efi: dict | None = None,
        op: str = "OR",
        fq: str | list[str] | None = None,
        mm: int | str | None = None,
        offset: int = 0,
        with_stored: bool = False,
        order_key: str = "round6",
        fl: list[str] | None = None,
        return_features: bool = False,
        return_components: bool = False,
    ):
        """Solr LTR rerank (``rq={!ltr model=M reRankDocs=N efi.k=v}``):
        rescore the main query's top ``rerank_docs`` with ``model``
        (functions/ltr.py — LinearModel / MultipleAdditiveTrees), REPLACING
        their scores (upstream LTRRescorer semantics; docs past the window
        keep their BM25 score and rank below the rescored window, the
        rescorer's window-then-tail page rule shared with
        :meth:`search_reranked`).

        Feature extraction cost is O(window): fieldValue features are one
        isin-pruned stored fetch of exactly the referenced columns;
        each solrQuery feature is one pruned postings pass cut to the
        window ids before collect; originalScore/value are free. Model
        evaluation is numpy over (window x features).

        ``return_features``: also return {doc_id: "name=v,name2=v2"} for
        the page docs — the ``fl=[features]`` transformer's wire format.
        """
        import numpy as np

        from ..functions.ltr import resolve_efi

        efi = {k_[4:] if k_.startswith("efi.") else k_: v
               for k_, v in (efi or {}).items()}
        need = offset + k
        window = self.search(
            query, k=max(int(rerank_docs), need), op=op, fq=fq, mm=mm,
            order_key=order_key,
        ).collect()
        win = window[: int(rerank_docs)]
        tail = window[int(rerank_docs):]
        ids = [int(r["doc_id"]) for r in win]
        X: dict[str, np.ndarray] = {}
        feat_fields = [f.param for f in model.features if f.kind == "fieldValue"]
        fvals: dict[int, dict] = {}
        if ids and feat_fields:
            fetched = (
                self.docs()
                .select("doc_id", *dict.fromkeys(feat_fields))
                .filter(F.col("doc_id").isin(ids))
                .collect()
            )
            fvals = {int(r["doc_id"]): r.asDict() for r in fetched}
        for f in model.features:
            if f.kind == "originalScore":
                X[f.name] = np.array([float(r["score"]) for r in win])
            elif f.kind == "fieldValue":
                X[f.name] = np.array([
                    float(fvals.get(d, {}).get(f.param) or 0.0) for d in ids
                ])
            elif f.kind == "solrQuery":
                qs = resolve_efi(str(f.param), efi)
                side = {}
                if ids:
                    side = {
                        int(r["doc_id"]): float(r["score"])
                        for r in self.score_matches(qs, fq=fq)
                        .filter(F.col("doc_id").isin(ids))
                        .collect()
                    }
                X[f.name] = np.array([side.get(d, 0.0) for d in ids])
            else:  # value
                v = f.param
                if isinstance(v, str):
                    v = float(resolve_efi(v, efi))
                X[f.name] = np.full(len(ids), float(v))
        new = model.score(X) if ids else np.array([])
        rescored = sorted(
            zip(ids, (float(s) for s in new)),
            key=(lambda t: (-int(round(t[1] * 1000)), t[0]))
            if order_key == "milli"
            else (lambda t: (-round(t[1], 6), t[0])),
        )
        page = rescored + [(int(r["doc_id"]), float(r["score"])) for r in tail]
        page = page[offset:need]
        out = self._from_doclist(
            [{"doc_id": d, "score": s} for d, s in page],
            with_stored, order_key, fl,
        )
        if not return_features and not return_components:
            return out
        page_ids = {d for d, _ in page}
        pos = {d: i for i, d in enumerate(ids)}
        fmap = {
            d: ",".join(
                f"{f.name}={X[f.name][pos[d]]:g}" for f in model.features
            )
            for d in page_ids
            if d in pos
        }
        if not return_components:
            return out, fmap
        # debugQuery support: per page doc, the model's contribution
        # breakdown (per-feature for LinearModel, per-tree for trees --
        # model.explain, same fold as model.score so the contributions
        # sum to the replaced score bit-exactly). Tail docs keep their
        # original BM25 score (in_window False).
        contribs = model.explain(X) if ids else []
        orig = {int(r["doc_id"]): float(r["score"]) for r in window}
        comps = {}
        for d, _s in page:
            if d in pos:
                i = pos[d]
                comps[d] = {
                    "in_window": True,
                    "base": orig[d],
                    "model": [(lbl, float(arr[i])) for lbl, arr in contribs],
                    "features": {f.name: float(X[f.name][i])
                                 for f in model.features},
                }
            else:
                comps[d] = {"in_window": False, "base": orig[d]}
        return (out, fmap, comps) if return_features else (out, comps)

    def search_grouped_func(
        self,
        query: str,
        func: str,
        k: int = 10,
        group_limit: int = 1,
        op: str = "OR",
        fq: str | list[str] | None = None,
        mm: int | str | None = None,
    ) -> DataFrame:
        """Solr ``group.func``: group the match set by a FUNCTION value
        (same return shape as :meth:`search_grouped`). No collapse-kernel
        shortcut exists for function grouping -- the per-doc value must
        materialize before any group cut (Solr's function grouping
        collects the full match set too) -- so the plan is: scored match
        set -> join ONLY the fields the function reads -> one codegen'd
        value column -> per-group window -> k broadcast heads."""
        from pyspark.sql.window import Window

        sql, fields = self.function_expr(func)
        fields = [f for f in fields if f != "doc_id"]  # join key itself
        matched = self.score_matches(query, op=op, fq=fq, mm=mm)
        joined = matched.join(
            self.docs().select("doc_id", *fields), "doc_id"
        ).withColumn("__gval", F.expr(sql)).filter(
            # a NULL function value never forms a group (the equi-join on
            # the heads would silently drop it mid-page otherwise)
            F.col("__gval").isNotNull()
        )
        key = F.round(F.col("score"), 6)
        wg = Window.partitionBy("__gval").orderBy(
            key.desc(), F.col("doc_id").asc()
        )
        in_group = joined.withColumn(
            "rank_in_group", F.row_number().over(wg)
        ).filter(F.col("rank_in_group") <= group_limit)
        horder = [key.desc(), F.col("doc_id").asc()]
        heads = (
            in_group.filter(F.col("rank_in_group") == 1)
            .orderBy(*horder)
            .limit(k)
            .select(
                "__gval",
                F.row_number().over(Window.orderBy(*horder))
                .alias("group_rank"),
            )
        )
        return (
            in_group.join(F.broadcast(heads), "__gval")
            .select(
                F.col("__gval").alias("group_value"),
                "group_rank", "rank_in_group", "doc_id", "score",
            )
            .orderBy("group_rank", "rank_in_group")
        )

    def block_join_parent(
        self,
        child_q: str,
        k: int = 10,
        score_mode: str = "none",
        op: str = "OR",
        fq: str | list[str] | None = None,
        mm: int | str | None = None,
        parent_key: str = "conv_id",
    ) -> DataFrame:
        """Lucene ToParentBlockJoinQuery / Solr ``{!parent which=...
        score=mode}childQuery``: the parents whose child block holds at
        least one child matching ``childQuery``, scored by aggregating the
        matching children's scores per ScoreMode -- none (constant 1.0,
        Solr's default), max, total (sum), avg, min.

        Block adaptation: Solr block-joins need parent and child docs
        interleaved in one segment with a ``which=`` parent filter; this
        corpus IS a flattened block structure -- ``conv_id`` is the block
        key and turns are the children (the reference writes the same
        shape: parent docs with nested ``body-child`` chunk children,
        InlineDocumentListener.java:106-115) -- so the parent filter is
        implicit and the parent's identity is the block key itself.
        ``fq``/``mm``/``op`` shape the CHILD match set, exactly like the
        nested query inside ``{!parent}``.

        Returns (parent_id, score, n_child_hits) ordered by (round6 score
        DESC, parent_id ASC), top ``k``.

        Scale shape: the child match set comes from the pruned postings
        decode (never the corpus); doc_id -> block key is a projection
        join against the doc_id-sorted docs parquet (sort-merge now, a
        co-located zipper on a doc_id-bucketed layout); the ScoreMode
        aggregation is ONE partial-agg shuffle keyed by the block key
        (map-side combine cuts it to unique-parents-per-partition rows);
        the global cut is TakeOrderedAndProject on k rows. Nothing is
        ever collected driver-side."""
        if score_mode not in self.BLOCK_JOIN_SCORE_MODES:
            raise ValueError(
                f"score mode {score_mode!r} not in "
                f"{self.BLOCK_JOIN_SCORE_MODES}"
            )
        matched = self.score_matches(child_q, op=op, fq=fq, mm=mm)
        kids = matched.join(
            self.docs().select("doc_id", parent_key), "doc_id"
        )
        agg = {
            "none": F.lit(1.0),
            "max": F.max("score"),
            "total": F.sum("score"),
            "avg": F.avg("score"),
            "min": F.min("score"),
        }[score_mode]
        out = kids.groupBy(F.col(parent_key).alias("parent_id")).agg(
            agg.alias("score"), F.count("*").alias("n_child_hits")
        )
        return out.orderBy(
            F.round(F.col("score"), 6).desc(), F.col("parent_id").asc()
        ).limit(k)

    def block_join_children(
        self,
        child_q: str,
        k: int = 10,
        score_mode: str = "none",
        op: str = "OR",
        fq: str | list[str] | None = None,
        mm: int | str | None = None,
        parent_key: str = "conv_id",
    ) -> DataFrame:
        """Lucene ToChildBlockJoinQuery / Solr ``{!child of=...}parentQ``:
        every LIVE child of each matching parent block, each child carrying
        its parent's block-join score (ToChildBlockJoinScorer hands the
        parent score to all its children). Parent matching and ScoreMode
        follow :meth:`block_join_parent` (same block adaptation: the
        parent is the block key, matched through its children).

        Returns (doc_id, parent_id, score) for the top ``k`` parents'
        children, ordered by (parent round6 score DESC, parent_id ASC,
        doc_id ASC) -- children stay in block order within their parent.

        Scale shape: the k parent heads are k rows -- broadcast back
        against the docs scan, so expanding to children never shuffles
        the corpus; tombstoned children are dropped like any dead doc."""
        heads = self.block_join_parent(
            child_q, k=k, score_mode=score_mode, op=op, fq=fq, mm=mm,
            parent_key=parent_key,
        ).select("parent_id", "score")
        kids = self._anti_dead(self.docs()).select(
            "doc_id", F.col(parent_key).alias("parent_id")
        )
        return (
            kids.join(F.broadcast(heads), "parent_id")
            .select("doc_id", "parent_id", "score")
            .orderBy(
                F.round(F.col("score"), 6).desc(),
                F.col("parent_id").asc(),
                F.col("doc_id").asc(),
            )
        )

    _EXPLAIN_ROW = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("term", T.StringType(), False),
            T.StructField("tf", T.DoubleType(), False),
            T.StructField("dl", T.DoubleType(), False),
            T.StructField("weight", T.DoubleType(), False),
            T.StructField("contribution", T.DoubleType(), False),
        ]
    )

    def explain(
        self,
        query: str,
        doc_ids: list[int],
        synonyms: bool | dict = False,
    ) -> DataFrame:
        """Solr ``debugQuery=true`` explain analog: the per-(doc, term) BM25
        breakdown for the given docs — tf, dl, the idf×boost weight, and the
        term's score contribution (sum of contributions = the doc's score,
        exactly; same float math as the scoring kernels).

        Plan: postings scan pruned to the query terms' buckets (the doc
        filter can't push below the block encoding, so blocks whose
        [min_doc, max_doc] range misses every requested doc are skipped
        kernel-side and the rest decode + filter) — cost is bounded by the
        query terms' postings, never the corpus, and only len(doc_ids) ×
        len(terms) rows come back."""
        if (self.parse_phrase_q(query) is not None
                or self.parse_boolean_q(query) is not None):
            # a per-TERM breakdown can't reconstruct a phrase/boolean score
            # (freq is the phrase-occurrence count, not any term's tf) --
            # fail loud instead of returning contributions that don't sum
            raise ValueError(
                "explain does not support phrase/boolean-structured queries"
            )
        terms, boosts = self.parse_boosted_query(query, synonyms=synonyms)
        idf = self.idf_map(terms)
        if boosts:
            idf = {t: w * boosts.get(t, 1.0) for t, w in idf.items()}
        terms = [t for t in terms if t in idf]
        ids = np.sort(np.asarray(list(dict.fromkeys(int(i) for i in doc_ids)),
                                 dtype=np.int64))
        if not terms or not ids.size:
            return self.spark.createDataFrame([], self._EXPLAIN_ROW)
        k1, b, avgdl = K1, B, self.avgdl
        bidf = dict(idf)
        lo, hi = int(ids[0]), int(ids[-1])

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                outs = []
                for row in pdf.itertuples(index=False):
                    if row.max_doc < lo or row.min_doc > hi:
                        continue  # block can't hold any requested doc
                    w = bidf.get(row.term)
                    if w is None:
                        continue
                    docs = np.cumsum(
                        varint_decode(row.doc_gaps, row.count)
                    ).astype(np.int64)
                    keep = np.isin(docs, ids)
                    if not keep.any():
                        continue
                    tf = varint_decode(row.tfs, row.count).astype(np.float64)[keep]
                    dl = varint_decode(row.dls, row.count).astype(np.float64)[keep]
                    denom = tf + k1 * (
                        1.0 - b + b * (dl / avgdl if avgdl else 1.0)
                    )
                    outs.append(
                        pd.DataFrame(
                            {
                                "doc_id": docs[keep],
                                "term": row.term,
                                "tf": tf,
                                "dl": dl,
                                "weight": w,
                                "contribution": w * tf * (k1 + 1.0) / denom,
                            }
                        )
                    )
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        cols = ["term", "count", "min_doc", "max_doc", "doc_gaps", "tfs", "dls"]
        return (
            self.postings_for(terms)
            .select(*cols)
            .mapInPandas(kernel, schema=self._EXPLAIN_ROW)
            .orderBy("doc_id", "term")
        )

    def suggest(
        self,
        term: str,
        n: int = 5,
        max_distance: int = 2,
        min_query_length: int = 4,
        max_query_frequency: float = 0.01,
        min_prefix: int = 1,
        accuracy: float = 0.5,
    ) -> DataFrame:
        """Q6: DirectSolrSpellChecker-shaped suggestions from the live
        dictionary (solrconfig.xml:689-710: maxEdits=2, minPrefix=1,
        accuracy=0.5, minQueryLength=4, maxQueryFrequency=0.01 -- only terms
        the corpus itself considers rare get corrected; candidates ranked by
        distance then df desc).

        JVM-side: built-in levenshtein over the dictionary relation. Both
        the shared-prefix predicate (minPrefix) and the +/-max_distance
        length band push into the dictionary scan BEFORE any aggregate, so
        at 10^12-turn vocab the edit distance only ever runs over the tiny
        same-prefix/same-length-band slice."""
        t = term.lower()
        if len(t) < min_query_length:
            return self.dictionary().limit(0).select(
                "term", F.col("df").cast("long").alias("df")
            )
        qdf = self._dfs([t]).get(t, 0)
        if self.n_docs and qdf / self.n_docs > max_query_frequency:
            return self.dictionary().limit(0).select(
                "term", F.col("df").cast("long").alias("df")
            )
        band = self.dictionary().filter(
            (F.abs(F.length("term") - F.lit(len(t))) <= max_distance)
            & (F.substring("term", 1, min_prefix) == t[:min_prefix])
            & (F.col("term") != t)
        )
        d = band.groupBy("term").agg(F.sum("df").alias("df"))
        cand = d.withColumn("distance", F.levenshtein(F.col("term"), F.lit(t)))
        # accuracy = 1 - distance / max(|query|, |term|) (Lucene's internal
        # levenshtein similarity); closest correction first, then most
        # frequent (DirectSolrSpellChecker comparator)
        longest = F.greatest(F.length("term"), F.lit(len(t)))
        return (
            cand.filter(F.col("distance") <= max_distance)
            .filter(F.lit(1.0) - F.col("distance") / longest >= accuracy)
            .select("term", F.col("df").cast("long").alias("df"), "distance")
            .orderBy(F.col("distance").asc(), F.col("df").desc(), F.col("term").asc())
            .limit(n)
        )

    def break_suggestions(
        self,
        term: str,
        n: int = 5,
        min_break_length: int = 1,
        min_suggestion_freq: int = 1,
    ) -> list[dict]:
        """WordBreakSolrSpellChecker ``breakWords=true`` (the reference's
        second /spell dictionary, solrconfig.xml:715-722; Lucene
        WordBreakSpellChecker.suggestWordBreaks with maxChanges=1): split a
        token that is absent from the dictionary into two dictionary words
        ("errorin" -> "error in").

        Every split point's two parts are resolved in ONE batched ``_dfs``
        lookup (pruned dictionary scan / cached map -- no per-split jobs), so
        a k-char token costs one lookup of <= 2(k-1) terms regardless of
        dictionary size. Ranked by summed part-df desc (Lucene's
        NUM_CHANGES_THEN_SUMMED_FREQUENCY with the change count constant at
        1); ``freq`` is that ranking sum. Returns a small driver-side list
        (suggestion fan-out is bounded by the token length, never by corpus
        size)."""
        t = term.lower()
        cuts = range(min_break_length, len(t) - min_break_length + 1)
        parts = list(dict.fromkeys(p for i in cuts for p in (t[:i], t[i:])))
        if not parts:
            return []
        dfs = self._dfs(parts)
        out = [
            {"word": f"{t[:i]} {t[i:]}",
             "freq": dfs.get(t[:i], 0) + dfs.get(t[i:], 0)}
            for i in cuts
            if dfs.get(t[:i], 0) >= min_suggestion_freq
            and dfs.get(t[i:], 0) >= min_suggestion_freq
        ]
        out.sort(key=lambda s: (-s["freq"], s["word"]))
        return out[:n]

    def combine_suggestions(
        self,
        tokens: list[str],
        n: int = 5,
        min_suggestion_freq: int = 1,
    ) -> list[dict]:
        """WordBreakSolrSpellChecker ``combineWords=true`` (solrconfig.xml
        :715-722; Lucene WordBreakSpellChecker.suggestWordCombinations):
        adjacent query tokens whose concatenation is a dictionary word
        ("topi c42" -> "topic42"). Only pairs where at least one side is
        itself absent from the dictionary combine -- two correctly-spelled
        words stay two words (the checker corrects misspellings, it does not
        merge valid text).

        All pair concatenations AND the pair members resolve in one batched
        ``_dfs`` lookup. Returns [{"tokens": (t1, t2), "word", "freq"}]
        ranked by combined-word df desc."""
        pairs = [(tokens[i], tokens[i + 1]) for i in range(len(tokens) - 1)]
        if not pairs:
            return []
        lookups = list(dict.fromkeys(
            [a + b for a, b in pairs] + [p for pair in pairs for p in pair]
        ))
        dfs = self._dfs(lookups)
        out = [
            {"tokens": (a, b), "word": a + b, "freq": dfs.get(a + b, 0)}
            for a, b in pairs
            if dfs.get(a + b, 0) >= min_suggestion_freq
            and (dfs.get(a, 0) == 0 or dfs.get(b, 0) == 0)
        ]
        out.sort(key=lambda s: (-s["freq"], s["word"]))
        return out[:n]

    def highlight(
        self,
        query: str,
        k: int = 10,
        pre: str = "<em>",
        post: str = "</em>",
        fragsize: int | None = None,
        order_key: str = "round6",
        fq: str | list[str] | None = None,
        snippets: int = 1,
        hl_q: str | None = None,
        max_analyzed_chars: int | None = None,
    ) -> DataFrame:
        """Q7: highlighting over the top-k result set -- every stored-text
        token whose ANALYZED form matches an analyzed query term is wrapped
        in pre/post markers (solrconfig.xml default highlighter semantics;
        whole-field fragment by default).

        ``hl_q`` (Solr hl.q): highlight the terms of THIS query instead of
        the main query's -- ranking still comes from ``query``; only the
        marked terms change.

        ``max_analyzed_chars`` (Solr hl.maxAnalyzedChars, default
        unbounded here): only the first N characters are analyzed for
        highlighting. Fragments never start past the cap; in whole-field
        mode the text beyond it is returned unmarked (Lucene's behavior).
        At 10^12 turns this caps per-doc highlight work no matter how
        large a stored field is.

        ``fragsize`` (solrconfig.xml HighlightComponent gap fragmenter,
        hl.fragsize=100 default): return a ~fragsize-char window centered on
        the first query-term occurrence instead of the whole field. Frozen
        fragment spec (shared with the DuckDB oracle): first occurrence =
        smallest case-insensitive position of any analyzed term; window
        start = max(1, pos - fragsize/2); markers applied inside the window.
        text_general only (stemmed chains highlight the whole field).

        text_general: pure JVM regexp (analysis is lowercasing only, so the
        query terms literally occur in the text). Stemmed chains: query terms
        are stems ('tables' -> 'tabl') that may never appear as surface text,
        so the stored text is re-analyzed token-by-token in an Arrow kernel
        and tokens are wrapped when their stem is in the query term set.

        ``snippets`` (Solr hl.snippets, default 1): with snippets > 1 the
        ``highlighted`` column becomes ``array<string>`` of up to that many
        fragments -- ~fragsize-char windows centered on successive
        query-term occurrences, each occurrence inside an earlier window
        consumed (non-overlapping, document order). The multi-snippet
        fragmenter is one Arrow kernel for every chain; snippets=1 keeps
        the frozen single-fragment spec above (oracle-shared)."""
        # phrase/mixed q: highlight the clauses' terms (Solr's default
        # highlighter marks individual term occurrences of a phrase query's
        # terms); search() below routes the q to the right scorer itself
        terms = self._surface_terms(hl_q if hl_q is not None else query)
        top = self.search(
            query, k=k, with_stored=True, order_key=order_key, fq=fq
        ).select("doc_id", "score", "text")
        # hl.maxAnalyzedChars: cap the text the highlighter sees. Fragment
        # modes (fragsize / snippets) just work on the prefix; whole-field
        # mode re-appends the unmarked tail afterwards.
        whole_field = snippets <= 1 and fragsize is None
        if max_analyzed_chars is not None:
            cap = int(max_analyzed_chars)
            if cap <= 0:
                raise ValueError("hl.maxAnalyzedChars must be positive")
            if whole_field:
                top = top.withColumn(
                    "__hl_suffix", F.expr(f"substring(text, {cap + 1})")
                )
            top = top.withColumn("__hl_full", F.col("text")).withColumn(
                "text", F.substring("text", 1, cap)
            )

        def _reattach(df: DataFrame) -> DataFrame:
            # undo the cap's plumbing: whole-field mode re-appends the
            # unanalyzed tail to the markup; the stored text column always
            # goes back out untruncated
            if "__hl_suffix" in df.columns:
                df = df.withColumn(
                    "highlighted",
                    F.concat(F.col("highlighted"), F.col("__hl_suffix")),
                ).drop("__hl_suffix")
            if "__hl_full" in df.columns:
                df = df.withColumn("text", F.col("__hl_full")).drop("__hl_full")
            return df

        if snippets > 1:
            return _reattach(self._highlight_snippets(
                top, terms, pre, post, fragsize or 100, snippets
            ))
        if not terms:
            return _reattach(top.withColumn("highlighted", F.col("text")))
        if self.analyzer_chain == "text_general":
            pattern = "(?i)\\b(" + "|".join(sorted(terms)) + ")\\b"
            target = F.col("text")
            if fragsize is not None:
                # first case-insensitive occurrence of any term (0 = absent)
                locs = [F.locate(t, F.lower(F.col("text"))) for t in sorted(terms)]
                nz = [F.when(c > 0, c).otherwise(F.lit(2_147_483_647)) for c in locs]
                first = F.least(*nz) if len(nz) > 1 else nz[0]
                start = F.when(
                    first == 2_147_483_647, F.lit(1)
                ).otherwise(F.greatest(F.lit(1), first - fragsize // 2))
                target = F.substring(F.col("text"), start, fragsize)
            # pre/post are now user-settable (hl.tag.*): escape Java regex
            # replacement metacharacters ($ group refs, \) so a literal
            # '$' in the markup can't throw or substitute a match group
            esc = re.compile(r"([\\$])")
            pre_r, post_r = esc.sub(r"\\\1", pre), esc.sub(r"\\\1", post)
            return _reattach(top.withColumn(
                "highlighted",
                F.regexp_replace(target, pattern, f"{pre_r}$1{post_r}"),
            ))

        import re as _re

        from pyspark.sql.functions import pandas_udf

        from ..functions.analysis import (
            HIGHLIGHT_TOKEN_PATTERNS,
            TOKEN_NORMALIZERS,
        )

        normalize = TOKEN_NORMALIZERS[self.analyzer_chain]
        tset = frozenset(terms)
        tok_re = _re.compile(HIGHLIGHT_TOKEN_PATTERNS[self.analyzer_chain])

        @pandas_udf(T.StringType())
        def mark(texts: pd.Series) -> pd.Series:
            def one(text):
                if text is None:
                    return None
                out, last = [], 0
                for m in tok_re.finditer(text):
                    if any(f in tset for f in normalize(m.group(0))):
                        out.append(text[last : m.start()])
                        out.append(pre + m.group(0) + post)
                        last = m.end()
                return text if not out else "".join(out) + text[last:]

            return texts.map(one)

        return _reattach(top.withColumn("highlighted", mark(F.col("text"))))

    def _highlight_snippets(
        self, top: DataFrame, terms: list[str],
        pre: str, post: str, fragsize: int, snippets: int,
    ) -> DataFrame:
        """hl.snippets > 1 fragmenter: per doc, up to ``snippets``
        non-overlapping ~fragsize-char windows in document order, each
        centered on the first query-term occurrence past the previous
        window; every term occurrence inside a window gets pre/post
        markers. One Arrow kernel regardless of analyzer chain (token
        match = any analyzed form of the surface token in the query term
        set -- the stemmed-chain rule, which reduces to literal matching
        for text_general)."""
        import re as _re

        from pyspark.sql.functions import pandas_udf

        from ..functions.analysis import (
            HIGHLIGHT_TOKEN_PATTERNS,
            TOKEN_NORMALIZERS,
        )

        if not terms:
            return top.withColumn(
                "highlighted",
                F.lit(None).cast(T.ArrayType(T.StringType())),
            )
        normalize = TOKEN_NORMALIZERS[self.analyzer_chain]
        tset = frozenset(terms)
        tok_re = _re.compile(HIGHLIGHT_TOKEN_PATTERNS[self.analyzer_chain])
        half = fragsize // 2

        @pandas_udf(T.ArrayType(T.StringType()))
        def frags(texts: pd.Series) -> pd.Series:
            def mark(frag: str) -> str:
                out, last = [], 0
                for m in tok_re.finditer(frag):
                    if any(f in tset for f in normalize(m.group(0))):
                        out.append(frag[last : m.start()])
                        out.append(pre + m.group(0) + post)
                        last = m.end()
                return frag if not out else "".join(out) + frag[last:]

            def one(text):
                if text is None:
                    return None
                got, nxt = [], 0
                for m in tok_re.finditer(text):
                    if len(got) >= snippets:
                        break
                    if m.start() < nxt:
                        continue
                    if any(f in tset for f in normalize(m.group(0))):
                        # clamp to the previous window's end so fragments
                        # never overlap (the occurrence stays inside: its
                        # start is >= nxt by the check above)
                        s = max(0, m.start() - half, nxt if got else 0)
                        got.append(mark(text[s : s + fragsize]))
                        nxt = s + fragsize
                return got

            return texts.map(one)

        return top.withColumn("highlighted", frags(F.col("text")))

    # -- delete-by-query (I5): Lucene-style tombstones -------------------------

    def delete_by_query(self, predicate: str) -> int:
        """I5: delete-by-query via tombstones (Lucene liveDocs analog; the
        reference's `-crawl_id:X` delete, SolrAdminActions.java:228-264).
        Matching doc ids are appended to a tombstone table; queries exclude
        them. df/avgdl stay at their pre-delete values until a rebuild
        compaction -- exactly Lucene's behavior before segment merge.
        Returns the number of docs deleted.

        The tombstone set stays a DataFrame end to end: the reference's only
        real delete shape (`-crawl_id:X`) can cover ~the whole corpus, so the
        ids must never be collected to the driver or captured in task
        closures. Queries exclude them via left-anti joins (exhaustive /
        match-all paths) or per-segment cogrouped arrays (WAND path)."""
        from ..index.build import INDEX_PARQUET_CODEC

        # the reference's delete shape IS Solr query syntax (`-crawl_id:X`
        # deletes every doc not stamped with the current crawl); accept it
        # alongside SQL predicates, with Lucene null semantics (a doc with
        # no crawl_id field matches `-crawl_id:X` and is deleted)
        if looks_like_solr_fq(predicate):
            predicate = parse_fq(predicate, dict(self.docs().dtypes))
        victims = self.docs().filter(predicate).select("doc_id")
        path = os.path.join(self.data_dir, "tombstones")
        victims.write.mode("append").option(
            "compression", INDEX_PARQUET_CODEC
        ).parquet(path)
        self._has_tombstones = True
        # cached DocLists are stale once docs die (Solr drops the
        # queryResultCache on searcher reopen); fq sets stay valid because
        # tombstones are applied separately from fq filtering
        self._result_cache.clear()
        return victims.count()

    def _tombstones_df(self) -> DataFrame | None:
        """Distinct tombstoned doc ids as a DataFrame (never collected)."""
        if getattr(self, "_has_tombstones", None) is None:
            self._has_tombstones = os.path.exists(
                os.path.join(self.data_dir, "tombstones")
            )
        if not self._has_tombstones:
            return None
        return (
            self.spark.read.parquet(os.path.join(self.data_dir, "tombstones"))
            .select("doc_id")
            .distinct()
        )

    def _anti_dead(self, df: DataFrame, key: str = "doc_id") -> DataFrame:
        dead = self._tombstones_df()
        if dead is None:
            return df
        return df.join(dead.withColumnRenamed("doc_id", key), key, "left_anti")

    def match_all(
        self,
        k: int = 10,
        fq: str | list[str] | None = None,
        offset: int = 0,
        after_doc: int | None = None,
    ) -> DataFrame:
        """Q2: ``q=*:*`` -- every (live) doc, constant score 1.0, internal
        doc-id order (Solr's MatchAllDocsQuery under the default sort).

        ``after_doc``: cursorMark keyset for the bulk-export loop -- the
        ``doc_id > last`` predicate pushes into the docs parquet scan
        (row-group min/max pruning, docs are written in doc_id order), so
        exporting 10^12 rows page-by-page never re-ranks an offset prefix
        and each page reads only the row groups past the cursor."""
        d = self._anti_dead(self._apply_fq(self.docs(), fq))
        if after_doc is not None:
            d = d.filter(F.col("doc_id") > int(after_doc))
        out = d.select("doc_id", F.lit(1.0).alias("score")).orderBy("doc_id")
        return out.offset(offset).limit(k) if offset else out.limit(k)

    def score_matches(
        self, query: str, op: str = "OR",
        fq: str | list[str] | None = None,
        mm: int | str | None = None,
    ) -> DataFrame:
        """The FULL scored match set (doc_id, score) — no top-k cut. Backs
        field-sorted /select requests (Solr sorts the whole DocSet by the
        field; scores are still reported per doc when fl asks). Exhaustive
        decode + aggregate: a field sort needs every match anyway, so WAND
        pruning has nothing to skip. Structured ``q`` (quoted phrase,
        boolean-occur clauses) routes to :meth:`structured_matches`."""
        st = self.structured_matches(query, op=op, fq=fq, mm=mm)
        if st is not None:
            return st
        terms, boosts = self.parse_boosted_query(query)
        mm = self._norm_mm(mm, len(terms)) if op != "AND" else None
        idf = self.idf_map(terms)
        if boosts:
            idf = {t: w * boosts.get(t, 1.0) for t, w in idf.items()}
        empty = self.spark.createDataFrame([], _SCORE_ROW)
        if op == "AND" and any(t not in idf for t in terms):
            return empty
        terms = [t for t in terms if t in idf]
        if not terms or (mm is not None and mm > len(terms)):
            return empty
        return self._scored_frame(terms, idf, 0, op, "exhaustive", fq, mm=mm)

    def _matched_ids(
        self, query: str, op: str = "OR",
        fq: str | list[str] | None = None,
        mm: int | str | None = None,
    ) -> DataFrame:
        """The DISTINCT live matched doc ids of a query under op/mm/fq --
        the DocSet behind numFound, facet and facet.range (Solr facets the
        exact filtered DocSet, so op/mm MUST shape it identically to the
        docs list on the same response). Pruned postings decode -> doc ids
        (no scoring math); AND/mm add one per-doc clause count. Nothing
        doc-sized reaches the driver. Structured ``q`` (phrase / boolean
        occur): the match set's ids (one row per matched doc already)."""
        st = self.structured_matches(query, op=op, fq=fq, mm=mm)
        if st is not None:
            return st.select("doc_id")
        empty = self.docs().select("doc_id").limit(0)
        terms, _ = self.parse_boosted_query(query)  # boosts don't change the set
        mm = self._norm_mm(mm, len(terms)) if op != "AND" else None
        idf = self.idf_map(terms)
        if op == "AND" and any(t not in idf for t in terms):
            return empty
        terms = list(dict.fromkeys(t for t in terms if t in idf))
        if not terms or (mm is not None and mm > len(terms)):
            return empty
        # each (term, doc) posting decodes to exactly one row, so rows per
        # doc = number of query terms present in it
        hits = self._decode_score_df(terms, idf).select("doc_id")
        if op == "AND" or mm is not None:
            need_nt = len(terms) if op == "AND" else mm
            cmp = (
                F.col("nt") == need_nt if op == "AND" else F.col("nt") >= need_nt
            )
            matched = (
                hits.groupBy("doc_id")
                .agg(F.count("*").alias("nt"))
                .filter(cmp)
                .select("doc_id")
            )
        else:
            matched = hits.distinct()
        return self._anti_dead(self._apply_fq(matched, fq))

    def count_matches(
        self, query: str, op: str = "OR",
        fq: str | list[str] | None = None,
        mm: int | str | None = None,
    ) -> int:
        """Total match count for a query — Solr's ``numFound`` (every
        /select response carries it regardless of ``rows``). ``*:*`` counts
        live docs under fq; scored queries count the :meth:`_matched_ids`
        DocSet — a partial-agg count job, nothing collected."""
        if query.strip() == "*:*":
            return self._anti_dead(self._apply_fq(self.docs(), fq)).count()
        return self._matched_ids(query, op=op, fq=fq, mm=mm).count()

    def _config_from_manifest(self, build_id: str):
        """Reconstruct the BuildConfig the index was built with from the
        manifest's finalize metrics, so compaction/merge is semantics-
        preserving (same analyzer chain, segment/block/bucket layout,
        positions, copyFields) instead of silently reverting to defaults."""
        from ..index.build import BuildConfig

        fin = self._finalize_metrics
        d = BuildConfig()
        cf = fin.get("copy_fields")
        return BuildConfig(
            segment_size=int(fin.get("segment_size", d.segment_size)),
            block_size=int(fin.get("block_size", d.block_size)),
            n_term_buckets=int(fin.get("n_term_buckets", d.n_term_buckets)),
            hot_df_threshold=int(fin.get("hot_df_threshold", d.hot_df_threshold)),
            hot_salts=int(fin.get("hot_salts", d.hot_salts)),
            build_id=build_id,
            store_positions=bool(fin.get("store_positions", d.store_positions)),
            copy_fields=tuple(cf) if cf else None,
            position_increment_gap=int(
                fin.get("position_increment_gap", d.position_increment_gap)
            ),
            analyzer=fin.get("analyzer", d.analyzer),
            text_col=fin.get("text_col", d.text_col),
        )

    def release(self) -> None:
        """Drop this handle's executor-side state: unpersist the filter
        cache's persisted DocSets and clear the driver-side DocList cache.
        Called on the SUPERSEDED handle after compact/merge returns a fresh
        one (otherwise the old handle's persisted blocks linger in the block
        manager until JVM exit)."""
        for _fq, (_repr, rows) in self._filter_cache.items():
            rows.unpersist()
        self._filter_cache.clear()
        for _f, gmap in self._gmap_cache.items():
            gmap.unpersist()
        self._gmap_cache.clear()
        self._result_cache.clear()

    def compact(self, config=None, prune_keep_versions: int | None = 2) -> "BM25Index":
        """I3/I5 compaction: rebuild the index from the LIVE stored docs --
        tombstones are applied permanently, df/avgdl/N recomputed, doc ids
        re-minted from the stable (conv_id, turn_idx) order (Lucene segment
        merge renumbers too). Returns a fresh handle.

        Copy-then-commit publish (object-store-safe): the new index is fully
        built into an immutable ``gen-<build_id>/`` subdirectory, then ONE
        conditional manifest commit flips the generation pointer
        (plans/manifest.publish_generation). No live directory is ever
        renamed; a racing compactor loses the conditional put and its
        generation is simply never referenced. Readers holding the old
        handle keep reading the old generation.

        When ``config`` is None the original build's config is reconstructed
        from the manifest -- compacting a text_en index stays text_en."""
        import shutil

        from ..index.build import build_index
        from ..plans.manifest import publish_generation

        live = self._anti_dead(self.docs())
        source_cols = [
            c for c in live.columns if c not in ("doc_id", "segment_id", "dl")
        ]
        src = live.select(*source_cols)
        from ..plans.manifest import _latest_version

        cfg = config or self._config_from_manifest("compact-1")
        # unique per publish attempt: repeated compacts with the same
        # build_id must never scribble over the LIVE generation's directory
        gen = f"gen-v{_latest_version(self.index_dir) + 1}-{cfg.build_id}"
        new_dir = os.path.join(self.index_dir, gen)
        shutil.rmtree(new_dir, ignore_errors=True)
        build_index(self.spark, src, new_dir, cfg)
        publish_generation(self.index_dir, gen)
        # this handle is superseded: free its persisted caches, and GC
        # generations no longer referenced by recent manifest versions
        # (each unpruned compaction would otherwise keep a full index copy
        # on disk forever). keep_versions=2 keeps the immediately-previous
        # generation for readers still holding the old manifest.
        self.release()
        if prune_keep_versions is not None:
            from ..plans.manifest import prune_generations

            prune_generations(self.index_dir, prune_keep_versions)
        return BM25Index(self.spark, self.index_dir)

    def _facet_base(
        self, query: str, fq, op: str, mm,
    ) -> DataFrame:
        """The docs-table rows behind a facet request: the EXACT filtered
        DocSet joined to stored fields (op/mm shape it identically to
        numFound on the same response); ``*:*`` is every live doc under fq
        (MatchAllDocsQuery), no postings touched."""
        if query.strip() == "*:*":
            return self._anti_dead(self._apply_fq(self.docs(), fq))
        matched = self._matched_ids(query, op=op, fq=fq, mm=mm)
        return matched.join(self.docs(), "doc_id")

    def facet(
        self, query: str, field: str, fq: str | list[str] | None = None,
        op: str = "OR", mm: int | str | None = None, *,
        prefix: str | None = None, contains: str | None = None,
        contains_ignore_case: bool = False, mincount: int = 0,
        limit: int = -1, offset: int = 0, sort: str | None = None,
    ) -> DataFrame:
        """Q5 over a result set: non-scoring facet counts on ``field`` over
        the EXACT match set (Solr facet.field facets the filtered DocSet,
        SolrAdminActions.java:233-245; limit -1 => all buckets) -- so
        ``q.op=AND`` and ``mm`` shape the counted set exactly as they shape
        numFound/docs on the same /select response.

        Solr bucket params, all applied INSIDE the plan (a facet on a
        high-cardinality field returns ``limit`` rows to the driver, never
        the bucket universe):

        - ``prefix``: keep buckets whose (string) value starts with it
        - ``mincount``: drop buckets with fewer docs
        - ``sort``: ``"count"`` (count desc, value asc tie-break) or
          ``"index"`` (value asc); Solr's default rule = count when
          ``limit`` > 0 else index; None with limit -1 keeps the unordered
          aggregate (callers that re-sort themselves pay no extra sort)
        - ``limit``/``offset``: bucket-list slice; limit -1 = unlimited

        Null field values never form a bucket (Solr: the missing count is
        a separate ``facet.missing`` entry -- :meth:`facet_missing_count`).

        Plan: pruned postings scan -> distinct matched doc ids (small) ->
        join to the docs table -> groupBy(field).count() -> bucket filters
        -> orderBy+limit (TakeOrderedAndProject when collected).
        """
        base = self._facet_base(query, fq, op, mm).filter(
            F.col(field).isNotNull()
        )
        if prefix is not None:
            base = base.filter(F.col(field).cast("string").startswith(prefix))
        if contains is not None:
            # facet.contains / facet.contains.ignoreCase (Solr bucket
            # filter): substring match on the bucket VALUE, applied before
            # the aggregate like prefix so filtered buckets never count
            s = F.col(field).cast("string")
            if contains_ignore_case:
                base = base.filter(
                    F.lower(s).contains(str(contains).lower())
                )
            else:
                base = base.filter(s.contains(contains))
        out = base.groupBy(field).agg(F.count("*").alias("facet_count"))
        if mincount > 0:
            out = out.filter(F.col("facet_count") >= mincount)
        if sort is None and limit >= 0:
            sort = "count"  # Solr: limit>0 defaults to count order
        if sort == "count":
            out = out.orderBy(
                F.col("facet_count").desc(), F.col(field).asc()
            )
        elif sort == "index":
            out = out.orderBy(F.col(field).asc())
        elif sort is not None:
            raise ValueError(f"facet.sort must be count|index, got {sort!r}")
        if offset:
            out = out.offset(offset)
        return out.limit(limit) if limit >= 0 else out

    def facet_intervals(
        self, query: str, field: str, sets: list[str],
        fq: str | list[str] | None = None,
        op: str = "OR", mm: int | str | None = None,
    ) -> dict[str, int]:
        """Solr interval faceting (``facet.interval`` +
        ``f.<field>.facet.interval.set``): arbitrary user intervals in
        Solr's bracket syntax -- ``[a,b]`` inclusive, ``(a,b)`` exclusive,
        ``*`` unbounded -- counted over the exact match set. ALL intervals
        ride ONE aggregation job as conditional counts (Solr computes them
        in one DocValues sweep; overlapping intervals are allowed and each
        doc counts in every interval it falls in)."""
        conds = []
        for s in sets:
            m = re.match(
                r"^\s*([\[\(])\s*(\*|-?\d+(?:\.\d+)?)\s*,"
                r"\s*(\*|-?\d+(?:\.\d+)?)\s*([\]\)])\s*$", s
            )
            if m is None:
                raise ValueError(
                    f"facet.interval.set {s!r}: use [a,b] / (a,b) / * bounds"
                )
            lbr, lo, hi, rbr = m.groups()
            c = F.col(field).isNotNull()
            if lo != "*":
                c = c & (F.col(field) >= float(lo) if lbr == "["
                         else F.col(field) > float(lo))
            if hi != "*":
                c = c & (F.col(field) <= float(hi) if rbr == "]"
                         else F.col(field) < float(hi))
            conds.append((s, c))
        base = self._facet_base(query, fq, op, mm)
        row = base.agg(
            *[F.count(F.when(c, 1)).alias(f"__i{i}")
              for i, (_, c) in enumerate(conds)]
        ).collect()[0]
        return {s: int(row[f"__i{i}"]) for i, (s, _) in enumerate(conds)}

    def pivot_facet(
        self, query: str, fields: list[str],
        fq: str | list[str] | None = None,
        op: str = "OR", mm: int | str | None = None, *,
        limit: int = 100, mincount: int = 1,
    ) -> list[dict]:
        """Solr ``facet.pivot=f1,f2[,f3]``: hierarchical value counts over
        the exact match set. Returns Solr's nested pivot shape --
        ``[{field, value, count, pivot: [...]}, ...]`` -- each level
        ordered count desc, value asc (Solr's default pivot sort), cut to
        ``limit`` buckets per parent, ``mincount`` (Solr pivot default 1)
        applied per level. Null values never form a pivot bucket.

        Plan: the DocSet joins the docs projection of EXACTLY the pivot
        fields, then ONE groupBy over all of them (a single shuffle;
        deeper levels re-aggregate that cached frame with map-side partial
        aggs, no second scan). Each level's bucket list is cut INSIDE the
        plan -- level 1 by orderBy+limit (TakeOrderedAndProject), deeper
        levels by a row_number window per parent path -- so the rows
        collected are bounded by prod(limit per level), never the value
        universe. (Solr pivots have the same product blowup; keep depth
        and limits modest -- that's the documented contract, not ours.)"""
        if not fields:
            raise ValueError("facet.pivot needs at least one field")
        from pyspark.sql.window import Window

        base = self._facet_base(query, fq, op, mm)
        counts = (
            base.select(*fields)
            .groupBy(*fields)
            .agg(F.count("*").alias("cnt"))
            .persist()
        )
        levels: list[list] = []
        parents = None  # surviving parent paths (DataFrame of fields[:d-1])
        for d in range(1, len(fields) + 1):
            # a null at THIS level never buckets, but must not remove the
            # doc from shallower levels (Solr: each level drops only its
            # own nulls) -- so nulls stay in `counts` and filter per level
            lvl = (
                counts.filter(F.col(fields[d - 1]).isNotNull())
                .groupBy(*fields[:d]).agg(F.sum("cnt").alias("c"))
            )
            if mincount > 0:
                lvl = lvl.filter(F.col("c") >= mincount)
            if d == 1:
                top = lvl.orderBy(
                    F.col("c").desc(), F.col(fields[0]).asc()
                ).limit(limit) if limit >= 0 else lvl.orderBy(
                    F.col("c").desc(), F.col(fields[0]).asc()
                )
            else:
                lvl = lvl.join(
                    F.broadcast(parents), list(fields[: d - 1]), "left_semi"
                )
                w = Window.partitionBy(*fields[: d - 1]).orderBy(
                    F.col("c").desc(), F.col(fields[d - 1]).asc()
                )
                top = lvl.withColumn("r", F.row_number().over(w))
                if limit >= 0:
                    top = top.filter(F.col("r") <= limit)
                top = top.drop("r")
            rows = top.collect()
            levels.append(rows)
            parents = self.spark.createDataFrame(
                [[r[f] for f in fields[:d]] for r in rows] or
                [[None] * d],
                list(fields[:d]),
            ) if rows else None
            if parents is None:
                break
        counts.unpersist()

        # group each level's rows by parent path once -- linear assembly
        by_parent: list[dict[tuple, list]] = []
        for d, rows in enumerate(levels):
            g: dict[tuple, list] = {}
            for r in rows:
                g.setdefault(tuple(r[f] for f in fields[:d]), []).append(r)
            for lst in g.values():  # collect() does not preserve plan order
                lst.sort(key=lambda r: (-r["c"], r[fields[d]]))
            by_parent.append(g)

        def build(depth: int, path: tuple) -> list[dict]:
            if depth >= len(by_parent):
                return []
            out = []
            for r in by_parent[depth].get(path, []):
                ent = {
                    "field": fields[depth],
                    "value": r[fields[depth]],
                    "count": int(r["c"]),
                }
                sub = build(depth + 1, path + (r[fields[depth]],))
                if sub:
                    ent["pivot"] = sub
                out.append(ent)
            return out

        return build(0, ())

    def facet_missing_count(
        self, query: str, field: str, fq: str | list[str] | None = None,
        op: str = "OR", mm: int | str | None = None,
    ) -> int:
        """Solr ``facet.missing``: the count of match-set docs with NO value
        for ``field`` -- reported as a separate trailing entry, never as a
        bucket. One partial-agg count job over the same DocSet plan as
        :meth:`facet`."""
        return (
            self._facet_base(query, fq, op, mm)
            .filter(F.col(field).isNull())
            .count()
        )

    def facet_query_count(
        self, query: str, facet_query: str | list[str],
        fq: str | list[str] | None = None,
        op: str = "OR", mm: int | str | None = None,
    ) -> int:
        """Solr ``facet.query``: how many docs of the main query's DocSet
        also satisfy ``facet_query`` (Solr/Lucene filter syntax, the same
        grammar fq accepts). Counting the intersection IS counting with the
        facet query appended as one more fq -- so it rides the filterCache:
        a repeated facet.query never re-scans the docs table."""
        extra = (
            tuple(facet_query) if isinstance(facet_query, (list, tuple))
            else (facet_query,)
        )
        base = self._norm_fq(fq)
        base = () if base is None else (base,) if isinstance(base, str) else base
        return self.count_matches(query, op=op, fq=base + extra, mm=mm)

    def facet_range(
        self,
        query: str,
        field: str,
        start: float,
        end: float,
        gap: float,
        fq: str | list[str] | None = None,
        op: str = "OR",
        mm: int | str | None = None,
        upper_incl: bool = False,
        hardend: bool = False,
    ) -> DataFrame:
        """Solr facet.range over a numeric field. Default (``include=
        lower``): half-open buckets [start+i*gap, start+(i+1)*gap);
        ``upper_incl`` (Solr ``facet.range.include=upper``) flips every
        bucket to (lo, hi] — a value ON a boundary belongs to the bucket
        BELOW it, and a value equal to ``start`` belongs to ``before``.
        ``hardend`` truncates the LAST bucket at ``end``; the Solr
        default (false) extends it to a whole gap (RangeEndpointCalculator
        semantics — no difference when end-start is a gap multiple).
        Values outside the covered span are ignored (facet.range.other=
        none default). Returns (bucket_start, facet_count) for NON-EMPTY
        buckets only -- the driver-side facade fills zero buckets (bucket
        count is ceil((end-start)/gap), a response-sized constant, never
        data-sized).

        Plan shape matches :meth:`facet`: matched ids (or the live fq'd
        scan for ``*:*``) -> one groupBy on the computed bucket key --
        a single partial-agg shuffle of at most n_buckets rows per task."""
        if gap <= 0 or end <= start:
            raise ValueError("facet.range needs gap > 0 and end > start")
        n_buckets = int(-(-(end - start) // gap))
        f_end = end if hardend else start + n_buckets * gap
        x = F.col(field).cast("double")
        if upper_incl:
            # (lo, hi]: boundary values map to the bucket below
            idx_expr = F.ceil((x - start) / gap) - 1
            span = (x > start) & (x <= f_end)
        else:
            idx_expr = F.floor((x - start) / gap)
            span = (x >= start) & (x < f_end)
        # clamp the extended last bucket onto the final reported start
        idx_expr = F.least(idx_expr, F.lit(n_buckets - 1))
        bucket = (F.lit(start) + idx_expr * gap).alias("bucket_start")
        if query.strip() == "*:*":
            base = self._anti_dead(self._apply_fq(self.docs(), fq))
        else:
            # the exact filtered DocSet -- op/mm respected like facet()
            matched = self._matched_ids(query, op=op, fq=fq, mm=mm)
            base = matched.join(self.docs(), "doc_id")
        return (
            base.filter(span)
            .groupBy(bucket)
            .agg(F.count("*").alias("facet_count"))
        )

    def facet_range_buckets(
        self,
        query: str,
        field: str,
        starts: list[float],
        end: float,
        fq: str | list[str] | None = None,
        op: str = "OR",
        mm: int | str | None = None,
        upper_incl: bool = False,
    ) -> DataFrame:
        """:meth:`facet_range` for NON-UNIFORM boundaries (variable-width
        DateMath gaps: +1MONTH / +1YEAR). ``starts`` are the bucket start
        epochs (ascending), ``end`` the final exclusive boundary (the
        caller clamps it to the raw end under ``hardend``). Bucket
        assignment = largest boundary <= value (STRICTLY below under
        ``include=upper``, where every bucket is (lo, hi]), compiled to
        ONE codegen expression over the literal boundary array — the plan
        keeps the exact shape of the fixed-width path (filter -> one
        groupBy partial-agg shuffle of at most n_buckets rows per
        task)."""
        if not starts or end <= starts[0]:
            raise ValueError("facet_range_buckets needs boundaries and "
                             "end > starts[0]")
        x = F.col(field).cast("double")
        arr = F.array(*[F.lit(float(b)) for b in starts])
        if upper_incl:
            key = F.array_max(F.filter(arr, lambda b: b < x))
            span = (x > starts[0]) & (x <= end)
        else:
            key = F.array_max(F.filter(arr, lambda b: b <= x))
            span = (x >= starts[0]) & (x < end)
        bucket = key.alias("bucket_start")
        if query.strip() == "*:*":
            base = self._anti_dead(self._apply_fq(self.docs(), fq))
        else:
            matched = self._matched_ids(query, op=op, fq=fq, mm=mm)
            base = matched.join(self.docs(), "doc_id")
        return (
            base.filter(span)
            .groupBy(bucket)
            .agg(F.count("*").alias("facet_count"))
        )

    def facet_range_other(
        self,
        query: str,
        field: str,
        start: float,
        end: float,
        fq: str | list[str] | None = None,
        op: str = "OR",
        mm: int | str | None = None,
        upper_incl: bool = False,
    ) -> tuple[int, int, int]:
        """Solr ``facet.range.other``: the (before, between, after) counts
        relative to [start, end) over the same DocSet as
        :meth:`facet_range` -- before = value < start, after = value >=
        end, between = inside the range (Solr's RangeEndpointCalculator
        semantics; nulls count nowhere). Under ``include=upper`` the
        endpoint membership flips per the spec: before takes ``start``
        itself, after excludes ``end``. ONE conditional-aggregate job, a
        3-value row, regardless of corpus size."""
        x = F.col(field).cast("double")
        if upper_incl:
            before_c, between_c, after_c = (
                x <= start, (x > start) & (x <= end), x > end,
            )
        else:
            before_c, between_c, after_c = (
                x < start, (x >= start) & (x < end), x >= end,
            )
        row = (
            self._facet_base(query, fq, op, mm)
            .agg(
                F.sum(before_c.cast("long")).alias("before"),
                F.sum(between_c.cast("long")).alias("between"),
                F.sum(after_c.cast("long")).alias("after"),
            )
            .collect()[0]
        )
        return (
            int(row["before"] or 0),
            int(row["between"] or 0),
            int(row["after"] or 0),
        )

    HEATMAP_MAX_CELLS = 100_000  # Solr HeatmapFacetCounter.maxRows guard

    def facet_heatmap(
        self,
        query: str,
        sfield: str,
        grid_level: int | None = None,
        dist_err: float | None = None,
        geom: tuple[float, float, float, float] | None = None,
        fq: str | list[str] | None = None,
        op: str = "OR",
        mm: int | str | None = None,
    ) -> dict:
        """Solr ``facet.heatmap`` (HeatmapFacetCounter over the spatial
        RPT grid): 2D grid counts of the main query's exact DocSet over a
        lat/lon point field -- the Admin-UI / clustering heatmap shape.

        Spatial field convention matches :mod:`..functions.geo` (the
        configset's PointType dimension subfields,
        default-base-config/managed-schema.xml:521-536): ``sfield`` F maps
        to doc columns ``F_lat`` / ``F_lon``.

        Grid model: at ``grid_level`` g the world (lon [-180,180], lat
        [-90,90]) divides into 2^g x 2^g equal cells (the quad-tree level-g
        leaves Solr's RPT heatmap counts). ``dist_err`` (degrees) picks the
        smallest level whose cell height <= dist_err (Solr derives the
        level from distErr the same way through the prefix tree).
        ``geom`` = (minLon, minLat, maxLon, maxLat) bounding box, snapped
        OUTWARD to cell boundaries exactly like Solr snaps the heatmap
        region to the grid; default = the whole world.

        Response dict carries Solr's keys: gridLevel, columns, rows,
        minX/maxX/minY/maxY (the SNAPPED box) and ``counts_ints2D`` --
        rows ordered north->south, each a list of ints, with all-zero rows
        emitted as ``None`` (Solr emits JSON null to keep sparse payloads
        small).

        Plan shape: exact DocSet -> one codegen projection to (row, col)
        -> ONE groupBy count whose result is bounded by rows*columns
        (capped at HEATMAP_MAX_CELLS like Solr's maxCells guard), never by
        corpus size -- the only driver-side materialization is the grid."""
        lat_c, lon_c = f"{sfield}_lat", f"{sfield}_lon"
        cols = set(self.docs().columns)
        if lat_c not in cols or lon_c not in cols:
            raise ValueError(
                f"facet.heatmap: unknown spatial field {sfield!r} "
                f"(needs doc columns {lat_c}/{lon_c})"
            )
        if grid_level is None:
            if dist_err is None or dist_err <= 0:
                raise ValueError(
                    "facet.heatmap needs facet.heatmap.gridLevel or a "
                    "positive facet.heatmap.distErr (degrees)"
                )
            grid_level = 1
            while 180.0 / (1 << grid_level) > dist_err and grid_level < 26:
                grid_level += 1
        g = int(grid_level)
        if not (1 <= g <= 26):
            raise ValueError(f"facet.heatmap.gridLevel out of range: {g}")
        w = 360.0 / (1 << g)
        h = 180.0 / (1 << g)
        min_x, min_y, max_x, max_y = geom if geom else (-180.0, -90.0, 180.0, 90.0)
        if not (max_x > min_x and max_y > min_y):
            raise ValueError(f"facet.heatmap.geom is empty: {geom}")
        # snap outward to grid-cell boundaries (Solr expands the heatmap
        # region to whole cells of the chosen level)
        sx0 = -180.0 + math.floor((min_x + 180.0) / w) * w
        sx1 = -180.0 + math.ceil((max_x + 180.0) / w) * w
        sy0 = -90.0 + math.floor((min_y + 90.0) / h) * h
        sy1 = -90.0 + math.ceil((max_y + 90.0) / h) * h
        columns = int(round((sx1 - sx0) / w))
        rows = int(round((sy1 - sy0) / h))
        if rows * columns > self.HEATMAP_MAX_CELLS:
            raise ValueError(
                f"facet.heatmap: {rows}x{columns} cells exceeds "
                f"{self.HEATMAP_MAX_CELLS} (raise gridLevel coarser or "
                f"shrink geom)"
            )
        lat = F.col(lat_c).cast("double")
        lon = F.col(lon_c).cast("double")
        base = self._facet_base(query, fq, op, mm).filter(
            (lon >= sx0) & (lon < sx1) & (lat >= sy0) & (lat < sy1)
        )
        # row 0 = the NORTHMOST band (Solr renders counts_ints2D top-down)
        cell = base.select(
            F.floor((F.lit(sy1) - lat) / h).cast("int").alias("ry"),
            F.floor((lon - sx0) / w).cast("int").alias("cx"),
        )
        counts = (
            cell.groupBy("ry", "cx").agg(F.count("*").alias("c")).collect()
        )
        grid: list[list[int] | None] = [None] * rows
        for r in counts:
            ry, cx = int(r["ry"]), int(r["cx"])
            if grid[ry] is None:
                grid[ry] = [0] * columns
            grid[ry][cx] = int(r["c"])
        return {
            "gridLevel": g,
            "columns": columns,
            "rows": rows,
            "minX": sx0,
            "maxX": sx1,
            "minY": sy0,
            "maxY": sy1,
            "counts_ints2D": grid,
        }

    # -- dense-vector KNN ({!knn} qparser, Solr 9) ------------------------------

    def knn(
        self,
        field: str,
        query_vec: list[float],
        top_k: int = 10,
        fq: str | list[str] | None = None,
    ) -> DataFrame:
        """Solr 9 ``{!knn f=field topK=N}[v,...]`` semantics: the topK live
        docs by cosine similarity of a stored ``array<float>`` column
        (DenseVectorField's default similarity), fq applied as a
        PRE-filter (Solr 9.1 default: filters restrict the candidate set
        before the vector search, they don't post-trim the topK).

        Exact brute force in ONE codegen pass over the (filtered) doc
        scan + TakeOrderedAndProject — results are exact where Solr's
        HNSW graph is approximate, so top-k parity holds by construction.
        The scale path for 10^9-vector corpora is the partitioned ANN
        family (`operators/similarity.py` multi-probe LSH / IVF,
        `operators/hnsw.py`) — this method is the rank-oracle the /select
        facade serves, cost one scan of the fq-filtered live set.
        """
        from ..operators.similarity import cosine_sim

        f = self.docs().schema
        if field not in f.names:
            raise ValueError(f"knn: unknown field {field!r}")
        dt = f[field].dataType
        import pyspark.sql.types as _T

        if not (isinstance(dt, _T.ArrayType)
                and isinstance(dt.elementType, (_T.FloatType, _T.DoubleType))):
            raise ValueError(
                f"knn: field {field!r} is {dt.simpleString()}, expected "
                "array<float> (DenseVectorField analog)"
            )
        if not query_vec:
            raise ValueError("knn: empty query vector")
        if top_k <= 0:
            raise ValueError(f"knn: topK must be positive, got {top_k}")
        q = F.array(*[F.lit(float(x)) for x in query_vec])
        base = self._anti_dead(self._apply_fq(self.docs(), fq))
        return (
            base.filter(F.col(field).isNotNull())
            .select(
                "doc_id",
                F.round(cosine_sim(F.col(field), q), 6).alias("score"),
            )
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(top_k)
        )

    # -- phrase queries (positional index) -------------------------------------

    _PHRASE_Q_RE = re.compile(r'^\s*"(?P<phrase>[^"]*)"(?:~(?P<slop>\d+))?\s*$')

    @classmethod
    def parse_phrase_q(cls, query: str) -> tuple[str, int] | None:
        """Solr/Lucene phrase syntax in ``q``: a query that is EXACTLY one
        quoted string, optionally with a ``~N`` slop suffix (``"a b"``,
        ``"a b"~2``). Returns (phrase_text, slop) or None for non-phrase
        queries. Mixed term+phrase queries are not parsed (the facade's
        term path would mis-score them as bag-of-words; callers compose
        explicitly via search_phrase + search)."""
        m = cls._PHRASE_Q_RE.match(query)
        if m is None:
            return None
        return m.group("phrase"), int(m.group("slop") or 0)

    _MIXED_TOKEN_RE = re.compile(
        r'[+-]?"[^"]*"(?:~\d+)?(?:\^\d+(?:\.\d+)?)?'  # quoted phrase clause
        r"|[+-]?[A-Za-z_][\w.]*:\[[^\]]*\]"           # field range clause
        r"|\S+"
    )
    _FIELD_CLAUSE_RE = re.compile(r"^(?P<f>[A-Za-z_][\w.]*):\S")
    _FUZZY_CLAUSE_RE = re.compile(
        r"^(?P<t>[^\s~^:]+)~(?P<n>[012])?(?:\^(?P<b>\d+(?:\.\d+)?))?$"
    )
    _WILDCARD_CLAUSE_RE = re.compile(
        r"^(?P<p>[^\s^:]*[*?][^\s^:]*)(?:\^(?P<b>\d+(?:\.\d+)?))?$"
    )
    _PHRASE_CLAUSE_RE = re.compile(
        r'^"(?P<p>[^"]*)"(?:~(?P<slop>\d+))?'
        r'(?:\^(?P<boost>\d+(?:\.\d+)?))?$'
    )

    _BOOL_OPS = frozenset(("AND", "OR", "NOT", "&&", "||"))

    def _rewrite_boolean_operators(
        self, query: str, op: str = "OR"
    ) -> str | None:
        """Lucene standard-parser boolean KEYWORDS in ``q`` (``a AND b``,
        ``x OR NOT y``, ``&&``/``||``; case-sensitive, so lowercase
        ``and`` stays a term): resolved to the occur-prefix clause syntax
        (``+``/``-``) with QueryParserBase.addClause's exact algorithm --
        including its q.op interplay (under q.op=AND an ``OR`` demotes
        BOTH neighbours to SHOULD; a clause after ``AND`` retroactively
        upgrades its left neighbour to MUST unless prohibited). The
        returned string carries FINAL occurs, so callers evaluate it with
        op='OR' (no second promotion). Returns None when the query has no
        keyword operators (quoted phrases may contain AND/OR/NOT as
        words). Parenthesized groups fail loud rather than silently
        flattening; dangling/duplicate operators raise like Lucene's
        ParseException."""
        toks = self._MIXED_TOKEN_RE.findall(query)
        if not any(t in self._BOOL_OPS for t in toks):
            return None
        if "(" in query or ")" in query:
            raise ValueError(
                f"parenthesized boolean groups are unsupported in q: "
                f"{query!r} (flat AND/OR/NOT only)"
            )
        out: list[list[str]] = []  # [occur_prefix, clause_token]
        conj = 0  # 0 none, 1 AND, 2 OR
        mods = 0  # 0 none, 1 required (+), 2 prohibited (-/NOT)
        for tok in toks:
            if tok in ("AND", "&&") or tok in ("OR", "||"):
                if not out or conj:
                    raise ValueError(
                        f"misplaced boolean operator {tok!r} in q: {query!r}"
                    )
                conj = 1 if tok in ("AND", "&&") else 2
                continue
            if tok == "NOT":
                if mods:
                    raise ValueError(
                        f"duplicate modifier before clause in q: {query!r}"
                    )
                mods = 2
                continue
            if tok[:1] in "+-" and len(tok) > 1:
                if mods:
                    raise ValueError(
                        f"duplicate modifier before clause in q: {query!r}"
                    )
                mods = 1 if tok[0] == "+" else 2
                tok = tok[1:]
            # retroactive fixups on the previous clause (addClause)
            if out and conj == 1 and out[-1][0] != "-":
                out[-1][0] = "+"
            if out and op == "AND" and conj == 2 and out[-1][0] != "-":
                out[-1][0] = ""
            prohibited = mods == 2
            if op == "AND":
                required = (not prohibited) and conj != 2
            else:
                required = mods == 1 or (conj == 1 and not prohibited)
            out.append(["-" if prohibited else ("+" if required else ""),
                        tok])
            conj = 0
            mods = 0
        if conj or mods:
            raise ValueError(f"dangling boolean operator in q: {query!r}")
        return " ".join(p + t for p, t in out)

    def parse_boolean_q(
        self, query: str, op: str = "OR"
    ) -> list[tuple] | None:
        """Lucene boolean-occur query parse: whitespace clauses, each a bare
        term or quoted phrase (``~slop``/``^boost`` suffixes) with an
        optional ``+`` (MUST) / ``-`` (MUST_NOT) prefix (Lucene standard
        parser occur operators; an unprefixed clause is SHOULD).

        Returns a clause list [(occur, spec)] with occur in
        {'SHOULD','MUST','MUST_NOT'} and spec = ('term', t, boost) or
        ('phrase', text, slop, boost) -- or None when the query is PLAIN
        (no phrases, no occur prefixes), so pure positive term queries keep
        the WAND fast path. A term clause's surface text may analyze to
        several tokens; each becomes its own clause with the surface
        clause's occur + boost (same rule as parse_boosted_query).
        Duplicate (occur, term) clauses keep the larger boost. A leading
        ``-``/``+`` is ALWAYS an operator (quote a literal leading
        hyphen); interior hyphens (``wi-fi``) are plain text.

        A ``field:value`` clause whose field is a stored docs column
        (``role:assistant``, ``-tool:*``, ``turn_idx:[0 TO 3]`` -- the fq
        grammar, functions/solr_fq.py) becomes a ('filter', fq_string)
        spec: it constrains the DocSet exactly like Solr's lucene parser
        and contributes a CONSTANT score of 1.0 when matched (documented
        deviation: Solr scores ``field:term`` with that field's own BM25;
        this engine indexes the ``_text_`` catch-all only, so metadata
        clauses filter with ConstantScore semantics -- numFound, facets
        and every DocSet-derived component are identical). A ``field:``
        prefix naming no stored column falls through to term analysis.

        Multi-term clauses (Lucene standard-parser syntax; the reference's
        queries route through Solr's lucene QParser): ``tabl*`` / ``t?ble``
        → ('wildcard', pattern, boost) scored with Lucene's default
        CONSTANT_SCORE_REWRITE; ``table~`` / ``table~1`` → ('fuzzy', term,
        max_edits, boost) with maxEdits defaulting to 2 (FuzzyQuery
        defaults, expansion capped at 50 terms like FuzzyTermsEnum).

        Boolean KEYWORDS (``a AND b``, ``x OR NOT y``, ``&&``/``||``) are
        resolved first via ``_rewrite_boolean_operators`` -- the returned
        clauses then carry FINAL occurs with ``op`` already applied
        (Lucene bakes q.op into occur flags at parse time), so callers
        evaluate them with boolean_matches(op='OR'). The same promotion
        applies to prefix-syntax clauses when ``op='AND'`` is passed.

        PARENTHESIZED GROUPS (``(a OR b) AND c``, ``+(x y)^2``) route to
        the recursive grouped parser (:meth:`_parse_grouped_q`); a group
        becomes a ('group', subclauses, boost) spec evaluated as a nested
        Lucene BooleanQuery (score = boost * sum of matching subclause
        scores). Parens inside quoted phrases stay literal text."""
        if ("(" in query or ")" in query) and self._has_unquoted_paren(query):
            return self._parse_grouped_q(query, op)
        rw = self._rewrite_boolean_operators(query, op)
        if rw is not None:
            cl = self.parse_boolean_q(rw)
            if cl is None:
                # the rewrite degenerated to plain SHOULD terms (`a OR b`)
                cl = [("SHOULD", ("term", t, 1.0))
                      for t in self.analyze_query(rw)]
            return cl
        if ('"' not in query and "+" not in query and "-" not in query
                and ":" not in query and "*" not in query
                and "?" not in query and "~" not in query):
            return None
        clauses: list[tuple] = []
        seen_terms: dict[tuple[str, str], int] = {}
        structured = False
        for tok in self._MIXED_TOKEN_RE.findall(query):
            occur = "SHOULD"
            if tok[:1] in "+-" and len(tok) > 1:
                occur = "MUST" if tok[0] == "+" else "MUST_NOT"
                structured = True
                tok = tok[1:]
            m = self._PHRASE_CLAUSE_RE.match(tok)
            if m is not None:
                structured = True
                clauses.append((
                    occur,
                    ("phrase", m.group("p"), int(m.group("slop") or 0),
                     float(m.group("boost") or 1.0)),
                ))
                continue
            fm = self._FIELD_CLAUSE_RE.match(tok)
            if fm is not None and fm.group("f") in self._doc_columns():
                structured = True
                clauses.append((occur, ("filter", tok)))
                continue
            wm = self._WILDCARD_CLAUSE_RE.match(tok)
            if wm is not None:
                structured = True
                clauses.append((
                    occur,
                    ("wildcard", wm.group("p"), float(wm.group("b") or 1.0)),
                ))
                continue
            zm = self._FUZZY_CLAUSE_RE.match(tok)
            if zm is not None:
                structured = True
                n = zm.group("n")
                clauses.append((
                    occur,
                    ("fuzzy", zm.group("t"), 2 if n is None else int(n),
                     float(zm.group("b") or 1.0)),
                ))
                continue
            bm = self._BOOST_RE.search(tok)
            b = float(bm.group(1)) if bm else 1.0
            text = tok[: bm.start()] if bm else tok
            for t in self.analyze_query(text):
                key = (occur, t)
                if key in seen_terms:
                    i = seen_terms[key]
                    old = clauses[i]
                    clauses[i] = (occur, ("term", t, max(old[1][2], b)))
                else:
                    seen_terms[key] = len(clauses)
                    clauses.append((occur, ("term", t, b)))
        if not (structured and clauses):
            return None
        if op == "AND":
            # bake q.op into occurs (Lucene does this at parse time);
            # callers then evaluate with boolean_matches(op='OR')
            clauses = [("MUST" if oc == "SHOULD" else oc, sp)
                       for oc, sp in clauses]
        return clauses

    # -- parenthesized boolean groups (Lucene standard-parser grouping) ------

    @staticmethod
    def _has_unquoted_paren(query: str) -> bool:
        """True when ``(`` or ``)`` appears outside a quoted phrase."""
        in_q = False
        for c in query:
            if c == '"':
                in_q = not in_q
            elif c in "()" and not in_q:
                return True
        return False

    _GROUP_CLOSE_RE = re.compile(r"\)(?:\^(\d+(?:\.\d+)?))?")
    _RANGE_TOKEN_RE = re.compile(r"[+-]?[A-Za-z_][\w.]*:\[[^\]]*\]")
    _PHRASE_TOKEN_RE = re.compile(
        r'[+-]?"[^"]*"(?:~\d+)?(?:\^\d+(?:\.\d+)?)?'
    )

    @classmethod
    def _tokenize_grouped(cls, query: str) -> list[tuple]:
        """Paren-aware token stream for the grouped parser. Emits typed
        tokens: ``('(', prefix)`` with prefix in ``{'', '+', '-'}``
        (``+(``/``-(`` occur operators), ``(')', boost)`` (a ``)^B``
        suffix binds to the group), and ``('tok', text)`` for everything
        else -- quoted phrases (parens inside stay literal) and
        ``field:[a TO b]`` ranges consumed whole, all other runs split at
        whitespace and parens."""
        out: list[tuple] = []
        i, n = 0, len(query)
        while i < n:
            c = query[i]
            if c.isspace():
                i += 1
                continue
            if c in "+-" and i + 1 < n and query[i + 1] == "(":
                out.append(("(", c))
                i += 2
                continue
            if c == "(":
                out.append(("(", ""))
                i += 1
                continue
            if c == ")":
                m = cls._GROUP_CLOSE_RE.match(query, i)
                out.append((")", float(m.group(1) or 1.0)))
                i = m.end()
                continue
            m = cls._PHRASE_TOKEN_RE.match(query, i)
            if m is None:
                m = cls._RANGE_TOKEN_RE.match(query, i)
            if m is not None:
                out.append(("tok", m.group(0)))
                i = m.end()
                continue
            j = i
            while j < n and not query[j].isspace() and query[j] not in "()":
                j += 1
            out.append(("tok", query[i:j]))
            i = j
        return out

    def _atom_specs(self, tok: str) -> list[tuple]:
        """Clause spec(s) for ONE prefix-stripped token -- the same cascade
        the flat parser applies (phrase -> stored-field filter -> wildcard
        -> fuzzy -> analyzed term(s), the last possibly several specs)."""
        m = self._PHRASE_CLAUSE_RE.match(tok)
        if m is not None:
            return [("phrase", m.group("p"), int(m.group("slop") or 0),
                     float(m.group("boost") or 1.0))]
        fm = self._FIELD_CLAUSE_RE.match(tok)
        if fm is not None and fm.group("f") in self._doc_columns():
            return [("filter", tok)]
        wm = self._WILDCARD_CLAUSE_RE.match(tok)
        if wm is not None:
            return [("wildcard", wm.group("p"), float(wm.group("b") or 1.0))]
        zm = self._FUZZY_CLAUSE_RE.match(tok)
        if zm is not None:
            n = zm.group("n")
            return [("fuzzy", zm.group("t"), 2 if n is None else int(n),
                     float(zm.group("b") or 1.0))]
        bm = self._BOOST_RE.search(tok)
        b = float(bm.group(1)) if bm else 1.0
        text = tok[: bm.start()] if bm else tok
        return [("term", t, b) for t in self.analyze_query(text)]

    @staticmethod
    def _boost_spec(sp: tuple, boost: float) -> tuple:
        """Multiply a clause spec's boost (single-clause group unwrap --
        Lucene's BooleanQuery single-SHOULD rewrite). 'filter' specs carry
        no boost field; callers keep those wrapped when boost != 1."""
        kind = sp[0]
        if kind == "term":
            return ("term", sp[1], sp[2] * boost)
        if kind == "phrase":
            return ("phrase", sp[1], sp[2], sp[3] * boost)
        if kind == "wildcard":
            return ("wildcard", sp[1], sp[2] * boost)
        if kind == "fuzzy":
            return ("fuzzy", sp[1], sp[2], sp[3] * boost)
        if kind == "group":
            return ("group", sp[1], sp[2] * boost)
        raise ValueError(f"unboostable clause kind: {kind!r}")

    def _parse_grouped_q(self, query: str, op: str = "OR") -> list[tuple]:
        """Recursive Lucene standard-parser grouping: ``(a OR b) AND c``,
        ``+(x y)^2 -(p "q r")``. Each nesting level runs the SAME
        addClause occur algorithm as the flat rewrite (q.op applies at
        every level -- the parser's default operator is global), so the
        returned clauses carry FINAL occurs; callers evaluate with
        boolean_matches(op='OR'). A multi-clause group becomes a
        ('group', subclauses, boost) spec -- a nested BooleanQuery scoring
        boost * sum(matching subclause scores); a single-clause group
        unwraps to its clause with boosts multiplied (Lucene's
        single-SHOULD-clause rewrite) unless the clause is MUST_NOT
        (``(-a)`` matches nothing in Lucene -- kept as a group) or an
        unboostable filter under boost != 1. Unbalanced parens, empty
        groups, field-scoped groups (``f:(a b)``), and dangling operators
        raise like Lucene's ParseException."""
        toks = self._tokenize_grouped(query)
        clauses, i, _ = self._parse_bool_level(toks, 0, op, query)
        if i != len(toks):
            raise ValueError(f"unbalanced ')' in q: {query!r}")
        if not clauses:
            raise ValueError(f"empty boolean query: {query!r}")
        return clauses

    def _parse_bool_level(
        self, toks: list[tuple], i: int, op: str, query: str
    ) -> tuple[list[tuple], int, bool]:
        """One nesting level: consume tokens until a ``)`` (returned
        unconsumed position points AT the close for the caller to read its
        boost) or end of stream. Returns (clauses, next_index, saw_atoms --
        whether ANY clause token appeared, so a group whose every clause
        analyzed away (``(the)``) drops like Lucene's null-query clause
        while a syntactically empty ``()`` still raises)."""
        clauses: list[list] = []  # [occur, spec], occur fixed up in place
        seen_terms: dict[tuple[str, str], int] = {}
        conj = 0  # 0 none, 1 AND, 2 OR
        mods = 0  # 0 none, 1 required (+), 2 prohibited (-/NOT)
        saw_atoms = False

        def _fixups() -> None:
            # retroactive fixups on the previous clause (addClause runs
            # these BEFORE its null-query check, so analyzed-away clauses
            # still apply them)
            if clauses and conj == 1 and clauses[-1][0] != "MUST_NOT":
                clauses[-1][0] = "MUST"
            if (clauses and op == "AND" and conj == 2
                    and clauses[-1][0] != "MUST_NOT"):
                clauses[-1][0] = "SHOULD"

        def _emit(specs: list[tuple]) -> None:
            nonlocal conj, mods
            _fixups()
            prohibited = mods == 2
            if op == "AND":
                required = (not prohibited) and conj != 2
            else:
                required = mods == 1 or (conj == 1 and not prohibited)
            occur = ("MUST_NOT" if prohibited
                     else ("MUST" if required else "SHOULD"))
            for sp in specs:
                if sp[0] == "term":
                    key = (occur, sp[1])
                    if key in seen_terms:
                        k = seen_terms[key]
                        old = clauses[k][1]
                        clauses[k][1] = ("term", sp[1], max(old[2], sp[2]))
                        continue
                    seen_terms[key] = len(clauses)
                clauses.append([occur, sp])
            conj = 0
            mods = 0

        n = len(toks)
        while i < n:
            kind, val = toks[i]
            if kind == ")":
                break
            if kind == "(":
                if val:
                    if mods:
                        raise ValueError(
                            f"duplicate modifier before group in q: {query!r}"
                        )
                    mods = 1 if val == "+" else 2
                sub, j, sub_atoms = self._parse_bool_level(
                    toks, i + 1, op, query
                )
                if j >= n or toks[j][0] != ")":
                    raise ValueError(f"unbalanced '(' in q: {query!r}")
                boost = toks[j][1]
                i = j + 1
                saw_atoms = saw_atoms or sub_atoms
                if not sub:
                    if not sub_atoms:
                        raise ValueError(f"empty group '()' in q: {query!r}")
                    # every clause analyzed away (stopwords): Lucene drops
                    # the null group from the parent query
                    _fixups()
                    conj = 0
                    mods = 0
                    continue
                if len(sub) == 1 and sub[0][0] != "MUST_NOT" and not (
                        sub[0][1][0] == "filter" and boost != 1.0):
                    # single-clause rewrite: unwrap, multiply boosts
                    sp = sub[0][1]
                    _emit([sp if sp[0] == "filter"
                           else self._boost_spec(sp, boost)])
                else:
                    _emit([("group", [tuple(c) for c in sub], boost)])
                continue
            # plain token
            i += 1
            if val in ("AND", "&&", "OR", "||"):
                if not clauses or conj:
                    raise ValueError(
                        f"misplaced boolean operator {val!r} in q: {query!r}"
                    )
                conj = 1 if val in ("AND", "&&") else 2
                continue
            if val == "NOT":
                if mods:
                    raise ValueError(
                        f"duplicate modifier before clause in q: {query!r}"
                    )
                mods = 2
                continue
            if val[:1] in "+-" and len(val) > 1:
                if mods:
                    raise ValueError(
                        f"duplicate modifier before clause in q: {query!r}"
                    )
                mods = 1 if val[0] == "+" else 2
                val = val[1:]
            if val.endswith(":") and i < n and toks[i][0] == "(":
                # field-scoped value group `field:(a OR b)` -- for stored
                # docs columns, delegate to the fq grammar (which parses
                # the same syntax) as a ConstantScore filter clause, the
                # same contract as flat `field:value` clauses
                fname = val[:-1]
                if fname not in self._doc_columns():
                    raise ValueError(
                        f"field-scoped group on unknown field {fname!r} "
                        f"in q: {query!r} (not a stored docs column)"
                    )
                body, i = self._reconstruct_group(toks, i, query)
                gb = toks[i - 1][1]  # close token's boost
                spec = ("filter", fname + ":" + body)
                if gb != 1.0:
                    spec = ("group", [("SHOULD", spec)], gb)
                _emit([spec])
                saw_atoms = True
                continue
            saw_atoms = True
            specs = self._atom_specs(val)
            if not specs:
                # clause analyzed away (pure stopword): Lucene drops it,
                # but its operators must not dangle onto the next clause
                _fixups()
                conj = 0
                mods = 0
                continue
            _emit(specs)
        if conj or mods:
            raise ValueError(f"dangling boolean operator in q: {query!r}")
        return [tuple(c) for c in clauses], i, saw_atoms

    @staticmethod
    def _reconstruct_group(
        toks: list[tuple], i: int, query: str
    ) -> tuple[str, int]:
        """Re-render one parenthesized token run (``toks[i]`` must be the
        open paren) back to source text -- used to hand a ``field:(...)``
        value group to the fq grammar verbatim. Returns (text,
        index_after_close)."""
        if toks[i][0] != "(":
            raise ValueError(f"expected '(' in q: {query!r}")
        parts: list[str] = []
        depth = 0
        n = len(toks)
        while i < n:
            kind, val = toks[i]
            i += 1
            if kind == "(":
                parts.append((val or "") + "(")
                depth += 1
            elif kind == ")":
                parts.append(")")
                depth -= 1
                if depth == 0:
                    return " ".join(parts).replace("( ", "(").replace(
                        " )", ")"), i
            else:
                parts.append(val)
        raise ValueError(f"unbalanced '(' in q: {query!r}")

    def _doc_columns(self) -> frozenset:
        """Stored docs-table column names (cached; one schema read)."""
        if not hasattr(self, "_doc_cols"):
            self._doc_cols = frozenset(self.docs().columns)
        return self._doc_cols

    def _filter_clause_ids(self, fq_str: str) -> DataFrame:
        """The live doc ids satisfying one ``field:value`` filter clause --
        routed through _apply_fq, so it rides the filterCache exactly like
        the same string passed as fq."""
        return self._apply_fq(self.docs().select("doc_id"), fq_str)

    MAX_BOOLEAN_CLAUSES = 1024  # Solr maxBooleanClauses default

    def expand_wildcard(
        self, pattern: str, max_clauses: int | None = None
    ) -> list[str]:
        """Dictionary terms matching a Lucene wildcard term (``*``/``?``),
        lowercased like the analysis chain. More than ``max_clauses``
        expansions raises, Solr's maxBooleanClauses=1024 error -- the cap
        is what keeps the expanded term list driver-safe and the postings
        scan bucket-pruned at any vocabulary size (Lucene walks the term
        automaton under the same clause cap)."""
        from ..functions.solr_fq import _wildcard_to_like

        cap = max_clauses or self.MAX_BOOLEAN_CLAUSES
        like = _wildcard_to_like(pattern.lower())
        if like is None:  # no unescaped wildcard: the literal term
            return [pattern.lower()]
        rows = (
            self.dictionary()
            .filter(F.col("term").like(like))
            .select("term")
            .distinct()
            .limit(cap + 1)
            .collect()
        )
        if len(rows) > cap:
            raise ValueError(
                f"wildcard {pattern!r} expands past maxBooleanClauses={cap}"
            )
        return sorted(r["term"] for r in rows)

    def expand_fuzzy(
        self, term: str, max_edits: int = 2, max_expansions: int = 50,
        prefix_length: int = 0,
    ) -> list[str]:
        """Dictionary terms within ``max_edits`` Levenshtein edits of the
        (lowercased) term -- Lucene FuzzyQuery defaults: maxEdits 2,
        maxExpansions 50, prefixLength 0; the exact term (distance 0) is
        included. Candidates rank (distance asc, df desc) like the
        spellchecker; the length band + optional shared prefix push into
        the dictionary scan before any distance math."""
        t = term.lower()
        band = self.dictionary().filter(
            F.abs(F.length("term") - F.lit(len(t))) <= max_edits
        )
        if prefix_length > 0:
            band = band.filter(
                F.substring("term", 1, prefix_length) == t[:prefix_length]
            )
        cand = (
            band.groupBy("term")
            .agg(F.sum("df").alias("df"))
            .withColumn("distance", F.levenshtein(F.col("term"), F.lit(t)))
            .filter(F.col("distance") <= max_edits)
            .orderBy(F.col("distance").asc(), F.col("df").desc(),
                     F.col("term").asc())
            .limit(max_expansions)
            .collect()
        )
        return [r["term"] for r in cand]

    def structured_matches(
        self, query: str, op: str = "OR",
        fq: str | list[str] | None = None,
        mm: int | str | None = None,
    ) -> DataFrame | None:
        """The full (doc_id, score) match frame for a STRUCTURED ``q`` --
        a lone quoted phrase (dedicated route) or a boolean-occur clause
        query -- else None (plain term queries keep their WAND/exhaustive
        paths). The single dispatch point the query entry points share."""
        pq = self.parse_phrase_q(query)
        if pq is not None:
            return self.phrase_matches(pq[0], slop=pq[1], fq=fq)
        cl = self.parse_boolean_q(query, op=op)
        if cl is not None:
            # occurs already carry op (parse-time promotion) -- no second
            return self.boolean_matches(cl, op="OR", fq=fq, mm=mm)
        return None

    def boolean_matches(
        self,
        clauses: list[tuple],
        op: str = "OR",
        fq: str | list[str] | None = None,
        mm: int | str | None = None,
    ) -> DataFrame:
        """Lucene BooleanQuery over occur-tagged clauses: a matching doc
        satisfies EVERY MUST clause, NO MUST_NOT clause, and at least
        minShouldMatch SHOULD clauses (Lucene default: 1 when there are no
        MUST clauses, else 0; ``mm`` raises it, counted over the SHOULD
        clauses only -- the mm spec's base). ``op='AND'`` promotes SHOULD
        to MUST (Solr q.op). score = sum of the matching MUST + SHOULD
        clause scores (prohibited clauses never score). A query of only
        MUST_NOT clauses follows Solr's top-level rewrite ``*:* -clauses``
        (every surviving live doc, score 1.0).

        Plan: one exhaustive pruned decode per occur-group's term set +
        the phrase kernels, tagged MUST=1/SHOULD=0, one groupBy(doc_id)
        computing (score, must_hits, should_hits); MUST_NOT ids union into
        one anti-join. Tombstones/fq once on the result. ('group', sub,
        boost) specs evaluate recursively as nested BooleanQueries (raw --
        tombstones/fq still apply exactly once, at the top)."""
        out = self._boolean_matches_raw(clauses, op=op, mm=mm, top=True)
        return self._apply_fq(self._anti_dead(out), fq)

    def _boolean_matches_raw(
        self,
        clauses: list[tuple],
        op: str = "OR",
        mm: int | str | None = None,
        top: bool = True,
    ) -> DataFrame:
        """:meth:`boolean_matches` without the final tombstone/fq wrap --
        the recursion body for nested ('group', ...) clauses. ``top=False``
        disables Solr's pure-negative ``*:* -clauses`` rewrite (a NESTED
        boolean of only MUST_NOT clauses matches nothing, like Lucene) and
        is always called with mm=None (minimum-should-match is a top-level
        parameter; nested booleans keep Lucene's default)."""
        if op == "AND":
            clauses = [
                ("MUST" if oc == "SHOULD" else oc, sp) for oc, sp in clauses
            ]
        musts = [sp for oc, sp in clauses if oc == "MUST"]
        shoulds = [sp for oc, sp in clauses if oc == "SHOULD"]
        nots = [sp for oc, sp in clauses if oc == "MUST_NOT"]
        empty = self.spark.createDataFrame([], _SCORE_ROW)

        if not musts and not shoulds:
            # only prohibited clauses: Solr's top-level `*:* -clauses`
            # rewrite (handled below, top level only); anything else with
            # zero positive clauses matches nothing
            if not nots or not top:
                return empty
            need_should = 0
        else:
            # minShouldMatch over the SHOULD clause count (Lucene base)
            need_should = 1 if not musts else 0
            if mm is not None and shoulds:
                mm_n = self._norm_mm(mm, len(shoulds))
                if mm_n is not None:
                    need_should = max(need_should, mm_n)
            if need_should > len(shoulds):
                return empty

        def _term_frame(specs, tag: int):
            tspecs = [sp for sp in specs if sp[0] == "term"]
            terms = [t for _, t, _ in tspecs]
            if not terms:
                return None, 0, False
            boosts = {t: b for _, t, b in tspecs}
            idf = self.idf_map(terms)
            oov = len([t for t in terms if t not in idf])
            live = [t for t in terms if t in idf]
            if not live:
                return None, oov, True
            widf = {t: idf[t] * boosts[t] for t in live}
            f = self._decode_score_df(live, widf).select(
                "doc_id", "score", F.lit(tag).alias("is_must")
            )
            return f, oov, True

        def _clause_frame(sp):
            """(doc_id, score) for ONE non-term clause -- at most one row
            per doc -- or None when the clause can match nothing."""
            kind = sp[0]
            if kind == "phrase":
                _, text, slop, boost = sp
                f = self.phrase_matches(text, slop=slop)
                if boost != 1.0:
                    f = f.select(
                        "doc_id",
                        (F.col("score") * F.lit(boost)).alias("score"),
                    )
                return f
            if kind == "filter":
                return self._filter_clause_ids(sp[1]).select(
                    "doc_id", F.lit(1.0).alias("score")
                )
            if kind == "group":
                _, sub, boost = sp
                f = self._boolean_matches_raw(sub, op="OR", top=False)
                if boost != 1.0:
                    f = f.select(
                        "doc_id",
                        (F.col("score") * F.lit(boost)).alias("score"),
                    )
                return f
            if kind == "wildcard":
                _, pattern, boost = sp
                if pattern == "*":
                    # Solr's lucene parser rewrites a lone `*` in the
                    # default field to MatchAllDocsQuery (tombstones/fq
                    # are applied once on the boolean result below)
                    return self.docs().select(
                        "doc_id", F.lit(float(boost)).alias("score")
                    )
                terms = self.expand_wildcard(pattern)
                if not terms:
                    return None
                # Lucene's default MultiTermQuery rewrite: CONSTANT_SCORE
                ids = (
                    self._decode_score_df(terms, {t: 1.0 for t in terms})
                    .select("doc_id")
                    .distinct()
                )
                return ids.select(
                    "doc_id", F.lit(float(boost)).alias("score")
                )
            if kind == "fuzzy":
                _, t, max_edits, boost = sp
                cand = self.expand_fuzzy(t, max_edits=max_edits)
                idf = self.idf_map(cand)
                live = [c for c in cand if c in idf]
                if not live:
                    return None
                f = (
                    self._decode_score_df(live, {c: idf[c] for c in live})
                    .groupBy("doc_id")
                    .agg(F.sum("score").alias("score"))
                )
                if boost != 1.0:
                    f = f.select(
                        "doc_id",
                        (F.col("score") * F.lit(boost)).alias("score"),
                    )
                return f
            raise ValueError(f"unknown clause kind: {kind!r}")

        parts = []
        n_musts = len(musts)
        mf, must_oov, _ = _term_frame(musts, 1)
        if must_oov:
            return empty  # an OOV MUST clause empties the query
        if mf is not None:
            parts.append(mf)
        for sp in musts:
            if sp[0] == "term":
                continue
            f = _clause_frame(sp)
            if f is None:
                return empty  # an unmatchable MUST clause empties the query
            parts.append(f.select("doc_id", "score", F.lit(1).alias("is_must")))
        sf_, _, _ = _term_frame(shoulds, 0)
        if sf_ is not None:
            parts.append(sf_)
        for sp in shoulds:
            if sp[0] == "term":
                continue
            f = _clause_frame(sp)
            if f is None:
                continue  # unmatchable SHOULD: contributes nothing
            parts.append(f.select("doc_id", "score", F.lit(0).alias("is_must")))

        if parts:
            un = parts[0]
            for p in parts[1:]:
                un = un.unionByName(p)
            agg = un.groupBy("doc_id").agg(
                F.sum("score").alias("score"),
                F.sum("is_must").alias("mh"),
                (F.count("*") - F.sum("is_must")).alias("sh"),
            )
            out = agg.filter(
                (F.col("mh") == n_musts) & (F.col("sh") >= need_should)
            ).select("doc_id", "score")
        elif nots and not musts and not shoulds:
            # only prohibited clauses: Solr's top-level `*:* -clauses`
            # (an OOV/unmatchable POSITIVE clause must NOT degrade to
            # match-all: a SHOULD TermQuery on an absent term still counts
            # toward minShouldMatch and matches nothing)
            out = self.docs().select(
                "doc_id", F.lit(1.0).alias("score")
            )
        else:
            return empty

        if nots:
            not_ids = None
            nterms = [sp[1] for sp in nots if sp[0] == "term"]
            if nterms:
                idf = self.idf_map(nterms)
                live = [t for t in nterms if t in idf]
                if live:
                    not_ids = self._decode_score_df(
                        live, {t: 1.0 for t in live}
                    ).select("doc_id")
            for sp in nots:
                if sp[0] == "term":
                    continue
                f = _clause_frame(sp)
                if f is None:
                    continue  # unmatchable MUST_NOT prohibits nothing
                pids = f.select("doc_id")
                not_ids = pids if not_ids is None else not_ids.unionByName(pids)
            if not_ids is not None:
                out = out.join(not_ids.distinct(), "doc_id", "left_anti")

        return out

    def parse_mixed_q(
        self, query: str
    ) -> tuple[list[tuple[str, float]], list[tuple[str, int, float]]] | None:
        """Lucene mixed boolean queries: terms AND quoted phrases as sibling
        SHOULD/MUST clauses (``error "table scan"~2^3 timeout^2``). Returns
        (term_clauses [(term, boost)], phrase_clauses [(text, slop, boost)])
        when the query contains at least one well-formed quoted phrase plus
        other clauses (or several phrases) -- else None (pure-term queries
        keep the WAND paths, a single lone phrase keeps the dedicated
        phrase route). Term clauses follow parse_boosted_query's rules:
        every analyzed token of a surface clause is its own clause carrying
        the clause's boost, duplicates keep the larger boost."""
        if '"' not in query or self.parse_phrase_q(query) is not None:
            return None
        term_clauses: list[tuple[str, float]] = []
        tboost: dict[str, float] = {}
        phrases: list[tuple[str, int, float]] = []
        for tok in self._MIXED_TOKEN_RE.findall(query):
            m = self._PHRASE_CLAUSE_RE.match(tok)
            if m is not None:
                ph = (m.group("p"), int(m.group("slop") or 0),
                      float(m.group("boost") or 1.0))
                for i, (p0, s0, b0) in enumerate(phrases):
                    if (p0, s0) == ph[:2]:  # duplicate keeps larger boost
                        phrases[i] = (p0, s0, max(b0, ph[2]))
                        break
                else:
                    phrases.append(ph)
                continue
            bm = self._BOOST_RE.search(tok)
            b = float(bm.group(1)) if bm else 1.0
            text = tok[: bm.start()] if bm else tok
            for t in self.analyze_query(text):
                if t not in tboost:
                    term_clauses.append((t, b))
                tboost[t] = max(tboost.get(t, 0.0), b)
        if not phrases:
            return None  # unbalanced quote etc: legacy term analysis
        term_clauses = [(t, tboost[t]) for t, _ in term_clauses]
        return term_clauses, phrases

    def _surface_terms(self, query: str) -> list[str]:
        """Every analyzed term a query's POSITIVE clauses mention (term
        clauses + phrase-clause contents; MUST_NOT terms excluded -- a
        highlighter must not mark what the query prohibits), for components
        that work on terms regardless of clause structure (highlighting,
        spellcheck)."""
        pq = self.parse_phrase_q(query)
        if pq is not None:
            return self.analyze_query(pq[0])
        cl = self.parse_boolean_q(query)
        if cl is None:
            return self.analyze_query(query)
        out: list[str] = []

        def _walk(clauses: list[tuple]) -> None:
            for occur, sp in clauses:
                if occur == "MUST_NOT" or sp[0] == "filter":
                    continue  # filter clauses carry no highlightable text
                if sp[0] == "term":
                    out.append(sp[1])
                elif sp[0] == "group":
                    _walk(sp[1])
                else:
                    out.extend(self.analyze_query(sp[1]))

        _walk(cl)
        return list(dict.fromkeys(out))

    def mixed_matches(
        self,
        term_clauses: list[tuple[str, float]],
        phrase_clauses: list[tuple[str, int, float]],
        op: str = "OR",
        fq: str | list[str] | None = None,
        mm: int | str | None = None,
    ) -> DataFrame:
        """The FULL match set (doc_id, score) of a mixed boolean query:
        score = sum of matching clause scores (Lucene BooleanQuery), a doc
        matches >=1 clause under OR (>=mm with minimum-should-match, ALL
        under AND -- mm counts every clause, phrase or term, like Lucene
        counts SHOULD clauses).

        Plan: each clause contributes AT MOST ONE row per doc -- term
        clauses via one exhaustive pruned postings decode (a (term, doc)
        posting is one row), phrase clauses via their segment kernels -- so
        one union + groupBy(doc_id) yields both the summed score and the
        matched-clause count (count(*)), with no per-clause tagging.
        Tombstones/fq apply ONCE on the aggregated set. Mixed queries run
        exhaustive: WAND bounds don't compose across positional clauses,
        and (like Solr's grouped path) the full match set is the contract
        here -- top-k cutting happens in the caller's _finish.

        Implemented as the all-SHOULD case of :meth:`boolean_matches`
        (one scorer; ``+``/``-`` occur operators are the general form)."""
        clauses: list[tuple] = [
            ("SHOULD", ("term", t, b)) for t, b in term_clauses
        ]
        clauses += [
            ("SHOULD", ("phrase", p, s, b)) for p, s, b in phrase_clauses
        ]
        if not clauses:
            return self.spark.createDataFrame([], _SCORE_ROW)
        return self.boolean_matches(clauses, op=op, fq=fq, mm=mm)

    def search_phrase(
        self,
        phrase: str,
        k: int = 10,
        fq: str | list[str] | None = None,
        offset: int = 0,
        with_stored: bool = False,
        order_key: str = "round6",
        fl: list[str] | None = None,
        slop: int = 0,
    ) -> DataFrame:
        """Phrase top-k. ``slop=0`` (Lucene PhraseQuery): docs where the
        analyzed phrase terms occur at consecutive positions, freq = number
        of phrase occurrences. ``slop>0`` (Lucene SloppyPhraseQuery): docs
        where the terms align within ``slop`` total position displacement,
        freq = the sloppy frequency sum(1/(1+matchLength)) over the matches
        the SloppyPhraseScorer greedy pass counts (see
        :meth:`phrase_matches`). Scoring either way is BM25 with weight =
        sum of the terms' idfs: score = idf_sum * freq*(k1+1)/(freq +
        k1*(1-b+b*dl/avgdl)). Requires an index built with
        store_positions=True.

        Plan: postings pruned to the phrase terms (bucket partition pruning +
        term pushdown) -> segment-parallel Arrow kernel does doc-list
        intersection + position matching -> global top-k.
        """
        terms = self._analyze(phrase)  # order + duplicates matter for phrases
        uniq_terms = list(dict.fromkeys(terms))
        idf = self.idf_map(uniq_terms)
        empty = self.spark.createDataFrame([], _SCORE_ROW)
        if not terms or any(t not in idf for t in uniq_terms):
            return self._finish(empty, k, offset, with_stored, order_key, fl)
        if len(terms) == 1:
            # a 1-term phrase IS a term query (Lucene rewrites it so) --
            # score the analyzed TERM directly rather than re-parsing the
            # surface string through search() (whose whitespace clause
            # split would re-tokenize multi-word keyword-chain values,
            # e.g. the `lowercase` fieldType's whole-value tokens)
            t = terms[0]
            scored = self._scored_frame(
                [t], {t: idf[t]}, k + offset, "OR", "wand", self._norm_fq(fq)
            )
            return self._finish(scored, k, offset, with_stored, order_key, fl)
        scored = self.phrase_matches(phrase, slop=slop, fq=fq)
        return self._finish(scored, k, offset, with_stored, order_key, fl)

    def phrase_matches(
        self,
        phrase: str,
        slop: int = 0,
        fq: str | list[str] | None = None,
    ) -> DataFrame:
        """The FULL phrase match set (doc_id, score) -- no top-k cut; the
        phrase analog of :meth:`score_matches`, backing numFound, facets
        and field sorts for quoted-phrase ``q``. Semantics per
        :meth:`search_phrase` (slop=0 exact, slop>0 Lucene
        SloppyPhraseScorer greedy sloppy frequency)."""
        terms = self._analyze(phrase)  # order + duplicates matter for phrases
        uniq_terms = list(dict.fromkeys(terms))
        idf = self.idf_map(uniq_terms)
        empty = self.spark.createDataFrame([], _SCORE_ROW)
        if not terms or any(t not in idf for t in uniq_terms):
            return empty
        if len(terms) == 1:
            t = terms[0]
            return self._scored_frame(
                [t], {t: idf[t]}, 0, "OR", "exhaustive", self._norm_fq(fq)
            )
        # Lucene sums idf over the phrase's term array (duplicates counted)
        idf_sum = float(sum(idf[t] for t in terms))
        k1, b, avgdl = K1, B, self.avgdl
        slop_n = int(slop)

        def match_segment(key, pdf: pd.DataFrame) -> pd.DataFrame:
            res_empty = pd.DataFrame({"doc_id": [], "score": []}).astype(
                {"doc_id": "int64", "score": "float64"}
            )
            per_term: dict[str, tuple] = {}
            for term, tpdf in pdf.groupby("term", sort=False):
                tpdf = tpdf.sort_values(["salt", "block_id"])
                docs_l, tf_l, dl_l, pos_l = [], [], [], []
                for row in tpdf.itertuples(index=False):
                    if getattr(row, "positions", None) is None:
                        raise ValueError(
                            "phrase query needs an index built with "
                            "store_positions=True"
                        )
                    gaps = varint_decode(row.doc_gaps, row.count)
                    docs_l.append(np.cumsum(gaps).astype(np.int64))
                    tfb = varint_decode(row.tfs, row.count).astype(np.int64)
                    tf_l.append(tfb)
                    dl_l.append(varint_decode(row.dls, row.count).astype(np.int64))
                    pd_ = varint_decode(row.positions, int(tfb.sum()))
                    # per-posting cumsum with absolute restarts
                    c = np.cumsum(pd_.astype(np.int64))
                    starts = np.zeros(len(tfb) + 1, dtype=np.int64)
                    np.cumsum(tfb, out=starts[1:])
                    base = c[starts[:-1]] - pd_.astype(np.int64)[starts[:-1]]
                    pos_l.append(c - np.repeat(base, tfb))
                docs = np.concatenate(docs_l)
                tfs = np.concatenate(tf_l)
                dls = np.concatenate(dl_l)
                poss = np.concatenate(pos_l) if pos_l else np.empty(0, np.int64)
                pstart = np.zeros(len(tfs) + 1, dtype=np.int64)
                np.cumsum(tfs, out=pstart[1:])
                per_term[term] = (docs, tfs, dls, poss, pstart)
            if any(t not in per_term for t in uniq_terms):
                return res_empty
            if slop_n > 0:
                # SloppyPhraseQuery: candidates = conjunction of the terms'
                # (sorted, salt-contiguous) doc lists; the greedy
                # sloppy-freq pass runs per CANDIDATE doc only
                cand = per_term[uniq_terms[0]][0]
                for t in uniq_terms[1:]:
                    cand = np.intersect1d(
                        cand, per_term[t][0], assume_unique=True
                    )
                if not len(cand):
                    return res_empty
                rows_by_term = {
                    t: np.searchsorted(per_term[t][0], cand)
                    for t in uniq_terms
                }
                out_docs, out_scores = [], []
                for ci, doc in enumerate(cand):
                    plists = []
                    for jslot, t in enumerate(terms):
                        _, _, _, poss, pstart = per_term[t]
                        i = rows_by_term[t][ci]
                        plists.append(
                            poss[pstart[i]:pstart[i + 1]].astype(np.int64)
                            - jslot
                        )
                    f = sloppy_phrase_freq(plists, slop_n)
                    if f <= 0.0:
                        continue
                    d0, _, dl0, _, _ = per_term[terms[0]]
                    dl = float(dl0[rows_by_term[terms[0]][ci]])
                    denom = f + k1 * (
                        1.0 - b + b * (dl / avgdl if avgdl else 1.0)
                    )
                    out_docs.append(int(doc))
                    out_scores.append(idf_sum * f * (k1 + 1.0) / denom)
                if not out_docs:
                    return res_empty
                return pd.DataFrame(
                    {
                        "doc_id": np.asarray(out_docs, dtype=np.int64),
                        "score": np.asarray(out_scores, dtype=np.float64),
                    }
                )
            # FULLY vectorized phrase matching: pack (doc, start_position)
            # into one uint64 key per occurrence -- for term j the key uses
            # (pos - j), so an exact phrase occurrence is a key present in
            # EVERY term's key set; sorted-array intersections find them all
            # at once (no per-candidate-doc Python loop). Position budget:
            # 2^24 per doc (docs to 2^40), enforced below.
            SHIFT = np.uint64(1 << 24)
            m = len(terms)
            keysets = []
            for j, t in enumerate(terms):
                docs, tfs, dls, poss, pstart = per_term[t]
                docs_rep = np.repeat(docs.astype(np.uint64), tfs)
                adj = poss.astype(np.int64) - j + m  # keep non-negative
                if adj.size and int(adj.max()) >= (1 << 24):
                    raise ValueError("position exceeds 2^24 packing budget")
                keysets.append(docs_rep * SHIFT + adj.astype(np.uint64))
            common = keysets[0]
            for ks in keysets[1:]:
                if not len(common):
                    break
                common = np.intersect1d(common, ks, assume_unique=True)
            if not len(common):
                return res_empty
            match_docs = (common // SHIFT).astype(np.int64)
            uniq, freq = np.unique(match_docs, return_counts=True)
            d0, _, dl0, _, _ = per_term[terms[0]]
            dl = dl0[np.searchsorted(d0, uniq)].astype(np.float64)
            f = freq.astype(np.float64)
            denom = f + k1 * (1.0 - b + b * (dl / avgdl if avgdl else 1.0))
            return pd.DataFrame(
                {"doc_id": uniq, "score": idf_sum * f * (k1 + 1.0) / denom}
            )

        post = self.postings_for(uniq_terms)
        # the kernel returns ALL phrase matches (no local top-k), so deletes
        # and fq are exact as post-hoc distributed joins -- no driver-side set
        scored = self._anti_dead(
            post.groupBy("segment_id").applyInPandas(match_segment, schema=_SCORE_ROW)
        )
        return self._apply_fq(scored, fq)

    # -- block-max WAND (segment-parallel fast path) ---------------------------

    # fq representations shipped to the kernels (see _side_frame)
    _FQ_INCLUDE = 1  # kind-1 rows are the allowed docs
    _FQ_EXCLUDE = 2  # kind-2 rows are the complement (fq matched a majority)

    # cache sizing mirrors the reference's solrconfig.xml: filterCache
    # size=512 (:388), queryResultCache size=512 (:400),
    # queryResultWindowSize=20 / queryResultMaxDocsCached=200
    # (semantic-example/solrconfig.xml:42-46). Executor memory stays safe at
    # 512 filter entries because Spark's block manager LRU-evicts persisted
    # blocks under pressure; the result cache is driver-side but bounded at
    # 512 x 200 tiny rows.
    FILTER_CACHE_MAX = 512
    QUERY_RESULT_WINDOW = 20
    QUERY_RESULT_MAX_DOCS = 200
    RESULT_CACHE_MAX = 512
    # bf-WAND crossover: estimated matches below which search_boosted
    # skips the pruned path. Measured on this host (BASELINE.md "bf-WAND
    # crossover"): the pruned path loses at ~5M matches (its extra
    # postings pass dominates) and wins at ~19M (the match-set join
    # starts to dominate -- the regime a 10^12-turn corpus lives in
    # permanently). 10M splits the measured points.
    PRUNED_BOOST_MIN_MATCHES = 10_000_000

    def _fq_entry(self, fq: str) -> tuple[int, DataFrame]:
        """Solr filterCache analog (solrconfig.xml declares a filterCache
        holding one DocSet per fq string; repeated fq is THE dominant Solr
        access pattern): fq -> (representation, PERSISTED minority doc-id
        DataFrame). First use scans the docs table once -- the count that
        picks the minority side also materializes the block-manager cache --
        and every later query with the same fq string reads cached blocks
        instead of re-scanning the docs table. Entries are LRU-evicted and
        unpersisted at FILTER_CACHE_MAX.

        Representation: _FQ_INCLUDE rows are the fq-allowed ids,
        _FQ_EXCLUDE rows are the ids where fq is NOT TRUE (false or null --
        Solr fq semantics require a positive match, so null-predicate docs
        are excluded; ``~expr`` alone would drop them from BOTH sides and an
        anti-join would wrongly let them through). Whichever side is smaller
        is stored, so at 10^12 docs a 99%-selective fq caches the 1% set,
        distributed across executors (MEMORY_AND_DISK), never the driver.
        Safe across delete_by_query (tombstones are applied separately) and
        across compact/merge (both return a fresh index handle)."""
        from pyspark import StorageLevel

        ent = self._filter_cache.get(fq)
        if ent is not None:
            self._filter_cache.move_to_end(fq)
            return ent
        # the fq string may be Solr/Lucene filter syntax (the reference
        # ships its source filters that way -- `-id:*.csv`, `title:*`,
        # application-test.yml -- and appends each as an fq param,
        # HttpSolrSelectClientImpl.java createSolrRequest); translate to a
        # SQL expression, keeping the ORIGINAL string as the cache key the
        # way Solr's filterCache keys by the fq as sent
        expr = fq
        if fq.lstrip().startswith("{!frange"):
            # Solr's function-range filter qparser ({!frange l=.. u=..}func)
            # -- compiles to one codegen'd boolean over the docs scan; the
            # DocSet is filter-cached under the original string like any fq
            from ..functions.function_query import frange_to_sql

            expr = frange_to_sql(fq, dict(self.docs().dtypes))
        elif fq.lstrip().startswith("{!terms"):
            # Solr terms qparser ({!terms f=F}v1,v2,...): a large
            # disjunction as ONE membership test -- compiles to IN over
            # the docs scan (Catalyst turns big INs into hash sets).
            # Unknown local params (separator=, method=) fail loud like
            # frange/geofilt -- swallowing them would silently change the
            # DocSet
            m = re.match(r"^\{!terms\s+([^}]*)\}(.*)$", fq.strip(), re.S)
            if m is None:
                raise ValueError(f"cannot parse terms qparser: {fq!r}")
            lps = dict(
                p.partition("=")[::2] for p in m.group(1).split()
            )
            if set(lps) != {"f"}:
                raise ValueError(
                    f"{{!terms}} supports only the f= local param, got "
                    f"{sorted(lps)}"
                )
            fld = lps["f"]
            vals = [v for v in m.group(2).split(",") if v]
            types = dict(self.docs().dtypes)
            if fld not in types:
                raise ValueError(f"{{!terms}}: unknown field {fld!r}")
            if not vals:
                expr = "false"  # empty terms list matches nothing (Solr)
            elif types[fld] == "string":
                quoted = ", ".join(
                    "'" + v.replace("'", "''") + "'" for v in vals
                )
                expr = f"{fld} IN ({quoted})"
            else:
                try:  # numeric field: every value must BE a number --
                    # raw interpolation could resolve junk as a column ref
                    nums = [repr(float(v)) if "." in v or "e" in v.lower()
                            else repr(int(v)) for v in vals]
                except ValueError:
                    raise ValueError(
                        f"{{!terms}} on numeric field {fld!r}: "
                        f"non-numeric value in {vals!r}"
                    )
                expr = f"{fld} IN ({', '.join(nums)})"
        elif fq.lstrip().startswith(("{!geofilt", "{!bbox")):
            # spatial qparsers (managed-schema.xml:521-536 fieldTypes):
            # haversine circle / enclosing rectangle as one codegen'd
            # boolean over the docs scan, filter-cached like any fq
            from ..functions.geo import geo_fq_to_sql

            expr = geo_fq_to_sql(fq, dict(self.docs().dtypes))
        elif fq.lstrip().startswith(("{!join", "{!graph")):
            # JoinQParserPlugin / GraphQueryParser: the DocSet is a
            # semi-join (or its breadth-first closure), not a boolean
            # over the scan -- its own branch with the same cache tail
            docset = (
                self._join_fq_docset(fq)
                if fq.lstrip().startswith("{!join")
                else self._graph_fq_docset(fq)
            )
            allowed = (
                docset.select("doc_id")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            n_allowed = allowed.count()
            if self.n_docs and n_allowed > self.n_docs // 2:
                rows = (
                    self.docs().select("doc_id")
                    .join(allowed, "doc_id", "left_anti")
                    .persist(StorageLevel.MEMORY_AND_DISK)
                )
                allowed.unpersist()
                ent = (self._FQ_EXCLUDE, rows)
            else:
                ent = (self._FQ_INCLUDE, allowed)
            self._filter_cache[fq] = ent
            while len(self._filter_cache) > self.FILTER_CACHE_MAX:
                _, (_, old) = self._filter_cache.popitem(last=False)
                old.unpersist()
            return ent
        elif looks_like_solr_fq(fq):
            expr = parse_fq(fq, dict(self.docs().dtypes))
        allowed = (
            self.docs().filter(expr).select("doc_id")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        n_allowed = allowed.count()  # one docs scan; materializes the cache
        if self.n_docs and n_allowed > self.n_docs // 2:
            rows = (
                self.docs()
                .filter(~F.expr(expr).eqNullSafe(F.lit(True)))
                .select("doc_id")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            allowed.unpersist()
            ent = (self._FQ_EXCLUDE, rows)
        else:
            ent = (self._FQ_INCLUDE, allowed)
        self._filter_cache[fq] = ent
        while len(self._filter_cache) > self.FILTER_CACHE_MAX:
            _, (_, old) = self._filter_cache.popitem(last=False)
            old.unpersist()
        return ent

    _JOIN_RE = re.compile(r"^\{!join\s+([^}]*)\}(.*)$", re.S)

    def _join_fq_docset(self, fq: str) -> DataFrame:
        """Solr JoinQParserPlugin (``fq={!join from=F to=T
        [fromIndex=core]}innerQuery``): keep docs whose T value appears
        among the F values of the inner query's match set. Default is the
        same-collection join; ``fromIndex`` runs the inner query against
        another registered core (``self.collections[name]``), Solr's
        cross-core join -- only the distinct key set crosses indexes, and
        like Solr the cached DocSet does not watch the FROM core for
        changes (Solr invalidates on the to-side searcher reopen only).
        The inner query is parsed like any ``q`` (terms, phrases, boolean
        occur, ``field:value`` filter clauses, ``*:*``).

        Distributed shape: inner DocSet -> distinct F keys (one shuffle
        sized by the inner match count, never the corpus) -> LEFT SEMI join
        against the docs scan on T. A selective inner query yields a small
        key set that AQE broadcast-joins against a 10^12-doc scan; the
        resulting DocSet is filter-cached under the original fq string like
        any other filter, so repeated requests never re-run the join. Null
        F values never join (SQL equality), and null-T docs land on the
        exclude side -- Solr fq semantics require a positive match.
        ``score=none`` only (the qparser's default; scored joins are a
        documented non-goal)."""
        m = self._JOIN_RE.match(fq.strip())
        if m is None:
            raise ValueError(f"cannot parse join qparser: {fq!r}")
        lps = dict(p.partition("=")[::2] for p in m.group(1).split())
        extra = set(lps) - {"from", "to", "score", "fromIndex"}
        if extra or not {"from", "to"} <= set(lps):
            raise ValueError(
                "{!join} requires from= and to= (optional score=none, "
                f"fromIndex=core), got {sorted(lps)}"
            )
        if lps.get("score", "none") != "none":
            raise ValueError("{!join} supports only score=none")
        # cross-core join (Solr's fromIndex local param): the inner query
        # and the from-field read run against the NAMED core; only the
        # distinct key set crosses indexes -- same one-shuffle shape
        src = self
        if "fromIndex" in lps:
            name = lps["fromIndex"]
            src = self.collections.get(name)
            if src is None:
                raise ValueError(
                    f"{{!join}}: fromIndex {name!r} is not registered on "
                    f"this handle (known: {sorted(self.collections)}) -- "
                    f"assign idx.collections[{name!r}] = <BM25Index>"
                )
        f_from, f_to = lps["from"], lps["to"]
        if f_from not in dict(src.docs().dtypes):
            raise ValueError(f"{{!join}}: unknown field {f_from!r}")
        if f_to not in dict(self.docs().dtypes):
            raise ValueError(f"{{!join}}: unknown field {f_to!r}")
        inner = m.group(2).strip()
        if not inner:
            raise ValueError("{!join}: empty inner query")
        if inner == "*:*":
            inner_docs = src._anti_dead(src.docs())
        else:
            inner_docs = src.docs().join(
                src._matched_ids(inner), "doc_id", "left_semi"
            )
        keys = (
            inner_docs.select(F.col(f_from).alias("__join_key"))
            .where(F.col("__join_key").isNotNull())
            .distinct()
        )
        return self.docs().join(
            keys, F.col(f_to) == F.col("__join_key"), "left_semi"
        )

    _GRAPH_RE = re.compile(r"^\{!graph\s+([^}]*)\}(.*)$", re.S)

    def _graph_fq_docset(self, fq: str) -> DataFrame:
        """Solr GraphQueryParser (``fq={!graph from=F to=T [maxDepth=N]
        [returnRoot=true|false]}rootQuery``): every doc reachable from the
        root query's match set by the breadth-first edge walk — hop k+1
        adds docs whose T value appears among the frontier's F values.
        The traversal itself is :func:`..query.json_facet._graph_domain`
        (domain.graph and this qparser are the same machinery in Solr
        too); each round shuffles only the NEW key set, frontiers are
        localCheckpoint-ed, and the DocSet is filter-cached under the
        original fq string like any filter."""
        from .json_facet import _graph_domain

        m = self._GRAPH_RE.match(fq.strip())
        if m is None:
            raise ValueError(f"cannot parse graph qparser: {fq!r}")
        lps = dict(p.partition("=")[::2] for p in m.group(1).split())
        extra = set(lps) - {"from", "to", "maxDepth", "returnRoot"}
        if extra or not {"from", "to"} <= set(lps):
            raise ValueError(
                "{!graph} requires from= and to= (optional maxDepth=, "
                f"returnRoot=), got {sorted(lps)}"
            )
        inner = m.group(2).strip()
        if not inner:
            raise ValueError("{!graph}: empty root query")
        if inner == "*:*":
            root = self._anti_dead(self.docs())
        else:
            root = self.docs().join(
                self._matched_ids(inner), "doc_id", "left_semi"
            )
        spec = {"from": lps["from"], "to": lps["to"]}
        if "maxDepth" in lps:
            spec["maxDepth"] = int(lps["maxDepth"])
        if "returnRoot" in lps:
            if lps["returnRoot"] not in ("true", "false"):
                raise ValueError(
                    f"{{!graph}}: returnRoot must be true|false, got "
                    f"{lps['returnRoot']!r}"
                )
            spec["returnRoot"] = lps["returnRoot"] == "true"
        return _graph_domain(self, root, spec)

    @staticmethod
    def _norm_fq(fq):
        """Public-API fq normalization: None / a single string / a list of
        fq strings (Solr sends one ``fq`` param per filter and ANDs them;
        HttpSolrSelectClientImpl.java appends one per configured filter).
        Lists become hashable tuples (queryResultCache keys on them); an
        empty list is no filter; a 1-list collapses to its string so it
        shares cache keys with the equivalent single-fq call."""
        if fq is None or isinstance(fq, str):
            return fq
        fqs = tuple(fq)
        if not fqs:
            return None
        return fqs[0] if len(fqs) == 1 else fqs

    def _fq_sides(self, fq) -> tuple[int, DataFrame]:
        """Effective (representation, minority doc-id frame) for one fq or
        an AND'd tuple of fqs. Each fq keeps its OWN filter-cache entry
        (Solr caches per fq and intersects the cached DocSets per query);
        the combination is set algebra on the cached minority frames, so
        the joins below never touch the docs table: with any INCLUDE side
        present the work is bounded by the smallest allowed set, and
        all-EXCLUDE combinations union the (minority) complements."""
        if isinstance(fq, str):
            return self._fq_entry(fq)
        entries = [self._fq_entry(f) for f in fq]
        includes = [r for rep, r in entries if rep == self._FQ_INCLUDE]
        excludes = [r for rep, r in entries if rep == self._FQ_EXCLUDE]
        if includes:
            base = includes[0]
            for r in includes[1:]:
                base = base.join(r, "doc_id", "left_semi")
            for r in excludes:
                base = base.join(r, "doc_id", "left_anti")
            return self._FQ_INCLUDE, base
        base = excludes[0]
        for r in excludes[1:]:
            base = base.unionByName(r)
        return self._FQ_EXCLUDE, base.distinct()

    def _apply_fq(self, df: DataFrame, fq, key: str = "doc_id") -> DataFrame:
        """Apply an fq (or tuple of fqs) to a (key=doc_id)-bearing frame
        through the filter cache: semi-join against the allowed set or
        anti-join against its complement, whichever side is held."""
        fq = self._norm_fq(fq)
        if fq is None:
            return df
        fq_repr, rows = self._fq_sides(fq)
        side = rows if key == "doc_id" else rows.withColumnRenamed("doc_id", key)
        how = "left_semi" if fq_repr == self._FQ_INCLUDE else "left_anti"
        return df.join(side, key, how)

    def _side_frame(
        self, fq: str | None
    ) -> tuple[DataFrame | None, int]:
        """Per-segment doc filter relation (segment_id, doc_id, kind) that is
        COGROUPED into the WAND segment kernels: kind 0 = tombstoned (always
        excluded); kind 1 = fq-allowed OR kind 2 = fq-DISALLOWED, whichever
        side is smaller -- a selective fq ships the matches, a broad fq
        (e.g. ``role != 'tool'`` over the whole corpus) ships the complement,
        so the cogrouped side is always the minority set. segment_id =
        doc_id // segment_size is a pure function of doc_id, so routing rows
        to their segment needs no join, and each kernel call only ever sees
        its own segment's ids (bounded by segment_size) -- nothing is
        collected to the driver or captured in a task closure.

        Returns (side_frame_or_None, fq_repr in {0, _FQ_INCLUDE, _FQ_EXCLUDE}).
        """
        parts = []
        fq_repr = 0
        fq = self._norm_fq(fq)
        if fq is not None:
            fq_repr, rows = self._fq_sides(fq)
            parts.append(rows.select("doc_id", F.lit(fq_repr).alias("kind")))
        dead = self._tombstones_df()
        if dead is not None:
            parts.append(dead.select("doc_id", F.lit(0).alias("kind")))
        if not parts:
            return None, fq_repr
        side = parts[0]
        for p in parts[1:]:
            side = side.unionByName(p)
        return (
            side.select(
                (F.col("doc_id") / self.segment_size).cast("long").alias("segment_id"),
                "doc_id",
                "kind",
            ),
            fq_repr,
        )

    def _wand_segments(
        self,
        terms: list[str],
        idf: dict[str, float],
        k: int,
        fq: str | None,
        op: str = "OR",
        after: tuple[float, int] | None = None,
        mm: int | None = None,
        min_score: float | None = None,
    ) -> DataFrame:
        """``min_score``: threshold-collection mode (the bf-WAND candidate
        pass, VERDICT r4 item 5) — instead of a local top-k, each kernel
        emits EVERY doc whose lexical score >= min_score - 1e-6, with the
        zone skip driven by the FIXED threshold (zones provably below it
        never decode). Used by :meth:`_boosted_wand_frame`, where
        min_score = boosted-theta - max_bf bounds which docs could still
        reach the boosted top-k."""
        k1, b, avgdl = K1, B, self.avgdl
        bidf = dict(idf)
        kk = max(k, 1)
        n_query_terms = len(terms)
        # minimum-should-match: a doc's postings for every query term live
        # in ITS segment, so the per-doc matched-clause count is complete
        # inside one kernel call -- count via bincount over the decoded
        # (term, doc) postings, filter before the local top-k. Zone upper
        # bounds only shrink under the filter, so skipping stays exact.
        mm_n = mm if mm is not None and mm > 1 else None
        # cursorMark keyset: drop docs at-or-before the cursor position
        # BEFORE each local top-k -- a segment whose best kk docs all
        # precede the cursor must still surface its deeper docs. Filtering
        # only shrinks the candidate set, so zone upper bounds stay valid
        # and theta (now the k-th best of the FILTERED set) still only
        # under-prunes: skipping stays exact under a cursor.
        a_s, a_d = after if after is not None else (None, None)

        def _after_mask(docs: np.ndarray, sums: np.ndarray) -> np.ndarray:
            key = np.round(sums, 6)
            return (key < a_s) | ((key == a_s) & (docs > a_d))

        post = self.postings_for(terms)

        def _decode_block(
            row,
            dead: np.ndarray | None,
            allowed: np.ndarray | None,
            excluded: np.ndarray | None,
        ) -> tuple[np.ndarray, np.ndarray]:
            gaps = varint_decode(row.doc_gaps, row.count)
            docs = np.cumsum(gaps).astype(np.int64)
            tf = varint_decode(row.tfs, row.count).astype(np.float64)
            dl = varint_decode(row.dls, row.count).astype(np.float64)
            if allowed is not None or excluded is not None or dead is not None:
                live = (
                    np.isin(docs, allowed)
                    if allowed is not None
                    else np.ones(len(docs), dtype=bool)
                )
                if excluded is not None and excluded.size:
                    live &= ~np.isin(docs, excluded)
                if dead is not None and dead.size:
                    live &= ~np.isin(docs, dead)
                docs, tf, dl = docs[live], tf[live], dl[live]
            denom = tf + k1 * (1.0 - b + b * (dl / avgdl if avgdl else 1.0))
            return docs, tf * (k1 + 1.0) / denom

        def _topk_local(docs: np.ndarray, scores: np.ndarray) -> pd.DataFrame:
            uniq, inv = np.unique(docs, return_inverse=True)
            sums = np.zeros(len(uniq), dtype=np.float64)
            np.add.at(sums, inv, scores)
            if mm_n is not None:
                m = np.bincount(inv, minlength=len(uniq)) >= mm_n
                uniq, sums = uniq[m], sums[m]
            if a_s is not None:
                m = _after_mask(uniq, sums)
                uniq, sums = uniq[m], sums[m]
            if min_score is not None:
                m = sums >= min_score - 1e-6
                uniq, sums = uniq[m], sums[m]
                order = np.lexsort((uniq, -np.round(sums, 6)))
            else:
                order = np.lexsort((uniq, -np.round(sums, 6)))[:kk]
            return pd.DataFrame({"doc_id": uniq[order], "score": sums[order]})

        def score_segment_and(
            pdf: pd.DataFrame,
            dead: np.ndarray | None,
            allowed: np.ndarray | None,
            excluded: np.ndarray | None,
        ) -> pd.DataFrame:
            """Conjunction (q.op=AND) via smallest-list-driven intersection
            with block skipping -- Lucene's ConjunctionDISI shape behind the
            reference's BooleanQuery (solrconfig.xml:667-671). A segment
            missing ANY query term returns without decoding a byte; otherwise
            the rarest term's postings seed the candidate set and each wider
            term decodes ONLY blocks whose [min_doc, max_doc] range contains
            a surviving candidate (sorted searchsorted interval test), so an
            AND of one rare + one hot term never touches the hot term's
            postings outside the rare term's doc ranges."""
            empty = pd.DataFrame({"doc_id": [], "score": []}).astype(
                {"doc_id": "int64", "score": "float64"}
            )
            pdf = pdf[pdf["term"].map(bidf.__contains__)]
            if pdf["term"].nunique() < n_query_terms:
                return empty  # some conjunct absent here: segment skipped
            groups = sorted(
                pdf.groupby("term", sort=False),
                key=lambda kv: int(kv[1]["count"].sum()),
            )
            # seed: rarest list, with tombstone/fq filters applied once --
            # every later intersection inherits them through the candidates
            t0, g0 = groups[0]
            w0 = bidf[t0]
            parts_d, parts_s = [], []
            for row in g0.itertuples(index=False):
                d, s = _decode_block(row, dead, allowed, excluded)
                parts_d.append(d)
                parts_s.append(w0 * s)
            cand = np.concatenate(parts_d) if parts_d else np.empty(0, np.int64)
            if not len(cand):
                return empty
            score = np.concatenate(parts_s)
            order = np.argsort(cand)  # one posting per (term, doc): unique
            cand, score = cand[order], score[order]
            for t, g in groups[1:]:
                wt = bidf[t]
                bmin = g["min_doc"].to_numpy(np.int64)
                bmax = g["max_doc"].to_numpy(np.int64)
                hit_blocks = np.flatnonzero(
                    np.searchsorted(cand, bmin, "left")
                    < np.searchsorted(cand, bmax, "right")
                )
                if not len(hit_blocks):
                    return empty
                rows = list(g.itertuples(index=False))
                td_parts, ts_parts = [], []
                for i in hit_blocks:
                    d, s = _decode_block(rows[i], None, None, None)
                    td_parts.append(d)
                    ts_parts.append(s)
                td = np.concatenate(td_parts)
                ts = np.concatenate(ts_parts)
                o = np.argsort(td)
                td, ts = td[o], ts[o]
                pos = np.searchsorted(td, cand)
                pos_c = np.minimum(pos, len(td) - 1)
                keep = td[pos_c] == cand
                if not keep.any():
                    return empty
                cand = cand[keep]
                score = score[keep] + wt * ts[pos_c[keep]]
            if a_s is not None:
                m = _after_mask(cand, score)
                cand, score = cand[m], score[m]
            if min_score is not None:
                m = score >= min_score - 1e-6
                cand, score = cand[m], score[m]
                order = np.lexsort((cand, -np.round(score, 6)))
            else:
                order = np.lexsort((cand, -np.round(score, 6)))[:kk]
            return pd.DataFrame({"doc_id": cand[order], "score": score[order]})

        # below this many postings a single vector pass beats skipping;
        # overridable (tests force 0 to exercise the zone path on tiny data)
        EXHAUSTIVE_CUTOFF = getattr(self, "exhaustive_cutoff", 1 << 15)

        def score_segment(
            pdf: pd.DataFrame,
            dead: np.ndarray | None,
            allowed: np.ndarray | None,
            excluded: np.ndarray | None,
        ) -> pd.DataFrame:
            empty = pd.DataFrame({"doc_id": [], "score": []}).astype(
                {"doc_id": "int64", "score": "float64"}
            )
            pdf = pdf[pdf["term"].map(bidf.__contains__)]
            if not len(pdf):
                return empty
            n_post = int(pdf["count"].sum())
            w = pdf["term"].map(bidf).to_numpy(np.float64)

            if n_post <= EXHAUSTIVE_CUTOFF:
                # small segment: single vectorized OR-sum, exactly equivalent
                parts_d, parts_s = [], []
                for i, row in enumerate(pdf.itertuples(index=False)):
                    d, s = _decode_block(row, dead, allowed, excluded)
                    parts_d.append(d)
                    parts_s.append(w[i] * s)
                cat_d = np.concatenate(parts_d)
                if not len(cat_d):
                    return empty
                return _topk_local(cat_d, np.concatenate(parts_s))

            # ---- block-max WAND (zone form) -------------------------------
            # Zones are fixed doc-ranges of the segment. A doc's per-term
            # contribution is bounded by idf * tf_norm(max_tf, min_dl) of the
            # ONE block containing it -- tf_norm is increasing in tf and
            # decreasing in dl, and the bound is evaluated with the CURRENT
            # global avgdl, so it holds even when avgdl drifted after the
            # block was written (streaming appends). That block overlaps the
            # doc's zone, so ub(zone) = sum_t idf_t * max(block bound of
            # t-blocks overlapping the zone) bounds every doc in the zone.
            # Zones are
            # scored exactly in descending-ub order; once the running k-th
            # best exceeds the next zone's ub, every remaining zone (and all
            # its un-decoded blocks) is skipped. Exact by construction.
            lo = int(pdf["min_doc"].min())
            hi = int(pdf["max_doc"].max())
            n_zones = min(64, max(8, n_post // (1 << 13)))
            span = max((hi - lo + 1 + n_zones - 1) // n_zones, 1)
            z_of = lambda d: (d - lo) // span  # noqa: E731

            bmin = pdf["min_doc"].to_numpy(np.int64)
            bmax = pdf["max_doc"].to_numpy(np.int64)
            bmt = pdf["max_tf"].to_numpy(np.float64)
            bml = pdf["min_dl"].to_numpy(np.float64)
            ub_blk = w * (
                bmt * (k1 + 1.0)
                / (bmt + k1 * (1.0 - b + b * (bml / avgdl if avgdl else 1.0)))
            )
            terms_arr = pdf["term"].to_numpy(object)
            uniq_terms, term_idx = np.unique(terms_arr, return_inverse=True)
            nz = int(z_of(hi)) + 1
            # per (zone, term) max block ub, then sum over terms
            zt = np.zeros((nz, len(uniq_terms)), dtype=np.float64)
            z0 = (bmin - lo) // span
            z1 = (bmax - lo) // span
            for i in range(len(pdf)):
                zt[z0[i] : z1[i] + 1, term_idx[i]] = np.maximum(
                    zt[z0[i] : z1[i] + 1, term_idx[i]], ub_blk[i]
                )
            ub_zone = zt.sum(axis=1)
            zone_order = np.argsort(-ub_zone, kind="stable")

            rows = list(pdf.itertuples(index=False))
            decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}
            best_d = np.empty(0, dtype=np.int64)
            best_s = np.empty(0, dtype=np.float64)
            # threshold-collection mode: theta is FIXED at min_score (the
            # zone skip needs no evolving k-th best -- every doc at or
            # above the threshold is a result). Survivors accumulate in
            # LISTS, one concatenate at the end -- per-zone concatenation
            # of a large candidate set is quadratic memory traffic
            # (measured 4x blowup on flat-score shapes).
            theta = -np.inf if min_score is None else min_score
            keep_d: list[np.ndarray] = []
            keep_s: list[np.ndarray] = []
            blocks_by_zone: list[list[int]] = [[] for _ in range(nz)]
            for i in range(len(rows)):
                for z in range(z0[i], z1[i] + 1):
                    blocks_by_zone[z].append(i)
            # 1e-6 margin: theta is the round-to-6 k-th key; a doc with true
            # score in (theta - 5e-7, theta) still ROUNDS to theta and can
            # win its tie on doc_id, so only zones provably below that band
            # may be skipped -- keeps rank-identity exact.
            for z in zone_order:
                if ub_zone[z] < theta - 1e-6:  # sorted desc -> all rest skip
                    continue
                zlo, zhi = lo + z * span, lo + (z + 1) * span - 1
                parts_d, parts_s = [], []
                for i in blocks_by_zone[z]:
                    if i not in decoded:
                        decoded[i] = _decode_block(rows[i], dead, allowed, excluded)
                    d, s = decoded[i]
                    m = (d >= zlo) & (d <= zhi)
                    if m.any():
                        parts_d.append(d[m])
                        parts_s.append(w[i] * s[m])
                if not parts_d:
                    continue
                zd = np.concatenate(parts_d)
                zs = np.concatenate(parts_s)
                uniq, inv = np.unique(zd, return_inverse=True)
                sums = np.zeros(len(uniq), dtype=np.float64)
                np.add.at(sums, inv, zs)
                if mm_n is not None:
                    m = np.bincount(inv, minlength=len(uniq)) >= mm_n
                    uniq, sums = uniq[m], sums[m]
                if a_s is not None:
                    m = _after_mask(uniq, sums)
                    uniq, sums = uniq[m], sums[m]
                if min_score is not None:
                    m = sums >= min_score - 1e-6
                    keep_d.append(uniq[m])
                    keep_s.append(sums[m])
                    continue
                best_d = np.concatenate([best_d, uniq])
                best_s = np.concatenate([best_s, sums])
                if len(best_d) > kk:
                    order = np.lexsort((best_d, -np.round(best_s, 6)))[:kk]
                    best_d, best_s = best_d[order], best_s[order]
                if len(best_d) >= kk:
                    theta = float(np.round(best_s, 6).min())
            if min_score is not None:
                if not keep_d:
                    return empty
                best_d = np.concatenate(keep_d)
                best_s = np.concatenate(keep_s)
                if not len(best_d):
                    return empty
                order = np.lexsort((best_d, -np.round(best_s, 6)))
                return pd.DataFrame(
                    {"doc_id": best_d[order], "score": best_s[order]}
                )
            if not len(best_d):
                return empty
            order = np.lexsort((best_d, -np.round(best_s, 6)))[:kk]
            return pd.DataFrame({"doc_id": best_d[order], "score": best_s[order]})

        kernel = score_segment_and if op == "AND" else score_segment

        pruned = post.select(
            "term", "segment_id", "salt", "block_id", "count",
            "min_doc", "max_doc", "max_tf", "min_dl", "doc_gaps", "tfs", "dls",
        )
        side, fq_repr = self._side_frame(fq)
        if side is None:
            return pruned.groupBy("segment_id").applyInPandas(
                lambda key, pdf: kernel(pdf, None, None, None),
                schema=_SCORE_ROW,
            )

        # fq-aware WAND: the fq/tombstone doc ids arrive as the cogroup side
        # of each segment (the MINORITY representation, bounded by
        # segment_size per kernel call); the kernel filters candidates BEFORE
        # local top-k, so zone skipping stays exact under fq instead of
        # falling back to an exhaustive decode.
        FQ_INCLUDE, FQ_EXCLUDE = self._FQ_INCLUDE, self._FQ_EXCLUDE

        def cogrouped(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            # a cogroup side absent from a segment arrives as an EMPTY
            # frame WITHOUT columns (found by the r5 /select fuzz: a rare
            # term + fq hits segments that have fq rows but no postings).
            # Empty left: nothing to score. Empty right: no tombstones
            # and, under the include representation, NO allowed docs --
            # the empty allowed array filters everything, exactly right.
            if "term" not in left.columns or not len(left):
                return pd.DataFrame({"doc_id": [], "score": []}).astype(
                    {"doc_id": "int64", "score": "float64"}
                )
            if "kind" not in right.columns:
                right = pd.DataFrame({
                    "doc_id": pd.Series([], dtype="int64"),
                    "kind": pd.Series([], dtype="int64"),
                })
            dead = np.sort(right.loc[right["kind"] == 0, "doc_id"].to_numpy(np.int64))
            allowed = excluded = None
            if fq_repr == FQ_INCLUDE:
                allowed = np.sort(
                    right.loc[right["kind"] == FQ_INCLUDE, "doc_id"].to_numpy(np.int64)
                )
            elif fq_repr == FQ_EXCLUDE:
                excluded = np.sort(
                    right.loc[right["kind"] == FQ_EXCLUDE, "doc_id"].to_numpy(np.int64)
                )
            return kernel(left, dead if dead.size else None, allowed, excluded)

        return (
            pruned.groupBy("segment_id")
            .cogroup(side.groupBy("segment_id"))
            .applyInPandas(cogrouped, schema=_SCORE_ROW)
        )
