"""edismax ``qf`` multi-field DisMax retrieval -- one index per field.

Solr's ExtendedDismaxQParser (the reference deploys the stock /select
handler its configset configures; edismax is how multi-field Solr queries
are written in practice) turns each whitespace clause of ``q`` into a
DisjunctionMaxQuery across the ``qf`` fields:

    score(doc) = sum over clauses c of
        [ max over fields f of s(f, c, doc)
          + tie * (sum of the other fields' s(f, c, doc)) ]

with ``s(f, c, doc)`` = the clause's BM25 score against field f times the
field's ``qf`` boost (``qf=text^2 tool``) times the clause's own ``^``
boost. Lucene keys every term by ``(field, text)`` and keeps per-field
norms -- which is exactly what ONE INDEX PER FIELD gives us: each field's
df, dl, avgdl and analysis chain are its own (a different analyzer per
field is first-class: the query clause is re-analyzed per field, Lucene
behavior). All indexes share the same stable doc-id assignment
(index/docids.py is deterministic over (conv_id, turn_idx)), so per-doc
combination is a plain groupBy -- no cross-index id mapping ever exists.

Engine semantics note (documented deviation): idf uses the index-wide doc
count N -- the same convention the single-field engine applies to docs
with empty text -- not Lucene's per-field docCount. The DuckDB oracle and
the brute-force pytest both pin this definition.

Plan shape (10^12-turn posture):
- per field: ONE pruned postings scan (bucket partition pruning + term
  pushdown, identical to the single-field exhaustive path) -> Arrow decode
  kernel emitting (clause, doc_id, partial) -- never raw tokens;
- union -> per-(clause, field, doc) sum  [skipped entirely when every
  clause analyzes to <=1 term per field, the common case]
  -> per-(clause, doc) max+tie combine -> per-doc sum; all three are
  partial-agg shuffles whose key count shrinks at every step;
- top-k via the canonical (round6 score, doc_id) sort. The exhaustive
  decode matches :meth:`BM25Index.score_matches`'s cost class; the
  block-max upper bound for a future pruned path is
  ub(clause) = max_f ub_f + tie * sum of other fields' ub_f (Block-Max
  WAND generalizes to DisMax because max and + are monotone) -- recorded
  in PLANS.md.

Reference parity anchors: edismax qf/tie are Solr-public semantics
(solr ExtendedDismaxQParser); the reference's configset wires /select
with df=_text_ (default-base-config/solrconfig.xml) and leaves qf to the
request, which is what :func:`solr_select` accepts here.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import replace
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import B, K1
from ..functions.codec import varint_decode
from ..index.build import BuildConfig, build_index
from .engine import BM25Index

__all__ = ["MultiFieldIndex", "build_multi_field_index", "parse_qf"]

_CLAUSE_ROW = T.StructType(
    [
        T.StructField("clause", T.IntegerType(), False),
        T.StructField("fld", T.IntegerType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

_SCORE_ROW = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

_QF_RE = re.compile(r"^([A-Za-z_][\w.]*)(?:\^(\d+(?:\.\d+)?))?$")


def parse_qf(qf: str | dict[str, float]) -> dict[str, float]:
    """Solr ``qf`` grammar: whitespace-separated ``field[^boost]`` entries
    (``qf=text^2 tool``). Dicts pass through. Fails loud on malformed
    entries or duplicate fields (Solr keeps the last; silent param loss is
    against this facade's contract)."""
    if isinstance(qf, dict):
        out = {str(f): float(b) for f, b in qf.items()}
    else:
        out = {}
        for tok in str(qf).split():
            m = _QF_RE.match(tok)
            if m is None:
                raise ValueError(f"qf: malformed entry {tok!r}")
            f = m.group(1)
            if f in out:
                raise ValueError(f"qf: duplicate field {f!r}")
            out[f] = float(m.group(2)) if m.group(2) else 1.0
    if not out:
        raise ValueError("qf: at least one field required")
    for f, b in out.items():
        if b <= 0:
            raise ValueError(f"qf: boost for {f!r} must be > 0, got {b}")
    return out


def build_multi_field_index(
    spark: SparkSession,
    transcripts: DataFrame,
    base_dir: str,
    fields: tuple[str, ...] | list[str],
    config: BuildConfig | None = None,
    analyzers: dict[str, str] | None = None,
) -> "MultiFieldIndex":
    """Build one per-field index per entry of ``fields`` under
    ``base_dir/field=<name>/`` (all sharing the deterministic doc-id
    assignment) and record the field list in ``fields.json``. Resumable:
    each per-field build is manifest-committed independently, so a crash
    mid-build resumes from the last committed per-field step."""
    fields = tuple(fields)
    if not fields:
        raise ValueError("fields: at least one field required")
    cfg = config or BuildConfig()
    analyzers = analyzers or {}
    bad = set(analyzers) - set(fields)
    if bad:
        raise ValueError(f"analyzers for unknown fields: {sorted(bad)}")
    missing = set(fields) - set(transcripts.columns)
    if missing:
        raise ValueError(f"fields not in the input table: {sorted(missing)}")
    os.makedirs(base_dir, exist_ok=True)
    for f in fields:
        fcfg = replace(
            cfg,
            text_col=f,
            analyzer=analyzers.get(f, cfg.analyzer),
            build_id=f"{cfg.build_id}-{f}",
        )
        build_index(spark, transcripts, os.path.join(base_dir, f"field={f}"), fcfg)
    meta = {"fields": list(fields),
            "analyzers": {f: analyzers.get(f, cfg.analyzer) for f in fields}}
    tmp = os.path.join(base_dir, "fields.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(base_dir, "fields.json"))
    return MultiFieldIndex(spark, base_dir)


class MultiFieldIndex:
    """Handle over a per-field index family built by
    :func:`build_multi_field_index`. Field order (and hence the ``fld``
    kernel ordinal and the stored-field primary) comes from ``fields.json``,
    so results are deterministic across handles."""

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        meta_path = os.path.join(base_dir, "fields.json")
        if not os.path.exists(meta_path):
            raise ValueError(
                f"{base_dir!r} is not a multi-field index (no fields.json; "
                f"build with build_multi_field_index)"
            )
        with open(meta_path) as fh:
            meta = json.load(fh)
        self.fields: list[str] = list(meta["fields"])
        self.engines: dict[str, BM25Index] = {
            f: BM25Index(spark, os.path.join(base_dir, f"field={f}"))
            for f in self.fields
        }
        self.primary = self.engines[self.fields[0]]

    # -- maintenance -----------------------------------------------------------

    def delete_by_query(self, predicate: str) -> int:
        """Tombstone matching docs in EVERY per-field index (the doc dies
        everywhere at once -- Solr has one liveDocs per document, not per
        field). All indexes store all columns, so the same predicate selects
        the same victims; returns the per-index count (asserted equal)."""
        counts = {f: e.delete_by_query(predicate)
                  for f, e in self.engines.items()}
        if len(set(counts.values())) != 1:
            raise RuntimeError(
                f"per-field tombstone counts diverged: {counts} -- the "
                f"per-field docs tables are out of sync"
            )
        return next(iter(counts.values()))

    def _anti_dead_all(self, df: DataFrame) -> DataFrame:
        """Anti-join the union of every engine's tombstones (defensive:
        normally identical sets, see :meth:`delete_by_query`)."""
        deads = [e._tombstones_df() for e in self.engines.values()]
        deads = [d for d in deads if d is not None]
        if not deads:
            return df
        dead = deads[0]
        for d in deads[1:]:
            dead = dead.unionByName(d)
        return df.join(dead.distinct(), "doc_id", "left_anti")

    # -- the qf query ----------------------------------------------------------

    def search(
        self,
        query: str,
        qf: str | dict[str, float],
        tie: float = 0.0,
        k: int = 10,
        op: str = "OR",
        mm: int | str | None = None,
        fq: str | list[str] | None = None,
        offset: int = 0,
        with_stored: bool = False,
        fl: list[str] | None = None,
        order_key: str = "round6",
        pf: str | dict[str, float] | None = None,
        ps: int = 0,
        pf2: str | dict[str, float] | None = None,
        ps2: int | None = None,
        pf3: str | dict[str, float] | None = None,
        ps3: int | None = None,
    ) -> DataFrame:
        """Top-k edismax DisMax over the qf fields: the canonical
        (round6 score desc, doc_id asc) cut of :meth:`score_matches`,
        plus the edismax phrase boosts (``pf``/``pf2``/``pf3`` with
        ``ps``/``ps2``/``ps3`` slop) when requested -- see
        :meth:`phrase_boosts`. Boosts ADD score to docs already in the
        main match set and never change the DocSet (Lucene's optional
        phrase clauses can only match docs whose terms already match),
        so ``count_matches`` is pf-independent by construction."""
        scored = self.score_matches(query, qf, tie=tie, op=op, mm=mm, fq=fq)
        boosts = self.phrase_boosts(
            query, pf=pf, ps=ps, pf2=pf2, ps2=ps2, pf3=pf3, ps3=ps3)
        if boosts is not None:
            # left join on doc_id: the main side is already hash-partitioned
            # by doc_id (score_matches' single combine shuffle), so only the
            # small phrase-boost relation shuffles here
            scored = (
                scored.join(boosts, "doc_id", "left")
                .withColumn(
                    "score",
                    F.col("score") + F.coalesce(F.col("boost"), F.lit(0.0)),
                )
                .drop("boost")
            )
        return self.primary._finish(
            scored, k, offset, with_stored, order_key, fl)

    def phrase_boosts(
        self,
        query: str,
        pf: str | dict[str, float] | None = None,
        ps: int = 0,
        pf2: str | dict[str, float] | None = None,
        ps2: int | None = None,
        pf3: str | dict[str, float] | None = None,
        ps3: int | None = None,
    ) -> DataFrame | None:
        """The edismax phrase-boost relation ``(doc_id, boost)`` or None
        when no pf param is given / the query has <2 words. Semantics per
        ExtendedDismaxQParser: the clause TEXTS of ``q`` (``^`` clause
        boosts stripped -- Lucene builds the phrases from the bare user
        words) form one whole-query phrase per ``pf`` field, consecutive
        bigrams per ``pf2`` field, trigrams per ``pf3`` field; each phrase
        scores as that FIELD's BM25 phrase query (the field's own analysis
        chain re-tokenizes the window -- :meth:`BM25Index.phrase_matches`)
        times the pf entry's ``^boost``; a doc's boost is the sum over all
        matching windows x fields. ``ps`` slops the pf phrase; ps2/ps3
        default to ps (Solr). Positions are required on the pf fields'
        indexes (store_positions=True, the build default).

        Plan shape: each (field, window) is one pruned positional-postings
        scan + Arrow phrase kernel -- the same cost class as a user phrase
        query -- unioned and partially aggregated on doc_id; window count
        is O(words), independent of corpus size."""
        if pf is None and pf2 is None and pf3 is None:
            return None
        words = []
        for tok in query.split():
            m = BM25Index._BOOST_RE.search(tok)
            text = tok[: m.start()] if m else tok
            if text:
                words.append(text)
        frames: list[DataFrame] = []
        for spec, slop, n in (
            (pf, int(ps), len(words)),
            (pf2, int(ps if ps2 is None else ps2), 2),
            (pf3, int(ps if ps3 is None else ps3), 3),
        ):
            if spec is None or len(words) < max(n, 2):
                continue
            fmap = parse_qf(spec)
            unknown = set(fmap) - set(self.fields)
            if unknown:
                raise ValueError(
                    f"pf fields not in this index family: {sorted(unknown)} "
                    f"(built: {self.fields})"
                )
            for f, fboost in fmap.items():
                eng = self.engines[f]
                for i in range(len(words) - n + 1):
                    ph = " ".join(words[i:i + n])
                    frames.append(
                        eng.phrase_matches(ph, slop=slop).select(
                            "doc_id",
                            (F.col("score") * float(fboost)).alias("boost"),
                        )
                    )
        if not frames:
            return None
        u = frames[0]
        for fr in frames[1:]:
            u = u.unionByName(fr)
        return u.groupBy("doc_id").agg(F.sum("boost").alias("boost"))

    def count_matches(
        self,
        query: str,
        qf: str | dict[str, float],
        tie: float = 0.0,
        op: str = "OR",
        mm: int | str | None = None,
        fq: str | list[str] | None = None,
    ) -> int:
        """Exact DocSet size for a qf query (the facade's numFound)."""
        return self.score_matches(query, qf, tie=tie, op=op, mm=mm,
                                  fq=fq).count()

    def score_matches(
        self,
        query: str,
        qf: str | dict[str, float],
        tie: float = 0.0,
        op: str = "OR",
        mm: int | str | None = None,
        fq: str | list[str] | None = None,
    ) -> DataFrame:
        """The full scored DisMax match set as (doc_id, score) -- fq and
        tombstones applied, no ordering/limit (module docstring has the
        score formula). op/mm apply to CLAUSES: a clause matches a doc
        when any qf field matches it (Lucene's dismax clause is one
        BooleanClause). A clause that analyzes to no in-dictionary term in
        ANY field is unmatchable: it empties an AND query and still counts
        toward mm's clause total (the single-field engine's OOV
        convention)."""
        qfm = parse_qf(qf)
        unknown = set(qfm) - set(self.fields)
        if unknown:
            raise ValueError(
                f"qf fields not in this index family: {sorted(unknown)} "
                f"(built: {self.fields})"
            )
        if not (0.0 <= float(tie) <= 1.0):
            raise ValueError(f"tie must be in [0, 1], got {tie}")
        tie = float(tie)

        # clauses: raw whitespace tokens with optional trailing ^boost --
        # analysis happens PER FIELD below (each field's own chain)
        clauses: list[tuple[str, float]] = []
        for tok in query.split():
            m = BM25Index._BOOST_RE.search(tok)
            cb = float(m.group(1)) if m else 1.0
            text = tok[: m.start()] if m else tok
            if text:
                clauses.append((text, cb))
        n_clauses = len(clauses)
        mm_n = self.primary._norm_mm(mm, n_clauses) if op != "AND" else None
        empty = self.spark.createDataFrame([], _SCORE_ROW)
        if not clauses:
            return empty

        # per field: term -> [(clause_idx, weight)] with weight =
        # qf_boost * clause_boost * idf_field(term)
        tmaps: dict[str, dict[str, list[tuple[int, float]]]] = {}
        multi_term = False
        clause_live = [False] * n_clauses
        for f, fboost in qfm.items():
            eng = self.engines[f]
            tmap: dict[str, list[tuple[int, float]]] = {}
            per_clause_terms: list[list[str]] = [
                eng.analyze_query(text) for text, _ in clauses
            ]
            idf = eng.idf_map(
                sorted({t for ts in per_clause_terms for t in ts})
            )
            for ci, ((_, cb), ts) in enumerate(zip(clauses, per_clause_terms)):
                live = [t for t in ts if t in idf]
                if len(live) > 1:
                    multi_term = True
                for t in live:
                    clause_live[ci] = True
                    tmap.setdefault(t, []).append((ci, fboost * cb * idf[t]))
            if tmap:
                tmaps[f] = tmap
        if op == "AND" and not all(clause_live):
            return empty
        n_live = sum(clause_live)
        if n_live == 0 or (mm_n is not None and mm_n > n_live):
            return empty

        frames = [
            _clause_partials(self.engines[f], tmaps[f], fld=fi)
            for fi, f in enumerate(self.fields)
            if f in tmaps
        ]
        u = frames[0]
        for fr in frames[1:]:
            u = u.unionByName(fr)
        # ONE shuffle for the whole combine: doc_id is a subset of every
        # grouping key below ((clause,fld,doc) -> (clause,doc) -> (doc)),
        # so hash-partitioning the kernel output by doc_id satisfies all
        # three ClusteredDistributions and Catalyst inserts no further
        # Exchange (plan-asserted in tests/test_multifield_qf.py). Map-side
        # combine loses nothing: kernel rows arrive partitioned by TERM
        # bucket, so same-doc rows never share an input partition.
        u = u.repartition(F.col("doc_id"))
        if multi_term:
            # a clause analyzed to >1 term in some field (splitting chains,
            # stemmer fan-out): that field's clause score is the SUM over
            # its terms (a boolean-OR field query), combined per clause
            u = u.groupBy("clause", "fld", "doc_id").agg(
                F.sum("score").alias("score")
            )
        per_clause = u.groupBy("clause", "doc_id").agg(
            F.max("score").alias("mx"), F.sum("score").alias("sm")
        )
        dismax = (F.col("mx") + tie * (F.col("sm") - F.col("mx"))).alias("ds")
        agg = per_clause.select("clause", "doc_id", dismax).groupBy(
            "doc_id"
        ).agg(F.sum("ds").alias("score"), F.count("*").alias("nt"))
        if op == "AND":
            scored = agg.filter(F.col("nt") == n_live).drop("nt")
        elif mm_n is not None:
            scored = agg.filter(F.col("nt") >= mm_n).drop("nt")
        else:
            scored = agg.drop("nt")
        scored = self.primary._apply_fq(scored, self.primary._norm_fq(fq))
        return self._anti_dead_all(scored)


def _clause_partials(
    engine: BM25Index, tmap: dict[str, list[tuple[int, float]]], fld: int
) -> DataFrame:
    """One field's (clause, fld, doc_id, partial) relation: ONE pruned
    postings scan decoded in an Arrow kernel (the per-field analog of
    BM25Index._decode_score_df, clause identity kept for the DisMax
    combine). Tombstones are NOT applied here -- the caller anti-joins
    after aggregation, the exhaustive-path contract."""
    k1, b, avgdl = K1, B, engine.avgdl
    bmap = {t: list(cws) for t, cws in tmap.items()}

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for row in pdf.itertuples(index=False):
                cws = bmap.get(row.term)
                if not cws:
                    continue
                gaps = varint_decode(row.doc_gaps, row.count)
                docs = np.cumsum(gaps).astype(np.int64)
                tf = varint_decode(row.tfs, row.count).astype(np.float64)
                dl = varint_decode(row.dls, row.count).astype(np.float64)
                base = tf * (k1 + 1.0) / (
                    tf + k1 * (1.0 - b + b * (dl / avgdl if avgdl else 1.0))
                )
                for clause, w in cws:
                    outs.append(pd.DataFrame({
                        "clause": np.full(len(docs), clause, dtype=np.int32),
                        "fld": np.full(len(docs), fld, dtype=np.int32),
                        "doc_id": docs,
                        "score": w * base,
                    }))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    cols = ["term", "count", "doc_gaps", "tfs", "dls"]
    return engine.postings_for(list(bmap)).select(*cols).mapInPandas(
        decode, schema=_CLAUSE_ROW
    )
