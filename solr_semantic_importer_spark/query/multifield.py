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
        so ``count_matches`` is pf-independent by construction.

        Physical dispatch: the unfiltered hot path (no fq, no per-field
        tombstones, no phrase boosts) takes :meth:`wand_matches` -- zone
        Block-Max WAND generalized to the DisMax combiner, per-segment
        top-k candidates only, rank-identical to the exhaustive combine;
        anything filtered/boosted takes the exhaustive
        :meth:`score_matches` (those filters would otherwise have to
        apply inside the pruning kernel before theta)."""
        if (fq is None and k > 0
                and all(p is None for p in (pf, pf2, pf3))
                and not any(e._tombstones_df() is not None
                            for e in self.engines.values())):
            cand = self.wand_matches(query, qf, k=k + offset, tie=tie,
                                     op=op, mm=mm)
            return self.primary._finish(
                cand, k, offset, with_stored, order_key, fl)
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

    def wand_matches(
        self,
        query: str,
        qf: str | dict[str, float],
        k: int,
        tie: float = 0.0,
        op: str = "OR",
        mm: int | str | None = None,
    ) -> DataFrame:
        """Top-k DisMax candidates via Block-Max WAND generalized to the
        DisMax combiner (PLANS.md "edismax qf DisMax": the per-clause zone
        upper bound ``ub(clause) = max_f ub_f + tie * sum of the other
        fields' ub_f`` is monotone in each field bound, so zone skipping
        stays exact). Emits each segment's local top-k -- a doc's postings
        for EVERY field live in its segment (the family shares the doc-id
        assignment and segment_size), so per-doc DisMax scores are
        complete inside one kernel call and the global top-k is a cut of
        the per-segment candidates.

        Scope: the pruned path serves the no-filter hot path -- callers
        apply it only when fq is empty and no per-field tombstones exist
        (both would have to filter INSIDE the kernel before theta, the
        cogroup machinery the single-field engine has; here the exhaustive
        path serves filtered queries). Rank-identity with the exhaustive
        combine is pinned by tests/test_multifield_wand.py across
        op/mm/tie/clause-boost shapes with the zone path forced."""
        plan = self._plan(query, qf, float(tie), op, mm)
        empty = self.spark.createDataFrame([], _SCORE_ROW)
        if plan is None:
            return empty
        tmaps, _multi, n_live, mm_n = plan
        sizes = {self.engines[f].segment_size for f in self.fields}
        if len(sizes) != 1:
            raise ValueError(
                f"per-field segment sizes diverge ({sizes}): the family "
                f"was not built by build_multi_field_index"
            )
        tie_f, kk = float(tie), max(int(k), 1)
        k1, b = K1, B
        avgdls = {fi: self.engines[f].avgdl
                  for fi, f in enumerate(self.fields)}
        # (fld, term) -> [(clause, weight)]
        cw = {(fi, t): list(pairs)
              for fi, f in enumerate(self.fields) if f in tmaps
              for t, pairs in tmaps[f].items()}
        need_n = n_live if op == "AND" else mm_n  # matched-clause floor
        NF = len(self.fields)

        cols = ["term", "segment_id", "count", "min_doc", "max_doc",
                "max_tf", "min_dl", "doc_gaps", "tfs", "dls"]
        frames = [
            self.engines[f].postings_for(list(tmaps[f]))
            .select(*cols).withColumn("fld", F.lit(fi))
            for fi, f in enumerate(self.fields) if f in tmaps
        ]
        post = frames[0]
        for fr in frames[1:]:
            post = post.unionByName(fr)
        cutoff = getattr(self, "exhaustive_cutoff", 1 << 15)

        def combine(docs, vals, cls, flds):
            """(clause,fld,doc) partials -> per-doc DisMax scores.
            Packing budget: doc < 2^40, (clause*NF+fld) in the high bits
            (same convention as the phrase kernel's 2^24 position pack)."""
            key1 = ((cls.astype(np.uint64) * NF + flds.astype(np.uint64))
                    << np.uint64(40)) | docs.astype(np.uint64)
            u1, inv1 = np.unique(key1, return_inverse=True)
            s1 = np.zeros(len(u1))
            np.add.at(s1, inv1, vals)  # per-(clause,fld,doc) term sum
            key2 = ((u1 >> np.uint64(40)) // np.uint64(NF)
                    << np.uint64(40)) | (u1 & np.uint64((1 << 40) - 1))
            u2, inv2 = np.unique(key2, return_inverse=True)
            mx = np.full(len(u2), -np.inf)
            sm = np.zeros(len(u2))
            np.maximum.at(mx, inv2, s1)
            np.add.at(sm, inv2, s1)
            ds = mx + tie_f * (sm - mx)  # per-(clause,doc) DisMax
            d2 = (u2 & np.uint64((1 << 40) - 1)).astype(np.int64)
            u3, inv3 = np.unique(d2, return_inverse=True)
            tot = np.zeros(len(u3))
            np.add.at(tot, inv3, ds)
            if need_n is not None:
                nc = np.bincount(inv3, minlength=len(u3))
                m = nc >= need_n
                u3, tot = u3[m], tot[m]
            return u3, tot

        def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
            res_empty = pd.DataFrame({"doc_id": [], "score": []}).astype(
                {"doc_id": "int64", "score": "float64"})
            rows = list(pdf.itertuples(index=False))
            if not rows:
                return res_empty

            def decode(row):
                gaps = varint_decode(row.doc_gaps, row.count)
                docs = np.cumsum(gaps).astype(np.int64)
                tf = varint_decode(row.tfs, row.count).astype(np.float64)
                dl = varint_decode(row.dls, row.count).astype(np.float64)
                ad = avgdls[row.fld]
                base = tf * (k1 + 1.0) / (
                    tf + k1 * (1.0 - b + b * (dl / ad if ad else 1.0)))
                return docs, base

            def emit(parts):
                # parts: list of (docs, w*base, clause, fld) arrays
                docs = np.concatenate([p[0] for p in parts])
                if not len(docs):
                    return res_empty
                vals = np.concatenate([p[1] for p in parts])
                cls = np.concatenate([p[2] for p in parts])
                flds = np.concatenate([p[3] for p in parts])
                u, tot = combine(docs, vals, cls, flds)
                if not len(u):
                    return res_empty
                order = np.lexsort((u, -np.round(tot, 6)))[:kk]
                return pd.DataFrame({"doc_id": u[order],
                                     "score": tot[order]})

            def row_parts(i, zmask=None):
                d, base = dec(i)
                if zmask is not None:
                    d, base = d[zmask(d)], base[zmask(d)]
                out = []
                for c, w in cw[(rows[i].fld, rows[i].term)]:
                    out.append((d, w * base,
                                np.full(len(d), c, np.int64),
                                np.full(len(d), rows[i].fld, np.int64)))
                return out

            decoded: dict[int, tuple] = {}

            def dec(i):
                if i not in decoded:
                    decoded[i] = decode(rows[i])
                return decoded[i]

            n_post = int(pdf["count"].sum())
            if n_post <= cutoff:
                parts = [p for i in range(len(rows)) for p in row_parts(i)]
                return emit(parts)

            # ---- zone-form Block-Max WAND over the DisMax combiner ------
            lo = int(pdf["min_doc"].min())
            hi = int(pdf["max_doc"].max())
            n_zones = min(64, max(8, n_post // (1 << 13)))
            span = max((hi - lo + 1 + n_zones - 1) // n_zones, 1)
            nz = (hi - lo) // span + 1
            bmin = pdf["min_doc"].to_numpy(np.int64)
            bmax = pdf["max_doc"].to_numpy(np.int64)
            bmt = pdf["max_tf"].to_numpy(np.float64)
            bml = pdf["min_dl"].to_numpy(np.float64)
            ads = np.array([avgdls[f] for f in pdf["fld"]], dtype=np.float64)
            base_ub = bmt * (k1 + 1.0) / (
                bmt + k1 * (1.0 - b + b * np.where(ads > 0, bml / ads, 1.0)))
            # per (zone, (fld, term) slot) max base bound
            slot_keys = list(dict.fromkeys(
                (r.fld, r.term) for r in rows))
            slot_of = {kft: i for i, kft in enumerate(slot_keys)}
            srow = np.array([slot_of[(r.fld, r.term)] for r in rows])
            z0 = (bmin - lo) // span
            z1 = (bmax - lo) // span
            zslot = np.zeros((nz, len(slot_keys)))
            for i in range(len(rows)):
                zslot[z0[i]:z1[i] + 1, srow[i]] = np.maximum(
                    zslot[z0[i]:z1[i] + 1, srow[i]], base_ub[i])
            # per zone: clause -> field -> sum over slot term bounds
            all_clauses = sorted({c for ps in cw.values() for c, _ in ps})
            cpos = {c: i for i, c in enumerate(all_clauses)}
            # weight matrix W[(clause,fld) row, slot]: slot contributes
            # w to field-score bound of that clause
            ub_zone = np.zeros(nz)
            cf = np.zeros((nz, len(all_clauses), NF))
            for si, (fi, t) in enumerate(slot_keys):
                for c, w in cw[(fi, t)]:
                    cf[:, cpos[c], fi] += w * zslot[:, si]
            mxf = cf.max(axis=2)
            smf = cf.sum(axis=2)
            ub_zone = (mxf + tie_f * (smf - mxf)).sum(axis=1)

            zone_order = np.argsort(-ub_zone, kind="stable")
            blocks_by_zone: list[list[int]] = [[] for _ in range(nz)]
            for i in range(len(rows)):
                for z in range(z0[i], z1[i] + 1):
                    blocks_by_zone[z].append(i)
            best_d = np.empty(0, np.int64)
            best_s = np.empty(0, np.float64)
            theta = -np.inf
            for z in zone_order:
                if ub_zone[z] < theta - 1e-6:  # desc order: rest skip too
                    continue
                zlo, zhi = lo + z * span, lo + (z + 1) * span - 1
                parts = []
                for i in blocks_by_zone[z]:
                    parts.extend(row_parts(
                        i, zmask=lambda d: (d >= zlo) & (d <= zhi)))
                if not parts:
                    continue
                docs = np.concatenate([p[0] for p in parts])
                if not len(docs):
                    continue
                vals = np.concatenate([p[1] for p in parts])
                cls = np.concatenate([p[2] for p in parts])
                flds = np.concatenate([p[3] for p in parts])
                u, tot = combine(docs, vals, cls, flds)
                if not len(u):
                    continue
                best_d = np.concatenate([best_d, u])
                best_s = np.concatenate([best_s, tot])
                if len(best_d) > kk:
                    o = np.lexsort((best_d, -np.round(best_s, 6)))[:kk]
                    best_d, best_s = best_d[o], best_s[o]
                if len(best_d) >= kk:
                    theta = float(np.round(best_s, 6).min())
            if not len(best_d):
                return res_empty
            o = np.lexsort((best_d, -np.round(best_s, 6)))[:kk]
            return pd.DataFrame({"doc_id": best_d[o], "score": best_s[o]})

        return post.groupBy("segment_id").applyInPandas(
            kernel, schema=_SCORE_ROW)

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

    def _plan(
        self,
        query: str,
        qf: str | dict[str, float],
        tie: float,
        op: str,
        mm: int | str | None,
    ):
        """Shared query planning for the exhaustive and WAND paths:
        returns ``(tmaps, multi_term, n_live, mm_n)`` or None when the
        query provably matches nothing (OOV AND clause, no live clauses,
        unreachable mm). ``tmaps[field][term] = [(clause_idx, weight)]``
        with weight = qf_boost * clause_boost * idf_field(term)."""
        qfm = parse_qf(qf)
        unknown = set(qfm) - set(self.fields)
        if unknown:
            raise ValueError(
                f"qf fields not in this index family: {sorted(unknown)} "
                f"(built: {self.fields})"
            )
        if not (0.0 <= float(tie) <= 1.0):
            raise ValueError(f"tie must be in [0, 1], got {tie}")

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
        if not clauses:
            return None

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
            return None
        n_live = sum(clause_live)
        if n_live == 0 or (mm_n is not None and mm_n > n_live):
            return None
        return tmaps, multi_term, n_live, mm_n

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
        tie = float(tie)
        empty = self.spark.createDataFrame([], _SCORE_ROW)
        plan = self._plan(query, qf, tie, op, mm)
        if plan is None:
            return empty
        tmaps, multi_term, n_live, mm_n = plan

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
