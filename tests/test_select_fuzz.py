"""Differential fuzz of the /select param surface (VERDICT r4 item 2).

Single-path tests are strong; interacting params (q.op x mm x fq lists x
facet x sort x paging x bf) are where the next bug lives — r4's ADVICE
facet-op/mm bug was exactly this class. Each case draws a random-but-
seeded combination of params, runs it through solr_select, and checks
numFound, page ids (exact order), scores, and facet counts against a
self-contained pure-Python/numpy brute-force reference that shares ONLY
the frozen tokenizer spec (analyze_text) with the engine — stats (N,
avgdl, df), BM25, op/mm/fq/sort/paging/facet semantics are all
re-derived independently from the collected corpus, mirroring the
DuckDB oracle's definitions (oracle/duckdb_sql.py bm25_base_ctes).

Case count: SSI_FUZZ_CASES (default 150 — CI budget; raise for a deep
session run). Every failure reports its case number and params so a
discrepancy reproduces with the same seed.
"""

import functools
import math
import os
import random
from collections import Counter

import pytest

from solr_semantic_importer_spark import B, K1
from solr_semantic_importer_spark.functions.analysis import analyze_text
from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)
N_CASES = int(os.environ.get("SSI_FUZZ_CASES", "150"))
SEED = int(os.environ.get("SSI_FUZZ_SEED", "20260821"))


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=60, turns_per_conv=6, seed=77)
    idx_dir = str(tmp_path_factory.mktemp("fuzz"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="fuzz", **CFG))
    idx = BM25Index(spark, idx_dir)
    rows = [r.asDict() for r in idx.docs().collect()]
    return idx, Brute(rows)


class Brute:
    """Pure-Python reference /select. Shares only analyze_text with the
    engine; everything else re-derived (duckdb oracle definitions: N =
    all docs incl. empty, avgdl = mean dl, df = docs containing term,
    idf = ln(1+(N-df+0.5)/(df+0.5)), exact dl)."""

    def __init__(self, rows):
        self.rows = sorted(rows, key=lambda r: r["doc_id"])
        for r in self.rows:
            toks = analyze_text(r["text"])
            r["_tf"] = Counter(toks)
            r["_dl"] = len(toks)
        self.N = len(self.rows)
        self.avgdl = (
            sum(r["_dl"] for r in self.rows) / self.N if self.N else 0.0
        )
        self.df = Counter()
        for r in self.rows:
            self.df.update(r["_tf"].keys())

    def idf(self, t):
        return math.log(1 + (self.N - self.df[t] + 0.5) / (self.df[t] + 0.5))

    @staticmethod
    def parse_q(q):
        """(unique terms incl. OOV, boost map) — Lucene ^boost per clause,
        max boost wins for a repeated term."""
        terms, boosts = [], {}
        for clause in q.split():
            b = 1.0
            if "^" in clause:
                text, _, bs = clause.rpartition("^")
                try:
                    b = float(bs)
                    clause = text
                except ValueError:
                    pass
            for t in analyze_text(clause):
                terms.append(t)
                boosts[t] = max(boosts.get(t, 0.0), b)
        return list(dict.fromkeys(terms)), boosts

    @staticmethod
    def norm_mm(mm, n_clauses):
        if mm is None:
            return None
        if isinstance(mm, str) and mm.strip().endswith("%"):
            mm = (n_clauses * int(mm.strip()[:-1])) // 100
        mm = int(mm)
        return mm if mm > 1 else None

    def select(self, q, op="OR", mm=None, fq_preds=(), sort=None,
               start=0, rows=10, bf=None):
        if q.strip() == "*:*":
            matched = [(r, 1.0) for r in self.rows]
        else:
            terms, boosts = self.parse_q(q)
            mm_n = self.norm_mm(mm, len(terms)) if op != "AND" else None
            iv = [t for t in terms if self.df[t] > 0]
            matched = []
            if not (op == "AND" and len(iv) < len(terms)) and iv and not (
                    mm_n is not None and mm_n > len(iv)):
                for r in self.rows:
                    hit = [t for t in iv if t in r["_tf"]]
                    if op == "AND" and len(hit) < len(iv):
                        continue
                    if op != "AND":
                        if not hit or (mm_n is not None and len(hit) < mm_n):
                            continue
                    s = 0.0
                    for t in hit:
                        tf = r["_tf"][t]
                        s += (boosts.get(t, 1.0) * self.idf(t) * tf
                              * (K1 + 1)
                              / (tf + K1 * (1 - B + B * r["_dl"] / self.avgdl)))
                    matched.append((r, s))
        for p in fq_preds:
            matched = [(r, s) for r, s in matched if p(r)]
        if bf is not None:
            matched = [(r, s + bf(r)) for r, s in matched]
        num_found = len(matched)

        if sort is None:
            if q.strip() == "*:*":
                ordered = sorted(matched, key=lambda x: x[0]["doc_id"])
            else:
                ordered = sorted(
                    matched,
                    key=lambda x: (-round(x[1], 6), x[0]["doc_id"]),
                )
        else:
            def cmp(a, b):
                for fld, direction in sort:
                    va, vb = a[0][fld], b[0][fld]
                    if va != vb:
                        lt = -1 if va < vb else 1
                        return lt if direction == "asc" else -lt
                return -1 if a[0]["doc_id"] < b[0]["doc_id"] else 1
            ordered = sorted(matched, key=functools.cmp_to_key(cmp))
        page = ordered[start:start + rows]
        return {
            "numFound": num_found,
            "ids": [r["doc_id"] for r, _ in page],
            "scores": [s for _, s in page],
        }

    def facet(self, matched_rows, field, mincount=0, limit=100):
        counts = Counter(
            r[field] for r in matched_rows if r[field] is not None
        )
        buckets = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out = [(v, c) for v, c in buckets if c >= mincount]
        return out[:limit] if limit >= 0 else out

    def match_rows(self, q, op, mm, fq_preds):
        res = self.select(q, op=op, mm=mm, fq_preds=fq_preds,
                          start=0, rows=self.N or 1)
        ids = set(res["ids"])
        return [r for r in self.rows if r["doc_id"] in ids]


# fq pool: (Solr fq string, equivalent python predicate) pairs — the
# generator always picks them together so the reference never parses fq
FQ_POOL = [
    ("role:user", lambda r: r["role"] == "user"),
    ("-role:tool", lambda r: r["role"] != "tool"),
    ("tool:*", lambda r: r["tool"] is not None),
    ("turn_idx:[1 TO 4]", lambda r: 1 <= r["turn_idx"] <= 4),
    ("role:(user OR assistant)",
     lambda r: r["role"] in ("user", "assistant")),
]

SORT_POOL = [
    ("turn_idx asc", (("turn_idx", "asc"),)),
    ("turn_idx desc", (("turn_idx", "desc"),)),
    ("ts desc", (("ts", "desc"),)),
    ("conv_id desc", (("conv_id", "desc"),)),
    ("role asc,turn_idx desc", (("role", "asc"), ("turn_idx", "desc"))),
]

BF = ("recip(turn_idx,1,2,1)", lambda r: 2.0 / (r["turn_idx"] + 1.0))


def _gen_case(rng, vocab):
    p = {}
    meta = {}
    if rng.random() < 0.06:
        q = "*:*"
    else:
        n = rng.randint(1, 3)
        clauses = []
        for _ in range(n):
            u = rng.random()
            t = (rng.choice(vocab["hot"]) if u < 0.45
                 else rng.choice(vocab["mid"]) if u < 0.85
                 else rng.choice(vocab["rare"]) if u < 0.95
                 else "zzqxoov")
            if rng.random() < 0.15:
                t += f"^{rng.choice([0.5, 2, 2.5])}"
            clauses.append(t)
        q = " ".join(clauses)
    p["q"] = q
    meta["n_clauses"] = 0 if q == "*:*" else len(q.split())
    if q != "*:*" and rng.random() < 0.3:
        p["q.op"] = "AND"
    elif q != "*:*" and meta["n_clauses"] >= 2 and rng.random() < 0.35:
        p["mm"] = rng.choice([2, "50%", "67%"])
    if rng.random() < 0.5:
        k = rng.randint(1, 2)
        meta["fq"] = rng.sample(FQ_POOL, k)
        p["fq"] = [s for s, _ in meta["fq"]]
    sortable = True
    if q != "*:*" and rng.random() < 0.12 and "mm" not in p:
        p["bf"] = BF[0]
        meta["bf"] = BF[1]
        sortable = False  # bf requires the relevance sort
    if sortable and rng.random() < 0.4:
        s, spec = rng.choice(SORT_POOL)
        p["sort"] = s
        meta["sort"] = spec
    elif q == "*:*":
        # match-all with the default sort = doc-id order; also valid
        pass
    p["start"] = rng.choice([0, 0, 0, rng.randint(1, 15)])
    p["rows"] = rng.choice([5, 10, 20])
    if rng.random() < 0.3:
        f = rng.choice(["role", "conv_id", "tool"])
        p["facet"] = "true"
        p["facet.field"] = f
        p["facet.mincount"] = rng.choice([0, 1, 2])
        p["facet.limit"] = rng.choice([5, 100, -1])
        meta["facet"] = f
    if rng.random() < 0.15:
        lo = rng.choice([0, 1])
        gap = rng.choice([1, 2, 3])
        # unaligned ends exercise the hardend=false extension (the last
        # bucket covers a whole gap past end; the reference loop below
        # counts [b, b+gap) per emitted start, which IS that semantics)
        end = lo + gap * rng.randint(2, 4) + rng.choice([0, 0, 1])
        p["facet"] = "true"
        p["facet.range"] = "turn_idx"
        p["facet.range.start"] = lo
        p["facet.range.end"] = end
        p["facet.range.gap"] = gap
        meta["frange"] = (lo, end, gap)
    if (p["start"] == 0 and "bf" not in p and rng.random() < 0.25
            and "facet" not in p and "facet.range" not in p):
        meta["walk"] = True  # cursorMark page walk (sort x fq x mm x op)
    p["fl"] = "doc_id,score"
    return p, meta


def test_rare_term_fq_empty_cogroup_side(setup):
    """r5 fuzz find #1 (case 31, seed 20260821): a rare term whose
    postings miss entire segments, combined with an fq — the cogrouped
    WAND/collapse/multi kernels received the absent side as a COLUMN-LESS
    empty frame and crashed (KeyError 'term'/'kind'). Regression: result
    must equal the brute reference on both op paths."""
    idx, brute = setup
    rare = min(brute.df, key=lambda t: brute.df[t])
    pred = dict(FQ_POOL)["tool:*"]
    for op in ("AND", "OR"):
        resp = solr_select(idx, {"q": rare, "q.op": op, "fq": "tool:*",
                                 "rows": 5, "fl": "doc_id,score"})
        want = brute.select(rare, op=op, fq_preds=[pred], rows=5)
        assert resp["response"]["numFound"] == want["numFound"]
        assert [d["doc_id"] for d in resp["response"]["docs"]] == want["ids"]


def test_select_differential_fuzz(setup):
    idx, brute = setup
    by_df = [t for t, _ in brute.df.most_common()]
    vocab = {
        "hot": by_df[:8],
        "mid": by_df[len(by_df) // 4: len(by_df) // 4 + 30],
        "rare": by_df[-30:],
    }
    rng = random.Random(SEED)
    failures = []
    for case_no in range(N_CASES):
        p, meta = _gen_case(rng, vocab)
        try:
            resp = solr_select(idx, dict(p))
        except Exception as e:  # noqa: BLE001 — a crash IS a finding
            failures.append((case_no, p, f"engine raised: {e!r}"))
            continue
        fq_preds = [pred for _, pred in meta.get("fq", [])]
        want = brute.select(
            p["q"], op=p.get("q.op", "OR"), mm=p.get("mm"),
            fq_preds=fq_preds, sort=meta.get("sort"),
            start=p["start"], rows=p["rows"], bf=meta.get("bf"),
        )
        got_ids = [d["doc_id"] for d in resp["response"]["docs"]]
        ok = (resp["response"]["numFound"] == want["numFound"]
              and got_ids == want["ids"])
        if ok and meta.get("sort") is None:
            got_scores = [d.get("score") for d in resp["response"]["docs"]]
            for gs, ws in zip(got_scores, want["scores"]):
                if gs is None or abs(gs - ws) > 1e-6 * max(1.0, abs(ws)):
                    ok = False
                    break
        if ok and "facet" in meta:
            f = meta["facet"]
            flat = resp["facet_counts"]["facet_fields"][f]
            got_fc = list(zip(flat[::2], flat[1::2]))
            mrows = brute.match_rows(
                p["q"], p.get("q.op", "OR"), p.get("mm"), fq_preds)
            want_fc = brute.facet(
                mrows, f, mincount=p["facet.mincount"],
                limit=p["facet.limit"])
            # count ties: engine and reference both break by value asc
            if got_fc != want_fc:
                ok = False
                failures.append((case_no, p, f"facet {got_fc} != {want_fc}"))
                continue
        if ok and "frange" in meta:
            lo, hi, gap = meta["frange"]
            ent = resp["facet_counts"]["facet_ranges"]["turn_idx"]
            got_fr = dict(zip(ent["counts"][::2], ent["counts"][1::2]))
            mrows = brute.match_rows(
                p["q"], p.get("q.op", "OR"), p.get("mm"), fq_preds)
            want_fr = {}
            b = lo
            while b < hi:
                want_fr[float(b)] = sum(
                    1 for r in mrows if b <= r["turn_idx"] < b + gap)
                b += gap
            if {float(k): v for k, v in got_fr.items()} != want_fr:
                ok = False
                failures.append(
                    (case_no, p, f"facet.range {got_fr} != {want_fr}"))
                continue
        if ok and meta.get("walk"):
            # cursorMark keyset walk: 3 pages concatenated must equal the
            # reference's ordered prefix (every page O(page), no offsets)
            wide = brute.select(
                p["q"], op=p.get("q.op", "OR"), mm=p.get("mm"),
                fq_preds=fq_preds, sort=meta.get("sort"),
                start=0, rows=3 * p["rows"], bf=None,
            )
            walked, cur = [], "*"
            try:
                for _ in range(3):
                    wp = dict(p)
                    wp.pop("facet", None)
                    wp["cursorMark"] = cur
                    wr = solr_select(idx, wp)
                    walked.extend(
                        d["doc_id"] for d in wr["response"]["docs"])
                    nxt = wr.get("nextCursorMark")
                    if nxt is None or nxt == cur:
                        break
                    cur = nxt
            except Exception as e:  # noqa: BLE001
                ok = False
                failures.append((case_no, p, f"cursor walk raised: {e!r}"))
                continue
            if walked != wide["ids"][:len(walked)] or (
                    len(walked) < 3 * p["rows"]
                    and len(walked) != wide["numFound"]):
                ok = False
                failures.append((
                    case_no, p,
                    f"cursor walk {walked} != {wide['ids'][:3 * p['rows']]}",
                ))
                continue
        if not ok:
            failures.append((
                case_no, p,
                f"numFound {resp['response']['numFound']} vs "
                f"{want['numFound']}; ids {got_ids} vs {want['ids']}",
            ))
    assert not failures, (
        f"{len(failures)}/{N_CASES} cases diverged (seed {SEED}); "
        f"first 3: {failures[:3]}"
    )
