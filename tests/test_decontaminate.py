"""Benchmark decontamination: n-gram collision vs an eval set.

Brute-force Python oracle + DuckDB SQL parity + the 100 TB plan shape
(benchmark side broadcast, corpus never shuffled before the join)."""

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.operators.decontaminate import (
    contamination_report,
    contamination_report_sql,
    decontaminate,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog tonight"),
    (1, "a completely different sentence with no shared phrasing at all"),
    (2, "the quick brown fox sat still"),          # shares 3-grams with 0
    (3, "lazy dog tonight and tomorrow as well"),  # shares with 0
    (4, ""),                                       # empty: never flagged
    (5, "short text"),                             # < n tokens: full-shingle
    (6, None),
]

BENCH = [
    (100, "the quick brown fox jumps high"),
    (101, "over the lazy dog tonight"),
    (102, "short text"),                           # exact tiny doc
]

N = 3


def _toks(t):
    return re.findall(r"[a-z0-9]+", (t or "").lower())


def _shingles(t, n=N):
    toks = _toks(t)
    if len(toks) >= n:
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
    return {" ".join(toks)} if toks else set()


def _brute(min_overlap=1):
    bench = set().union(*(_shingles(t) for _, t in BENCH))
    out = {}
    for i, t in DOCS:
        sh = _shingles(t)
        hit = len(sh & bench)
        if hit >= min_overlap:
            out[i] = (hit, len(sh))
    return out


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "doc_id long, text string")
    return docs, bench


def test_report_matches_brute_force(frames):
    docs, bench = frames
    got = {
        r["doc_id"]: (r["n_overlap"], r["n_ngrams"])
        for r in contamination_report(docs, bench, n=N).collect()
    }
    assert got == _brute()
    # doc 5 is flagged through the short-text full-shingle rule
    assert 5 in got
    # overlap_frac is n_overlap / n_ngrams exactly
    for r in contamination_report(docs, bench, n=N).collect():
        assert r["overlap_frac"] == pytest.approx(
            r["n_overlap"] / r["n_ngrams"]
        )


def test_min_overlap_threshold(frames):
    docs, bench = frames
    got = {
        r["doc_id"] for r in
        contamination_report(docs, bench, n=N, min_overlap=3).collect()
    }
    assert got == set(_brute(min_overlap=3))
    assert got < set(_brute())  # the threshold actually prunes


def test_decontaminate_removes_exactly_flagged(frames):
    docs, bench = frames
    kept = {r["doc_id"] for r in decontaminate(docs, bench, n=N).collect()}
    assert kept == {i for i, _ in DOCS} - set(_brute())
    # schema preserved
    assert decontaminate(docs, bench, n=N).columns == docs.columns


def test_duckdb_oracle_parity(frames):
    docs, bench = frames
    con = duckdb.connect()
    docs_sql = "SELECT * FROM (VALUES {}) AS t(doc_id, text)".format(
        ", ".join(f"({i}, {repr(t) if t is not None else 'NULL'})"
                  for i, t in DOCS))
    bench_sql = "SELECT * FROM (VALUES {}) AS t(doc_id, text)".format(
        ", ".join(f"({i}, {t!r})" for i, t in BENCH))
    sql = contamination_report_sql(docs_sql, bench_sql, n=N)
    want = {int(r[0]): (int(r[1]), int(r[2]), float(r[3]))
            for r in con.execute(sql).fetchall()}
    got = {r["doc_id"]: (r["n_overlap"], r["n_ngrams"],
                         pytest.approx(r["overlap_frac"]))
           for r in contamination_report(docs, bench, n=N).collect()}
    assert got == want


def test_plan_broadcasts_benchmark_no_corpus_shuffle(frames):
    docs, bench = frames
    plan = contamination_report(docs, bench, n=N)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the corpus is the STREAMED side: between the join node and the
    # BuildRight BroadcastExchange (the benchmark subtree, whose internal
    # bench-sized distinct may shuffle) there must be no shuffle exchange
    streamed = plan.split("BroadcastHashJoin")[-1].split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in streamed
    # the per-doc count aggregate shuffles only post-join (matching) rows:
    # exactly one corpus-path exchange, ABOVE the join in the tree
    above_join = plan.split("BroadcastHashJoin")[0]
    assert above_join.count("Exchange hashpartitioning") == 1
