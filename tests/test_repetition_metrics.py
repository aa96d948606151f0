"""Gopher-style repetition metrics: duplicate lines / repeated n-grams.

Brute-force Python oracle + DuckDB twin parity on crafted texts covering
every branch (empty, null, single line, heavy repetition, no repetition,
sub-n token streams)."""

import re
from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.functions import text_metrics as TM

TEXTS = [
    (0, "alpha beta\nalpha beta\ngamma\n\n  \nalpha beta"),
    (1, "one line only"),
    (2, ""),
    (3, None),
    (4, "spam spam spam spam spam spam"),
    (5, "all lines differ\nno repeats here\nclean text wins"),
    (6, "a b c d a b c d a b c d"),          # repeated 4-gram phrase
    (7, "x y"),                               # under n for n>=3
]


def _toks(t):
    return re.findall(r"[a-z0-9]+", (t or "").lower())


def _lines(t):
    return [x.strip() for x in (t or "").split("\n") if x.strip()]


def _ngrams(t, n):
    toks = _toks(t)
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def _dup_line_frac(t):
    ls = _lines(t)
    return (len(ls) - len(set(ls))) / len(ls) if ls else 0.0


def _dup_line_char_frac(t):
    cnt = Counter(_lines(t))
    total = sum(c * len(l) for l, c in cnt.items())
    dup = sum((c - 1) * len(l) for l, c in cnt.items() if c > 1)
    return dup / total if total else 0.0


def _top_ngram_char_frac(t, n):
    cnt = Counter(_ngrams(t, n))
    chars = len((t or "").lower())
    if not cnt or not chars:
        return 0.0
    return max(c * len(g) for g, c in cnt.items()) / chars


def _dup_ngram_char_frac(t, n):
    cnt = Counter(_ngrams(t, n))
    chars = len((t or "").lower())
    if not chars:
        return 0.0
    return sum(c * len(g) for g, c in cnt.items() if c >= 2) / chars


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(TEXTS, "doc_id long, text string")


def _collect(frame):
    return {
        r["doc_id"]: r for r in frame.select(
            "doc_id",
            TM.dup_line_frac_col("text").alias("dlf"),
            TM.dup_line_char_frac_col("text").alias("dlcf"),
            TM.top_ngram_char_frac_col("text", 2).alias("t2"),
            TM.dup_ngram_char_frac_col("text", 4).alias("d4"),
        ).collect()
    }


def test_matches_brute_force(frame):
    got = _collect(frame)
    for i, t in TEXTS:
        assert got[i]["dlf"] == pytest.approx(_dup_line_frac(t)), (i, "dlf")
        assert got[i]["dlcf"] == pytest.approx(_dup_line_char_frac(t)), i
        assert got[i]["t2"] == pytest.approx(_top_ngram_char_frac(t, 2)), i
        assert got[i]["d4"] == pytest.approx(_dup_ngram_char_frac(t, 4)), i


def test_signal_direction(frame):
    got = _collect(frame)
    # the repeated-line doc scores above the clean multi-line doc
    assert got[0]["dlf"] > got[5]["dlf"] == 0.0
    assert got[0]["dlcf"] > got[5]["dlcf"] == 0.0
    # keyword stuffing lights up the 2-gram signal
    assert got[4]["t2"] > got[5]["t2"]
    # the repeated phrase lights up the 4-gram dup signal
    assert got[6]["d4"] > 0.0 and got[5]["d4"] == 0.0
    # sub-n texts yield zero, not errors
    assert got[7]["d4"] == 0.0


def test_duckdb_twin_parity(frame):
    import pandas as pd

    con = duckdb.connect()
    con.register("t", pd.DataFrame(TEXTS, columns=["doc_id", "text"]))
    sql = f"""
      SELECT doc_id,
             {TM.dup_line_frac_sql('text')} AS dlf,
             {TM.dup_line_char_frac_sql('text')} AS dlcf,
             {TM.top_ngram_char_frac_sql('text', 2)} AS t2,
             {TM.dup_ngram_char_frac_sql('text', 4)} AS d4
      FROM t
    """
    want = {int(r[0]): r for r in con.execute(sql).fetchall()}
    got = _collect(frame)
    for i, _ in TEXTS:
        for j, k in enumerate(("dlf", "dlcf", "t2", "d4"), start=1):
            assert got[i][k] == pytest.approx(want[i][j]), (i, k)


def test_plan_is_shuffle_free(frame):
    out = frame.select(
        TM.dup_line_char_frac_col("text").alias("x"),
        TM.dup_ngram_char_frac_col("text", 5).alias("y"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map-side projection
