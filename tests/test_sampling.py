"""Deterministic hash sampling + domain-mixture construction.

Headline property: membership is a pure function of (key, seed) --
IDENTICAL under repartition (where DataFrame.sample provably is not).
Plus DuckDB twin parity, stratified fail-loud, and up-sampling epochs."""

import duckdb
import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.operators.sampling import (
    hash_sample,
    hash_sample_sql,
    mixture_report,
    sample_key_col,
    stratified_sample,
    stratified_sample_sql,
    upsample_mixture,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("domain"),
    )


def test_layout_independent(docs):
    a = {r["doc_id"] for r in hash_sample(docs, 0.3, seed=7).collect()}
    b = {r["doc_id"]
         for r in hash_sample(docs.repartition(17), 0.3, seed=7).collect()}
    c = {r["doc_id"]
         for r in hash_sample(docs.coalesce(1), 0.3, seed=7).collect()}
    assert a == b == c
    # realized fraction near target (binomial, 2000 rows)
    assert 0.25 < len(a) / 2000 < 0.35
    # a different seed draws a different subset
    d = {r["doc_id"] for r in hash_sample(docs, 0.3, seed=8).collect()}
    assert a != d


def test_spark_native_sample_is_layout_dependent(docs):
    """The motivating contrast: same seed, different layout, different
    subset -- documents why the operator exists. (If Spark ever makes
    sample() layout-stable this starts failing and the motivation note
    should be revisited.)"""
    a = {r["doc_id"] for r in docs.sample(0.3, seed=7).collect()}
    b = {r["doc_id"] for r in docs.repartition(17).sample(0.3, seed=7).collect()}
    assert a != b


def test_duckdb_twin_parity(spark, docs):
    con = duckdb.connect()
    src = "SELECT range AS doc_id, CAST(range % 4 AS VARCHAR) AS domain FROM range(2000)"
    want = {r[0] for r in con.execute(
        hash_sample_sql(src, 0.3, seed=7)).fetchall()}
    got = {r["doc_id"] for r in hash_sample(docs, 0.3, seed=7).collect()}
    assert got == want

    frs = {"0": 1.0, "1": 0.5, "2": 0.0, "3": 0.25}
    want2 = {r[0] for r in con.execute(
        stratified_sample_sql(src, frs, "domain", seed=3)).fetchall()}
    got2 = {r["doc_id"]
            for r in stratified_sample(docs, frs, "domain", seed=3).collect()}
    assert got2 == want2


def test_stratified_respects_per_domain_fracs(docs):
    frs = {"0": 1.0, "1": 0.5, "2": 0.0, "3": 0.25}
    out = stratified_sample(docs, frs, "domain", seed=3)
    by_dom = {r["domain"]: r["n_rows"]
              for r in mixture_report(out, "domain").collect()}
    assert by_dom["0"] == 500          # frac 1.0 keeps everything
    assert "2" not in by_dom           # frac 0 drops the domain
    assert 200 < by_dom["1"] < 300
    assert 90 < by_dom["3"] < 160
    # unknown domain fails loud at execution
    extra = docs.withColumn("domain", F.lit("unlisted"))
    with pytest.raises(Exception, match="not in fractions"):
        stratified_sample(extra, frs, "domain").collect()
    # ...unless a default is given
    n = stratified_sample(extra, frs, "domain", default_frac=0.5).count()
    assert 900 < n < 1100


def test_upsample_epochs(docs):
    w = {"0": 2.3, "1": 1.0, "2": 0.0, "3": 0.4}
    out = upsample_mixture(docs, w, "domain", seed=5)
    assert out.columns == docs.columns + ["epoch"]
    rows = out.groupBy("domain", "epoch").count().collect()
    got = {(r["domain"], r["epoch"]): r["count"] for r in rows}
    # full epochs carry the whole domain
    assert got[("0", 0)] == got[("0", 1)] == 500
    # the fractional epoch is ~0.3 of the domain
    assert 100 < got[("0", 2)] < 200
    assert got[("1", 0)] == 500 and ("1", 1) not in got
    assert not any(d == "2" for d, _ in got)
    assert 150 < got[("3", 0)] < 250 and ("3", 1) not in got
    # deterministic: same call, same rows
    again = upsample_mixture(docs, w, "domain", seed=5)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_plan_is_pure_filter(docs):
    plan = hash_sample(docs, 0.25)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan  # a column predicate, nothing more


def test_mixture_report_fracs(docs):
    rep = {r["domain"]: r for r in mixture_report(docs, "domain").collect()}
    assert all(rep[d]["n_rows"] == 500 for d in rep)
    assert all(rep[d]["frac"] == pytest.approx(0.25) for d in rep)
