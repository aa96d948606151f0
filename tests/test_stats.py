"""Solr stats component: scalar aggregates over the match set's field,
verified against brute-force python statistics (sample stddev, Solr's
form)."""

import math

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=6, seed=3)
    idx_dir = str(tmp_path_factory.mktemp("stats"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="stats", **CFG))
    return df, BM25Index(spark, idx_dir)


def _brute(idx, q, field):
    matched = {r["doc_id"] for r in idx.score_matches(q).collect()}
    vals = [
        float(r[field])
        for r in idx.docs().select("doc_id", field).collect()
        if r["doc_id"] in matched and r[field] is not None
    ]
    n = len(vals)
    mean = sum(vals) / n
    var = sum((v - mean) ** 2 for v in vals) / (n - 1)
    return {
        "min": min(vals), "max": max(vals), "count": n,
        "sum": sum(vals), "sumOfSquares": sum(v * v for v in vals),
        "mean": mean, "stddev": math.sqrt(var),
    }


def test_stats_match_set(corpus):
    _, idx = corpus
    row = idx.stats_field("error tool", "dl").collect()[0]
    want = _brute(idx, "error tool", "dl")
    assert row["count"] == want["count"] and row["missing"] == 0
    for k in ("min", "max", "sum", "sumOfSquares"):
        assert abs(row[k] - want[k]) < 1e-6, k
    assert abs(row["mean"] - want["mean"]) < 1e-9
    assert abs(row["stddev"] - want["stddev"]) < 1e-9


def test_stats_match_all_and_select_shape(corpus):
    _, idx = corpus
    row = idx.stats_field("*:*", "turn_idx").collect()[0]
    assert row["count"] == idx.docs().count()
    assert row["min"] == 0.0 and row["max"] == 5.0
    resp = solr_select(idx, {
        "q": "error", "rows": 0, "stats": "true", "stats.field": ["dl", "turn_idx"],
    })
    sf = resp["stats"]["stats_fields"]
    assert set(sf) == {"dl", "turn_idx"}
    assert set(sf["dl"]) == {"min", "max", "count", "missing", "sum",
                             "sumOfSquares", "mean", "stddev"}
    assert sf["dl"]["count"] == _brute(idx, "error", "dl")["count"]


def test_stats_string_field(corpus):
    """String fields return Solr's string-stats shape (lexicographic
    min/max + count/missing), never null-cast doubles."""
    _, idx = corpus
    row = idx.stats_field("error tool", "role").collect()[0]
    vals = [r["role"] for r in
            idx.score_matches("error tool")
            .join(idx.docs().select("doc_id", "role"), "doc_id")
            .collect()]
    assert set(row.asDict()) == {"min", "max", "count", "missing"}
    assert row["min"] == min(vals) and row["max"] == max(vals)
    assert row["count"] == len(vals) and row["missing"] == 0
    with pytest.raises(ValueError, match="unknown field"):
        idx.stats_field("error", "nope")


# ---------- percentiles (exact; Solr approximates via t-digest) ----------

def test_stats_percentiles_vs_numpy(corpus):
    import numpy as np

    _, idx = corpus
    matched = {r["doc_id"] for r in idx.score_matches("error tool").collect()}
    vals = np.array([
        float(r["dl"])
        for r in idx.docs().select("doc_id", "dl").collect()
        if r["doc_id"] in matched
    ])
    row = idx.stats_field(
        "error tool", "dl", percentiles=[1, 50, 99.9]
    ).collect()[0]
    # Spark's exact percentile = numpy's 'linear' interpolation
    assert row["p1"] == pytest.approx(np.percentile(vals, 1))
    assert row["p50"] == pytest.approx(np.percentile(vals, 50))
    assert row["p99_9"] == pytest.approx(np.percentile(vals, 99.9))
    # DuckDB quantile_cont agrees (the oracle dialect)
    import duckdb

    got = duckdb.sql(
        "SELECT quantile_cont(v, [0.01, 0.5, 0.999]) FROM "
        "(SELECT unnest($vals) AS v)", params={"vals": vals.tolist()}
    ).fetchone()[0]
    assert got == pytest.approx([row["p1"], row["p50"], row["p99_9"]])


def test_stats_percentiles_validation(corpus):
    _, idx = corpus
    with pytest.raises(ValueError, match="numeric"):
        idx.stats_field("error", "role", percentiles=[50])
    with pytest.raises(ValueError, match=r"not in \[0, 100\]"):
        idx.stats_field("error", "dl", percentiles=[101])


def test_select_stats_percentiles_local_params(corpus):
    import numpy as np

    _, idx = corpus
    resp = solr_select(idx, {
        "q": "error tool", "rows": 0, "stats": "true",
        "stats.field": "{!percentiles='1,99.9'}dl",
    })
    st = resp["stats"]["stats_fields"]["dl"]
    matched = {r["doc_id"] for r in idx.score_matches("error tool").collect()}
    vals = np.array([
        float(r["dl"])
        for r in idx.docs().select("doc_id", "dl").collect()
        if r["doc_id"] in matched
    ])
    assert st["percentiles"]["1.0"] == pytest.approx(np.percentile(vals, 1))
    assert st["percentiles"]["99.9"] == pytest.approx(np.percentile(vals, 99.9))
    assert "p1" not in st and st["count"] == len(vals)
    with pytest.raises(ValueError, match="local params"):
        solr_select(idx, {"q": "error", "stats": "true",
                          "stats.field": "{!mean=true}dl"})
