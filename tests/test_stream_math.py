"""Solr math-expression evaluators as distributed aggregates: col /
describe / corr / percentile / hist. Solr materializes driver-side
arrays and loops; here col() stays a logical column and the evaluators
compile to Spark aggregates -- results checked against numpy over the
same values."""

import math

import numpy as np
import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.stream_expr import run_stream_expr
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)

SRC = ('search(tx, q="error", fl="doc_id,turn_idx,dl", '
       'sort="doc_id asc")')


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=6, seed=37)
    d = str(tmp_path_factory.mktemp("sxmath"))
    build_index(spark, df, d, BuildConfig(build_id="sxmath", **CFG))
    idx = BM25Index(spark, d)
    vals = run_stream_expr(idx, SRC).collect()
    turn = np.array([r["turn_idx"] for r in vals], dtype=float)
    dl = np.array([r["dl"] for r in vals], dtype=float)
    return idx, turn, dl


def test_col_materializes_in_stream_order(setup):
    idx, turn, _ = setup
    t = run_stream_expr(idx, f'col({SRC}, turn_idx)').collect()
    assert len(t) == 1
    assert [float(v) for v in t[0]["turn_idx"]] == list(turn)


def test_describe_matches_numpy(setup):
    idx, turn, _ = setup
    r = run_stream_expr(idx, f'describe(col({SRC}, turn_idx))').collect()[0]
    assert r["N"] == len(turn)
    assert r["mean"] == pytest.approx(turn.mean())
    assert r["min"] == turn.min() and r["max"] == turn.max()
    assert r["stdev"] == pytest.approx(turn.std(ddof=1))
    assert r["var"] == pytest.approx(turn.var(ddof=1))
    assert r["sumsq"] == pytest.approx((turn * turn).sum())


def test_corr_matches_numpy(setup):
    idx, turn, dl = setup
    r = run_stream_expr(
        idx, f'corr(col({SRC}, turn_idx), col({SRC}, dl))').collect()[0]
    expect = np.corrcoef(turn, dl)[0, 1]
    assert r["corr"] == pytest.approx(expect, abs=1e-9)


def test_corr_requires_one_stream(setup):
    idx, _, _ = setup
    other = SRC.replace('q="error"', 'q="tool"')
    with pytest.raises(ValueError, match="ONE stream"):
        run_stream_expr(
            idx, f'corr(col({SRC}, turn_idx), col({other}, dl))')


def test_percentile_exact(setup):
    idx, turn, _ = setup
    r = run_stream_expr(
        idx, f'percentile(col({SRC}, turn_idx), 50)').collect()[0]
    assert r["percentile"] == pytest.approx(
        np.percentile(turn, 50, method="linear"))


def test_hist_counts_cover_all_values(setup):
    idx, turn, _ = setup
    rows = run_stream_expr(
        idx, f'hist(col({SRC}, turn_idx), bins=4)').collect()
    assert len(rows) == 4
    assert sum(r["count"] for r in rows) == len(turn)
    assert rows[0]["lo"] == turn.min()
    assert rows[-1]["hi"] == pytest.approx(turn.max())
    # brute-force bin membership
    width = (turn.max() - turn.min()) / 4
    for r in rows:
        expect = int(((turn >= r["lo"]) & (turn < r["hi"])).sum()) \
            if r["bin"] < 3 else int((turn >= r["lo"]).sum())
        assert r["count"] == expect


def test_validation(setup):
    idx, _, _ = setup
    with pytest.raises(ValueError, match="unknown field"):
        run_stream_expr(idx, f'describe(col({SRC}, nope))')
    with pytest.raises(ValueError, match="col\\(stream"):
        run_stream_expr(idx, f'describe({SRC})')
    with pytest.raises(ValueError, match="bins"):
        run_stream_expr(idx, f'hist(col({SRC}, dl), bins=0)')


# ---------------------------------------------------- date-native timeseries


def test_timeseries_datemath_over_timestamp(setup):
    idx, _, _ = setup
    import datetime as dt
    row = idx.docs().selectExpr("min(ts) a", "max(ts) b").collect()[0]
    start = row["a"].replace(minute=0, second=0, microsecond=0)
    end = row["b"] + dt.timedelta(hours=1)
    expr = (f'timeseries(tx, q="*:*", field=ts, '
            f'start="{start.isoformat()}Z", end="{end.isoformat()}Z", '
            f'gap="+1HOUR", count(*))')
    rows = run_stream_expr(idx, expr).collect()
    assert rows and sum(r["count(*)"] for r in rows) == idx.docs().count()
    # brute-force one bucket
    ts = [r["ts"] for r in idx.docs().select("ts").collect()]
    first_lo = rows[0]["ts"]
    first_hi = first_lo + dt.timedelta(hours=1)
    expect = sum(1 for t in ts if first_lo <= t < first_hi)
    assert rows[0]["count(*)"] == expect
    # buckets are timestamps on hour boundaries
    assert all(r["ts"].minute == start.minute for r in rows)


def test_timeseries_unknown_gap_unit_fails(setup):
    # +1MONTH/+1YEAR are supported since r5 (tests/test_datemath_month.py);
    # an unknown unit still fails loud
    idx, _, _ = setup
    with pytest.raises(ValueError, match="date gap"):
        run_stream_expr(
            idx, 'timeseries(tx, q="*:*", field=ts, '
                 'start="2024-01-01T00:00:00Z", end="2024-03-01T00:00:00Z", '
                 'gap="+1FORTNIGHT", count(*))')
