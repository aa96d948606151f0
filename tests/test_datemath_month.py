"""Variable-width DateMath gaps (+1MONTH / +1YEAR) in facet.range and
timeseries() — VERDICT r4 "Next round" item 3.

Solr's DateMathParser steps month/year gaps with Calendar.add semantics
in UTC: every boundary is start + i*gap derived from the ORIGINAL start
(day-of-month clamped to the target month's length independently per
boundary). The unit layer is brute-forced against Python calendar
arithmetic; the end-to-end facets are brute-forced against collected
rows.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.functions.datemath import (
    iso_sec,
    month_bucket_starts,
    parse_gap,
)
from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.query.stream_expr import run_stream_expr
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)

UTC = dt.timezone.utc


def _utc(*a):
    return dt.datetime(*a, tzinfo=UTC)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    # transcripts with ts spread deterministically over ~8 months so the
    # month buckets discriminate
    df = generate_transcripts(spark, n_convs=50, turns_per_conv=6, seed=91)
    base = int(_utc(2024, 1, 5).timestamp())
    df = df.withColumn(
        "ts",
        F.timestamp_seconds(
            F.lit(base)
            + (F.crc32(F.concat("conv_id", F.col("turn_idx").cast("string")))
               % F.lit(240 * 86400))
        ),
    )
    idx_dir = str(tmp_path_factory.mktemp("dmm"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="dmm", **CFG))
    return BM25Index(spark, idx_dir)


# ------------------------------------------------------------- unit layer


def test_parse_gap_units():
    assert parse_gap("+1DAY") == ("sec", 86400.0)
    assert parse_gap("+6HOURS") == ("sec", 6 * 3600.0)
    assert parse_gap("+1MONTH") == ("months", 1.0)
    assert parse_gap("+3MONTHS") == ("months", 3.0)
    assert parse_gap("+1YEAR") == ("months", 12.0)
    assert parse_gap("+2YEARS") == ("months", 24.0)
    for bad in ("1MONTH", "+0MONTHS", "+1FORTNIGHT", "-1DAY", ""):
        with pytest.raises(ValueError):
            parse_gap(bad)


def test_month_boundaries_day_clamp():
    # Jan 31 +1MONTH: every boundary clamps from the ORIGINAL start —
    # Feb 29 (leap), Mar 31, Apr 30 — never from the previous boundary
    # (stepping from Feb 29 would give Mar 29)
    start = _utc(2024, 1, 31, 10, 30)
    bounds = month_bucket_starts(
        start.timestamp(), _utc(2024, 4, 15).timestamp(), 1)
    got = [dt.datetime.fromtimestamp(b, UTC) for b in bounds]
    assert got == [
        _utc(2024, 1, 31, 10, 30),
        _utc(2024, 2, 29, 10, 30),
        _utc(2024, 3, 31, 10, 30),
        _utc(2024, 4, 30, 10, 30),  # first boundary >= end (bucket end)
    ]


def test_month_boundaries_non_leap_and_year():
    bounds = month_bucket_starts(
        _utc(2023, 1, 31).timestamp(), _utc(2023, 3, 1).timestamp(), 1)
    got = [dt.datetime.fromtimestamp(b, UTC) for b in bounds]
    assert got == [_utc(2023, 1, 31), _utc(2023, 2, 28), _utc(2023, 3, 31)]
    # +1YEAR from a leap day clamps to Feb 28 the following year
    yb = month_bucket_starts(
        _utc(2024, 2, 29).timestamp(), _utc(2026, 1, 1).timestamp(), 12)
    gy = [dt.datetime.fromtimestamp(b, UTC) for b in yb]
    assert gy == [_utc(2024, 2, 29), _utc(2025, 2, 28), _utc(2026, 2, 28)]


def test_iso_sec_naive_is_utc():
    # r5 ADVICE: a tz-naive instant must be UTC, never the host zone
    assert iso_sec("2024-01-01T00:00:00") == iso_sec("2024-01-01T00:00:00Z")
    assert iso_sec("2024-01-01T05:00:00+05:00") == \
        iso_sec("2024-01-01T00:00:00Z")


# ------------------------------------------------------- facet.range e2e


def _brute_counts(idx, q, bounds):
    matched = (
        None if q == "*:*"
        else {r["doc_id"] for r in idx.score_matches(q).collect()}
    )
    rows = idx.docs().select("doc_id", "ts").collect()
    counts = [0] * (len(bounds) - 1)
    for r in rows:
        if matched is not None and r["doc_id"] not in matched:
            continue
        sec = r["ts"].replace(tzinfo=UTC).timestamp()
        for i in range(len(bounds) - 1):
            if bounds[i] <= sec < bounds[i + 1]:
                counts[i] += 1
    return counts


@pytest.mark.parametrize("q,gap,n_months", [
    ("*:*", "+1MONTH", 1),
    ("error", "+2MONTHS", 2),
])
def test_facet_range_month_gap(corpus, q, gap, n_months):
    idx = corpus
    fmt = "%Y-%m-%dT%H:%M:%SZ"
    lo, hi = _utc(2024, 1, 31), _utc(2024, 8, 1)
    resp = solr_select(idx, {
        "q": q, "rows": 0, "facet": "true", "facet.range": "ts",
        "facet.range.start": lo.strftime(fmt),
        "facet.range.end": hi.strftime(fmt),
        "facet.range.gap": gap,
    })
    ent = resp["facet_counts"]["facet_ranges"]["ts"]
    bounds = month_bucket_starts(lo.timestamp(), hi.timestamp(), n_months)
    labels = ent["counts"][::2]
    counts = ent["counts"][1::2]
    # labels sit at REAL month boundaries (day-clamped), zeros included
    assert labels == [
        dt.datetime.fromtimestamp(b, UTC).strftime(fmt) for b in bounds[:-1]
    ]
    assert ent["gap"] == gap
    assert ent["end"] == dt.datetime.fromtimestamp(bounds[-1], UTC).strftime(fmt)
    assert counts == _brute_counts(idx, q, bounds)
    assert sum(counts) > 0  # corpus must exercise the buckets


def test_facet_range_year_gap_with_other(corpus):
    idx = corpus
    fmt = "%Y-%m-%dT%H:%M:%SZ"
    lo, hi = _utc(2024, 2, 1), _utc(2025, 2, 1)
    resp = solr_select(idx, {
        "q": "*:*", "rows": 0, "facet": "true", "facet.range": "ts",
        "facet.range.start": lo.strftime(fmt),
        "facet.range.end": hi.strftime(fmt),
        "facet.range.gap": "+1YEAR",
        "facet.range.other": "all",
    })
    ent = resp["facet_counts"]["facet_ranges"]["ts"]
    bounds = month_bucket_starts(lo.timestamp(), hi.timestamp(), 12)
    assert ent["counts"][1::2] == _brute_counts(idx, "*:*", bounds)
    rows = idx.docs().select("ts").collect()
    secs = [r["ts"].replace(tzinfo=UTC).timestamp() for r in rows]
    assert ent["before"] == sum(1 for s in secs if s < lo.timestamp())
    assert ent["after"] == sum(1 for s in secs if s >= hi.timestamp())


# --------------------------------------------------------- timeseries e2e


def test_timeseries_month_gap(corpus):
    idx = corpus
    expr = ('timeseries(tx, q="*:*", field=ts, '
            'start="2024-01-15T00:00:00Z", end="2024-07-01T00:00:00Z", '
            'gap="+1MONTH", count(*))')
    rows = run_stream_expr(idx, expr).collect()
    end = _utc(2024, 7, 1).timestamp()
    bounds = month_bucket_starts(_utc(2024, 1, 15).timestamp(), end, 1)
    # timeseries (unlike facet.range's hardend=false) truncates the last
    # bucket at end — same as its fixed-width path
    brute = _brute_counts(idx, "*:*",
                          [min(b, end) for b in bounds])
    got = {r["ts"].replace(tzinfo=UTC): r["count(*)"] for r in rows}
    # timeseries emits non-empty buckets in ts order, each on the real
    # month boundary (day 15)
    for i, b in enumerate(bounds[:-1]):
        bt = dt.datetime.fromtimestamp(b, UTC)
        assert bt.day == 15
        assert got.get(bt, 0) == brute[i]
    assert sum(got.values()) == sum(brute) > 0


def test_timeseries_naive_instants_are_utc(corpus):
    # r5 ADVICE: tz-naive start/end bucket identically to the Z form
    idx = corpus
    base = ('timeseries(tx, q="*:*", field=ts, '
            'start="2024-02-01T00:00:00{z}", end="2024-04-01T00:00:00{z}", '
            'gap="+1DAY", count(*))')
    naive = run_stream_expr(idx, base.format(z="")).collect()
    zulu = run_stream_expr(idx, base.format(z="Z")).collect()
    assert [r.asDict() for r in naive] == [r.asDict() for r in zulu]
    assert naive  # non-empty window
