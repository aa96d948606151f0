"""Solr DateMath INSTANT expressions (r5): ``NOW``/ISO bases with
``/UNIT`` round-downs and ``±N UNIT`` offsets — in fq timestamp ranges
(`ts:[NOW/DAY-7DAYS TO NOW]`), facet.range start/end (with the Solr
``NOW`` request param), and timeseries(). Previously a NOW-bearing fq
silently cast to NULL and matched nothing."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.functions.datemath import parse_instant
from solr_semantic_importer_spark.functions.solr_fq import parse_fq
from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)
UTC = dt.timezone.utc
FMT = "%Y-%m-%dT%H:%M:%SZ"


def _utc(*a):
    return dt.datetime(*a, tzinfo=UTC)


# ------------------------------------------------------------- unit layer


def test_parse_instant_now_and_offsets():
    now = _utc(2024, 3, 15, 10, 30, 45).timestamp()
    assert parse_instant("NOW", now_sec=now) == now
    assert parse_instant("NOW-7DAYS", now_sec=now) == now - 7 * 86400
    assert parse_instant("NOW+90MINUTES", now_sec=now) == now + 5400
    # round-down chain
    assert parse_instant("NOW/DAY", now_sec=now) == _utc(2024, 3, 15).timestamp()
    assert parse_instant("NOW/HOUR", now_sec=now) == \
        _utc(2024, 3, 15, 10).timestamp()
    assert parse_instant("NOW/MONTH", now_sec=now) == _utc(2024, 3, 1).timestamp()
    assert parse_instant("NOW/YEAR", now_sec=now) == _utc(2024, 1, 1).timestamp()
    # DATE aliases DAY (Solr DateMathParser)
    assert parse_instant("NOW/DATE", now_sec=now) == \
        parse_instant("NOW/DAY", now_sec=now)
    # chained: round then calendar-month offset
    assert parse_instant("NOW/DAY+6MONTHS", now_sec=now) == \
        _utc(2024, 9, 15).timestamp()


def test_parse_instant_iso_base_math():
    # ISO base + variable-width month offset with leap-day clamping
    assert parse_instant("2024-01-31T00:00:00Z+1MONTH") == \
        _utc(2024, 2, 29).timestamp()
    assert parse_instant("2024-02-29T00:00:00Z+1YEAR") == \
        _utc(2025, 2, 28).timestamp()
    assert parse_instant("2024-06-10T12:00:00Z/DAY-1DAY") == \
        _utc(2024, 6, 9).timestamp()
    # plain instants still parse (tz-naive = UTC)
    assert parse_instant("2024-01-01T00:00:00") == \
        parse_instant("2024-01-01T00:00:00Z")


def test_parse_instant_rejects_garbage():
    for bad in ("NOW-7FORTNIGHTS", "NOW//DAY", "NOW+DAYS", "NOW*2"):
        with pytest.raises(ValueError):
            parse_instant(bad, now_sec=0.0)


def test_parse_fq_timestamp_literals():
    types = {"ts": "timestamp"}
    now = _utc(2024, 3, 15, 10).timestamp()
    sql = parse_fq("ts:[NOW/DAY-2DAYS TO NOW/DAY]", types, now_sec=now)
    assert "TIMESTAMP '2024-03-13 00:00:00'" in sql
    assert "TIMESTAMP '2024-03-15 00:00:00'" in sql
    # both dialects emit the same typed literal
    assert parse_fq("ts:[NOW/DAY TO *]", types, "duckdb", now_sec=now) == \
        parse_fq("ts:[NOW/DAY TO *]", types, "spark", now_sec=now)
    with pytest.raises(Exception, match="bad date"):
        parse_fq("ts:[NOWISH TO *]", types, now_sec=now)


# ---------------------------------------------------------- engine layer


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    # ts anchored to the REAL current time: doc i sits i hours in the
    # past, so NOW-relative windows are deterministic at day granularity
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=6, seed=61)
    now = dt.datetime.now(UTC).timestamp()
    df = df.withColumn(
        "ts",
        F.timestamp_seconds(
            F.lit(int(now))
            - (F.crc32(F.concat("conv_id", F.col("turn_idx").cast("string")))
               % F.lit(10 * 86400))
        ),
    )
    d = str(tmp_path_factory.mktemp("dmi"))
    build_index(spark, df, d, BuildConfig(build_id="dmi", **CFG))
    return BM25Index(spark, d)


def test_fq_now_range_matches_brute(corpus):
    idx = corpus
    rows = [r.asDict() for r in idx.docs().select("doc_id", "ts").collect()]
    now = dt.datetime.now(UTC)
    cut = (now - dt.timedelta(days=3)).replace(
        hour=0, minute=0, second=0, microsecond=0)
    got = idx.count_matches("*:*", fq="ts:[NOW/DAY-3DAYS TO NOW]")
    want = sum(
        1 for r in rows
        if cut.timestamp() <= r["ts"].replace(tzinfo=UTC).timestamp()
        <= now.timestamp() + 120  # clock slack: the engine resolves its
    )                             # own NOW a moment after ours
    assert got == want
    assert 0 < got < len(rows)  # the window must discriminate


def test_facet_range_now_param_pinned(corpus):
    idx = corpus
    rows = [r.asDict() for r in idx.docs().select("doc_id", "ts").collect()]
    now = dt.datetime.now(UTC)
    resp = solr_select(idx, {
        "q": "*:*", "rows": 0, "facet": "true", "facet.range": "ts",
        "facet.range.start": "NOW/DAY-4DAYS",
        "facet.range.end": "NOW/DAY",
        "facet.range.gap": "+1DAY",
        "NOW": str(int(now.timestamp() * 1000)),  # Solr NOW request param
    })
    ent = resp["facet_counts"]["facet_ranges"]["ts"]
    day0 = now.replace(hour=0, minute=0, second=0, microsecond=0) \
        - dt.timedelta(days=4)
    counts = ent["counts"][1::2]
    assert ent["counts"][::2][0] == day0.strftime(FMT)
    for i, c in enumerate(counts):
        lo = day0 + dt.timedelta(days=i)
        want = sum(
            1 for r in rows
            if lo.timestamp() <= r["ts"].replace(tzinfo=UTC).timestamp()
            < lo.timestamp() + 86400
        )
        assert c == want
    assert sum(counts) > 0
