"""json.facet DATE range facets (r5): ISO start/end + DateMath gaps —
fixed-width AND variable-width (+NMONTHS/+NYEARS) — over timestamp
fields, with ISO bucket labels at the real calendar boundaries. Numeric
range facets keep their existing shape; brute-force verified on both a
top-level range facet (with a nested stat) and a range facet nested
under a terms facet."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.functions.datemath import month_bucket_starts
from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.json_facet import json_facet
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)
UTC = dt.timezone.utc
FMT = "%Y-%m-%dT%H:%M:%SZ"


def _utc(*a):
    return dt.datetime(*a, tzinfo=UTC)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=6, seed=19)
    base = int(_utc(2024, 1, 10).timestamp())
    df = df.withColumn(
        "ts",
        F.timestamp_seconds(
            F.lit(base)
            + (F.crc32(F.concat("conv_id", F.col("turn_idx").cast("string")))
               % F.lit(150 * 86400))
        ),
    )
    d = str(tmp_path_factory.mktemp("jfrd"))
    build_index(spark, df, d, BuildConfig(build_id="jfrd", **CFG))
    return BM25Index(spark, d)


def _rows(idx, q):
    if q.strip() == "*:*":
        ids = None
    else:
        ids = {r["doc_id"] for r in idx.score_matches(q).collect()}
    return [r.asDict() for r in idx.docs().collect()
            if ids is None or r["doc_id"] in ids]


def _sec(v):
    return v.replace(tzinfo=UTC).timestamp()


def test_top_level_date_range_month_gap(corpus):
    idx = corpus
    lo, hi = _utc(2024, 1, 31), _utc(2024, 6, 1)
    got = json_facet(idx, "error", {
        "by_month": {
            "type": "range", "field": "ts",
            "start": lo.strftime(FMT), "end": hi.strftime(FMT),
            "gap": "+1MONTH",
            "facet": {"avg_turn": "avg(turn_idx)"},
        },
    })["by_month"]["buckets"]
    starts = month_bucket_starts(lo.timestamp(), hi.timestamp(), 1)[:-1]
    rows = _rows(idx, "error")
    assert [b["val"] for b in got] == [
        dt.datetime.fromtimestamp(s, UTC).strftime(FMT) for s in starts
    ]
    # labels clamp from the original Jan 31 start: Feb 29 (leap), Mar 31
    assert got[1]["val"].startswith("2024-02-29")
    bounds = starts + [hi.timestamp()]
    for i, b in enumerate(got):
        sel = [r for r in rows
               if bounds[i] <= _sec(r["ts"]) < bounds[i + 1]]
        assert b["count"] == len(sel)
        if sel:
            assert b["avg_turn"] == pytest.approx(
                sum(r["turn_idx"] for r in sel) / len(sel))
    assert sum(b["count"] for b in got) > 0


def test_top_level_date_range_fixed_gap(corpus):
    idx = corpus
    lo, hi = _utc(2024, 1, 10), _utc(2024, 1, 14)
    got = json_facet(idx, "*:*", {
        "daily": {"type": "range", "field": "ts",
                  "start": lo.strftime(FMT), "end": hi.strftime(FMT),
                  "gap": "+1DAY"},
    })["daily"]["buckets"]
    rows = _rows(idx, "*:*")
    assert len(got) == 4
    for i, b in enumerate(got):
        b_lo = lo.timestamp() + i * 86400
        assert b["val"] == dt.datetime.fromtimestamp(b_lo, UTC).strftime(FMT)
        assert b["count"] == sum(
            1 for r in rows if b_lo <= _sec(r["ts"]) < b_lo + 86400)


def test_date_range_nested_under_terms(corpus):
    idx = corpus
    lo, hi = _utc(2024, 2, 1), _utc(2024, 6, 1)
    got = json_facet(idx, "*:*", {
        "roles": {
            "type": "terms", "field": "role", "limit": 3,
            "facet": {
                "by2m": {"type": "range", "field": "ts",
                         "start": lo.strftime(FMT), "end": hi.strftime(FMT),
                         "gap": "+2MONTHS"},
            },
        },
    })["roles"]["buckets"]
    rows = _rows(idx, "*:*")
    starts = month_bucket_starts(lo.timestamp(), hi.timestamp(), 2)[:-1]
    bounds = starts + [hi.timestamp()]
    assert got
    for rb in got:
        role_rows = [r for r in rows if r["role"] == rb["val"]]
        assert rb["count"] == len(role_rows)
        for i, b in enumerate(rb["by2m"]["buckets"]):
            want = sum(1 for r in role_rows
                       if bounds[i] <= _sec(r["ts"]) < bounds[i + 1])
            assert b["count"] == want


def test_numeric_range_unchanged(corpus):
    idx = corpus
    got = json_facet(idx, "*:*", {
        "dl4": {"type": "range", "field": "dl",
                "start": 0, "end": 80, "gap": 20},
    })["dl4"]["buckets"]
    rows = _rows(idx, "*:*")
    assert [b["val"] for b in got] == [0, 20, 40, 60]
    for i, b in enumerate(got):
        assert b["count"] == sum(
            1 for r in rows if 20 * i <= r["dl"] < 20 * (i + 1))


def test_bad_date_gap_fails_loud(corpus):
    idx = corpus
    with pytest.raises(ValueError, match="date gap"):
        json_facet(idx, "*:*", {
            "x": {"type": "range", "field": "ts",
                  "start": "2024-01-01T00:00:00Z",
                  "end": "2024-02-01T00:00:00Z", "gap": "+1FORTNIGHT"},
        })
