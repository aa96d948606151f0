"""Geospatial: geodist() function, {!geofilt} circle and {!bbox} rectangle
filters vs brute-force haversine; Spark-vs-DuckDB dialect agreement."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.functions.function_query import function_to_sql
from solr_semantic_importer_spark.functions.geo import (
    EARTH_RADIUS_KM,
    geo_fq_to_sql,
    parse_geo_fq,
)
from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)

PT = (45.15, -93.85)


def _hav(lat1, lon1, lat2, lon2):
    return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(
        math.sin(math.radians(lat2 - lat1) / 2) ** 2
        + math.cos(math.radians(lat1)) * math.cos(math.radians(lat2))
        * math.sin(math.radians(lon2 - lon1) / 2) ** 2
    ))


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    # transcripts + deterministic loc_lat/loc_lon spatial subfields (the
    # schema's PointType dimension columns); extra input columns flow
    # through build_index into the docs table
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=6, seed=23)
    df = df.withColumn(
        "loc_lat", (F.crc32(F.col("conv_id")) % 1000) / 10.0 - 50.0
    ).withColumn(
        "loc_lon", (F.crc32(F.concat(F.col("conv_id"), F.lit("x")))
                    % 3600) / 10.0 - 180.0
    )
    idx_dir = str(tmp_path_factory.mktemp("geo"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="geo", **CFG))
    return BM25Index(spark, idx_dir)


def _locs(idx):
    return {r["doc_id"]: (r["loc_lat"], r["loc_lon"])
            for r in idx.docs().select("doc_id", "loc_lat", "loc_lon")
            .collect()}


def test_parse_and_errors():
    assert parse_geo_fq("{!geofilt sfield=loc pt=45.15,-93.85 d=5}") == \
        ("geofilt", "loc", 45.15, -93.85, 5.0)
    assert parse_geo_fq("role:user") is None
    with pytest.raises(ValueError):
        parse_geo_fq("{!geofilt sfield=loc pt=1,2 d=5 score=distance}")
    with pytest.raises(ValueError):
        parse_geo_fq("{!bbox sfield=loc pt=1,2}")
    with pytest.raises(ValueError):
        parse_geo_fq("{!geofilt sfield=loc pt=xx d=1}")
    with pytest.raises(ValueError):
        geo_fq_to_sql("{!geofilt sfield=nope pt=1,2 d=5}",
                      {"loc_lat": "double"})


def test_geofilt_matches_brute(corpus):
    idx = corpus
    d = 2000.0
    fq = f"{{!geofilt sfield=loc pt={PT[0]},{PT[1]} d={d}}}"
    got = {r["doc_id"] for r in idx.score_matches("error", fq=fq).collect()}
    base = {r["doc_id"] for r in idx.score_matches("error").collect()}
    locs = _locs(idx)
    want = {i for i in base if _hav(PT[0], PT[1], *locs[i]) <= d}
    assert got == want and 0 < len(got) < len(base)


def test_bbox_superset_of_geofilt(corpus):
    idx = corpus
    d = 2000.0
    gf = f"{{!geofilt sfield=loc pt={PT[0]},{PT[1]} d={d}}}"
    bb = f"{{!bbox sfield=loc pt={PT[0]},{PT[1]} d={d}}}"
    circle = {r["doc_id"] for r in idx.score_matches("error", fq=gf).collect()}
    rect = {r["doc_id"] for r in idx.score_matches("error", fq=bb).collect()}
    assert circle <= rect
    locs = _locs(idx)
    dlat = math.degrees(d / EARTH_RADIUS_KM)
    dlon = math.degrees(d / (EARTH_RADIUS_KM * math.cos(math.radians(PT[0]))))
    base = {r["doc_id"] for r in idx.score_matches("error").collect()}
    want = {i for i in base
            if abs(locs[i][0] - PT[0]) <= dlat
            and abs(locs[i][1] - PT[1]) <= dlon}
    assert rect == want


def test_geodist_sort_and_frange(corpus):
    idx = corpus
    locs = _locs(idx)
    resp = solr_select(idx, {
        "q": "error", "rows": 8,
        "sort": f"geodist(loc,{PT[0]},{PT[1]}) asc", "fl": "doc_id",
    })
    matched = [r["doc_id"] for r in idx.score_matches("error").collect()]
    want = sorted(matched,
                  key=lambda i: (_hav(PT[0], PT[1], *locs[i]), i))[:8]
    assert [d["doc_id"] for d in resp["response"]["docs"]] == want
    # frange over geodist == geofilt
    fr = f"{{!frange u=2000}}geodist(loc,{PT[0]},{PT[1]})"
    gf = f"{{!geofilt sfield=loc pt={PT[0]},{PT[1]} d=2000}}"
    a = {r["doc_id"] for r in idx.score_matches("error", fq=fr).collect()}
    b = {r["doc_id"] for r in idx.score_matches("error", fq=gf).collect()}
    assert a == b and a


def test_geodist_dialect_agreement(corpus):
    idx = corpus
    types = dict(idx.docs().dtypes)
    expr = f"geodist(loc,{PT[0]},{PT[1]})"
    s_sql, used = function_to_sql(expr, types, "spark")
    d_sql, _ = function_to_sql(expr, types, "duckdb")
    assert used == ["loc_lat", "loc_lon"]
    pdf = idx.docs().select("doc_id", "loc_lat", "loc_lon") \
        .orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.register("d", pdf)
    got = [r[0] for r in idx.docs().orderBy("doc_id")
           .select(F.expr(s_sql)).collect()]
    want = [r[0] for r in
            con.execute(f"SELECT {d_sql} FROM d ORDER BY doc_id").fetchall()]
    locs = _locs(idx)
    brute = [_hav(PT[0], PT[1], *locs[i]) for i in sorted(locs)]
    for g, w, b in zip(got, want, brute):
        assert g == pytest.approx(w, rel=1e-12)
        assert g == pytest.approx(b, rel=1e-9)
