"""facet.heatmap: 2D spatial grid counts over the exact DocSet vs a
brute-force grid; geom snapping, null-row sparsity, /select shape."""

import math

import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import (
    _parse_heatmap_geom,
    solr_select,
)
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=6, seed=31)
    df = df.withColumn(
        "loc_lat", (F.crc32(F.col("conv_id")) % 1000) / 10.0 - 50.0
    ).withColumn(
        "loc_lon", (F.crc32(F.concat(F.col("conv_id"), F.lit("x")))
                    % 3600) / 10.0 - 180.0
    )
    idx_dir = str(tmp_path_factory.mktemp("hm"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="hm", **CFG))
    return BM25Index(spark, idx_dir)


def _locs(idx, q=None):
    rows = idx.docs().select("doc_id", "loc_lat", "loc_lon")
    locs = {r["doc_id"]: (r["loc_lat"], r["loc_lon"]) for r in rows.collect()}
    if q is None:
        return locs
    ids = {r["doc_id"] for r in idx.score_matches(q).collect()}
    return {i: ll for i, ll in locs.items() if i in ids}


def _brute_grid(locs, g, geom=None):
    w, h = 360.0 / (1 << g), 180.0 / (1 << g)
    mx0, my0, mx1, my1 = geom if geom else (-180.0, -90.0, 180.0, 90.0)
    sx0 = -180.0 + math.floor((mx0 + 180.0) / w) * w
    sx1 = -180.0 + math.ceil((mx1 + 180.0) / w) * w
    sy0 = -90.0 + math.floor((my0 + 90.0) / h) * h
    sy1 = -90.0 + math.ceil((my1 + 90.0) / h) * h
    cols = round((sx1 - sx0) / w)
    rows = round((sy1 - sy0) / h)
    grid = [[0] * cols for _ in range(rows)]
    for lat, lon in locs.values():
        if not (sx0 <= lon < sx1 and sy0 <= lat < sy1):
            continue
        grid[int((sy1 - lat) // h)][int((lon - sx0) // w)] += 1
    return (sx0, sy0, sx1, sy1, cols, rows,
            [row if any(row) else None for row in grid])


def test_world_grid_matches_brute(corpus):
    hm = corpus.facet_heatmap("*:*", "loc", grid_level=4)
    sx0, sy0, sx1, sy1, cols, rows, want = _brute_grid(_locs(corpus), 4)
    assert (hm["columns"], hm["rows"]) == (cols, rows) == (16, 16)
    assert (hm["minX"], hm["minY"], hm["maxX"], hm["maxY"]) == \
        (sx0, sy0, sx1, sy1)
    assert hm["counts_ints2D"] == want
    total = sum(sum(r) for r in hm["counts_ints2D"] if r)
    assert total == corpus.docs().count()  # every point inside the world


def test_geom_snap_and_query_docset(corpus):
    # a scored query's DocSet, restricted to a box that is NOT on cell
    # boundaries -- the response box must be the snapped superset
    geom = (-50.3, -20.7, 61.9, 33.1)
    hm = corpus.facet_heatmap("error", "loc", grid_level=5, geom=geom)
    locs = _locs(corpus, q="error")
    sx0, sy0, sx1, sy1, cols, rows, want = _brute_grid(locs, 5, geom)
    assert hm["minX"] <= geom[0] and hm["maxX"] >= geom[2]
    assert (hm["minX"], hm["minY"], hm["maxX"], hm["maxY"]) == \
        (sx0, sy0, sx1, sy1)
    assert hm["counts_ints2D"] == want
    assert any(r is None for r in hm["counts_ints2D"]) or rows <= 2


def test_fq_and_distname_err(corpus):
    hm = corpus.facet_heatmap("*:*", "loc", grid_level=3, fq="role:user")
    n = corpus.docs().filter("role = 'user'").count()
    assert sum(sum(r) for r in hm["counts_ints2D"] if r) == n
    # distErr derives the level: cell height 180/2^g <= distErr
    hm2 = corpus.facet_heatmap("*:*", "loc", dist_err=12.0)
    assert hm2["gridLevel"] == 4  # 180/16 = 11.25 <= 12 < 22.5
    with pytest.raises(ValueError, match="unknown spatial field"):
        corpus.facet_heatmap("*:*", "nope", grid_level=3)
    with pytest.raises(ValueError, match="gridLevel or a"):
        corpus.facet_heatmap("*:*", "loc")
    with pytest.raises(ValueError, match="exceeds"):
        corpus.facet_heatmap("*:*", "loc", grid_level=12)


def test_select_facade_shape(corpus):
    resp = solr_select(corpus, {
        "q": "error", "rows": 2, "facet": "true",
        "facet.heatmap": "loc",
        "facet.heatmap.geom": '["-50 -20" TO "60 35"]',
        "facet.heatmap.gridLevel": "5",
    })
    hm = resp["facet_counts"]["facet_heatmaps"]["loc"]
    assert set(hm) == {"gridLevel", "columns", "rows", "minX", "maxX",
                       "minY", "maxY", "counts_ints2D"}
    locs = _locs(corpus, q="error")
    *_, want = _brute_grid(locs, 5, (-50.0, -20.0, 60.0, 35.0))
    assert hm["counts_ints2D"] == want
    with pytest.raises(ValueError, match="ints2D only"):
        solr_select(corpus, {"q": "error", "facet": "true",
                             "facet.heatmap": "loc",
                             "facet.heatmap.gridLevel": "4",
                             "facet.heatmap.format": "png"})


def test_geom_parse():
    assert _parse_heatmap_geom(None) is None
    assert _parse_heatmap_geom('["-10 -5" TO "10.5 20"]') == \
        (-10.0, -5.0, 10.5, 20.0)
    assert _parse_heatmap_geom('[-10 -5 TO 10.5 20]') == \
        (-10.0, -5.0, 10.5, 20.0)
    with pytest.raises(ValueError, match="facet.heatmap.geom"):
        _parse_heatmap_geom("POLYGON((1 2))")


def test_json_facet_heatmap_matches_classic(corpus):
    """json.facet {type: heatmap} = the classic facet.heatmap response
    (same engine path), keyed inside the facets node."""
    from solr_semantic_importer_spark.query.json_facet import json_facet

    classic = corpus.facet_heatmap("error", "loc", grid_level=3)
    got = json_facet(corpus, "error",
                     {"hm": {"type": "heatmap", "field": "loc",
                             "gridLevel": 3}})
    assert got["hm"] == classic
    # geom + distErr spellings parse like the classic params
    g = json_facet(corpus, "error",
                   {"hm": {"type": "heatmap", "field": "loc",
                           "distErr": "22.5",
                           "geom": '["-40 -20" TO "40 20"]'}})
    want = corpus.facet_heatmap("error", "loc", dist_err=22.5,
                                geom=(-40.0, -20.0, 40.0, 20.0))
    assert g["hm"] == want
    with pytest.raises(ValueError, match="unsupported heatmap facet keys"):
        json_facet(corpus, "error",
                   {"hm": {"type": "heatmap", "field": "loc",
                           "domain": {"query": "*:*"}}})
    with pytest.raises(ValueError, match="needs field"):
        json_facet(corpus, "error", {"hm": {"type": "heatmap"}})
