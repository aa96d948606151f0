"""Round-5 ADVICE regression tests.

1. an fl consisting ONLY of a glob that matches no stored column yields
   zero stored fields (id key only) — never the fl-unset every-field
   fallback. Same for fl=score alone.
2. _iso_sec / facet.range date parsing treat tz-naive instants as UTC
   (covered in tests/test_datemath_month.py::test_iso_sec_naive_is_utc
   and ..::test_timeseries_naive_instants_are_utc).
3. hist() over a column with nulls skips the null rows instead of
   crashing on the null width_bucket group.
"""

import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.query.stream_expr import run_stream_expr
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=6, seed=52)
    # numeric stored column with nulls on ~1/3 of rows (hist ADVICE case)
    df = df.withColumn(
        "val",
        F.when(F.crc32("conv_id") % 3 == 0, None)
        .otherwise((F.crc32(F.concat("conv_id", "role")) % 100)
                   .cast("double")),
    )
    d = str(tmp_path_factory.mktemp("advr5"))
    build_index(spark, df, d, BuildConfig(build_id="advr5", **CFG))
    return BM25Index(spark, d)


def test_fl_all_glob_miss_returns_no_stored_fields(idx):
    r = solr_select(idx, {"q": "error", "rows": 3, "fl": "zzz_*"})
    assert r["response"]["docs"], "query must match"
    for d in r["response"]["docs"]:
        # id key only — NOT every stored field (the old fall-through)
        assert set(d) == {"doc_id"}


def test_fl_score_alone_returns_no_stored_fields(idx):
    r = solr_select(idx, {"q": "error", "rows": 3, "fl": "score"})
    for d in r["response"]["docs"]:
        assert set(d) == {"doc_id", "score"}


def test_fl_glob_hit_unchanged(idx):
    r = solr_select(idx, {"q": "error", "rows": 2, "fl": "conv_*"})
    for d in r["response"]["docs"]:
        assert "conv_id" in d and "text" not in d


def test_hist_ignores_nulls(idx):
    src = 'search(tx, q="*:*", fl="doc_id,val", sort="doc_id asc")'
    rows = run_stream_expr(idx, f"hist(col({src}, val), bins=5)").collect()
    vals = [r["val"] for r in idx.docs().select("val").collect()]
    present = [v for v in vals if v is not None]
    assert len(present) < len(vals), "corpus must contain nulls"
    assert sum(r["count"] for r in rows) == len(present)
    # brute-force bin membership
    mn, mx = min(present), max(present)
    width = ((mx - mn) / 5) or 1.0
    for r in rows:
        want = sum(
            1 for v in present
            if min(int((v - mn) // width), 4) == r["bin"]
        )
        assert r["count"] == want
