"""Streaming expressions (query/stream_expr.py): parser shape, each stream
function vs a DataFrame-built expectation, sorted-stream contract
enforcement, and fail-loud validation."""

import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.stream_expr import (
    Call,
    parse_stream_expr,
    run_stream_expr,
)
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=6, seed=7)
    d = str(tmp_path_factory.mktemp("sx"))
    build_index(spark, df, d, BuildConfig(build_id="sx", **CFG))
    return BM25Index(spark, d)


# ----------------------------------------------------------------- parser


def test_parse_nested_call_tree():
    c = parse_stream_expr(
        'rollup(search(tx, q="error tool", sort="conv_id asc"), '
        'over="conv_id", count(*), sum(turn_idx))'
    )
    assert c.name == "rollup" and c.params["over"] == "conv_id"
    assert isinstance(c.args[0], Call) and c.args[0].name == "search"
    assert c.args[0].params["q"] == "error tool"
    assert [a.name for a in c.args[1:]] == ["count", "sum"]
    assert c.args[1].args == ["*"]


def test_parse_quoted_escapes_and_errors():
    c = parse_stream_expr(r'search(tx, q="say \"hi\"")')
    assert c.params["q"] == 'say "hi"'
    for bad in ("", "search(tx", "search(tx,)", 'search(tx, q="a" extra)',
                "search(tx) trailing", 'search(tx, q="a", q="b")'):
        with pytest.raises(ValueError):
            parse_stream_expr(bad)


# ---------------------------------------------------------------- search


def test_search_equals_engine(idx):
    df = run_stream_expr(
        idx, 'search(tx, q="error in tool", fl="doc_id,score", '
             'sort="score desc", rows=5)'
    )
    got = [(r.doc_id, round(r.score, 6)) for r in df.collect()]
    want = [
        (r.doc_id, round(r.score, 6))
        for r in idx.search("error in tool", k=5).collect()
    ]
    assert got == want


def test_search_field_sort_and_fq(idx):
    df = run_stream_expr(
        idx, 'search(tx, q="*:*", fq="role:user", '
             'fl="doc_id,conv_id", sort="doc_id asc", rows=8)'
    )
    rows = df.collect()
    assert [r.doc_id for r in rows] == sorted(r.doc_id for r in rows)
    n_user = idx.docs().filter("role = 'user'").count()
    full = run_stream_expr(
        idx, 'search(tx, q="*:*", fq="role:user", fl="doc_id", '
             'sort="doc_id asc")'
    )
    assert full.count() == n_user


# ------------------------------------------------------------ decorators


def test_rollup_matches_dataframe_agg(idx):
    df = run_stream_expr(
        idx, 'rollup(search(tx, q="*:*", sort="role asc"), '
             'over="role", count(*), avg(turn_idx))'
    )
    got = {(r.role): (r["count(*)"], round(r["avg(turn_idx)"], 6))
           for r in df.collect()}
    want = {
        r.role: (r.n, round(r.a, 6))
        for r in idx.docs()
        .groupBy("role")
        .agg(F.count("*").alias("n"), F.avg("turn_idx").alias("a"))
        .collect()
    }
    assert got == want


def test_stats_one_row(idx):
    df = run_stream_expr(idx, 'stats(tx, q="*:*", sum(turn_idx), max(turn_idx))')
    r = df.collect()
    assert len(r) == 1
    base = idx.docs().agg(F.sum("turn_idx"), F.max("turn_idx")).collect()[0]
    assert (r[0]["sum(turn_idx)"], r[0]["max(turn_idx)"]) == tuple(base)


def test_select_sort_unique_top(idx):
    expr = ('top(unique(select(search(tx, q="*:*", '
            'fl="doc_id,conv_id,turn_idx", sort="conv_id asc, doc_id asc"), '
            '"conv_id", "doc_id as first_doc"), over="conv_id"), '
            'n=5, sort="conv_id asc")')
    rows = run_stream_expr(idx, expr).collect()
    # unique over conv_id in (conv_id, doc_id) order = min doc per conv
    want = (
        idx.docs()
        .groupBy("conv_id")
        .agg(F.min("doc_id").alias("first_doc"))
        .orderBy("conv_id")
        .limit(5)
        .collect()
    )
    assert [(r.conv_id, r.first_doc) for r in rows] == [
        (r.conv_id, r.first_doc) for r in want
    ]


def test_having_filters(idx):
    rows = run_stream_expr(
        idx, 'having(rollup(search(tx, q="*:*", sort="role asc"), '
             'over="role", count(*)), gt(count(*), 0))'
    ).collect()
    assert len(rows) == 3  # user / assistant / tool all non-empty
    rows2 = run_stream_expr(
        idx, 'having(rollup(search(tx, q="*:*", sort="role asc"), '
             'over="role", count(*)), and(eq(role, "user"), gt(count(*), 1)))'
    ).collect()
    assert len(rows2) == 1 and rows2[0].role == "user"


# ----------------------------------------------------------------- joins


def test_inner_join_requires_sort_and_joins(idx):
    with pytest.raises(ValueError, match="must be sorted"):
        run_stream_expr(
            idx, 'innerJoin(search(tx, q="*:*", sort="score desc"), '
                 'search(tx, q="*:*", sort="doc_id asc"), on="doc_id")'
        )
    df = run_stream_expr(
        idx,
        'innerJoin('
        'select(search(tx, q="*:*", fq="role:user", fl="doc_id,conv_id,turn_idx",'
        ' sort="conv_id asc"), "conv_id", "turn_idx"), '
        'select(search(tx, q="*:*", fq="role:tool", fl="doc_id,conv_id",'
        ' sort="conv_id asc"), "conv_id"), '
        'on="conv_id")',
    )
    convs_with_tool = {
        r.conv_id for r in idx.docs().filter("role = 'tool'")
        .select("conv_id").distinct().collect()
    }
    got_convs = {r.conv_id for r in df.select("conv_id").distinct().collect()}
    assert got_convs == {
        r.conv_id for r in idx.docs().filter("role = 'user'")
        .select("conv_id").distinct().collect()
    } & convs_with_tool


def test_intersect_and_complement(idx):
    base = ('select(search(tx, q="*:*", fq="role:user", fl="doc_id,conv_id", '
            'sort="conv_id asc"), "conv_id")')
    right = ('select(search(tx, q="*:*", fq="role:tool", fl="doc_id,conv_id", '
             'sort="conv_id asc"), "conv_id")')
    inter = run_stream_expr(idx, f'intersect({base}, {right}, on="conv_id")')
    comp = run_stream_expr(idx, f'complement({base}, {right}, on="conv_id")')
    tool_convs = {
        r.conv_id for r in idx.docs().filter("role = 'tool'")
        .select("conv_id").distinct().collect()
    }
    assert {r.conv_id for r in inter.collect()} <= tool_convs
    assert not ({r.conv_id for r in comp.collect()} & tool_convs)
    assert inter.count() + comp.count() == run_stream_expr(idx, base).count()


def test_merge_unions_sorted_streams(idx):
    l = ('select(search(tx, q="*:*", fq="role:user", fl="doc_id", '
         'sort="doc_id asc"), "doc_id")')
    r = ('select(search(tx, q="*:*", fq="role:tool", fl="doc_id", '
         'sort="doc_id asc"), "doc_id")')
    df = run_stream_expr(idx, f'merge({l}, {r}, on="doc_id asc")')
    ids = [x.doc_id for x in df.collect()]
    assert ids == sorted(ids)
    n = idx.docs().filter("role IN ('user','tool')").count()
    assert len(ids) == n
    with pytest.raises(ValueError, match="sorted by the on"):
        run_stream_expr(idx, f'merge({l}, {r}, on="doc_id desc")')


# ------------------------------------------------------------- fail loud


def test_unsupported_surface_fails_loud(idx):
    for bad, msg in [
        ('daemon(search(tx, q="a", sort="doc_id asc"))', "run_daemon"),
        ('search(tx, q="a", shards="x")', "unsupported params"),
        ('search(tx)', "missing params"),
        ('rollup(search(tx, q="a", sort="doc_id asc"), over="role")',
         "at least one metric"),
        ('rollup(search(tx, q="a", sort="doc_id asc"), over="role", '
         'median(turn_idx))', "unsupported metric"),
        ('unique(search(tx, q="a", sort="score desc"), over="conv_id")',
         "must be sorted"),
        ('having(search(tx, q="a", sort="score desc"), median(x))',
         "boolean evaluator"),
    ]:
        with pytest.raises(ValueError, match=msg):
            run_stream_expr(idx, bad)


# --------------------------------------------- significantTerms / timeseries


def test_significant_terms_lift_matches_brute_force(idx, spark):
    from solr_semantic_importer_spark.functions.analysis import analyze_text

    rows = run_stream_expr(
        idx, 'significantTerms(tx, q="*:*", fq="role:tool", field="text", '
             'limit=5, minDocFreq=2, maxDocFreq=0.9, minTermLength=4)'
    ).collect()
    assert rows and list(rows[0].asDict()) == [
        "term", "foreground", "background", "score"]
    # brute force: distinct-term doc freq inside the tool subset vs corpus
    docs = idx.docs().select("doc_id", "text", "role").collect()
    n = len(docs)
    fg_docs = [d for d in docs if d.role == "tool"]
    fg_n = len(fg_docs)
    from collections import Counter
    fg = Counter(t for d in fg_docs for t in set(analyze_text(d.text)))
    bg = Counter(t for d in docs for t in set(analyze_text(d.text)))
    cand = [
        (round((fg[t] / fg_n) / (bg[t] / n), 6), t, fg[t], bg[t])
        for t in fg
        if 2 <= bg[t] <= int(0.9 * n) and len(t) >= 4
    ]
    want = sorted(cand, key=lambda x: (-x[0], x[1]))[:5]
    got = [(r.score, r.term, r.foreground, r.background) for r in rows]
    assert got == want


def test_significant_terms_validation(idx):
    with pytest.raises(ValueError, match="unknown field"):
        run_stream_expr(idx, 'significantTerms(tx, q="*:*", field="nope")')
    with pytest.raises(ValueError, match="missing params"):
        run_stream_expr(idx, 'significantTerms(tx, q="*:*")')


def test_timeseries_buckets_match_dataframe(idx):
    df = run_stream_expr(
        idx, 'timeseries(tx, q="*:*", field="turn_idx", start=0, end=6, '
             'gap=2, count(*), avg(dl))'
    )
    got = {(r.turn_idx): (r["count(*)"], round(r["avg(dl)"], 6))
           for r in df.collect()}
    want = {
        float(b): (n, round(a, 6))
        for b, n, a in (
            idx.docs()
            .filter("turn_idx >= 0 AND turn_idx < 6")
            .groupBy((F.floor(F.col("turn_idx") / 2) * 2).alias("b"))
            .agg(F.count("*").alias("n"), F.avg("dl").alias("a"))
            .collect()
        )
    }
    assert got == want
    with pytest.raises(ValueError, match="gap"):
        run_stream_expr(idx, 'timeseries(tx, q="*:*", field="turn_idx", '
                             'start=5, end=1, gap=1, count(*))')


# ------------------------------------------------------------------- /sql


def test_solr_sql_runs_over_live_docs(idx):
    from solr_semantic_importer_spark.query.stream_expr import solr_sql

    rows = solr_sql(
        idx,
        "SELECT role, count(*) AS n FROM collection GROUP BY role ORDER BY role",
    ).collect()
    want = sorted(
        (r.role, r.n)
        for r in idx.docs().groupBy("role").agg(F.count("*").alias("n")).collect()
    )
    assert [(r.role, r.n) for r in rows] == want


def test_facet_stream_source(idx):
    df = run_stream_expr(
        idx, 'facet(tx, q="*:*", buckets="role", '
             'bucketSorts="count(*) desc", bucketSizeLimit=2, '
             'count(*), avg(turn_idx))'
    )
    rows = df.collect()
    assert len(rows) == 2
    want = (
        idx.docs().groupBy("role")
        .agg(F.count("*").alias("n"), F.avg("turn_idx").alias("a"))
        .orderBy(F.col("n").desc()).limit(2).collect()
    )
    assert [(r.role, r["count(*)"], round(r["avg(turn_idx)"], 6)) for r in rows] \
        == [(r.role, r.n, round(r.a, 6)) for r in want]
    with pytest.raises(ValueError, match="neither a bucket nor"):
        run_stream_expr(idx, 'facet(tx, q="*:*", buckets="role", '
                             'bucketSorts="sum(dl) desc", count(*))')


# --------------------------------------------------- collections + update()


def test_update_sink_and_cross_collection(spark, idx, tmp_path_factory):
    # destination: a second real index
    df2 = generate_transcripts(spark, n_convs=5, turns_per_conv=4, seed=99)
    d2 = str(tmp_path_factory.mktemp("sxdest"))
    build_index(spark, df2, d2, BuildConfig(build_id="sxdest", **CFG))
    dest = BM25Index(spark, d2)
    n0 = dest.docs().count()

    colls = {"src": idx, "dest": dest}
    out = run_stream_expr(
        idx,
        'update(dest, search(src, q="*:*", fq="role:tool", '
        'fl="conv_id,turn_idx,role,text,tool,ts", sort="doc_id asc"))',
        collections=colls,
    ).collect()
    n_tool = idx.docs().filter("role = 'tool'").count()
    assert out[0].totalIndexed == n_tool and out[0].batchNumber == 0
    dest2 = BM25Index(spark, d2)
    assert dest2.docs().count() == n0 + n_tool
    # appended ids continued past the build range (no collisions)
    assert dest2.docs().groupBy("doc_id").count().filter("count > 1").count() == 0

    # cross-collection source resolution; a registry handle is a
    # point-in-time SEARCHER (Solr semantics: new docs appear on reopen)
    stale = run_stream_expr(
        idx, 'stats(dest, q="*:*", count(*))', collections=colls
    ).collect()
    assert stale[0]["count(*)"] == n0
    got = run_stream_expr(
        idx, 'stats(dest, q="*:*", count(*))',
        collections={**colls, "dest": dest2},
    ).collect()
    assert got[0]["count(*)"] == n0 + n_tool

    # fail loud: unknown names / missing registry / missing fields
    with pytest.raises(ValueError, match="unknown collection"):
        run_stream_expr(idx, 'stats(nope, q="*:*", count(*))',
                        collections=colls)
    with pytest.raises(ValueError, match="unknown destination"):
        run_stream_expr(idx, 'update(dest, search(src, q="*:*", '
                             'sort="doc_id asc"))')
    with pytest.raises(ValueError, match="missing destination fields"):
        run_stream_expr(
            idx, 'update(dest, select(search(src, q="*:*", '
                 'sort="doc_id asc"), "conv_id"))', collections=colls)


def test_select_drops_sort_metadata_of_dropped_keys(idx):
    from solr_semantic_importer_spark.query.stream_expr import (
        parse_stream_expr, _eval,
    )
    # stream sorted by (role, doc_id); projecting away role breaks the
    # ordered-stream contract from position 0 -- unique(over=doc_id) on
    # the projection must therefore fail loud
    s = _eval(parse_stream_expr(
        'select(search(tx, q="error", sort="role asc, doc_id asc"), '
        '"doc_id", "score")'
    ), idx)
    assert s.sort == ()
    # the surviving PREFIX keeps its metadata (with rename applied)
    s2 = _eval(parse_stream_expr(
        'select(search(tx, q="error", sort="role asc, doc_id asc"), '
        '"role as r", "score")'
    ), idx)
    assert s2.sort == (("r", "asc"),)


def test_stats_rejects_non_metric_args(idx):
    from solr_semantic_importer_spark.query.stream_expr import run_stream_expr
    with pytest.raises(ValueError, match="must be a metric"):
        run_stream_expr(idx, 'stats(tx, q="error", dl)')
