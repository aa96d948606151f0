"""Session-6 stream functions: tuple / let+get / parallel / knnSearch.

Each vs a DataFrame-built expectation plus fail-loud validation."""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.stream_expr import run_stream_expr
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=6, seed=7)
    d = str(tmp_path_factory.mktemp("sx6"))
    build_index(spark, df, d, BuildConfig(build_id="sx6", **CFG))
    return BM25Index(spark, d)


# ------------------------------------------------------------------ tuple


def test_tuple_embeds_literals_and_streams(idx):
    df = run_stream_expr(
        idx, 'tuple(label="probe", top3=search(tx, q="error", '
             'fl="doc_id,score", sort="score desc", rows=3))'
    )
    rows = df.collect()
    assert len(rows) == 1
    t = rows[0]
    assert t["label"] == "probe"
    expect = run_stream_expr(
        idx, 'search(tx, q="error", fl="doc_id,score", '
             'sort="score desc", rows=3)').collect()
    assert [e["doc_id"] for e in t["top3"]] == [r["doc_id"] for r in expect]


def test_tuple_validation(idx):
    with pytest.raises(ValueError, match="named params"):
        run_stream_expr(idx, 'tuple("bare")')


# ---------------------------------------------------------------- let/get


def test_let_binds_and_get_replays(idx):
    df = run_stream_expr(
        idx, 'let(hits=search(tx, q="error", fl="doc_id,score", '
             'sort="score desc", rows=10), '
             'top(get(hits), n=3, sort="score desc"))'
    )
    expect = run_stream_expr(
        idx, 'top(search(tx, q="error", fl="doc_id,score", '
             'sort="score desc", rows=10), n=3, sort="score desc")'
    ).collect()
    assert [r["doc_id"] for r in df.collect()] == \
        [r["doc_id"] for r in expect]


def test_let_sequential_scoping(idx):
    # a later binding may reference an earlier one (Solr's sequential let)
    df = run_stream_expr(
        idx, 'let(a=search(tx, q="error", fl="doc_id,score", '
             'sort="score desc", rows=10), '
             'b=top(get(a), n=2, sort="score desc"), get(b))'
    )
    assert len(df.collect()) == 2


def test_nested_let_shadowing(idx):
    # inner let rebinds `a`: its expr must see the INNER stream (1 row),
    # not the outer 10-row one
    df = run_stream_expr(
        idx, 'let(a=search(tx, q="error", fl="doc_id,score", '
             'sort="score desc", rows=10), '
             'let(a=echo("inner"), get(a)))'
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["echo"] == "inner"
    # an un-shadowed outer name still substitutes inside the inner let
    df2 = run_stream_expr(
        idx, 'let(a=search(tx, q="error", fl="doc_id,score", '
             'sort="score desc", rows=4), '
             'let(b=echo("x"), top(get(a), n=2, sort="score desc")))'
    )
    assert len(df2.collect()) == 2


def test_get_outside_let_fails(idx):
    with pytest.raises(ValueError, match="only valid inside let"):
        run_stream_expr(idx, 'get(a)')
    with pytest.raises(ValueError, match="unknown let binding"):
        run_stream_expr(
            idx, 'let(a=echo("x"), top(get(b), n=1, sort="echo asc"))')


# --------------------------------------------------------------- parallel


def test_parallel_is_transparent(idx):
    inner = ('rollup(search(tx, q="error", fl="doc_id,role", '
             'sort="role asc"), over="role", count(*))')
    plain = run_stream_expr(idx, inner).collect()
    par = run_stream_expr(
        idx, f'parallel(tx, {inner}, workers=4, sort="role asc")'
    ).collect()
    assert [tuple(r) for r in par] == [tuple(r) for r in plain]


def test_parallel_validation(idx):
    with pytest.raises(ValueError, match="workers"):
        run_stream_expr(
            idx, 'parallel(tx, echo("x"), workers=0, sort="echo asc")')
    with pytest.raises(ValueError, match="not in the stream"):
        run_stream_expr(
            idx, 'parallel(tx, echo("x"), workers=2, sort="nope asc")')


# -------------------------------------------------------------- knnSearch


def test_knnsearch_matches_mlt(idx):
    seed = int(idx.docs().select("doc_id").orderBy("doc_id").first()[0])
    df = run_stream_expr(
        idx, f'knnSearch(tx, id={seed}, qf="text", k=5)')
    rows = df.collect()
    expect = idx.more_like_this(seed, k=5).collect()
    assert [r["doc_id"] for r in rows] == [r["doc_id"] for r in expect]
    assert all(r["doc_id"] != seed for r in rows)  # seed never in results


def test_knnsearch_validation(idx):
    with pytest.raises(ValueError, match="analyzed text field"):
        run_stream_expr(idx, 'knnSearch(tx, id=0, qf="role", k=3)')
