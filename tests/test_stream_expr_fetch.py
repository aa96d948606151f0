"""Session-4 stream functions: fetch / random / cartesianProduct / reduce.

Each vs a DataFrame-built expectation plus fail-loud validation."""

import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.stream_expr import run_stream_expr
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=6, seed=7)
    d = str(tmp_path_factory.mktemp("sx4"))
    build_index(spark, df, d, BuildConfig(build_id="sx4", **CFG))
    return BM25Index(spark, d)


# ------------------------------------------------------------------ fetch


def test_fetch_enriches_tuples(idx):
    df = run_stream_expr(
        idx, 'fetch(tx, search(tx, q="error tool", fl="doc_id,score", '
             'sort="score desc", rows=5), on="doc_id=doc_id", fl="role,conv_id")'
    )
    rows = df.collect()
    # list equality: a duplicated key column from self-join lineage must
    # not survive the fetch
    assert df.columns == ["doc_id", "score", "role", "conv_id"]
    stored = {r["doc_id"]: (r["role"], r["conv_id"])
              for r in idx.docs().collect()}
    for r in rows:
        assert (r["role"], r["conv_id"]) == stored[r["doc_id"]]
    # the stream's sort survives the join
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True) and len(rows) == 5


def test_fetch_validation(idx):
    with pytest.raises(ValueError, match="unknown collection fields"):
        run_stream_expr(
            idx, 'fetch(tx, search(tx, q="error", fl="doc_id", '
                 'sort="score desc"), on="doc_id=doc_id", fl="nope")'
        )
    with pytest.raises(ValueError, match="already exist in the stream"):
        run_stream_expr(
            idx, 'fetch(tx, search(tx, q="error", fl="doc_id,role", '
                 'sort="score desc"), on="doc_id=doc_id", fl="role")'
        )
    with pytest.raises(ValueError, match="exactly one key"):
        run_stream_expr(
            idx, 'fetch(tx, search(tx, q="error", fl="doc_id", '
                 'sort="score desc"), on="doc_id=doc_id, conv_id=conv_id", '
                 'fl="role")'
        )
    with pytest.raises(ValueError, match="not in the stream"):
        run_stream_expr(
            idx, 'fetch(tx, search(tx, q="error", fl="doc_id", '
                 'sort="score desc"), on="conv_id=conv_id", fl="role")'
        )
    # fl repeating the key would duplicate the column — fail loud
    with pytest.raises(ValueError, match="already exist in the stream"):
        run_stream_expr(
            idx, 'fetch(tx, search(tx, q="error", fl="doc_id", '
                 'sort="score desc"), on="doc_id=doc_id", fl="doc_id,role")'
        )


# ----------------------------------------------------------------- random


def test_random_deterministic_and_seeded(idx):
    e = 'random(tx, q="*:*", fq="role:user", rows=7, fl="doc_id,role")'
    a = [r["doc_id"] for r in run_stream_expr(idx, e).collect()]
    b = [r["doc_id"] for r in run_stream_expr(idx, e).collect()]
    assert a == b and len(a) == 7              # deterministic
    c = [r["doc_id"] for r in run_stream_expr(
        idx, e.replace("rows=7", "rows=7, seed=9")).collect()]
    assert set(a) != set(c)                    # seed changes the draw
    roles = {r["role"] for r in run_stream_expr(idx, e).collect()}
    assert roles == {"user"}                   # fq applies
    # membership: every drawn doc is in the match set
    user_ids = {r["doc_id"] for r in
                idx.docs().filter("role = 'user'").collect()}
    assert set(a) <= user_ids


# ------------------------------------------------------- cartesianProduct


def test_cartesian_product_explodes(spark, idx, monkeypatch):
    # build a stream with a multivalued column via select over rollup is
    # awkward; drive the evaluator through search + a synthetic array by
    # using reduce() (whose group column is an array) downstream instead:
    expr = (
        'cartesianProduct(reduce(search(tx, q="*:*", fl="conv_id,doc_id", '
        'sort="conv_id asc"), by="conv_id", group(sort="doc_id asc", n=3)), '
        'group, productSort="conv_id asc")'
    )
    df = run_stream_expr(idx, expr)
    # each conv contributes min(3, turns) rows, group is now a struct
    per = df.groupBy("conv_id").count().collect()
    assert all(r["count"] == 3 for r in per)
    assert df.schema["group"].dataType.typeName() == "struct"


def test_cartesian_product_validation(idx):
    with pytest.raises(ValueError, match="not multivalued"):
        run_stream_expr(
            idx, 'cartesianProduct(search(tx, q="error", fl="doc_id", '
                 'sort="score desc"), doc_id)'
        )
    with pytest.raises(ValueError, match="unknown field"):
        run_stream_expr(
            idx, 'cartesianProduct(search(tx, q="error", fl="doc_id", '
                 'sort="score desc"), nope)'
        )


# ----------------------------------------------------------------- reduce


def test_reduce_groups_topn(idx):
    df = run_stream_expr(
        idx, 'reduce(search(tx, q="*:*", fl="conv_id,doc_id,turn_idx", '
             'sort="conv_id asc"), by="conv_id", '
             'group(sort="turn_idx desc", n=2))'
    )
    rows = df.collect()
    convs = [r["conv_id"] for r in rows]
    assert convs == sorted(convs) and len(rows) == 40
    # expectation built straight from the docs table
    want = {
        r["conv_id"]: [x["turn_idx"] for x in r["g"]]
        for r in idx.docs().groupBy("conv_id").agg(
            F.slice(F.sort_array(F.collect_list(
                F.struct("turn_idx", "doc_id")), asc=False), 1, 2).alias("g")
        ).collect()
    }
    for r in rows:
        assert [t["turn_idx"] for t in r["group"]] == want[r["conv_id"]]
        assert set(r["group"][0].asDict()) == {"doc_id", "turn_idx"}


def test_reduce_requires_sorted_by(idx):
    with pytest.raises(ValueError, match="must be sorted by"):
        run_stream_expr(
            idx, 'reduce(search(tx, q="*:*", fl="conv_id,doc_id", '
                 'sort="doc_id asc"), by="conv_id", '
                 'group(sort="doc_id asc", n=2))'
        )
    with pytest.raises(ValueError, match="n must be"):
        run_stream_expr(
            idx, 'reduce(search(tx, q="*:*", fl="conv_id,doc_id", '
                 'sort="conv_id asc"), by="conv_id", '
                 'group(sort="doc_id asc", n=0))'
        )
    with pytest.raises(ValueError, match="only the by= fields"):
        run_stream_expr(
            idx, 'reduce(select(search(tx, q="*:*", fl="conv_id,doc_id", '
                 'sort="conv_id asc"), conv_id), by="conv_id", '
                 'group(sort="conv_id asc", n=2))'
        )


# ----------------------------------------------------------------- nodes


@pytest.fixture(scope="module")
def chain_idx(spark, tmp_path_factory):
    from pyspark.sql.window import Window
    df = generate_transcripts(spark, n_convs=5, turns_per_conv=4, seed=17)
    w = Window.orderBy("conv_id", "turn_idx")
    df = df.withColumn("pos", F.row_number().over(w) - 1)
    df = df.withColumn("from_f", F.concat(F.lit("n"), (F.col("pos") + 1)))
    df = df.withColumn("to_f", F.concat(F.lit("n"), F.col("pos"))).drop("pos")
    d = str(tmp_path_factory.mktemp("nod"))
    build_index(spark, df, d, BuildConfig(build_id="nod", **CFG))
    return BM25Index(spark, d)


def test_nodes_one_hop(chain_idx):
    idx = chain_idx
    # roots: the doc at chain position 0 (from_f = n1); one hop gathers
    # the from_f of the doc whose to_f = n1, i.e. n2
    df = run_stream_expr(
        idx, 'nodes(tx, search(tx, q="to_f:n0", fl="doc_id,from_f", '
             'sort="doc_id asc"), walk="from_f->to_f", gather="from_f", '
             'count(*))'
    )
    rows = df.collect()
    assert [(r["node"], r["level"], r["count(*)"]) for r in rows] \
        == [("n2", 1, 1)]
    assert rows[0]["field"] == "from_f" and rows[0]["collection"] == "tx"


def test_nodes_nested_two_hops_and_scatter(chain_idx):
    idx = chain_idx
    two = run_stream_expr(
        idx, 'nodes(tx, nodes(tx, search(tx, q="to_f:n0", fl="from_f", '
             'sort="from_f asc"), walk="from_f->to_f", gather="from_f"), '
             'walk="node->to_f", gather="from_f", scatter="branches,leaves")'
    )
    rows = {(r["node"], r["level"]) for r in two.collect()}
    assert rows == {("n2", 0), ("n3", 1)}  # branch root + next hop
    only_roots = run_stream_expr(
        idx, 'nodes(tx, search(tx, q="to_f:n0", fl="from_f", '
             'sort="from_f asc"), walk="from_f->to_f", gather="from_f", '
             'scatter="branches")'
    )
    assert [(r["node"], r["level"]) for r in only_roots.collect()] \
        == [("n1", 0)]


def test_nodes_fail_loud(chain_idx):
    idx = chain_idx
    base = 'search(tx, q="to_f:n0", fl="from_f", sort="from_f asc")'
    with pytest.raises(ValueError, match="walk must be"):
        run_stream_expr(idx, f'nodes(tx, {base}, walk="from_f", '
                             f'gather="from_f")')
    with pytest.raises(ValueError, match="not in the stream"):
        run_stream_expr(idx, f'nodes(tx, {base}, walk="nope->to_f", '
                             f'gather="from_f")')
    with pytest.raises(ValueError, match="unknown collection fields"):
        run_stream_expr(idx, f'nodes(tx, {base}, walk="from_f->nope", '
                             f'gather="from_f")')
    with pytest.raises(ValueError, match="scatter takes"):
        run_stream_expr(idx, f'nodes(tx, {base}, walk="from_f->to_f", '
                             f'gather="from_f", scatter="roots")')


# ------------------------------------------------------------- scoreNodes


def test_score_nodes_tfidf(chain_idx):
    """scoreNodes over a nodes() hop: docFreq = docs carrying the node
    value in the gather field, nodeScore = count x log((N+1)/(df+1)),
    brute-forced from the collected corpus."""
    import math

    idx = chain_idx
    df = run_stream_expr(
        idx, 'scoreNodes(tx, nodes(tx, search(tx, q="to_f:n0", '
             'fl="doc_id,from_f", sort="doc_id asc"), '
             'walk="from_f->to_f", gather="from_f", count(*)))'
    )
    rows = {r["node"]: r for r in df.collect()}
    docs = idx.docs().collect()
    n = len(docs)
    for node, r in rows.items():
        want_df = sum(1 for d in docs if d["from_f"] == node)
        assert r["docFreq"] == want_df and r["numDocs"] == n
        want = r["count(*)"] * math.log((n + 1) / (want_df + 1))
        assert r["nodeScore"] == pytest.approx(want)
    assert rows  # the n0 hop gathers n2


def test_score_nodes_validation(chain_idx):
    with pytest.raises(ValueError, match="lacks"):
        run_stream_expr(
            chain_idx, 'scoreNodes(tx, search(tx, q="*:*", fl="doc_id", '
                       'sort="doc_id asc"))')
    with pytest.raises(ValueError, match="scoreNodes\\(collection"):
        run_stream_expr(chain_idx, 'scoreNodes(tx)')


# ------------------------------------------------------- list/plist/echo


def test_list_concatenates_streams(idx):
    df = run_stream_expr(
        idx, 'list(search(tx, q="error", fl="doc_id,role", '
             'sort="doc_id asc", rows=3), '
             'search(tx, q="tool", fl="doc_id,conv_id", '
             'sort="doc_id asc", rows=2))'
    )
    rows = df.collect()
    assert len(rows) == 5
    # stream order: first stream's 3 rows lead; shared sort re-asserted
    a = [r["doc_id"] for r in rows[:3]]
    assert a == sorted(a)
    # missing fields null-fill across the union
    assert rows[0]["conv_id"] is None and rows[3]["role"] is None
    # plist: same output contract
    p = run_stream_expr(
        idx, 'plist(search(tx, q="error", fl="doc_id", '
             'sort="doc_id asc", rows=3), '
             'search(tx, q="tool", fl="doc_id", '
             'sort="doc_id asc", rows=2))'
    ).collect()
    assert [r["doc_id"] for r in p[:3]] == a


def test_echo_and_list_validation(idx):
    rows = run_stream_expr(idx, 'echo("hello world")').collect()
    assert [r.asDict() for r in rows] == [{"echo": "hello world"}]
    with pytest.raises(ValueError, match="list\\(stream"):
        run_stream_expr(idx, 'list(tx)')
    # list output advertises no sort: unique() over it fails loud
    with pytest.raises(ValueError, match="must be sorted"):
        run_stream_expr(
            idx, 'unique(list(search(tx, q="error", fl="doc_id", '
                 'sort="doc_id asc", rows=2)), over="doc_id")')
