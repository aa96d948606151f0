"""Solr function queries: parser goldens, Spark-vs-DuckDB dialect
agreement, bf/boost scoring vs brute force, {!frange} filters, and
sort-by-function -- the FunctionQParser surface on /select."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.functions.function_query import (
    fields_used,
    frange_to_sql,
    function_to_sql,
    looks_like_function,
    parse_frange,
    parse_function_query,
)
from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)

TYPES = {"turn_idx": "int", "dl": "bigint", "ts": "timestamp",
         "tool": "string", "doc_id": "bigint"}


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=6, seed=11)
    idx_dir = str(tmp_path_factory.mktemp("funcq"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="funcq", **CFG))
    return BM25Index(spark, idx_dir)


# ---------- parser ----------

def test_parse_shapes():
    assert parse_function_query("3.5") == ("num", 3.5)
    assert parse_function_query("turn_idx") == ("field", "turn_idx")
    assert parse_function_query("field(turn_idx)") == ("field", "turn_idx")
    ast = parse_function_query("sum(turn_idx, 1)")
    assert ast == ("call", "sum", [("field", "turn_idx"), ("num", 1.0)])
    # mul aliases product, power aliases pow (Solr accepts both)
    assert parse_function_query("mul(a,b)")[1] == "product"
    assert parse_function_query("power(a,b)")[1] == "pow"


@pytest.mark.parametrize("bad", [
    "", "sum(turn_idx)", "nosuchfn(1,2)", "sum(1,2", "sum(1,2))",
    "recip(1,2,3)", "ord(x,y)", "scale(x,0,'a')", "1 2",
])
def test_parse_fail_loud(bad):
    with pytest.raises(ValueError):
        parse_function_query(bad)


def test_type_check_fail_loud():
    with pytest.raises(ValueError):  # unknown field
        function_to_sql("sum(nope, 1)", TYPES)
    with pytest.raises(ValueError):  # date in arithmetic outside ms()
        function_to_sql("sum(ts, 1)", TYPES)
    with pytest.raises(ValueError):  # string in arithmetic
        function_to_sql("sum(tool, 1)", TYPES)
    with pytest.raises(ValueError):  # if() test must be boolean
        function_to_sql("if(turn_idx, 1, 2)", TYPES)


def test_fields_used_and_sql():
    sql, used = function_to_sql(
        "if(exists(tool), recip(ms(ts),3.16e-11,1,1), div(turn_idx,dl))",
        TYPES,
    )
    assert used == ["tool", "ts", "turn_idx", "dl"]
    assert "unix_millis(ts)" in sql
    dsql, _ = function_to_sql("ms(ts)", TYPES, dialect="duckdb")
    assert dsql == "epoch_ms(ts)"
    assert fields_used(parse_function_query("sum(a, sum(b, a))")) == ["a", "b"]
    assert looks_like_function("recip(ms(ts),1,1,1)")
    assert not looks_like_function("turn_idx")
    assert not looks_like_function("role(")  # not a known function


def test_parse_frange():
    func, p = parse_frange("{!frange l=0 u=5 incu=false}sum(turn_idx,1)")
    assert func == "sum(turn_idx,1)" and p == {"l": "0", "u": "5",
                                               "incu": "false"}
    assert parse_frange("role:user") is None
    with pytest.raises(ValueError):
        parse_frange("{!frange cost=10}x")
    with pytest.raises(ValueError):
        parse_frange("{!frange incl=true}x")  # needs l or u
    sql = frange_to_sql("{!frange l=1 u=3}turn_idx", TYPES)
    assert sql == "((turn_idx) >= 1.0 AND (turn_idx) <= 3.0)"


# ---------- dialect agreement: Spark vs DuckDB on the same rows ----------

EXPRS = [
    "sum(turn_idx, dl)",
    "product(turn_idx, 2)",
    "div(dl, sum(turn_idx, 1))",
    "recip(ms(ts), 3.16e-11, 1, 1)",
    "if(exists(tool), 2, 1)",
    "map(turn_idx, 0, 2, 100)",
    "min(turn_idx, 3)",
    "linear(dl, 0.5, 7)",
    "log(sum(dl, 1))",
    "def(turn_idx, 0)",
]


def test_spark_duckdb_agree(corpus):
    idx = corpus
    types = dict(idx.docs().dtypes)
    pdf = idx.docs().select("doc_id", "turn_idx", "dl", "ts", "tool") \
        .orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.register("d", pdf)
    for expr in EXPRS:
        s_sql, _ = function_to_sql(expr, types, "spark")
        d_sql, _ = function_to_sql(expr, types, "duckdb")
        got = [
            r[0] for r in idx.docs().orderBy("doc_id")
            .select(F.expr(s_sql).cast("double")).collect()
        ]
        want = [
            r[0] for r in
            con.execute(
                f"SELECT CAST({d_sql} AS DOUBLE) FROM d ORDER BY doc_id"
            ).fetchall()
        ]
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g == pytest.approx(w, rel=1e-12), expr


# ---------- bf / boost scoring ----------

def _doc_map(idx):
    return {r["doc_id"]: r.asDict() for r in idx.docs().collect()}


def _brute_boosted(idx, q, bf=None, boost=None, fq=None, op="OR"):
    base = {r["doc_id"]: r["score"]
            for r in idx.score_matches(q, op=op, fq=fq).collect()}
    docs = _doc_map(idx)

    def ms(ts):
        return int(ts.timestamp() * 1000)

    def feval(expr, d):
        if expr == "sum(turn_idx,dl)":
            return d["turn_idx"] + d["dl"]
        if expr == "recip(ms(ts),3.16e-11,1,1)":
            return 1.0 / (3.16e-11 * ms(d["ts"]) + 1)
        if expr == "if(exists(tool),2,1)":
            return 2.0 if d["tool"] is not None else 1.0
        if expr == "div(turn_idx,10)":
            return d["turn_idx"] / 10.0
        raise AssertionError(expr)

    out = {}
    for i, s in base.items():
        v = s * (feval(boost, docs[i]) if boost else 1.0)
        for b in (bf or []):
            v += feval(b, docs[i])
        out[i] = v
    return sorted(out.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))


@pytest.mark.parametrize("kw", [
    dict(bf=["sum(turn_idx,dl)"]),
    dict(boost="recip(ms(ts),3.16e-11,1,1)"),
    dict(bf=["div(turn_idx,10)", "if(exists(tool),2,1)"],
         boost="sum(turn_idx,dl)"),
    dict(bf=["sum(turn_idx,dl)"], fq="role = 'user'"),
])
def test_search_boosted_vs_brute(corpus, kw):
    idx = corpus
    q = "error tool"
    got = idx.search_boosted(q, k=10, **kw).collect()
    want = _brute_boosted(idx, q, **kw)[:10]
    assert [r["doc_id"] for r in got] == [i for i, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_boosted_match_all_is_pure_function_rank(corpus):
    idx = corpus
    got = idx.search_boosted("*:*", k=5, boost="sum(turn_idx,dl)").collect()
    docs = _doc_map(idx)
    want = sorted(
        ((i, float(d["turn_idx"] + d["dl"])) for i, d in docs.items()),
        key=lambda kv: (-round(kv[1], 6), kv[0]),
    )[:5]
    assert [r["doc_id"] for r in got] == [i for i, _ in want]


def test_no_functions_delegates_to_search(corpus):
    idx = corpus
    a = idx.search_boosted("error tool", k=5).collect()
    b = idx.search("error tool", k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == \
           [(r["doc_id"], r["score"]) for r in b]


# ---------- frange as fq ----------

def test_frange_filters_matches(corpus):
    idx = corpus
    fr = "{!frange l=2 u=4}sum(turn_idx,0)"
    got = {r["doc_id"] for r in idx.score_matches("error", fq=fr).collect()}
    base = {r["doc_id"] for r in idx.score_matches("error").collect()}
    docs = _doc_map(idx)
    want = {i for i in base if 2 <= docs[i]["turn_idx"] <= 4}
    assert got == want and got != base
    # exclusive upper bound
    fr2 = "{!frange l=2 u=4 incu=false}turn_idx"
    got2 = {r["doc_id"] for r in idx.score_matches("error", fq=fr2).collect()}
    assert got2 == {i for i in base if 2 <= docs[i]["turn_idx"] < 4}


# ---------- /select integration ----------

def test_select_bf_boost_and_validation(corpus):
    idx = corpus
    resp = solr_select(idx, {
        "q": "error tool", "rows": 5, "bf": "sum(turn_idx,dl)",
        "fl": "doc_id,score",
    })
    want = _brute_boosted(idx, "error tool", bf=["sum(turn_idx,dl)"])[:5]
    assert [d["doc_id"] for d in resp["response"]["docs"]] == \
           [i for i, _ in want]
    # numFound is the match-set size (boosts never change matching)
    assert resp["response"]["numFound"] == \
        idx.count_matches("error tool")
    with pytest.raises(ValueError):
        solr_select(idx, {"q": "error", "bf": "dl", "sort": "turn_idx asc"})
    with pytest.raises(ValueError):
        solr_select(idx, {"q": "error", "boost": "dl", "cursorMark": "*"})
    with pytest.raises(ValueError):
        solr_select(idx, {"q": "error", "group": "true",
                          "group.field": "conv_id", "bf": "dl"})


def test_select_sort_by_function(corpus):
    idx = corpus
    resp = solr_select(idx, {
        "q": "error", "rows": 8, "sort": "sum(turn_idx,dl) desc",
        "fl": "doc_id",
    })
    docs = _doc_map(idx)
    matched = [r["doc_id"] for r in idx.score_matches("error").collect()]
    want = sorted(
        matched,
        key=lambda i: (-(docs[i]["turn_idx"] + docs[i]["dl"]), i),
    )[:8]
    assert [d["doc_id"] for d in resp["response"]["docs"]] == want
    # match-all path + mixed field/function sort
    resp2 = solr_select(idx, {
        "q": "*:*", "rows": 6,
        "sort": "role asc, recip(ms(ts),3.16e-11,1,1) asc", "fl": "doc_id",
    })
    alld = sorted(
        docs.values(),
        key=lambda d: (d["role"],
                       1.0 / (3.16e-11 * d["ts"].timestamp() * 1000 + 1),
                       d["doc_id"]),
    )[:6]
    assert [d["doc_id"] for d in resp2["response"]["docs"]] == \
           [d["doc_id"] for d in alld]


# ---------- index-backed functions (Solr relevance ValueSources) ----------

def test_parse_index_functions():
    ast = parse_function_query("termfreq(text,'spark')")
    assert ast == ("call", "termfreq", [("field", "text"), ("str", "spark")])
    # ttf canonicalizes to totaltermfreq; double quotes accepted
    assert parse_function_query('ttf(text,"a b")') == \
        ("call", "totaltermfreq", [("field", "text"), ("str", "a b")])
    assert parse_function_query("maxdoc()") == ("call", "maxdoc", [])
    # index args are index state, not docs-column reads
    assert fields_used(parse_function_query(
        "sum(termfreq(text,'x'), idf(text,'x'), turn_idx)")) == ["turn_idx"]


@pytest.mark.parametrize("bad", [
    "termfreq(text)",            # arity
    "termfreq('a','b')",         # field must be a name
    "idf(text, spark)",          # term must be a quoted literal
    "maxdoc(1)", "numdocs(text)",
    "sumtotaltermfreq('text')",
])
def test_parse_index_functions_fail_loud(bad):
    with pytest.raises(ValueError):
        parse_function_query(bad)


def test_bare_compile_of_index_function_fails_loud():
    # no index state in a plain function_to_sql: must error, never guess
    with pytest.raises(ValueError, match="index state"):
        function_to_sql("termfreq(text,'x')", {"text": "string"})
    with pytest.raises(ValueError, match="index state"):
        function_to_sql("sum(1, docfreq(text,'x'))", {"text": "string"})


def _token_counts(idx):
    """Brute-force per-doc Counter of analyzed tokens (text_general)."""
    import collections
    import re as _re

    return {
        r["doc_id"]: collections.Counter(
            _re.findall(r"[a-z0-9]+", (r["text"] or "").lower()))
        for r in idx.docs().select("doc_id", "text").collect()
    }


def test_index_function_constants_vs_brute_force(corpus):
    idx = corpus
    counts = _token_counts(idx)
    term = max(
        {t for c in counts.values() for t in c},
        key=lambda t: (sum(1 for c in counts.values() if t in c), t),
    )
    n = len(counts)
    df = sum(1 for c in counts.values() if term in c)
    assert idx.index_function_value("docfreq", "text", term) == df
    assert idx.index_function_value("idf", "text", term) == pytest.approx(
        math.log(1 + (n - df + 0.5) / (df + 0.5)))
    assert idx.index_function_value("totaltermfreq", "text", term) == \
        sum(c[term] for c in counts.values())
    assert idx.index_function_value("sumtotaltermfreq", "text") == \
        sum(sum(c.values()) for c in counts.values())
    assert idx.index_function_value("maxdoc") == n
    assert idx.index_function_value("numdocs") == n
    # OOV: df 0, idf at the df=0 ceiling, tf column empty
    assert idx.index_function_value("docfreq", "text", "zzzoov") == 0
    assert idx.index_function_value("idf", "text", "zzzoov") == \
        pytest.approx(math.log(1 + (n + 0.5) / 0.5))
    assert idx.term_tf_df("zzzoov").count() == 0
    # _text_ addresses the same catch-all index (copyField semantics)
    assert idx.index_function_value("docfreq", "_text_", term) == df
    with pytest.raises(ValueError, match="unindexed field"):
        idx.index_function_value("docfreq", "nosuch", term)


def test_termfreq_per_doc_and_boost_parity(corpus):
    idx = corpus
    counts = _token_counts(idx)
    term = max(
        {t for c in counts.values() for t in c},
        key=lambda t: (sum(c[t] for c in counts.values()), t),
    )
    got = {r["doc_id"]: r["tf"] for r in idx.term_tf_df(term).collect()}
    assert got == {i: c[term] for i, c in counts.items() if term in c}

    n = len(counts)
    df = sum(1 for c in counts.values() if term in c)
    w = math.log(1 + (n - df + 0.5) / (df + 0.5))
    base = {r["doc_id"]: r["score"]
            for r in idx.score_matches("error tool").collect()}
    bf = f"product(termfreq(text,'{term}'), idf(text,'{term}'))"
    res = idx.search_boosted("error tool", k=10, bf=bf).collect()
    assert len(res) == 10
    for r in res:
        want = base[r["doc_id"]] + counts[r["doc_id"]].get(term, 0) * w
        assert r["score"] == pytest.approx(want, abs=1e-9)
    # the same term in bf AND boost joins its postings once and composes
    # as Lucene does: score * boost + bf
    res2 = idx.search_boosted(
        "error tool", k=5,
        boost=f"sum(1, product(0.1, termfreq(text,'{term}')))",
        bf=f"termfreq(text,'{term}')",
    ).collect()
    for r in res2:
        tf = counts[r["doc_id"]].get(term, 0)
        want = base[r["doc_id"]] * (1 + 0.1 * tf) + tf
        assert r["score"] == pytest.approx(want, abs=1e-9)
    # OOV termfreq boosts by 0 everywhere (left join -> coalesce 0)
    res3 = idx.search_boosted(
        "error tool", k=5, bf="termfreq(text,'zzzoov')").collect()
    for r in res3:
        assert r["score"] == pytest.approx(base[r["doc_id"]], abs=1e-9)


def test_index_constants_fold_into_any_function_site(corpus):
    idx = corpus
    counts = _token_counts(idx)
    term = next(iter(sorted({t for c in counts.values() for t in c})))
    df = sum(1 for c in counts.values() if term in c)
    sql, fields = idx.function_expr(f"sum(docfreq(text,'{term}'), numdocs())")
    assert fields == [] and sql == f"({df} + {len(counts)})"
    # per-doc termfreq cannot fold -- non-boost sites fail loud
    with pytest.raises(ValueError, match="per-doc"):
        idx.function_expr(f"termfreq(text,'{term}')")
    with pytest.raises(ValueError, match="per-doc"):
        solr_select(idx, {"q": "error", "rows": 3,
                          "sort": f"termfreq(text,'{term}') desc"})


def test_numdocs_sees_tombstones_docfreq_does_not(spark, tmp_path):
    df = generate_transcripts(spark, n_convs=12, turns_per_conv=4, seed=7)
    idx_dir = str(tmp_path / "ifq_del")
    build_index(spark, df, idx_dir, BuildConfig(build_id="ifq_del", **CFG))
    idx = BM25Index(spark, idx_dir)
    counts = _token_counts(idx)
    term = max(
        {t for c in counts.values() for t in c},
        key=lambda t: (sum(1 for c in counts.values() if t in c), t),
    )
    df0 = idx.index_function_value("docfreq", "text", term)
    n_deleted = idx.delete_by_query("role = 'user'")
    assert n_deleted > 0
    idx2 = BM25Index(spark, idx_dir)
    # Lucene semantics: numdocs drops deletes, df/maxdoc/ttf do not
    # (segment stats stay put until a merge rewrites them)
    assert idx2.index_function_value("numdocs") == len(counts) - n_deleted
    assert idx2.index_function_value("maxdoc") == len(counts)
    assert idx2.index_function_value("docfreq", "text", term) == df0


# ---------- scale() (Lucene ScaleFloatFunction) ----------

def test_scale_vs_brute_force(corpus):
    idx = corpus
    docs = _doc_map(idx)
    dls = [d["dl"] for d in docs.values()]
    mn, mx = min(dls), max(dls)
    base = {r["doc_id"]: r["score"]
            for r in idx.score_matches("error tool").collect()}
    res = idx.search_boosted("error tool", k=10, bf="scale(dl,0,5)").collect()
    for r in res:
        want = base[r["doc_id"]] + (docs[r["doc_id"]]["dl"] - mn) * 5.0 / (mx - mn)
        assert r["score"] == pytest.approx(want, abs=1e-9)
    # scale of a nested function; min/max over ALL docs (Lucene createWeight)
    vals = {i: d["turn_idx"] / (d["dl"] + 1) for i, d in docs.items()}
    fn, fx = min(vals.values()), max(vals.values())
    res2 = idx.search_boosted(
        "error tool", k=5, bf="scale(div(turn_idx,sum(dl,1)),1,3)").collect()
    for r in res2:
        want = base[r["doc_id"]] + 1 + (vals[r["doc_id"]] - fn) * 2.0 / (fx - fn)
        assert r["score"] == pytest.approx(want, abs=1e-9)
    # scale works in every function site (sort-by-function): min/max fold
    # to constants, so the sort is a plain codegen'd expression
    sql, fields = idx.function_expr("scale(dl,0,1)")
    assert fields == ["dl"] and str(float(mn)) in sql
    # degenerate: all values equal -> minTarget (never NaN)
    sql2, _ = idx.function_expr("scale(sub(dl,dl),7,9)")
    assert sql2 == "7"


def test_scale_minmax_cached(corpus):
    idx = corpus
    idx.function_expr("scale(dl,0,1)")
    jobs_before = len(idx._scale_cache)
    idx.function_expr("scale(dl,0,100)")  # same inner expr -> cache hit
    assert len(idx._scale_cache) == jobs_before
    idx.function_expr("scale(turn_idx,0,1)")
    assert len(idx._scale_cache) == jobs_before + 1
