"""JSON Facet API: terms/query/range facets with nested stats and
subfacets, verified against brute-force recomputation over the collected
match set."""

import statistics

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.json_facet import json_facet
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=6, seed=5)
    idx_dir = str(tmp_path_factory.mktemp("jf"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="jf", **CFG))
    return BM25Index(spark, idx_dir)


def _rows(idx, q, fq=None, op="OR"):
    if q.strip() == "*:*":
        ids = None
    else:
        ids = {r["doc_id"] for r in
               idx.score_matches(q, op=op, fq=fq).collect()}
    return [r.asDict() for r in idx.docs().collect()
            if ids is None or r["doc_id"] in ids]


def test_top_level_stats(corpus):
    idx = corpus
    got = json_facet(idx, "error", {
        "total_dl": "sum(dl)",
        "mean_turn": "avg(turn_idx)",
        "hi": "max(dl)",
        "lo": "min(turn_idx)",
        "roles": "unique(role)",
        "no_tool": "missing(tool)",
        "ratio": "sum(div(turn_idx,dl))",
    })
    rows = _rows(idx, "error")
    assert got["count"] == len(rows)
    assert got["total_dl"] == sum(r["dl"] for r in rows)
    assert got["mean_turn"] == pytest.approx(
        statistics.mean(r["turn_idx"] for r in rows))
    assert got["hi"] == max(r["dl"] for r in rows)
    assert got["lo"] == min(r["turn_idx"] for r in rows)
    assert got["roles"] == len({r["role"] for r in rows})
    assert got["no_tool"] == sum(1 for r in rows if r["tool"] is None)
    assert got["ratio"] == pytest.approx(
        sum(r["turn_idx"] / r["dl"] for r in rows))


def test_terms_with_stats_and_query_subfacet(corpus):
    idx = corpus
    got = json_facet(idx, "error", {
        "by_role": {
            "type": "terms", "field": "role", "limit": 10,
            "facet": {
                "dl_sum": "sum(dl)",
                "early": {"type": "query", "q": "turn_idx < 2"},
            },
        },
    })
    rows = _rows(idx, "error")
    groups: dict = {}
    for r in rows:
        groups.setdefault(r["role"], []).append(r)
    want = sorted(groups.items(), key=lambda kv: (-len(kv[1]), kv[0]))
    bk = got["by_role"]["buckets"]
    assert [(b["val"], b["count"]) for b in bk] == \
           [(v, len(g)) for v, g in want]
    for b in bk:
        g = groups[b["val"]]
        assert b["dl_sum"] == sum(r["dl"] for r in g)
        assert b["early"] == sum(1 for r in g if r["turn_idx"] < 2)


def test_nested_terms(corpus):
    idx = corpus
    got = json_facet(idx, "*:*", {
        "by_role": {
            "type": "terms", "field": "role", "limit": 2,
            "facet": {
                "by_turn": {"type": "terms", "field": "turn_idx",
                            "limit": 3, "facet": {"dls": "sum(dl)"}},
            },
        },
    })
    rows = _rows(idx, "*:*")
    groups: dict = {}
    for r in rows:
        groups.setdefault(r["role"], []).append(r)
    top2 = sorted(groups.items(), key=lambda kv: (-len(kv[1]), kv[0]))[:2]
    assert [b["val"] for b in got["by_role"]["buckets"]] == \
           [v for v, _ in top2]
    for b, (v, g) in zip(got["by_role"]["buckets"], top2):
        sub: dict = {}
        for r in g:
            sub.setdefault(r["turn_idx"], []).append(r)
        w = sorted(sub.items(), key=lambda kv: (-len(kv[1]), kv[0]))[:3]
        assert [(x["val"], x["count"], x["dls"])
                for x in b["by_turn"]["buckets"]] == \
               [(tv, len(tg), sum(r["dl"] for r in tg)) for tv, tg in w]


def test_terms_sort_by_stat_and_index(corpus):
    idx = corpus
    got = json_facet(idx, "*:*", {
        "by_turn": {"type": "terms", "field": "turn_idx", "limit": 4,
                    "sort": {"dls": "desc"}, "facet": {"dls": "sum(dl)"}},
        "idx_order": {"type": "terms", "field": "role", "sort": "index asc"},
    })
    rows = _rows(idx, "*:*")
    groups: dict = {}
    for r in rows:
        groups.setdefault(r["turn_idx"], []).append(r)
    want = sorted(
        ((v, sum(r["dl"] for r in g)) for v, g in groups.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:4]
    assert [(b["val"], b["dls"]) for b in got["by_turn"]["buckets"]] == want
    vals = [b["val"] for b in got["idx_order"]["buckets"]]
    assert vals == sorted(vals)


def test_terms_missing_and_allbuckets(corpus):
    idx = corpus
    got = json_facet(idx, "*:*", {
        "by_tool": {"type": "terms", "field": "tool", "limit": 5,
                    "missing": True, "allBuckets": True,
                    "facet": {"dls": "sum(dl)"}},
    })
    rows = _rows(idx, "*:*")
    n_null = sum(1 for r in rows if r["tool"] is None)
    assert got["by_tool"]["missing"]["count"] == n_null
    assert got["by_tool"]["missing"]["dls"] == \
        sum(r["dl"] for r in rows if r["tool"] is None)
    assert got["by_tool"]["allBuckets"]["count"] == len(rows) - n_null


def test_query_and_range_facets(corpus):
    idx = corpus
    got = json_facet(idx, "error", {
        "early": {"type": "query", "q": "turn_idx:[0 TO 1]",
                  "facet": {"dls": "sum(dl)"}},
        "by_dl": {"type": "range", "field": "dl", "start": 0, "end": 120,
                  "gap": 40, "facet": {"mx": "max(turn_idx)"}},
    })
    rows = _rows(idx, "error")
    early = [r for r in rows if 0 <= r["turn_idx"] <= 1]
    assert got["early"]["count"] == len(early)
    assert got["early"]["dls"] == sum(r["dl"] for r in early)
    bks = got["by_dl"]["buckets"]
    assert [b["val"] for b in bks] == [0, 40, 80]
    for b, lo in zip(bks, (0, 40, 80)):
        g = [r for r in rows if lo <= r["dl"] < lo + 40]
        assert b["count"] == len(g)
        if g:
            assert b["mx"] == max(r["turn_idx"] for r in g)


def test_respects_fq_op_and_select_integration(corpus):
    idx = corpus
    resp = solr_select(idx, {
        "q": "error tool", "q.op": "AND", "fq": "role = 'tool'", "rows": 0,
        "json.facet": {"n": "sum(dl)"},
    })
    rows = _rows(idx, "error tool", fq="role = 'tool'", op="AND")
    assert resp["facets"]["count"] == len(rows) == \
        resp["response"]["numFound"]
    assert resp["facets"]["n"] == sum(r["dl"] for r in rows)
    # JSON-string form parses too
    resp2 = solr_select(idx, {"q": "error", "rows": 0,
                              "json.facet": '{"m": "max(dl)"}'})
    assert resp2["facets"]["m"] == max(r["dl"] for r in _rows(idx, "error"))


def test_fail_loud(corpus):
    idx = corpus
    with pytest.raises(ValueError):
        json_facet(idx, "error", {"p": "median(dl)"})
    with pytest.raises(ValueError):
        json_facet(idx, "error", {"t": {"type": "terms", "field": "role",
                                        "refine": True}})
    with pytest.raises(ValueError):
        json_facet(idx, "error", {"t": {"type": "terms", "field": "role",
                                        "sort": "nostat desc"}})
    with pytest.raises(ValueError):
        json_facet(idx, "error", {"x": "sum(nope)"})
    with pytest.raises(ValueError):
        solr_select(idx, {"q": "error", "group": "true",
                          "group.field": "conv_id",
                          "json.facet": {"n": "sum(dl)"}})


def test_multiselect_tag_ex_and_domain(corpus):
    """Classic multi-select faceting: fq={!tag=r}role filter narrows docs,
    but the {!ex=r} facet / domain.excludeTags json facet count ALL
    roles."""
    idx = corpus
    rows_all = _rows(idx, "error")
    by_role: dict = {}
    for r in rows_all:
        by_role[r["role"]] = by_role.get(r["role"], 0) + 1

    resp = solr_select(idx, {
        "q": "error", "rows": 0, "fq": "{!tag=r}role = 'user'",
        "facet": "true", "facet.field": "{!ex=r}role",
        "json.facet": {
            "roles_all": {"type": "terms", "field": "role",
                          "domain": {"excludeTags": ["r"]}},
            "roles_sel": {"type": "terms", "field": "role"},
        },
    })
    # docs/numFound keep the filter
    n_user = by_role.get("user", 0)
    assert resp["response"]["numFound"] == n_user
    # flat facet with {!ex=r}: counts over ALL roles
    flat = resp["facet_counts"]["facet_fields"]["role"]
    got = dict(zip(flat[::2], flat[1::2]))
    assert got == by_role
    # json.facet with domain.excludeTags: same; without: filtered
    jf_all = {b["val"]: b["count"]
              for b in resp["facets"]["roles_all"]["buckets"]}
    assert jf_all == by_role
    jf_sel = {b["val"]: b["count"]
              for b in resp["facets"]["roles_sel"]["buckets"]}
    assert jf_sel == {"user": n_user}


def test_multiselect_validation(corpus):
    idx = corpus
    with pytest.raises(ValueError):  # tag cannot wrap another qparser
        solr_select(idx, {"q": "error",
                          "fq": "{!tag=a}{!frange l=0}turn_idx"})
    with pytest.raises(ValueError):  # unknown domain key
        json_facet(idx, "error", {"t": {
            "type": "terms", "field": "role",
            "domain": {"join": {"from": "a", "to": "b"}}}})
    with pytest.raises(ValueError):  # query replaces; excludeTags conflicts
        json_facet(idx, "error", {"t": {
            "type": "terms", "field": "role",
            "domain": {"query": "role = 'user'", "excludeTags": ["r"]}}},
            tagged_fq=[(frozenset(["r"]), "role = 'user'")])
    with pytest.raises(ValueError):  # domain without tagged fq
        json_facet(idx, "error", {"t": {
            "type": "terms", "field": "role",
            "domain": {"excludeTags": ["r"]}}})
    with pytest.raises(ValueError):  # nested domain fails loud
        json_facet(idx, "error", {"a": {
            "type": "terms", "field": "role",
            "facet": {"b": {"type": "terms", "field": "turn_idx",
                            "domain": {"excludeTags": ["r"]}}}}},
            tagged_fq=[(frozenset(["r"]), "role = 'user'")])


def test_nested_range_under_terms(corpus):
    idx = corpus
    got = json_facet(idx, "error", {
        "by_role": {"type": "terms", "field": "role", "limit": 2,
                    "facet": {"by_dl": {"type": "range", "field": "dl",
                                        "start": 0, "end": 120, "gap": 60}}},
    })
    rows = _rows(idx, "error")
    groups: dict = {}
    for r in rows:
        groups.setdefault(r["role"], []).append(r)
    top2 = sorted(groups.items(), key=lambda kv: (-len(kv[1]), kv[0]))[:2]
    for b, (v, g) in zip(got["by_role"]["buckets"], top2):
        bks = b["by_dl"]["buckets"]
        assert [x["val"] for x in bks] == [0, 60]
        for x, lo in zip(bks, (0, 60)):
            assert x["count"] == sum(1 for r in g if lo <= r["dl"] < lo + 60)
    with pytest.raises(ValueError):  # range under range still fails loud
        json_facet(idx, "error", {
            "a": {"type": "range", "field": "dl", "start": 0, "end": 10,
                  "gap": 5,
                  "facet": {"b": {"type": "range", "field": "turn_idx",
                                  "start": 0, "end": 5, "gap": 1}}},
        })


def test_percentile_stat(corpus):
    import numpy as np

    idx = corpus
    got = json_facet(idx, "error", {
        "med": "percentile(dl, 50)",
        "tails": "percentile(dl, 1, 99.9)",
        "fmed": "percentile(div(turn_idx,dl), 50)",
        "by_role": {
            "type": "terms", "field": "role", "limit": 10,
            "facet": {"p90": "percentile(dl, 90)"},
        },
    })
    rows = _rows(idx, "error")
    dls = np.array([float(r["dl"]) for r in rows])
    # single percentile -> number; several -> list (Solr's response shape)
    assert got["med"] == pytest.approx(np.percentile(dls, 50))
    assert got["tails"] == pytest.approx(
        [np.percentile(dls, 1), np.percentile(dls, 99.9)])
    fvals = np.array([r["turn_idx"] / r["dl"] for r in rows])
    assert got["fmed"] == pytest.approx(np.percentile(fvals, 50))
    for b in got["by_role"]["buckets"]:
        bvals = np.array(
            [float(r["dl"]) for r in rows if r["role"] == b["val"]])
        assert b["p90"] == pytest.approx(np.percentile(bvals, 90))


def test_percentile_stat_fail_loud(corpus):
    idx = corpus
    for bad in ("percentile(dl)", "percentile(dl, x)",
                "percentile(dl, 101)"):
        with pytest.raises(ValueError):
            json_facet(idx, "error", {"p": bad})


def test_extended_stats(corpus):
    """sumsq / variance / stddev (corrected-sample, SOLR-11725) /
    countvals / hll vs brute-force recomputation; hll's HLL++ sketch is
    exact at this cardinality (sparse mode)."""
    idx = corpus
    got = json_facet(idx, "error", {
        "ss": "sumsq(dl)",
        "var": "variance(dl)",
        "sd": "stddev(dl)",
        "nv": "countvals(tool)",
        "h": "hll(role)",
        "by_role": {
            "type": "terms", "field": "role", "limit": 10,
            "facet": {"sd": "stddev(dl)", "nv": "countvals(tool)"},
        },
    })
    rows = _rows(idx, "error")
    dls = [float(r["dl"]) for r in rows]
    assert got["ss"] == pytest.approx(sum(x * x for x in dls))
    assert got["var"] == pytest.approx(statistics.variance(dls))
    assert got["sd"] == pytest.approx(statistics.stdev(dls))
    assert got["nv"] == sum(1 for r in rows if r["tool"] is not None)
    assert got["h"] == len({r["role"] for r in rows})
    for b in got["by_role"]["buckets"]:
        g = [r for r in rows if r["role"] == b["val"]]
        gdl = [float(r["dl"]) for r in g]
        if len(gdl) > 1:
            assert b["sd"] == pytest.approx(statistics.stdev(gdl))
        assert b["nv"] == sum(1 for r in g if r["tool"] is not None)


def test_domain_filter_and_query(corpus):
    """domain.filter NARROWS the node's domain; domain.query REPLACES it
    (counts over the live corpus, ignoring the request's q/fq)."""
    idx = corpus
    got = json_facet(idx, "error", {
        "narrow": {"type": "terms", "field": "role",
                   "domain": {"filter": "turn_idx:[0 TO 2]"}},
        "narrow2": {"type": "terms", "field": "role",
                    "domain": {"filter": ["turn_idx:[0 TO 2]",
                                          "-tool:*"]}},
        "replaced": {"type": "terms", "field": "role",
                     "domain": {"query": "turn_idx:[0 TO 1]"}},
        "rcount": {"type": "query", "q": "turn_idx >= 3",
                   "domain": {"query": "role:user"}},
    }, fq="role = 'user'")
    matched = _rows(idx, "error", fq="role = 'user'")
    alive = _rows(idx, "*:*")

    def buckets(rows):
        out: dict = {}
        for r in rows:
            out[r["role"]] = out.get(r["role"], 0) + 1
        return out

    want_n = buckets([r for r in matched if 0 <= r["turn_idx"] <= 2])
    assert {b["val"]: b["count"]
            for b in got["narrow"]["buckets"]} == want_n
    want_n2 = buckets([r for r in matched
                       if 0 <= r["turn_idx"] <= 2 and r["tool"] is None])
    assert {b["val"]: b["count"]
            for b in got["narrow2"]["buckets"]} == want_n2
    # replaced: all LIVE docs with turn_idx in [0,1], q/fq ignored
    want_r = buckets([r for r in alive if 0 <= r["turn_idx"] <= 1])
    assert {b["val"]: b["count"]
            for b in got["replaced"]["buckets"]} == want_r
    users = [r for r in alive if r["role"] == "user"]
    assert got["rcount"]["count"] == \
        sum(1 for r in users if r["turn_idx"] >= 3)


def test_domain_join(corpus):
    idx = corpus
    # map the "error" match set to EVERY turn of its conversations
    # (from=conv_id, to=conv_id), then facet roles over that domain
    got = json_facet(idx, "error", {
        "roles": {"type": "terms", "field": "role", "limit": 10,
                  "domain": {"join": {"from": "conv_id", "to": "conv_id"}}},
    })
    convs = {r["conv_id"] for r in _rows(idx, "error")}
    dom = [r.asDict() for r in idx.docs().collect()
           if r["conv_id"] in convs]
    want = {}
    for r in dom:
        want[r["role"]] = want.get(r["role"], 0) + 1
    buckets = {b["val"]: b["count"] for b in got["roles"]["buckets"]}
    assert buckets == want
    assert len(dom) > len(_rows(idx, "error"))  # the join really expanded


def test_domain_join_then_filter(corpus):
    idx = corpus
    # Solr order: filter narrows the JOINED domain
    got = json_facet(idx, "error", {
        "users": {"type": "query", "q": "*:*",
                  "domain": {"join": {"from": "conv_id", "to": "conv_id"},
                             "filter": "role:user"}},
    })
    convs = {r["conv_id"] for r in _rows(idx, "error")}
    want = sum(1 for r in idx.docs().collect()
               if r["conv_id"] in convs and r["role"] == "user")
    assert got["users"]["count"] == want


def test_domain_join_fail_loud(corpus):
    idx = corpus
    with pytest.raises(ValueError, match="exactly .from: F, to: T."):
        json_facet(idx, "error", {
            "x": {"type": "terms", "field": "role",
                  "domain": {"join": {"from": "conv_id"}}},
        })
    with pytest.raises(ValueError, match="unknown fields"):
        json_facet(idx, "error", {
            "x": {"type": "terms", "field": "role",
                  "domain": {"join": {"from": "nope", "to": "conv_id"}}},
        })
    with pytest.raises(ValueError, match="graph"):
        json_facet(idx, "error", {
            "x": {"type": "terms", "field": "role",
                  "domain": {"graph": {"from": "a", "to": "b"}}},
        })


@pytest.fixture(scope="module")
def graph_idx(spark, tmp_path_factory):
    # chain edges: doc i points FORWARD via from_f = n(i+1), to_f = n(i)
    # (the graph step adds docs whose to_f is among the frontier's from_f
    # values, so the walk proceeds doc 0 -> 1 -> 2 -> ...)
    from pyspark.sql import functions as F
    df = generate_transcripts(spark, n_convs=6, turns_per_conv=4, seed=11)
    df = df.withColumn(
        "nid", F.crc32(F.concat("conv_id", F.lit(":"),
                                F.col("turn_idx").cast("string")))
    )
    # one global chain by (conv_id, turn_idx) order
    from pyspark.sql.window import Window
    w = Window.orderBy("conv_id", "turn_idx")
    df = df.withColumn("pos", F.row_number().over(w) - 1)
    df = df.withColumn("from_f", F.concat(F.lit("n"), (F.col("pos") + 1)))
    df = df.withColumn("to_f", F.concat(F.lit("n"), F.col("pos"))).drop(
        "nid", "pos")
    idx_dir = str(tmp_path_factory.mktemp("jfg"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="jfg", **CFG))
    return BM25Index(spark, idx_dir)


def test_domain_graph_bounded_and_closure(graph_idx):
    idx = graph_idx
    pos = {r["doc_id"]: int(r["to_f"][1:])
           for r in idx.docs().select("doc_id", "to_f").collect()}
    root_fq = "to_f = 'n0'"  # the chain head
    # maxDepth=2: head + two hops
    got = json_facet(idx, "*:*", {
        "n": {"type": "query", "q": "*:*",
              "domain": {"graph": {"from": "from_f", "to": "to_f",
                                   "maxDepth": 2}}},
    }, fq=root_fq)
    assert got["n"]["count"] == 3
    # unbounded: the whole chain
    got = json_facet(idx, "*:*", {
        "n": {"type": "query", "q": "*:*",
              "domain": {"graph": {"from": "from_f", "to": "to_f"}}},
    }, fq=root_fq)
    assert got["n"]["count"] == len(pos)
    # returnRoot=false drops the head
    got = json_facet(idx, "*:*", {
        "n": {"type": "query", "q": "*:*",
              "domain": {"graph": {"from": "from_f", "to": "to_f",
                                   "maxDepth": 1, "returnRoot": False}}},
    }, fq=root_fq)
    assert got["n"]["count"] == 1


def test_domain_graph_cycle_converges(spark, tmp_path_factory):
    from pyspark.sql import functions as F
    # a 3-cycle: n0 -> n1 -> n2 -> n0
    df = generate_transcripts(spark, n_convs=1, turns_per_conv=3, seed=2)
    df = df.withColumn("from_f", F.concat(
        F.lit("n"), ((F.col("turn_idx") + 1) % 3)))
    df = df.withColumn("to_f", F.concat(F.lit("n"), F.col("turn_idx")))
    d = str(tmp_path_factory.mktemp("jfc"))
    build_index(spark, df, d, BuildConfig(build_id="jfc", **CFG))
    idx = BM25Index(spark, d)
    got = json_facet(idx, "*:*", {
        "n": {"type": "query", "q": "*:*",
              "domain": {"graph": {"from": "from_f", "to": "to_f"}}},
    }, fq="to_f = 'n0'")
    assert got["n"]["count"] == 3  # fixpoint, no infinite loop


def test_domain_graph_fail_loud(graph_idx):
    idx = graph_idx
    with pytest.raises(ValueError, match="needs from= and to="):
        json_facet(idx, "*:*", {
            "n": {"type": "query", "q": "*:*",
                  "domain": {"graph": {"from": "from_f"}}}})
    with pytest.raises(ValueError, match="traversalFilter"):
        json_facet(idx, "*:*", {
            "n": {"type": "query", "q": "*:*",
                  "domain": {"graph": {"from": "from_f", "to": "to_f",
                                       "traversalFilter": "x"}}}})
    with pytest.raises(ValueError, match="exclusive"):
        json_facet(idx, "*:*", {
            "n": {"type": "query", "q": "*:*",
                  "domain": {"join": {"from": "from_f", "to": "to_f"},
                             "graph": {"from": "from_f", "to": "to_f"}}}})
