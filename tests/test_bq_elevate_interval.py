"""bq boost queries, QueryElevationComponent (elevateIds/excludeIds), and
interval facets -- each verified against brute-force recomputation."""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=6, seed=17)
    idx_dir = str(tmp_path_factory.mktemp("bqe"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="bqe", **CFG))
    return BM25Index(spark, idx_dir)


def _scores(idx, q, fq=None, op="OR"):
    return {r["doc_id"]: r["score"]
            for r in idx.score_matches(q, op=op, fq=fq).collect()}


# ---------- bq ----------

def test_bq_adds_boost_query_scores(corpus):
    idx = corpus
    main, bq = "error tool", "merge window"
    got = idx.search_boosted(main, k=10, bq=bq).collect()
    ms, bs = _scores(idx, main), _scores(idx, bq)
    want = sorted(
        ((i, s + bs.get(i, 0.0)) for i, s in ms.items()),
        key=lambda kv: (-round(kv[1], 6), kv[0]),
    )[:10]
    assert [r["doc_id"] for r in got] == [i for i, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, rel=1e-9)
    # bq never ADDS matches: numFound semantics preserved
    assert set(_scores(idx, main)) == {
        r["doc_id"] for r in idx.score_matches(main).collect()}


def test_bq_composes_with_bf_and_select(corpus):
    idx = corpus
    got = idx.search_boosted(
        "error", k=5, bf=["div(turn_idx,10)"], bq=["merge"],
    ).collect()
    ms, bs = _scores(idx, "error"), _scores(idx, "merge")
    docs = {r["doc_id"]: r.asDict() for r in idx.docs().collect()}
    want = sorted(
        ((i, s + docs[i]["turn_idx"] / 10.0 + bs.get(i, 0.0))
         for i, s in ms.items()),
        key=lambda kv: (-round(kv[1], 6), kv[0]),
    )[:5]
    assert [r["doc_id"] for r in got] == [i for i, _ in want]
    resp = solr_select(idx, {"q": "error", "rows": 5, "bq": "merge",
                             "fl": "doc_id,score"})
    want2 = sorted(
        ((i, s + bs.get(i, 0.0)) for i, s in ms.items()),
        key=lambda kv: (-round(kv[1], 6), kv[0]),
    )[:5]
    assert [d["doc_id"] for d in resp["response"]["docs"]] == \
           [i for i, _ in want2]


# ---------- elevation ----------

def test_elevate_and_exclude(corpus):
    idx = corpus
    base = solr_select(idx, {"q": "error tool", "rows": 6,
                             "fl": "doc_id,score"})
    base_ids = [d["doc_id"] for d in base["response"]["docs"]]
    nf = base["response"]["numFound"]
    # elevate one matching doc from deep + one NON-matching doc
    ms = _scores(idx, "error tool")
    deep = sorted(ms, key=lambda i: (-round(ms[i], 6), i))[20]
    nonmatch = next(i for i in range(1000)
                    if i not in ms and i in {r["doc_id"] for r in
                                             idx.docs().select("doc_id").collect()})
    resp = solr_select(idx, {
        "q": "error tool", "rows": 6,
        "elevateIds": f"{deep},{nonmatch}",
        "excludeIds": str(base_ids[0]),
        "fl": "doc_id,score",
    })
    got = resp["response"]["docs"]
    assert [d["doc_id"] for d in got[:2]] == [deep, nonmatch]
    assert got[0]["[elevated]"] and got[1]["[elevated]"]
    assert got[0]["score"] == pytest.approx(ms[deep], rel=1e-9)
    assert got[1]["score"] == 0.0
    # remaining slots: normal ranking minus excluded + elevated
    rest = [i for i in base_ids if i not in (deep, nonmatch, base_ids[0])]
    assert [d["doc_id"] for d in got[2:]] == rest[:4]
    # numFound: +1 elevated non-match, -1 excluded match
    assert resp["response"]["numFound"] == nf + 1 - 1
    with pytest.raises(ValueError):
        solr_select(idx, {"q": "error", "elevateIds": "1",
                          "sort": "turn_idx asc"})
    with pytest.raises(ValueError):
        solr_select(idx, {"q": "*:*", "elevateIds": "1"})


# ---------- interval facets ----------

def test_facet_intervals(corpus):
    idx = corpus
    sets = ["[0,1]", "(1,4]", "[4,*)", "[*,*]", "(0,2)"]
    got = idx.facet_intervals("error", "turn_idx", sets)
    ms = set(_scores(idx, "error"))
    tix = {r["doc_id"]: r["turn_idx"] for r in idx.docs().collect()}
    vals = [tix[i] for i in ms]
    assert got["[0,1]"] == sum(1 for v in vals if 0 <= v <= 1)
    assert got["(1,4]"] == sum(1 for v in vals if 1 < v <= 4)
    assert got["[4,*)"] == sum(1 for v in vals if v >= 4)
    assert got["[*,*]"] == len(vals)
    assert got["(0,2)"] == sum(1 for v in vals if 0 < v < 2)
    resp = solr_select(idx, {
        "q": "error", "rows": 0, "facet": "true",
        "facet.interval": "turn_idx",
        "f.turn_idx.facet.interval.set": ["[0,1]", "(1,*)"],
    })
    fi = resp["facet_counts"]["facet_intervals"]["turn_idx"]
    assert fi["[0,1]"] == got["[0,1]"]
    assert fi["(1,*)"] == sum(1 for v in vals if v > 1)
    with pytest.raises(ValueError):
        idx.facet_intervals("error", "turn_idx", ["0 TO 5"])
    with pytest.raises(ValueError):
        solr_select(idx, {"q": "error", "facet": "true",
                          "facet.interval": "turn_idx"})  # no sets
