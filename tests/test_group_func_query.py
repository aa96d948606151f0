"""group.func (group by a function value) and group.query (one group per
query) vs brute force."""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=6, seed=31)
    idx_dir = str(tmp_path_factory.mktemp("gfq"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="gfq", **CFG))
    return BM25Index(spark, idx_dir)


def _brute_groups_by(idx, q, keyfn):
    scored = {r["doc_id"]: r["score"]
              for r in idx.score_matches(q).collect()}
    docs = {r["doc_id"]: r.asDict() for r in idx.docs().collect()}
    groups: dict = {}
    for i, s in scored.items():
        groups.setdefault(keyfn(docs[i]), []).append((i, s))
    for lst in groups.values():
        lst.sort(key=lambda t: (-round(t[1], 6), t[0]))
    return groups


def test_group_func_vs_brute(corpus):
    idx = corpus
    q, func = "error tool", "map(turn_idx,0,2,0,1)"  # buckets 0 / 1
    page = idx.search_grouped_func(q, func, k=5, group_limit=2).collect()
    groups = _brute_groups_by(
        idx, q, lambda d: 0 if 0 <= d["turn_idx"] <= 2 else 1)
    heads = sorted(
        ((v, lst[0]) for v, lst in groups.items()),
        key=lambda t: (-round(t[1][1], 6), t[1][0]),
    )[:5]
    by_rank: dict = {}
    for r in page:
        by_rank.setdefault(r["group_rank"], []).append(r)
    assert [by_rank[i + 1][0]["group_value"] for i in range(len(by_rank))] \
        == [v for v, _ in heads]
    for i, (v, _) in enumerate(heads):
        want = [d for d, _ in groups[v][:2]]
        assert [r["doc_id"] for r in by_rank[i + 1]] == want


def test_group_func_via_select(corpus):
    idx = corpus
    resp = solr_select(idx, {
        "q": "error tool", "group": "true",
        "group.func": "map(turn_idx,0,2,0,1)",
        "group.limit": 2, "rows": 2, "group.ngroups": "true",
        "fl": "doc_id,score",
    })
    sec = resp["grouped"]["map(turn_idx,0,2,0,1)"]
    groups = _brute_groups_by(
        idx, "error tool", lambda d: 0 if 0 <= d["turn_idx"] <= 2 else 1)
    assert sec["ngroups"] == len(groups)
    assert sec["matches"] == idx.count_matches("error tool")
    for g in sec["groups"]:
        lst = groups[g["groupValue"]]
        assert g["doclist"]["numFound"] == len(lst)
        assert [d["doc_id"] for d in g["doclist"]["docs"]] == \
            [i for i, _ in lst[:2]]


def test_group_query_via_select(corpus):
    idx = corpus
    resp = solr_select(idx, {
        "q": "error", "group": "true",
        "group.query": ["role:user", "turn_idx:[3 TO *]"],
        "group.limit": 3, "fl": "doc_id,score",
    })
    scored = {r["doc_id"]: r["score"]
              for r in idx.score_matches("error").collect()}
    docs = {r["doc_id"]: r.asDict() for r in idx.docs().collect()}
    for gq, pred in [
        ("role:user", lambda d: d["role"] == "user"),
        ("turn_idx:[3 TO *]", lambda d: d["turn_idx"] >= 3),
    ]:
        sub = sorted(
            ((i, s) for i, s in scored.items() if pred(docs[i])),
            key=lambda t: (-round(t[1], 6), t[0]),
        )
        ent = resp["grouped"][gq]
        assert ent["matches"] == len(scored)
        assert ent["doclist"]["numFound"] == len(sub)
        assert [d["doc_id"] for d in ent["doclist"]["docs"]] == \
            [i for i, _ in sub[:3]]


def test_group_mode_validation(corpus):
    idx = corpus
    with pytest.raises(ValueError):
        solr_select(idx, {"q": "error", "group": "true"})
    with pytest.raises(ValueError):
        solr_select(idx, {"q": "error", "group": "true",
                          "group.field": "role", "group.func": "turn_idx"})
    with pytest.raises(ValueError):
        solr_select(idx, {"q": "error", "group": "true",
                          "group.query": "role:user",
                          "group.ngroups": "true"})
