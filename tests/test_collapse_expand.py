"""Collapse qparser + ExpandComponent vs brute force: the result set
collapses to each group's best-scoring doc; expand returns each page
group's other members by relevance."""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=6, seed=13)
    idx_dir = str(tmp_path_factory.mktemp("collapse"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="coll", **CFG))
    return BM25Index(spark, idx_dir)


def _brute_groups(idx, q, field, fq=None, op="OR"):
    """{group value: [(doc_id, score) ordered by (round6 desc, doc_id)]}"""
    scored = {r["doc_id"]: r["score"]
              for r in idx.score_matches(q, op=op, fq=fq).collect()}
    docs = {r["doc_id"]: r.asDict() for r in idx.docs().collect()}
    groups: dict = {}
    for i, s in scored.items():
        v = docs[i][field]
        if v is None:
            continue
        groups.setdefault(v, []).append((i, s))
    for lst in groups.values():
        lst.sort(key=lambda t: (-round(t[1], 6), t[0]))
    return groups


def test_collapse_heads_and_numfound(corpus):
    idx = corpus
    resp = solr_select(idx, {
        "q": "error tool", "rows": 5,
        "fq": "{!collapse field=conv_id}", "fl": "doc_id,conv_id,score",
    })
    groups = _brute_groups(idx, "error tool", "conv_id")
    assert resp["response"]["numFound"] == len(groups)
    heads = sorted(
        ((lst[0][0], lst[0][1]) for lst in groups.values()),
        key=lambda t: (-round(t[1], 6), t[0]),
    )[:5]
    assert [d["doc_id"] for d in resp["response"]["docs"]] == \
           [i for i, _ in heads]
    # one doc per group on the page
    convs = [d["conv_id"] for d in resp["response"]["docs"]]
    assert len(set(convs)) == len(convs)


def test_collapse_respects_other_fq(corpus):
    idx = corpus
    resp = solr_select(idx, {
        "q": "error", "rows": 3,
        "fq": ["{!collapse field=conv_id}", "role = 'user'"],
        "fl": "doc_id,score",
    })
    groups = _brute_groups(idx, "error", "conv_id", fq="role = 'user'")
    assert resp["response"]["numFound"] == len(groups)
    heads = sorted(
        ((lst[0][0], lst[0][1]) for lst in groups.values()),
        key=lambda t: (-round(t[1], 6), t[0]),
    )[:3]
    assert [d["doc_id"] for d in resp["response"]["docs"]] == \
           [i for i, _ in heads]


def test_expand_section(corpus):
    idx = corpus
    resp = solr_select(idx, {
        "q": "error tool", "rows": 4, "fq": "{!collapse field=conv_id}",
        "expand": "true", "expand.rows": 2, "fl": "doc_id,conv_id,score",
    })
    groups = _brute_groups(idx, "error tool", "conv_id")
    exp = resp["expanded"]
    for d in resp["response"]["docs"]:
        g = d["conv_id"]
        members = groups[g]
        others = [i for i, _ in members[1:]]
        ent = exp[str(g)]
        assert ent["numFound"] == len(others)
        assert [e["doc_id"] for e in ent["docs"]] == others[:2]
        for e in ent["docs"]:  # fl score asked -> reported on expanded too
            assert e["score"] == pytest.approx(
                dict(members)[e["doc_id"]], rel=1e-9)


def test_collapse_match_all(corpus):
    idx = corpus
    resp = solr_select(idx, {
        "q": "*:*", "rows": 3, "fq": "{!collapse field=conv_id}",
        "expand": "true", "fl": "doc_id,conv_id",
    })
    docs = [r.asDict() for r in idx.docs().collect()]
    groups: dict = {}
    for r in sorted(docs, key=lambda d: d["doc_id"]):
        groups.setdefault(r["conv_id"], []).append(r["doc_id"])
    assert resp["response"]["numFound"] == len(groups)
    heads = sorted(lst[0] for lst in groups.values())[:3]
    assert [d["doc_id"] for d in resp["response"]["docs"]] == heads
    for d in resp["response"]["docs"]:
        ent = resp["expanded"][d["conv_id"]]
        others = groups[d["conv_id"]][1:]
        assert ent["numFound"] == len(others)
        assert [e["doc_id"] for e in ent["docs"]] == others[:5]


def test_collapse_fail_loud(corpus):
    idx = corpus
    with pytest.raises(ValueError):  # unknown local param
        solr_select(idx, {"q": "error",
                          "fq": "{!collapse field=conv_id size=400}"})
    with pytest.raises(ValueError):
        solr_select(idx, {"q": "error", "fq": "{!collapse field=conv_id}",
                          "facet": "true", "facet.field": "role"})
    with pytest.raises(ValueError):
        solr_select(idx, {"q": "error", "fq": "{!collapse field=conv_id}",
                          "sort": "turn_idx asc"})
    with pytest.raises(ValueError):
        solr_select(idx, {"q": "error", "expand": "true"})
    with pytest.raises(ValueError):
        solr_select(idx, {"q": "error", "fq": [
            "{!collapse field=conv_id}", "{!collapse field=role}"]})
