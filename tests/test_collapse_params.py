"""{!collapse} min=/max=/sort=/nullPolicy= local params vs brute force.

Head selection: min/max of a numeric field or function query, or the top
doc under a sort spec; the page stays ordered by each head's own
relevance score (Solr: the collapsed doc keeps its score). nullPolicy:
ignore drops null-field docs, expand passes them through as their own
heads, collapse folds them into one null group."""

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
    idx_dir = str(tmp_path_factory.mktemp("collapse_lp"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="colp", **CFG))
    return BM25Index(spark, idx_dir)


def _matched(idx, q, fq=None):
    """{doc_id: (score, full doc row dict)} for the match set."""
    scored = {r["doc_id"]: r["score"]
              for r in idx.score_matches(q, fq=fq).collect()}
    docs = {r["doc_id"]: r.asDict() for r in idx.docs().collect()}
    return {i: (s, docs[i]) for i, s in scored.items()}


def _brute_heads(idx, q, field, head_by=None, null_policy="ignore", fq=None):
    """[(group_value, doc_id, score)] ordered by (round6 desc, doc_id)."""
    m = _matched(idx, q, fq=fq)
    groups: dict = {}
    loose = []  # nullPolicy=expand pass-through heads
    for i, (s, d) in sorted(m.items()):
        v = d[field]
        if v is None:
            if null_policy == "ignore":
                continue
            if null_policy == "expand":
                loose.append((None, i, s))
                continue
        groups.setdefault(v, []).append((i, s, d))
    heads = list(loose)
    for v, members in groups.items():
        if head_by is None:
            best = min(members, key=lambda t: (-round(t[1], 6), t[0]))
        else:
            mode, crit = head_by
            keyed = [t for t in members if t[2].get(crit) is not None]
            if not keyed:  # all-null criterion: lowest doc_id fallback
                best = min(members, key=lambda t: t[0])
            elif mode == "min":
                best = min(keyed, key=lambda t: (t[2][crit], t[0]))
            else:
                best = min(keyed, key=lambda t: (-t[2][crit], t[0]))
        heads.append((v, best[0], best[1]))
    heads.sort(key=lambda t: (-round(t[2], 6), t[1]))
    return heads


def _page_ids(resp):
    return [d["doc_id"] for d in resp["response"]["docs"]]


def test_collapse_min_field(corpus):
    idx = corpus
    resp = solr_select(idx, {
        "q": "error tool", "rows": 6,
        "fq": "{!collapse field=conv_id min=turn_idx}",
        "fl": "doc_id,conv_id,turn_idx,score",
    })
    heads = _brute_heads(idx, "error tool", "conv_id", ("min", "turn_idx"))
    assert resp["response"]["numFound"] == len(heads)
    assert _page_ids(resp) == [i for _, i, _ in heads[:6]]
    # heads report their OWN relevance score, not the criterion
    exp = {i: s for _, i, s in heads}
    for d in resp["response"]["docs"]:
        assert d["score"] == pytest.approx(exp[d["doc_id"]], rel=1e-9)


def test_collapse_max_field(corpus):
    idx = corpus
    resp = solr_select(idx, {
        "q": "error tool", "rows": 6,
        "fq": "{!collapse field=conv_id max=turn_idx}",
        "fl": "doc_id,score",
    })
    heads = _brute_heads(idx, "error tool", "conv_id", ("max", "turn_idx"))
    assert resp["response"]["numFound"] == len(heads)
    assert _page_ids(resp) == [i for _, i, _ in heads[:6]]


def test_collapse_min_function_query(corpus):
    idx = corpus
    # sum(turn_idx,0) is turn_idx: the function path must pick identical heads
    plain = solr_select(idx, {
        "q": "error tool", "rows": 8,
        "fq": "{!collapse field=conv_id min=turn_idx}", "fl": "doc_id",
    })
    func = solr_select(idx, {
        "q": "error tool", "rows": 8,
        "fq": "{!collapse field=conv_id min=sum(turn_idx,0)}", "fl": "doc_id",
    })
    assert _page_ids(func) == _page_ids(plain)
    assert func["response"]["numFound"] == plain["response"]["numFound"]


def test_collapse_sort_spec(corpus):
    idx = corpus
    # sort='turn_idx desc' head-selects like max=turn_idx (doc_id tiebreak)
    by_sort = solr_select(idx, {
        "q": "error tool", "rows": 8,
        "fq": "{!collapse field=conv_id sort='turn_idx desc'}",
        "fl": "doc_id",
    })
    by_max = solr_select(idx, {
        "q": "error tool", "rows": 8,
        "fq": "{!collapse field=conv_id max=turn_idx}", "fl": "doc_id",
    })
    assert _page_ids(by_sort) == _page_ids(by_max)


def test_collapse_sort_score_matches_default(corpus):
    idx = corpus
    default = solr_select(idx, {
        "q": "error tool", "rows": 8,
        "fq": "{!collapse field=conv_id}", "fl": "doc_id",
    })
    by_sort = solr_select(idx, {
        "q": "error tool", "rows": 8,
        "fq": "{!collapse field=conv_id sort='score desc'}", "fl": "doc_id",
    })
    assert _page_ids(by_sort) == _page_ids(default)


def test_null_policy_expand_and_collapse(corpus):
    idx = corpus
    # `tool` is null on most turns: a real null-heavy collapse field
    q = "error tool"
    m = _matched(idx, q)
    null_ids = sorted(i for i, (_, d) in m.items() if d["tool"] is None)
    n_groups = len({d["tool"] for _, d in m.values() if d["tool"] is not None})
    assert null_ids and n_groups  # fixture sanity

    exp = solr_select(idx, {
        "q": q, "rows": 200,
        "fq": "{!collapse field=tool nullPolicy=expand}",
        "fl": "doc_id,tool,score",
    })
    heads = _brute_heads(idx, q, "tool", None, null_policy="expand")
    assert exp["response"]["numFound"] == n_groups + len(null_ids)
    assert _page_ids(exp) == [i for _, i, _ in heads]

    col = solr_select(idx, {
        "q": q, "rows": 200,
        "fq": "{!collapse field=tool nullPolicy=collapse}",
        "fl": "doc_id,tool",
    })
    cheads = _brute_heads(idx, q, "tool", None, null_policy="collapse")
    assert col["response"]["numFound"] == n_groups + 1
    assert _page_ids(col) == [i for _, i, _ in cheads]

    ign = solr_select(idx, {
        "q": q, "rows": 200, "fq": "{!collapse field=tool}",
        "fl": "doc_id,tool",
    })
    assert ign["response"]["numFound"] == n_groups
    for d in ign["response"]["docs"]:
        assert d["tool"] is not None


def test_min_collapse_match_all(corpus):
    idx = corpus
    resp = solr_select(idx, {
        "q": "*:*", "rows": 5,
        "fq": "{!collapse field=conv_id max=turn_idx}", "fl": "doc_id",
    })
    docs = [r.asDict() for r in idx.docs().collect()]
    best: dict = {}
    for d in sorted(docs, key=lambda d: d["doc_id"]):
        cur = best.get(d["conv_id"])
        if cur is None or d["turn_idx"] > cur["turn_idx"]:
            best[d["conv_id"]] = d
    heads = sorted(v["doc_id"] for v in best.values())  # score ties -> doc_id
    assert resp["response"]["numFound"] == len(best)
    assert _page_ids(resp) == heads[:5]


def test_expand_with_min_head(corpus):
    idx = corpus
    resp = solr_select(idx, {
        "q": "error tool", "rows": 4,
        "fq": "{!collapse field=conv_id min=turn_idx}",
        "expand": "true", "expand.rows": 3, "fl": "doc_id,conv_id,score",
    })
    m = _matched(idx, "error tool")
    heads = {d["conv_id"]: d["doc_id"] for d in resp["response"]["docs"]}
    for g, head in heads.items():
        members = sorted(
            ((i, s) for i, (s, d) in m.items()
             if d["conv_id"] == g and i != head),
            key=lambda t: (-round(t[1], 6), t[0]),
        )
        ent = resp["expanded"][g]
        assert ent["numFound"] == len(members)
        assert [e["doc_id"] for e in ent["docs"]] == \
               [i for i, _ in members[:3]]


def test_collapse_param_validation(corpus):
    idx = corpus
    with pytest.raises(ValueError):  # min and max together
        solr_select(idx, {"q": "error", "fq":
                          "{!collapse field=conv_id min=turn_idx max=turn_idx}"})
    with pytest.raises(ValueError):  # unknown nullPolicy
        solr_select(idx, {"q": "error", "fq":
                          "{!collapse field=conv_id nullPolicy=zap}"})
    with pytest.raises(ValueError):  # unknown criterion field
        solr_select(idx, {"q": "error", "fq":
                          "{!collapse field=conv_id min=nope}"})
    with pytest.raises(ValueError):  # hint other than top_fc
        solr_select(idx, {"q": "error", "fq":
                          "{!collapse field=conv_id hint=block}"})
    # hint=top_fc is a no-op performance hint: accepted
    ok = solr_select(idx, {"q": "error", "rows": 2,
                           "fq": "{!collapse field=conv_id hint=top_fc}"})
    assert ok["response"]["docs"]
