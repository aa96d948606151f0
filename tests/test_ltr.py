"""LTR rerank (functions/ltr.py + engine.search_ltr + {!ltr} rq):
brute-force parity for linear and tree models, efi templating,
fl=[features], and fail-loud validation."""

import numpy as np
import pytest

from solr_semantic_importer_spark.functions.ltr import (
    LinearModel,
    TreesModel,
    field_value,
    original_score,
    register_ltr_model,
    resolve_efi,
    solr_query,
    value,
)
from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)

Q = "error in tool"
WIN = 20


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=6, seed=5)
    d = str(tmp_path_factory.mktemp("ltr"))
    build_index(spark, df, d, BuildConfig(build_id="ltr", **CFG))
    return BM25Index(spark, d)


@pytest.fixture(scope="module")
def linear():
    return LinearModel(
        name="lin",
        features=(
            original_score("orig"),
            field_value("turn", "turn_idx"),
            solr_query("boostq", "${userQuery}"),
            value("bias", 0.5),
        ),
        weights={"orig": 1.0, "turn": 0.1, "boostq": 2.0, "bias": 1.0},
        norms={"turn": ("minmax", 0.0, 10.0)},
    )


def _expected_ltr(idx, model_scorer, efi_q, k):
    """Window-then-tail page recomputed by hand from engine primitives."""
    window = idx.search(Q, k=max(WIN, k), use_cache=False).collect()
    win, tail = window[:WIN], window[WIN:]
    ids = [r.doc_id for r in win]
    turn = {
        r.doc_id: r.turn_idx
        for r in idx.docs().filter(idx.docs().doc_id.isin(ids))
        .select("doc_id", "turn_idx").collect()
    }
    sm = idx.score_matches(efi_q)
    side = {r.doc_id: r.score
            for r in sm.filter(sm.doc_id.isin(ids)).collect()}
    rescored = []
    for r in win:
        feats = {
            "orig": r.score,
            "turn": (float(turn.get(r.doc_id) or 0.0)) / 10.0,
            "boostq": side.get(r.doc_id, 0.0),
            "bias": 0.5,
        }
        rescored.append((r.doc_id, model_scorer(feats)))
    rescored.sort(key=lambda t: (-round(t[1], 6), t[0]))
    page = rescored + [(r.doc_id, r.score) for r in tail]
    return [(d, round(s, 6)) for d, s in page[:k]]


def test_linear_matches_brute_force(idx, linear):
    got = [
        (r.doc_id, round(r.score, 6))
        for r in idx.search_ltr(
            Q, linear, k=25, rerank_docs=WIN,
            efi={"efi.userQuery": "merge"},
        ).collect()
    ]
    want = _expected_ltr(
        idx,
        lambda f: f["orig"] + 0.1 * f["turn"] + 2.0 * f["boostq"] + 0.5,
        "merge", 25,
    )
    assert got == want


def test_trees_matches_brute_force(idx):
    tree = {
        "feature": "orig", "threshold": 0.8,
        "left": {"value": 0.1},
        "right": {"feature": "turn", "threshold": 0.3,
                  "left": {"value": 1.0}, "right": {"value": 2.0}},
    }
    model = TreesModel(
        name="mat",
        features=(original_score("orig"), field_value("turn", "turn_idx")),
        trees=({"weight": 3.0, "root": tree},),
        norms={"turn": ("minmax", 0.0, 10.0)},
    )

    def scorer(f):
        if f["orig"] <= 0.8:
            return 3.0 * 0.1
        return 3.0 * (1.0 if f["turn"] <= 0.3 else 2.0)

    got = [
        (r.doc_id, round(r.score, 6))
        for r in idx.search_ltr(Q, model, k=10, rerank_docs=WIN).collect()
    ]
    window = idx.search(Q, k=WIN, use_cache=False).collect()
    ids = [r.doc_id for r in window]
    turn = {
        r.doc_id: r.turn_idx
        for r in idx.docs().filter(idx.docs().doc_id.isin(ids))
        .select("doc_id", "turn_idx").collect()
    }
    rescored = sorted(
        (
            (r.doc_id, scorer({
                "orig": r.score,
                "turn": float(turn.get(r.doc_id) or 0.0) / 10.0,
            }))
            for r in window
        ),
        key=lambda t: (-round(t[1], 6), t[0]),
    )
    assert got == [(d, round(s, 6)) for d, s in rescored[:10]]


def test_select_facade_and_features_transformer(idx, linear):
    register_ltr_model(idx, linear)
    resp = solr_select(idx, {
        "q": Q,
        "rq": "{!ltr model=lin reRankDocs=20 efi.userQuery='merge'}",
        "fl": "doc_id,score,[features]",
        "rows": 5,
    })
    docs = resp["response"]["docs"]
    assert len(docs) == 5
    want = [
        (r.doc_id, round(r.score, 6))
        for r in idx.search_ltr(
            Q, linear, k=5, rerank_docs=20, efi={"userQuery": "merge"}
        ).collect()
    ]
    assert [(d["doc_id"], round(d["score"], 6)) for d in docs] == want
    for d in docs:
        feats = dict(kv.split("=") for kv in d["[features]"].split(","))
        assert set(feats) == {"orig", "turn", "boostq", "bias"}
        assert float(feats["bias"]) == 0.5


def test_efi_and_validation_fail_loud(idx, linear):
    register_ltr_model(idx, linear)
    with pytest.raises(ValueError, match="missing efi.userQuery"):
        idx.search_ltr(Q, linear, k=5, rerank_docs=WIN, efi={})
    assert resolve_efi("a ${x} b", {"x": "y"}) == "a y b"
    with pytest.raises(ValueError, match="unknown LTR model"):
        solr_select(idx, {"q": Q, "rq": "{!ltr model=nope}"})
    with pytest.raises(ValueError, match="needs model="):
        solr_select(idx, {"q": Q, "rq": "{!ltr reRankDocs=5}"})
    with pytest.raises(ValueError, match="requires rq="):
        solr_select(idx, {"q": Q, "fl": "doc_id,[features]"})
    with pytest.raises(ValueError, match="relevance sort"):
        solr_select(idx, {"q": Q, "rq": "{!ltr model=lin}",
                          "sort": "turn_idx asc"})
    # debugQuery now composes with {!ltr}: the model breakdown sums to
    # the replaced score (tests/test_explain_ltr.py has the full checks)
    resp = solr_select(idx, {
        "q": Q, "rq": "{!ltr model=lin reRankDocs=5 efi.userQuery='merge'}",
        "debugQuery": "true", "fl": "doc_id,score", "rows": 3,
    })
    assert resp["debug"]["explain"]


def test_model_validation():
    with pytest.raises(ValueError, match="no weight for"):
        LinearModel("m", (original_score("a"),), weights={})
    with pytest.raises(ValueError, match="unknown features"):
        LinearModel("m", (original_score("a"),), weights={"a": 1, "b": 2})
    with pytest.raises(ValueError, match="duplicate feature"):
        LinearModel("m", (original_score("a"), value("a", 1.0)),
                    weights={"a": 1})
    with pytest.raises(ValueError, match="minmax normalizer"):
        LinearModel("m", (original_score("a"),), weights={"a": 1},
                    norms={"a": ("minmax", 1.0, 1.0)})
    with pytest.raises(ValueError, match="unknown normalizer"):
        LinearModel("m", (original_score("a"),), weights={"a": 1},
                    norms={"a": ("zscore", 0, 1)})
    with pytest.raises(ValueError, match="references unknown features"):
        TreesModel("m", (original_score("a"),), trees=(
            {"weight": 1.0, "root": {"feature": "b", "threshold": 0,
                                     "left": {"value": 0},
                                     "right": {"value": 1}}},
        ))
    # normalizer math
    m = LinearModel("m", (original_score("a"),), weights={"a": 2.0},
                    norms={"a": ("standard", 1.0, 2.0)})
    out = m.score({"a": np.array([3.0])})
    assert out.tolist() == [2.0 * (3.0 - 1.0) / 2.0]


def test_model_store_json_roundtrip_and_upstream_format(idx, linear):
    from solr_semantic_importer_spark.functions.ltr import (
        model_from_json,
        model_to_json,
    )

    # roundtrip: our model -> the upstream wire JSON -> back, same scores
    mjson, fstore = model_to_json(linear)
    assert mjson["class"] == "org.apache.solr.ltr.model.LinearModel"
    assert {f["class"] for f in fstore} == {
        "org.apache.solr.ltr.feature.OriginalScoreFeature",
        "org.apache.solr.ltr.feature.FieldValueFeature",
        "org.apache.solr.ltr.feature.SolrFeature",
        "org.apache.solr.ltr.feature.ValueFeature",
    }
    back = model_from_json(mjson, fstore)
    X = {"orig": np.array([1.0, 2.0]), "turn": np.array([5.0, 0.0]),
         "boostq": np.array([0.3, 0.0]), "bias": np.array([0.5, 0.5])}
    assert back.score(X).tolist() == linear.score(X).tolist()

    # an upstream-authored document loads directly (the ref-guide example
    # shape: model features by name + norms, separate feature store)
    fstore2 = [
        {"name": "orig",
         "class": "org.apache.solr.ltr.feature.OriginalScoreFeature",
         "params": {}},
        {"name": "t",
         "class": "org.apache.solr.ltr.feature.FieldValueFeature",
         "params": {"field": "turn_idx"}},
    ]
    mjson2 = {
        "class": "org.apache.solr.ltr.model.MultipleAdditiveTreesModel",
        "name": "mat2",
        "features": [
            {"name": "orig"},
            {"name": "t",
             "norm": {"class": "org.apache.solr.ltr.norm.MinMaxNormalizer",
                      "params": {"min": "0", "max": "10"}}},
        ],
        "params": {"trees": [{"weight": "2", "root": {
            "feature": "t", "threshold": "0.5",
            "left": {"value": "1"}, "right": {"value": "3"}}}]},
    }
    m2 = model_from_json(mjson2, fstore2)
    out = m2.score({"orig": np.array([1.0]), "t": np.array([9.0])})
    assert out.tolist() == [6.0]  # 9/10 > 0.5 -> right leaf 3 * weight 2
    # and it runs through the engine end to end
    got = idx.search_ltr("error in tool", m2, k=3, rerank_docs=10).collect()
    assert len(got) == 3

    with pytest.raises(ValueError, match="unsupported model class"):
        model_from_json({"class": "x", "name": "m", "features": []})
    with pytest.raises(ValueError, match="absent from"):
        model_from_json({"class": mjson["class"], "name": "m",
                         "features": [{"name": "ghost"}],
                         "params": {"weights": {}}})
