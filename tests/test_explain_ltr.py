"""debugQuery / fl=[explain] under rq={!ltr}: the breakdown comes from
model.explain over the same feature matrix the rescore used, so the
contribution sum reproduces the replaced score bit-exactly; tail docs
keep their original BM25 score."""

import pytest

from solr_semantic_importer_spark.functions.ltr import (
    LinearModel,
    TreesModel,
    field_value,
    original_score,
    register_ltr_model,
    value,
)
from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=40, turns_per_conv=6, seed=13)
    d = str(tmp_path_factory.mktemp("ltrexp"))
    build_index(spark, df, d, BuildConfig(build_id="ltrexp", **CFG))
    ix = BM25Index(spark, d)
    register_ltr_model(ix, LinearModel(
        name="lin",
        features=(original_score("orig"), field_value("turn", "turn_idx"),
                  value("bias", 0.5)),
        weights={"orig": 1.0, "turn": 0.1, "bias": 1.0},
    ))
    register_ltr_model(ix, TreesModel(
        name="trees",
        features=(original_score("orig"), field_value("turn", "turn_idx")),
        trees=(
            {"weight": 2.0, "root": {
                "feature": "turn", "threshold": 2.0,
                "left": {"value": 1.0}, "right": {"value": 0.25}}},
            {"weight": 1.0, "root": {
                "feature": "orig", "threshold": 0.5,
                "left": {"value": 0.0}, "right": {"value": 0.5}}},
        ),
    ))
    return ix


def _check(resp, window_label):
    docs = resp["response"]["docs"]
    assert docs
    saw_window = saw_tail = False
    for d in docs:
        e = resp["debug"]["explain"][str(d["doc_id"])]
        assert e["score"] == d["score"]
        if e["inRerankWindow"]:
            saw_window = True
            s = None
            for _lbl, v in e["model"]:
                s = v if s is None else s + v
            assert s == e["score"]
            assert window_label in e["model"][0][0] or e["features"]
        else:
            saw_tail = True
            assert e["score"] == e["originalScore"]
    return saw_window, saw_tail


def test_linear_model_explain_sums_exactly(idx):
    resp = solr_select(idx, {
        "q": "error tool", "rows": 6, "fl": "doc_id,score",
        "debugQuery": "true",
        "rq": "{!ltr model=lin reRankDocs=3}",
    })
    saw_window, saw_tail = _check(resp, "orig")
    assert saw_window and saw_tail  # reRankDocs=3 < rows splits the page


def test_trees_model_explain_per_tree(idx):
    resp = solr_select(idx, {
        "q": "error tool", "rows": 4, "fl": "doc_id,score",
        "debugQuery": "true",
        "rq": "{!ltr model=trees reRankDocs=10}",
    })
    docs = resp["response"]["docs"]
    for d in docs:
        e = resp["debug"]["explain"][str(d["doc_id"])]
        if e["inRerankWindow"]:
            assert all(lbl.startswith("tree[") for lbl, _ in e["model"])
            s = None
            for _lbl, v in e["model"]:
                s = v if s is None else s + v
            assert s == e["score"]


def test_ltr_fl_explain_text(idx):
    resp = solr_select(idx, {
        "q": "error tool", "rows": 3, "fl": "doc_id,score,[explain]",
        "rq": "{!ltr model=lin reRankDocs=10}",
    })
    for d in resp["response"]["docs"]:
        text = d["[explain]"]
        assert text.startswith(f"{d['score']} = LTRModel(lin), sum of:")
        assert "features:" in text and "replaces original score" in text


def test_ltr_explain_with_features_transformer(idx):
    # [features] and [explain] compose on one request
    resp = solr_select(idx, {
        "q": "error tool", "rows": 2,
        "fl": "doc_id,score,[features],[explain]",
        "rq": "{!ltr model=lin reRankDocs=10}",
    })
    for d in resp["response"]["docs"]:
        assert "orig=" in d["[features]"]
        assert d["[explain]"].startswith(f"{d['score']} =")
