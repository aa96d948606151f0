"""Solr JSON Request API (query/json_request.py): body translation parity
with the classic param map the reference sends, query DSL wrappers, and
the fail-loud merge contract."""

import json

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.json_request import (
    json_body_to_params,
    solr_select_json,
)
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=50, turns_per_conv=6, seed=31)
    d = str(tmp_path_factory.mktemp("jreq"))
    build_index(spark, df, d, BuildConfig(build_id="jreq", **CFG))
    return BM25Index(spark, d)


def _docs(resp):
    return [(d["doc_id"], d.get("score")) for d in resp["response"]["docs"]]


# ---------------------------------------------------------------- translation


def test_body_maps_to_classic_params():
    p = json_body_to_params({
        "query": "error in tool",
        "filter": ["role:user", "-tool:*"],
        "fields": ["conv_id", "turn_idx", "score"],
        "sort": "score desc",
        "offset": 5,
        "limit": 7,
        "params": {"debugQuery": "false"},
    })
    assert p == {
        "q": "error in tool",
        "fq": ["role:user", "-tool:*"],
        "fl": "conv_id,turn_idx,score",
        "sort": "score desc",
        "start": 5,
        "rows": 7,
        "debugQuery": "false",
    }


def test_string_body_and_string_filter_and_fields():
    p = json_body_to_params(json.dumps(
        {"query": "*:*", "filter": "role:user", "fields": "conv_id"}
    ))
    assert p["fq"] == ["role:user"] and p["fl"] == "conv_id"


def test_filter_appends_to_params_fq():
    p = json_body_to_params({
        "filter": "role:user",
        "params": {"fq": "-tool:*"},
    })
    # multi-valued: params fq first, body filters appended
    assert p["fq"] == ["-tool:*", "role:user"]


def test_facet_key_becomes_json_facet():
    f = {"by_role": {"type": "terms", "field": "role"}}
    assert json_body_to_params({"facet": f})["json.facet"] == f


def test_single_valued_conflict_fails_loud():
    with pytest.raises(ValueError, match="conflicting"):
        json_body_to_params({"limit": 3, "params": {"rows": 5}})
    with pytest.raises(ValueError, match="conflicting"):
        json_body_to_params({"query": "a", "params": {"q": "b"}})


def test_unknown_body_key_fails_loud():
    with pytest.raises(ValueError, match="unsupported json body keys"):
        json_body_to_params({"qurey": "*:*"})


def test_bad_offset_limit_fail_loud():
    with pytest.raises(ValueError, match="offset"):
        json_body_to_params({"offset": -1})
    with pytest.raises(ValueError, match="limit"):
        json_body_to_params({"limit": "10"})


# ----------------------------------------------------------------- query DSL


def test_lucene_wrapper():
    p = json_body_to_params({"query": {"lucene": {"query": "a b", "q.op": "AND"}}})
    assert p == {"q": "a b", "q.op": "AND"}


def test_edismax_wrapper_sets_deftype_and_params():
    p = json_body_to_params({"query": {"edismax": {"query": "a b", "pf": "text"}}})
    assert p == {"q": "a b", "defType": "edismax", "pf": "text"}


def test_bool_dsl_composes_occur_prefixes():
    p = json_body_to_params({"query": {"bool": {
        "must": ["error"], "should": ["tool", '"the user"'], "must_not": "fail",
    }}})
    assert p["q"] == '+error tool "the user" -fail'


def test_bool_dsl_rejects_nested_and_multiword():
    with pytest.raises(ValueError, match="unsupported bool"):
        json_body_to_params({"query": {"bool": {"must": ["two words"]}}})
    # non-bool clause objects fail loud (nested {"bool": ...} is VALID
    # since grouped-boolean support landed)
    with pytest.raises(ValueError, match="clause object must be"):
        json_body_to_params({"query": {"bool": {"must": [{"lucene": {}}]}}})
    with pytest.raises(ValueError, match="empty bool"):
        json_body_to_params({"query": {"bool": {}}})


def test_unsupported_dsl_fails_loud():
    with pytest.raises(ValueError, match="unsupported query DSL"):
        json_body_to_params({"query": {"knn": {}}})
    with pytest.raises(ValueError, match="one-key DSL"):
        json_body_to_params({"query": {"lucene": {}, "bool": {}}})


# ------------------------------------------------------------- end to end


def test_end_to_end_parity_with_classic_params(idx):
    body = {
        "query": "error in tool",
        "filter": "role:user",
        "fields": ["conv_id", "turn_idx", "score"],
        "offset": 0,
        "limit": 5,
    }
    classic = solr_select(idx, {
        "q": "error in tool", "fq": "role:user",
        "fl": "conv_id,turn_idx,score", "start": 0, "rows": 5,
    })
    viajson = solr_select_json(idx, body)
    assert _docs(viajson) == _docs(classic)
    assert (viajson["response"]["numFound"]
            == classic["response"]["numFound"])


def test_end_to_end_bool_dsl_equals_string_q(idx):
    viajson = solr_select_json(
        idx, {"query": {"bool": {"must": ["error"], "must_not": ["fail"]}},
              "limit": 8}
    )
    classic = solr_select(idx, {"q": "+error -fail", "rows": 8})
    assert _docs(viajson) == _docs(classic)


def test_end_to_end_facet(idx):
    resp = solr_select_json(idx, {
        "query": "*:*", "limit": 0,
        "facet": {"roles": {"type": "terms", "field": "role"}},
    })
    buckets = resp["facets"]["roles"]["buckets"]
    assert buckets and {b["val"] for b in buckets} <= {"user", "assistant", "tool"}


def test_merged_params_still_fail_loud_on_unknown(idx):
    with pytest.raises(ValueError, match="unsupported /select params"):
        solr_select_json(idx, {"query": "*:*", "params": {"shards": "x"}})


def test_nested_bool_dsl_composes_groups():
    from solr_semantic_importer_spark.query.json_request import (
        json_body_to_params,
    )
    p = json_body_to_params({
        "query": {"bool": {
            "must": [{"bool": {"should": ["error", "tool"]}}, "call"],
            "must_not": {"bool": {"must": ["run", "test"]}},
        }}
    })
    assert p["q"] == "+(error tool) +call -(+run +test)"
    # non-bool clause objects still fail loud
    import pytest as _pytest
    with _pytest.raises(ValueError, match="bool"):
        json_body_to_params(
            {"query": {"bool": {"must": [{"term": "x"}]}}}
        )


def test_nested_bool_dsl_end_to_end(idx):
    from solr_semantic_importer_spark.query.json_request import solr_select_json
    r = solr_select_json(idx, {
        "query": {"bool": {
            "must": [{"bool": {"should": ["error", "tool"]}}, "call"],
        }},
        "limit": 5, "fields": "doc_id,score",
    })
    want = {r0["doc_id"]: r0["score"]
            for r0 in idx.score_matches("+(error tool) +call").collect()}
    assert r["response"]["numFound"] == len(want) > 0
