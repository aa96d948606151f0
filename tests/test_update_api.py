"""/update handler (query/update_api.py): JSON command format parsing
(repeated keys), add/overwrite/delete/commit/optimize semantics against a
live index, ordered execution, and the mixed build+append doc-id cursor."""

import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.update_api import (
    parse_update_body,
    solr_update,
)
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


def _mkidx(spark, tmp_path_factory, name, n_convs=10):
    df = generate_transcripts(spark, n_convs=n_convs, turns_per_conv=4, seed=3)
    d = str(tmp_path_factory.mktemp(name))
    cfg = BuildConfig(build_id=name, **CFG)
    build_index(spark, df, d, cfg)
    return d, cfg


def _doc(conv, turn, text, role="user"):
    return {"conv_id": conv, "turn_idx": turn, "role": role, "text": text,
            "tool": None, "ts": None}


# ---------------------------------------------------------------- parsing


def test_parse_repeated_add_keys_wire_format():
    cmds = parse_update_body(
        '{"add": {"doc": {"a": 1}}, "add": {"doc": {"a": 2}}, '
        '"delete": {"query": "x:1"}, "commit": {}}'
    )
    assert [op for op, _ in cmds] == ["add", "add", "delete", "commit"]
    assert cmds[1][1]["doc"] == {"a": 2}


def test_parse_bare_docs_array_and_python_forms():
    cmds = parse_update_body('[{"a": 1}, {"a": 2}]')
    assert cmds == [("add", {"doc": {"a": 1}}), ("add", {"doc": {"a": 2}})]
    assert parse_update_body([{"a": 1}]) == [("add", {"doc": {"a": 1}})]
    assert parse_update_body({"commit": {}}) == [("commit", {})]
    with pytest.raises(ValueError, match="duplicate keys inside"):
        parse_update_body('{"add": {"doc": {"a": 1}, "doc": {"a": 2}}}')
    with pytest.raises(ValueError, match="cannot parse"):
        parse_update_body("3")


# ------------------------------------------------------------ add / delete


def test_add_then_search_sees_new_docs(spark, tmp_path_factory):
    d, cfg = _mkidx(spark, tmp_path_factory, "upd1")
    idx0 = BM25Index(spark, d)
    n0 = idx0.docs().count()
    max_id0 = idx0.docs().agg(F.max("doc_id")).collect()[0][0]
    resp = solr_update(spark, d, cfg, {
        "add": [
            {"doc": _doc("c_new", 0, "zanzibar quartz flume"),
             "overwrite": False},
            {"doc": _doc("c_new", 1, "zanzibar again"), "overwrite": False},
        ],
        "commit": {},
    })
    assert resp["adds"] == 2 and resp["commits"] == 1
    idx = BM25Index(spark, d)  # searcher reopen
    assert idx.docs().count() == n0 + 2
    # doc-id cursor continued past the build_index range (no collisions)
    new_ids = [r.doc_id for r in
               idx.docs().filter("conv_id = 'c_new'").collect()]
    assert min(new_ids) > max_id0
    assert idx.docs().groupBy("doc_id").count().filter("count > 1").count() == 0
    hits = idx.search("zanzibar", k=5).collect()
    assert {r.doc_id for r in hits} == set(new_ids)


def test_overwrite_tombstones_old_versions(spark, tmp_path_factory):
    d, cfg = _mkidx(spark, tmp_path_factory, "upd2")
    idx0 = BM25Index(spark, d)
    conv = idx0.docs().select("conv_id").first().conv_id
    n_old = idx0.docs().filter(F.col("conv_id") == conv).count()
    assert n_old > 0
    resp = solr_update(spark, d, cfg, {
        "add": {"doc": _doc(conv, 0, "replacement turn")},
    }, unique_key="conv_id")
    assert resp["adds"] == 1 and resp["deletes"] == n_old
    idx = BM25Index(spark, d)
    live = idx.match_all(k=1000).join(
        idx.docs(), "doc_id"
    ).filter(F.col("conv_id") == conv).collect()
    assert len(live) == 1 and live[0].text == "replacement turn"


def test_delete_by_id_and_query_in_order(spark, tmp_path_factory):
    d, cfg = _mkidx(spark, tmp_path_factory, "upd3")
    idx0 = BM25Index(spark, d)
    conv = sorted(r.conv_id for r in
                  idx0.docs().select("conv_id").distinct().collect())[0]
    n_tool = idx0.docs().filter("role = 'tool'").count()
    resp = solr_update(spark, d, cfg, {
        "delete": [{"id": conv}, {"query": "role:tool"}],
    }, unique_key="conv_id")
    # ordered: both deletes land; overlap counted once per command set
    assert resp["deletes"] >= n_tool
    idx = BM25Index(spark, d)
    alive = idx.match_all(k=10000).join(idx.docs(), "doc_id")
    assert alive.filter(F.col("conv_id") == conv).count() == 0
    assert alive.filter("role = 'tool'").count() == 0


def test_add_then_delete_query_in_one_request_deletes_new_docs(
    spark, tmp_path_factory
):
    d, cfg = _mkidx(spark, tmp_path_factory, "upd4")
    resp = solr_update(spark, d, cfg, (
        '{"add": {"doc": {"conv_id": "c_x", "turn_idx": 0, "role": "user", '
        '"text": "ephemeral doc", "tool": null, "ts": null}, '
        '"overwrite": false}, '
        '"delete": {"query": "conv_id:c_x"}}'
    ))
    assert resp["adds"] == 1 and resp["deletes"] == 1
    idx = BM25Index(spark, d)
    assert idx.search("ephemeral", k=5).count() == 0


def test_validation_fails_loud(spark, tmp_path_factory):
    d, cfg = _mkidx(spark, tmp_path_factory, "upd5")
    with pytest.raises(ValueError, match="build_id"):
        solr_update(spark, d, BuildConfig(build_id="other", **CFG),
                    {"commit": {}})
    with pytest.raises(ValueError, match="needs unique_key"):
        solr_update(spark, d, cfg, {"add": {"doc": _doc("c", 0, "t")}})
    with pytest.raises(ValueError, match="delete-by-id needs unique_key"):
        solr_update(spark, d, cfg, {"delete": {"id": "c000001"}})
    with pytest.raises(ValueError, match="unsupported /update commands"):
        solr_update(spark, d, cfg, {"rollback": {}})
    with pytest.raises(ValueError, match="doc fields"):
        solr_update(spark, d, cfg,
                    {"add": {"doc": {"conv_id": "c", "nope": 1},
                             "overwrite": False}})
    with pytest.raises(ValueError, match="unsupported keys"):
        solr_update(spark, d, cfg,
                    {"add": {"doc": _doc("c", 0, "t"), "boost": 2.0}})
    # a delete command takes query OR id, never both (the id would
    # otherwise be silently dropped)
    with pytest.raises(ValueError, match="query OR id"):
        solr_update(spark, d, cfg,
                    {"delete": {"query": "role = 'user'", "id": "x"}},
                    unique_key="conv_id")


def test_optimize_merges_runs(spark, tmp_path_factory):
    d, cfg = _mkidx(spark, tmp_path_factory, "upd6")
    # two appends create extra postings runs; optimize merges them
    for i, text in enumerate(["quasar nebulae drift", "quasar pulse"]):
        solr_update(spark, d, cfg, {
            "add": {"doc": _doc(f"c_opt{i}", 0, text), "overwrite": False},
        })
    before = BM25Index(spark, d).search("quasar", k=5).count()
    resp = solr_update(spark, d, cfg, {"optimize": {}})
    assert resp["optimizes"] == 1
    idx = BM25Index(spark, d)
    assert idx.search("quasar", k=5).count() == before == 2
