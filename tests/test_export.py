"""Solr /export handler analog: the FULL sorted result set as a
distributed DataFrame (no paging, nothing collected server-side)."""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_export
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=50, turns_per_conv=6, seed=13)
    idx_dir = str(tmp_path_factory.mktemp("export"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="export", **CFG))
    return df, BM25Index(spark, idx_dir)


def test_export_scored_full_set(corpus):
    """Every match, ordered like search(), fl-projected."""
    _, idx = corpus
    out = solr_export(idx, {"q": "error tool", "fl": "doc_id,score,conv_id"})
    rows = out.collect()
    assert out.columns == ["doc_id", "score", "conv_id"]
    n = idx.count_matches("error tool")
    assert len(rows) == n
    head = [(r["doc_id"], round(r["score"], 6)) for r in rows[:10]]
    want = [
        (r["doc_id"], round(r["score"], 6))
        for r in idx.search("error tool", k=10, use_cache=False).collect()
    ]
    assert head == want


def test_export_field_sort_not_in_fl(corpus):
    """Sort fields need not appear in fl (Solr: docValues sort)."""
    _, idx = corpus
    out = solr_export(idx, {"q": "error", "fl": "doc_id", "sort": "ts asc"})
    assert out.columns == ["doc_id"]
    got = [r["doc_id"] for r in out.collect()]
    matched = idx.score_matches("error").select("doc_id")
    want = [
        r["doc_id"]
        for r in matched.join(idx.docs(), "doc_id")
        .orderBy("ts", "doc_id").select("doc_id").collect()
    ]
    assert got == want


def test_export_match_all_respects_fq_and_tombstones(corpus):
    _, idx = corpus
    out = solr_export(idx, {"q": "*:*", "fq": "role:assistant",
                            "fl": "doc_id,role", "sort": "doc_id asc"})
    rows = out.collect()
    assert rows and all(r["role"] == "assistant" for r in rows)
    assert len(rows) == idx.docs().filter("role = 'assistant'").count()
    ids = [r["doc_id"] for r in rows]
    assert ids == sorted(ids)


def test_export_mm_and_validation(corpus):
    _, idx = corpus
    n2 = solr_export(idx, {"q": "error tool the", "mm": 2}).count()
    assert n2 == idx.count_matches("error tool the", mm=2)
    with pytest.raises(ValueError, match="sort"):
        solr_export(idx, {"q": "error", "sort": "ts ascending"})


def test_export_multi_field_sort(corpus):
    """Solr comma-separated multi-field sort on /export (r4)."""
    _, idx = corpus
    out = solr_export(
        idx, {"q": "error", "fl": "doc_id,role,turn_idx",
              "sort": "role asc, turn_idx desc"})
    rows = out.collect()
    key = [(r["role"], -r["turn_idx"], r["doc_id"]) for r in rows]
    assert rows and key == sorted(key)
