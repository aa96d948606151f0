"""Session-6 /select parity odds and ends: random_<seed> sort (Solr's
RandomSortField dynamic field), fl field globs, and accepted
performance-hint params."""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=30, turns_per_conv=5, seed=29)
    d = str(tmp_path_factory.mktemp("selmisc"))
    build_index(spark, df, d, BuildConfig(build_id="selmisc", **CFG))
    return BM25Index(spark, d)


def test_random_sort_is_stable_shuffle(idx):
    a = solr_select(idx, {"q": "*:*", "rows": 20, "fl": "doc_id",
                          "sort": "random_1234 asc"})
    b = solr_select(idx, {"q": "*:*", "rows": 20, "fl": "doc_id",
                          "sort": "random_1234 asc"})
    ids_a = [d["doc_id"] for d in a["response"]["docs"]]
    ids_b = [d["doc_id"] for d in b["response"]["docs"]]
    assert ids_a == ids_b                      # deterministic per seed
    assert ids_a != sorted(ids_a)              # and actually shuffled
    c = solr_select(idx, {"q": "*:*", "rows": 20, "fl": "doc_id",
                          "sort": "random_9 asc"})
    assert [d["doc_id"] for d in c["response"]["docs"]] != ids_a


def test_random_sort_on_scored_query(idx):
    r = solr_select(idx, {"q": "error", "rows": 5, "fl": "doc_id",
                          "sort": "random_7 asc"})
    assert len(r["response"]["docs"]) > 0


def test_fl_glob_expands_schema_fields(idx):
    r = solr_select(idx, {"q": "error", "rows": 2, "fl": "doc_id,conv_*"})
    d = r["response"]["docs"][0]
    assert "conv_id" in d and "text" not in d
    # a glob matching nothing contributes no columns (Solr behavior)
    r2 = solr_select(idx, {"q": "error", "rows": 2,
                           "fl": "doc_id,zzz_*"})
    assert set(r2["response"]["docs"][0]) == {"doc_id"}


def test_hint_params_accepted_not_semantic(idx):
    base = solr_select(idx, {"q": "error", "rows": 5, "fl": "doc_id,score",
                             "facet": "true", "facet.field": "role"})
    hinted = solr_select(idx, {"q": "error", "rows": 5,
                               "fl": "doc_id,score",
                               "facet": "true", "facet.field": "role",
                               "facet.method": "enum",
                               "facet.threads": 4, "timeAllowed": 100})
    assert hinted["response"]["docs"] == base["response"]["docs"]
    assert hinted["facet_counts"] == base["facet_counts"]
    with pytest.raises(ValueError, match="facet.method"):
        solr_select(idx, {"q": "error", "facet": "true",
                          "facet.field": "role", "facet.method": "bogus"})


def test_docid_and_shard_transformers(idx):
    r = solr_select(idx, {"q": "error", "rows": 3,
                          "fl": "doc_id,score,[docid],[shard]"})
    for d in r["response"]["docs"]:
        assert d["[docid]"] == d["doc_id"]  # internal id == uniqueKey here
        assert d["[shard]"] == idx.data_dir
