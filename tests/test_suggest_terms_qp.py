"""/suggest handler (SuggestComponent) and the {!terms} qparser."""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_suggest
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=30, turns_per_conv=5, seed=29)
    idx_dir = str(tmp_path_factory.mktemp("sugg"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="sugg", **CFG))
    return BM25Index(spark, idx_dir)


def _df_map(idx):
    out: dict = {}
    for r in idx.docs().select("text").collect():
        from solr_semantic_importer_spark.functions.analysis import analyze_text

        for t in set(analyze_text(r["text"] or "")):
            out[t] = out.get(t, 0) + 1
    return out


def test_suggest_completes_last_token(corpus):
    idx = corpus
    resp = solr_suggest(idx, {"suggest": "true", "suggest.q": "merge ta",
                              "suggest.count": 5})
    ent = resp["suggest"]["default"]["merge ta"]
    dfm = _df_map(idx)
    want = sorted(
        ((t, c) for t, c in dfm.items() if t.startswith("ta")),
        key=lambda kv: (-kv[1], kv[0]),
    )[:5]
    assert [(s["term"], s["weight"]) for s in ent["suggestions"]] == want
    assert ent["numFound"] == len(want)
    # named dictionary label echoes
    r2 = solr_suggest(idx, {"suggest.q": "tab", "suggest.dictionary": "mySug"})
    assert "mySug" in r2["suggest"]
    with pytest.raises(ValueError):
        solr_suggest(idx, {"suggest.q": "x", "bogus": 1})
    with pytest.raises(ValueError):
        solr_suggest(idx, {})


def test_terms_qparser(corpus):
    idx = corpus
    got = {r["doc_id"] for r in
           idx.score_matches("error", fq="{!terms f=role}user,tool").collect()}
    base = {r["doc_id"] for r in idx.score_matches("error").collect()}
    roles = {r["doc_id"]: r["role"] for r in idx.docs().collect()}
    assert got == {i for i in base if roles[i] in ("user", "tool")}
    # numeric field + empty list
    got2 = {r["doc_id"] for r in
            idx.score_matches("error", fq="{!terms f=turn_idx}0,2").collect()}
    tix = {r["doc_id"]: r["turn_idx"] for r in idx.docs().collect()}
    assert got2 == {i for i in base if tix[i] in (0, 2)}
    assert idx.score_matches("error", fq="{!terms f=role}").count() == 0
    with pytest.raises(ValueError):
        idx.score_matches("error", fq="{!terms f=nope}x").count()
