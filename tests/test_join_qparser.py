"""JoinQParserPlugin: ``fq={!join from=F to=T}innerQuery`` — same-core
field join, brute-forced against the collected corpus."""

import pytest

from solr_semantic_importer_spark.functions.analysis import analyze_text
from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.query.select_api import solr_select
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=25, turns_per_conv=5, seed=37)
    idx_dir = str(tmp_path_factory.mktemp("join"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="join", **CFG))
    return BM25Index(spark, idx_dir)


@pytest.fixture(scope="module")
def rows(corpus):
    return corpus.docs().select(
        "doc_id", "conv_id", "turn_idx", "role", "text", "tool"
    ).collect()


def _text_match(rows, term):
    return [r for r in rows if term in analyze_text(r["text"] or "")]


def test_join_same_field_text_inner(corpus, rows):
    """Docs in conversations that contain a term, via conv_id self-join."""
    term = next(t for r in rows for t in analyze_text(r["text"] or "")
                if t.startswith("topic"))
    convs = {r["conv_id"] for r in _text_match(rows, term)}
    want = sorted(r["doc_id"] for r in rows if r["conv_id"] in convs)
    fq = f"{{!join from=conv_id to=conv_id}}{term}"
    resp = solr_select(corpus, {"q": "*:*", "fq": fq, "rows": 0})
    assert resp["response"]["numFound"] == len(want)
    got = corpus.match_all(k=len(want) + 5, fq=fq)
    assert sorted(r["doc_id"] for r in got.collect()) == want


def test_join_field_clause_inner(corpus, rows):
    """Inner query may be a field:value filter clause — docs in
    conversations that have a tool turn."""
    convs = {r["conv_id"] for r in rows if r["role"] == "tool"}
    want = {r["doc_id"] for r in rows if r["conv_id"] in convs}
    fq = "{!join from=conv_id to=conv_id}role:tool"
    n = solr_select(corpus, {"q": "*:*", "fq": fq, "rows": 0})
    assert n["response"]["numFound"] == len(want)


def test_join_cross_field_numeric(corpus, rows):
    """from/to may differ-typed columns? No — but they may be the same
    numeric column: docs whose turn_idx appears among tool-turn indices."""
    idxs = {r["turn_idx"] for r in rows if r["role"] == "tool"}
    want = {r["doc_id"] for r in rows if r["turn_idx"] in idxs}
    fq = "{!join from=turn_idx to=turn_idx}role:tool"
    n = solr_select(corpus, {"q": "*:*", "fq": fq, "rows": 0})
    assert n["response"]["numFound"] == len(want)


def test_join_scored_query_and_cache(corpus, rows):
    """A scored q under a join fq scores the intersected DocSet; the
    second call reuses the filter-cached join DocSet (same result)."""
    fq = "{!join from=conv_id to=conv_id}role:tool"
    convs = {r["conv_id"] for r in rows if r["role"] == "tool"}
    allowed = {r["doc_id"] for r in rows if r["conv_id"] in convs}
    matched = {r["doc_id"] for r in _text_match(rows, "error")}
    want = len(matched & allowed)
    assert corpus.count_matches("error", fq=fq) == want
    top = corpus.search("error", k=5, fq=fq).collect()
    assert all(r["doc_id"] in allowed for r in top)
    assert corpus.count_matches("error", fq=fq) == want  # cached entry


def test_join_match_all_inner(corpus, rows):
    """Inner *:* joins every live doc's from-value."""
    convs = {r["conv_id"] for r in rows}
    want = {r["doc_id"] for r in rows if r["conv_id"] in convs}
    n = solr_select(corpus, {
        "q": "*:*", "fq": "{!join from=conv_id to=conv_id}*:*", "rows": 0,
    })
    assert n["response"]["numFound"] == len(want)


def test_join_fail_loud(corpus):
    for fq, msg in [
        ("{!join from=conv_id}error", "requires from= and to="),
        ("{!join from=conv_id to=conv_id method=index}x", "requires from="),
        ("{!join from=nope to=conv_id}error", "unknown field"),
        ("{!join from=conv_id to=conv_id score=max}error", "score=none"),
        ("{!join from=conv_id to=conv_id}", "empty inner"),
    ]:
        with pytest.raises(ValueError, match=msg):
            solr_select(corpus, {"q": "*:*", "fq": fq, "rows": 0})


# --- {!graph} qparser (session-4 r4) ------------------------------------------


@pytest.fixture(scope="module")
def graph_idx(spark, tmp_path_factory):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    df = generate_transcripts(spark, n_convs=5, turns_per_conv=4, seed=13)
    w = Window.orderBy("conv_id", "turn_idx")
    df = df.withColumn("pos", F.row_number().over(w) - 1)
    # forward chain: doc i reaches doc i+1 (from_f = n(i+1), to_f = n(i))
    df = df.withColumn("from_f", F.concat(F.lit("n"), (F.col("pos") + 1)))
    df = df.withColumn("to_f", F.concat(F.lit("n"), F.col("pos"))).drop("pos")
    d = str(tmp_path_factory.mktemp("gq"))
    build_index(spark, df, d, BuildConfig(build_id="gq", **CFG))
    return BM25Index(spark, d)


def test_graph_fq_bounded_walk(graph_idx):
    idx = graph_idx
    pos = {r["doc_id"]: int(r["to_f"][1:])
           for r in idx.docs().select("doc_id", "to_f").collect()}
    fq = "{!graph from=from_f to=to_f maxDepth=3}to_f:n0"
    got = {r["doc_id"] for r in idx.match_all(k=100, fq=fq).collect()}
    assert {pos[d] for d in got} == {0, 1, 2, 3}
    # unbounded closure reaches the whole chain; scored q composes
    fq_all = "{!graph from=from_f to=to_f}to_f:n0"
    n = idx.count_matches("*:*", fq=fq_all)
    assert n == len(pos)
    scored = idx.search("error tool call", k=5, fq=fq_all)
    assert scored.count() >= 0  # fq composes with WAND scoring
    # returnRoot=false drops the head
    fq_nr = "{!graph from=from_f to=to_f maxDepth=1 returnRoot=false}to_f:n0"
    got = {pos[r["doc_id"]] for r in idx.match_all(k=100, fq=fq_nr).collect()}
    assert got == {1}


def test_graph_fq_fail_loud(graph_idx):
    idx = graph_idx
    with pytest.raises(ValueError, match="requires from= and to="):
        idx.match_all(k=5, fq="{!graph from=from_f}to_f:n0").collect()
    with pytest.raises(ValueError, match="returnRoot must be"):
        idx.match_all(
            k=5, fq="{!graph from=from_f to=to_f returnRoot=maybe}to_f:n0"
        ).collect()
    with pytest.raises(ValueError, match="empty root"):
        idx.match_all(k=5, fq="{!graph from=from_f to=to_f}").collect()
    with pytest.raises(ValueError, match="unknown fields"):
        idx.match_all(k=5, fq="{!graph from=nope to=to_f}to_f:n0").collect()


# --- {!join fromIndex=} cross-core join (session-5 r4) ------------------------


@pytest.fixture(scope="module")
def other(spark, tmp_path_factory, corpus):
    """A second core sharing the conv_id keyspace: a subset of the same
    generator output, so some conv_ids exist on both sides."""
    df = generate_transcripts(spark, n_convs=25, turns_per_conv=5, seed=37)
    df = df.filter("turn_idx = 0 AND role = 'user'")
    d = str(tmp_path_factory.mktemp("joinx"))
    build_index(spark, df, d, BuildConfig(build_id="joinx", **CFG))
    return BM25Index(spark, d)


def test_join_from_index(corpus, other, rows):
    corpus.collections["other"] = other
    other_rows = other.docs().select("conv_id", "text").collect()
    term = next(t for r in other_rows
                for t in analyze_text(r["text"] or "")
                if t.startswith("topic"))
    convs = {r["conv_id"] for r in other_rows
             if term in analyze_text(r["text"] or "")}
    want = sorted(r["doc_id"] for r in rows if r["conv_id"] in convs)
    fq = f"{{!join from=conv_id to=conv_id fromIndex=other}}{term}"
    resp = solr_select(corpus, {"q": "*:*", "fq": fq, "rows": 0})
    assert want and resp["response"]["numFound"] == len(want)
    got = corpus.match_all(k=len(want) + 5, fq=fq)
    assert sorted(r["doc_id"] for r in got.collect()) == want
    # inner *:* over the other core: every conv present there
    all_convs = {r["conv_id"] for r in other_rows}
    want_all = sum(1 for r in rows if r["conv_id"] in all_convs)
    fq2 = "{!join from=conv_id to=conv_id fromIndex=other}*:*"
    resp2 = solr_select(corpus, {"q": "*:*", "fq": fq2, "rows": 0})
    assert resp2["response"]["numFound"] == want_all
    # from-field validated against the FROM core, to-field against self
    with pytest.raises(ValueError, match="unknown field"):
        solr_select(corpus, {"q": "*:*", "rows": 0,
                             "fq": "{!join from=nope to=conv_id "
                                   "fromIndex=other}*:*"})


def test_join_from_index_unregistered(corpus):
    with pytest.raises(ValueError, match="not registered"):
        solr_select(corpus, {"q": "*:*", "rows": 0,
                             "fq": "{!join from=conv_id to=conv_id "
                                   "fromIndex=missing}*:*"})
