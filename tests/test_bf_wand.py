"""bf-WAND pruning (VERDICT r4 item 5): boosted top-k without scoring
the full match set when every bf is bounded by a corpus-wide max.

Rank-identity contract: search_boosted(mode='wand') must equal
mode='exhaustive' (doc ids identical, scores equal to float noise) on
every shape — bounded bf, several bf, fq, op=AND, mm, per-term boosts —
on BOTH kernel paths (vectorized small-segment and the zone path forced
via exhaustive_cutoff=0). The threshold-collection kernel mode is also
unit-checked against the exhaustive match set.
"""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)

# tiny bound => theta - B stays positive => the pruned path engages
TIGHT_BF = "recip(turn_idx,1,0.01,1)"


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=80, turns_per_conv=6, seed=71)
    idx_dir = str(tmp_path_factory.mktemp("bfwand"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="bfwand", **CFG))
    idx = BM25Index(spark, idx_dir)
    # the crossover gate would route this tiny corpus to the exhaustive
    # path; force the pruned machinery on so these tests exercise it
    idx.PRUNED_BOOST_MIN_MATCHES = 0
    return idx


def _pairs(df):
    return [(int(r["doc_id"]), float(r["score"])) for r in df.collect()]


SHAPES = [
    dict(q="error", bf=TIGHT_BF),
    dict(q="error tool", bf=TIGHT_BF),
    dict(q="error", bf=[TIGHT_BF, "recip(dl,1,0.05,1)"]),
    dict(q="error tool", bf=TIGHT_BF, op="AND"),
    dict(q="error tool the", bf=TIGHT_BF, mm=2),
    dict(q="error", bf=TIGHT_BF, fq="role = 'user'"),
    dict(q="error^2 tool", bf=TIGHT_BF),
    # loose bound (max 2.0): pruning may or may not engage — identity
    # must hold either way
    dict(q="error", bf="recip(turn_idx,1,2,1)"),
    # linear can go NEGATIVE per doc; the max is still a valid upper
    # bound and rank identity must hold
    dict(q="error", bf="linear(turn_idx,-0.01,0.05)"),
    # multiplicative boost (non-negative, bounded): base*M bound
    dict(q="error", boost="recip(turn_idx,1,1,1)"),
    dict(q="error", bf=TIGHT_BF, boost="recip(turn_idx,1,1,1)"),
    # boost that can be 0 on some docs is still valid (min >= 0)
    dict(q="error", boost="div(turn_idx,5)"),
    # multi-term clauses (wildcard/fuzzy) must bail to the structured
    # path, never feed raw tokens into the candidate kernels
    dict(q="err* tool", bf=TIGHT_BF),
    dict(q="error~1", bf=TIGHT_BF),
]


@pytest.mark.parametrize("zone", [False, True])
def test_bf_wand_rank_identity(corpus, zone):
    idx = corpus
    if zone:
        idx.exhaustive_cutoff = 0  # force the zone kernels
    try:
        for shape in SHAPES:
            shape = dict(shape)
            q = shape.pop("q")
            want = _pairs(idx.search_boosted(q, k=10, mode="exhaustive",
                                             **shape))
            got = _pairs(idx.search_boosted(q, k=10, mode="wand", **shape))
            assert [d for d, _ in got] == [d for d, _ in want], (q, shape)
            for (_, a), (_, b) in zip(got, want):
                assert a == pytest.approx(b, rel=1e-9)
    finally:
        if hasattr(idx, "exhaustive_cutoff"):
            del idx.exhaustive_cutoff


def test_pruned_path_engages_for_tight_bound(corpus):
    idx = corpus
    frame = idx._boosted_wand_frame("error", [TIGHT_BF], 10)
    assert frame is not None, "tight bf bound must take the pruned path"
    # and the pruned frame already contains every top-10 boosted doc
    want = _pairs(idx.search_boosted("error", k=10, mode="exhaustive",
                                     bf=TIGHT_BF))
    got = {int(r["doc_id"]): float(r["score"])
           for r in frame.select("doc_id", "score").collect()}
    for d, s in want:
        assert d in got and got[d] == pytest.approx(s, rel=1e-9)


def test_candidate_set_is_pruned(corpus):
    """The threshold pass must ship FEWER rows than the match set when
    the bound is tight (the whole point)."""
    idx = corpus
    n_matches = idx.score_matches("error").count()
    frame = idx._boosted_wand_frame("error", [TIGHT_BF], 5)
    assert frame is not None
    assert frame.count() < n_matches


def test_fallbacks_stay_exact(corpus):
    idx = corpus
    # ord() bf has no corpus-max job shape: must fall back, stay correct
    assert idx._boosted_wand_frame("error", ["ord(role)"], 10) is None
    # a boost that can go negative breaks the monotone base*M bound
    assert idx._boosted_wand_frame(
        "error", [], 10, boost="linear(turn_idx,-1,1)") is None
    got = _pairs(idx.search_boosted("error", k=5,
                                    boost="linear(turn_idx,-1,1)",
                                    mode="wand"))
    want = _pairs(idx.search_boosted("error", k=5,
                                     boost="linear(turn_idx,-1,1)",
                                     mode="exhaustive"))
    assert got == want
    a = _pairs(idx.search_boosted("error", k=5, bf="ord(role)",
                                  mode="wand"))
    b = _pairs(idx.search_boosted("error", k=5, bf="ord(role)",
                                  mode="exhaustive"))
    assert a == b
    # match set smaller than the page: falls back
    assert idx._boosted_wand_frame("error", [TIGHT_BF], 10**6) is None


def test_crossover_gate_skips_tiny_corpora(corpus):
    """With the default gate, a corpus this small routes to the
    exhaustive path (the pruned path's fixed job overhead only pays on
    ~10^6+ match sets)."""
    idx = corpus
    old = idx.PRUNED_BOOST_MIN_MATCHES
    idx.PRUNED_BOOST_MIN_MATCHES = type(idx).PRUNED_BOOST_MIN_MATCHES
    try:
        assert idx._boosted_wand_frame("error", [TIGHT_BF], 10) is None
    finally:
        idx.PRUNED_BOOST_MIN_MATCHES = old


def test_threshold_kernel_collects_all_above(corpus):
    """_wand_segments(min_score=T) == the exhaustive match set filtered
    to score >= T (modulo the 1e-6 safety margin, which may only ADD
    rows)."""
    idx = corpus
    terms, _ = idx.parse_boosted_query("error tool")
    idf = idx.idf_map(terms)
    full = {int(r["doc_id"]): float(r["score"])
            for r in idx.score_matches("error tool").collect()}
    thr = sorted(full.values(), reverse=True)[len(full) // 3]
    for zone in (False, True):
        if zone:
            idx.exhaustive_cutoff = 0
        try:
            got = {int(r["doc_id"]): float(r["score"])
                   for r in idx._wand_segments(
                       terms, idf, 10, None, min_score=thr).collect()}
        finally:
            if hasattr(idx, "exhaustive_cutoff"):
                del idx.exhaustive_cutoff
        for d, s in full.items():
            if s >= thr:
                assert d in got and got[d] == pytest.approx(s, rel=1e-9)
        for d, s in got.items():
            assert full[d] == pytest.approx(s, rel=1e-9)
            assert s >= thr - 1e-6
