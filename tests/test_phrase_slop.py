"""Sloppy phrases (Lucene SloppyPhraseQuery ``"a b"~N``) and quoted-phrase
``q`` routing. The slop semantics implemented are Lucene's published
SloppyPhraseScorer behavior: an alignment of the phrase terms matches when
max(pos_j - j) - min(pos_j - j) <= slop, sloppy freq = sum 1/(1+matchLength)
over the greedy pass's matches; BM25 scores the sloppy freq. Match-SET
correctness is verified against an independent brute-force enumeration of
all position alignments (itertools.product), which the greedy pass must
agree with on "does any alignment fit within slop"."""

import itertools

import numpy as np
import pytest

from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import (
    BM25Index,
    sloppy_phrase_freq,
)
from solr_semantic_importer_spark.query.select_api import solr_select

TEXTS = [
    "alpha beta gamma pad pad pad pad pad",        # exact "alpha beta"
    "alpha pad beta gamma pad pad pad pad",        # 1 gap
    "beta alpha gamma pad pad pad pad pad",        # transposed (slop 2)
    "alpha pad pad pad beta gamma pad pad",        # 3 gaps
    "gamma pad alpha pad pad beta pad pad",        # 2 gaps
    "alpha beta pad alpha beta pad pad pad",       # two exact occurrences
    "pad pad pad pad pad pad pad pad",             # no phrase terms
]


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    import pandas as pd
    rows = [
        {"conv_id": f"c{i:03d}", "turn_idx": 0, "role": "user", "text": t,
         "tool": None, "ts": pd.Timestamp(1704067200 + i * 60, unit="s")}
        for i, t in enumerate(TEXTS)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    idx_dir = str(tmp_path_factory.mktemp("slop"))
    build_index(spark, df, idx_dir,
                BuildConfig(build_id="slop", segment_size=4, block_size=4))
    return df, BM25Index(spark, idx_dir)


def _brute_min_window(plists):
    """Independent oracle: the tightest alignment's matchLength over ALL
    position combinations (exhaustive product, no greedy logic shared with
    the implementation)."""
    best = None
    for combo in itertools.product(*plists):
        w = max(combo) - min(combo)
        if best is None or w < best:
            best = w
    return best


def test_sloppy_freq_match_set_vs_brute_force():
    """freq > 0 exactly when SOME alignment fits within slop."""
    rng = np.random.default_rng(7)
    for _ in range(300):
        m = int(rng.integers(2, 4))
        plists = [
            np.unique(rng.integers(0, 20, size=rng.integers(1, 5)))
            for _ in range(m)
        ]
        min_w = _brute_min_window(plists)
        for slop in (0, 1, 2, 3, 5, 10, 25):
            f = sloppy_phrase_freq(plists, slop)
            assert (f > 0) == (min_w <= slop), (
                f"plists={[p.tolist() for p in plists]} slop={slop} "
                f"min_w={min_w} freq={f}"
            )


def test_sloppy_freq_slop0_counts_exact_occurrences():
    """With slop=0 the greedy pass counts exact phrase occurrences, each
    contributing 1.0 (1/(1+0)) -- the PhraseQuery degenerate case."""
    # "alpha beta pad alpha beta": alpha at 0,3; beta(adjusted -1) at 1,4
    f = sloppy_phrase_freq([np.array([0, 3]), np.array([0, 3])], 0)
    assert f == 2.0
    # no exact adjacency
    f2 = sloppy_phrase_freq([np.array([0]), np.array([2])], 0)
    assert f2 == 0.0
    assert sloppy_phrase_freq([np.array([0]), np.array([2])], 2) == pytest.approx(1.0 / 3.0)


def test_slop_match_sets(corpus):
    """Crafted corpus: each slop level admits exactly the documented docs."""
    _, idx = corpus
    want = {
        0: {0, 5},          # exact adjacency only
        1: {0, 1, 5},       # one gap
        2: {0, 1, 2, 4, 5}, # transposition costs 2; doc4 has 2 gaps
        3: {0, 1, 2, 3, 4, 5},
    }
    for slop, docs in want.items():
        got = {
            int(r["doc_id"])
            for r in idx.phrase_matches("alpha beta", slop=slop).collect()
        }
        assert got == docs, f"slop={slop}"


def test_slop0_equals_exact_phrase(corpus):
    """phrase_matches(slop=0) is bit-identical to the exact vectorized
    phrase kernel (different code paths, same semantics)."""
    _, idx = corpus
    a = sorted(
        (int(r["doc_id"]), round(float(r["score"]), 9))
        for r in idx.search_phrase("alpha beta", k=10).collect()
    )
    b = sorted(
        (int(r["doc_id"]), round(float(r["score"]), 9))
        for r in idx.search_phrase("alpha beta", k=10, slop=0).collect()
    )
    assert a == b and a


def test_tighter_match_scores_higher(corpus):
    """Same doc length => sloppier alignments score strictly lower (the
    1/(1+matchLength) slop factor shrinks freq)."""
    _, idx = corpus
    scores = {
        int(r["doc_id"]): float(r["score"])
        for r in idx.search_phrase("alpha beta", k=10, slop=3).collect()
    }
    assert scores[0] > scores[1] > scores[3]  # 0 gaps > 1 gap > 3 gaps


def test_quoted_phrase_q_routing(corpus):
    """search()/count_matches/_matched_ids accept Solr phrase syntax in q."""
    _, idx = corpus
    direct = [
        (int(r["doc_id"]), round(float(r["score"]), 6))
        for r in idx.search_phrase("alpha beta", k=10, slop=1).collect()
    ]
    routed = [
        (int(r["doc_id"]), round(float(r["score"]), 6))
        for r in idx.search('"alpha beta"~1', k=10).collect()
    ]
    assert routed == direct
    assert idx.count_matches('"alpha beta"~1') == 3
    assert idx.count_matches('"alpha beta"') == 2


def test_phrase_q_through_select_facade(corpus):
    """/select with a quoted-phrase q: numFound, docs, facet and field sort
    all operate on the phrase DocSet."""
    _, idx = corpus
    resp = solr_select(idx, {
        "q": '"alpha beta"~2', "rows": 10, "fl": "doc_id,score",
        "facet": "true", "facet.field": "role",
    })
    assert resp["response"]["numFound"] == 5
    ids = [d["doc_id"] for d in resp["response"]["docs"]]
    assert set(ids) == {0, 1, 2, 4, 5}
    assert resp["facet_counts"]["facet_fields"]["role"] == ["user", 5]
    # field sort over the phrase match set
    by_ts = solr_select(idx, {
        "q": '"alpha beta"~2', "rows": 10, "sort": "ts desc", "fl": "doc_id",
    })
    ids2 = [d["doc_id"] for d in by_ts["response"]["docs"]]
    assert ids2 == sorted(ids2, reverse=True)


def test_phrase_q_cursor_walk(corpus):
    """cursorMark pages a phrase q without skips or repeats."""
    _, idx = corpus
    full = [d["doc_id"] for d in solr_select(
        idx, {"q": '"alpha beta"~3', "rows": 10, "fl": "doc_id"}
    )["response"]["docs"]]
    walked, cursor = [], "*"
    while True:
        r = solr_select(idx, {
            "q": '"alpha beta"~3', "rows": 2, "cursorMark": cursor,
            "fl": "doc_id",
        })
        walked.extend(d["doc_id"] for d in r["response"]["docs"])
        if r["nextCursorMark"] == cursor:
            break
        cursor = r["nextCursorMark"]
    assert walked == full


def test_phrase_q_fail_loud_components(corpus):
    """Components that can't honor phrase semantics raise instead of
    silently scoring a bag of words."""
    _, idx = corpus
    with pytest.raises(ValueError, match="phrase"):
        idx.explain('"alpha beta"', [0])
    with pytest.raises(ValueError, match="phrase"):
        idx.search_grouped('"alpha beta"', "role")


def test_one_term_quoted_q(corpus):
    """A quoted single term rewrites to the plain term query (Lucene)."""
    _, idx = corpus
    a = [(int(r["doc_id"]), round(float(r["score"]), 6))
         for r in idx.search('"alpha"', k=10).collect()]
    b = [(int(r["doc_id"]), round(float(r["score"]), 6))
         for r in idx.search("alpha", k=10).collect()]
    assert a == b and a


# ---- mixed term + phrase boolean queries (Lucene BooleanQuery) ----


def test_mixed_q_scores_sum_of_clauses(corpus):
    """score(mixed) = score(term clauses) + score(phrase clause) per doc,
    matching Lucene's BooleanQuery sum-of-SHOULD-clauses."""
    _, idx = corpus
    term_scores = {
        int(r["doc_id"]): float(r["score"])
        for r in idx.score_matches("gamma").collect()
    }
    phrase_scores = {
        int(r["doc_id"]): float(r["score"])
        for r in idx.phrase_matches("alpha beta").collect()
    }
    mixed = {
        int(r["doc_id"]): float(r["score"])
        for r in idx.score_matches('gamma "alpha beta"').collect()
    }
    want = {
        d: term_scores.get(d, 0.0) + phrase_scores.get(d, 0.0)
        for d in set(term_scores) | set(phrase_scores)
    }
    assert set(mixed) == set(want)
    for d in want:
        assert mixed[d] == pytest.approx(want[d], rel=1e-12)


def test_mixed_q_and_mm(corpus):
    """AND requires every clause (term AND phrase); mm counts clauses."""
    _, idx = corpus
    t = {int(r["doc_id"]) for r in idx.score_matches("gamma").collect()}
    p = {int(r["doc_id"]) for r in idx.phrase_matches("alpha beta").collect()}
    got_and = {
        int(r["doc_id"])
        for r in idx.score_matches('gamma "alpha beta"', op="AND").collect()
    }
    assert got_and == (t & p)
    # mm=2 of 3 clauses (two terms + one phrase)
    g = {int(r["doc_id"]) for r in idx.score_matches("gamma").collect()}
    pad = {int(r["doc_id"]) for r in idx.score_matches("pad").collect()}
    got_mm = {
        int(r["doc_id"])
        for r in idx.score_matches('gamma pad "alpha beta"', mm=2).collect()
    }
    want_mm = {
        d for d in (g | pad | p)
        if (d in g) + (d in pad) + (d in p) >= 2
    }
    assert got_mm == want_mm


def test_mixed_q_boosts_and_slop(corpus):
    """Phrase-clause ^boost scales its contribution; ~slop widens it."""
    _, idx = corpus
    base = {
        int(r["doc_id"]): float(r["score"])
        for r in idx.score_matches('gamma "alpha beta"~2').collect()
    }
    boosted = {
        int(r["doc_id"]): float(r["score"])
        for r in idx.score_matches('gamma "alpha beta"~2^3').collect()
    }
    p = {
        int(r["doc_id"]): float(r["score"])
        for r in idx.phrase_matches("alpha beta", slop=2).collect()
    }
    assert set(base) == set(boosted)
    for d, s in base.items():
        assert boosted[d] == pytest.approx(s + 2.0 * p.get(d, 0.0), rel=1e-12)


def test_mixed_q_through_search_and_facade(corpus):
    """Top-k search and /select both honor the mixed clause structure."""
    _, idx = corpus
    full = sorted(
        ((round(float(r["score"]), 6), int(r["doc_id"]))
         for r in idx.score_matches('gamma "alpha beta"').collect()),
        key=lambda x: (-x[0], x[1]),
    )
    topk = [
        (round(float(r["score"]), 6), int(r["doc_id"]))
        for r in idx.search('gamma "alpha beta"', k=3).collect()
    ]
    assert topk == full[:3]
    resp = solr_select(idx, {"q": 'gamma "alpha beta"', "rows": 3,
                             "fl": "doc_id,score"})
    assert resp["response"]["numFound"] == len(full)
    assert [d["doc_id"] for d in resp["response"]["docs"]] == [
        d for _, d in full[:3]
    ]


def test_mixed_q_fail_loud_components(corpus):
    _, idx = corpus
    with pytest.raises(ValueError, match="phrase"):
        idx.explain('gamma "alpha beta"', [0])
    with pytest.raises(ValueError, match="phrase"):
        idx.search_grouped('gamma "alpha beta"', "role")


def test_search_many_with_phrase_queries(corpus):
    """A batch workload mixing term, phrase and mixed queries: each query's
    rows equal its individual search() top-k."""
    _, idx = corpus
    workload = {
        "t": "gamma",
        "p": '"alpha beta"~1',
        "m": 'gamma "alpha beta"',
    }
    batch = idx.search_many(workload, k=5)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append(
            (int(r["rank"]), int(r["doc_id"]), round(float(r["score"]), 6))
        )
    for qid, qs in workload.items():
        want = [
            (i + 1, int(r["doc_id"]), round(float(r["score"]), 6))
            for i, r in enumerate(idx.search(qs, k=5).collect())
        ]
        assert sorted(got.get(qid, [])) == want, qid
