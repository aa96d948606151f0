"""edismax pf/pf2/pf3 phrase boosting on the qf multi-field path.

The boost relation is cross-checked against a composition of two surfaces
that are independently oracle-tested elsewhere: the main DisMax score
(:meth:`MultiFieldIndex.score_matches`, brute-forced in
test_multifield_qf.py) plus each (field, window)'s
:meth:`BM25Index.phrase_matches` (DuckDB-oracled via the phrase rows of the
driver gate) -- so these tests pin the pf-specific parts: window
construction, per-field re-analysis, ^boost weighting, slop defaults,
DocSet invariance, and the facade dispatch.
"""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig
from solr_semantic_importer_spark.query.multifield import (
    build_multi_field_index,
)
from solr_semantic_importer_spark.query.select_api import solr_select

CFG = dict(segment_size=64, block_size=16, n_term_buckets=4,
           hot_df_threshold=40, hot_salts=4)


@pytest.fixture(scope="module")
def midx(spark, tmp_path_factory):
    from solr_semantic_importer_spark.sources.transcripts import (
        generate_transcripts,
    )

    df = generate_transcripts(spark, n_convs=50, turns_per_conv=5, seed=47)
    base = str(tmp_path_factory.mktemp("mfpf"))
    return build_multi_field_index(
        spark, df, base, fields=("text", "tool"),
        config=BuildConfig(build_id="mfpf", **CFG),
    )


@pytest.fixture(scope="module")
def bigram(midx):
    """Two consecutive words from a real doc so pf windows actually hit."""
    row = midx.primary.docs().filter("text is not null").orderBy(
        "doc_id").first()
    words = row["text"].split()
    assert len(words) >= 3
    return words[0], words[1], words[2]


def _scores(df):
    return {r["doc_id"]: r["score"] for r in df.collect()}


def _compose(midx, query, qf, windows, k):
    """Reference: main DisMax + sum of (field, window, boost, slop)
    phrase_matches contributions, top-k under the canonical order."""
    main = _scores(midx.score_matches(query, qf))
    for fld, phrase, boost, slop in windows:
        for d, s in _scores(
                midx.engines[fld].phrase_matches(phrase, slop=slop)).items():
            if d in main:
                main[d] += boost * s
    top = sorted(main.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:k]
    return top


def _got(midx, *a, **kw):
    return [(r["doc_id"], r["score"]) for r in midx.search(*a, **kw).collect()]


def _assert_rank_identical(got, want):
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9), (gd, gs, ws)


def test_pf_whole_query_phrase(midx, bigram):
    w1, w2, _ = bigram
    q = f"{w1} {w2}"
    qf = {"text": 1.0, "tool": 2.0}
    got = _got(midx, q, qf=qf, k=10, pf={"text": 3.0})
    want = _compose(midx, q, qf, [("text", q, 3.0, 0)], 10)
    _assert_rank_identical(got, want)
    # and the boost actually moved something: some doc gained score
    base = dict(_got(midx, q, qf=qf, k=10))
    assert any(s > base.get(d, -1.0) for d, s in got)


def test_pf2_pf3_windows(midx, bigram):
    w1, w2, w3 = bigram
    q = f"{w1} {w2} {w3}"
    qf = {"text": 1.0}
    got = _got(midx, q, qf=qf, k=10, pf2={"text": 2.0}, pf3={"text": 5.0})
    windows = [
        ("text", f"{w1} {w2}", 2.0, 0),
        ("text", f"{w2} {w3}", 2.0, 0),
        ("text", f"{w1} {w2} {w3}", 5.0, 0),
    ]
    want = _compose(midx, q, qf, windows, 10)
    _assert_rank_identical(got, want)


def test_ps_slop_and_defaults(midx, bigram):
    w1, w2, w3 = bigram
    # reversed word order: only a sloppy phrase can match it
    q = f"{w2} {w1}"
    qf = {"text": 1.0}
    got = _got(midx, q, qf=qf, k=10, pf={"text": 4.0}, ps=2)
    want = _compose(midx, q, qf, [("text", q, 4.0, 2)], 10)
    _assert_rank_identical(got, want)
    # ps2 defaults to ps (Solr): explicit ps2=ps must equal the default
    q3 = f"{w1} {w2} {w3}"
    a = _got(midx, q3, qf=qf, k=10, pf2={"text": 2.0}, ps=1)
    b = _got(midx, q3, qf=qf, k=10, pf2={"text": 2.0}, ps=1, ps2=1)
    assert a == b
    c = _got(midx, q3, qf=qf, k=10, pf2={"text": 2.0}, ps=1, ps2=0)
    want_c = _compose(
        midx, q3, qf,
        [("text", f"{w1} {w2}", 2.0, 0), ("text", f"{w2} {w3}", 2.0, 0)], 10)
    _assert_rank_identical(c, want_c)


def test_clause_boosts_stripped_from_phrases(midx, bigram):
    w1, w2, _ = bigram
    qf = {"text": 1.0}
    got = _got(midx, f"{w1}^3 {w2}", qf=qf, k=10, pf={"text": 2.0})
    want = _compose(midx, f"{w1}^3 {w2}", qf,
                    [("text", f"{w1} {w2}", 2.0, 0)], 10)
    _assert_rank_identical(got, want)


def test_docset_invariant_under_pf(midx, bigram):
    w1, w2, _ = bigram
    q = f"{w1} {w2}"
    qf = {"text": 1.0, "tool": 1.0}
    n = midx.count_matches(q, qf)
    with_pf = {d for d, _ in _got(midx, q, qf=qf, k=n + 10,
                                  pf={"text": 9.0}, pf2={"tool": 2.0})}
    without = {d for d, _ in _got(midx, q, qf=qf, k=n + 10)}
    assert with_pf == without and len(without) == n


def test_pf_noop_cases(midx, bigram):
    w1, _, _ = bigram
    qf = {"text": 1.0}
    # single-word query: no window of length >=2 exists, pf is a no-op
    assert _got(midx, w1, qf=qf, k=5, pf={"text": 5.0}) == _got(
        midx, w1, qf=qf, k=5)
    # pf3 with a 2-word query is a no-op too
    q = f"{w1} error"
    assert _got(midx, q, qf=qf, k=5, pf3={"text": 5.0}) == _got(
        midx, q, qf=qf, k=5)


def test_pf_validation(midx, bigram):
    w1, w2, _ = bigram
    with pytest.raises(ValueError, match="pf fields not in this index"):
        midx.search(f"{w1} {w2}", qf={"text": 1.0}, pf={"nope": 1.0})
    with pytest.raises(ValueError, match="malformed"):
        midx.search(f"{w1} {w2}", qf={"text": 1.0}, pf="text^^2")


def test_facade_qf_pf(midx, bigram):
    w1, w2, _ = bigram
    q = f"{w1} {w2}"
    base = solr_select(midx, {"q": q, "qf": "text tool^2",
                              "defType": "edismax", "rows": 5,
                              "fl": "doc_id,score"})
    boosted = solr_select(midx, {"q": q, "qf": "text tool^2",
                                 "defType": "edismax", "rows": 5,
                                 "pf": "text^3", "ps": "1",
                                 "fl": "doc_id,score"})
    assert boosted["response"]["numFound"] == base["response"]["numFound"]
    want = _compose(midx, q, {"text": 1.0, "tool": 2.0},
                    [("text", q, 3.0, 1)], 5)
    got = [(d["doc_id"], d["score"]) for d in boosted["response"]["docs"]]
    _assert_rank_identical(got, want)
    # param coherence still enforced on this path
    with pytest.raises(ValueError, match="require defType=edismax"):
        solr_select(midx, {"q": q, "qf": "text", "pf": "text"})
    with pytest.raises(ValueError, match="ps2 requires pf2"):
        solr_select(midx, {"q": q, "qf": "text", "defType": "edismax",
                           "ps2": "1"})
