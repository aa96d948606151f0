"""Block-Max WAND generalized to the DisMax combiner
(MultiFieldIndex.wand_matches): rank-identity against the exhaustive
combine across tie/op/mm/boost shapes, on both kernel paths (the
small-segment vectorized pass and the zone path, forced via
exhaustive_cutoff = 0), plus the search() dispatch rules."""

import pytest

from solr_semantic_importer_spark.index.build import BuildConfig
from solr_semantic_importer_spark.query.multifield import (
    build_multi_field_index,
)

CFG = dict(segment_size=64, block_size=16, n_term_buckets=4,
           hot_df_threshold=40, hot_salts=4)


@pytest.fixture(scope="module")
def midx(spark, tmp_path_factory):
    from solr_semantic_importer_spark.sources.transcripts import (
        generate_transcripts,
    )

    df = generate_transcripts(spark, n_convs=60, turns_per_conv=5, seed=53)
    base = str(tmp_path_factory.mktemp("mfw"))
    return build_multi_field_index(
        spark, df, base, fields=("text", "tool"),
        config=BuildConfig(build_id="mfw", **CFG),
    )


SHAPES = [
    dict(q="error tool", qf={"text": 1.0, "tool": 3.0}, tie=0.0),
    dict(q="error tool", qf={"text": 1.0, "tool": 3.0}, tie=0.35),
    dict(q="error tool call", qf={"text": 1.0, "tool": 1.0}, tie=1.0),
    dict(q="tool^4 error", qf="text tool^2.5", tie=0.1),
    dict(q="error tool call", qf={"text": 1.0, "tool": 1.0}, op="AND"),
    dict(q="error tool zzzoov", qf={"text": 1.0, "tool": 1.0}, mm=2),
    dict(q="the error", qf={"text": 2.0}, tie=0.0),  # single field
    dict(q="error", qf={"text": 1.0, "tool": 1.0}, tie=0.5),  # 1 clause
]


def _exhaustive_top(midx, k, q, qf, **kw):
    scored = midx.score_matches(q, qf, **kw)
    return [(r["doc_id"], r["score"])
            for r in midx.primary._finish(
                scored, k, 0, False, "round6", None).collect()]


def _wand_top(midx, k, q, qf, **kw):
    cand = midx.wand_matches(q, qf, k=k, **kw)
    return [(r["doc_id"], r["score"])
            for r in midx.primary._finish(
                cand, k, 0, False, "round6", None).collect()]


def _assert_rank_identical(got, want):
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9), (gd, gs, ws)


@pytest.mark.parametrize("cutoff", [None, 0], ids=["vector", "zones"])
def test_wand_rank_identity(midx, cutoff):
    if cutoff is not None:
        midx.exhaustive_cutoff = cutoff
    try:
        for shape in SHAPES:
            sh = dict(shape)
            q, qf = sh.pop("q"), sh.pop("qf")
            want = _exhaustive_top(midx, 10, q, qf, **sh)
            got = _wand_top(midx, 10, q, qf, **sh)
            _assert_rank_identical(got, want)
    finally:
        if hasattr(midx, "exhaustive_cutoff"):
            del midx.exhaustive_cutoff


def test_search_dispatches_wand_and_matches(midx):
    # default search (no fq/pf/tombstones) = the WAND path; must equal
    # the exhaustive cut, offsets included
    for shape in SHAPES[:4]:
        sh = dict(shape)
        q, qf = sh.pop("q"), sh.pop("qf")
        want = _exhaustive_top(midx, 12, q, qf, **sh)
        got = [(r["doc_id"], r["score"])
               for r in midx.search(q, qf, k=12, **sh).collect()]
        _assert_rank_identical(got, want)
        got_off = [(r["doc_id"], r["score"])
                   for r in midx.search(q, qf, k=5, offset=4, **sh).collect()]
        _assert_rank_identical(got_off, want[4:9])


def test_tombstones_force_exhaustive_and_stay_correct(
        spark, tmp_path_factory):
    from solr_semantic_importer_spark.sources.transcripts import (
        generate_transcripts,
    )

    df = generate_transcripts(spark, n_convs=25, turns_per_conv=4, seed=54)
    base = str(tmp_path_factory.mktemp("mfwt"))
    m = build_multi_field_index(
        spark, df, base, fields=("text", "tool"),
        config=BuildConfig(build_id="mfwt", **CFG),
    )
    qf = {"text": 1.0, "tool": 2.0}
    before = {d for d, _ in _wand_top(m, 50, "error tool", qf)}
    n = m.delete_by_query("role = 'tool'")
    assert n > 0
    got = [(r["doc_id"], r["score"])
           for r in m.search("error tool", qf=qf, k=50).collect()]
    want = _exhaustive_top(m, 50, "error tool", qf)
    _assert_rank_identical(got, want)
    dead = {r["doc_id"] for r in m.primary._tombstones_df().collect()}
    assert not ({d for d, _ in got} & dead)
    assert before & dead  # the delete really removed former candidates
