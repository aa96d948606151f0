"""edismax qf multi-field DisMax vs a brute-force reference: per-field
BM25 with per-field df/dl/avgdl and analysis chains, tie combining,
qf/clause boosts, op/mm clause semantics, fq, tombstones."""

import math
import re

import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark import B, K1
from solr_semantic_importer_spark.functions.analysis import QUERY_ANALYZERS
from solr_semantic_importer_spark.functions.stemmer import porter_stem
from solr_semantic_importer_spark.index.build import BuildConfig
from solr_semantic_importer_spark.query.multifield import (
    MultiFieldIndex,
    build_multi_field_index,
    parse_qf,
)

CFG = dict(segment_size=64, block_size=16, n_term_buckets=4,
           hot_df_threshold=40, hot_salts=4)


@pytest.fixture(scope="module")
def midx(spark, tmp_path_factory):
    from solr_semantic_importer_spark.sources.transcripts import (
        generate_transcripts,
    )

    df = generate_transcripts(spark, n_convs=50, turns_per_conv=5, seed=47)
    base = str(tmp_path_factory.mktemp("mf"))
    return build_multi_field_index(
        spark, df, base, fields=("text", "tool"),
        config=BuildConfig(build_id="mf", **CFG),
    )


def _brute(midx, query, qf, tie=0.0, op="OR", mm=None, fq_role=None):
    """Reference DisMax from the stored docs tables, via each field's
    query analyzer -- engine-independent arithmetic."""
    docs = {r["doc_id"]: r.asDict()
            for r in midx.primary.docs().collect()}
    analyzers = {f: QUERY_ANALYZERS[e._finalize_metrics.get("analyzer",
                                                            "text_general")]
                 for f, e in midx.engines.items()}
    # per-field stats from raw field text under that field's chain
    field_toks = {
        f: {d: analyzers[f](row.get(f) or "") for d, row in docs.items()}
        for f in qf
    }
    stats = {}
    for f in qf:
        tf = {d: {} for d in docs}
        for d, toks in field_toks[f].items():
            for t in toks:
                tf[d][t] = tf[d].get(t, 0) + 1
        dl = {d: len(toks) for d, toks in field_toks[f].items()}
        n = len(docs)
        avgdl = sum(dl.values()) / n if n else 0.0
        df_ = {}
        for d in docs:
            for t in tf[d]:
                df_[t] = df_.get(t, 0) + 1
        stats[f] = (tf, dl, avgdl, df_, n)
    clauses = []
    for tok in query.split():
        m = re.search(r"\^(\d+(?:\.\d+)?)$", tok)
        cb = float(m.group(1)) if m else 1.0
        clauses.append((tok[: m.start()] if m else tok, cb))
    out = {}
    for d, row in docs.items():
        if fq_role is not None and row["role"] != fq_role:
            continue
        total, matched = 0.0, 0
        for text, cb in clauses:
            per_field = []
            for f, fb in qf.items():
                tf, dl, avgdl, df_, n = stats[f]
                s = 0.0
                hit = False
                for t in analyzers[f](text):
                    if t not in df_ or t not in tf[d]:
                        continue
                    hit = True
                    idf = math.log(1.0 + (n - df_[t] + 0.5) / (df_[t] + 0.5))
                    x = tf[d][t]
                    s += fb * cb * idf * x * (K1 + 1.0) / (
                        x + K1 * (1.0 - B + B * dl[d] / avgdl)
                    )
                if hit:
                    per_field.append(s)
            if per_field:
                matched += 1
                mx = max(per_field)
                total += mx + tie * (sum(per_field) - mx)
        live = sum(
            1 for text, _ in clauses
            if any(t in stats[f][3] for f in qf for t in analyzers[f](text))
        )
        need = live if op == "AND" else (mm or 1)
        if matched >= need and matched > 0 and (op != "AND" or matched == live):
            out[d] = total
    return out


def _top(d, k):
    return sorted(d.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:k]


def _got(midx, *a, **kw):
    return [(r["doc_id"], r["score"])
            for r in midx.search(*a, **kw).collect()]


def _assert_rank_identical(got, want):
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9), (gd, gs, ws)


@pytest.mark.parametrize("tie", [0.0, 0.35, 1.0])
def test_dismax_matches_brute(midx, tie):
    qf = {"text": 1.0, "tool": 3.0}
    want = _top(_brute(midx, "tool error", qf, tie=tie), 10)
    got = _got(midx, "tool error", qf=qf, tie=tie, k=10)
    _assert_rank_identical(got, want)


def test_qf_string_and_clause_boosts(midx):
    qf = parse_qf("text tool^2.5")
    assert qf == {"text": 1.0, "tool": 2.5}
    want = _top(_brute(midx, "tool^4 error", qf, tie=0.1), 12)
    got = _got(midx, "tool^4 error", qf="text tool^2.5", tie=0.1, k=12)
    _assert_rank_identical(got, want)


def test_and_mm_fq(midx):
    qf = {"text": 1.0, "tool": 1.0}
    want = _top(_brute(midx, "tool error call", qf, op="AND"), 10)
    got = _got(midx, "tool error call", qf=qf, op="AND", k=10)
    _assert_rank_identical(got, want)
    want = _top(_brute(midx, "tool error rare01533", qf, mm=2), 10)
    got = _got(midx, "tool error rare01533", qf=qf, mm=2, k=10)
    _assert_rank_identical(got, want)
    want = _top(_brute(midx, "tool error", qf, fq_role="tool"), 8)
    got = _got(midx, "tool error", qf=qf, fq="role:tool", k=8)
    _assert_rank_identical(got, want)


def test_tie_zero_vs_one_bracket_single_field(midx):
    # tie=1 degenerates to the SUM over fields; a single-field qf must
    # equal the plain engine's scores exactly on matching docs
    got = _got(midx, "error call", qf={"text": 1.0}, k=10)
    single = [(r["doc_id"], r["score"])
              for r in midx.engines["text"]
              .search("error call", k=10, use_cache=False).collect()]
    _assert_rank_identical(got, single)


def test_oov_and_edge_cases(midx):
    qf = {"text": 1.0, "tool": 1.0}
    # fully-OOV clause empties AND, counts for mm
    assert _got(midx, "error zzznope", qf=qf, op="AND", k=5) == []
    assert _got(midx, "zzznope", qf=qf, k=5) == []
    assert _got(midx, "", qf=qf, k=5) == []
    with pytest.raises(ValueError, match="not in this index family"):
        midx.search("x", qf={"nope": 1.0})
    with pytest.raises(ValueError, match="tie"):
        midx.search("x", qf={"text": 1.0}, tie=1.5)
    with pytest.raises(ValueError, match="malformed"):
        parse_qf("text^^2")
    with pytest.raises(ValueError, match="duplicate"):
        parse_qf("text text^2")


def test_per_field_analyzers(spark, tmp_path_factory):
    """A text_en field stems its side of the dismax while text_general
    does not -- the clause is re-analyzed per field (Lucene behavior)."""
    rows = [
        ("c0", 0, "user", "running tables quickly", "alpha runner", None),
        ("c0", 1, "user", "the run table", "beta", None),
        ("c1", 0, "user", "runner runs", "running", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    base = str(tmp_path_factory.mktemp("mfa"))
    m = build_multi_field_index(
        spark, df, base, fields=("text", "tool"),
        config=BuildConfig(build_id="mfa", **CFG),
        analyzers={"text": "text_en"},
    )
    assert porter_stem("running") == "run"
    got = {d for d, _ in _got(m, "running", qf={"text": 1.0, "tool": 1.0},
                              k=10)}
    # text side stems running->run: docs 0 ("running") and 1 ("run") match
    # via text; doc 2 matches via tool ("running" unstemmmed) AND text
    assert got == {0, 1, 2}
    got_tool_only = {d for d, _ in _got(m, "running", qf={"tool": 1.0}, k=10)}
    assert got_tool_only == {2}


def test_select_facade_qf(midx):
    from solr_semantic_importer_spark.query.select_api import solr_select

    resp = solr_select(midx, {
        "defType": "edismax", "q": "tool error", "qf": "text tool^3",
        "tie": 0.2, "rows": 5, "fl": "conv_id,role,score",
    })
    want = _top(_brute(midx, "tool error",
                       {"text": 1.0, "tool": 3.0}, tie=0.2), 5)
    docs = resp["response"]["docs"]
    assert [pytest.approx(w[1], rel=1e-9) for w in want] == [
        d["score"] for d in docs]
    assert set(docs[0]) == {"doc_id", "score", "conv_id", "role"}
    assert resp["response"]["numFound"] == len(
        _brute(midx, "tool error", {"text": 1.0, "tool": 3.0}, tie=0.2))
    assert resp["response"]["numFoundExact"] is True
    # score absent unless fl asks for it
    r2 = solr_select(midx, {"defType": "edismax", "q": "error",
                            "qf": "text", "rows": 2})
    assert "score" not in r2["response"]["docs"][0]


def test_select_facade_qf_fail_loud(midx, spark, tmp_path):
    from solr_semantic_importer_spark.index.build import build_index
    from solr_semantic_importer_spark.query.engine import BM25Index
    from solr_semantic_importer_spark.query.select_api import solr_select
    from solr_semantic_importer_spark.sources.transcripts import (
        generate_transcripts,
    )

    base = {"defType": "edismax", "q": "error", "qf": "text"}
    with pytest.raises(ValueError, match="defType=edismax"):
        solr_select(midx, {"q": "error", "qf": "text"})
    with pytest.raises(ValueError, match="tie requires qf"):
        solr_select(midx, {"defType": "edismax", "q": "error", "tie": 0.1})
    with pytest.raises(ValueError, match="not supported with qf"):
        solr_select(midx, {**base, "facet": "true", "facet.field": "role"})
    with pytest.raises(ValueError, match="not supported with qf"):
        solr_select(midx, {**base, "cursorMark": "*"})
    with pytest.raises(ValueError, match="relevance sort"):
        solr_select(midx, {**base, "sort": "conv_id asc"})
    with pytest.raises(ValueError, match="term query"):
        solr_select(midx, {**base, "q": "*:*"})
    # a single-field handle has no per-field postings to dismax over
    df = generate_transcripts(spark, n_convs=5, turns_per_conv=2, seed=3)
    d = str(tmp_path / "single")
    build_index(spark, df, d, BuildConfig(build_id="s", **CFG))
    with pytest.raises(ValueError, match="multi-field index family"):
        solr_select(BM25Index(spark, d), base)


def test_delete_and_reopen(midx, spark):
    before = _got(midx, "tool error", qf={"text": 1.0, "tool": 1.0}, k=10)
    n = midx.delete_by_query(f"doc_id = {before[0][0]}")
    assert n == 1
    after = _got(midx, "tool error", qf={"text": 1.0, "tool": 1.0}, k=10)
    assert before[0][0] not in {d for d, _ in after}
    assert [d for d, _ in after[:3]] == [d for d, _ in before[1:4]]
    # a fresh handle over the same dir sees fields.json + tombstones
    m2 = MultiFieldIndex(spark, midx.base_dir)
    assert m2.fields == ["text", "tool"]
    again = _got(m2, "tool error", qf={"text": 1.0, "tool": 1.0}, k=10)
    assert again == after


def test_stored_fields_and_offset(midx):
    full = midx.search("tool error", qf={"text": 1.0, "tool": 1.0}, k=6,
                       fl=["role", "conv_id"])
    rows = full.collect()
    assert set(full.columns) == {"doc_id", "score", "role", "conv_id"}
    page2 = _got(midx, "tool error", qf={"text": 1.0, "tool": 1.0},
                 k=3, offset=3)
    assert [d for d, _ in page2] == [r["doc_id"] for r in rows[3:6]]


def test_one_exchange_combine_plan(spark, tmp_path_factory):
    """The DisMax combine is ONE shuffle: kernel output repartitioned by
    doc_id satisfies every downstream grouping ((clause,fld,doc) ->
    (clause,doc) -> (doc)), so Catalyst inserts no further Exchange.
    Fresh (tombstone-free) family: deletes add an anti-join whose
    tiny-side exchanges would muddy the count."""
    from solr_semantic_importer_spark.sources.transcripts import (
        generate_transcripts,
    )

    df = generate_transcripts(spark, n_convs=10, turns_per_conv=3, seed=11)
    base = str(tmp_path_factory.mktemp("mfplan"))
    m = build_multi_field_index(
        spark, df, base, fields=("text", "tool"),
        config=BuildConfig(build_id="mfplan", **CFG),
    )
    scored = m.score_matches(
        "tool_3^2 error table", qf={"text": 1.0, "tool": 2.0}, tie=0.3
    )
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
