"""Cross-document exact-substring duplicate spans (ExactSubstr dedup).

Brute-force Python oracle + DuckDB SQL parity + span-removal semantics +
the 100 TB plan shape (shuffles keyed on the shingle hash, never the
text; duplicated-hash membership via LEFT SEMI)."""

import re

import duckdb
import pytest

from solr_semantic_importer_spark.operators.exact_substring import (
    duplicate_positions,
    duplicate_span_report,
    duplicate_span_report_sql,
    remove_duplicate_spans,
)

L = 4

A = "alpha beta gamma delta epsilon zeta"          # 6 tokens, cross-doc
B = "one two three four five"                      # 5 tokens, cross-doc
C = "red green blue yellow purple"                 # within-doc only

DOCS = [
    (0, f"intro words here {A} closing remarks now"),
    (1, f"different opening then {A} and unrelated tail tokens"),
    (2, f"{A} filler middle piece {A}"),            # both occurrences flagged
    (3, f"{B} pause again {B}"),                    # cross-doc via doc 4
    (4, f"xx yy {A} zz qq {B} mm"),                 # two separate spans
    (5, "tiny doc"),                                # < L tokens
    (6, ""),
    (7, None),
    (8, f"{C} gap {C}"),                            # within ONE doc: not dup
]


def _toks(t):
    return re.findall(r"[a-z0-9]+", (t or "").lower())


def _brute(min_doc_count=2):
    toks = {i: _toks(t) for i, t in DOCS}
    occ = {}
    for i, ts in toks.items():
        for p in range(len(ts) - L + 1):
            occ.setdefault(" ".join(ts[p:p + L]), set()).add(i)
    dup = {s for s, ids in occ.items() if len(ids) >= min_doc_count}
    out = {}
    for i, ts in toks.items():
        pos = [p for p in range(len(ts) - L + 1)
               if " ".join(ts[p:p + L]) in dup]
        if not pos:
            continue
        covered = {c for p in pos for c in range(p, p + L)}
        spans = sum(
            1 for j, p in enumerate(pos) if j == 0 or p > pos[j - 1] + L
        )
        out[i] = (len(ts), len(covered), spans,
                  len(covered) * 1000 // len(ts), covered)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_report_matches_brute_force(docs):
    want = {i: v[:4] for i, v in _brute().items()}
    got = {
        r["id"]: (r["n_tokens"], r["dup_tokens"], r["n_spans"],
                  r["dup_frac_milli"])
        for r in duplicate_span_report(docs, "doc_id", "text", L).collect()
    }
    assert got == want
    # structure asserts the corpus was crafted to exercise:
    assert 8 not in got            # within-doc repeat alone never flags
    assert 3 in got                # ...but doc 4 sharing B flags doc 3
    assert got[4][2] == 2          # two separate spans in doc 4
    assert got[2][2] == 2          # both in-doc occurrences of A flagged


def test_min_doc_count_prunes(docs):
    # A appears in docs 0,1,2,4 (4 docs); B in 3,4 (2 docs): at
    # min_doc_count=3 only the A spans survive
    got = {
        r["id"]: r["n_spans"]
        for r in duplicate_span_report(
            docs, "doc_id", "text", L, min_doc_count=3
        ).collect()
    }
    want = {i: v[2] for i, v in _brute(min_doc_count=3).items()}
    assert got == want
    assert 3 not in got and got[4] == 1


def test_remove_duplicate_spans(docs):
    brute = _brute()
    rows = {r["id"]: r for r in
            remove_duplicate_spans(docs, "doc_id", "text", L).collect()}
    assert set(rows) == {i for i, _ in DOCS}   # every doc comes back
    for i, t in DOCS:
        ts = _toks(t)
        covered = brute.get(i, (0, 0, 0, 0, set()))[4]
        want = " ".join(tok for p, tok in enumerate(ts) if p not in covered)
        assert rows[i]["clean_text"] == want, i
        assert rows[i]["removed_tokens"] == len(covered)
        assert rows[i]["n_tokens"] == len(ts)
    # unflagged docs keep their full normalized stream
    assert rows[8]["clean_text"] == " ".join(_toks(DOCS[8][1]))


def test_duckdb_oracle_parity(docs):
    src = "SELECT * FROM (VALUES {}) AS t(doc_id, text)".format(
        ", ".join(f"({i}, {repr(t) if t is not None else 'NULL'})"
                  for i, t in DOCS))
    sql = duplicate_span_report_sql(src, "doc_id", "text", L)
    want = {int(r[0]): (int(r[1]), int(r[2]), int(r[3]), int(r[4]))
            for r in duckdb.connect().execute(sql).fetchall()}
    got = {
        r["id"]: (r["n_tokens"], r["dup_tokens"], r["n_spans"],
                  r["dup_frac_milli"])
        for r in duplicate_span_report(docs, "doc_id", "text", L).collect()
    }
    assert got == want


def test_plan_shuffles_hash_not_text(docs):
    plan = duplicate_positions(docs, "doc_id", "text", L)._jdf \
        .queryExecution().executedPlan().toString()
    # the duplicated-hash membership is a semi join on the 60-bit hash;
    # every exchange is keyed on h (8 bytes) -- the text never shuffles
    assert "LeftSemi" in plan
    assert "hashpartitioning(h#" in plan
    assert "hashpartitioning(text" not in plan
