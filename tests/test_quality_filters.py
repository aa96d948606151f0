"""C4 line-level cleaning + Gopher document quality gates.

Brute-force Python oracle on crafted texts covering every rule branch,
DuckDB-twin parity on the same texts AND on the real documents table,
plus a plan assertion that the report is shuffle-free."""

import re
from typing import Optional

import duckdb
import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.operators import quality_filters as QF

TEXTS = [
    (0, "This line ends with a period.\nshort.\nno terminal punct here\n"
        "Another proper sentence right here!\nIs this a question?\n"
        "A fifth full sentence for the count.\nAnd one more to be safe."),
    (1, "Enable javascript to view this page.\nA plain sentence stands here.\n"
        "Second plain sentence is fine.\nThird plain sentence is fine.\n"
        "Fourth plain sentence is fine.\nFifth plain sentence is fine."),
    (2, "Contains lorem ipsum dolor sit amet.\nGood line number one stays.\n"
        "Good line number two stays.\nGood line number three stays.\n"
        "Good line number four stays.\nGood line number five stays."),
    (3, "var x = { key: 1 };\nReal sentence one is here.\n"
        "Real sentence two is here.\nReal sentence three is here.\n"
        "Real sentence four is here.\nReal sentence five is here."),
    (4, ""),
    (5, None),
    (6, "Only two kept lines survive here.\nThe second kept line is this one."),
    (7, "- bullet one\n- bullet two\n- bullet three\nplain tail line"),
    (8, "the cat sat on the mat and that dog ran off with the hat "
        "to be near a tree of green leaves that have grown tall " * 3),
    (9, "trailing off like this...\nand again it trails...\n"
        "a normal closing line."),
    (10, "#### #### #### ####"),
    (11, "???? !!!! @@@@ %%%%"),
]


def _lines(t):
    return [x.strip() for x in (t or "").split("\n") if x.strip()]


def _words(t):
    t = (t or "").strip()
    return t.split() if t else []


def _c4_clean(t, min_words=3):
    out = []
    for l in _lines(t):
        if (l[-1] in QF._C4_TERMINALS and len(l.split()) >= min_words
                and not re.search(r"\bjavascript\b", l.lower())):
            out.append(l)
    return "\n".join(out)


def _c4_keep(t, cleaned, min_lines=5, blocklist=()):
    raw = (t or "").lower()
    if len(_lines(cleaned)) < min_lines or "lorem ipsum" in raw or "{" in raw:
        return False
    return not any(re.search(r"\b" + w.lower() + r"\b", raw) for w in blocklist)


def _gopher_signals(t):
    words, lines = _words(t), _lines(t)
    nw, nl = len(words), len(lines)
    low = (t or "").lower()
    sig = {
        "word_count": nw,
        "mean_word_len": sum(len(w) for w in words) / nw if nw else 0.0,
        "symbol_word_ratio": (
            (low.count("#") + len(re.findall(r"\.{3,}|…", low))) / nw
            if nw else 0.0
        ),
        "bullet_line_frac": (
            sum(l[0] in "-*•" for l in lines) / nl if nl else 0.0
        ),
        "ellipsis_line_frac": (
            sum(bool(re.search(r"(\.{3}|…)$", l)) for l in lines) / nl
            if nl else 0.0
        ),
        "alpha_word_frac": (
            sum(bool(re.search(r"[A-Za-z]", w)) for w in words) / nw
            if nw else 0.0
        ),
        "stop_hits": len(
            set(re.findall(r"[a-z0-9]+", low)) & set(QF.GOPHER_STOPWORDS)
        ),
    }
    return sig


def _gopher_keep(sig, min_words=50):
    return (
        min_words <= sig["word_count"] <= 100_000
        and 3.0 <= sig["mean_word_len"] <= 10.0
        and sig["symbol_word_ratio"] <= 0.1
        and sig["bullet_line_frac"] <= 0.9
        and sig["ellipsis_line_frac"] <= 0.3
        and sig["alpha_word_frac"] >= 0.8
        and sig["stop_hits"] >= 2
    )


@pytest.fixture(scope="module")
def crafted(spark):
    return spark.createDataFrame(TEXTS, "doc_id int, text string")


def test_c4_clean_and_keep_vs_bruteforce(crafted):
    rows = QF.quality_report(crafted, "text").orderBy("doc_id").collect()
    for r in rows:
        t = dict(TEXTS)[r["doc_id"]]
        cleaned = _c4_clean(t)
        assert r["c4_text"] == cleaned, (r["doc_id"], r["c4_text"], cleaned)
        assert r["c4_keep"] == _c4_keep(t, cleaned), r["doc_id"]
    # doc 0 keeps 5 terminal-punct 3+-word lines; 1 has javascript line
    # dropped but still >=5; 2/3 die on lorem ipsum / brace; 6 under min_lines
    keep = {r["doc_id"]: r["c4_keep"] for r in rows}
    assert keep[0] and keep[1]
    assert not keep[2] and not keep[3] and not keep[4] and not keep[6]


def test_c4_blocklist_metachar_word(spark):
    # a blocklist entry is a literal word: regex metachars must not break
    # the pattern or over-match
    df = spark.createDataFrame(
        [(0, "They wrote c++ for a living there.\n" * 5),
         (1, "They wrote crust for a living there.\n" * 5)],
        "doc_id int, text string")
    rep = QF.quality_report(df, "text", c4_blocklist=("c++",))
    keep = {r["doc_id"]: r["c4_keep"] for r in rep.collect()}
    assert not keep[0] and keep[1]
    # DuckDB twin agrees
    import duckdb
    con = duckdb.connect()
    clean = QF.c4_clean_lines_sql("text")
    got = con.execute(
        f"SELECT {QF.c4_keep_doc_sql('text', clean, blocklist=('c++',))} "
        f"FROM (SELECT ? AS text)",
        ["They wrote c++ for a living there.\n" * 5]).fetchone()[0]
    assert got is False


def test_c4_blocklist(crafted):
    rep = QF.quality_report(crafted, "text", c4_blocklist=("question",))
    keep = {r["doc_id"]: r["c4_keep"] for r in rep.collect()}
    assert not keep[0]  # doc 0 contains the word "question"
    assert keep[1]


def test_gopher_signals_vs_bruteforce(crafted):
    rows = QF.quality_report(crafted, "text").orderBy("doc_id").collect()
    for r in rows:
        t = dict(TEXTS)[r["doc_id"]]
        want = _gopher_signals(t)
        got = r["gopher"].asDict()
        for k, v in want.items():
            assert got[k] == pytest.approx(v), (r["doc_id"], k, got[k], v)
        assert r["gopher_keep"] == _gopher_keep(want), r["doc_id"]
    keep = {r["doc_id"]: r["gopher_keep"] for r in rows}
    assert keep[8]          # long stopword-rich prose
    assert not keep[10]     # all-symbol words
    assert not keep[6]      # under 50 words


def test_gopher_thresholds_kwargs(crafted):
    rep = QF.quality_report(crafted, "text", min_words=5)
    keep = {r["doc_id"]: r["gopher_keep"] for r in rep.collect()}
    assert keep[0]          # 36 words, passes with the lowered gate
    with pytest.raises(TypeError):
        QF.quality_report(crafted, "text", bogus_threshold=1)


def test_apply_quality_filters(crafted):
    both = QF.apply_quality_filters(crafted, "text", rule="both",
                                    min_words=5)
    got = {r["doc_id"]: r["text"] for r in both.collect()}
    # doc 1 passes C4 but fails Gopher's >=2-stopword gate (only "to")
    assert set(got) == {0}
    assert got[0] == _c4_clean(dict(TEXTS)[0])  # cleaned text flows out
    assert both.columns == crafted.columns
    with pytest.raises(ValueError, match="rule"):
        QF.apply_quality_filters(crafted, "text", rule="c5")


def test_duckdb_twins_on_crafted_and_documents(spark, crafted, sf_dir):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id int, text varchar)")
    con.executemany("INSERT INTO t VALUES (?, ?)", TEXTS)
    con.execute(
        f"CREATE VIEW docs AS SELECT doc_id, text "
        f"FROM read_parquet('{sf_dir}/documents.parquet') "
        f"ORDER BY doc_id LIMIT 200"
    )
    docs_df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").orderBy("doc_id").limit(200)
    )
    for name, df in (("t", crafted), ("docs", docs_df)):
        clean_sql = QF.c4_clean_lines_sql("text")
        sig_sql = QF.gopher_signals_sql("text")
        duck = con.execute(
            f"SELECT {clean_sql} AS c4_text, "
            f"{QF.c4_keep_doc_sql('text', clean_sql)} AS c4_keep, "
            + ", ".join(f"{v} AS {k}" for k, v in sig_sql.items())
            + f", {QF.gopher_keep_sql('text')} AS gopher_keep FROM {name}"
        ).fetchall()
        rep = QF.quality_report(df, "text").select(
            "c4_text", "c4_keep", "gopher.*", "gopher_keep"
        ).collect()
        key = lambda r: (r[0], r[1], *[round(float(x), 9) for x in r[2:8]], r[8], r[9])
        assert sorted(map(key, duck)) == sorted(map(key, rep)), name


def test_report_is_shuffle_free(crafted):
    plan = QF.quality_report(crafted, "text")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
