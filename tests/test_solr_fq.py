"""Solr/Lucene fq syntax -> SQL translation (functions/solr_fq.py) and its
engine integration: the reference configures source filters as raw Solr fq
strings (application-test.yml: ``-id:*.csv``, ``title:*``) and sends one fq
param per filter (HttpSolrSelectClientImpl.java createSolrRequest), so
BM25Index must accept that syntax and AND'd fq lists."""

import duckdb
import pytest
from pyspark.sql import functions as F

from solr_semantic_importer_spark.functions.solr_fq import (
    looks_like_solr_fq,
    parse_fq,
)
from solr_semantic_importer_spark.index.build import BuildConfig, build_index
from solr_semantic_importer_spark.query.engine import BM25Index
from solr_semantic_importer_spark.sources.transcripts import generate_transcripts

TYPES = {"id": "string", "title": "string", "role": "string",
         "tool": "string", "turn_idx": "int"}


def test_translation_shapes():
    assert parse_fq("title:*", TYPES) == "(title IS NOT NULL)"
    assert parse_fq("role:user", TYPES) == "(role = 'user')"
    assert parse_fq('role:"tool output"', TYPES) == "(role = 'tool output')"
    assert parse_fq("-id:*.csv", TYPES) == "((((id LIKE '%.csv')) IS NOT TRUE))"
    assert parse_fq("turn_idx:[3 TO 5]", TYPES) == \
        "(turn_idx >= 3 AND turn_idx <= 5)"
    assert parse_fq("turn_idx:{3 TO *}", TYPES) == "(turn_idx > 3)"
    assert parse_fq("*:*", TYPES) == "(TRUE)"
    # escaped wildcard stays literal; ? -> _ with literal _ escaped
    assert parse_fq(r"id:foo\*bar", TYPES) == "(id = 'foo*bar')"
    assert parse_fq("id:data_?.csv", TYPES) == r"(id LIKE 'data\__.csv')"
    # boolean combinations
    assert parse_fq("role:user AND tool:*", TYPES) == \
        "((role = 'user') AND (tool IS NOT NULL))"
    assert "OR" in parse_fq("role:user OR role:assistant", TYPES)
    # SQL-injection safety: quotes in values are doubled
    assert parse_fq("role:it's", TYPES) == "(role = 'it''s')"


def test_detection():
    for s in ["-id:*.csv", "title:*", "role:user", "*:*",
              "(role:user OR role:assistant)"]:
        assert looks_like_solr_fq(s), s
    for s in ["role = 'user'", "tool IS NOT NULL", "x IN ('a','b')",
              "turn_idx >= 3 AND turn_idx <= 5"]:
        assert not looks_like_solr_fq(s), s


def test_syntax_errors():
    for bad in ["", "role:", "AND role:user", "(role:user", "role:[1 TO",
                "turn_idx:abc"]:
        with pytest.raises(ValueError):
            parse_fq(bad, TYPES)


def test_null_semantics_match_lucene_sets_in_duckdb():
    """The generated SQL runs unmodified in DuckDB, and negation matches
    Lucene's MatchAll-minus-DocSet semantics: a doc with a NULL field
    MATCHES the negated clause on that field."""
    con = duckdb.connect()
    con.execute("""
        CREATE TABLE docs AS SELECT * FROM (VALUES
          (1, 'a.csv',  'T1', 3),
          (2, 'b.txt',  NULL, 7),
          (3, NULL,     'T3', 5),
          (4, 'c.csv',  NULL, NULL)
        ) t(doc_id, id, title, turn_idx)
    """)

    def ids(fq):
        sql = parse_fq(fq, TYPES)
        return {r[0] for r in con.execute(
            f"SELECT doc_id FROM docs WHERE {sql} ORDER BY doc_id"
        ).fetchall()}

    # the reference's two shipped filters
    assert ids("-id:*.csv") == {2, 3}      # null id matches the negation
    assert ids("title:*") == {1, 3}
    # intersection the way the importer applies them (both fq params)
    assert ids("-id:*.csv AND title:*") == {3}
    assert ids("turn_idx:[4 TO *]") == {2, 3}
    assert ids("-turn_idx:[4 TO *]") == {1, 4}  # null turn_idx negates in
    assert ids("id:* OR title:*") == {1, 2, 3, 4}
    assert ids("*:*") == {1, 2, 3, 4}


CFG = dict(segment_size=100, block_size=16, n_term_buckets=4,
           hot_df_threshold=50, hot_salts=4)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    df = generate_transcripts(spark, n_convs=60, turns_per_conv=6, seed=23)
    idx_dir = str(tmp_path_factory.mktemp("sfq"))
    build_index(spark, df, idx_dir, BuildConfig(build_id="sfq", **CFG))
    return df, BM25Index(spark, idx_dir)


def test_engine_solr_fq_equals_sql_fq(corpus):
    _, idx = corpus
    a = [(r["doc_id"], round(r["score"], 6))
         for r in idx.search("error in tool", k=10, fq="role:user").collect()]
    b = [(r["doc_id"], round(r["score"], 6))
         for r in idx.search("error in tool", k=10, fq="role = 'user'").collect()]
    assert a == b and a
    # cache keyed by the RAW fq string, Solr-style
    assert "role:user" in idx._filter_cache


def test_engine_negation_includes_null_fields(corpus):
    _, idx = corpus
    # -tool:* == docs where the tool field is absent
    got = {r["doc_id"] for r in idx.match_all(k=10**6, fq="-tool:*").collect()}
    want = {r["doc_id"]
            for r in idx.docs().filter("tool IS NULL").select("doc_id").collect()}
    assert got == want and got


def test_engine_fq_list_is_intersection(corpus):
    _, idx = corpus
    fqs = ["role:tool", "tool:tool_?"]
    got = {r["doc_id"] for r in idx.match_all(k=10**6, fq=fqs).collect()}
    want = {r["doc_id"] for r in idx.docs()
            .filter("role = 'tool' AND tool LIKE 'tool\\__'")
            .select("doc_id").collect()}
    assert got == want and got
    # each fq got its own filterCache entry under its raw string
    assert "role:tool" in idx._filter_cache
    assert "tool:tool_?" in idx._filter_cache
    # wand and exhaustive agree under a list fq
    w = [(r["doc_id"], round(r["score"], 6))
         for r in idx.search("error", k=10, fq=fqs, mode="wand").collect()]
    e = [(r["doc_id"], round(r["score"], 6))
         for r in idx.search("error", k=10, fq=fqs, mode="exhaustive").collect()]
    assert w == e
    # 1-element list shares the cache key with the plain-string call
    one = idx.match_all(k=10, fq=["role:tool"]).collect()
    assert one == idx.match_all(k=10, fq="role:tool").collect()


def test_engine_numeric_range_fq(corpus):
    _, idx = corpus
    got = {r["doc_id"]
           for r in idx.match_all(k=10**6, fq="turn_idx:[2 TO 4]").collect()}
    want = {r["doc_id"] for r in idx.docs()
            .filter("turn_idx BETWEEN 2 AND 4").select("doc_id").collect()}
    assert got == want and got


def test_delete_by_query_solr_syntax(spark, tmp_path_factory):
    # own index: mutates tombstones. The reference's delete shape is
    # `-crawl_id:X` (delete all docs NOT stamped by this crawl).
    df = generate_transcripts(spark, n_convs=20, turns_per_conv=4, seed=29)
    df = df.withColumn(
        "crawl_id",
        F.when(F.col("turn_idx") < 2, F.lit("crawl-A")).otherwise(F.lit(None)),
    )
    d = str(tmp_path_factory.mktemp("sfqdel"))
    build_index(spark, df, d, BuildConfig(build_id="sfqdel", **CFG))
    idx = BM25Index(spark, d)
    n = idx.docs().count()
    keep = idx.docs().filter("crawl_id = 'crawl-A'").count()
    assert idx.delete_by_query("-crawl_id:crawl-A") == n - keep
    assert idx.match_all(k=10**6).count() == keep


def test_negative_range_endpoints():
    # `-` inside a range is a numeric sign, not the MUST_NOT operator
    assert parse_fq("turn_idx:[-10 TO 10]", TYPES) == \
        "(turn_idx >= -10 AND turn_idx <= 10)"
    assert parse_fq("turn_idx:[* TO -5]", TYPES) == "(turn_idx <= -5)"
    assert parse_fq("turn_idx:{-3 TO -1}", TYPES) == \
        "(turn_idx > -3 AND turn_idx < -1)"
    # untyped fields still emit numerically for numeric-looking endpoints
    assert parse_fq("score:[-1.5 TO 2.5]", None) == \
        "(score >= -1.5 AND score <= 2.5)"


def test_field_value_groups_translate():
    # Solr/Lucene field-scoped value groups: the field is the local
    # default field inside the parens
    assert parse_fq("role:(user OR assistant)", TYPES) == \
        "(((role = 'user') OR (role = 'assistant')))"
    assert parse_fq("role:(user assistant)", TYPES) == \
        parse_fq("role:(user OR assistant)", TYPES)
    assert parse_fq("role:(user AND -tool)", TYPES) == \
        "((role = 'user') AND (((role = 'tool')) IS NOT TRUE))"
    assert parse_fq("turn_idx:([0 TO 3] OR [7 TO *])", TYPES) == \
        "(((turn_idx >= 0 AND turn_idx <= 3) OR (turn_idx >= 7)))"
    # wildcards, quoting, presence, and nesting all work inside the group
    assert parse_fq('role:(assis* "tool output")', TYPES) == \
        "(((role LIKE 'assis%') OR (role = 'tool output')))"
    assert parse_fq("role:(* -tool)", TYPES) == \
        "(((role IS NOT NULL)) AND (((role = 'tool')) IS NOT TRUE))"
    assert parse_fq("role:((user) OR (assistant))", TYPES) == \
        parse_fq("role:(user OR assistant)", TYPES)
    for bad in ["role:()", "role:(OR x)", "role:(x", "role:(x AND)"]:
        with pytest.raises(ValueError):
            parse_fq(bad, TYPES)


def test_engine_field_group_fq_equals_expanded(corpus):
    _, idx = corpus
    a = [(r["doc_id"], round(r["score"], 6))
         for r in idx.search("error in tool", k=20,
                             fq="role:(user OR assistant)").collect()]
    b = [(r["doc_id"], round(r["score"], 6))
         for r in idx.search("error in tool", k=20,
                             fq="role:user OR role:assistant").collect()]
    assert a == b and a


def test_q_field_group_is_constant_score_filter(corpus):
    _, idx = corpus
    got = {r["doc_id"]: r["score"]
           for r in idx.score_matches("role:(user assistant) error").collect()}
    s_err = {r["doc_id"]: r["score"]
             for r in idx.score_matches("error").collect()}
    in_roles = {
        r["doc_id"]
        for r in idx.docs().filter("role IN ('user','assistant')")
        .select("doc_id").collect()
    }
    want = {}
    for d in set(s_err) | in_roles:
        want[d] = s_err.get(d, 0.0) + (1.0 if d in in_roles else 0.0)
    assert set(got) == set(want)
    for d, v in want.items():
        assert abs(got[d] - v) < 1e-9
