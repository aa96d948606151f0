"""Solr atomic updates: set / inc / add / add-distinct / remove /
removeregex modifiers + optimistic-concurrency _version_ checks."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from solr_semantic_importer_spark.operators.transforms import atomic_update

DOCS_SQL = """
SELECT * FROM VALUES
  (1, 'alpha', 10, array('x', 'y', 'x'), CAST(5 AS LONG)),
  (2, 'beta',  20, array('y'),           CAST(7 AS LONG)),
  (3, NULL,    30, CAST(NULL AS ARRAY<STRING>), CAST(9 AS LONG))
AS t(id, title, n, tags, _version_)
"""


@pytest.fixture(scope="module")
def docs(spark):
    return spark.sql(DOCS_SQL)


def _cmd(spark, sql):
    return spark.sql(sql)


def test_set_inc_and_untouched(spark, docs):
    cmds = spark.sql("""
      SELECT * FROM VALUES
        (1, named_struct('op', 'set', 'value', 'ALPHA'),
            named_struct('op', 'inc', 'value', 5))
      AS t(id, title, n)
    """)
    out = {r["id"]: r for r in atomic_update(docs, cmds, key="id").collect()}
    assert out[1]["title"] == "ALPHA" and out[1]["n"] == 15
    assert out[1]["tags"] == ["x", "y", "x"]          # untouched field
    assert out[2] == docs.filter("id = 2").first()    # untouched doc
    assert len(out) == 3


def test_set_null_removes(spark, docs):
    cmds = spark.sql("""
      SELECT 2 AS id,
             named_struct('op', 'set', 'value', CAST(NULL AS STRING)) AS title
    """)
    out = {r["id"]: r for r in atomic_update(docs, cmds, key="id").collect()}
    assert out[2]["title"] is None and out[2]["n"] == 20


def test_array_modifiers(spark, docs):
    cmds = spark.sql("""
      SELECT * FROM VALUES
        (1, named_struct('op', 'remove',       'value', array('x'))),
        (2, named_struct('op', 'add',          'value', array('y', 'z'))),
        (3, named_struct('op', 'add-distinct', 'value', array('a', 'a')))
      AS t(id, tags)
    """)
    out = {r["id"]: r for r in atomic_update(docs, cmds, key="id").collect()}
    assert out[1]["tags"] == ["y"]                # BOTH 'x' occurrences drop
    assert out[2]["tags"] == ["y", "y", "z"]      # add keeps duplicates
    assert out[3]["tags"] == ["a"]                # null current; [a,a] once


def test_add_distinct_keeps_existing_duplicates(spark, docs):
    """Solr doAddDistinct: stored duplicates survive; only NEW values
    already present are skipped (array_union would dedupe the base too)."""
    cmds = spark.sql("""
      SELECT 1 AS id,
             named_struct('op', 'add-distinct', 'value', array('x', 'z')) AS tags
    """)
    out = {r["id"]: r for r in atomic_update(docs, cmds, key="id").collect()}
    assert out[1]["tags"] == ["x", "y", "x", "z"]  # both x's stay; x skipped


def test_remove_on_absent_field_stays_absent(spark, docs):
    """remove/removeregex on a doc without the field leaves it absent
    (null), never materializes []."""
    for op, val in (("remove", "array('q')"), ("removeregex", "array('.')")):
        cmds = spark.sql(f"""
          SELECT 3 AS id, named_struct('op', '{op}', 'value', {val}) AS tags
        """)
        out = {r["id"]: r
               for r in atomic_update(docs, cmds, key="id").collect()}
        assert out[3]["tags"] is None


def test_duplicate_command_keys_fail_loud(spark, docs):
    cmds = spark.sql("""
      SELECT * FROM VALUES
        (1, named_struct('op', 'inc', 'value', 1)),
        (1, named_struct('op', 'inc', 'value', 2))
      AS t(id, n)
    """)
    with pytest.raises(ValueError, match="multiple commands per key"):
        atomic_update(docs, cmds, key="id")


def test_removeregex(spark, docs):
    cmds = spark.sql("""
      SELECT 1 AS id,
             named_struct('op', 'removeregex', 'value', array('^x$')) AS tags
    """)
    out = {r["id"]: r for r in atomic_update(docs, cmds, key="id").collect()}
    assert out[1]["tags"] == ["y"]


def test_creates_missing_doc(spark, docs):
    cmds = spark.sql("""
      SELECT * FROM VALUES
        (9, named_struct('op', 'set', 'value', 'new'),
            named_struct('op', 'inc', 'value', 4),
            named_struct('op', 'remove', 'value', array('q')))
      AS t(id, title, n, tags)
    """)
    out = {r["id"]: r for r in atomic_update(docs, cmds, key="id").collect()}
    assert len(out) == 4
    r = out[9]
    assert r["title"] == "new" and r["n"] == 4
    assert r["tags"] is None and r["_version_"] is None  # remove on create


def test_unknown_op_fails_loud(spark, docs):
    cmds = spark.sql(
        "SELECT 1 AS id, named_struct('op', 'bogus', 'value', 't') AS title"
    )
    with pytest.raises(Exception, match="not valid for field 'title'"):
        atomic_update(docs, cmds, key="id").collect()
    # array-only op on a scalar field fails the same way
    cmds2 = spark.sql(
        "SELECT 1 AS id, named_struct('op', 'add', 'value', 't') AS title"
    )
    with pytest.raises(Exception, match="not valid for field 'title'"):
        atomic_update(docs, cmds2, key="id").collect()


def test_version_conflicts(spark, docs):
    # exact-version mismatch, must-exist miss, must-not-exist hit
    cmds = spark.sql("""
      SELECT * FROM VALUES
        (1, CAST(999 AS LONG), named_struct('op', 'set', 'value', 'x')),
        (8, CAST(1 AS LONG),   named_struct('op', 'set', 'value', 'x')),
        (2, CAST(-1 AS LONG),  named_struct('op', 'set', 'value', 'x'))
      AS t(id, _version_, title)
    """)
    with pytest.raises(ValueError, match="version conflict"):
        atomic_update(docs, cmds, key="id", version_col="_version_")
    # skip drops all three conflicting commands: docs unchanged, no create
    out = atomic_update(docs, cmds, key="id", version_col="_version_",
                        on_conflict="skip")
    assert sorted(out.select("id", "title").collect()) == sorted(
        docs.select("id", "title").collect())


def test_version_match_applies(spark, docs):
    cmds = spark.sql("""
      SELECT * FROM VALUES
        (1, CAST(5 AS LONG),  named_struct('op', 'set', 'value', 'ok')),
        (2, CAST(1 AS LONG),  named_struct('op', 'set', 'value', 'there')),
        (8, CAST(-1 AS LONG), named_struct('op', 'set', 'value', 'fresh'))
      AS t(id, _version_, title)
    """)
    out = {r["id"]: r for r in atomic_update(
        docs, cmds, key="id", version_col="_version_").collect()}
    assert out[1]["title"] == "ok" and out[2]["title"] == "there"
    assert out[8]["title"] == "fresh" and len(out) == 4


def test_plan_is_single_left_join(spark, docs):
    """The corpus-sized pass must stay one row-preserving left join (the
    cmds side broadcastable) -- no full-outer shuffle of the docs scan."""
    cmds = spark.sql(
        "SELECT 1 AS id, named_struct('op', 'set', 'value', 'x') AS title"
    )
    plan = atomic_update(docs, cmds, key="id")._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "FullOuter" not in plan
