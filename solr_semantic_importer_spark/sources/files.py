"""File sources: MS MARCO-shaped TSV (S6) and seed-JSON (S7).

Reference: MsMarcoDownloader streams tgz -> tar -> TSV with 4 columns
(docid, url, title, body) into a bounded queue
(/root/reference/src/main/java/com/krickert/search/indexer/solr/client/
MsMarcoDownloader.java:45-94); the seed path reads a local JSON select
response (IndexerConfigurationProperties.java:95-131, application.yml:44-46).

Spark-first: both are one-line declarative reads -- the planner parallelizes
by file split, replacing the reference's single-threaded streaming + queue.
``.option("compression", ...)`` handles gz transparently; a tar archive
must be unpacked to members first (Spark splits files, not tar entries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators.transforms import drop_internal_fields

MSMARCO_SCHEMA = T.StructType(
    [
        T.StructField("docid", T.StringType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("body", T.StringType(), True),
    ]
)


def msmarco_tsv(spark: SparkSession, path: str) -> DataFrame:
    """4-column MS MARCO document TSV -> typed DataFrame.

    The reference's 10M-slot ArrayBlockingQueue + reader thread collapses
    into the parallel scan; malformed rows are dropped (PERMISSIVE would
    null-fill; the reference skips rows with != 4 parts, :77-83)."""
    return (
        spark.read.option("sep", "\t")
        .option("mode", "DROPMALFORMED")
        .schema(MSMARCO_SCHEMA)
        .csv(path)
    )


def seed_json(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """Local JSON seed documents (one object per line or array), internal
    `_`-prefixed fields stripped (JsonToSolrDocParser.java:81)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.option("multiLine", "true").json(path)
    return drop_internal_fields(df)
