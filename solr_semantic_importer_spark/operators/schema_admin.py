"""Schema administration analogs: live evolution + vector-field validation.

Reference behaviors (SURVEY I6/I7):

- VectorFieldValidator validates an existing vector field's attributes
  against the requested (dims, similarity) and, on mismatch, falls back to a
  renamed field ``{field}_{similarity}_{dims}``
  (/root/reference/src/main/java/com/krickert/search/indexer/solr/client/
  VectorFieldValidator.java:62-79, creation :172-210).
- Schema-by-API evolution adds fields to a live collection at run time
  (:172-199); collection creation takes shards/replicas
  (SolrAdminActions.java:193-199).

Spark-first: a DataFrame's StructType IS the schema; "adding a field to a
live collection" is ``withColumn`` (or Iceberg ``ALTER TABLE ADD COLUMNS``
when table-backed); shard count maps to partitioning. The validator below
reproduces the reference's rename-on-mismatch contract exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class VectorFieldSpec:
    name: str
    dims: int
    similarity: str = "cosine"  # reference default (managed-schema.xml:13)


def validated_vector_field(df: DataFrame, spec: VectorFieldSpec) -> tuple[DataFrame, str]:
    """Ensure ``df`` has a vector column satisfying ``spec``.

    Returns (df, actual_field_name):
    - column absent           -> created as null array<float> of the spec name
      (the schema-API "add field" path, VectorFieldValidator.java:172-199)
    - column present, valid   -> unchanged
    - column present, WRONG dims/type -> the spec falls back to the renamed
      field ``{name}_{similarity}_{dims}`` (VectorFieldValidator.java:62-79),
      created if absent; the offending column is left untouched.
    """
    fallback = f"{spec.name}_{spec.similarity}_{spec.dims}"

    def is_vector(field: T.StructField) -> bool:
        return isinstance(field.dataType, T.ArrayType) and isinstance(
            field.dataType.elementType, (T.FloatType, T.DoubleType)
        )

    names = {f.name: f for f in df.schema.fields}
    if spec.name not in names:
        return (
            df.withColumn(spec.name, F.lit(None).cast(T.ArrayType(T.FloatType()))),
            spec.name,
        )
    field = names[spec.name]
    if is_vector(field) and _dims_ok(df, spec):
        return df, spec.name
    if fallback not in names:
        df = df.withColumn(fallback, F.lit(None).cast(T.ArrayType(T.FloatType())))
    return df, fallback


def _dims_ok(df: DataFrame, spec: VectorFieldSpec) -> bool:
    """All non-null vectors must have exactly spec.dims elements."""
    bad = df.filter(
        F.col(spec.name).isNotNull() & (F.size(spec.name) != spec.dims)
    ).limit(1)
    return len(bad.take(1)) == 0


def infer_string_field_types(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """Schemaless-mode field-type inference -- the ACTIVE
    ``add-unknown-fields-to-the-schema`` update chain the shipped solrconfig
    enables by default (default-base-config/solrconfig.xml:942-947,
    ``update.autoCreateFields:true``: parse-boolean -> parse-long ->
    parse-double -> parse-date -> add-schema-fields).

    Frozen spec: a StringType column is promoted to the FIRST type in
    (boolean, long, double, timestamp) that every non-null value parses as;
    otherwise it stays a string. Boolean accepts exactly true/false
    (case-insensitive), matching ParseBooleanFieldUpdateProcessor's default
    value set (Spark's cast also accepts y/n/1/0, which would shadow longs).
    One declarative aggregation computes all parse-failure counts in a
    single pass (try_cast stays JVM-side), then the winners are cast -- no
    per-row Python, no second scan of the data.
    """
    cand = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.StringType)
        and (columns is None or f.name in columns)
    ]
    if not cand:
        return df
    kinds = ("boolean", "long", "double", "timestamp")

    def fails(col: str, ddl: str) -> Column:
        c = F.col(col)
        if ddl == "boolean":
            bad = ~F.lower(F.trim(c)).isin("true", "false")
        else:
            bad = c.try_cast(ddl).isNull()
        return F.count(F.when(c.isNotNull() & bad, F.lit(1)))

    aggs = []
    for col in cand:
        for ddl in kinds:
            aggs.append(fails(col, ddl).alias(f"{col}::{ddl}"))
        aggs.append(F.count(F.when(F.col(col).isNotNull(), F.lit(1))).alias(
            f"{col}::nonnull"
        ))
    row = df.agg(*aggs).collect()[0]
    out = df
    for col in cand:
        if row[f"{col}::nonnull"] == 0:
            continue  # all-null column: nothing to infer from
        for ddl in kinds:
            if row[f"{col}::{ddl}"] == 0:
                out = out.withColumn(col, F.col(col).cast(ddl))
                break
    return out


def add_columns(df: DataFrame, columns: dict[str, str]) -> DataFrame:
    """Schema evolution: add typed null columns ({name: ddl_type}) --
    the ``ALTER TABLE ... ADD COLUMNS`` shape on a live frame."""
    for name, ddl in columns.items():
        if name not in df.columns:
            df = df.withColumn(name, F.lit(None).cast(ddl))
    return df


def shard_layout(df: DataFrame, num_shards: int, shard_key: str | Column) -> DataFrame:
    """I7: collection creation with N shards -> repartition by the shard key
    (replicas are a storage concern the engine does not model)."""
    return df.repartition(num_shards, F.col(shard_key) if isinstance(shard_key, str) else shard_key)
