"""Nested-document flattening: the protobuf-source analog (S5).

Reference: ProtobufToSolrDocument.convertProtobufToSolrDocument
(/root/reference/src/main/java/com/krickert/search/indexer/enhancers/
ProtobufToSolrDocument.java:22-155) flattens a protobuf message tree into flat
Solr fields:

- nested messages -> ``parent_child`` underscore-joined field names (:40-66)
- repeated fields -> multi-valued fields (:44-52)  -> stay ``ArrayType``
- map fields      -> one field per key, ``field_key`` suffixed (:67-90)
- Timestamp       -> Date (:91-108)                -> ``TimestampType`` kept

Spark-first realization: flattening is *pure projection* -- a select list the
planner folds into the scan (column pruning reaches the parquet reader), no
Python anywhere. Maps with a known key set become per-key columns; unknown
key sets use :func:`explode_map` (long format), the scalable representation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten_columns(df: DataFrame, sep: str = "_",
                    map_keys: dict[str, list[str]] | None = None) -> DataFrame:
    """Flatten all StructType columns recursively into ``a_b_c`` columns.

    ``map_keys``: optional {flattened_col_name: [keys...]} turning MapType
    columns into per-key columns (``field_key``), mirroring the reference's
    map handling; MapType columns not listed are kept as-is.
    """
    map_keys = map_keys or {}

    def expand(col: Column, dtype: T.DataType, name: str) -> list[tuple[Column, str]]:
        if isinstance(dtype, T.StructType):
            out: list[tuple[Column, str]] = []
            for f in dtype.fields:
                out.extend(expand(col[f.name], f.dataType, f"{name}{sep}{f.name}"))
            return out
        if isinstance(dtype, T.MapType) and name in map_keys:
            return [
                (col[k].alias(f"{name}{sep}{k}"), f"{name}{sep}{k}")
                for k in map_keys[name]
            ]
        return [(col.alias(name), name)]

    cols: list[Column] = []
    for f in df.schema.fields:
        cols.extend(c for c, _ in expand(F.col(f.name), f.dataType, f.name))
    return df.select(*cols)


def explode_map(df: DataFrame, map_col: str, key_alias: str = "key",
                value_alias: str = "value") -> DataFrame:
    """MapType -> long format (one row per entry): the unbounded-key-set path."""
    other = [c for c in df.columns if c != map_col]
    return df.select(
        *other, F.explode_outer(map_col).alias(key_alias, value_alias)
    )
