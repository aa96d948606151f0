"""Layer-A scalar transforms and set-style operators (SURVEY sections 2.2/2.4/2.5).

Each function is the Spark-native form of a reference behavior, cited inline.
All are pure built-in Column expressions -- Catalyst folds/pushes them; no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ISO_MILLIS = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"


def normalize_date(col: Column | str) -> Column:
    """P3: timestamp-or-epoch-millis -> ISO-8601 UTC string with millis.

    Reference: SolrSemanticIndexer.insertCreationDate normalizes
    ``creation_date`` (Long epoch or Date) to yyyy-MM-dd'T'HH:mm:ss.SSS'Z'
    (SolrSemanticIndexer.java:244-276).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, ISO_MILLIS)


def normalize_epoch_millis(col: Column | str) -> Column:
    """P3 variant: long epoch-millis input."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(F.timestamp_millis(c), ISO_MILLIS)


def stamp_crawl(df: DataFrame, crawl_id: str) -> DataFrame:
    """P4: stamp crawl-id (+ crawl-date) on every doc
    (SolrSemanticIndexer.java:240-247). crawl_date is current_timestamp in
    the reference; callers needing determinism pass their own literal."""
    return df.withColumn("crawl_id", F.lit(crawl_id))


def truncate_field(col: Column | str, max_chars: int) -> Column:
    """P5: cap text at max-chars before embedding
    (InlineDocumentListener.java:117-123)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, max_chars)


def drop_internal_fields(df: DataFrame) -> DataFrame:
    """P2: `_version_` (and Spark-internal columns) never round-trip
    (JsonToSolrDocParser.java:48,81,118)."""
    internal = [c for c in df.columns if c.startswith("_")]
    return df.drop(*internal)


def facet_field(df: DataFrame, field: str | list[str]) -> DataFrame:
    """Q5/A2: field facet with unlimited buckets
    (SolrAdminActions.java:233-245, setFacetLimit(-1)); a list of fields is
    the facet.pivot shape (one bucket per field-value combination)."""
    cols = [field] if isinstance(field, str) else list(field)
    return df.groupBy(*cols).agg(F.count("*").alias("facet_count"))


def orphan_anti_filter(df: DataFrame, crawl_id_col: str, current: str) -> DataFrame:
    """J3/I5: delete-by-query `-crawl_id:X` == keep only current crawl;
    the returned frame is the orphan set that WOULD be deleted
    (SolrAdminActions.java:228-264, query at :248)."""
    return df.filter(F.col(crawl_id_col) != current)


def upsert_by_key(old: DataFrame, new: DataFrame, key: str, version_col: str) -> DataFrame:
    """J5: Solr add-by-uniqueKey upsert semantics -- rerunning a crawl
    overwrites docs by id (uniqueKey, managed-schema.xml:172; idempotence
    asserted by SolrIndexerIntegrationTest.java:69-79). Latest version wins,
    implemented as union + row_number -- the MERGE INTO shape without Iceberg.
    """
    unioned = old.unionByName(new)
    w = Window.partitionBy(key).orderBy(F.col(version_col).desc())
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def nest_children(parents: DataFrame, children: DataFrame, parent_key: str,
                  child_parent_key: str, child_cols: list[str],
                  nested_col: str = "children") -> DataFrame:
    """J4: child docs attached as a nested field of the parent
    (InlineDocumentListener.java:106-115, `body-child` config) ->
    ArrayType(StructType) column, order-stable by the child sort key."""
    kids = children.groupBy(F.col(child_parent_key).alias(parent_key)).agg(
        F.sort_array(F.collect_list(F.struct(*child_cols))).alias(nested_col)
    )
    return parents.join(kids, parent_key, "left")


def docs_to_json(df: DataFrame) -> DataFrame:
    """P8: re-serialize docs to JSON strings minus internal fields
    (JsonToSolrDocParser.java:32-56, SolrDocumentConverter.java:22-31).
    Output: (id-preserving columns stay) + `doc_json`."""
    clean = drop_internal_fields(df)
    return clean.select(
        *clean.columns, F.to_json(F.struct(*clean.columns)).alias("doc_json")
    )


def parse_json_docs(json_df: DataFrame, schema, json_col: str = "doc_json") -> DataFrame:
    """S4: JSON response docs -> typed rows, `_version_` (and any internal
    `_`-prefixed field) stripped (JsonToSolrDocParser.java:58-101, strip at
    :81). `schema` may include `_version_`; it is dropped after parse."""
    parsed = json_df.select(F.from_json(F.col(json_col), schema).alias("d")).select("d.*")
    return drop_internal_fields(parsed)


_ATOMIC_CREATE_OPS = ("set", "add", "add-distinct", "inc")


def atomic_update(
    docs: DataFrame,
    cmds: DataFrame,
    key: str = "id",
    version_col: str | None = None,
    on_conflict: str = "error",
) -> DataFrame:
    """Solr atomic updates (public "Updating Parts of Documents" semantics;
    the reference sends full-doc upserts -- SolrInputDocument in
    SolrSemanticIndexer -- and Solr applies partial updates server-side
    with these modifiers; this is that server-side step as an operator).

    ``cmds``: one row per update command -- the uniqueKey column plus, for
    each modified field, a STRUCT column ``(op string, value)``; a null
    struct leaves the field untouched. Scalar fields take ``set`` (a null
    value removes the field, Solr's set-null) and ``inc``; array fields
    take ``set``, ``add``, ``add-distinct``, ``remove``, ``removeregex``
    (``value`` is an array of elements / regex patterns; ``remove`` keeps
    duplicates of non-removed elements -- element filter, not set
    difference). An op invalid for the field's type raises AT EXECUTION
    via ``raise_error`` (ops are data, not schema -- fail loud, never
    silently drop). Commands matching no stored doc CREATE the doc (Solr
    creates on atomic update), with remove-ops yielding a null field.

    Optimistic concurrency when ``cmds`` carries ``_version_``: > 1 must
    equal the stored ``version_col``, == 1 requires the doc to exist, < 0
    requires it to NOT exist (Solr ``_version_`` contract).
    ``on_conflict='error'`` raises with a sample of conflicting keys
    (Solr's 409); ``'skip'`` drops the conflicting commands.

    Scale shape: version checks and creations run on cmds-sized frames;
    the main pass is ONE row-preserving LEFT join of the docs scan against
    the (typically tiny, broadcastable) cmds side -- never a full-outer
    shuffle of the corpus. Output schema == docs schema.
    """
    if on_conflict not in ("error", "skip"):
        raise ValueError(f"on_conflict must be error|skip: {on_conflict!r}")
    fields = [c for c in cmds.columns if c not in (key, "_version_")]
    unknown = [f for f in fields if f not in docs.columns]
    if unknown:
        raise ValueError(f"atomic_update: fields not in docs: {unknown}")
    # one command per key: two commands for the same doc need sequential
    # application (Solr applies them in request order; a left join would
    # silently DUPLICATE the doc row instead) -- fail loud. cmds-sized job.
    dup = [r[0] for r in cmds.groupBy(key).count()
           .filter("count > 1").limit(5).collect()]
    if dup:
        raise ValueError(
            f"atomic_update: multiple commands per key (apply them in "
            f"separate calls, in order): {dup}"
        )

    if "_version_" in cmds.columns:
        stored = docs.select(
            F.col(key),
            (F.col(version_col) if version_col else F.lit(None)
             ).cast("long").alias("__stored_v"),
            F.lit(True).alias("__exists"),
        )
        st = cmds.select(key, "_version_").join(stored, key, "left")
        v, ex = F.col("_version_"), F.coalesce(F.col("__exists"), F.lit(False))
        conflict = (
            ((v > 1) & (~ex | (F.col("__stored_v") != v)
                        | F.col("__stored_v").isNull()))
            | ((v == 1) & ~ex)
            | ((v < 0) & ex)
        )
        bad = st.filter(conflict).select(key)
        if on_conflict == "error":
            sample = [r[0] for r in bad.limit(5).collect()]
            if sample:
                raise ValueError(
                    f"atomic_update: version conflict on keys {sample}"
                )
        else:
            cmds = cmds.join(bad, key, "left_anti")

    dtypes = {f.name: f.dataType for f in docs.schema.fields}

    def _upd(f: str) -> Column:
        dt = dtypes[f]
        cur, cmd = F.col(f"d.{f}"), F.col(f"c.{f}")
        op, val = cmd["op"], cmd["value"]
        bad_op = F.raise_error(F.concat(
            F.lit("atomic_update: op '"), F.coalesce(op, F.lit("null")),
            F.lit(f"' not valid for field '{f}'"),
        ))
        w = F.when(cmd.isNull(), cur).when(op == "set", val)
        if dt.typeName() == "array":
            base = F.coalesce(cur, F.array().cast(dt))
            w = (
                w.when(op == "add", F.concat(base, val))
                # Solr add-distinct (AtomicUpdateDocumentMerger.doAddDistinct):
                # existing values keep their duplicates; each NEW value
                # appends only if absent from the existing collection (and
                # from the values appended before it) -- array_union would
                # wrongly dedupe the stored side too
                .when(op == "add-distinct", F.concat(
                    base,
                    F.array_distinct(F.filter(
                        val, lambda x: ~F.array_contains(base, x))),
                ))
                # remove/removeregex on an ABSENT field leaves it absent
                # (Solr no-ops): filter(cur) propagates the null, where
                # filter(base) would materialize []
                .when(op == "remove",
                      F.filter(cur, lambda x: ~F.array_contains(val, x)))
                .when(op == "removeregex",
                      F.filter(cur, lambda x: ~F.exists(
                          val, lambda p: F.regexp_like(x, p))))
            )
        elif dt.typeName() in ("integer", "long", "float", "double",
                               "short", "byte", "decimal"):
            w = w.when(op == "inc", F.coalesce(cur, F.lit(0).cast(dt)) + val)
        return w.otherwise(bad_op).cast(dt).alias(f)

    d, c = docs.alias("d"), cmds.alias("c")
    updated = d.join(c, F.col(f"d.{key}") == F.col(f"c.{key}"), "left").select(
        *[_upd(f) if f in fields else F.col(f"d.{f}").alias(f)
          for f in docs.columns]
    )

    def _create(f: str) -> Column:
        dt = dtypes[f]
        if f == key:
            return F.col(key).cast(dt).alias(f)
        if f not in fields:
            return F.lit(None).cast(dt).alias(f)
        cmd = F.col(f)
        return (
            F.when(cmd.isNull() | ~cmd["op"].isin(*_ATOMIC_CREATE_OPS),
                   F.lit(None))
            .otherwise(cmd["value"]).cast(dt).alias(f)
        )

    created = cmds.join(docs.select(key), key, "left_anti").select(
        *[_create(f) for f in docs.columns]
    )
    return updated.unionByName(created)
