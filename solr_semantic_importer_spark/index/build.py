"""Inverted-index build: analysis -> stats -> salted postings -> segments.

Spark-native realization of the Lucene index build the reference delegates to
Solr (every ``indexed="true"`` field in
default-base-config/managed-schema.xml:113-167; commit semantics
solrconfig.xml:292-306). Pipeline (all DataFrame ops; Python only inside
Arrow-batched kernels):

1. stable doc ids (index/docids.py) + segment_id = doc_id // segment_size --
   segments are pure functions of doc_id, so the layout is reproducible
   regardless of cluster size / partition count.
2. per-turn term frequencies WITHOUT token explosion (term_freqs_udf) ->
   (doc_id, segment_id, dl, term, tf) pairs. tf-compression before the
   shuffle: the pairs relation is 5-10x smaller than raw tokens.
3. corpus stats N/avgdl (2-row aggregate) + dictionary (term -> df, cf).
4. hot-term detection from the dictionary (df >= hot_df_threshold; the
   shipped stopwords.txt is EMPTY so "the" IS indexed -- Zipf skew is real).
   Hot terms get split posting lists: salt = doc-contiguous range bucket
   inside the segment, so each (term, segment, salt) run covers a disjoint
   doc range -- blocks remain globally doc-ordered per term (block-max WAND
   stays valid) and the groupBy key (term, segment, salt) spreads hot terms
   across reducers instead of melting one.
5. ONE shuffle by (term, segment_id, salt) -> sortWithinPartitions -> a
   mapInPandas partition encoder (_make_partition_encoder): every group and
   block boundary found in one vectorized scan, ONE varint pass per stream
   (doc gaps / tfs / dls; dls stored per posting => scoring is posting-local,
   no doc join; the exact-dl deviation from Lucene's 1-byte norms is
   documented in SURVEY I2), per-block (max_tf, min_dl) -- the query computes
   the block upper bound idf * tf_norm(max_tf, min_dl) with the CURRENT
   global avgdl, so the bound stays valid after streaming appends drift avgdl.
   No per-group Python invocation: ~100k tiny posting groups cost one Arrow
   batch scan, not 100k pandas calls.
6. postings written as parquet partitioned by bucket = xxhash64(term) %
   n_term_buckets: a query prunes to its terms' buckets (directory-level
   partition pruning) before row-group/predicate pushdown on term.

Every step runs under the build Manifest (plans/manifest.py): committed steps
are skipped on resume; rows/bytes/duration/skew metrics per step.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.analysis import (
    make_multi_field_analyzer,
    make_positions_udf,
    term_freqs_udf,
)
from ..functions.codec import varint_encode_with_lengths
from ..plans.manifest import BuildHistory, Manifest, dir_bytes
from .docids import assign_doc_ids

DEFAULT_SEGMENT_SIZE = 1 << 20  # docs per segment at scale
DEFAULT_BLOCK_SIZE = 128
DEFAULT_N_TERM_BUCKETS = 16
DEFAULT_HOT_DF_THRESHOLD = 100_000
DEFAULT_HOT_SALTS = 8

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("segment_id", T.LongType(), False),
        T.StructField("salt", T.IntegerType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("count", T.IntegerType(), False),
        T.StructField("min_doc", T.LongType(), False),
        T.StructField("max_doc", T.LongType(), False),
        # avgdl-INDEPENDENT block stats: tf_norm(tf, dl) is increasing in tf
        # and decreasing in dl, so tf_norm(max_tf, min_dl) evaluated with the
        # CURRENT global avgdl upper-bounds every posting in the block no
        # matter how avgdl drifts after streaming appends (a stored
        # max_tf_norm baked with a stale avgdl is NOT an upper bound once the
        # global avgdl grows -- block-max WAND could skip true top-k zones).
        T.StructField("max_tf", T.LongType(), False),
        T.StructField("min_dl", T.LongType(), False),
        T.StructField("doc_gaps", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("dls", T.BinaryType(), False),
        # per-posting position deltas (phrase queries); tf stream gives the
        # per-posting split points. NULL when store_positions=False.
        T.StructField("positions", T.BinaryType(), True),
    ]
)


@dataclass
class BuildConfig:
    segment_size: int = DEFAULT_SEGMENT_SIZE
    block_size: int = DEFAULT_BLOCK_SIZE
    n_term_buckets: int = DEFAULT_N_TERM_BUCKETS
    hot_df_threshold: int = DEFAULT_HOT_DF_THRESHOLD
    hot_salts: int = DEFAULT_HOT_SALTS
    build_id: str = "build-0"
    # store token positions (Lucene indexes them by default for text fields;
    # required for phrase queries). Costs ~1 varint per token in postings.
    store_positions: bool = True
    # copyField-into-_text_ semantics: index the concatenated token streams
    # of these columns instead of the single "text" column, with
    # position_increment_gap positions between values (Solr catch-all
    # `_text_` + copyField, managed-schema.xml:298 gap=100) so phrases never
    # match across a field boundary. None -> single "text" field.
    copy_fields: tuple[str, ...] | None = None
    position_increment_gap: int = 100
    # analysis chain: "text_general" (frozen default: tokenize+lowercase,
    # empty stop set) or "text_en" (T5: + English stop set + Porter stem,
    # Lucene stop-gap position semantics). Recorded in the manifest so the
    # query side always analyzes with the same chain.
    analyzer: str = "text_general"
    # which transcript column the index analyzes. Per-field indexes (Lucene
    # keys every term by (field, text); edismax qf scores each field with
    # its OWN df/dl/avgdl) are built as one index per field over the same
    # doc-id assignment -- see query/multifield.py. All columns are still
    # STORED; text_col only selects the analyzed stream.
    text_col: str = "text"
    # keep the uncompressed (doc, term, tf[, positions]) intermediate after
    # the postings commit. Default False: it roughly doubles the on-disk
    # index footprint and every later step can be recomputed
    # deterministically from the committed docs table on resume.
    keep_tf_pairs: bool = False


# index relations are written zstd: measured 43% smaller than snappy at
# identical-or-better query latency (BASELINE.md) -- at 10^12 turns that is
# 43% less postings-scan I/O per query. Per-write option, so the session's
# global codec (and the user's own tables) are untouched.
INDEX_PARQUET_CODEC = "zstd"


def write_stats_parquet(path: str, n_docs: int, sum_dl: int) -> None:
    """corpus_stats is ONE row of driver-known values; writing it through a
    Spark job pays fixed scheduling latency per build (and ``coalesce(1)``
    on a local relation stalls ~5 s/write on this pyspark), so it goes
    straight to a parquet file via pyarrow. ``spark.read.parquet`` readers
    are unaffected; commit semantics stay with the manifest."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    avgdl = (sum_dl / n_docs) if n_docs else 0.0
    table = pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "sum_dl": pa.array([sum_dl], pa.int64()),
            "avgdl": pa.array([avgdl], pa.float64()),
        }
    )
    pq.write_table(
        table, os.path.join(path, "part-00000.parquet"),
        compression=INDEX_PARQUET_CODEC,
    )


def _encode_sorted_chunk(pdf: pd.DataFrame, block_size: int) -> pd.DataFrame:
    """Encode a chunk of rows sorted by (term, segment_id, salt, doc_id) into
    posting blocks -- FULLY vectorized: one boundary scan finds all groups and
    blocks, ONE varint pass encodes every stream, reduceat computes per-block
    aggregates, and the only Python loop slices the shared byte buffers.
    """
    term = pdf["term"].to_numpy(object)
    seg = pdf["segment_id"].to_numpy(np.int64)
    salt = pdf["salt"].to_numpy(np.int64)
    doc = pdf["doc_id"].to_numpy(np.int64)
    tf = pdf["tf"].to_numpy(np.int64)
    dl = pdf["dl"].to_numpy(np.int64)
    n = len(doc)
    new_group = np.ones(n, dtype=bool)
    if n > 1:
        new_group[1:] = (
            (term[1:] != term[:-1]) | (seg[1:] != seg[:-1]) | (salt[1:] != salt[:-1])
        )
    grp_starts = np.flatnonzero(new_group)
    grp = np.cumsum(new_group) - 1
    pos = np.arange(n, dtype=np.int64) - grp_starts[grp]
    new_block = new_group | (pos % block_size == 0)
    block_starts = np.flatnonzero(new_block)
    nb = len(block_starts)
    block_ends = np.empty(nb, dtype=np.int64)
    block_ends[:-1] = block_starts[1:]
    block_ends[-1] = n

    gaps = np.empty(n, dtype=np.int64)
    gaps[0] = doc[0]
    gaps[1:] = doc[1:] - doc[:-1]
    gaps[block_starts] = doc[block_starts]  # absolute restart per block

    gbuf, glen = varint_encode_with_lengths(gaps.astype(np.uint64))
    tbuf, tlen = varint_encode_with_lengths(tf.astype(np.uint64))
    lbuf, llen = varint_encode_with_lengths(dl.astype(np.uint64))

    def offsets(lens: np.ndarray) -> np.ndarray:
        o = np.zeros(nb + 1, dtype=np.int64)
        o[1:] = np.cumsum(np.add.reduceat(lens, block_starts))
        return o

    go, to, lo = offsets(glen), offsets(tlen), offsets(llen)
    gm, tm, lm = memoryview(gbuf), memoryview(tbuf), memoryview(lbuf)

    pos_cells: list[bytes | None] = [None] * nb
    if "positions" in pdf.columns and pdf["positions"].iloc[0] is not None:
        # flatten all position lists (row order == posting order), delta-
        # encode with an absolute restart at each posting start, ONE varint pass
        flat = np.concatenate(
            [np.asarray(x, dtype=np.int64) for x in pdf["positions"]]
        )
        pstarts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(tf, out=pstarts[1:])
        pdelta = np.empty(len(flat), dtype=np.int64)
        if len(flat):
            pdelta[0] = flat[0]
            pdelta[1:] = flat[1:] - flat[:-1]
            pdelta[pstarts[:-1]] = flat[pstarts[:-1]]  # absolute per posting
        pbuf, plen = varint_encode_with_lengths(pdelta.astype(np.uint64))
        plencum = np.zeros(len(flat) + 1, dtype=np.int64)
        np.cumsum(plen, out=plencum[1:])
        pm = memoryview(pbuf)
        pos_cells = [
            bytes(pm[plencum[pstarts[block_starts[i]]] : plencum[pstarts[block_ends[i]]]])
            for i in range(nb)
        ]

    return pd.DataFrame(
        {
            "term": term[block_starts],
            "segment_id": seg[block_starts],
            "salt": salt[block_starts].astype(np.int32),
            "block_id": (pos[block_starts] // block_size).astype(np.int32),
            "count": (block_ends - block_starts).astype(np.int32),
            "min_doc": doc[block_starts],
            "max_doc": doc[block_ends - 1],
            "max_tf": np.maximum.reduceat(tf, block_starts),
            "min_dl": np.minimum.reduceat(dl, block_starts),
            "doc_gaps": [bytes(gm[go[i] : go[i + 1]]) for i in range(nb)],
            "tfs": [bytes(tm[to[i] : to[i + 1]]) for i in range(nb)],
            "dls": [bytes(lm[lo[i] : lo[i + 1]]) for i in range(nb)],
            "positions": pos_cells,
        }
    )


def _make_partition_encoder(block_size: int):
    """mapInPandas kernel over partitions sorted by (term, segment_id, salt,
    doc_id). Arrow batches can split a group, so the trailing group of each
    batch is carried into the next before encoding."""

    def kernel(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            term = pdf["term"].to_numpy(object)
            seg = pdf["segment_id"].to_numpy(np.int64)
            salt = pdf["salt"].to_numpy(np.int64)
            new_group = np.ones(len(pdf), dtype=bool)
            new_group[1:] = (
                (term[1:] != term[:-1]) | (seg[1:] != seg[:-1]) | (salt[1:] != salt[:-1])
            )
            last_start = int(np.flatnonzero(new_group)[-1])
            if last_start == 0:
                carry = pdf  # whole batch is one group; keep accumulating
                continue
            yield _encode_sorted_chunk(pdf.iloc[:last_start], block_size)
            carry = pdf.iloc[last_start:].reset_index(drop=True)
        if carry is not None and len(carry):
            yield _encode_sorted_chunk(carry, block_size)

    return kernel


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    index_dir: str,
    config: BuildConfig | None = None,
) -> Manifest:
    """Build (or resume) the full index at ``index_dir``. Returns the manifest."""
    cfg = config or BuildConfig()
    if cfg.analyzer != "text_general" and not cfg.store_positions:
        from dataclasses import replace

        cfg = replace(cfg, store_positions=True)  # non-default chains use the
        # positions pipeline (stop-gap semantics live in the position map)
    os.makedirs(index_dir, exist_ok=True)
    man = Manifest(index_dir, cfg.build_id)

    docs_path = os.path.join(index_dir, "docs")
    pairs_path = os.path.join(index_dir, "tf_pairs")
    dict_path = os.path.join(index_dir, "dictionary")
    stats_path = os.path.join(index_dir, "corpus_stats")
    post_path = os.path.join(index_dir, "postings")

    # -- steps 1+2: ONE analysis pass feeds both the docs table (stored
    # fields + dl) and the tf_pairs relation (doc_id, segment_id, dl, term,
    # tf). The analyzed frame is persisted across the two writes in a fresh
    # build; a resume that lost it just recomputes (deterministically).
    _analyzed: list[DataFrame] = []

    def analyzed() -> DataFrame:
        if not _analyzed:
            ids = assign_doc_ids(transcripts)
            a = ids.withColumn(
                "segment_id", (F.col("doc_id") / cfg.segment_size).cast("long")
            )
            if cfg.store_positions:
                if cfg.copy_fields:
                    if cfg.analyzer != "text_general":
                        raise ValueError(
                            "copy_fields currently supports the text_general chain"
                        )
                    analyzer = make_multi_field_analyzer(cfg.position_increment_gap)
                    tfmap_col = analyzer(*[F.col(c) for c in cfg.copy_fields])
                else:
                    tfmap_col = make_positions_udf(cfg.analyzer)(
                        F.col(cfg.text_col)
                    )
                a = a.withColumn("tfmap", tfmap_col).withColumn(
                    "dl",
                    F.coalesce(
                        F.aggregate(
                            F.map_values("tfmap"),
                            F.lit(0),
                            lambda a_, x: a_ + F.size(x),
                        ),
                        F.lit(0),
                    ),
                )
            else:
                text_col = (
                    F.concat_ws(" ", *[F.col(c) for c in cfg.copy_fields])
                    if cfg.copy_fields
                    else F.col(cfg.text_col)
                )
                a = a.withColumn(
                    "tfmap", term_freqs_udf(text_col)
                ).withColumn(
                    "dl",
                    F.coalesce(
                        F.aggregate(
                            F.map_values("tfmap"), F.lit(0), lambda a_, x: a_ + x
                        ),
                        F.lit(0),
                    ),
                )
            _analyzed.append(a.persist())
        return _analyzed[0]

    _docs_obs: dict = {}

    def step_docs():
        obs = Observation()
        docs_df = analyzed().drop("tfmap").observe(
            obs, F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sum_dl")
        )
        (
            docs_df.repartition("segment_id")
            .write.mode("overwrite")
            .option("compression", INDEX_PARQUET_CODEC)
            .partitionBy("segment_id")
            .parquet(docs_path)
        )
        _docs_obs.update(obs.get)
        return int(_docs_obs["n"]), dir_bytes(docs_path), {}

    man.run_step("docs", step_docs)
    docs = spark.read.parquet(docs_path)

    def step_pairs():
        obs = Observation()
        if cfg.store_positions:
            p = analyzed().select(
                "doc_id", "segment_id", "dl",
                F.explode("tfmap").alias("term", "positions"),
            ).select(
                "doc_id", "segment_id", "dl", "term",
                F.size("positions").alias("tf"), "positions",
            )
        else:
            p = analyzed().select(
                "doc_id", "segment_id", "dl",
                F.explode("tfmap").alias("term", "tf"),
            )
        p = p.observe(obs, F.count(F.lit(1)).alias("n"))
        p.write.mode("overwrite").option(
            "compression", INDEX_PARQUET_CODEC
        ).parquet(pairs_path)
        return int(obs.get["n"]), dir_bytes(pairs_path), {}

    man.run_step("pairs", step_pairs)
    for a in _analyzed:
        a.unpersist()

    def pairs() -> DataFrame:
        # lazy: a fully-committed resume may have dropped the intermediate
        # (drop_pairs step). If a later step DOES need it again (e.g. the
        # postings dir was lost), recompute it deterministically from the
        # analysis pass instead of failing on the missing path.
        if not os.path.exists(pairs_path):
            man.steps.pop("pairs", None)
            man.steps.pop("drop_pairs", None)
            man._flush()
            man.run_step("pairs", step_pairs)
        return spark.read.parquet(pairs_path)

    # -- step 3: corpus stats ------------------------------------------------
    def step_stats():
        if _docs_obs:  # same-run fast path: reuse the docs-write observation
            nd = int(_docs_obs["n"])
            sd = int(_docs_obs["sum_dl"] or 0)
        else:  # resume path: recompute from the committed docs table
            row = docs.agg(
                F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
            ).collect()[0]
            nd, sd = int(row["n_docs"]), int(row["sum_dl"] or 0)
        write_stats_parquet(stats_path, nd, sd)
        return 1, dir_bytes(stats_path), {}

    man.run_step("stats", step_stats)
    srow = spark.read.parquet(stats_path).collect()[0]
    n_docs, avgdl = int(srow["n_docs"]), float(srow["avgdl"] or 0.0)

    # -- step 4: dictionary (term -> df, cf) ---------------------------------
    def step_dict():
        obs = Observation()
        d = pairs().groupBy("term").agg(
            F.count("*").alias("df"), F.sum("tf").alias("cf")
        )
        d = d.withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(cfg.n_term_buckets)).cast("int")
        ).observe(obs, F.count(F.lit(1)).alias("n"))
        d.repartition(cfg.n_term_buckets, "bucket").write.mode("overwrite").option(
            "compression", INDEX_PARQUET_CODEC
        ).partitionBy("bucket").parquet(dict_path)
        return int(obs.get["n"]), dir_bytes(dict_path), {}

    man.run_step("dictionary", step_dict)
    dictionary = spark.read.parquet(dict_path)

    # -- step 5: salted, blocked, compressed postings ------------------------
    def step_postings():
        # hot list is tiny by construction (df >= threshold under Zipf), so
        # collect it once; the salt expression then needs no join at all
        hot_terms = [
            r["term"]
            for r in dictionary.filter(F.col("df") >= cfg.hot_df_threshold)
            .select("term")
            .collect()
        ]
        n_salts = (
            F.when(F.col("term").isin(hot_terms), F.lit(cfg.hot_salts)).otherwise(
                F.lit(1)
            )
            if hot_terms
            else F.lit(1)
        )
        # doc-contiguous range salt: preserves global doc order across salts
        p = pairs().withColumn(
            "salt",
            (
                (F.col("doc_id") % cfg.segment_size)
                * n_salts
                / cfg.segment_size
            ).cast("int"),
        )
        # ONE shuffle colocates each (term, segment, salt) group; the sorted
        # partitions stream through the vectorized block encoder (no
        # per-group Python invocation -- SURVEY 4.2 skew/scale design).
        shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        enc = (
            p.repartition(shuffle_n, "term", "segment_id", "salt")
            .sortWithinPartitions("term", "segment_id", "salt", "doc_id")
            .mapInPandas(
                _make_partition_encoder(cfg.block_size), schema=POSTINGS_SCHEMA
            )
        )
        obs = Observation()
        enc = enc.withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(cfg.n_term_buckets)).cast("int")
        ).observe(
            obs,
            F.count(F.lit(1)).alias("blocks"),
            F.sum("count").alias("postings"),
        )
        (
            enc.write.mode("overwrite")
            .option("compression", INDEX_PARQUET_CODEC)
            .partitionBy("bucket")
            .parquet(post_path)
        )
        m = obs.get
        n_post = int(m["postings"] or 0)
        total_bytes = dir_bytes(post_path)
        # north_rule metrics: bytes/partition + skew factor across the
        # bucket partitions (max/mean bucket bytes; 1.0 = perfectly even)
        bucket_bytes = [
            dir_bytes(os.path.join(post_path, d))
            for d in os.listdir(post_path)
            if d.startswith("bucket=")
        ]
        mean_b = (sum(bucket_bytes) / len(bucket_bytes)) if bucket_bytes else 0
        return (
            n_post,
            total_bytes,
            {
                "blocks": int(m["blocks"]),
                "hot_terms": len(hot_terms),
                "bytes_per_posting": round(total_bytes / max(n_post, 1), 3),
                "bytes_per_partition_mean": round(mean_b, 1),
                "bytes_per_partition_max": max(bucket_bytes, default=0),
                "skew_factor": round(max(bucket_bytes, default=0) / mean_b, 3)
                if mean_b
                else 0.0,
            },
        )

    man.run_step("postings", step_postings)

    # -- step 6: drop the uncompressed intermediate (default) -----------------
    def step_drop_pairs():
        if cfg.keep_tf_pairs:
            return 0, 0, {"kept": True}
        import shutil

        shutil.rmtree(pairs_path, ignore_errors=True)
        return 0, 0, {"kept": False}

    man.run_step("drop_pairs", step_drop_pairs)

    # -- derived build metrics (north_rule: postings/sec, bytes/partition, skew)
    post_step = man.steps["postings"]
    if post_step.duration_sec > 0 and "postings_per_sec" not in post_step.metrics:
        post_step.metrics["postings_per_sec"] = post_step.rows / post_step.duration_sec
        man._flush()
    man.commit("finalize", rows=n_docs, n_docs=n_docs, avgdl=avgdl,
               segment_size=cfg.segment_size, block_size=cfg.block_size,
               n_term_buckets=cfg.n_term_buckets, analyzer=cfg.analyzer,
               store_positions=cfg.store_positions,
               copy_fields=list(cfg.copy_fields) if cfg.copy_fields else None,
               position_increment_gap=cfg.position_increment_gap,
               hot_df_threshold=cfg.hot_df_threshold, hot_salts=cfg.hot_salts,
               text_col=cfg.text_col)
    # A4: ring-buffer history of build summaries (IndexingTracker analog)
    BuildHistory(index_dir).record(
        cfg.build_id,
        n_docs=n_docs,
        postings=man.steps["postings"].rows,
        total_sec=round(sum(s.duration_sec for s in man.steps.values()), 2),
        docs_per_sec=round(
            n_docs / max(sum(s.duration_sec for s in man.steps.values()), 1e-9), 1
        ),
    )
    return man
