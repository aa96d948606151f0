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
5. applyInPandas over (term, segment_id, salt): sort by doc_id, split into
   blocks of ``block_size``, delta-gap + LEB128-varint encode doc gaps / tfs /
   dls (dls stored per posting => scoring is posting-local, no doc join; the
   exact-dl deviation from Lucene's 1-byte norms is documented in SURVEY I2),
   and record per-block max_tf_norm = max over the block of
   tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) -- query-time block-max = idf * that.
6. postings written as parquet partitioned by bucket = xxhash64(term) %
   n_term_buckets: a query prunes to its terms' buckets (directory-level
   partition pruning) before row-group/predicate pushdown on term.

Every step runs under the build Manifest (plans/manifest.py): committed steps
are skipped on resume; rows/bytes/duration/skew metrics per step.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import B, K1
from ..functions.analysis import term_freqs_udf
from ..functions.codec import varint_encode
from ..plans.manifest import Manifest, dir_bytes
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
        T.StructField("max_tf_norm", T.DoubleType(), False),
        T.StructField("doc_gaps", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("dls", T.BinaryType(), False),
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


def _tf_pairs(docs: DataFrame) -> DataFrame:
    """docs (with doc_id, segment_id, text) -> (doc_id, segment_id, dl, term, tf)."""
    with_tf = docs.select(
        "doc_id",
        "segment_id",
        term_freqs_udf(F.col("text")).alias("tfmap"),
    ).withColumn(
        "dl",
        F.coalesce(
            F.aggregate(F.map_values("tfmap"), F.lit(0), lambda a, x: a + x),
            F.lit(0),
        ),
    )
    return with_tf.select(
        "doc_id", "segment_id", "dl", F.explode_outer("tfmap").alias("term", "tf")
    ).filter(F.col("term").isNotNull())


def _make_encode_fn(block_size: int, avgdl: float):
    k1, b = K1, B

    def encode(key, pdf: pd.DataFrame) -> pd.DataFrame:
        term, segment_id, salt = key
        pdf = pdf.sort_values("doc_id")
        doc = pdf["doc_id"].to_numpy(np.int64)
        tf = pdf["tf"].to_numpy(np.int64)
        dl = pdf["dl"].to_numpy(np.int64)
        norm = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * (dl / avgdl if avgdl else 1.0)))
        rows = []
        for i, s in enumerate(range(0, len(doc), block_size)):
            d, t, l2, nm = (
                doc[s : s + block_size],
                tf[s : s + block_size],
                dl[s : s + block_size],
                norm[s : s + block_size],
            )
            gaps = np.empty_like(d)
            gaps[0] = d[0]
            gaps[1:] = np.diff(d)
            rows.append(
                {
                    "term": term,
                    "segment_id": segment_id,
                    "salt": int(salt),
                    "block_id": i,
                    "count": len(d),
                    "min_doc": int(d[0]),
                    "max_doc": int(d[-1]),
                    "max_tf_norm": float(nm.max()),
                    "doc_gaps": varint_encode(gaps.astype(np.uint64)),
                    "tfs": varint_encode(t.astype(np.uint64)),
                    "dls": varint_encode(l2.astype(np.uint64)),
                }
            )
        return pd.DataFrame(rows)

    return encode


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    index_dir: str,
    config: BuildConfig | None = None,
) -> Manifest:
    """Build (or resume) the full index at ``index_dir``. Returns the manifest."""
    cfg = config or BuildConfig()
    os.makedirs(index_dir, exist_ok=True)
    man = Manifest(index_dir, cfg.build_id)

    docs_path = os.path.join(index_dir, "docs")
    dict_path = os.path.join(index_dir, "dictionary")
    stats_path = os.path.join(index_dir, "corpus_stats")
    post_path = os.path.join(index_dir, "postings")

    # -- step 1: docs table (stored fields + dl + segment) ------------------
    def step_docs():
        ids = assign_doc_ids(transcripts)
        docs = ids.withColumn(
            "segment_id", (F.col("doc_id") / cfg.segment_size).cast("long")
        ).withColumn(
            "dl",
            F.coalesce(
                F.aggregate(
                    F.map_values(term_freqs_udf(F.col("text"))),
                    F.lit(0),
                    lambda a, x: a + x,
                ),
                F.lit(0),
            ),
        )
        (
            docs.repartition("segment_id")
            .write.mode("overwrite")
            .partitionBy("segment_id")
            .parquet(docs_path)
        )
        n = spark.read.parquet(docs_path).count()
        return n, dir_bytes(docs_path), {}

    man.run_step("docs", step_docs)
    docs = spark.read.parquet(docs_path)

    # -- step 2: corpus stats ------------------------------------------------
    def step_stats():
        stats = docs.agg(
            F.count("*").alias("n_docs"),
            F.sum("dl").alias("sum_dl"),
            F.avg("dl").alias("avgdl"),
        )
        stats.coalesce(1).write.mode("overwrite").parquet(stats_path)
        return 1, dir_bytes(stats_path), {}

    man.run_step("stats", step_stats)
    srow = spark.read.parquet(stats_path).collect()[0]
    n_docs, avgdl = int(srow["n_docs"]), float(srow["avgdl"] or 0.0)

    pairs = _tf_pairs(docs)

    # -- step 3: dictionary (term -> df, cf) ---------------------------------
    def step_dict():
        d = pairs.groupBy("term").agg(
            F.count("*").alias("df"), F.sum("tf").alias("cf")
        )
        d = d.withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(cfg.n_term_buckets)).cast("int")
        )
        d.repartition(cfg.n_term_buckets, "bucket").write.mode("overwrite").partitionBy(
            "bucket"
        ).parquet(dict_path)
        n = spark.read.parquet(dict_path).count()
        return n, dir_bytes(dict_path), {}

    man.run_step("dictionary", step_dict)
    dictionary = spark.read.parquet(dict_path)

    # -- step 4: salted, blocked, compressed postings ------------------------
    def step_postings():
        hot = dictionary.filter(F.col("df") >= cfg.hot_df_threshold).select(
            "term", F.lit(cfg.hot_salts).alias("n_salts")
        )
        p = pairs.join(F.broadcast(hot), "term", "left").withColumn(
            "n_salts", F.coalesce(F.col("n_salts"), F.lit(1))
        )
        # doc-contiguous range salt: preserves global doc order across salts
        p = p.withColumn(
            "salt",
            (
                (F.col("doc_id") % cfg.segment_size)
                * F.col("n_salts")
                / cfg.segment_size
            ).cast("int"),
        )
        encode = _make_encode_fn(cfg.block_size, avgdl)
        enc = p.groupBy("term", "segment_id", "salt").applyInPandas(
            encode, schema=POSTINGS_SCHEMA
        )
        enc = enc.withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(cfg.n_term_buckets)).cast("int")
        )
        (
            enc.repartition("bucket", "segment_id")
            .sortWithinPartitions("term", "segment_id", "salt", "block_id")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(post_path)
        )
        written = spark.read.parquet(post_path)
        agg = written.agg(
            F.count("*").alias("blocks"), F.sum("count").alias("postings")
        ).collect()[0]
        n_hot = hot.count()
        return (
            int(agg["postings"]),
            dir_bytes(post_path),
            {"blocks": int(agg["blocks"]), "hot_terms": int(n_hot)},
        )

    man.run_step("postings", step_postings)

    # -- derived build metrics (north_rule: postings/sec, bytes/partition, skew)
    post_step = man.steps["postings"]
    if post_step.duration_sec > 0 and "postings_per_sec" not in post_step.metrics:
        post_step.metrics["postings_per_sec"] = post_step.rows / post_step.duration_sec
        man._flush()
    man.commit("finalize", rows=n_docs, n_docs=n_docs, avgdl=avgdl,
               segment_size=cfg.segment_size, block_size=cfg.block_size,
               n_term_buckets=cfg.n_term_buckets)
    return man
