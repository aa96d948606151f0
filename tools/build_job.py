"""spark-submit entry point: build (or resume) an index, then smoke-query it.

Ships via ``--py-files <package zip>`` (north_rule packaging clause):

    spark-submit --master local[8] \\
        --py-files /tmp/solr_semantic_importer_spark.zip \\
        tools/build_job.py --from-documents /root/testdata/sf0.001 \\
        --index-dir /tmp/idx --query "table merge window"

Use tools/submit_build.py to zip the package and launch in one step. The
script only uses the SparkSession given by spark-submit (master, executor
conf all come from the submit command line -- nothing here assumes local
mode), so the same artifact runs on a real N-executor cluster unchanged.

Prints one JSON line of build metrics (per-step rows/bytes/duration from the
manifest -- postings/sec, skew factor, lineage) and the top-k result.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", help="transcripts parquet path")
    ap.add_argument("--from-documents", help="sf dir: derive transcripts from documents.parquet")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--build-id", default="submit-0")
    ap.add_argument("--segment-size", type=int, default=1 << 14)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--n-term-buckets", type=int, default=16)
    ap.add_argument("--hot-df-threshold", type=int, default=10_000)
    ap.add_argument("--hot-salts", type=int, default=8)
    ap.add_argument("--query", default=None, help="smoke BM25 query after build")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--analyzer", default="text_general",
                    help="analysis chain (text_general/text_en/text_en_splitting/...)")
    ap.add_argument("--delete-query", default=None,
                    help="post-build delete-by-query predicate (tombstones)")
    ap.add_argument("--merge", action="store_true",
                    help="tiered segment merge after build/appends")
    ap.add_argument("--compact", action="store_true",
                    help="compact (apply tombstones permanently; generation publish)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ssi-build-job").getOrCreate()

    # imports resolve from the --py-files zip on driver AND executors
    from solr_semantic_importer_spark.index.build import BuildConfig, build_index
    from solr_semantic_importer_spark.query.engine import BM25Index
    from solr_semantic_importer_spark.sources.transcripts import (
        transcripts_from_documents,
    )

    if args.from_documents:
        src = transcripts_from_documents(spark, args.from_documents)
    elif args.source:
        src = spark.read.parquet(args.source)
    else:
        print("need --source or --from-documents", file=sys.stderr)
        sys.exit(2)

    cfg = BuildConfig(
        segment_size=args.segment_size,
        block_size=args.block_size,
        n_term_buckets=args.n_term_buckets,
        hot_df_threshold=args.hot_df_threshold,
        hot_salts=args.hot_salts,
        build_id=args.build_id,
        analyzer=args.analyzer,
    )
    man = build_index(spark, src, args.index_dir, cfg)
    metrics = {
        name: {
            "rows": s.rows,
            "bytes": s.bytes,
            "duration_sec": round(s.duration_sec, 2),
            **s.metrics,
        }
        for name, s in man.steps.items()
    }
    out = {"index_dir": args.index_dir, "build_id": args.build_id, "steps": metrics}
    if args.merge:
        from solr_semantic_importer_spark.index.merge import merge_postings

        out["merge"] = merge_postings(spark, args.index_dir, merge_id=args.build_id)
    idx = BM25Index(spark, args.index_dir)
    if args.delete_query:
        out["deleted"] = idx.delete_by_query(args.delete_query)
    if args.compact:
        idx = idx.compact()
        out["compacted_generation"] = idx.data_dir
    if args.query:
        res = idx.search(args.query, k=args.k).collect()
        out["query"] = args.query
        out["topk"] = [[int(r["doc_id"]), round(float(r["score"]), 6)] for r in res]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
