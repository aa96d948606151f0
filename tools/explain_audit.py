"""Generate PLANS.md: formatted Catalyst plans for the headline operators.

The scale argument for this engine is made in the physical plans — bucket
partition pruning and term pushdown on the postings scan, doc_id IN (...)
row-group pruning on the stored fetch, TakeOrderedAndProject for top-k,
WholeStageCodegen spans on the column-expression operators, broadcast joins
on bounded sides. This tool runs each headline operator at a small sf and
captures ``.explain("formatted")`` output plus a short annotation of what to
look for, so the plan audit is a read, not a re-derivation.

Usage: python tools/explain_audit.py [sf_dir] [out_md]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().rstrip()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_md = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
    )

    from pyspark.sql import functions as F

    from solr_semantic_importer_spark.index.build import BuildConfig, build_index
    from solr_semantic_importer_spark.operators.decontaminate import (
        contamination_report,
    )
    from solr_semantic_importer_spark.operators.dedup import exact_dedup
    from solr_semantic_importer_spark.operators.similarity import cosine_topk
    from solr_semantic_importer_spark.query.engine import BM25Index
    from solr_semantic_importer_spark.session import get_spark
    from solr_semantic_importer_spark.sources.transcripts import (
        transcripts_from_documents,
    )

    from solr_semantic_importer_spark.functions.function_query import (
        frange_to_sql,
    )
    from solr_semantic_importer_spark.query.select_api import solr_export

    def _mk_cursor(idx, q):
        _rows, mark = idx.search_cursor(q, k=10)
        return mark

    spark = get_spark("explain-audit", cores=8, shuffle_partitions=16)
    t = transcripts_from_documents(spark, sf_dir)
    idx_dir = tempfile.mkdtemp(prefix="ssi_plans_")
    build_index(
        spark, t, idx_dir,
        BuildConfig(segment_size=1 << 12, block_size=128, n_term_buckets=16,
                    hot_df_threshold=2000, hot_salts=8, build_id="plans"),
    )
    idx = BM25Index(spark, idx_dir)
    idx.warm()

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qv = [float(x) for x in emb.select("embedding").first()[0]]

    sections: list[tuple[str, str, object]] = [
        (
            "Pruned postings scan (the per-query read)",
            "What to check: `PartitionFilters: [bucket IN (...)]` — only the\n"
            "query terms' dictionary buckets are listed/read — and\n"
            "`PushedFilters: [In(term, ...)]` reaching the parquet scan. At\n"
            "10^12 turns this is the difference between reading a few term\n"
            "slices and reading the index. (This generic accessor exposes ALL\n"
            "columns; the search plans below show `ReadSchema` dropping\n"
            "`positions` on the WAND path — column pruning pushes the\n"
            "kernel's select into this same scan.)",
            idx.postings_for(idx.analyze_query("table merge window")),
        ),
        (
            "BM25 top-k (WAND segment kernels -> global top-k)",
            "What to check: the pruned scan above feeding ONE exchange\n"
            "(`hashpartitioning(segment_id, ...)`) into `FlatMapGroupsInPandas`\n"
            "(the Arrow block-max WAND kernel, <= k rows out per segment), then\n"
            "`TakeOrderedAndProject` — the global top-k never materializes a\n"
            "full sort; k rows per segment cross the wire, k rows reach the\n"
            "driver.",
            idx.search("table merge window", k=10, use_cache=False),
        ),
        (
            "BM25 with fq (filterCache cogroup)",
            "What to check: the same kernel shape plus a second, BOUNDED side —\n"
            "the fq's cached minority doc-id set cogrouped per segment\n"
            "(`FlatMapCoGroupsInPandas`). The docs table is scanned at most once\n"
            "per distinct fq string (filterCache persist), never per query.",
            idx.search("table merge window", k=10, fq="role = 'user'",
                       use_cache=False),
        ),
        (
            "{!join} qparser DocSet (semi-join filter)",
            "What to check: the inner query's match set reduced to DISTINCT\n"
            "from-values (an exchange sized by the inner match count, never\n"
            "the corpus) feeding a LEFT SEMI join against the docs scan —\n"
            "with AQE on, a selective inner query's key set converts to a\n"
            "broadcast at runtime, so the 10^12-doc side is never shuffled.\n"
            "The result is filter-cached under the fq string like any DocSet\n"
            "(one construction per distinct fq, ever).",
            idx._join_fq_docset("{!join from=conv_id to=conv_id}role:tool"),
        ),
        (
            "Stored-field fetch (documentCache shape)",
            "What to check: `PushedFilters: [In(doc_id, ...)]` on the docs scan —\n"
            "row-group min/max stats prune the read to the k hit groups (docs\n"
            "are written in doc_id order), so returning stored fields for a\n"
            "page costs k row-groups, not a table scan.",
            idx.search("table merge window", k=10, with_stored=True,
                       use_cache=False),
        ),
        (
            "Phrase query (positional intersection)",
            "What to check: the postings scan DOES read the positions column\n"
            "here (and only here), still bucket-pruned and term-pushed; the\n"
            "packed (doc,pos) intersection runs inside the per-segment Arrow\n"
            "kernel; `TakeOrderedAndProject` caps the result.",
            idx.search_phrase("table hash", k=10),
        ),
        (
            "Match-all under fq + tombstones",
            "What to check: the scan is the docs relation with the fq DocSet\n"
            "applied as a semi/anti join against the cached minority side and\n"
            "tombstones as a broadcast-able anti join; the page is a limit, not\n"
            "a collect-then-slice.",
            idx.match_all(k=10, fq="role = 'user'"),
        ),
        (
            "CursorMark page (keyset deep paging)",
            "What to check: the SAME kernel shape as the top-k plan — the\n"
            "keyset predicate lives INSIDE the segment kernels (applied\n"
            "before each local top-k), so no extra exchange, no offset\n"
            "prefix, and the restated round6 filter above the kernels is a\n"
            "cheap codegen'd predicate. Page depth never changes the plan.",
            idx.search_after(
                "table merge window", k=10,
                cursor=_mk_cursor(idx, "table merge window"),
            ),
        ),
        (
            "Batch retrieval (search_many: one scan, N queries)",
            "What to check: ONE pruned postings scan over the UNION of all\n"
            "query terms (`In(term, ...)` with every batch term) feeding one\n"
            "`FlatMapGroupsInPandas` (blocks decoded once per segment, shared\n"
            "across queries), then a query_id-partitioned window for the\n"
            "per-query top-k — at most n_segments x k rows per query enter\n"
            "that exchange, never the corpus.",
            idx.search_many(
                {"q1": "table merge", "q2": "vector stream"}, k=10
            ),
        ),
        (
            "/export (full sorted result set, no paging)",
            "What to check: exhaustive scorer -> join to the docs relation\n"
            "with `ReadSchema` pruned to doc_id + fl + sort field (the\n"
            "projection after the sort still pushes column pruning into the\n"
            "scan) -> a full `Sort`, NOT TakeOrderedAndProject — correct for\n"
            "an export that returns everything; nothing is collected.",
            solr_export(idx, {"q": "table merge",
                              "fl": "doc_id,score,conv_id"}),
        ),
        (
            "Result grouping (collapsed segment kernels, r4)",
            "What to check: the pruned postings scan cogrouped per segment\n"
            "with the (segment_id, doc_id, gkey) map (`FlatMapCoGroupsInPandas`\n"
            "— the collapse kernel emits at most groups-in-segment × limit\n"
            "rows per segment, never the full match set), then the join to\n"
            "(doc_id, group_field), ONE window exchange partitioned by the\n"
            "group field for rank_in_group, and the k group heads coming\n"
            "back as a `BroadcastHashJoin` (k rows) to cut the output — no\n"
            "global sort of the match set, nothing group-sized at the\n"
            "driver, and the window's input is already collapse-bounded.",
            idx.search_grouped("table merge window", "conv_id",
                               k=5, group_limit=2),
        ),
        (
            "Mixed boolean query (terms + phrase clauses, late r4)",
            "What to check: the term clauses' pruned postings decode and the\n"
            "phrase clause's positional segment kernel UNION into one\n"
            "`HashAggregate` on doc_id (partial before the exchange) that\n"
            "yields both the summed score and the matched-clause count —\n"
            "each clause contributes at most one row per doc, so no clause\n"
            "tagging, no second shuffle; `TakeOrderedAndProject` caps the\n"
            "result.",
            idx.search('merge "table hash"', k=10, use_cache=False),
        ),
        (
            "Grouped boolean query ((a OR b) AND c, session-4 r4)",
            "What to check: the nested group is ONE recursive\n"
            "boolean-matches subplan — its own pruned postings decode +\n"
            "`HashAggregate` on doc_id — unioned with the outer clauses'\n"
            "frames into the parent's single groupBy(doc_id); every\n"
            "aggregation keys on doc_id, so AQE/Exchange reuse keeps the\n"
            "recursion to one shuffle per nesting LEVEL (not per clause),\n"
            "tombstones/fq apply once at the top, and\n"
            "`TakeOrderedAndProject` caps the result. Scale note: nesting\n"
            "depth is query-bounded (human-written queries nest 1-2\n"
            "levels), so the plan grows with the query, never the corpus.",
            idx.search("(merge OR window) AND table", k=10,
                       use_cache=False),
        ),
        (
            "Facet with bucket params (in-plan limit, late r4)",
            "What to check: matched-ids decode -> join to docs ->\n"
            "`HashAggregate` on the facet field with partial aggregation,\n"
            "then `TakeOrderedAndProject` from facet.limit — the driver\n"
            "receives `limit` buckets, never a high-cardinality field's\n"
            "bucket universe (conv_id here is the corpus' highest-cardinality\n"
            "field).",
            idx.facet("table merge", "conv_id", limit=10),
        ),
        (
            "Exact dedup (hash-groupBy, 128-bit key)",
            "What to check: the shuffle key is the 16-byte `unhex(md5(text))` —\n"
            "~32 bytes/row on the wire instead of document bodies — with\n"
            "partial aggregation (`HashAggregate` before AND after the\n"
            "exchange) and WholeStageCodegen around the hash computation.",
            exact_dedup(docs, "text", "doc_id"),
        ),
        (
            "Benchmark decontamination (broadcast n-gram collision)",
            "What to check: the corpus reaches the `BroadcastHashJoin` as the\n"
            "STREAMED side with no exchange below it (tokenize -> shingle ->\n"
            "md5 hash -> explode, all codegen); the benchmark subtree builds\n"
            "the broadcast (its internal distinct shuffles bench-sized rows\n"
            "only); the single corpus-path exchange sits ABOVE the join,\n"
            "carrying only MATCHING (doc, ngram) rows into the per-doc count\n"
            "— at 10^12 docs the corpus is never shuffled.",
            contamination_report(
                docs, docs.filter(F.col("doc_id") % 97 == 0), n=8
            ),
        ),
        (
            "Exact cosine top-k (brute-force ANN baseline)",
            "What to check: a single scan with the dot product as a codegen'd\n"
            "column expression (no Python in the plan) feeding\n"
            "`TakeOrderedAndProject` — one pass, no shuffle, k rows out.",
            cosine_topk(emb, qv, k=10),
        ),
        (
            "Function-boosted top-k (bf/boost/bq, search_boosted)",
            "What to check: the scored match set joins a docs projection of\n"
            "ONLY the fields the functions read (`ReadSchema` on the docs\n"
            "scan = doc_id + ts + turn_idx here, not the full row), the\n"
            "boost arithmetic is a codegen'd `Project` (unix_millis — no\n"
            "Python), and the cut is `TakeOrderedAndProject`. The function\n"
            "can re-rank any match, so the full match set is scored exactly\n"
            "(Solr pays the same — boosted queries collect every hit).",
            idx.search_boosted(
                "table merge", k=10,
                bf=["div(turn_idx,10)"], boost="recip(ms(ts),3.16e-11,1,1)",
            ),
        ),
        (
            "Index-backed boost (termfreq x idf bf)",
            "What to check: the idf folds to a LITERAL in the codegen'd\n"
            "`Project` (a driver-side dictionary constant — no job, no\n"
            "join), while termfreq joins ONE extra pruned postings scan\n"
            "(`PartitionFilters: bucket = <boost term's bucket>`,\n"
            "`PushedFilters: In(term, [window])`) decoded by a tiny\n"
            "`MapInPandas` into (doc_id, tf) — df(term) rows on the wire,\n"
            "never the corpus — LEFT-joined and coalesced to 0.",
            idx.search_boosted(
                "table merge", k=10,
                bf=["product(termfreq(text,'window'), idf(text,'window'))"],
            ),
        ),
        (
            "frange filter DocSet ({!frange}func as fq)",
            "What to check: the compiled function-range boolean sits as a\n"
            "codegen'd `Filter` directly over the docs scan (one pass, no\n"
            "Python, no join) — the resulting minority DocSet is what the\n"
            "filterCache persists under the original fq string.",
            idx.docs().filter(
                frange_to_sql(
                    "{!frange l=1 u=3}sum(turn_idx,0)",
                    dict(idx.docs().dtypes),
                )
            ).select("doc_id"),
        ),
        (
            "Pivot / JSON-facet aggregation (one shuffle per facet node)",
            "What to check: ONE `HashAggregate` pair (partial before the\n"
            "exchange, final after) over the pivot fields — the single\n"
            "shuffle every facet level re-aggregates from; bucket stats and\n"
            "query subfacets ride the same aggregate as conditional\n"
            "expressions (no extra job per bucket, no Python). Level cuts\n"
            "(orderBy+limit / row_number windows over `limit` rows per\n"
            "parent) bound what reaches the driver.",
            idx._facet_base("table scan", None, "OR", None)
            .groupBy("role", "turn_idx")
            .agg(
                F.count("*").alias("count"),
                F.sum("dl").alias("dl_sum"),
                F.count(F.when(F.expr("turn_idx < 2"), 1)).alias("early"),
            ),
        ),
    ]

    from solr_semantic_importer_spark.functions.text_metrics import (
        token_count_ws,
    )
    from solr_semantic_importer_spark.operators.packing import stream_pack
    from solr_semantic_importer_spark.query.stream_expr import run_stream_expr

    sections.append((
        "Streaming expression: rollup(search(...)) (the /stream pipeline)",
        "What to check: the WHOLE expression compiles into ONE Catalyst\n"
        "plan — the search() source keeps the pruned postings scan\n"
        "(PushedFilters on term, bucket partition filters) and the rollup\n"
        "is a partial-agg HashAggregate pair around one Exchange; no\n"
        "tuple-iterator materialization between stream functions.",
        run_stream_expr(
            idx,
            'rollup(search(tx, q="table merge", sort="role asc"), '
            'over="role", count(*), avg(dl))',
        ),
    ))
    sections.append((
        "Sequence packing: stream_pack two-pass prefix sum",
        "What to check: NO partition-less Window (the single-task trap —\n"
        "`Window.orderBy` with no partitionBy would collapse the corpus\n"
        "into one task). The window runs partitioned by `_pid` (bounded\n"
        "per range partition) and the exclusive offsets arrive via a\n"
        "BroadcastHashJoin of a <= n_partitions-row side.",
        stream_pack(
            docs.select(F.col("doc_id").alias("id"), "text"),
            token_col=token_count_ws("text"), order_col="id",
            budget=2048, parts=8,
        ),
    ))

    lines = [
        "# PLANS.md — physical-plan audit of the headline operators",
        "",
        f"Generated by `python tools/explain_audit.py {sf_dir}` "
        "(re-run after engine changes).",
        "Each section: what the plan must show for the operator to be",
        "scale-correct at 10^12 turns, then the actual `.explain(\"formatted\")`",
        "output captured at small sf (plan SHAPE is sf-independent; only row",
        "counts change).",
        "",
    ]
    for title, check, df in sections:
        lines += [f"## {title}", "", check, "", "```", formatted(df), "```", ""]

    with open(out_md, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_md} ({len(sections)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
