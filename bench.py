"""Benchmark harness: index-build throughput + BM25 query latency at sf0.1.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ...,
   "build": {...}, "latency": {...}}

Env knobs:
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] (default 32)
  SSI_BENCH_AMPLIFY    deterministic corpus amplification factor (default 32
                       -> ~160k turns at sf0.1)
  SSI_BENCH_SHUFFLE    fixed shuffle/source partition count (default 64)
  SSI_SCALING_CORES    N,4N core pair for --scaling (default 1,4)
  SSI_SCALING_AMPLIFY  amplification for --scaling legs (default 256)
  SSI_SCALING_REPS     repetitions per leg, best taken (default 2)

`--scaling` runs the same build+query job at N and 4N cores in separate
subprocess JVMs on identically-partitioned input and reports throughput at
both plus efficiency eff = T(4N) / (4 * T(N)) (see BASELINE.md "Scaling
evidence"; the sandbox stand-in for N vs 4N executors).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    ("q_hot", "table the a"),
    ("q_mixed", "merge window customer"),
    ("q_selective", "vector stream"),
    ("q_and", "spark window"),
    ("q_fq", "table scan"),
    ("q_long", "data column group order filter"),
    ("q_phrase", "table hash"),
    # r4: result grouping through the collapsed segment kernels. NOT part
    # of the headline `value` (kept comparable with r1-r3 artifacts).
    ("q_grouped", "table merge"),
    # late r4: function-boosted ranking (score x recip(ms(ts)) + bf) --
    # the exact full-match-set path; also excluded from the headline.
    ("q_boost", "table merge"),
]
HEADLINE_QUERIES = [
    n for n, _ in BENCH_QUERIES if n not in ("q_grouped", "q_boost")
]

# Canary normalization (BASELINE.md "Host variance"): the sandbox is a
# shared microVM whose effective CPU swings several-fold between runs;
# map_baseline_sec (the shuffle-free Arrow map job over the same input) is
# the per-run host-speed canary. Normalized numbers rescale every timing to
# the reference canary so BENCH artifacts are comparable ACROSS rounds:
#   normalized = raw * min(1, REFERENCE_CANARY_SEC / map_baseline_sec)
# REFERENCE_CANARY_SEC is pinned to the round-3 artifact's canary
# (BENCH_r03.json build.map_baseline_sec), making r3 the fixed point.
# One-sided: the canary detects LOAD (slow host => correct down); a quiet
# host leaves raw numbers standing (the tiny canary job can't resolve
# speedups -- its floor is scheduling noise). map_baseline_sec itself is
# min of two samples (front + back of the run) so one transient stall
# can't over-correct the whole artifact.
REFERENCE_CANARY_SEC = 5.19


def run_bench(cores: int, sf_dir: str, amplify: int, keep_index: bool = False) -> dict:
    from pyspark.sql import functions as F

    from solr_semantic_importer_spark.index.build import BuildConfig, build_index
    from solr_semantic_importer_spark.query.engine import BM25Index
    from solr_semantic_importer_spark.session import get_spark
    from solr_semantic_importer_spark.sources.transcripts import (
        amplify_transcripts,
        transcripts_from_documents,
    )

    # Fixed shuffle partitioning for every core count: identical physical
    # plan and task sizes, so a scaling run varies ONLY the executor-thread
    # count (partitions = cores would make the 2-core leg sort 31M-row
    # partitions that spill -- measuring the spill path, not the algorithm).
    shuffle_n = int(os.environ.get("SSI_BENCH_SHUFFLE", "64"))
    spark = get_spark(f"bench-{cores}", cores=cores, shuffle_partitions=shuffle_n)
    t = transcripts_from_documents(spark, sf_dir)
    t = amplify_transcripts(t, amplify)
    # materialize the input once so build timing excludes synthesis; spread
    # over shuffle_n files so the scan parallelizes regardless of the
    # upstream file count
    src_dir = tempfile.mkdtemp(prefix="ssi_bench_src_")
    t.repartition(shuffle_n).write.mode("overwrite").parquet(src_dir)
    src = spark.read.parquet(src_dir)
    n_turns = src.count()

    # perfectly-parallel baseline: same input, same Arrow/python-worker path,
    # map-only + scalar agg, NO shuffle. Its N -> 4N speedup is the HOST's
    # parallel ceiling (this sandbox's 32 vcpus saturate memory bandwidth
    # well below 32 threads); pipeline efficiency is also reported relative
    # to it ("algorithmic" efficiency, what a real cluster would add cores
    # to). See BASELINE.md "Scaling evidence".
    from solr_semantic_importer_spark.functions.analysis import term_freqs_udf

    def _canary() -> float:
        tb = time.monotonic()
        src.select(term_freqs_udf(F.col("text")).alias("m")).select(
            F.max(F.size(F.map_keys("m")))
        ).collect()
        return time.monotonic() - tb

    # sample the host-speed canary TWICE (front and back of the run) and
    # normalize by the MIN: a single sample can catch a transient stall
    # the timed sections missed, over-correcting the normalized numbers
    # into flattery; min(samples) is the conservative estimator (it can
    # only make normalized numbers WORSE, never better).
    canary_samples = [_canary()]

    # best-of-N builds (default 2): the shared sandbox host's effective CPU
    # swings several-fold run to run with OTHER tenants' load (see
    # BASELINE.md "Host variance" -- the map_baseline canary swung
    # 1.2s..13s in one afternoon). min over identical reps is the standard
    # noise-floor estimator; every rep builds the SAME input into a fresh
    # dir, nothing is cached across reps (fresh build_id per rep).
    build_reps = int(os.environ.get("SSI_BENCH_BUILD_REPS", "2"))
    build_secs: list[float] = []
    idx_dir = ""
    man = None
    for rep in range(build_reps):
        rep_dir = tempfile.mkdtemp(prefix=f"ssi_bench_idx_{rep}_")
        cfg = BuildConfig(
            segment_size=1 << 14,
            block_size=128,
            n_term_buckets=16,
            hot_df_threshold=max(1000, n_turns // 20),
            hot_salts=8,
            build_id=f"bench-{cores}-{rep}",
        )
        t0 = time.monotonic()
        man = build_index(spark, src, rep_dir, cfg)
        build_secs.append(time.monotonic() - t0)
        if rep_dir and build_secs[-1] == min(build_secs):
            if idx_dir:
                shutil.rmtree(idx_dir, ignore_errors=True)
            idx_dir = rep_dir
        else:
            shutil.rmtree(rep_dir, ignore_errors=True)
    build_sec = min(build_secs)

    idx = BM25Index(spark, idx_dir)
    # Solr firstSearcher warming (engine.warm docstring): one-time open
    # costs -- relation listings, df/bucket maps, python-worker spawn --
    # happen HERE, reported as warm_sec and counted in the headline total;
    # the per-query numbers then measure the engine on a served searcher.
    warm_sec = idx.warm()
    q_secs: dict[str, float] = {}
    lat_all: list[float] = []
    def run_query(name, q):
        if name == "q_phrase":
            return idx.search_phrase(q, k=10).collect()
        if name == "q_grouped":
            return idx.search_grouped(q, "conv_id", k=10, group_limit=2).collect()
        if name == "q_boost":
            return idx.search_boosted(
                q, k=10, bf=["div(turn_idx,10)"],
                boost="recip(ms(ts),3.16e-11,1,1)",
            ).collect()
        kw = {"fq": "role = 'user'"} if name == "q_fq" else {}
        if name == "q_and":
            # default mode: conjunction rides the segment-kernel
            # intersection path (rarest-list-driven block skipping)
            kw = {"op": "AND"}
        # use_cache=False: latency must measure the engine, not the
        # queryResultCache (repeated warm runs would otherwise be pure
        # driver-side cache hits)
        return idx.search(q, k=10, use_cache=False, **kw).collect()

    for name, q in BENCH_QUERIES:
        t1 = time.monotonic()
        run_query(name, q)
        dt = time.monotonic() - t1
        q_secs[name] = round(dt, 3)
        lat_all.append(dt)
    # repeat queries for p50/p95 (warm); also keep per-query warm best --
    # the cold first run above includes one-time costs (filter-cache fill,
    # postings listing), so warm numbers are the per-shape comparison basis
    lat_warm: list[float] = []
    q_warm: dict[str, float] = {}
    for _ in range(3):
        for name, q in BENCH_QUERIES:
            t1 = time.monotonic()
            run_query(name, q)
            dt = time.monotonic() - t1
            if name in HEADLINE_QUERIES:  # p50/p95 comparable with r1-r3
                lat_warm.append(dt)
            q_warm[name] = round(min(dt, q_warm.get(name, dt)), 3)
    lat_warm.sort()
    p50 = lat_warm[len(lat_warm) // 2]
    p95 = lat_warm[int(len(lat_warm) * 0.95) - 1]

    # batch path: the same term/bool/fq workload (phrase excluded -- it has
    # its own positional kernels) as ONE search_many job; per-query cost in
    # a batch is the offline-workload number (eval sets, mining runs)
    batch_qs = {
        n: q for n, q in BENCH_QUERIES
        if n not in ("q_phrase", "q_grouped", "q_boost")
    }
    t1 = time.monotonic()
    idx.search_many(batch_qs, k=10).collect()
    batch_sec = time.monotonic() - t1

    # vector side (reported-only, outside the headline total so r1-r3
    # artifacts stay comparable): exact cosine top-k over the sf dir's
    # embeddings table — the {!knn} qparser's plan (one codegen scan +
    # TakeOrderedAndProject)
    knn_sec = None
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.exists(emb_path):
        from solr_semantic_importer_spark.operators.similarity import (
            cosine_topk,
        )

        emb = spark.read.parquet(emb_path)
        qv = [float(x) for x in emb.select("embedding").first()[0]]
        cosine_topk(emb, qv, k=10).collect()  # warm the scan
        t1 = time.monotonic()
        cosine_topk(emb, qv, k=10).collect()
        knn_sec = round(time.monotonic() - t1, 3)

    # training-pipeline side (reported-only): the C4+Gopher quality report
    # over the sf dir's documents table — one codegen projection, so this
    # measures raw map-side text throughput
    qf_sec = qf_docs_per_sec = None
    docs_path = os.path.join(sf_dir, "documents.parquet")
    if os.path.exists(docs_path):
        from solr_semantic_importer_spark.operators.quality_filters import (
            quality_report,
        )

        from pyspark.sql import functions as F

        docs = spark.read.parquet(docs_path)
        n_qdocs = docs.count()  # warms the scan
        t1 = time.monotonic()
        quality_report(docs, "text").agg(
            F.sum(F.col("c4_keep").cast("int")),
            F.sum(F.col("gopher_keep").cast("int")),
        ).collect()
        qf_sec = round(time.monotonic() - t1, 3)
        qf_docs_per_sec = round(n_qdocs / qf_sec, 1) if qf_sec else None

    # edismax qf DisMax (reported-only, outside the headline): per-field
    # family over (text, tool). The text side REUSES the index built above
    # (same corpus, same config -- build_multi_field_index would produce
    # an identical one), so only the tiny tool-field index is built here,
    # after every timed section. Skipped in scaling legs (SSI_BENCH_DISMAX=0).
    dismax_sec = None
    if os.environ.get("SSI_BENCH_DISMAX", "1") != "0":
        import dataclasses
        import json as _json

        from solr_semantic_importer_spark.query.multifield import (
            MultiFieldIndex,
        )

        mf_dir = tempfile.mkdtemp(prefix="ssi_bench_mf_")
        os.symlink(idx_dir, os.path.join(mf_dir, "field=text"))
        tool_cfg = dataclasses.replace(
            cfg, text_col="tool", build_id=f"bench-tool-{cores}"
        )
        build_index(spark, src, os.path.join(mf_dir, "field=tool"), tool_cfg)
        with open(os.path.join(mf_dir, "fields.json"), "w") as fh:
            _json.dump({"fields": ["text", "tool"],
                        "analyzers": {"text": cfg.analyzer,
                                      "tool": cfg.analyzer}}, fh)
        mf = MultiFieldIndex(spark, mf_dir)
        dm = dict(qf={"text": 1.0, "tool": 2.0}, tie=0.3, k=10)
        mf.search("tool_3^2 error table", **dm).collect()  # warm
        t1 = time.monotonic()
        mf.search("tool_3^2 error table", **dm).collect()
        dismax_sec = round(time.monotonic() - t1, 3)
        shutil.rmtree(mf_dir, ignore_errors=True)

    canary_samples.append(_canary())  # back-of-run sample (min wins)

    post = man.steps.get("postings")
    result = {
        "cores": cores,
        "n_turns": n_turns,
        "baseline_sec": round(min(canary_samples), 2),
        "canary_samples": [round(c, 2) for c in canary_samples],
        "build_sec": round(build_sec, 2),
        "build_secs_all": [round(s, 2) for s in build_secs],
        "warm_sec": round(warm_sec, 2),
        "turns_per_sec": round(n_turns / build_sec, 1),
        "postings": post.rows if post else 0,
        "postings_per_sec": round(post.rows / build_sec, 1) if post else 0,
        # north_rule build metrics: bytes/posting, bytes/partition, skew
        "postings_metrics": dict(post.metrics) if post else {},
        "query_p50_sec": round(p50, 3),
        "query_p95_sec": round(p95, 3),
        "queries": q_secs,
        "queries_warm": q_warm,
        "batch_queries_sec": round(batch_sec, 3),
        "batch_per_query_sec": round(batch_sec / len(batch_qs), 3),
        "knn_exact_topk_sec": knn_sec,
        "dismax_qf_sec": dismax_sec,
        "quality_filter_sec": qf_sec,
        "quality_filter_docs_per_sec": qf_docs_per_sec,
    }
    spark.stop()
    shutil.rmtree(src_dir, ignore_errors=True)
    if not keep_index:
        shutil.rmtree(idx_dir, ignore_errors=True)
    return result


def run_pipeline_bench(cores: int, sf_dir: str, amplify: int) -> dict:
    """The LLM-training-data pipeline end-to-end (VERDICT r4 item 8):
    quality filter -> near-dup dedup (MinHash-LSH -> connected components
    -> verdict) -> benchmark decontamination -> deterministic sampling ->
    sequence packing, CHAINED over the sf dir's documents table. Each
    stage materializes to parquet (the checkpointed-stage shape a real
    pipeline has) and is timed separately; docs/sec is per-stage input
    throughput.

    Amplification plants a REALISTIC dup structure: each source doc gets
    ``amplify`` replicas -- even replicas append one marker token (near
    duplicates, a clique per source doc for the dedup stage to collapse),
    odd replicas interleave a replica-specific token between every word
    (distinct shingle sets: unique docs that must SURVIVE dedup)."""
    from pyspark.sql import functions as F

    from solr_semantic_importer_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signature,
        neardup_dedup,
    )
    from solr_semantic_importer_spark.operators.decontaminate import (
        decontaminate,
    )
    from solr_semantic_importer_spark.operators.packing import (
        packing_stats,
        stream_pack,
    )
    from solr_semantic_importer_spark.operators.quality_filters import (
        apply_quality_filters,
    )
    from solr_semantic_importer_spark.operators.sampling import hash_sample
    from solr_semantic_importer_spark.session import get_spark

    shuffle_n = int(os.environ.get("SSI_BENCH_SHUFFLE", "64"))
    spark = get_spark(f"pipe-{cores}", cores=cores,
                      shuffle_partitions=shuffle_n)
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    rep = F.col("__rep")
    marker = F.concat(F.lit("m"), F.col("doc_id") % 1000, F.lit("r"), rep)
    amplified = (
        base.select(
            "doc_id", "text",
            F.explode(F.sequence(F.lit(0), F.lit(amplify - 1))).alias("__rep"),
        )
        .select(
            (F.col("doc_id") * amplify + rep).alias("doc_id"),
            F.when(rep % 2 == 0, F.concat_ws(" ", "text", marker))
            .otherwise(
                F.array_join(
                    F.transform(
                        F.split("text", r"\s+"),
                        lambda w: F.concat(w, F.lit(" u"), rep),
                    ),
                    " ",
                )
            ).alias("text"),
        )
    )
    work = tempfile.mkdtemp(prefix="ssi_pipe_")
    amplified.repartition(shuffle_n).write.parquet(f"{work}/src")
    docs = spark.read.parquet(f"{work}/src")
    n_in = docs.count()

    stages: dict[str, dict] = {}

    def stage(name, fn, inp):
        t0 = time.monotonic()
        out_df = fn(inp)
        out_df.write.parquet(f"{work}/{name}")
        out = spark.read.parquet(f"{work}/{name}")
        n_out = out.count()
        sec = time.monotonic() - t0
        n_inp = stages[list(stages)[-1]]["docs_out"] if stages else n_in
        stages[name] = {
            "sec": round(sec, 2),
            "docs_in": n_inp,
            "docs_out": n_out,
            "docs_per_sec": round(n_inp / sec, 1),
        }
        return out

    t_all = time.monotonic()
    # thresholds fitted to the synthetic single-line word-soup corpus
    # (no sentences, no English stopwords): the COMPUTED signal set — and
    # therefore the measured throughput — is identical to the paper
    # thresholds; only the cut points move so the stage discriminates
    # instead of dropping everything
    cur = stage("quality", lambda d: apply_quality_filters(
        d, "text", rule="gopher", min_words=10, min_stop_hits=0), docs)

    def _dedup(d):
        sig = minhash_signature(d, "doc_id", "text", n_hashes=16)
        pairs = lsh_candidate_pairs(sig, n_hashes=16, band_size=4,
                                    max_bucket=500)
        return neardup_dedup(d, pairs, id_col="doc_id")

    cur = stage("dedup", _dedup, cur)

    # stand-in eval suite: a deterministic 0.2% hash sample of the
    # deduped corpus — planted contamination the stage must find
    bench_set = hash_sample(cur, 0.002, seed=7).select("text")
    bench_set.persist().count()
    cur = stage("decontam", lambda d: decontaminate(
        d, bench_set, id_col="doc_id", text_col="text"), cur)
    cur = stage("sample", lambda d: hash_sample(d, 0.5, seed=13), cur)

    def _pack(d):
        return stream_pack(
            d.withColumn("n_tok", F.size(F.split("text", r"\s+"))),
            token_col="n_tok", order_col="doc_id", budget=1024,
        )

    packed = stage("pack", _pack, cur)
    total = time.monotonic() - t_all
    fill = packing_stats(packed, budget=1024, seq_col="seq_id").agg(
        F.avg("fill_milli")).collect()[0][0]
    result = {
        "cores": cores,
        "docs_in": n_in,
        "stages": stages,
        "total_sec": round(total, 2),
        "docs_per_sec_end_to_end": round(n_in / total, 1),
        "pack_fill_milli": round(float(fill), 1) if fill is not None else None,
        "dup_drop_frac": round(
            1 - stages["dedup"]["docs_out"] / stages["dedup"]["docs_in"], 4),
    }
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    return result


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    amplify = int(os.environ.get("SSI_BENCH_AMPLIFY", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    if "--pipeline" in sys.argv:
        amp = int(os.environ.get("SSI_PIPE_AMPLIFY", "32"))
        r = run_pipeline_bench(cores, sf_dir, amp)
        r["metric"] = "llm_pipeline_end_to_end_sec"
        r["value"] = r["total_sec"]
        r["unit"] = "sec"
        r["sf"] = float(sf) if sf.replace(".", "").isdigit() else sf
        print(json.dumps(r))
        return

    if "--scaling" in sys.argv:
        # N vs 4N cores. Default 1 vs 4: the window where THIS HOST itself
        # still scales (its 32 vcpus saturate well below 32 threads -- see
        # BASELINE.md "Scaling evidence"); each task is 1 JVM thread + 1
        # python worker, both CPU-busy in UDF stages, so higher pairs
        # measure host oversubscription, not the algorithm. A map-only
        # baseline job is timed per leg as the host's parallel ceiling.
        cores_pair = [
            int(x)
            for x in os.environ.get("SSI_SCALING_CORES", "1,4").split(",")
        ]
        amp = int(os.environ.get("SSI_SCALING_AMPLIFY", "256"))
        reps = int(os.environ.get("SSI_SCALING_REPS", "2"))
        results = {}
        for c in cores_pair:
            best = None
            runs = []
            for _ in range(reps):
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--single", str(c)],
                    capture_output=True,
                    text=True,
                    env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir,
                         "SSI_BENCH_AMPLIFY": str(amp),
                         # scaling legs already repeat whole subprocesses
                         # (best-of-reps); one build per leg, no dismax side
                         "SSI_BENCH_BUILD_REPS": "1",
                         "SSI_BENCH_DISMAX": "0"},
                )
                line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
                r = json.loads(line)
                runs.append(
                    {"build_sec": r["build_sec"], "baseline_sec": r["baseline_sec"]}
                )
                if best is None or r["build_sec"] < best["build_sec"]:
                    best = r
            best["all_runs"] = runs  # best-of-reps vs single-host noise
            results[c] = best
        n, n4 = cores_pair
        factor = n4 / n
        tn, t4n = results[n]["turns_per_sec"], results[n4]["turns_per_sec"]
        eff = t4n / (factor * tn)
        bn = min(r["baseline_sec"] for r in results[n]["all_runs"])
        b4n = min(r["baseline_sec"] for r in results[n4]["all_runs"])
        host_eff = bn / (factor * b4n)  # map-only job: the host's own ceiling
        print(
            json.dumps(
                {
                    "scaling": results,
                    "cores": cores_pair,
                    f"efficiency_{n}_to_{n4}": round(eff, 3),
                    "host_parallel_ceiling_efficiency": round(host_eff, 3),
                    "efficiency_vs_host_ceiling": round(min(eff / host_eff, 1.5), 3),
                }
            )
        )
        return

    if "--single" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--single") + 1])
        print(json.dumps(run_bench(cores, sf_dir, amplify)))
        return

    r = run_bench(cores, sf_dir, amplify)
    # headline total sums the r1-r3 query set only (q_grouped reported but
    # excluded) so `value` stays comparable across round artifacts
    total = r["build_sec"] + r["warm_sec"] + sum(
        v for k, v in r["queries"].items() if k in HEADLINE_QUERIES
    )
    # one-sided normalization: the canary DETECTS load (it gets large when
    # the host is oversubscribed) but cannot resolve speedups -- on a quiet
    # host the tiny map job bottoms out at scheduling-floor noise (observed
    # 0.6s..13s for the identical job in one afternoon). So timings are
    # corrected DOWN when the canary shows a slower-than-reference host and
    # left raw otherwise; normalized numbers can flatter a slow run but
    # never inflate a quiet one into fiction.
    scale = min(1.0, REFERENCE_CANARY_SEC / r["baseline_sec"])
    print(
        json.dumps(
            {
                "metric": "index_build_plus_query_sec",
                "value": round(total, 2),
                "value_normalized": round(total * scale, 2),
                "unit": "sec",
                "queries": r["queries"],
                "queries_warm": r["queries_warm"],
                "queries_normalized": {
                    k: round(v * scale, 3) for k, v in r["queries"].items()
                },
                "queries_warm_normalized": {
                    k: round(v * scale, 3) for k, v in r["queries_warm"].items()
                },
                "normalization": {
                    "reference_canary_sec": REFERENCE_CANARY_SEC,
                    "map_baseline_sec": r["baseline_sec"],
                    "scale": round(scale, 4),
                    "formula": (
                        "normalized = raw * reference_canary_sec / "
                        "map_baseline_sec (reference = BENCH_r03 canary)"
                    ),
                },
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "build": {
                    "n_turns": r["n_turns"],
                    "build_sec": r["build_sec"],
                    "build_secs_all": r["build_secs_all"],
                    "warm_sec": r["warm_sec"],
                    "turns_per_sec": r["turns_per_sec"],
                    "postings": r["postings"],
                    "postings_per_sec": r["postings_per_sec"],
                    "postings_metrics": r["postings_metrics"],
                    # host-speed canary: the map-only (no shuffle) Arrow job
                    # over the same input. The sandbox host's effective CPU
                    # fluctuates run to run (shared machine); engine numbers
                    # from different runs are comparable only after dividing
                    # out this baseline. See BASELINE.md "Host variance".
                    "map_baseline_sec": r["baseline_sec"],
                },
                "latency": {
                    "batch_queries_sec": r["batch_queries_sec"],
                    "batch_per_query_sec": r["batch_per_query_sec"],
                    "query_p50_sec": r["query_p50_sec"],
                    "query_p95_sec": r["query_p95_sec"],
                    "knn_exact_topk_sec": r["knn_exact_topk_sec"],
                    "dismax_qf_sec": r["dismax_qf_sec"],
                    "quality_filter_sec": r["quality_filter_sec"],
                    "quality_filter_docs_per_sec": r["quality_filter_docs_per_sec"],
                },
            }
        )
    )


if __name__ == "__main__":
    main()
