"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is forced end-to-end with a noop sink (full computation, no
driver collect bottleneck).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Headline set: relational composites, dedup, text, similarity, windows,
# streaming-batch, and the MAS fan-out itself.
HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5ish",
    "tpch_q6",
    "tpch_q18ish",
    "exact_dedup",
    "normalized_dedup",
    "minhash_dedup",
    "semantic_dedup",
    "budget_select_docs",
    "text_quality",
    "quality_filter",
    "token_count",
    "token_histogram",
    "lang_id",
    "ann_bruteforce_topk",
    "ann_pq_topk",
    "chunk_dedup",
    "sessionize",
    "asof_join",
    "purchases_in_click_sessions",
    "windowed_event_counts",
    "event_rollup",
    "mas_logistic_fanout",
    "mas_firth_fanout",
    # r5 families (kept tracked round-over-round from here on): CDC
    # compaction, BM25 retrieval, time-series resample.
    "cdc_apply_orders",
    "bm25_topk_docs",
    "resample_interpolate_events",
    # r7 family: perceptual image near-dup (decode + aHash + segment
    #-blocked Hamming pairing over 520 synthesized netpbm payloads).
    "image_neardup_pairs",
    # r8 families: audio/video near-dup (real WAV decode + energy
    # fingerprint; concatenated-frames container + shared-frame votes),
    # canonical-URL dedup, derived-partsupp TPC-H q2.
    "audio_neardup_pairs",
    "video_neardup_pairs",
    "url_dedup_summary",
    "tpch_q2ish",
    # r9 families: DSIR importance resampling (two n-gram aggregate
    # passes + Gumbel top-k), the full-corpus k-NN graph (IVF bucket
    # shuffle join, salted exact per-node top-k), the 3-stage dedup
    # cascade (checkpointed stage boundaries), and span-granularity
    # benchmark decontamination (broadcast fingerprint scrub).
    "dsir_select",
    "knn_graph",
    "dedup_cascade",
    "span_decontaminate",
    # r10 families: distributed quality-classifier training (MLlib
    # LBFGS over the hashed featurization), rolling-crawl span
    # decontamination (persisted-fingerprint path), and
    # paragraph-granularity near-dup (passage tiling + per-passage
    # minhash banding + reassembly).
    "quality_classifier_train",
    "incremental_span_decontaminate",
    "paragraph_neardup_dedup",
    "incremental_dedup_cascade",
    "unicode_normalize_docs",
    # r11 families: embedding-space decontamination (IVF-bucketed,
    # broadcast benchmark probes), rolling-crawl semantic dedup (seen
    # embeddings stream, batch broadcasts), and the classifier
    # evaluation report (bucketed-AUC integer aggregate).
    "semantic_decontaminate",
    "incremental_semantic_dedup",
    "classifier_eval",
    "decontaminate_cascade",
    "ann_quantized_topk",
    # r12 family: CCNet per-language perplexity thirds (trigram-LM
    # integer micro-nat scores + grouped two-phase distributed rank),
    # bloom-routed incremental dedup (epoch KeyBloom anti-join bypass),
    # heavy-hitter n-grams (freqItems sketch + exact confirm).
    "perplexity_thirds",
    "incremental_dedup_bloom",
    "heavy_hitter_ngrams",
    # Full product lifecycle (CSV -> preprocess -> moments fit ->
    # corrections -> annotation join -> parquet sink).
    "mas_pipeline_e2e",
    # The reference's own benchmark workload (BASELINE.md): 1,800 Firth
    # regressions, 5k samples, 5 covariates — reference: 22.2 s / 8 threads.
    "mas_phewas_firth_1800",
    # BASELINE scaling endpoints: 20k samples (ref 56.5 s) and 20
    # covariates (ref 55.7 s), same Firth workload shape.
    "mas_phewas_firth_1800_n20k",
    "mas_phewas_firth_1800_c20",
]


def main() -> None:
    from pyspark.sql import SparkSession

    # Single-threaded BLAS per Python worker — with one worker per core,
    # multithreaded BLAS on the kernels' tiny matrices oversubscribes the
    # machine (see polars_mas_spark.session._BLAS_ENV).
    for _k in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
               "VECLIB_MAXIMUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(_k, "1")

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("polars-mas-spark-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    # Warm up session machinery (Hadoop FS init, codegen, parquet footer
    # path) on a 5-row table so the first timed query isn't charged for it.
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    from polars_mas_spark.queries_ext import BENCH_ONLY, _phewas_wide_parquet

    # Input setup, untimed: the reference benchmark (BASELINE.md) times
    # polars-mas against an EXISTING input file; generating the synthetic
    # PheWAS-shaped table is dataset prep, not query work. The query's
    # timed path still does all reading/preprocessing/fitting.
    if "mas_phewas_firth_1800" in HEADLINE:
        _phewas_wide_parquet(spark, SF_DIR)
    if "mas_phewas_firth_1800_n20k" in HEADLINE:
        _phewas_wide_parquet(spark, SF_DIR, n_samples=20000)
    if "mas_phewas_firth_1800_c20" in HEADLINE:
        _phewas_wide_parquet(spark, SF_DIR, n_covariates=20)
    # Flush the fixture writeback BEFORE timing starts (the
    # baseline_sweep lesson, SCALING.md): several hundred MB of dirty
    # pages from the untimed n20k/c20 fixture generation otherwise
    # flush during whichever timed queries the kernel picks, inflating
    # them 1.5-2x with a deceptively tight per-run spread.
    os.sync()

    qs = {**entry_mod.queries(), **BENCH_ONLY}
    samples: dict[str, list[float]] = {}
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    # One UNTIMED warm-up pass, then min of N timed passes (default 2).
    # The warm-up pass isolates process-lifetime one-time costs (Python
    # worker spawn + numpy/pandas imports, codegen, shuffle-service
    # init) that otherwise land on whichever entry runs them first:
    # r3's scaling endpoints timed FASTER than the 4x-smaller headline
    # run purely because the headline ran first and absorbed the
    # warm-up (VERDICT r3 "What's wrong" #4). The min over timed passes
    # stays as the load-insensitive estimator (single-shot numbers on a
    # shared box swing ±15% with background load).
    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2")))
    # Host-load canary (r13, VERDICT r12 #9 — additions-only): a fixed
    # tiny aggregate timed at the start and end of every pass. The r12
    # driver's 32-core run was uniformly inflated by host load with
    # tight per-query spreads — undetectable by min-of-2 alone; a
    # canary far above its ~0.05-0.15 s idle cost flags an inflated
    # window mechanically, so the next PERF comparison can discount it.
    canary_df = spark.read.parquet(f"{SF_DIR}/region.parquet")
    canary_sec: list[float] = []

    def canary():
        t0 = time.time()
        canary_df.groupBy("r_name").count().write.format("noop").mode(
            "overwrite"
        ).save()
        canary_sec.append(round(time.time() - t0, 3))

    for p in range(passes + 1):
        timed = p > 0
        if timed:
            canary()
        # Drop every persisted Dataset between passes: Spark's
        # CacheManager substitutes cached plans by CANONICALIZED-PLAN
        # equality, so a repeat of an identical query whose pipeline
        # persists an intermediate (run_pipeline's results table, the
        # CC edge frames, ...) would silently time a cache read instead
        # of the computation — min-of-N must measure real passes.
        spark.catalog.clearCache()
        for name in HEADLINE:
            fn = qs.get(name)
            if fn is None:
                continue
            t0 = time.time()
            try:
                df = fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                if not timed:
                    continue
                samples.setdefault(name, []).append(round(time.time() - t0, 3))
            except Exception as e:  # a failed query is reported, not fatal
                print(f"bench: {name} failed: {e}", file=sys.stderr)
                if timed:
                    samples.setdefault(name, [])
        if timed:
            canary()  # end-of-pass canary (see above)

    # min is the load-insensitive headline; spread = (max-min)/min over
    # the timed passes exposes same-process run-to-run noise so a driver
    # delta on a sub-second query can be read against it instead of
    # being mistaken for a regression (VERDICT r7 "What's wrong" #4).
    timings = {
        n: (min(ts) if ts else -1.0) for n, ts in samples.items()
    }
    spread = {
        n: round((max(ts) - min(ts)) / min(ts), 3)
        for n, ts in samples.items()
        if ts and min(ts) > 0
    }
    total = round(sum(v for v in timings.values() if v > 0), 3)
    # Key order matters: the round driver captures the TAIL of stdout,
    # and BENCH_r09.json lost the aggregate because "value" came first
    # and 41 queries + a full spread dict pushed it out (VERDICT r9
    # "What's wrong" #4). Emit the headline total LAST. Since r12 the
    # STDOUT JSON carries the FULL spread dict (VERDICT r11 #6: the
    # driver artifact must be self-contained — the r10 phantom
    # image_neardup regression was only diagnosable against the local
    # pin's spread); spread precedes queries so a hypothetical head
    # truncation eats run-to-run noise before it eats the timings.
    def emit(spread_map):
        return json.dumps(
            {
                "metric": "headline_queries_total",
                "unit": "sec",
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "passes": passes,
                "canary_sec": canary_sec,
                "spread": spread_map,
                "queries": timings,
                "value": total,
            }
        )

    print(emit(spread))
    # Pin a HEAD-local artifact (VERDICT r5 next-steps #2): the driver's
    # per-round BENCH_r{N}.json runs on a shared box whose load has
    # produced phantom 15-66% "regressions" twice; diffing it against
    # the artifact bench.py wrote at the shipped commit turns that
    # diagnosis into one file compare. Set SPARK_GRAFT_BENCH_OUT=path
    # to write (e.g. BENCH_LOCAL_r6.json). The file gets the FULL
    # spread — it has no truncation problem, and sub-25% run-to-run
    # noise is exactly what the phantom-regression diff reads.
    out = os.environ.get("SPARK_GRAFT_BENCH_OUT")
    if out:
        with open(out, "w") as fh:
            fh.write(emit(spread) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
