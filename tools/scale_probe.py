"""Empirical scaling probe: time a representative operator set at two
scale factors (default sf0.01 -> sf0.1, a 10x data step) and report the
wall-time ratio per query alongside its shuffle count, so the "would
this survive 100x?" argument rests on measurements, not vibes.

Interpretation guide (this box, local[32]):
- ratio ~1x       driver-latency-bound — the job floor (~0.3-1 s per
                  Spark action) dominates at both SFs; compute is not
                  yet visible. Expect linear behaviour from whatever
                  the plan audit says about its shuffle structure.
- ratio ~<=10x    at-most-linear in data — the plan's claim ("one
                  hash shuffle", "map-only") is holding.
- ratio >>10x     super-linear — a pair blow-up or quadratic
                  expression; investigate before trusting at scale.

Usage: python tools/scale_probe.py [--passes N] [name ...]
Prints one line per query and a trailing JSON summary.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

SF_SMALL = os.environ.get("SCALE_PROBE_SMALL", "/root/testdata/sf0.01")
SF_BIG = os.environ.get("SCALE_PROBE_BIG", "/root/testdata/sf0.1")

# Representative spread: map-only text ops, shuffle-light dedup, window
# family, relational composites, ANN tiers, and the MAS fan-out.
DEFAULT_QUERIES = [
    "text_quality", "lang_id", "model_quality_score",
    "exact_dedup", "minhash_dedup", "chunk_dedup", "semantic_dedup",
    "sessionize", "asof_join", "windowed_event_counts",
    "tpch_q1", "tpch_q3", "tpch_q18ish",
    "ann_bruteforce_topk", "ann_pq_topk",
    "mas_logistic_fanout", "mas_firth_fanout",
    "pack_docs", "ngram_contamination", "winnow_pairs",
    "fuzzy_pairs", "cohort_retention", "scd2_merge_customers",
    "event_pivot",
    # r5 operators
    "budget_select_docs", "top_fraction_per_source", "normalized_dedup",
    "jl_project_embeddings", "hard_negatives", "temperature_mixture_docs",
    # r5 second wave: time-series resample, weighted sampling, vocab
    # encoding, maintenance family, Poisson kernel
    "resample_interpolate_events", "weighted_sample_docs",
    "vocab_encode_sources", "snapshot_diff_customers", "cdc_apply_orders",
    "dq_checks_orders", "drift_psi_acctbal", "table_digest_customer",
    "quantile_profile_orders", "covariate_corr", "mas_poisson_rate_golden",
    # r9 operators: alignment-free span dedup, incremental near-dup,
    # BPE counting + the budget cap re-bound on it
    "span_dedup", "incremental_minhash_dedup", "bpe_token_count",
    "cap_bpe_tokens_per_source",
    # r9 late wave: DSIR importance resampling and the full-corpus kNN
    # graph (the bucket-join pair count grows ~quadratically in bucket
    # occupancy at FIXED n_centroids — at real scale n_centroids grows
    # with the corpus; the probe documents the fixed-k=16 behaviour)
    "dsir_select", "knn_graph",
    # r9 final wave: HTML extraction (map-only), span decontamination
    # (broadcast fingerprint scrub), the 3-stage dedup cascade, and
    # curriculum bucketing (two-phase rank)
    "html_extract_docs", "span_decontaminate", "dedup_cascade",
    "curriculum_stages",
]


def _time_query(spark, fn, sf_dir, passes):
    best = float("inf")
    for _ in range(passes):
        # Same rationale as bench.py: CacheManager matches persisted
        # plans by canonicalized equality, so without this a second
        # identical pass of a persisting query (e.g. the MAS fan-out's
        # results table) times a cache read, not the computation —
        # observed as a bogus 4.7 s for an 8-fit 6M-row Firth fan-out.
        spark.catalog.clearCache()
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from polars_mas_spark.plans import formatted_plan
    from polars_mas_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from polars_mas_spark.queries_ext import BENCH_ONLY

    qs = {**entry_mod.queries(), **BENCH_ONLY}
    names = args.names or [n for n in DEFAULT_QUERIES if n in qs]
    rows = []
    for name in names:
        fn = qs[name]
        plan = formatted_plan(fn(spark, SF_SMALL))
        n_exchanges = len(re.findall(r"\bExchange\b", plan))
        # Untimed warm-up at BOTH scale factors (codegen + broadcast +
        # shuffle-file warm) — asymmetric warm-up would inflate the
        # ratio, the very metric this tool exists to measure.
        _time_query(spark, fn, SF_SMALL, 1)
        t_small = _time_query(spark, fn, SF_SMALL, args.passes)
        _time_query(spark, fn, SF_BIG, 1)
        t_big = _time_query(spark, fn, SF_BIG, args.passes)
        ratio = t_big / t_small if t_small > 0 else float("inf")
        rows.append(
            {
                "query": name,
                "t_small_s": round(t_small, 3),
                "t_big_s": round(t_big, 3),
                "ratio_10x_data": round(ratio, 2),
                "exchanges": n_exchanges,
            }
        )
        print(
            f"{name:28s} {t_small:7.2f}s -> {t_big:7.2f}s"
            f"  ratio {ratio:5.2f}x  exchanges {n_exchanges}",
            flush=True,
        )
    print(json.dumps({"small": SF_SMALL, "big": SF_BIG, "rows": rows}))


if __name__ == "__main__":
    main()
