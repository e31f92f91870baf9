"""Row-by-row sweep of EVERY runtime row in BASELINE.md: the reference's
PheWAS benchmark grid (sample scaling 1k/5k/10k/15k/20k at 5 covariates;
covariate scaling 1/3/5/10/15/20 at 5k samples; ~1,800 Firth fits each),
timed with bench.py's methodology (untimed warm-up pass, min of 2 COLD
passes — clearCache between, noop sink) on local[$SPARK_GRAFT_CPUS].

Prints a markdown table comparing each row against the reference's
published wall times (BASELINE.md; Xeon 6132, 8 threads) plus one JSON
line for tooling. Fixture generation (the reference benchmarks against
a pre-existing input file) is untimed, mirroring bench.py.

Usage: python tools/baseline_sweep.py [--passes N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
if PASSES < 1:
    # Fail at startup, not with a TypeError on round(None) AFTER the
    # full untimed fixture generation has already run (ADVICE r8).
    raise SystemExit(f"SPARK_GRAFT_BENCH_PASSES must be >= 1, got {PASSES}")

for _k in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "VECLIB_MAXIMUM_THREADS", "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_k, "1")

# (label, n_samples, n_covariates, reference_seconds, baseline_source)
GRID = [
    ("samples=1k", 1000, 5, 7.3, "BASELINE.md:18"),
    ("samples=5k", 5000, 5, 22.2, "BASELINE.md:19"),
    ("samples=10k", 10000, 5, 33.2, "BASELINE.md:20"),
    ("samples=15k", 15000, 5, 42.5, "BASELINE.md:21"),
    ("samples=20k", 20000, 5, 56.5, "BASELINE.md:22"),
    ("cov=1", 5000, 1, 17.2, "BASELINE.md:30"),
    ("cov=3", 5000, 3, 19.9, "BASELINE.md:31"),
    ("cov=10", 5000, 10, 26.8, "BASELINE.md:33"),
    ("cov=15", 5000, 15, 41.1, "BASELINE.md:34"),
    ("cov=20", 5000, 20, 55.7, "BASELINE.md:35"),
]


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("pms-baseline-sweep")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from polars_mas_spark.queries_ext import (
        _phewas_wide_parquet, _run_phewas,
    )

    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    # Untimed input prep, mirroring bench.py. sync() afterwards: the 10
    # freshly-written wide fixtures (~1 GB) otherwise flush from the
    # page cache DURING the first timed config's passes — measured 28 s
    # for a config that times 6.3 s in a clean session.
    for _, n, c, _, _ in GRID:
        _phewas_wide_parquet(spark, SF_DIR, n_samples=n, n_covariates=c)
    os.sync()
    time.sleep(5)

    results = []
    for label, n, c, ref, src in GRID:
        best = None
        for p in range(PASSES + 1):
            spark.catalog.clearCache()
            t0 = time.time()
            df = _run_phewas(
                spark, SF_DIR, n_phecodes=1800, n_samples=n, n_covariates=c
            )
            df.write.format("noop").mode("overwrite").save()
            t = time.time() - t0
            if p > 0:
                best = t if best is None else min(best, t)
        results.append((label, n, c, round(best, 2), ref, src))
        print(f"# {label}: {best:.2f} s (reference {ref} s)", file=sys.stderr)

    print("| config | engine (local[%s], cold min-of-%d) | reference "
          "(8 threads) | margin |" % (CPUS, PASSES))
    print("|---|---|---|---|")
    for label, n, c, t, ref, src in results:
        print(f"| {label} | {t} s | {ref} s ({src}) | "
              f"**{ref / t:.1f}x faster** |")
    print(json.dumps({
        "sf_dir": SF_DIR,
        "rows": [
            {"config": label, "n_samples": n, "n_covariates": c,
             "engine_s": t, "reference_s": ref}
            for label, n, c, t, ref, src in results
        ],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
