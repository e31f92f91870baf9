"""A/B micro-bench for reconciling regressions: time a named query set
with bench.py's exact methodology (one untimed warm-up pass, then min of
N timed passes, noop sink) against whichever repo root is FIRST on
sys.path — run it as ``python tools/bench_ab.py <repo_root> q1 q2 ...``
from any checkout/worktree so two code versions are measured with the
SAME harness on the SAME testdata.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.abspath(sys.argv[1])
NAMES = sys.argv[2:]
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))

for _k in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "VECLIB_MAXIMUM_THREADS", "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_k, "1")

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("bench-ab")
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry_mod  # noqa: E402

spark.read.parquet(f"{SF_DIR}/region.parquet").count()

from polars_mas_spark.queries_ext import BENCH_ONLY, _phewas_wide_parquet  # noqa: E402

# Untimed input prep for the PheWAS fixtures (mirrors bench.py).
for name in NAMES:
    if name == "mas_phewas_firth_1800":
        _phewas_wide_parquet(spark, SF_DIR)
    elif name == "mas_phewas_firth_1800_n20k":
        _phewas_wide_parquet(spark, SF_DIR, n_samples=20000)
    elif name == "mas_phewas_firth_1800_c20":
        _phewas_wide_parquet(spark, SF_DIR, n_covariates=20)
# Drain the fixture write's dirty pages OUTSIDE the timed passes (the
# r9 bench.py lesson; without it the n20k fixture's ~300 MB writeback
# lands inside pass 1 and the query flaps 8 <-> 13 s with a
# deceptively tight per-run spread — reproduced r12).
os.sync()

qs = {**entry_mod.queries(), **BENCH_ONLY}
timings: dict[str, float] = {}
for p in range(PASSES + 1):
    timed = p > 0
    # Same cold-cache discipline as bench.py (r7): CacheManager would
    # otherwise substitute pass-1 persisted plans and time a cache read.
    spark.catalog.clearCache()
    for name in NAMES:
        fn = qs[name]
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        if timed:
            t = round(time.time() - t0, 3)
            prev = timings.get(name)
            timings[name] = t if prev is None else min(prev, t)

print(json.dumps({"root": ROOT, "queries": timings}))
spark.stop()
