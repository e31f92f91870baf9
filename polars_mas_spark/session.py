"""SparkSession construction with scale-appropriate defaults.

One place to encode the engine's Spark tuning philosophy:

- AQE on (runtime coalescing, skew-join splitting) — at the 100 TB
  target the static shuffle-partition count is always wrong somewhere;
  AQE re-plans per stage.
- Arrow on for every executor<->Python boundary (the regression kernels
  and all extension Pandas UDFs move batches, not rows).
- Shuffle partitions sized for the local test harness via env; a real
  cluster deployment overrides via spark-defaults / --conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


# One BLAS/OpenMP thread per task: the regression kernels solve tiny
# (n x ~10) systems where multithreaded BLAS is pure overhead, and with
# every core already running its own Python worker, k workers x k BLAS
# threads oversubscribes the machine k-fold (measured 7.7x slowdown on
# the 1,800-fit PheWAS fan-out). Same role as the reference's
# threadpool_limits(num_threads) (analysis.py:50) — SURVEY.md §2.11 K6.
_BLAS_ENV = {
    "OMP_NUM_THREADS": "1",
    "OPENBLAS_NUM_THREADS": "1",
    "MKL_NUM_THREADS": "1",
    "VECLIB_MAXIMUM_THREADS": "1",
    "NUMEXPR_NUM_THREADS": "1",
}


def get_spark(
    app_name: str = "polars-mas-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # Local-mode Python workers inherit the driver process environment;
    # cluster executors get the same caps via spark.executorEnv below.
    for key, value in _BLAS_ENV.items():
        os.environ.setdefault(key, value)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # CPU-heavy map operators (media decode, winnowing, per-token
    # hashing) over COMPACT parquet starve for parallelism under the
    # IO-tuned 128 MB default split: snappy text compresses ~10x, so a
    # 50 MB file holding minutes of decode work becomes 1-2 tasks
    # (observed: winnow at 10x data pinned one core for 6+ min while 31
    # idled). At real scale files are plentiful and this knob is moot;
    # for single-file fixtures set it to ~the file size / cores.
    mpb = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES")
    if mpb:
        builder = builder.config("spark.sql.files.maxPartitionBytes", mpb)
    for key, value in _BLAS_ENV.items():
        builder = builder.config(f"spark.executorEnv.{key}", value)
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
