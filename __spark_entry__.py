"""Driver contract for the spark-graft builder (PySpark target).

Delegates to the engine's query registry (polars_mas_spark.queries /
queries_ext): each registered operator query has a (spark_fn, oracle_sql)
pair; the driver compares them via DuckDB at sf=0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# Cap BLAS threading before any Spark JVM (and hence any local-mode
# Python worker) spawns: one worker per core + multithreaded BLAS on the
# regression kernels' tiny matrices oversubscribes the machine
# (polars_mas_spark.session._BLAS_ENV has the measurements).
for _k in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "VECLIB_MAXIMUM_THREADS", "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_k, "1")

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from polars_mas_spark import queries as _q  # noqa: E402
from polars_mas_spark import queries_ext as _qe  # noqa: E402  (registers extension queries)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full distributed MAS pipeline (unpivot -> groupBy ->
    applyInPandas logistic kernel -> bonferroni) on sf0.001."""
    return _qe.q_mas_logistic_fanout(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLES)
