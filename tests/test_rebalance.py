"""The r12 opt-in scan rebalance (queries._rebalance / _tr): fires only
on single-split scans of non-tiny files, targets the session's core
count, and never changes results."""

import os

from pyspark.sql import functions as F

from polars_mas_spark.queries import _REBALANCE_MIN_BYTES, _rebalance, _t, _tr

SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]
# The bench scale: sf0.01's files sit below the size floor, so the
# rebalance is deliberately a NO-OP at the driver's correctness SF —
# the firing behavior is asserted against sf0.1 (read-only testdata).
SF_BENCH = "/root/testdata/sf0.1"


def test_rebalance_unstarves_single_split_scan(spark):
    path = f"{SF_BENCH}/documents.parquet"
    assert os.path.getsize(path) >= _REBALANCE_MIN_BYTES
    df = spark.read.parquet(path)
    out = _rebalance(df, spark, path)
    assert (
        out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    )


def test_rebalance_skips_tiny_dimension_tables(spark):
    # region is a broadcast dim — a pre-broadcast shuffle would be pure
    # overhead, so files under the size floor stay untouched.
    path = f"{SF_DIR}/region.parquet"
    assert os.path.getsize(path) < _REBALANCE_MIN_BYTES
    df = spark.read.parquet(path)
    out = _rebalance(df, spark, path)
    assert out is df


def test_rebalance_skips_missing_path(spark):
    df = spark.range(5)
    assert _rebalance(df, spark, "/nonexistent/nowhere.parquet") is df


def test_tr_result_identical_to_t(spark):
    a = _t(spark, SF_DIR, "documents").orderBy("doc_id").collect()
    b = _tr(spark, SF_DIR, "documents").orderBy("doc_id").collect()
    assert a == b


def test_rebalance_preserves_scan_pushdown(spark):
    # Filter and column pruning must still reach the scan through the
    # inserted round-robin exchange (guide §6: PushedFilters/ReadSchema).
    from polars_mas_spark.plans import formatted_plan

    df = _tr(spark, SF_BENCH, "documents").filter(
        F.col("doc_id") < 10
    ).select("doc_id", "lang")
    plan = formatted_plan(df)
    scan = [
        ln for ln in plan.splitlines() if "PushedFilters" in ln
    ]
    assert scan and "LessThan(doc_id,10)" in scan[0], scan
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs and "text" not in rs[0], rs
