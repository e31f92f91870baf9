"""The r12 opt-in scan rebalance (queries._rebalance / _tr): fires only
on single-split scans of non-tiny files, targets the session's core
count, and never changes results."""

import os

from pyspark.sql import functions as F

from polars_mas_spark.queries import _REBALANCE_MIN_BYTES, _rebalance, _t, _tr

SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]
# The rebalance must be a NO-OP at the driver's correctness SF (sf0.01)
# for every table a query opts into via _tr, and must FIRE at the bench
# SF (sf0.1) — test_tr_noop_at_correctness_sf pins both sides of the
# size-floor boundary so testdata regeneration cannot silently flip
# which SFs repartition (ADVICE r12: the old 128 KiB floor was below
# sf0.01's embeddings.parquet and the stated no-op was false).
SF_BENCH = "/root/testdata/sf0.1"

# Tables read through _tr anywhere in the registry (grep '_tr(spark' in
# polars_mas_spark/) — update when a query opts a new table in.
TR_OPTED = ["documents", "embeddings"]


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


def test_tr_opted_tables_straddle_floor():
    # Every _tr-opted table: below the floor at the correctness SF
    # (identity plan for the oracle gate), above it at the bench SF
    # (the repartition actually fires where it was measured).
    for name in TR_OPTED:
        small = os.path.getsize(f"/root/testdata/sf0.01/{name}.parquet")
        big = os.path.getsize(f"{SF_BENCH}/{name}.parquet")
        assert small < _REBALANCE_MIN_BYTES <= big, (name, small, big)


def test_tr_noop_at_correctness_sf(spark):
    for name in TR_OPTED:
        df = _t(spark, "/root/testdata/sf0.01", name)
        out = _rebalance(
            df, spark, f"/root/testdata/sf0.01/{name}.parquet"
        )
        assert out is df, name


def test_tr_result_identical_to_t(spark):
    # Result identity where the repartition actually FIRES (SF_BENCH):
    # the sf0.01 case is the no-op test above, which would never
    # exercise the round-robin exchange (ADVICE r12).
    a = _t(spark, SF_BENCH, "documents").orderBy("doc_id").collect()
    b = _tr(spark, SF_BENCH, "documents").orderBy("doc_id").collect()
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
