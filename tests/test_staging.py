"""Size-gated stage materialization (staging.materialize_stage, r13):
localCheckpoint below the threshold, recomputable DISK_ONLY persist
above it, identical results either way — and the local-bench plans of
the gated operators keep the checkpoint (no bench-shape change)."""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from polars_mas_spark.plans import formatted_plan
from polars_mas_spark.staging import materialize_stage

_CONF = "spark.polars_mas.localCheckpointMaxBytes"


def _df(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.length("text").alias("n")
    )


def test_below_threshold_checkpoints(spark):
    out = materialize_stage(_df(spark), "t")
    # localCheckpoint truncates the plan to an RDD scan.
    assert "Scan ExistingRDD" in formatted_plan(out)
    assert out.count() == _df(spark).count()


def test_above_threshold_persists_disk_only(spark):
    old = spark.conf.get(_CONF, None)
    spark.conf.set(_CONF, "1")  # force the large branch
    try:
        base = _df(spark)
        out = materialize_stage(base, "t")
        # persist keeps lineage (recomputable) — no RDD-scan truncation,
        # and the storage level is DISK_ONLY.
        assert out.storageLevel == StorageLevel.DISK_ONLY
        assert "Scan ExistingRDD" not in formatted_plan(out)
        assert sorted(r.doc_id for r in out.collect()) == sorted(
            r.doc_id for r in base.collect()
        )
        out.unpersist()
    finally:
        if old is None:
            spark.conf.unset(_CONF)
        else:
            spark.conf.set(_CONF, old)


def test_gated_operators_keep_local_checkpoint_plan(spark):
    """The two gated corpus-width stages (paragraph passages,
    perplexity per-doc scores) must still plan as localCheckpoint at
    bench SFs — the r12 measured wins rest on that shape."""
    import __spark_entry__ as e
    from polars_mas_spark.queries_ext import BENCH_ONLY

    qs = {**e.queries(), **BENCH_ONLY}
    for name in ("paragraph_neardup_dedup", "perplexity_thirds"):
        plan = formatted_plan(qs[name](spark, SF_DIR))
        assert "Scan ExistingRDD" in plan, name
        assert "InMemoryTableScan" not in plan, name
