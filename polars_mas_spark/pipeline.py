"""End-to-end MAS pipeline orchestration.

Reference: /root/reference/src/polars_mas/pipeline.py:17-42
(read -> preprocess -> associations -> postprocess -> write). The
reference materializes the preprocessed table to a /dev/shm Arrow IPC
file so its worker processes can mmap it; in Spark that role is played
by ``persist(MEMORY_AND_DISK)`` — the eager preprocessing statistics and
the association shuffle both reuse the cached partitions instead of
re-scanning the source (SURVEY.md §4 note 1).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession

from polars_mas_spark.colutils import qcol
from polars_mas_spark.config import MASConfig
from polars_mas_spark.operators.association import run_associations
from polars_mas_spark.operators.postprocessing import (
    add_phecode_definitions,
    benjamini_hochberg,
    bonferroni,
)
from polars_mas_spark.operators.preprocessing import preprocess
from polars_mas_spark.sources.readers import read_input
from polars_mas_spark.sources.writers import write_output


def run_pipeline(
    spark: SparkSession,
    config: MASConfig,
    df: DataFrame | None = None,
    input_path: str | None = None,
    output_path: str | None = None,
    phecode_defs: DataFrame | None = None,
) -> DataFrame:
    """Run the full MAS dataflow; returns the results DataFrame.

    Programmatic-first API (the reference is CLI-only; a Python API is on
    its declared roadmap, README.md:163): pass either an already-loaded
    wide DataFrame or an input path.
    """
    if df is None:
        if input_path is None:
            raise ValueError("Provide either df or input_path")
        df = read_input(spark, input_path, null_values=config.null_value_tokens)
    config.resolve(df.columns)
    df = df.select(*[qcol(c) for c in config.included_columns])

    # Cache the projected input FIRST: preprocess collects eager
    # statistics (null counts, countDistinct, level sets) and each one is
    # an action — uncached, every stat job would re-execute the upstream
    # plan (source scan or caller-supplied join) from scratch.
    raw = df.persist(StorageLevel.MEMORY_AND_DISK)
    pre = preprocess(raw, config)
    # The persisted preprocessed table is the analog of the reference's
    # shared-memory IPC checkpoint (preprocessing.py:111-132).
    pre = pre.persist(StorageLevel.MEMORY_AND_DISK)
    pre.count()  # materialize before the fan-out; frees the raw cache
    raw.unpersist()

    # Persist the (small) results table: bonferroni's valid-test count is
    # an action, and without the cache the whole regression fan-out would
    # run twice (once for the count, once for the caller's collect).
    results = run_associations(pre, config).persist(StorageLevel.MEMORY_AND_DISK)
    results = bonferroni(results)
    if config.correction == "bh":
        results = benjamini_hochberg(results)
    pre.unpersist()  # results are cached; the wide table is no longer needed
    if phecode_defs is not None:
        results = add_phecode_definitions(
            results, phecode_defs, config.is_phewas, config.is_flipwas
        )
    if output_path is not None:
        # Like the reference, the writer is picked by the output path's
        # suffix (postprocessing.py:33-40); config.output_type is the
        # fallback for suffix-less paths.
        suffix = output_path.rsplit(".", 1)[-1].lower() if "." in output_path else ""
        out_type = suffix if suffix in ("parquet", "csv", "tsv", "txt") else config.output_type
        write_output(results, output_path, out_type)
    return results
