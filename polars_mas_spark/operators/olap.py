"""OLAP grouping-set operators: rollup / cube summary reports.

Beyond-reference surface (the reference has no grouping sets,
SURVEY.md §2.10); Spark provides them natively and they compile to a
single Expand + one hash aggregation — one shuffle regardless of how
many grouping levels the report carries, with map-side partial
aggregation doing the heavy lifting. That is the scalable shape: a
naive per-level union of aggregations would scan the fact table once
per level.

``grouping_id`` disambiguates a rolled-up NULL from a genuine NULL key
(SQL-standard bitmask, leftmost key = most significant bit — identical
in Spark and DuckDB, so oracles compare exactly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polars_mas_spark.colutils import qcol


def _report(grouped, keys: list[str], value_col: str) -> DataFrame:
    return grouped.agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n_rows"),
        F.round(F.sum(qcol(value_col)), 6).alias("total_value"),
        F.round(F.avg(qcol(value_col)), 6).alias("avg_value"),
    )


def rollup_report(
    df: DataFrame, keys: list[str | Column], value_col: str
) -> DataFrame:
    """Hierarchical totals: every prefix of ``keys`` plus the grand
    total (N+1 grouping levels, ONE shuffle via Expand)."""
    cols = [qcol(k) if isinstance(k, str) else k for k in keys]
    return _report(df.rollup(*cols), keys, value_col)


def cube_report(
    df: DataFrame, keys: list[str | Column], value_col: str
) -> DataFrame:
    """All 2^N key-subset totals in one Expand + one aggregation."""
    cols = [qcol(k) if isinstance(k, str) else k for k in keys]
    return _report(df.cube(*cols), keys, value_col)
