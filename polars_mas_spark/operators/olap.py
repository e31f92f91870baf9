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


def _report(grouped, value_col: str) -> DataFrame:
    # avg_value is UNROUNDED on purpose: rounding a derived quotient
    # belongs at the oracle-comparison site where the caller can judge
    # whether the data makes round(mean) .5-boundary-safe (CLAUDE.md r7
    # quotient rule; 2-decimal values x power-of-two cell counts land
    # the true mean exactly on a rounding boundary). sum+count are the
    # safe canonical pair.
    return grouped.agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n_rows"),
        F.round(F.sum(qcol(value_col)), 6).alias("total_value"),
        F.avg(qcol(value_col)).alias("avg_value"),
    )


def rollup_report(
    df: DataFrame, keys: list[str | Column], value_col: str
) -> DataFrame:
    """Hierarchical totals: every prefix of ``keys`` plus the grand
    total (N+1 grouping levels, ONE shuffle via Expand)."""
    cols = [qcol(k) if isinstance(k, str) else k for k in keys]
    return _report(df.rollup(*cols), value_col)


def cube_report(
    df: DataFrame, keys: list[str | Column], value_col: str
) -> DataFrame:
    """All 2^N key-subset totals in one Expand + one aggregation."""
    cols = [qcol(k) if isinstance(k, str) else k for k in keys]
    return _report(df.cube(*cols), value_col)


def pivot_report(
    df: DataFrame,
    key_col: str,
    pivot_col: str,
    value_col: str,
    pivot_values: list[str],
) -> DataFrame:
    """Long -> wide crosstab: one row per key, one (count, sum) column
    pair per pivoted value — the inverse of the MAS unpivot.

    ``pivot_values`` is REQUIRED: with an explicit value list Spark
    skips the extra distinct-collection job AND the output schema is
    stable for the 100 TB case (an unlisted runaway category can't
    explode the column count); unexpected values land in nothing, by
    design. One hash aggregation — pivot compiles to grouped
    conditional aggregates, no join, no second shuffle."""
    # GroupedData.pivot only takes a bare name string, which parses a
    # dotted user column ('250.1') as struct access — stage it under a
    # fixed internal alias first (CLAUDE.md qcol rule, review r9).
    pivoted = (
        df.withColumn("__pms_pivot__", qcol(pivot_col))
        .groupBy(qcol(key_col).alias(key_col))
        .pivot("__pms_pivot__", pivot_values)
        .agg(
            # count(lit(1)), not count("*"): Pivot rejects star usage.
            F.count(F.lit(1)).alias("n"),
            F.sum(qcol(value_col)).alias("sum"),
        )
    )
    # Spark names the columns "<value>_n"/"<value>_sum"; empty cells are
    # NULL counts — normalize to 0 (a key with no events of a type has
    # count 0, not unknown). qcol, not F.col: a pivot value containing a
    # dot ('page.view') otherwise parses as struct access.
    for v in pivot_values:
        pivoted = pivoted.withColumn(
            f"{v}_n", F.coalesce(qcol(f"{v}_n"), F.lit(0))
        )
    return pivoted
