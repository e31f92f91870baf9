"""Ordered forward/backward fill that scales past one partition.

Polars fills nulls using the frame's physical row order
(/root/reference/src/polars_mas/preprocessing.py:30-31). Spark tables
have no inherent order, so the engine requires an explicit order column
(SURVEY.md §2.5 F3/F4 contract). The naive translation —
``last(col, ignorenulls=True) over (ORDER BY ord)`` with no PARTITION BY —
collapses the whole table into a single task, which is exactly the kind
of plan that dies at 100 TB.

Scalable algorithm (classic distributed prefix-scan):

1. ``repartitionByRange(order_col)`` so partition id is monotone in the
   order column (range exchange, one shuffle).
2. Within each partition, fill with a *partitioned* window — parallel.
3. Per partition, take the last non-null value (tiny aggregate), collect
   the P-row summary to the driver, compute the running carry-in prefix,
   and broadcast-join it back.
4. ``coalesce(within-partition fill, carry_in)``.

Cost: one range shuffle + one tiny broadcast join, fully parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_mas_spark.colutils import qcol

_BLOCK = "__pms_fill_block__"
_CARRY_SUFFIX = "__carry__"


def forward_fill(
    df: DataFrame, cols: list[str], order_col: str, num_blocks: int | None = None
) -> DataFrame:
    return _ordered_fill(df, cols, order_col, backward=False, num_blocks=num_blocks)


def backward_fill(
    df: DataFrame, cols: list[str], order_col: str, num_blocks: int | None = None
) -> DataFrame:
    return _ordered_fill(df, cols, order_col, backward=True, num_blocks=num_blocks)


def _ordered_fill(
    df: DataFrame,
    cols: list[str],
    order_col: str,
    backward: bool,
    num_blocks: int | None,
) -> DataFrame:
    if not cols:
        return df
    original_cols = df.columns
    spark = df.sparkSession
    if num_blocks is None:
        num_blocks = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    order = qcol(order_col).desc() if backward else qcol(order_col).asc()
    blocked = df.repartitionByRange(num_blocks, order).withColumn(
        _BLOCK, F.spark_partition_id()
    )
    blocked = blocked.persist()

    win = (
        Window.partitionBy(_BLOCK)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled_local = blocked.select(
        *[
            F.last(qcol(c), ignorenulls=True).over(win).alias(c)
            if c in cols
            else qcol(c)
            for c in blocked.columns
        ]
    )

    # Per-block last non-null value in scan order (max_by skips null keys).
    order_key = (-qcol(order_col)) if backward else qcol(order_col)
    summaries = (
        blocked.groupBy(_BLOCK)
        .agg(
            *[
                F.max_by(
                    qcol(c), F.when(qcol(c).isNotNull(), order_key)
                ).alias(c)
                for c in cols
            ]
        )
        .orderBy(_BLOCK)
        .collect()
    )
    # Running carry-in: the last value seen in any *earlier* block.
    carries: list[dict] = []
    running: dict[str, object] = {c: None for c in cols}
    for row in summaries:
        carries.append({_BLOCK: row[_BLOCK], **{c + _CARRY_SUFFIX: running[c] for c in cols}})
        for c in cols:
            if row[c] is not None:
                running[c] = row[c]

    carry_schema = blocked.select(
        F.col(_BLOCK), *[qcol(c).alias(c + _CARRY_SUFFIX) for c in cols]
    ).schema
    # Build the tiny carry table JVM-side (explode of literal structs).
    # spark.createDataFrame(list) would ship it as a pickled Python RDD
    # over defaultParallelism partitions — one Python worker launch per
    # partition just to unpickle a few rows.
    structs = [
        F.struct(
            *[
                F.lit(d[f.name]).cast(f.dataType).alias(f.name)
                for f in carry_schema.fields
            ]
        )
        for d in carries
    ]
    carry_df = (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("__s__"))
        .select("__s__.*")
    )

    result = (
        filled_local.join(F.broadcast(carry_df), on=_BLOCK, how="left")
        .select(
            *[
                F.coalesce(qcol(c), qcol(c + _CARRY_SUFFIX)).alias(c)
                if c in cols
                else qcol(c)
                for c in original_cols
            ]
        )
    )
    return result
