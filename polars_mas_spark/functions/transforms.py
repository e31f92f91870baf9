"""Dependent-variable transforms the reference declares but never wires
up (cli.py:93-103, README.md:160-161): rank-based inverse-normal
transform (RINT), log transform, and covariate scaling.

All are expressed with built-in Spark functions except the probit, for
which Spark has no builtin — that single step is a vectorized Arrow
pandas UDF over the already-computed rank fraction (the heavy part, the
global rank, stays JVM-side).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from polars_mas_spark.colutils import qcol
from polars_mas_spark.functions.distributions import norm_ppf


# DataType instance (not a DDL string) so the UDF can be defined at import
# time without an active SparkSession.
@pandas_udf(DoubleType())
def _probit(p: pd.Series) -> pd.Series:
    return p.map(lambda v: norm_ppf(v) if v is not None and not pd.isna(v) else None)


def rint(df: DataFrame, col: str, out_col: str | None = None) -> DataFrame:
    """Blom-offset rank-based inverse normal transform:
    probit((rank - 0.375) / (n + 0.25)). Rank ties use average rank
    (matching R's rank default used by standard RINT implementations)."""
    out_col = out_col or col
    valid = qcol(col).isNotNull()
    n = df.filter(valid).count()
    w = Window.orderBy(qcol(col).asc())
    # Average rank over ties: avg of row_number within equal values.
    rn = F.row_number().over(w)
    avg_rank = F.avg(rn).over(Window.partitionBy(qcol(col)))
    blom = (avg_rank - F.lit(0.375)) / F.lit(n + 0.25)
    return df.withColumn(out_col, F.when(valid, _probit(blom)))


def log_transform(df: DataFrame, col: str, out_col: str | None = None) -> DataFrame:
    return df.withColumn(out_col or col, F.log(qcol(col)))


def standard_scale(df: DataFrame, cols: list[str]) -> DataFrame:
    """(x - mean) / stddev_samp per column, one aggregate job for all."""
    stats = df.agg(
        *[F.avg(c).alias(f"__m_{c}") for c in cols],
        *[F.stddev_samp(c).alias(f"__s_{c}") for c in cols],
    ).first()
    out = df
    for c in cols:
        mean, std = stats[f"__m_{c}"], stats[f"__s_{c}"]
        if std is None or std == 0:
            continue
        out = out.withColumn(c, (qcol(c) - F.lit(mean)) / F.lit(std))
    return out


def min_max_scale(df: DataFrame, cols: list[str]) -> DataFrame:
    stats = df.agg(
        *[F.min(c).alias(f"__mn_{c}") for c in cols],
        *[F.max(c).alias(f"__mx_{c}") for c in cols],
    ).first()
    out = df
    for c in cols:
        lo, hi = stats[f"__mn_{c}"], stats[f"__mx_{c}"]
        if lo is None or hi is None or hi == lo:
            continue
        out = out.withColumn(c, (qcol(c) - F.lit(lo)) / F.lit(hi - lo))
    return out
