"""Table profiling: per-column statistics in ONE aggregation pass.

Beyond-reference surface (the reference's eager per-column stats,
preprocessing.py:10-92, generalized into a data-QA report). All
columns' statistics compute as parallel aggregates of a single job —
one table scan however many columns are profiled; the wide 1-row
result is then unpivoted driver-side into the long (column, stat)
report. Medians use Spark's exact interpolated ``percentile`` (DuckDB
``quantile_cont`` parity); at 100 TB swap for ``percentile_approx``
and drop the oracle to rows-only — the exact percentile's
per-column sort state is the one piece that does not scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from polars_mas_spark.colutils import qcol

STATS = ["n", "nulls", "min", "max", "mean", "stddev", "median"]


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(column, n, nulls, min, max, mean, stddev, median) per numeric
    column, one aggregation job for all of them."""
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, T.NumericType)
    }
    targets = [c for c in (cols or df.columns) if c in numeric]
    if not targets:
        raise ValueError("no numeric columns to profile")
    # Rounded-quotient note (CLAUDE.md r7 rule, weighed in review r9):
    # mean/stddev ARE derived quotients, but the safe "bind sum+count"
    # alternative is WORSE for a whole-table profile — a single global
    # sum of large values carries ~n*eps*sum summation-order error
    # (the q11 integer-cents lesson), orders above the 1e-6 grid at
    # sf0.1, while the mean divides that error back down to ~1e-7
    # absolute. round(mean,6) here is flap-hunt-verified bit-stable at
    # 3 SFs; the mean*n==sum quotient identity is bound in a unit test.
    aggs = []
    for c in targets:
        q = qcol(c)
        aggs += [
            F.count(q).alias(f"__n_{c}"),
            F.count(F.when(q.isNull(), 1)).alias(f"__nulls_{c}"),
            F.round(F.min(q).cast("double"), 6).alias(f"__min_{c}"),
            F.round(F.max(q).cast("double"), 6).alias(f"__max_{c}"),
            F.round(F.avg(q), 6).alias(f"__mean_{c}"),
            F.round(F.stddev_samp(q), 6).alias(f"__stddev_{c}"),
            F.round(F.percentile(q, F.lit(0.5)), 6).alias(f"__median_{c}"),
        ]
    row = df.agg(*aggs).first()
    out = [
        (c, *[row[f"__{s}_{c}"] for s in STATS])
        for c in targets
    ]
    schema = (
        "column string, n long, nulls long, min double, max double, "
        "mean double, stddev double, median double"
    )
    return df.sparkSession.createDataFrame(out, schema)


def embedding_profile(
    df: DataFrame,
    vec_col: str = "embedding",
    expected_dim: int | None = None,
) -> DataFrame:
    """One-row sanity report over an embedding column — the pre-flight
    check before pointing dedup/ANN at a vector corpus: total vectors,
    NULLs, wrong-dimension rows (vs ``expected_dim``, defaulting to the
    first non-NULL vector's length), non-finite vectors (any NaN/Inf
    component), exact
    zero vectors (cosine against them is undefined), and the L2-norm
    min/mean/max over the clean ones. One aggregation pass, all JVM
    higher-order functions — no Python, no shuffle beyond the agg."""
    v = qcol(vec_col)
    if expected_dim is None:
        first = df.select(F.size(v)).filter(F.size(v) >= 0).first()
        if first is None:
            raise ValueError("cannot infer dim: no non-NULL vectors")
        expected_dim = int(first[0])
    sq = F.aggregate(
        v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x
    )
    # A NULL component counts as non-finite: with a bare isnan/isinf
    # predicate, F.exists over a NULL element is SQL NULL, so the whole
    # `clean` expression goes NULL and the row lands in NO category
    # (while DuckDB's EXISTS treats it as false and calls it clean).
    # Folding x IS NULL into the predicate makes every vector land in
    # exactly one bucket on both engines.
    nonfinite = F.exists(
        v,
        lambda x: x.isNull()
        | F.isnan(x.cast("double"))
        | (F.abs(x) == float("inf")),
    )
    clean = (
        v.isNotNull()
        & (F.size(v) == expected_dim)
        & ~nonfinite
    )
    norm = F.sqrt(sq)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(v.isNull(), 1)).alias("n_null"),
        F.count(
            F.when(v.isNotNull() & (F.size(v) != expected_dim), 1)
        ).alias("n_wrong_dim"),
        F.count(F.when(v.isNotNull() & nonfinite, 1)).alias("n_nonfinite"),
        F.count(F.when(clean & (sq == 0.0), 1)).alias("n_zero"),
        F.round(F.min(F.when(clean, norm)), 6).alias("norm_min"),
        F.round(F.avg(F.when(clean, norm)), 6).alias("norm_mean"),
        F.round(F.max(F.when(clean, norm)), 6).alias("norm_max"),
    ).withColumn("dim", F.lit(expected_dim))


def distinct_profile(
    df: DataFrame, cols: list[str] | None = None, exact: bool = False
) -> DataFrame:
    """(column, approx_distinct) for every column in one aggregation
    pass. Default is the HyperLogLog sketch (``approx_count_distinct``,
    fixed ~few-KB state per column, mergeable map-side — the ONLY shape
    that profiles distinct counts of a 100 TB table in one scan);
    ``exact=True`` swaps in exact countDistinct for small-data QA where
    the precise number matters (the reference's constant-covariate
    detection, preprocessing.py:68, needs exact and uses A3 instead).
    """
    targets = cols or df.columns
    agg = F.count_distinct if exact else F.approx_count_distinct
    row = df.agg(
        *[agg(qcol(c)).alias(f"__d_{c}") for c in targets]
    ).first()
    out = [(c, int(row[f"__d_{c}"])) for c in targets]
    return df.sparkSession.createDataFrame(
        out, "column string, n_distinct long"
    )


def quantile_profile(
    df: DataFrame,
    cols: list[str],
    quantiles: list[float] = (0.25, 0.5, 0.75, 0.9, 0.99),
    group_col: str | None = None,
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Long-form quantile report (group?, column, q, value) — the
    distribution snapshot behind length/score cutoff decisions (e.g.
    "trim documents above the p99 token count per source").

    Default is ``approx_percentile`` — a fixed-size mergeable sketch
    per (group, column), the only shape that survives 100 TB (error
    <= 1/accuracy in RANK, not value). ``exact=True`` swaps in the
    interpolated exact ``percentile`` (DuckDB ``quantile_cont`` parity,
    the oracle mode) whose per-group sort buffer is fine at QA scale
    and wrong at corpus scale. One aggregation job either way: all
    columns x all quantiles as parallel aggregates, unpivoted to long
    via a stack() projection (no second shuffle)."""
    qs = [float(x) for x in quantiles]
    fn = F.percentile if exact else (
        lambda c, p: F.percentile_approx(c, p, F.lit(accuracy))
    )
    # Internal aliases are INDEX-keyed, never name-keyed: a user column
    # like '250.1' embedded in an alias would make the bare F.col
    # reference below reparse the dot as a struct access (the exact
    # trap colutils.qcol exists for).
    aggs = [
        fn(qcol(c).cast("double"), F.array(*[F.lit(x) for x in qs])).alias(
            f"__q_{i}"
        )
        for i, c in enumerate(cols)
    ]
    keys = [qcol(group_col)] if group_col else []
    wide = df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)
    # stack() the per-column arrays into long form, then posexplode the
    # quantile array against its literal probabilities.
    pairs = []
    for i, c in enumerate(cols):
        pairs += [F.lit(c), F.col(f"__q_{i}")]
    stacked = wide.select(
        *([qcol(group_col)] if group_col else []),
        F.stack(F.lit(len(cols)), *pairs).alias("column", "__vals__"),
    )
    probs = F.array(*[F.lit(x) for x in qs])
    # coalesce to an all-NULL value array: an all-NULL (group, column)
    # makes percentile return NULL, arrays_zip(probs, NULL) NULL, and a
    # plain posexplode would emit ZERO rows — the report would silently
    # claim the column was never profiled for that group (review r9);
    # instead every requested quantile appears with a NULL value.
    null_vals = F.array(*[F.lit(None).cast("double") for _ in qs])
    stacked = stacked.withColumn(
        "__vals__", F.coalesce(F.col("__vals__"), null_vals)
    )
    return stacked.select(
        *([qcol(group_col)] if group_col else []),
        "column",
        F.posexplode(F.arrays_zip(probs.alias("q"), F.col("__vals__").alias("v"))),
    ).select(
        *([qcol(group_col)] if group_col else []),
        "column",
        F.col("col.q").alias("q"),
        F.round(F.col("col.v"), 6).alias("value"),
    )
