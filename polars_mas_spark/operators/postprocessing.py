"""Postprocessing: multiple-testing correction, phenotype annotation, output.

Reference surface: /root/reference/src/polars_mas/postprocessing.py:6-40.
Bonferroni matches the reference exactly; Benjamini-Hochberg FDR is the
first roadmap feature the reference declares but never implements
(README.md:159,169; postprocessing.py:15 silently returns None for any
method != "bonferroni") — here it is a real window-based operator.

Scale note: the correction operates on the *results* table (one row per
predictor x dependent pair), which is orders of magnitude smaller than
the input data, so the global-order windows in BH are cheap even when
the input is 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sex_restrictions_from_defs(
    defs_df: DataFrame,
    female_code: int = 1,
    male_code: int = 0,
    phecode_col: str = "phecode",
    sex_col: str = "sex",
) -> dict:
    """Build a MASConfig.sex_restrictions map from a phecode definition
    table whose ``sex`` column holds Both/Female/Male (the reference
    computes exactly these sets and never uses them, constants.py:14-16).
    The defs table is ~1,866 rows — a driver-side collect is correct."""
    rows = defs_df.select(phecode_col, sex_col).collect()
    out = {}
    for r in rows:
        s = (r[sex_col] or "").strip().lower()
        if s == "female":
            out[r[phecode_col]] = female_code
        elif s == "male":
            out[r[phecode_col]] = male_code
    return out


def bonferroni(
    df: DataFrame,
    baseline_pval: float = 0.05,
    pval_col: str = "pval",
    num_tests: int | None = None,
) -> DataFrame:
    """Add ``bonferroni_significant`` = pval < baseline / #non-null-tests
    (postprocessing.py:14-20). Reference parity: polars' ``is_not_null()``
    is True for float NaN, so failed fits (which carry NaN p-values)
    COUNT toward the test total — only true nulls are excluded. The
    association fan-out guarantees failure rows reach this operator as
    NaN, not NULL (the Arrow grouped-map boundary converts pandas NaN to
    Spark NULL; ``association._complete_pairs`` coalesces every NULL
    double back to NaN — the one documented place that decision lives),
    so ``isNotNull`` here counts exactly what the reference counts. NaN
    pvals then compare False against the threshold, matching polars.
    Pass ``num_tests`` to reuse an already-computed count (one aggregate
    job can serve both corrections, see run_pipeline)."""
    if num_tests is None:
        num_tests = df.filter(F.col(pval_col).isNotNull()).count()
    if num_tests == 0:
        return df.withColumn("bonferroni_significant", F.lit(None).cast("boolean"))
    threshold = baseline_pval / num_tests
    return df.withColumn(
        "bonferroni_significant", F.col(pval_col) < F.lit(threshold)
    )


def benjamini_hochberg(
    df: DataFrame,
    pval_col: str = "pval",
    out_col: str = "pval_bh",
    num_valid: int | None = None,
) -> DataFrame:
    """BH step-up adjusted p-values: adj_i = min_{j>=i}(p_(j) * n / j),
    capped at 1, computed with two windows over the ascending p order.

    Ties: every row of a tied p-value group uses the group's MAXIMUM
    ascending rank (a RANGE-frame count of pvals <= p). This is the
    canonical tie-invariant form — the step-up running minimum collapses
    tied groups to p*n/maxrank anyway, so using maxrank directly makes
    the result independent of any within-tie row order (row_number-based
    ranks are engine-nondeterministic under ties).

    Unlike bonferroni's reference-parity count, BH's n counts only
    *usable* p-values (NaN excluded): a NaN entering p*n/rank would
    poison the running minimum. Pass ``num_valid`` to reuse a
    precomputed count."""
    valid = F.col(pval_col).isNotNull() & ~F.isnan(F.col(pval_col))
    n = num_valid if num_valid is not None else df.filter(valid).count()
    if n == 0:
        return df.withColumn(out_col, F.lit(None).cast("double"))
    # Explicit null ordering keeps failed fits (null pvals) out of the
    # rank sequence (Spark's asc default puts nulls FIRST, which would
    # shift every valid rank).
    w_rank = Window.orderBy(F.col(pval_col).asc_nulls_last()).rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_tail = Window.orderBy(F.col(pval_col).desc_nulls_last()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = df.withColumn(
        "__bh_rank__", F.when(valid, F.count(F.when(valid, 1)).over(w_rank))
    )
    adjusted = ranked.withColumn(
        "__bh_raw__",
        F.when(valid, F.least(F.col(pval_col) * F.lit(float(n)) / F.col("__bh_rank__"), F.lit(1.0))),
    )
    # Running minimum from the largest p downward implements the step-up rule.
    out = adjusted.withColumn(
        out_col, F.when(valid, F.min("__bh_raw__").over(w_tail))
    ).drop("__bh_rank__", "__bh_raw__")
    # Restore ascending p order: the step-up window sorted DESCENDING,
    # so without this the bh-corrected results leave in reverse p order
    # while bonferroni preserves ascending — output row order silently
    # differed by correction choice (review r9).
    return out.orderBy(F.col(pval_col).asc_nulls_last())


def add_phecode_definitions(
    df: DataFrame,
    defs_df: DataFrame,
    is_phewas: bool = False,
    is_flipwas: bool = False,
) -> DataFrame:
    """Broadcast left join of the ~1.9k-row phecode definition table
    (postprocessing.py:23-29): dependent=phecode for PheWAS, predictor=
    phecode for flipWAS. Broadcast => no shuffle of the results table."""
    if is_phewas:
        key = "dependent"
    elif is_flipwas:
        key = "predictor"
    else:
        return df
    return df.join(
        F.broadcast(defs_df), on=df[key] == defs_df["phecode"], how="left"
    ).drop("phecode")
