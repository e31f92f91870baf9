"""The association fan-out: every (predictor, dependent) pair fitted in
one distributed pass.

The reference fans out a Python loop of predictor x dependent tasks over
joblib worker processes, each re-reading a memory-mapped IPC file
(/root/reference/src/polars_mas/analysis.py:10-107). The Spark-native
design replaces that wholesale (SURVEY.md §2.6 U1, §2.11 K6):

    wide table
      -> explode predictors (struct array, only when >1 predictor)
      -> unpivot dependents            (one long table; covariates ride
                                        along as id columns so each group
                                        arrives fit-ready)
      -> filter pred/dep not null      (map-side, BEFORE the shuffle —
                                        null rows never cross the wire)
      -> groupBy(predictor, dependent).applyInPandas(kernel)
      -> right-join the full pair list to re-materialize pairs that
         vanished entirely ("No data after dropping nulls." rows —
         failures are rows, not exceptions: analysis.py:110-124)
      -> orderBy(pval)                 (nulls last, polars parity)

One shuffle keyed on the pair id distributes the regressions; Arrow
batches feed the pandas kernels. Scale notes: group count = P x D is the
parallelism; each group holds <= n rows. Skewed pair sizes are handled
by AQE; for P*D >> shuffle partitions the groups pack densely.
"""

from __future__ import annotations

import math
from typing import Callable, Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from polars_mas_spark.colutils import qcol, qname
from polars_mas_spark.config import MASConfig
from polars_mas_spark.functions.stats import (
    firth_fit,
    logistic_fit,
    ols_fit,
    poisson_fit,
)

PRED_VALUE = "__pred_value__"
DEP_VALUE = "__dep_value__"

BINARY_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("predictor", T.StringType()),
        T.StructField("dependent", T.StringType()),
        T.StructField("pval", T.DoubleType()),
        T.StructField("beta", T.DoubleType()),
        T.StructField("se", T.DoubleType()),
        T.StructField("OR", T.DoubleType()),
        T.StructField("ci_low", T.DoubleType()),
        T.StructField("ci_high", T.DoubleType()),
        T.StructField("cases", T.LongType()),
        T.StructField("controls", T.LongType()),
        T.StructField("total_n", T.LongType()),
        T.StructField("converged", T.BooleanType()),
        T.StructField("failed_reason", T.StringType()),
        T.StructField("equation", T.StringType()),
    ]
)

LINEAR_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("predictor", T.StringType()),
        T.StructField("dependent", T.StringType()),
        T.StructField("pval", T.DoubleType()),
        T.StructField("beta", T.DoubleType()),
        T.StructField("se", T.DoubleType()),
        T.StructField("ci_low", T.DoubleType()),
        T.StructField("ci_high", T.DoubleType()),
        T.StructField("n_observations", T.LongType()),
        T.StructField("converged", T.BooleanType()),
        T.StructField("failed_reason", T.StringType()),
        T.StructField("equation", T.StringType()),
    ]
)

# Sentinel defaults for failure rows (reference analysis.py:228-260).
_BINARY_DEFAULTS = {
    "pval": math.nan, "beta": math.nan, "se": math.nan, "OR": math.nan,
    "ci_low": math.nan, "ci_high": math.nan, "cases": -9, "controls": -9,
    "total_n": -9, "converged": False, "failed_reason": "nan", "equation": "nan",
}
_LINEAR_DEFAULTS = {
    "pval": math.nan, "beta": math.nan, "se": math.nan,
    "ci_low": math.nan, "ci_high": math.nan, "n_observations": -9,
    "converged": False, "failed_reason": "nan", "equation": "nan",
}

_MODEL_FUNCS: dict[str, Callable] = {
    "firth": firth_fit,
    "logistic": logistic_fit,
    "linear": ols_fit,
    "poisson": poisson_fit,
}

# Models whose result rows carry n_observations instead of
# cases/controls (Poisson dependents are counts — quantitative).
_QUANT_MODELS = ("linear", "poisson")


def result_schema(model: str) -> T.StructType:
    return (
        LINEAR_RESULT_SCHEMA if model in _QUANT_MODELS else BINARY_RESULT_SCHEMA
    )


def safe_covariate_pairs(covariates: list[str]) -> list[tuple[str, str]]:
    """(column_name_in_long_table, display_name) per covariate. Names with
    dots/backticks are rewritten to ``__cov_i__``: PySpark's own
    GroupedData.applyInPandas resolves columns unquoted (``df[col]``), so
    unsafe names cannot survive into the grouped long table."""
    return [
        (c if ("." not in c and "`" not in c) else f"__cov_{i}__", c)
        for i, c in enumerate(covariates)
    ]


def build_long_table(
    df: DataFrame,
    predictors: list[str],
    dependents: list[str],
    covariates: list[str],
) -> DataFrame:
    """Wide -> long: one row per (sample, predictor, dependent) with
    covariates as id columns. The P-way predictor explode and D-way
    dependent unpivot together express the reference's task fan-out
    (analysis.py:13-15) as data, so Catalyst plans it as one pipeline."""
    cov_pairs = safe_covariate_pairs(covariates)
    cov_cols = [qcol(orig).alias(safe) for safe, orig in cov_pairs]
    if len(predictors) == 1:
        p = predictors[0]
        exploded = df.select(
            F.lit(p).alias("predictor"),
            qcol(p).cast("double").alias(PRED_VALUE),
            *cov_cols,
            *[qcol(d).cast("double").alias(d) for d in dependents],
        )
    else:
        pred_structs = F.array(
            *[
                F.struct(
                    F.lit(p).alias("predictor"),
                    qcol(p).cast("double").alias(PRED_VALUE),
                )
                for p in predictors
            ]
        )
        exploded = df.select(
            F.explode(pred_structs).alias("_p"),
            *cov_cols,
            *[qcol(d).cast("double").alias(d) for d in dependents],
        ).select(
            F.col("_p.predictor").alias("predictor"),
            F.col(f"_p.{PRED_VALUE}").alias(PRED_VALUE),
            *[qcol(safe) for safe, _ in cov_pairs],
            *[qcol(d) for d in dependents],
        )
    long_df = exploded.unpivot(
        ids=["predictor", PRED_VALUE, *[qname(safe) for safe, _ in cov_pairs]],
        values=[qname(d) for d in dependents],
        variableColumnName="dependent",
        valueColumnName=DEP_VALUE,
    )
    return long_df


PACKED_BUCKET = "__dep_bucket__"
PACKED_DEPS = "__dep_values__"


def dependent_buckets(dependents: list[str], n_buckets: int) -> list[list[str]]:
    """Contiguous chunks of the dependent list, one per bucket."""
    n_buckets = max(1, min(n_buckets, len(dependents)))
    size = -(-len(dependents) // n_buckets)  # ceil
    return [dependents[i : i + size] for i in range(0, len(dependents), size)]


def packed_bucket_count(n_preds: int, n_deps: int, parallelism: int) -> int:
    """Bucket count for the packed fan-out: targets 4 (predictor,
    bucket) groups per core for balance, capped at one dependent per
    bucket. Invariants (property-tested in test_association.py):
    P·n_buckets >= min(P·D, parallelism) — the kernel stage never runs
    below cluster parallelism when there is enough work — while the
    per-sample shuffle cell count G·C + D never exceeds the classic
    unpivot's D·(C+1), so at 100x the dependents the shuffle stays
    strictly cheaper and the group count grows with D only until the
    4-per-core target is met."""
    return min(n_deps, max(1, -(-4 * parallelism // max(n_preds, 1))))


def build_packed_long_table(
    df: DataFrame,
    predictors: list[str],
    dependents: list[str],
    covariates: list[str],
    bucket_deps: list[list[str]],
) -> DataFrame:
    """Wide -> packed long: one row per (sample, predictor, dep-bucket)
    with that bucket's dependent values packed into ONE array column and
    covariates riding along as plain columns.

    This is the SURVEY §7.4.6 tall-table mitigation. The classic unpivot
    shuffles P x D rows per sample, each duplicating all C covariates —
    shuffle cells ~ n·P·D·(C+1). Packing moves the same information in
    P x G rows per sample (G = bucket count), each carrying C covariates
    once plus D/G dependent values — cells ~ n·P·(G·C + D). With G sized
    to the cluster parallelism (and D large, the PheWAS direction) the
    covariate duplication factor drops from D to G while the kernel
    stage keeps P·G-way parallelism. Dependent nulls can no longer be
    dropped map-side (they travel inside the arrays as NaN); the kernel
    masks them per dependent, which is the same work in a different
    place — predictor nulls are still dropped before the shuffle."""
    cov_pairs = safe_covariate_pairs(covariates)
    cov_cols = [qcol(orig).alias(safe) for safe, orig in cov_pairs]
    dep_arrays = {
        b: F.array(*[qcol(d).cast("double") for d in deps]).alias(PACKED_DEPS)
        for b, deps in enumerate(bucket_deps)
    }
    entries = F.array(
        *[
            F.struct(
                F.lit(p).alias("predictor"),
                qcol(p).cast("double").alias(PRED_VALUE),
                F.lit(b).alias(PACKED_BUCKET),
                dep_arrays[b],
            )
            for p in predictors
            for b in dep_arrays
        ]
    )
    return df.select(F.explode(entries).alias("_e"), *cov_cols).select(
        F.col("_e.predictor").alias("predictor"),
        F.col(f"_e.{PRED_VALUE}").alias(PRED_VALUE),
        F.col(f"_e.{PACKED_BUCKET}").alias(PACKED_BUCKET),
        F.col(f"_e.{PACKED_DEPS}").alias(PACKED_DEPS),
        *[qcol(safe) for safe, _ in cov_pairs],
    )


def make_packed_kernel(
    model: str,
    covariates: list[str],
    quantitative: bool,
    min_case_count: int,
    bucket_deps: list[list[str]],
    sex_restrictions: dict | None = None,
    sex_col: str | None = None,
) -> Callable[[tuple, pd.DataFrame], pd.DataFrame]:
    """Grouped-map kernel over (predictor, dep-bucket) groups: unpack the
    bucket's dependent-value arrays and run the EXACT per-pair kernel
    core ([[make_array_kernel]]) once per dependent, so validation, sex
    restriction, per-subset constant drop, and the failure-as-row
    channel are shared code with the classic unpivot path — result
    parity by construction. One result DataFrame per bucket group
    instead of a per-dependent concat (r13: same rows, less pandas
    construction overhead)."""
    inner = make_array_kernel(
        model, covariates, quantitative, min_case_count,
        sex_restrictions, sex_col,
    )
    cov_pairs = safe_covariate_pairs(covariates)
    columns = [f.name for f in result_schema(model).fields]

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        predictor, bucket = key
        deps = bucket_deps[int(bucket)]
        # Arrow list<double> arrives as ndarray-per-cell; nulls are NaN.
        mat = np.array(pdf[PACKED_DEPS].tolist(), dtype=np.float64)
        x = pdf[PRED_VALUE].to_numpy()
        cov_np = [
            (safe, orig, pdf[safe].to_numpy())
            for safe, orig in cov_pairs
            if safe in pdf.columns
        ]
        rows = []
        for j, dep in enumerate(deps):
            y = mat[:, j] if mat.size else np.empty(0, dtype=np.float64)
            mask = ~np.isnan(y)
            rows.append(
                inner(
                    predictor, dep, x[mask], y[mask],
                    [(s, o, a[mask]) for s, o, a in cov_np],
                )
            )
        return pd.DataFrame(
            [{c: r[c] for c in columns} for r in rows], columns=columns
        )

    return kernel


def _fit_linear_moments(df: DataFrame, config: MASConfig) -> DataFrame:
    """Linear-model fan-out via SUFFICIENT STATISTICS: aggregate the
    CENTERED normal-equation moments (covariance matrix, covariances
    with y, var(y), n — Welford-merged, offset-stable) per (predictor,
    dependent) with Spark's two-phase hash aggregate, then solve the
    tiny k×k systems in a vectorized pandas pass over the P×D-row
    aggregate table.

    This is the linear model's true 100 TB plan: the classic kernel
    ships every sample row through the pair shuffle, while the moments
    shuffle carries only map-side-combined partials — O(partitions ×
    pairs × k²) doubles regardless of row count. OLS is exactly
    identified by these moments, so results match ``ols_fit`` to float
    precision (iterative models have no such finite statistic — they
    keep the kernel path).

    Parity details mirrored from the kernel (make_kernel): per-pair
    constant-covariate drop (here: Welford within-group variance == 0),
    the exact validation messages, sex-restricted dependents (a
    map-lookup row filter, identical to the kernel's pandas filter),
    and the equation string format. Pairs whose group contains null
    covariate cells fail as rows (Spark's sum() would silently skip the
    nulls and desync the moments from count(*)); rank-deficient designs
    use the min-norm pinv solution with df_resid = n - rank, matching
    ols_fit's lstsq-rank accounting.
    """
    if config.model != "linear":
        raise ValueError("moments strategy is linear-only; use packed/columnar")
    if not config.quantitative:
        # The kernel path enforces case/control validation for
        # non-quantitative runs; the moments aggregate has no case
        # counts, so allowing it would silently skip that validation.
        raise ValueError(
            "moments strategy requires quantitative=True (binary-"
            "outcome validation needs the kernel path; use packed)"
        )
    covariates = list(config.covariate_columns)
    if len(covariates) > 64:
        raise ValueError(
            "moments strategy caps at 64 covariates (the aggregate has "
            "O(C^2) columns); use the packed strategy beyond that"
        )
    cov_pairs = safe_covariate_pairs(covariates)
    # NaN dependents are MISSING (packed-path contract: null dependents
    # ride the arrays as NaN and are masked per-dependent), so they are
    # dropped here alongside nulls; NaN predictors/covariates instead
    # fail the pair as a row via solve()'s finiteness guard (kernel
    # parity — lstsq raises on them).
    long_df = build_long_table(
        df, config.predictor_columns, config.dependent_columns, covariates
    ).filter(
        F.col(PRED_VALUE).isNotNull()
        & F.col(DEP_VALUE).isNotNull()
        & ~F.isnan(F.col(DEP_VALUE))
    )

    sex_safe = None
    if config.sex_restrictions and config.sex_col is not None:
        for safe, orig in cov_pairs:
            if orig == config.sex_col:
                sex_safe = safe
                break
    if sex_safe is not None:
        m = F.create_map(
            *[
                F.lit(x)
                for dep, code in config.sex_restrictions.items()
                for x in (dep, float(code))
            ]
        )
        code = m[F.col("dependent")]
        long_df = long_df.filter(
            code.isNull() | (qcol(sex_safe).cast("double") == code)
        )

    # CENTERED moments via Spark's Welford-merged covar_samp/var_samp
    # aggregates, not raw sum(x), sum(x*x), sum(x*y): OLS slopes, their
    # standard errors, and the SSE are all invariant under constant
    # shifts of the columns, so the centered normal equations
    # ((n-1)·Cov_xx)·beta = (n-1)·Cov_xy are exactly equivalent to
    # ols_fit's intercept-augmented lstsq — but raw moments lose
    # mantissa to cancellation proportional to mean²/variance (an
    # epoch-timestamp covariate with CV 1e-7 loses ALL of it), while
    # the Welford merge stays accurate at any offset and is still a
    # plain two-phase hash aggregate (map-side partials, one shuffle).
    cols = [PRED_VALUE] + [safe for safe, _ in cov_pairs]
    y = F.col(DEP_VALUE)
    aggs = [
        F.count("*").alias("__n__"),
        F.var_samp(y).alias("__vy__"),
    ]
    for i, ci in enumerate(cols):
        c_i = qcol(ci).cast("double")
        aggs.append(F.covar_samp(c_i, y).alias(f"__cy{i}__"))
        for j in range(i, len(cols)):
            aggs.append(
                F.covar_samp(c_i, qcol(cols[j]).cast("double")).alias(
                    f"__c{i}_{j}__"
                )
            )
        if i > 0:
            # Per-covariate non-null count: Spark's aggregates skip
            # nulls, so a group with null covariate cells would
            # otherwise yield moments inconsistent with count(*) and
            # silently wrong coefficients. solve() fails such pairs as
            # rows instead (kernel parity — the pandas kernel's lstsq
            # blows up on the NaNs and the exception becomes a failure
            # row).
            aggs.append(F.count(c_i).alias(f"__nn{i}__"))
    g = long_df.groupBy("predictor", "dependent").agg(*aggs)

    # display[0] is unused (the predictor's name comes from each row's
    # "predictor" key — one grouped row per (predictor, dependent) pair).
    display = ["__predictor__"] + [orig for _, orig in cov_pairs]
    n_cols = len(cols)
    min_obs = config.min_case_count
    from polars_mas_spark.functions.distributions import t_ppf, t_sf

    def solve(batches):
        import math as _math

        for pdf in batches:
            out = []
            for r in pdf.to_dict("records"):
                n = int(r["__n__"])
                rec = dict(
                    _LINEAR_DEFAULTS,
                    predictor=r["predictor"],
                    dependent=r["dependent"],
                )
                if n < min_obs:
                    rec["failed_reason"] = f"Not enough observations ({n})."
                    out.append(rec)
                    continue
                rec["n_observations"] = n
                # PARTIALLY-null covariates fail the pair (aggregates
                # skipped the nulls — moments inconsistent with n; the
                # kernel's lstsq likewise blows up on the NaNs). An
                # ALL-null covariate instead drops out of the design:
                # the kernel's nunique(dropna=False) sees one value
                # (NaN) and removes it as constant, and the covar_samp
                # NULL below excludes it from `active` the same way.
                null_covs = [
                    display[i]
                    for i in range(1, n_cols)
                    if 0 < int(r[f"__nn{i}__"]) < n
                ]
                if null_covs:
                    rec["failed_reason"] = (
                        f"Null covariate values ({', '.join(null_covs)})."
                    )
                    out.append(rec)
                    continue
                # Constant predictor -> failure row (kernel parity; see
                # make_kernel — the min-norm alternative is a false
                # positive). NaN predictor variance falls through to the
                # finiteness guard below.
                v0 = r["__c0_0__"]
                if v0 is None or v0 == 0.0:
                    rec["failed_reason"] = "Constant predictor."
                    out.append(rec)
                    continue
                # Per-pair constant drop: Welford variance == 0 <=>
                # constant (exactly — the merge formula accumulates 0 for
                # identical values). The kernel uses pandas nunique on the
                # same doubles; the two agree including for large-offset
                # covariates where a raw ss/n - mean**2 test would lose
                # the signal to cancellation.
                active = [0]
                nonfinite = False
                for i in range(1, n_cols):
                    if int(r[f"__nn{i}__"]) == 0:
                        # ALL-null covariate: its covar_samp is NULL
                        # (which mapInPandas delivers as NaN, so the
                        # NaN test below can't see the difference — the
                        # non-null count can). The kernel's
                        # nunique(dropna=False) sees one value and
                        # drops it as constant; match that.
                        continue
                    v = r[f"__c{i}_{i}__"]
                    if v is None:
                        continue  # n == 1: no variance; drops, n<=k catches
                    if _math.isnan(v):
                        # NaN variance with non-null values present
                        # means NaN covariate VALUES — a failed pair,
                        # not a constant covariate to drop.
                        nonfinite = True
                        break
                    if v > 0.0:
                        active.append(i)
                if nonfinite:
                    rec["failed_reason"] = (
                        "Non-finite predictor/covariate/dependent values."
                    )
                    out.append(rec)
                    continue
                names = [display[i] for i in active[1:]]
                rec["equation"] = (
                    f"{r['dependent']} ~ {r['predictor']} + {' + '.join(names)}"
                )
                k = len(active) + 1  # + intercept, matching add_intercept
                if n <= k:
                    rec["failed_reason"] = f"OLS requires n > k (n={n}, k={k})"
                    out.append(rec)
                    continue
                # Centered normal equations: A = (n-1)·Cov_xx,
                # b = (n-1)·Cov_xy. The intercept is centered out; it
                # contributes one rank and its coefficient (m_y - m_x·β)
                # is never reported, exactly as in ols_fit where index 0
                # is the predictor's slope.
                nm1 = float(n - 1)
                ka = len(active)
                A = np.empty((ka, ka))
                b = np.empty(ka)
                for ai, i in enumerate(active):
                    for aj in range(ai, ka):
                        j = active[aj]
                        lo, hi = min(i, j), max(i, j)
                        A[ai, aj] = A[aj, ai] = nm1 * r[f"__c{lo}_{hi}__"]
                    b[ai] = nm1 * r[f"__cy{i}__"]
                vy = nm1 * r["__vy__"]
                # NaN/inf values (unlike nulls) flow THROUGH Spark's
                # aggregates, and LAPACK solves NaN systems without
                # raising — which would emit converged=True rows full of
                # NaN stats. Fail as a row instead (the kernel's lstsq
                # raises on the same data and becomes a failure row).
                if not (
                    np.isfinite(A).all()
                    and np.isfinite(b).all()
                    and _math.isfinite(vy)
                ):
                    rec["failed_reason"] = (
                        "Non-finite predictor/covariate/dependent values."
                    )
                    out.append(rec)
                    continue
                rank = ka + 1
                try:
                    beta = np.linalg.solve(A, b)
                    A_inv = np.linalg.inv(A)
                except np.linalg.LinAlgError:
                    # Rank-deficient design: min-norm solution (pinv of
                    # the centered Gram matrix ≡ lstsq's min-norm on the
                    # centered design), and df_resid from the actual
                    # rank (+1 for the intercept) so sigma2/pvals match
                    # ols_fit's lstsq-rank accounting (n - rank), not a
                    # strategy-dependent n - k.
                    A_inv = np.linalg.pinv(A)
                    beta = A_inv @ b
                    rank = int(np.linalg.matrix_rank(A)) + 1
                sse = max(vy - b @ beta, 0.0)
                df_resid = n - rank
                if df_resid <= 0:
                    rec["failed_reason"] = (
                        f"OLS requires n > rank (n={n}, rank={rank})"
                    )
                    out.append(rec)
                    continue
                sigma2 = sse / df_resid
                se = _math.sqrt(max(A_inv[0, 0] * sigma2, 0.0))
                if se > 0:
                    t = beta[0] / se
                    rec["pval"] = 2.0 * t_sf(abs(t), df_resid)
                else:
                    rec["pval"] = _math.nan
                tq = t_ppf(0.975, df_resid)
                rec.update(
                    beta=float(beta[0]),
                    se=se,
                    ci_low=float(beta[0] - tq * se),
                    ci_high=float(beta[0] + tq * se),
                    converged=True,
                )
                out.append(rec)
            yield pd.DataFrame(
                out, columns=[f.name for f in LINEAR_RESULT_SCHEMA.fields]
            )

    return g.mapInPandas(solve, schema=LINEAR_RESULT_SCHEMA)


def _nunique_values(arr) -> int:
    """Distinct-value count of a 1-D array with pandas semantics
    (``Series.nunique(dropna=False)``): all NA-likes collapse to one
    value, -0.0 == 0.0. Series.nunique(dropna=False) is literally
    ``len(self.unique())`` and ``Series.unique()`` delegates to
    ``pd.unique`` on the values, so calling ``pd.unique`` on the raw
    ndarray is the same hashtable over the same values — identical
    count, minus the Series-construction overhead that dominated the
    kernel's validation profile (r13)."""
    return len(pd.unique(arr))


def make_array_kernel(
    model: str,
    covariates: list[str],
    quantitative: bool,
    min_case_count: int,
    sex_restrictions: dict | None = None,
    sex_col: str | None = None,
) -> Callable:
    """The per-pair fit kernel over RAW NUMPY ARRAYS — the shared core
    behind make_kernel / make_packed_kernel / the columnar fan-out, so
    every physical strategy runs the exact same validation, per-subset
    constant drop, design build, and failure-as-row channel.

    Returns ``fn(predictor, dependent, x, y, cov_arrays) -> dict`` where
    ``x``/``y`` are equal-length float64 ndarrays (already null-masked
    like the long-table filter) and ``cov_arrays`` is ``[(safe_name,
    orig_name, values_ndarray)]`` in covariate order for the covariates
    present in the group. The dict is one result row (result_schema
    order keys).

    Split out in r13 (guide §4.2): the pdf-facing wrapper spent
    3-6 ms/fit in pandas machinery (DataFrame construction, Series
    getitem, Series.nunique) against a 14-52 ms fit — pure dispatch
    overhead, none of it arithmetic. Every numeric decision here is
    made by the same operations on the same float64 values as the old
    pdf path (y.sum(), pd.unique-based distinct counts, column_stack →
    add_intercept's C-order copy), so results are bit-identical — the
    r13 A/B battery re-ran green (see OPTIMIZATION_r13.md)."""
    defaults = _LINEAR_DEFAULTS if model in _QUANT_MODELS else _BINARY_DEFAULTS
    fit_func = _MODEL_FUNCS[model]
    cov_pairs = safe_covariate_pairs(covariates)
    sex_safe = None
    if sex_restrictions and sex_col is not None:
        for safe, orig in cov_pairs:
            if orig == sex_col:
                sex_safe = safe
                break

    def akernel(predictor, dependent, x, y, cov_arrays) -> dict:
        from polars_mas_spark.functions.native_threads import limit_native_threads

        limit_native_threads(1)  # no-op after first call per process
        row = dict(defaults)
        row["predictor"] = predictor
        row["dependent"] = dependent

        if sex_safe is not None and sex_restrictions.get(dependent) is not None:
            code = sex_restrictions[dependent]
            mask = None
            for safe, _orig, arr in cov_arrays:
                if safe == sex_safe:
                    # Elementwise == with NaN -> False, exactly the
                    # pandas boolean-filter semantics of the old path.
                    mask = arr == code
                    break
            if mask is not None:
                x = x[mask]
                y = y[mask]
                cov_arrays = [(s, o, a[mask]) for s, o, a in cov_arrays]

        n_rows = len(y)
        if n_rows == 0:
            row["failed_reason"] = "No data after dropping nulls."
            return row

        if not quantitative:
            cases = int(y.sum())
            controls = n_rows - cases
            if cases < min_case_count:
                row["failed_reason"] = f"Insufficient case count ({cases} cases)."
                return row
            if controls < min_case_count:
                row["failed_reason"] = (
                    f"Insufficient control count ({controls} controls)."
                )
                return row
            if cases == n_rows:
                row["failed_reason"] = "All observations are cases."
                return row
            row.update(cases=cases, controls=controls, total_n=n_rows)
        else:
            if n_rows < min_case_count:
                row["failed_reason"] = f"Not enough observations ({n_rows})."
                return row
            row["n_observations"] = n_rows

        # A constant (monomorphic) predictor carries no association
        # signal, but the design matrix [pred, ..., intercept] becomes
        # rank-deficient with the deficiency INVOLVING the predictor:
        # lstsq's min-norm solution then splits the intercept across the
        # two constant columns and reports an arbitrarily significant
        # nonzero beta — a pure false positive. Fail the pair instead
        # (also keeps all three physical strategies result-identical;
        # the centered-moments formulation would report beta=0 here).
        if _nunique_values(x) <= 1:
            row["failed_reason"] = "Constant predictor."
            return row

        # Per-subset constant-covariate drop (analysis.py:196-206).
        active = [
            (orig, arr)
            for _safe, orig, arr in cov_arrays
            if _nunique_values(arr) > 1
        ]
        equation = (
            f"{dependent} ~ {predictor} + {' + '.join(orig for orig, _ in active)}"
        )
        row["equation"] = equation

        # column_stack casts + copies exactly like the old
        # pdf[[...]].to_numpy(float64); layout is normalized anyway by
        # add_intercept's own column_stack (C-order) inside fit_func.
        X = np.column_stack(
            [x, *[arr.astype(np.float64, copy=False) for _o, arr in active]]
        ) if active else x.reshape(-1, 1)
        try:
            stats = fit_func(X, y)
            row.update(stats)
        except Exception as exc:  # failures are rows, not exceptions
            row["failed_reason"] = str(exc)
        return row

    return akernel


def make_kernel(
    model: str,
    covariates: list[str],
    quantitative: bool,
    min_case_count: int,
    sex_restrictions: dict | None = None,
    sex_col: str | None = None,
) -> Callable[[tuple, pd.DataFrame], pd.DataFrame]:
    """Build the grouped-map pandas kernel reproducing the reference's
    per-task pipeline: validation (analysis.py:110-193), per-subset
    constant-covariate drop (analysis.py:196-206), design-matrix build +
    fit (analysis.py:71-87), failure-as-row error channel
    (analysis.py:89-102). Thin pdf adapter over [[make_array_kernel]] —
    the numeric core is shared with every other physical strategy.

    ``sex_restrictions`` implements the reference's declared-but-dead
    sex-specific phecode sets (constants.py:14-16, SURVEY.md §2.12): a
    map of dependent -> required value of the ``sex_col`` covariate.
    Restricted dependents are fitted only on matching-sex rows (R PheWAS
    semantics); the sex covariate then goes constant in that subset and
    the per-group constant drop removes it from the design naturally."""
    columns = [f.name for f in result_schema(model).fields]
    cov_pairs = safe_covariate_pairs(covariates)
    akernel = make_array_kernel(
        model, covariates, quantitative, min_case_count,
        sex_restrictions, sex_col,
    )

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        predictor, dependent = key
        x = pdf[PRED_VALUE].to_numpy()
        y = pdf[DEP_VALUE].to_numpy(dtype=np.float64)
        cov_arrays = [
            (safe, orig, pdf[safe].to_numpy())
            for safe, orig in cov_pairs
            if safe in pdf.columns
        ]
        row = akernel(predictor, dependent, x, y, cov_arrays)
        return pd.DataFrame([{c: row[c] for c in columns}])

    return kernel


def _pair_frame(
    spark: SparkSession, predictors: Iterable[str], dependents: Iterable[str]
) -> DataFrame:
    """The P x D pair list as a PURE-JVM DataFrame.

    Preferred path: Arrow-backed ``createDataFrame(pandas)``, which
    lands each name list as a JVM LocalRelation — one Arrow batch over
    py4j, no Python workers at execution, and (unlike an
    ``F.array(*[F.lit(...)])`` expression tree) no O(D) py4j round
    trips: at 1,800 dependents the literal tree costs ~1 s of pure
    driver time per build, the LocalRelation ~20 ms. The cross join of
    two LocalRelations keeps the pair list JVM-side at any P x D.

    NOT spark.createDataFrame(list_of_tuples) when Arrow is off: that
    parallelizes a pickled Python RDD across defaultParallelism
    partitions, and every partition launches a Python worker just to
    unpickle a couple of strings — measured at ~2 s of dead wait per
    task on a busy daemon (64 s of wall for a 3-row table on
    local[32]); hence the literal-expression fallback."""
    arrow = (
        spark.conf.get("spark.sql.execution.arrow.pyspark.enabled", "false")
        == "true"
    )
    if arrow:
        import pandas as pd

        preds = spark.createDataFrame(
            pd.DataFrame({"predictor": list(predictors)})
        )
        deps = spark.createDataFrame(
            pd.DataFrame({"dependent": list(dependents)})
        )
    else:
        preds = spark.range(1).select(
            F.explode(F.array(*[F.lit(p) for p in predictors])).alias("predictor")
        )
        deps = spark.range(1).select(
            F.explode(F.array(*[F.lit(d) for d in dependents])).alias("dependent")
        )
    return preds.crossJoin(deps)


def choose_strategy(num_pairs: int, n_rows: int) -> str:
    """Pick the physical fan-out strategy from the table shape: columnar
    when the pair fan-out would amplify the data through a shuffle
    (many pairs) and the table is small enough for per-task full-column
    reads; packed otherwise (the tall-table / 100 TB path — the classic
    per-pair unpivot remains available as an explicit strategy)."""
    return "columnar" if num_pairs >= 8 and n_rows <= 100_000_000 else "packed"


def _needs_distributed_writer(spark: SparkSession, checkpoint_dir: str | None) -> bool:
    """True when the per-partition pyarrow writer cannot be trusted:
    the target is a URI-scheme filesystem (hdfs://, s3a://, ...) pyarrow
    has no client for here, or the master is non-local and no explicit
    (shared-storage) checkpoint dir was given — node-local /tmp writes
    would scatter partitions across executors."""
    if checkpoint_dir is not None and "://" in checkpoint_dir:
        return True
    master = spark.sparkContext.master or ""
    return not master.startswith("local") and checkpoint_dir is None


def checkpoint_wide(df: DataFrame, checkpoint_dir: str | None = None) -> str:
    """Write ``df`` to a parquet directory via per-partition pyarrow
    writers (one file per partition, streamed batch-by-batch), returning
    the path.

    This is the engine's analog of the reference's Arrow-IPC sink
    (preprocessing.py:111-132). It deliberately bypasses
    ``df.write.parquet``: Spark's row-based parquet writer pays a
    per-column setup + row-pivot cost that is pathological for
    ~1,800-column PheWAS tables (measured ~8-14 s for a 5k x 1,806 table
    that pyarrow writes in ~0.5 s). The mapInArrow path keeps the data
    columnar end-to-end. Distribution-safe: each task writes only its own
    partition to ``part-<partitionId>.parquet`` (idempotent under task
    retry); on a multi-node cluster the directory must be on POSIX-shared
    storage (NFS/Lustre/fuse mount). URI-scheme targets (hdfs://,
    s3a://) and non-local masters without an explicit shared directory
    RAISE with the fix named — the columnar consumer reads the
    checkpoint with driver-local POSIX I/O, so a checkpoint only Spark
    can read back would fail after paying for the full write."""
    import atexit
    import os
    import shutil
    import tempfile
    import uuid

    spark = df.sparkSession
    if _needs_distributed_writer(spark, checkpoint_dir):
        if checkpoint_dir is None:
            # Non-local master with no shared directory: the distributed
            # writer would land partitions on the default FS while the
            # columnar consumer lists and reads the path with
            # driver-local POSIX I/O — a crash (HDFS) or partial data
            # (scattered executor-local tmp). Fail with the fix instead.
            raise ValueError(
                "columnar checkpoint on a non-local master requires an "
                "explicit POSIX-shared checkpoint_dir (NFS/Lustre "
                "mount); or use strategy='packed', which needs no side "
                "storage."
            )
        if "://" in checkpoint_dir:
            # Refuse BEFORE paying for the full-table write: the
            # columnar consumer lists and reads the checkpoint with
            # driver-local POSIX I/O (os.listdir + pyarrow), which
            # cannot open a URI-scheme path — the expensive write would
            # complete and then the read would FileNotFoundError
            # (review r9).
            raise ValueError(
                "columnar checkpoint requires a POSIX-visible path, got "
                f"URI {checkpoint_dir!r} — mount the filesystem and pass "
                "the mount path, or use strategy='packed'"
            )
        base = checkpoint_dir.rstrip("/")
        path = f"{base}/pms_ckpt_{uuid.uuid4().hex}"
        df.write.parquet(path)
        return path

    in_tmp = checkpoint_dir is None
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.gettempdir()
    path = f"{checkpoint_dir.rstrip('/')}/pms_ckpt_{uuid.uuid4().hex}"
    os.makedirs(path, exist_ok=True)
    if in_tmp:
        atexit.register(shutil.rmtree, path, ignore_errors=True)

    # pyspark's mapInArrow resolves columns UNQUOTED internally
    # (map_ops.py: `self[col]`), so dotted phecode names ("250.1") would
    # be parsed as struct access. Route the boundary through positional
    # safe names and restore the originals on the pyarrow side.
    orig_names = list(df.columns)
    safe = [f"__c{i}__" for i in range(len(orig_names))]

    def write_parts(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        writer = None
        n = 0
        try:
            for batch in batches:
                batch = pa.RecordBatch.from_arrays(
                    list(batch.columns), names=orig_names
                )
                if writer is None:
                    writer = pq.ParquetWriter(
                        f"{path}/part-{pid:05d}.parquet", batch.schema
                    )
                writer.write_batch(batch)
                n += batch.num_rows
        finally:
            if writer is not None:
                writer.close()
        yield pa.RecordBatch.from_arrays(
            [pa.array([n], type=pa.int64())], names=["rows"]
        )

    # The marker count is also the materialization barrier.
    df.toDF(*safe).mapInArrow(write_parts, "rows long").groupBy().sum(
        "rows"
    ).collect()
    return path


def run_associations(
    df: DataFrame,
    config: MASConfig,
    strategy: str = "auto",
    checkpoint_dir: str | None = None,
    checkpoint_path: str | None = None,
    n_rows: int | None = None,
    recipe=None,
    source_files: list[str] | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Distributed equivalent of run_associations_ipc (analysis.py:10-39).

    Three physical strategies, picked by shape:

    - ``packed`` (tall tables — the 100 TB default): one shuffle keyed
      on (predictor, dep-bucket); each row carries the covariates once
      and a bucket of dependent values as an array, cutting shuffle
      cells from n·P·D·(C+1) to n·P·(G·C + D) (SURVEY §7.4.6). The
      kernel unpacks the bucket and runs the per-pair fit per dependent.
    - ``unpivot`` (explicit only): classic wide -> long unpivot, one
      row and one group per (sample, predictor, dependent). Same
      results; kept as the reference-shaped formulation (U1) and the
      parity baseline for packed.
    - ``moments`` (linear model only — the AUTO DEFAULT whenever it
      applies): per-pair OLS via sufficient statistics — the shuffle
      carries map-side-combined centered moment partials (Welford
      covariances, O(k²) doubles per pair per partition — offset-stable
      at any covariate scale) instead of sample rows; see
      _fit_linear_moments. Row count drops out of the shuffle entirely.
    - ``columnar`` (wide, short tables — the PheWAS shape: 5k-500k
      samples x ~1,800 phecodes): checkpoint the preprocessed table to
      parquet once (the exact analog of the reference's Arrow-IPC sink +
      per-worker mmap column reads, preprocessing.py:111-132 /
      analysis.py:54-59), then fan the PAIR LIST out and let each task
      do a column-pruned parquet read of just its dependents + the
      shared design columns. ZERO shuffle of sample data; the long-table
      unpivot would move n_rows x n_deps duplicated covariates through a
      shuffle for a table that reads back in kilobytes per task.

    ``auto`` uses columnar when the duplicated-long-table cell count
    (rows x pairs) is large relative to the table itself — i.e. when the
    shuffle would amplify the data — and the table is small enough that
    a per-task full-column read is cheap (<= ~100M rows).
    """
    if strategy not in ("auto", "columnar", "moments", "packed", "unpivot"):
        # A typo previously fell through to the classic unpivot — the
        # exact n·P·D·(C+1) shuffle the other strategies exist to avoid
        # — with no error (review r9).
        raise ValueError(
            f"unknown strategy {strategy!r}; valid: "
            "auto/columnar/moments/packed/unpivot"
        )
    spark = df.sparkSession
    model = config.model
    covariates = list(config.covariate_columns)
    num_pairs = len(config.predictor_columns) * len(config.dependent_columns)
    if strategy == "auto":
        # Linear models are exactly identified by their moment
        # statistics, so the moments plan dominates at every shape (no
        # row shuffle for tall tables, no checkpoint for wide ones) —
        # it is the auto default whenever it applies. Iterative models
        # pick by table shape.
        if (
            config.model == "linear"
            and config.quantitative
            and len(covariates) <= 64
        ):
            strategy = "moments"
        else:
            if n_rows is None:
                n_rows = df.count()
            strategy = choose_strategy(num_pairs, n_rows)
            if (
                strategy == "columnar"
                and checkpoint_path is None
                and source_files is None
                and _needs_distributed_writer(spark, checkpoint_dir)
            ):
                # Auto-picked columnar needs driver-POSIX storage for
                # its per-task reads; with none available (non-local
                # master, no shared checkpoint_dir) the packed shuffle
                # is the correct plan, not a crash.
                strategy = "packed"
    if strategy == "columnar":
        fitted = _fit_columnar(
            df, config, checkpoint_dir, checkpoint_path, recipe, source_files
        )
        return _complete_pairs(spark, fitted, config)
    if strategy == "moments":
        return _complete_pairs(spark, _fit_linear_moments(df, config), config)

    par = spark.sparkContext.defaultParallelism
    if strategy == "packed":
        # Tall-table scale path (SURVEY §7.4.6): dependents travel as
        # per-bucket arrays so the shuffle duplicates covariates G times
        # per sample row instead of D times. G targets 4 groups per core
        # for balance; when P·D is already at or below that, every
        # dependent gets its own bucket and the plan degenerates to
        # exactly the classic per-pair grouping.
        preds, deps = config.predictor_columns, config.dependent_columns
        if n_buckets is None:
            n_buckets = packed_bucket_count(len(preds), len(deps), par)
        bucket_deps = dependent_buckets(deps, n_buckets)
        packed = build_packed_long_table(df, preds, deps, covariates, bucket_deps)
        # Map-side predictor-null drop (analysis.py:57); dependent nulls
        # ride inside the arrays as NaN and are masked per-dependent in
        # the kernel.
        packed = packed.filter(F.col(PRED_VALUE).isNotNull())
        kernel = make_packed_kernel(
            model, covariates, config.quantitative, config.min_case_count,
            bucket_deps, config.sex_restrictions, config.sex_col,
        )
        n_groups = len(preds) * len(bucket_deps)
        n_parts = max(1, min(n_groups, par))
        packed = packed.repartition(n_parts, "predictor", PACKED_BUCKET)
        fitted = packed.groupBy("predictor", PACKED_BUCKET).applyInPandas(
            kernel, schema=result_schema(model)
        )
        return _complete_pairs(spark, fitted, config)

    long_df = build_long_table(
        df, config.predictor_columns, config.dependent_columns, covariates
    )
    # Map-side null drop (analysis.py:57) — nulls never reach the
    # shuffle. NaN dependents are MISSING on every path (packed masks
    # them per-dependent; moments/columnar drop them); without the
    # isnan filter a binary-model kernel would crash the whole job on
    # int(NaN) instead of treating the row as absent. NaN predictors
    # stay — the kernel fails those pairs as rows.
    long_df = long_df.filter(
        F.col(PRED_VALUE).isNotNull()
        & F.col(DEP_VALUE).isNotNull()
        & ~F.isnan(F.col(DEP_VALUE))
    )
    kernel = make_kernel(
        model, covariates, config.quantitative, config.min_case_count,
        config.sex_restrictions, config.sex_col,
    )
    # Explicitly size the fan-out shuffle: one partition per pair up to
    # the cluster parallelism. Deliberately NOT left to AQE — adaptive
    # coalescing merges partitions by BYTES, and regression groups are
    # byte-small but compute-heavy, so AQE would happily serialize 1,800
    # fits into one Python worker. The explicit repartition also keeps
    # empty shuffle partitions (each of which launches a Python worker
    # for FlatMapGroupsInPandas) to zero when P*D < parallelism.
    n_parts = max(1, min(num_pairs, par))
    long_df = long_df.repartition(n_parts, "predictor", "dependent")
    fitted = long_df.groupBy("predictor", "dependent").applyInPandas(
        kernel, schema=result_schema(model)
    )

    return _complete_pairs(spark, fitted, config)


def _complete_pairs(
    spark: SparkSession, fitted: DataFrame, config: MASConfig
) -> DataFrame:
    """Pairs whose rows were all null-dropped produce no fit row at all;
    left-join the full pair list against the (tiny) fitted results to
    re-materialize their failure rows with reference sentinels
    (analysis.py:113-124). ``fitted`` is the broadcast side: results are
    P x D rows, and broadcasting keeps the Python stage free of any
    co-partitioning requirement a sort-merge join would impose on it."""
    model = config.model
    num_pairs = len(config.predictor_columns) * len(config.dependent_columns)
    pairs = _pair_frame(spark, config.predictor_columns, config.dependent_columns)
    defaults = dict(_LINEAR_DEFAULTS if model in _QUANT_MODELS else _BINARY_DEFAULTS)
    defaults["failed_reason"] = "No data after dropping nulls."
    schema_types = {f.name: f.dataType for f in result_schema(model).fields}
    present = fitted.withColumn("__present__", F.lit(True))
    # Broadcast only while the results table is actually broadcastable;
    # past ~500k pairs (wide stats rows add up) fall back to a shuffle
    # join — at that scale the pair list is also worth distributing.
    right = F.broadcast(present) if num_pairs <= 500_000 else present
    joined = pairs.join(right, ["predictor", "dependent"], "left")

    # NaN/NULL failure representation — the single place it is decided.
    # The pandas kernel emits float NaN for every unfit statistic
    # (reference analysis.py:228-260 sentinels), but the Arrow grouped-map
    # boundary converts pandas NaN -> Spark NULL. The kernel never emits a
    # true null in a double column, so any NULL double here IS a converted
    # NaN: coalesce it back. This keeps output files showing NaN like the
    # reference AND makes `pval IS NOT NULL` counting match polars'
    # is_not_null() (True for NaN) — failed fits count toward the
    # Bonferroni num_tests exactly as in reference postprocessing.py:18.
    def _value(c: str, v):
        dtype = schema_types[c]
        absent = F.lit(v).cast(dtype)  # F.lit(nan) is a real double NaN
        present_val = F.col(c)
        if isinstance(dtype, T.DoubleType):
            present_val = F.coalesce(present_val, F.lit(float("nan")))
        return (
            F.when(F.col("__present__").isNull(), absent)
            .otherwise(present_val)
            .alias(c)
        )

    filled = joined.select(
        "predictor",
        "dependent",
        *[_value(c, v) for c, v in defaults.items()],
    )
    # Sort the (tiny: P x D rows) results table. NOT orderBy: a global
    # orderBy range-samples its input, which would execute the entire
    # regression fan-out a second time just to pick partition bounds.
    # repartition(1) is a real shuffle boundary (upstream parallelism
    # intact), and the single-partition sort is trivial at results scale.
    return filled.repartition(1).sortWithinPartitions(
        F.col("pval").asc_nulls_last()
    )


def reusable_scan_files(df: DataFrame) -> list[str] | None:
    """If ``df`` is nothing but a (projected) parquet scan, return its
    local data files so the columnar fan-out can read the SOURCE directly
    instead of writing a redundant checkpoint copy. Conservative: any
    computed expression, filter, or non-parquet source returns None."""
    try:
        # Render the plan with field-list truncation disabled: the
        # default spark.sql.debug.maxToStringFields=25 elides projection
        # entries past the 25th as "... N more fields", which would hide
        # a computed or renamed column from the guards below and reuse
        # the WRONG source files — silently wrong statistics at exactly
        # the ~1,800-column scale this path exists for.
        conf = df.sparkSession.conf
        key = "spark.sql.debug.maxToStringFields"
        old = conf.get(key, None)
        conf.set(key, "1000000")
        try:
            plan = df._jdf.queryExecution().optimizedPlan().toString()
        finally:
            if old is None:
                conf.unset(key)
            else:
                conf.set(key, old)
    except Exception:
        return None
    if "more fields" in plan:
        return None  # truncated render despite the conf — stay safe
    lines = [ln for ln in plan.splitlines() if ln.strip()]
    if not lines:
        return None
    rel = lines[-1].strip(" +-:")
    if not rel.startswith("Relation") or "parquet" not in rel.lower():
        return None
    for ln in lines[:-1]:
        stripped = ln.strip(" +-:")
        if not stripped.startswith("Project ["):
            return None
        inner = stripped[len("Project ["): stripped.rindex("]")]
        if "(" in inner or " AS " in inner:
            return None  # computed or renamed column
    try:
        files = [
            f[len("file:"):] if f.startswith("file:") else f
            for f in df.inputFiles()
        ]
    except Exception:
        return None
    if not files or any("://" in f for f in files):
        return None  # non-local storage: fall back to checkpoint
    return sorted(files)


def _parquet_files(path: str) -> list[str]:
    """Driver-side listing of the data files in a parquet directory, so
    task readers never trip over _SUCCESS / .crc sidecar files."""
    import os

    if os.path.isfile(path):
        return [path]
    return sorted(
        f"{path}/{f}"
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(".")
    )


def _fit_columnar(
    df: DataFrame,
    config: MASConfig,
    checkpoint_dir: str | None,
    checkpoint_path: str | None = None,
    recipe=None,
    source_files: list[str] | None = None,
) -> DataFrame:
    """Column-parallel fan-out: checkpoint the table to parquet (via
    checkpoint_wide, unless the caller already has parquet files),
    distribute the PAIR list, and let every task column-prune its own
    parquet read (design columns + its slice of dependents).

    This is the Spark-native re-expression of the reference's physical
    strategy — sink_ipc + per-worker memory-mapped column reads
    (preprocessing.py:111-132, analysis.py:54-59) — and moves zero
    sample data through a shuffle. Parquet being columnar, each task's
    read is proportional to the columns it fits, exactly like the
    reference's mmap column access.

    With ``recipe`` (a PrepRecipe), ``df``/the files hold the RAW
    included table and each task applies preprocessing to its slice in
    pandas — the preprocessed wide table never exists as a JVM schema.
    Without one, the input must already be preprocessed."""
    spark = df.sparkSession
    model = config.model
    covariates = list(config.covariate_columns)
    cov_pairs = safe_covariate_pairs(covariates)
    predictors = list(config.predictor_columns)
    dependents = list(config.dependent_columns)

    if source_files is None:
        # Keep every column under its original (possibly dotted) name —
        # parquet has no column-name restrictions and pyarrow reads by
        # exact name, so no rename dance is needed.
        path = checkpoint_path or checkpoint_wide(df, checkpoint_dir)
        source_files = _parquet_files(path)

    akernel = make_array_kernel(
        model, covariates, config.quantitative, config.min_case_count,
        config.sex_restrictions, config.sex_col,
    )
    schema = result_schema(model)
    columns = [f.name for f in schema.fields]
    n_parts = max(1, min(len(predictors) * len(dependents),
                         spark.sparkContext.defaultParallelism))
    pairs = _pair_frame(spark, predictors, dependents).repartition(n_parts)

    cov_names = cov_pairs
    extra_cols = list(recipe.read_cols) if recipe is not None else []

    def fit_partition(batches):
        import numpy as np  # noqa: F401  (kernel dependency)
        import pandas as pd
        import pyarrow.dataset as pads

        from polars_mas_spark.functions.native_threads import limit_native_threads

        limit_native_threads(1)

        todo = []
        for pdf in batches:
            todo.extend(zip(pdf["predictor"], pdf["dependent"]))
        if not todo:
            return
        by_pred: dict[str, list[str]] = {}
        for p, d in todo:
            by_pred.setdefault(p, []).append(d)
        for p, deps in by_pred.items():
            cols = [p, *[orig for _, orig in cov_names], *extra_cols, *deps]
            # use_threads=False: with one Python worker already pinned to
            # every core, pyarrow's own thread pool (default = all cores)
            # only adds contention — same reasoning as the BLAS cap in
            # session._BLAS_ENV.
            dummy_names = (
                {f"{c}_{lv}" for c, lvs in recipe.onehot.items() for lv in lvs[1:]}
                if recipe is not None
                else set()
            )
            read_cols = [c for c in dict.fromkeys(cols) if c not in dummy_names]
            tbl = pads.dataset(source_files).to_table(
                columns=read_cols, use_threads=False
            )
            data = tbl.to_pandas(use_threads=False)
            # True-null vs NaN must be distinguished BEFORE to_pandas
            # erases the difference: nulls are missing rows (dropped,
            # like every other path), while NaN predictors must reach
            # the kernel and fail the pair as a row (packed/unpivot
            # parity). The arrow validity bitmap still knows which is
            # which; carry it as a column so the recipe's row filters
            # keep it aligned.
            import pyarrow.compute as pc

            data["__pred_isnull__"] = pc.is_null(tbl[p]).to_numpy(
                zero_copy_only=False
            )
            if recipe is not None:
                if recipe.sex_filter is not None:
                    # Same validity-bitmap trick for the sex filter:
                    # Spark keeps float-NaN sex under `sex != code` but
                    # drops true NULLs — apply_pandas needs to know
                    # which NaN is which (strategy parity).
                    data["__sex_isnull__"] = pc.is_null(
                        tbl[recipe.sex_filter[0]]
                    ).to_numpy(zero_copy_only=False)
                data = recipe.apply_pandas(data)
            x = pd.to_numeric(data[p], errors="coerce")
            # One numpy view per group column; per-dependent work below
            # is pure ndarray masking + the shared array kernel. Values
            # and decisions are identical to the old per-dependent
            # pandas-frame construction (see make_array_kernel); rows
            # come back as ONE DataFrame per predictor group instead of
            # 1-row frames — same rows, ~D fewer Arrow batches per task.
            x_np = x.to_numpy()
            prednull_np = data["__pred_isnull__"].to_numpy()
            cov_np = [
                (safe, orig, data[orig].to_numpy())
                for safe, orig in cov_names
            ]
            rows = []
            for d in deps:
                y = pd.to_numeric(data[d], errors="coerce")
                y_np = y.to_numpy()
                mask = (~prednull_np) & ~pd.isna(y_np)
                rows.append(
                    akernel(
                        p, d,
                        x_np[mask].astype(np.float64),
                        y_np[mask].astype(np.float64),
                        [(s, o, a[mask]) for s, o, a in cov_np],
                    )
                )
            yield pd.DataFrame(
                [{c: r[c] for c in columns} for r in rows], columns=columns
            )

    return pairs.mapInPandas(fit_partition, schema=schema)
