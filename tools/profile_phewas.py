"""Profile the PheWAS columnar fan-out OFF-Spark (r13, VERDICT r12 #2).

Reproduces exactly what one `_fit_columnar.fit_partition` task does —
pyarrow column-pruned read, recipe apply, per-dependent mask + kernel —
single-threaded on the driver, so the per-fit cost decomposes into
(read, prep, pandas glue, firth_fit) without Spark scheduling noise.

Usage: python tools/profile_phewas.py [--n-samples 5000] [--n-covariates 5]
       [--n-deps 112] [--profile]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

for _k in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "VECLIB_MAXIMUM_THREADS", "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_k, "1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-samples", type=int, default=5000)
    ap.add_argument("--n-covariates", type=int, default=5)
    ap.add_argument("--n-deps", type=int, default=112,
                    help="dependents fitted in this simulated task "
                         "(1800/16 ≈ two tasks per core at 32 cores)")
    ap.add_argument("--profile", action="store_true",
                    help="cProfile the kernel loop")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("phewas-profile")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from polars_mas_spark.config import MASConfig
    from polars_mas_spark.operators.association import (
        DEP_VALUE,
        PRED_VALUE,
        make_kernel,
        safe_covariate_pairs,
    )
    from polars_mas_spark.operators.preprocessing import build_prep_recipe
    from polars_mas_spark.queries_ext import _phewas_wide_parquet

    t0 = time.time()
    path = _phewas_wide_parquet(
        spark, "/root/testdata/sf0.1", n_samples=args.n_samples,
        n_phecodes=1800, n_covariates=args.n_covariates,
    )
    print(f"fixture gen: {time.time() - t0:.2f}s  ({path})")

    wide = spark.read.parquet(path)
    deps_all = [c for c in wide.columns if c.startswith("phecode_")]
    covs = [c for c in wide.columns if c.startswith("cov_")]
    cfg = MASConfig(
        predictors="exposure", dependents=deps_all, covariates=covs,
        model="firth", min_case_count=20,
    )
    cfg.resolve(wide.columns)

    t0 = time.time()
    recipe = build_prep_recipe(wide, cfg)
    print(f"build_prep_recipe (1 Spark agg job): {time.time() - t0:.2f}s")

    deps = deps_all[: args.n_deps]
    p = "exposure"
    cov_names = safe_covariate_pairs(list(cfg.covariate_columns))
    extra_cols = list(recipe.read_cols)

    import pandas as pd
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    files = sorted(
        f"{path}/{f}" for f in os.listdir(path) if f.endswith(".parquet")
    )

    # --- read ---
    t0 = time.time()
    cols = [p, *[orig for _, orig in cov_names], *extra_cols, *deps]
    dummy_names = {
        f"{c}_{lv}" for c, lvs in recipe.onehot.items() for lv in lvs[1:]
    }
    read_cols = [c for c in dict.fromkeys(cols) if c not in dummy_names]
    tbl = pads.dataset(files).to_table(columns=read_cols, use_threads=False)
    t_read = time.time() - t0

    # --- prep ---
    t0 = time.time()
    data = tbl.to_pandas(use_threads=False)
    data["__pred_isnull__"] = pc.is_null(tbl[p]).to_numpy(zero_copy_only=False)
    data = recipe.apply_pandas(data)
    x = pd.to_numeric(data[p], errors="coerce")
    covs_frame = {safe: data[orig] for safe, orig in cov_names}
    t_prep = time.time() - t0

    kernel = make_kernel(
        "firth", list(cfg.covariate_columns), cfg.quantitative,
        cfg.min_case_count, cfg.sex_restrictions, cfg.sex_col,
    )

    # --- per-dep glue + fit ---
    def run_all():
        glue = fit = 0.0
        for d in deps:
            g0 = time.time()
            y = pd.to_numeric(data[d], errors="coerce")
            mask = (~data["__pred_isnull__"]) & y.notna()
            pdf = pd.DataFrame(
                {
                    PRED_VALUE: x[mask].astype("float64"),
                    DEP_VALUE: y[mask].astype("float64"),
                    **{safe: s[mask] for safe, s in covs_frame.items()},
                }
            )
            g1 = time.time()
            kernel((p, d), pdf)
            glue += g1 - g0
            fit += time.time() - g1
        return glue, fit

    t0 = time.time()
    t_glue, t_fit = run_all()
    t_total = time.time() - t0

    n = args.n_deps
    print(f"\nsimulated task: {n} dependents, n={args.n_samples}, "
          f"k={len(cfg.covariate_columns)}+1")
    print(f"  read  : {t_read:.3f}s")
    print(f"  prep  : {t_prep:.3f}s")
    print(f"  glue  : {t_glue:.3f}s  ({1000 * t_glue / n:.2f} ms/fit)")
    print(f"  fit   : {t_fit:.3f}s  ({1000 * t_fit / n:.2f} ms/fit)")
    print(f"  total : {t_read + t_prep + t_total:.3f}s")
    est32 = (t_read + t_prep + t_total) * (1800 / n) / 32
    print(f"  -> ideal 32-core fan-out wall for 1800 fits: {est32:.2f}s")

    if args.profile:
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        run_all()
        pr.disable()
        stats = pstats.Stats(pr)
        stats.sort_stats("cumulative").print_stats(30)

    spark.stop()


if __name__ == "__main__":
    main()
