"""Regression-kernel correctness against closed-form oracles.

The reference validates its kernels by numerical agreement with the R
PheWAS package (benchmarks/README.md:69-81). Without R or statsmodels in
this environment, we use exact closed-form results instead:

- logistic on a 2x2 table: beta = ln(ad/bc), se = sqrt(1/a+1/b+1/c+1/d)
- Firth on a 2x2 table: the Haldane-Anscombe +1/2 correction is the
  exact penalized-likelihood solution
- OLS: normal-equation solution, and R-verified t quantiles
"""

import math

import numpy as np
import pytest

from polars_mas_spark.functions.stats import (
    firth_fit,
    logistic_fit,
    logistic_mle,
    ols_fit,
)


def _two_by_two(a, b, c, d):
    x = np.array([1] * (a + b) + [0] * (c + d), float).reshape(-1, 1)
    y = np.array([1] * a + [0] * b + [1] * c + [0] * d, float)
    return x, y


def test_logistic_2x2_closed_form():
    a, b, c, d = 30, 10, 15, 45
    x, y = _two_by_two(a, b, c, d)
    res = logistic_fit(x, y)
    assert res["beta"] == pytest.approx(math.log(a * d / (b * c)), abs=1e-10)
    assert res["se"] == pytest.approx(math.sqrt(1 / a + 1 / b + 1 / c + 1 / d), abs=1e-10)
    assert res["OR"] == pytest.approx(a * d / (b * c), rel=1e-9)
    assert res["converged"] is True
    # Wald CI: beta +/- 1.96 * se
    z = 1.959963984540054
    assert res["ci_low"] == pytest.approx(res["beta"] - z * res["se"], abs=1e-10)
    assert res["ci_high"] == pytest.approx(res["beta"] + z * res["se"], abs=1e-10)


def test_firth_2x2_haldane_correction():
    a, b, c, d = 30, 10, 15, 45
    x, y = _two_by_two(a, b, c, d)
    res = firth_fit(x, y)
    expected = math.log((a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5)))
    assert res["beta"] == pytest.approx(expected, abs=1e-6)
    assert res["converged"] is True
    assert 0 < res["pval"] < 1


def test_firth_survives_complete_separation():
    x = np.array([0, 0, 0, 0, 1, 1, 1, 1], float).reshape(-1, 1)
    y = np.array([0, 0, 0, 0, 1, 1, 1, 1], float)
    res = firth_fit(x, y)
    assert np.isfinite(res["beta"])
    assert 0 < res["pval"] < 0.05  # separation IS evidence of effect


def test_firth_matches_logistic_on_large_balanced_data():
    rng = np.random.default_rng(7)
    n = 5000
    X = rng.normal(size=(n, 2))
    logit = 0.8 * X[:, 0] - 0.3 * X[:, 1] + 0.2
    y = (rng.random(n) < 1 / (1 + np.exp(-logit))).astype(float)
    rf = firth_fit(X, y)
    rl = logistic_fit(X, y)
    # Firth bias correction is O(1/n): estimates agree closely at n=5000.
    assert rf["beta"] == pytest.approx(rl["beta"], abs=5e-3)
    assert rf["pval"] == pytest.approx(rl["pval"], rel=0.2)


def test_logistic_gradient_zero_at_optimum():
    rng = np.random.default_rng(3)
    n = 800
    X = rng.normal(size=(n, 3))
    y = (rng.random(n) < 1 / (1 + np.exp(-(0.5 * X[:, 0])))).astype(float)
    Xc = np.column_stack([X, np.ones(n)])
    beta, _, converged = logistic_mle(Xc, y)
    p = 1 / (1 + np.exp(-(Xc @ beta)))
    grad = Xc.T @ (y - p)
    assert converged
    assert np.max(np.abs(grad)) < 1e-6


def test_ols_matches_normal_equations():
    rng = np.random.default_rng(0)
    n = 200
    X = rng.normal(size=(n, 2))
    y = 2.0 * X[:, 0] - 1.0 * X[:, 1] + 3 + rng.normal(size=n)
    res = ols_fit(X, y)
    Xc = np.column_stack([X, np.ones(n)])
    beta = np.linalg.solve(Xc.T @ Xc, Xc.T @ y)
    assert res["beta"] == pytest.approx(beta[0], abs=1e-10)
    resid = y - Xc @ beta
    sigma2 = resid @ resid / (n - 3)
    se = math.sqrt(np.linalg.inv(Xc.T @ Xc)[0, 0] * sigma2)
    assert res["se"] == pytest.approx(se, abs=1e-10)
    assert res["converged"] is True
    assert res["pval"] < 1e-10


def test_ols_perfect_fit_p_near_zero():
    X = np.arange(10, dtype=float).reshape(-1, 1)
    y = 3.0 * X[:, 0] + 1.0
    res = ols_fit(X, y)
    assert res["beta"] == pytest.approx(3.0, abs=1e-8)


def test_firth_sex2_golden():
    """Golden parity on the `logistf` sex2 dataset — THE standard Firth
    validation fixture (239 rows; bundled unused by the reference at
    src/polars_mas/data/sex2.csv). Expected coefficients are the
    published logistf results (Heinze & Schemper 2002; logistf package
    docs), which the reference's own oracle (firthmodels) also
    reproduces. Loaded from the read-only reference tree; skipped if
    absent."""
    import os

    path = "/root/reference/src/polars_mas/data/sex2.csv"
    if not os.path.exists(path):
        pytest.skip("sex2 fixture not available")
    import pandas as pd

    df = pd.read_csv(path)
    y = df["case"].to_numpy(float)
    X = df[["age", "oc", "vic", "vicl", "vis", "dia"]].to_numpy(float)
    published = {  # coef, (profile-PL ci_low, ci_high) from logistf docs
        "age": (-1.1059740, (-1.9731003, -0.3074811)),
        "oc": (-0.0688167, (-0.9414205, 0.7891819)),
        "vic": (2.2688664, (1.2730214, 3.4371827)),
        "vicl": (-2.1114140, (-3.2596825, -1.1173943)),
        "vis": (-0.7883200, (-1.6080510, 0.0151846)),
        "dia": (3.0960104, (0.7745682, 8.0302808)),
    }
    for i, nm in enumerate(published):
        cols = [i] + [j for j in range(6) if j != i]
        res = firth_fit(X[:, cols], y)
        coef, (lo, hi) = published[nm]
        assert res["converged"] is True
        assert res["beta"] == pytest.approx(coef, abs=1e-4), nm
        # Profile penalized-likelihood CIs (reference delegates these to
        # firthmodels, models.py:45-53); 5e-3 covers logistf's own
        # root-finding tolerance.
        assert res["ci_low"] == pytest.approx(lo, abs=5e-3), nm
        assert res["ci_high"] == pytest.approx(hi, abs=5e-3), nm
    # Published LRT p-value (logistf summary): age 6.148205e-03.
    res_age = firth_fit(X[:, [0, 1, 2, 3, 4, 5]], y)
    assert res_age["pval"] == pytest.approx(6.148205e-03, abs=1e-4)
