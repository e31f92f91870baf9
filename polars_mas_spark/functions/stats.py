"""Regression kernels: OLS, logistic (Newton/IRLS), Firth-penalized
logistic, and Poisson (log-link counts/rates, beyond-reference).

These reproduce the statistical contract of the reference engine
(/root/reference/src/polars_mas/models.py:9-83) without its dependencies
(statsmodels / firthmodels are not available here), using the published
algorithms directly:

- OLS: pseudo-inverse least squares; t-distributed Wald p-values and
  confidence intervals with df = n - k (statsmodels.OLS semantics).
- Logistic: Newton-Raphson on the log-likelihood (statsmodels.Logit's
  default method), normal Wald p-values/CIs.
- Firth: penalized-likelihood logistic regression (Firth 1993; Heinze &
  Schemper 2002) with the R `logistf` default hyperparameters the
  reference pins (models.py:33-40): max_iter=25, max_step=5.0,
  gtol=1e-5, xtol=1e-5. The p-value is a penalized likelihood-ratio
  test of the tested coefficient (models.py:41 `fl.lrt(0)`), which is
  what makes small-sample/separated PheWAS fits well-behaved.

Design-matrix convention (reference models.py:58,73): the *tested*
predictor is column 0, covariates follow, and the intercept is appended
LAST, so index 0 always addresses the predictor's coefficient.

All functions take plain NumPy arrays and return plain dicts — they are
called from inside `applyInPandas` pandas UDFs on executors and must not
touch Spark.
"""

from __future__ import annotations

import math

import numpy as np

from polars_mas_spark.functions.distributions import (
    chi2_sf,
    norm_ppf,
    norm_sf,
    t_ppf,
    t_sf,
)

_Z975 = norm_ppf(0.975)


def add_intercept(X: np.ndarray) -> np.ndarray:
    """Append an intercept column (reference: sm.add_constant(prepend=False))."""
    return np.column_stack([X, np.ones(X.shape[0])])


# ---------------------------------------------------------------------------
# OLS
# ---------------------------------------------------------------------------


def ols_fit(X: np.ndarray, y: np.ndarray) -> dict:
    """Ordinary least squares with statsmodels-compatible inference.

    Returns the reference's linear-model output fields
    (/root/reference/src/polars_mas/models.py:72-83): pval/beta/se/
    ci_low/ci_high for the coefficient at index 0, converged always True.
    """
    Xc = add_intercept(np.asarray(X, dtype=np.float64))
    y = np.asarray(y, dtype=np.float64)
    n, k = Xc.shape
    if n <= k:
        raise ValueError(f"OLS requires n > k (n={n}, k={k})")
    beta, _, rank, _ = np.linalg.lstsq(Xc, y, rcond=None)
    resid = y - Xc @ beta
    df_resid = n - rank
    sigma2 = resid @ resid / df_resid
    xtx_inv = np.linalg.pinv(Xc.T @ Xc)
    se = np.sqrt(np.maximum(np.diag(xtx_inv) * sigma2, 0.0))
    tstat = beta[0] / se[0] if se[0] > 0 else math.nan
    pval = 2.0 * t_sf(abs(tstat), df_resid) if not math.isnan(tstat) else math.nan
    tq = t_ppf(0.975, df_resid)
    return {
        "pval": pval,
        "beta": float(beta[0]),
        "se": float(se[0]),
        "converged": True,
        "ci_low": float(beta[0] - tq * se[0]),
        "ci_high": float(beta[0] + tq * se[0]),
    }


# ---------------------------------------------------------------------------
# Logistic (maximum likelihood, Newton-Raphson)
# ---------------------------------------------------------------------------


def _sigmoid(eta: np.ndarray) -> np.ndarray:
    out = np.empty_like(eta)
    pos = eta >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-eta[pos]))
    ez = np.exp(eta[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


class _Workspace:
    """Preallocated per-fit buffers for the iterative kernels.

    Why: every Newton iteration otherwise materializes several fresh
    n-length (and one n×k) float64 temporaries. glibc malloc serves
    blocks above ~32 MB straight from mmap and unmaps them on free, so
    once a single pair's n reaches the millions the solver turns
    page-fault-bound: a planted 2x2-structure Firth fit measured 71 s
    at n=6M against 2.3 s at n=600k (31x wall on 10x rows) on a VM
    whose cold-fault throughput is ~20 MB/s, with `np.exp` itself at
    2 ns/element once pages are warm. Reusing buffers faults each page
    once per FIT instead of once per OPERATION (the same fit drops to
    ~7 s), and on any hardware removes allocator pressure and improves
    cache reuse across the ~17 state evaluations of a typical
    full+null+profile-CI solve chain.

    Every buffered expression reproduces the unbuffered operation
    sequence exactly (same ufuncs, same operand order, commutative
    swaps only), so results are bit-identical — verified against a
    captured 28-fixture battery across all four model families.
    """

    def __init__(self, Xc: np.ndarray, y: np.ndarray):
        n, _ = Xc.shape
        self.one_minus_y = 1.0 - y
        self.eta = np.empty(n)
        self.t = np.empty(n)
        self.u = np.empty(n)
        self.h = np.empty(n)
        self.mask = np.empty(n, dtype=bool)
        self.mask2 = np.empty(n, dtype=bool)
        # Explicit C-order: Xc may arrive F-ordered (pandas to_numpy is
        # column-major) and np.dot(..., out=) requires a C-array output.
        self.nk = np.empty(Xc.shape, dtype=np.float64)
        # Double-buffered (p, w): the Firth monotone safeguard evaluates
        # candidate states while the current beta's state must stay live.
        self.pw = (
            (np.empty(n), np.empty(n)),
            (np.empty(n), np.empty(n)),
        )


def _sigmoid_into(eta: np.ndarray, out: np.ndarray, ws: _Workspace) -> np.ndarray:
    """_sigmoid into a preallocated buffer; bit-identical to _sigmoid
    (exp of the identical per-element argument, identical divides)."""
    np.greater_equal(eta, 0.0, out=ws.mask)
    t, u = ws.t, ws.u
    np.abs(eta, out=t)
    np.negative(t, out=t)
    np.exp(t, out=t)  # exp(-|eta|) == exp(-eta) for eta>=0, exp(eta) else
    np.add(t, 1.0, out=u)
    np.divide(1.0, u, out=out)  # eta >= 0 branch: 1 / (1 + exp(-eta))
    np.divide(t, u, out=t)  # eta < 0 branch: e^eta / (1 + e^eta)
    np.logical_not(ws.mask, out=ws.mask2)
    np.copyto(out, t, where=ws.mask2)
    return out


def _loglik(y: np.ndarray, p: np.ndarray, ws: _Workspace | None = None) -> float:
    eps = 1e-300
    if ws is None:
        return float(y @ np.log(p + eps) + (1.0 - y) @ np.log(1.0 - p + eps))
    t = ws.t
    np.add(p, eps, out=t)
    np.log(t, out=t)
    s1 = y @ t
    np.subtract(1.0, p, out=t)
    np.add(t, eps, out=t)
    np.log(t, out=t)
    s2 = ws.one_minus_y @ t
    return float(s1 + s2)


def logistic_mle(
    Xc: np.ndarray,
    y: np.ndarray,
    max_iter: int = 35,
    tol: float = 1e-8,
    ws: _Workspace | None = None,
) -> tuple[np.ndarray, np.ndarray, bool]:
    """Newton-Raphson logistic MLE on a design matrix that already has its
    intercept. Returns (beta, cov, converged)."""
    n, k = Xc.shape
    if ws is None:
        ws = _Workspace(Xc, y)
    beta = np.zeros(k)
    converged = False
    cov = np.full((k, k), np.nan)

    def state(b: np.ndarray) -> np.ndarray:
        # p = _sigmoid(Xc @ b); w = p * (1 - p); hess = (Xc * w).T @ Xc
        # — buffered, bit-identical (see _Workspace).
        p, w = ws.pw[0]
        np.dot(Xc, b, out=ws.eta)
        _sigmoid_into(ws.eta, p, ws)
        np.subtract(1.0, p, out=w)
        np.multiply(p, w, out=w)
        np.multiply(Xc, w[:, None], out=ws.nk)
        return ws.nk.T @ Xc

    for _ in range(max_iter):
        hess = state(beta)
        p, _ = ws.pw[0]
        np.subtract(y, p, out=ws.u)
        grad = Xc.T @ ws.u
        try:
            step = np.linalg.solve(hess, grad)
        except np.linalg.LinAlgError:
            step = np.linalg.lstsq(hess, grad, rcond=None)[0]
        beta = beta + step
        if np.max(np.abs(step)) < tol:
            converged = True
            break
    hess = state(beta)
    try:
        cov = np.linalg.inv(hess)
    except np.linalg.LinAlgError:
        cov = np.linalg.pinv(hess)
    return beta, cov, converged


def logistic_fit(X: np.ndarray, y: np.ndarray) -> dict:
    """Plain logistic regression, Wald inference on coefficient 0.

    Mirrors /root/reference/src/polars_mas/models.py:56-69
    (statsmodels Logit defaults: Newton, Wald z p-values, normal CIs).
    """
    Xc = add_intercept(np.asarray(X, dtype=np.float64))
    y = np.asarray(y, dtype=np.float64)
    beta, cov, converged = logistic_mle(Xc, y)
    se = math.sqrt(max(cov[0, 0], 0.0))
    z = beta[0] / se if se > 0 else math.nan
    pval = 2.0 * norm_sf(abs(z)) if not math.isnan(z) else math.nan
    return {
        "pval": pval,
        "beta": float(beta[0]),
        "se": se,
        # np.exp, not math.exp: |beta| > ~709 under quasi-separation
        # must yield inf (reference statsmodels/numpy behavior), not an
        # OverflowError that the kernel would misreport as a failed fit.
        "OR": float(np.exp(beta[0])),
        "converged": bool(converged),
        "ci_low": float(beta[0] - _Z975 * se),
        "ci_high": float(beta[0] + _Z975 * se),
    }


# ---------------------------------------------------------------------------
# Firth-penalized logistic
# ---------------------------------------------------------------------------


def _firth_penalized_loglik(Xc: np.ndarray, y: np.ndarray, beta: np.ndarray) -> float:
    p = _sigmoid(Xc @ beta)
    w = p * (1.0 - p)
    fisher = (Xc * w[:, None]).T @ Xc
    return _pll_from_parts(y, p, fisher)


def _pll_from_parts(
    y: np.ndarray,
    p: np.ndarray,
    fisher: np.ndarray,
    ws: _Workspace | None = None,
) -> float:
    """Penalized log-likelihood from already-computed fit byproducts —
    avoids re-evaluating p and the information matrix when the caller
    (the profile-CI search, one call per scalar evaluation × thousands
    of regressions) just finished a Newton solve that produced them."""
    sign, logdet = np.linalg.slogdet(fisher)
    if sign <= 0:
        return -math.inf
    return _loglik(y, p, ws) + 0.5 * logdet


def _firth_newton(
    Xc: np.ndarray,
    y: np.ndarray,
    free: np.ndarray,
    beta0: np.ndarray | None = None,
    max_iter: int = 25,
    max_step: float = 5.0,
    gtol: float = 1e-5,
    xtol: float = 1e-5,
    max_halvings: int = 12,
    ws: _Workspace | None = None,
) -> tuple[np.ndarray, np.ndarray, bool, np.ndarray, np.ndarray, np.ndarray]:
    """Firth-penalized Newton iteration over the `free` coefficient subset
    (boolean mask); fixed coordinates stay at their beta0 value. Used for
    both the full fit (all free) and the LRT-constrained fit (coef 0 fixed
    at zero, penalty still from the full-model information matrix).

    Hyperparameters match the reference's logistf-default pins
    (/root/reference/src/polars_mas/models.py:33-40), plus
    penalized-likelihood-monotone step halving (logistf's maxhs
    safeguard): a candidate step that DECREASES the PLL is halved until
    it doesn't. Without it the clamped Newton step can 2-cycle forever
    — observed on an LRT null fit whose free intercept sits ~6 units
    from its optimum with a +/-5 step clamp (r6: the fan-out golden's
    planted odds-ratio-81 dependent). Halving never moves the fixed
    point, so converged numerics are unchanged.
    """
    n, k = Xc.shape
    if ws is None:
        ws = _Workspace(Xc, y)
    beta = np.zeros(k) if beta0 is None else beta0.astype(np.float64).copy()
    converged = False

    def state(b, slot):
        # p = _sigmoid(Xc @ b); w = p * (1 - p); fisher = (Xc*w).T @ Xc
        # — buffered into the slot's (p, w) pair, bit-identical (see
        # _Workspace). fisher is k×k and stays a fresh matmul result.
        p, w = ws.pw[slot]
        np.dot(Xc, b, out=ws.eta)
        _sigmoid_into(ws.eta, p, ws)
        np.subtract(1.0, p, out=w)
        np.multiply(p, w, out=w)
        np.multiply(Xc, w[:, None], out=ws.nk)
        return p, w, ws.nk.T @ Xc

    cur = 0
    p, w, fisher = state(beta, cur)
    # pll is evaluated lazily: the monotone safeguard only engages on
    # LARGE steps (>= 1, where clamp-induced 2-cycles and overshoot
    # live); small near-convergence Newton steps skip the O(n)
    # log-likelihood pass entirely, keeping the well-behaved hot path
    # at the unguarded loop's cost (None = stale/not computed).
    pll = None
    # All-free fast path (the full fit and every profile refit's
    # complement): score[free] / fisher[np.ix_(free, free)] with an
    # all-True mask are plain copies — skipping them feeds the SAME
    # values to the same LAPACK calls (bit-identical results), minus
    # two array copies per Newton iteration (r13).
    free_all = bool(free.all())
    for _ in range(max_iter):
        try:
            fisher_inv = np.linalg.inv(fisher)
        except np.linalg.LinAlgError:
            fisher_inv = np.linalg.pinv(fisher)
        # Hat-matrix diagonal h_i = w_i * x_i' I^{-1} x_i, as one BLAS
        # matmul + a row-wise dot (the 3-operand einsum form contracts
        # in C loops without BLAS and dominated the whole Firth kernel's
        # profile at ~60% of fit time).
        np.dot(Xc, fisher_inv, out=ws.nk)
        np.einsum("ij,ij->i", ws.nk, Xc, out=ws.h)
        np.multiply(ws.h, w, out=ws.h)
        # Firth modified score: X' (y - p + h (1/2 - p)).
        np.subtract(0.5, p, out=ws.t)
        np.multiply(ws.h, ws.t, out=ws.t)
        np.subtract(y, p, out=ws.u)
        np.add(ws.u, ws.t, out=ws.u)
        score = Xc.T @ ws.u
        if free_all:
            score_f = score
            sub = fisher
        else:
            score_f = score[free]
            sub = fisher[np.ix_(free, free)]
        try:
            step = np.linalg.solve(sub, score_f)
        except np.linalg.LinAlgError:
            step = np.linalg.lstsq(sub, score_f, rcond=None)[0]
        mx = np.max(np.abs(step)) if step.size else 0.0
        if mx > max_step:
            step = step * (max_step / mx)
            mx = max_step
        # Monotone-ascent safeguard: halve a PLL-decreasing LARGE step.
        # The accepted candidate's state doubles as the next iteration's
        # state, so the guarded path costs one state eval per halving
        # try and the small-step path costs exactly what the unguarded
        # loop did (one state eval per iteration, no PLL pass).
        # beta[free] + step with free all-True adds the same operands
        # elementwise as beta + step — identical bits, one copy fewer.
        cand = beta.copy() if not free_all else None
        if mx >= 1.0:
            if pll is None:
                pll = _pll_from_parts(y, p, fisher, ws)
            for _hs in range(max_halvings + 1):
                if free_all:
                    cand = beta + step
                else:
                    cand[free] = beta[free] + step
                p2, w2, f2 = state(cand, 1 - cur)
                pll2 = _pll_from_parts(y, p2, f2, ws)
                if pll2 >= pll - 1e-12:
                    break
                step = step * 0.5
                mx = mx * 0.5
        else:
            if free_all:
                cand = beta + step
            else:
                cand[free] = beta[free] + step
            p2, w2, f2 = state(cand, 1 - cur)
            pll2 = None
        beta, p, w, fisher, pll = cand, p2, w2, f2, pll2
        cur = 1 - cur
        if mx <= xtol and np.max(np.abs(score_f), initial=0.0) <= gtol:
            converged = True
            break
    try:
        cov = np.linalg.inv(fisher)
    except np.linalg.LinAlgError:
        cov = np.linalg.pinv(fisher)
    # p/w/fisher are final-state byproducts; returning them lets the
    # profile-CI search skip a full recomputation per scalar evaluation.
    return beta, cov, converged, p, w, fisher


def _profile_pll(
    Xc: np.ndarray,
    y: np.ndarray,
    j: int,
    b: float,
    beta_start: np.ndarray,
    ws: _Workspace | None = None,
) -> tuple[float, np.ndarray, float, np.ndarray]:
    """Penalized log-likelihood profiled over all coefficients except j,
    which is fixed at b, plus d(profile PLL)/db. Warm-started from
    beta_start (continuation along the profile makes each inner Newton
    converge in a few steps).

    The derivative comes free by the envelope theorem: at the profiled
    optimum the inner coordinates are stationary, so the total
    derivative of the profile PLL w.r.t. b reduces to the j-th component
    of the Firth-modified score U* = X'(y - p + h(1/2 - p)) evaluated at
    the profiled solution — no extra refit, one score evaluation.

    Also returns the profile-path TANGENT d(beta)/d(beta_j) =
    cov[:, j] / cov[j, j] (implicit function theorem on the free-score
    stationarity, via the partitioned-inverse identity — no extra
    solve), which the CI search uses to form a first-order predictor
    for the NEXT refit's warm start. The r8 measurement: this predictor
    cuts the inner Newton from ~3.9 to ~2 state evaluations per profile
    point, the largest single component of per-fit solver time
    (SCALING.md r7 decomposition)."""
    free = np.ones(Xc.shape[1], dtype=bool)
    free[j] = False
    beta0 = beta_start.astype(np.float64).copy()
    beta0[j] = b
    # Looser inner tolerance than the headline fit: by the same envelope
    # argument the profile value's error is SECOND order in the inner
    # solve's error (1e-4 coords -> ~1e-8 in f), well inside the scalar
    # search's tolerance; measured bound movement < 1e-14.
    beta_c, cov, _, p, w, fisher = _firth_newton(
        Xc, y, free, beta0=beta0, xtol=1e-4, gtol=1e-4, ws=ws
    )
    cjj = float(cov[j, j])
    tangent = cov[:, j] / cjj if (cjj > 0 and math.isfinite(cjj)) else None
    # The solver's final-state byproducts (p, w, fisher, cov=fisher^-1)
    # are exactly what the profile value and derivative need — no
    # recomputation. Buffered forms are bit-identical (see _Workspace);
    # the None-ws path keeps the original expressions.
    if ws is None:
        h = w * np.einsum("ij,ij->i", Xc @ cov, Xc)
        grad_j = float(Xc[:, j] @ (y - p + h * (0.5 - p)))
    else:
        np.dot(Xc, cov, out=ws.nk)
        np.einsum("ij,ij->i", ws.nk, Xc, out=ws.h)
        np.multiply(ws.h, w, out=ws.h)
        np.subtract(0.5, p, out=ws.t)
        np.multiply(ws.h, ws.t, out=ws.t)
        np.subtract(y, p, out=ws.u)
        np.add(ws.u, ws.t, out=ws.u)
        grad_j = float(Xc[:, j] @ ws.u)
    return _pll_from_parts(y, p, fisher, ws), beta_c, grad_j, tangent


def _hermite_root(
    b1: float, f1: float, g1: float,
    b2: float, f2: float, g2: float,
    target: float,
) -> float:
    """Root of the cubic Hermite interpolant of (b, f(b)) through two
    points WITH derivatives, solved for f = target inside (b1, b2).
    Pure scalar arithmetic (a dozen flops + <=20 scalar Newton steps on
    the cubic), so it is free next to one _profile_pll evaluation; using
    both bracket ends' f AND f' gives a 4th-order-accurate estimate
    where one-sided Newton is 2nd-order. Returns NaN when degenerate or
    the estimate leaves the bracket (caller falls back to bisection)."""
    h = b2 - b1
    if h == 0.0 or not all(map(math.isfinite, (f1, g1, f2, g2))):
        return math.nan
    # Cubic in t = (b - b1)/h: H(t) = f1 + c1 t + c2 t^2 + c3 t^3.
    c1 = g1 * h
    c2 = 3.0 * (f2 - f1) - (2.0 * g1 + g2) * h
    c3 = -2.0 * (f2 - f1) + (g1 + g2) * h
    # Seed from the secant, refine with safeguarded scalar Newton on H.
    denom = f2 - f1
    t = (target - f1) / denom if denom != 0.0 else 0.5
    t = min(max(t, 1e-6), 1.0 - 1e-6)
    for _ in range(20):
        ht = f1 + t * (c1 + t * (c2 + t * c3))
        dt = c1 + t * (2.0 * c2 + t * 3.0 * c3)
        if dt == 0.0:
            break
        t_new = t - (ht - target) / dt
        if not (0.0 < t_new < 1.0):
            break
        if abs(t_new - t) < 1e-12:
            t = t_new
            break
        t = t_new
    b = b1 + t * h
    lo, hi = (b1, b2) if b1 < b2 else (b2, b1)
    return b if lo < b < hi else math.nan


def firth_profile_ci(
    Xc: np.ndarray,
    y: np.ndarray,
    beta_hat: np.ndarray,
    pll_full: float,
    se: float,
    j: int = 0,
    alpha: float = 0.05,
    tol: float = 1e-6,
    max_expand: int = 40,
    ws: _Workspace | None = None,
    tangent0: np.ndarray | None = None,
) -> tuple[float, float]:
    """Profile penalized-likelihood CI for coefficient j (the method
    behind R logistf's default ``conf_int`` and firthmodels', which the
    reference uses — models.py:45-53): the bound is the value of
    beta_j at which the profiled penalized log-likelihood drops by
    chi2_{1,1-alpha}/2 from its maximum (Venzon & Moolgavkar 1988).

    Bracket each side starting from the Wald bound, then close in with
    SAFEGUARDED NEWTON on the scalar profile: the derivative of the
    profile PLL is the modified score's j-th component at the profiled
    solution (see _profile_pll), so each evaluation yields both f and
    f' and the root find converges quadratically — typically 2-4
    evaluations per side instead of the ~8 a blind secant/bisection
    hybrid needs (this search runs once per regression × thousands of
    regressions, so evaluation count is the whole cost). A Newton step
    leaving the bracket falls back to the midpoint. Returns (low,
    high); an unbracketable side (profile never drops far enough within
    the expansion budget) yields ±inf.

    Each refit's warm start is the FIRST-ORDER PREDICTOR along the
    profile path, warm + (b - b_warm) * tangent, with the tangent
    d(beta)/d(beta_j) returned for free by the previous _profile_pll
    (``tangent0`` seeds it from the full fit's covariance). The inner
    Newton then starts within O(db^2) of the profiled solution instead
    of O(db), converging in ~2 evaluations instead of ~4 — same solver,
    same tolerances, same outer search; only the starting point moves,
    so converged numerics agree with the unpredicted path to the inner
    tolerance's second order (measured: bounds move < 2e-9 across the
    28-fixture battery, goldens hash-stable)."""
    zq = norm_ppf(1.0 - alpha / 2.0)
    target = pll_full - 0.5 * zq * zq
    step0 = zq * se if (se > 0 and math.isfinite(se)) else 1.0
    bounds = [math.nan, math.nan]
    for side, direction in ((0, -1.0), (1, 1.0)):
        # Expand outward from beta_hat_j until the profile falls below
        # the target (f is decreasing as we move away from the optimum).
        # First probe at 1.15x the Wald half-width — profile bounds run
        # slightly wide of Wald for logistic-shaped likelihoods, so this
        # usually brackets in ONE evaluation; afterwards each probe uses
        # its own derivative to jump (overshooting 10% to force the
        # bracket) instead of blind geometric growth.
        # g at the optimum is exactly 0 (the profile derivative IS the
        # modified score's j-th component, stationary at beta_hat).
        b_in, f_in, g_in = float(beta_hat[j]), pll_full, 0.0
        warm, b_warm, tang = beta_hat, float(beta_hat[j]), tangent0
        step = 1.15 * step0
        b_out, f_out, g_out = None, None, 0.0
        b = float(beta_hat[j])

        def predicted(bv: float) -> np.ndarray:
            if tang is None:
                return warm
            return warm + (bv - b_warm) * tang

        for _ in range(max_expand):
            b = b + direction * step
            f, wc, g, tg = _profile_pll(Xc, y, j, b, predicted(b), ws)
            warm, b_warm = wc, b
            if tg is not None:
                tang = tg
            if f < target:
                b_out, f_out, g_out = b, f, g
                break
            b_in, f_in, g_in = b, f, g
            jump = (target - f) / g if g != 0.0 else math.nan
            if math.isfinite(jump) and direction * jump > 0:
                step = 1.1 * abs(jump)
            else:
                step *= 1.6
        if b_out is None:
            bounds[side] = direction * math.inf
            continue
        # Safeguarded CUBIC-HERMITE root find on [b_in, b_out]
        # (f_in > target > f_out; f and f' known at BOTH ends, the
        # derivative free via the envelope theorem). The Hermite
        # interpolant is 4th-order accurate where the r7 one-sided
        # Newton was 2nd-order — measured one fewer evaluation per side
        # on the PheWAS shapes at identical converged bounds.
        # Convergence is GUARANTEED, not just typical: any iteration
        # whose |f - target| fails to shrink by at least 30% forces the
        # next step to be a bisection (which halves the bracket), so a
        # stalling interpolant cannot burn the iteration cap creeping
        # along an ill-conditioned profile. The trigger is on
        # f-progress, NOT bracket width — an interpolant converging to
        # a root near one end of the bracket never shrinks the width
        # much, and a width trigger would punish exactly the healthy
        # case (it measurably doubled evaluations per side when tried).
        best_b, best_gap = b_out, abs(f_out - target)
        prev_gap = best_gap
        force_bisect = False
        for _ in range(30):
            if best_gap < tol or abs(b_out - b_in) < 1e-10:
                break
            b_next = (
                _hermite_root(b_in, f_in, g_in, b_out, f_out, g_out, target)
                if not force_bisect
                else math.nan
            )
            if math.isnan(b_next):  # degenerate, forced, or out of bracket
                b_next = 0.5 * (b_in + b_out)
            f_next, wc, g_next, tg = _profile_pll(
                Xc, y, j, b_next, predicted(b_next), ws
            )
            warm, b_warm = wc, b_next
            if tg is not None:
                tang = tg
            if f_next >= target:
                b_in, f_in, g_in = b_next, f_next, g_next
            else:
                b_out, f_out, g_out = b_next, f_next, g_next
            gap = abs(f_next - target)
            force_bisect = gap > 0.7 * prev_gap
            prev_gap = gap
            if gap < best_gap:
                best_b, best_gap = b_next, gap
        bounds[side] = best_b
    return bounds[0], bounds[1]


def firth_fit(X: np.ndarray, y: np.ndarray, ci_method: str = "profile") -> dict:
    """Firth logistic regression with a penalized LRT p-value for coef 0.

    Mirrors /root/reference/src/polars_mas/models.py:9-53: the p-value is
    the penalized likelihood-ratio test obtained by refitting with the
    tested coefficient constrained to zero; `converged` is False when
    either fit exhausts its iterations (the reference detects this via
    ConvergenceWarning, models.py:42-44). ``ci_method="profile"``
    (default) computes profile penalized-likelihood CIs exactly like the
    reference's firthmodels delegate; ``"wald"`` is the cheap fallback.
    """
    Xc = add_intercept(np.asarray(X, dtype=np.float64))
    y = np.asarray(y, dtype=np.float64)
    k = Xc.shape[1]
    # One buffer set serves the full fit, the LRT null fit, and every
    # profile-CI refit — they all share (n, k) (see _Workspace).
    ws = _Workspace(Xc, y)
    all_free = np.ones(k, dtype=bool)
    # Start the full fit at the base-rate intercept (logit of the
    # prevalence; intercept is the LAST column by the module's design
    # convention) instead of all-zeros: for rare outcomes — the PheWAS
    # regime, prevalence ~1-5% — the zeros start pays 2-5 extra Newton
    # steps walking the intercept to ~-3..-5, sometimes through the
    # monotone-halving guard (r8 measurement: 8->6 and 13->8 state
    # evals at prevalence 0.05/0.004; identical converged beta to
    # <= 6e-8, gated by the A/B fixture battery + MAS goldens).
    ybar = float(y.mean())
    beta0_full = None
    if 0.0 < ybar < 1.0:
        beta0_full = np.zeros(k)
        beta0_full[-1] = math.log(ybar / (1.0 - ybar))
    beta, cov, conv_full, p_full, _, fish_full = _firth_newton(
        Xc, y, all_free, beta0=beta0_full, ws=ws
    )
    pll_full = _pll_from_parts(y, p_full, fish_full, ws)

    # LRT null fit warm-started from the full-model solution (the
    # reference's firthmodels warm_start=True, models.py:41): with only
    # coef 0 moved to zero the remaining coordinates start near their
    # constrained optimum, so this solve typically needs 2-3 iterations.
    constrained = np.ones(k, dtype=bool)
    constrained[0] = False
    beta_null = beta.copy()
    beta_null[0] = 0.0
    _, _, conv_null, p_null, _, fish_null = _firth_newton(
        Xc, y, constrained, beta0=beta_null, ws=ws
    )
    pll_null = _pll_from_parts(y, p_null, fish_null, ws)

    lr = max(2.0 * (pll_full - pll_null), 0.0)
    pval = chi2_sf(lr, 1.0)
    se = math.sqrt(max(cov[0, 0], 0.0))
    if ci_method == "profile":
        c00 = float(cov[0, 0])
        tangent0 = (
            cov[:, 0] / c00 if (c00 > 0 and math.isfinite(c00)) else None
        )
        ci_low, ci_high = firth_profile_ci(
            Xc, y, beta, pll_full, se, ws=ws, tangent0=tangent0
        )
    else:
        ci_low, ci_high = beta[0] - _Z975 * se, beta[0] + _Z975 * se
    return {
        "pval": pval,
        "beta": float(beta[0]),
        "se": se,
        "OR": math.exp(beta[0]),
        "converged": bool(conv_full and conv_null),
        "ci_low": float(ci_low),
        "ci_high": float(ci_high),
    }


# ---------------------------------------------------------------------------
# Poisson (log-linear count regression, Newton-Raphson)
# ---------------------------------------------------------------------------


def _poisson_loglik(
    y: np.ndarray, eta: np.ndarray, ws: _Workspace | None = None
) -> float:
    """Log-likelihood up to the y!-constant (constant drops out of every
    comparison the solver makes)."""
    if ws is None:
        return float(y @ eta - np.exp(eta).sum())
    np.exp(eta, out=ws.t)
    return float(y @ eta - ws.t.sum())


def poisson_fit(
    X: np.ndarray, y: np.ndarray, offset: np.ndarray | None = None
) -> dict:
    """Poisson (log-link) count regression, Wald inference on
    coefficient 0 — the same output contract as ols_fit/logistic_fit
    so the fan-out machinery treats it like any other kernel (beyond
    reference: the reference's model set stops at firth/logistic/
    linear, models.py:40-83).

    Newton-Raphson with step-halving on the (constant-dropped)
    log-likelihood: mu = exp(eta) makes the raw Newton step prone to
    overshoot into overflow for steep designs, and halving until the
    objective improves is the standard safeguard (textbook IRLS
    globalization). Start at beta = [0,...,0, log(mean(y)+eps)] — the
    intercept-only MLE — so the first step is already well-scaled.
    """
    Xc = add_intercept(np.asarray(X, dtype=np.float64))
    y = np.asarray(y, dtype=np.float64)
    n, k = Xc.shape
    if np.any(y < 0):
        raise ValueError("Poisson model requires non-negative counts")
    # Exposure offset (log person-time / log denominator): eta = X.b +
    # offset with coefficient fixed at 1 — turns the model into a RATE
    # regression. None = the plain count model.
    off = (
        np.zeros(n)
        if offset is None
        else np.asarray(offset, dtype=np.float64)
    )
    beta = np.zeros(k)
    beta[-1] = math.log(float(y.mean()) + 1e-12) - float(off.mean())
    # Per-fit buffer reuse — same page-fault rationale and bit-identity
    # contract as the Firth/logistic solvers (see _Workspace).
    ws = _Workspace(Xc, y)

    def eta_into(b: np.ndarray) -> np.ndarray:
        np.dot(Xc, b, out=ws.eta)
        np.add(ws.eta, off, out=ws.eta)
        return ws.eta

    def mu_hess(b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        # mu = exp(clip(Xc @ b + off, -700, 700)); hess = (Xc*mu).T @ Xc
        np.clip(eta_into(b), -700, 700, out=ws.u)
        mu = ws.h
        np.exp(ws.u, out=mu)
        np.multiply(Xc, mu[:, None], out=ws.nk)
        return mu, ws.nk.T @ Xc

    ll = _poisson_loglik(y, eta_into(beta), ws)
    converged = False
    for _ in range(50):
        mu, hess = mu_hess(beta)
        np.subtract(y, mu, out=ws.u)
        grad = Xc.T @ ws.u
        try:
            step = np.linalg.solve(hess, grad)
        except np.linalg.LinAlgError:
            step = np.linalg.lstsq(hess, grad, rcond=None)[0]
        # Step-halving line search on the log-likelihood.
        scale, improved = 1.0, False
        for _h in range(30):
            cand = beta + scale * step
            ll_cand = _poisson_loglik(y, eta_into(cand), ws)
            if ll_cand >= ll - 1e-12:
                improved = True
                break
            scale *= 0.5
        if not improved:
            break
        beta, ll = cand, ll_cand
        if np.max(np.abs(scale * step)) < 1e-9:
            converged = True
            break
    _, hess = mu_hess(beta)
    try:
        cov = np.linalg.inv(hess)
    except np.linalg.LinAlgError:
        cov = np.linalg.pinv(hess)
    se = math.sqrt(max(cov[0, 0], 0.0))
    z = beta[0] / se if se > 0 else math.nan
    pval = 2.0 * norm_sf(abs(z)) if not math.isnan(z) else math.nan
    return {
        "pval": pval,
        "beta": float(beta[0]),
        "se": se,
        "converged": bool(converged),
        "ci_low": float(beta[0] - _Z975 * se),
        "ci_high": float(beta[0] + _Z975 * se),
    }
