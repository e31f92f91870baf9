"""A/B bit-identity battery for kernel changes (the CLAUDE.md
obligation made a tool, r13): load the OLD stats.py/association.py from
`git show HEAD:...`, run 51 (X, y) shapes x 4 model families plus 200
randomized kernel-level trials against the working tree, and require
bit-identical results (repr-equal floats, identical failure rows,
identical exception behavior). Run BEFORE committing any change to
functions/stats.py or the association kernels:

    python tools/ab_kernel_battery.py

Exits non-zero on any mismatch. CI bounds tighter than the historical
contract (beta/se/pval bit-identical, CI <= 1e-6 relative): this battery
requires full bit equality, which every r13 change satisfies.
"""

import importlib.util
import math
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, "/root/repo")
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

import numpy as np
import pandas as pd


def load_old(relpath, name):
    src = subprocess.check_output(
        ["git", "-C", "/root/repo", "show", f"HEAD:{relpath}"]).decode()
    d = tempfile.mkdtemp()
    p = os.path.join(d, name + ".py")
    open(p, "w").write(src)
    spec = importlib.util.spec_from_file_location(name, p)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


old_stats = load_old("polars_mas_spark/functions/stats.py", "old_stats")
import polars_mas_spark.functions.stats as new_stats

rng = np.random.default_rng(20260818)
cases = []
# Diverse shapes: n, k, prevalence, separation-ish, constants, collinear.
for n in (60, 300, 2000, 5000):
    for k in (0, 1, 5, 20):
        for prev in (0.5, 0.1, 0.02):
            X = rng.normal(size=(n, k + 1))
            eta = 0.8 * X[:, 0] + math.log(prev / (1 - prev))
            y = (rng.random(n) < 1 / (1 + np.exp(-eta))).astype(float)
            cases.append((X, y))
# Edge cases
n = 500
X = rng.normal(size=(n, 3)); X[:, 2] = 1.7  # constant covariate
y = (rng.random(n) < 0.3).astype(float)
cases.append((X, y))
X = rng.normal(size=(n, 3)); X[:, 2] = X[:, 1] * 2.0  # collinear
cases.append((X, y))
X = rng.normal(size=(n, 2)); y = (X[:, 0] > 0).astype(float)  # separation
cases.append((X, y))
# planted 2x2 structure (the r7 fixture class)
x0 = np.repeat([0.0, 1.0], n // 2)
X = np.column_stack([x0, rng.normal(size=n)])
y = np.concatenate([rng.random(n // 2) < 0.05, rng.random(n // 2) < 0.35]).astype(float)
cases.append((X, y))

bad = 0
for i, (X, y) in enumerate(cases):
    for fn in ("firth_fit", "logistic_fit", "ols_fit", "poisson_fit"):
        yy = y if fn != "poisson_fit" else np.floor(y * 3 + rng.poisson(1.0, len(y)))
        try:
            old = getattr(old_stats, fn)(X, yy)
            old_exc = None
        except Exception as e:
            old, old_exc = None, repr(e)
        try:
            new = getattr(new_stats, fn)(X, yy)
            new_exc = None
        except Exception as e:
            new, new_exc = None, repr(e)
        if old_exc or new_exc:
            if old_exc != new_exc:
                print(f"case {i} {fn}: EXC MISMATCH old={old_exc} new={new_exc}")
                bad += 1
            continue
        for key in old:
            ov, nv = old[key], new[key]
            same = (ov == nv) or (
                isinstance(ov, float) and isinstance(nv, float)
                and math.isnan(ov) and math.isnan(nv)
            ) or (
                isinstance(ov, float) and isinstance(nv, float)
                and repr(ov) == repr(nv)
            )
            if not same:
                print(f"case {i} {fn} {key}: old={ov!r} new={nv!r}")
                bad += 1
print(f"stats battery: {len(cases)} cases x 4 models, mismatches={bad}")
assert bad == 0

# ---- kernel-level battery: old make_kernel vs new make_kernel ----
sys.path.insert(0, "/root/repo")
# old association needs its sibling imports; easiest: import new module
# for helpers and only diff make_kernel behavior via the old module with
# stubbed package imports. Instead: reconstruct old kernel behavior via
# git worktree? Simpler: compare new make_kernel against new
# make_array_kernel-free REFERENCE implemented inline from HEAD source.
old_assoc = None
try:
    src = subprocess.check_output(
        ["git", "-C", "/root/repo", "show",
         "HEAD:polars_mas_spark/operators/association.py"]).decode()
    d = tempfile.mkdtemp()
    pkgdir = d
    p = os.path.join(d, "old_assoc.py")
    open(p, "w").write(src)
    spec = importlib.util.spec_from_file_location("old_assoc", p)
    old_assoc = importlib.util.module_from_spec(spec)
    sys.modules["old_assoc"] = old_assoc
    spec.loader.exec_module(old_assoc)
except Exception as e:
    print("old assoc load failed:", e)
    raise

import polars_mas_spark.operators.association as new_assoc

PRED = new_assoc.PRED_VALUE
DEP = new_assoc.DEP_VALUE

rng = np.random.default_rng(7)
kbad = 0
for trial in range(200):
    n = int(rng.integers(0, 400))
    covs = [f"c{j}" for j in range(int(rng.integers(0, 4)))]
    model = rng.choice(["firth", "logistic", "linear", "poisson"])
    quantitative = model in ("linear", "poisson")
    data = {
        PRED: rng.choice([0.0, 1.0, 2.0, np.nan], size=n,
                         p=[0.4, 0.3, 0.25, 0.05]).astype(float),
        DEP: (rng.random(n) < 0.3).astype(float)
        if not quantitative else rng.normal(size=n),
    }
    for c in covs:
        kind = rng.integers(0, 4)
        if kind == 0:
            data[c] = rng.normal(size=n)
        elif kind == 1:
            data[c] = np.full(n, 3.3)  # constant
        elif kind == 2:
            data[c] = rng.integers(0, 3, size=n).astype(np.int64)
        else:
            arr = rng.normal(size=n)
            arr[rng.random(n) < 0.1] = np.nan
            data[c] = arr
    pdf = pd.DataFrame(data)
    sex_restr = None
    sex_col = None
    if covs and rng.random() < 0.3:
        sex_col = covs[0]
        pdf[covs[0]] = rng.choice([0.0, 1.0], size=n)
        sex_restr = {"dep0": 1.0}
    key = ("pred0", "dep0")
    ok_old = ok_new = None
    min_cc = int(rng.choice([1, 5, 20]))
    old_k = old_assoc.make_kernel(model, covs, quantitative, min_cc,
                                  sex_restr, sex_col)
    new_k = new_assoc.make_kernel(model, covs, quantitative, min_cc,
                                  sex_restr, sex_col)
    try:
        r_old = old_k(key, pdf.copy())
        e_old = None
    except Exception as e:
        r_old, e_old = None, repr(e)
    try:
        r_new = new_k(key, pdf.copy())
        e_new = None
    except Exception as e:
        r_new, e_new = None, repr(e)
    if e_old or e_new:
        if e_old != e_new:
            print(f"trial {trial}: EXC MISMATCH old={e_old} new={e_new}")
            kbad += 1
        continue
    ro, rn = r_old.iloc[0].to_dict(), r_new.iloc[0].to_dict()
    for kk in ro:
        ov, nv = ro[kk], rn[kk]
        same = (ov == nv) or (
            isinstance(ov, float) and isinstance(nv, float)
            and ((math.isnan(ov) and math.isnan(nv)) or repr(ov) == repr(nv))
        )
        if not same:
            print(f"trial {trial} model={model} field {kk}: old={ov!r} new={nv!r}")
            kbad += 1
print(f"kernel battery: 200 trials, mismatches={kbad}")
assert kbad == 0
print("ALL GREEN")
