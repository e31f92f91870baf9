"""Unit bindings for text.train_quality_classifier (VERDICT r9
next-steps #5): the distributed MLlib LBFGS fit must agree with the
engine's own golden-validated numpy Newton kernel (logistic_mle) on the
identical design matrix, and the returned (weights, bias) must score
through model_quality_score exactly as dot(w, x) + bias."""

from __future__ import annotations

import hashlib
import math

import numpy as np


def _hb(token: str, buckets: int, salt: str) -> int:
    """Python replica of sampling.hash_bucket (first 8 md5 hex digits
    of salt||token, mod buckets)."""
    return int(hashlib.md5((salt + token).encode()).hexdigest()[:8], 16) % buckets


def _featurize(text: str, buckets: int, salt: str) -> np.ndarray:
    toks = [t for t in text.lower().split() if t]
    x = np.zeros(buckets)
    for t in toks:
        x[_hb(t, buckets, salt)] += 1.0
    return x / max(len(toks), 1)


def _corpus(seed: int = 5, n: int = 120, buckets: int = 8):
    """Multi-token corpus with a planted signal: docs containing 'good'
    lean positive, 'bad' negative, plus noise tokens."""
    rng = np.random.RandomState(seed)
    vocab = ["good", "bad", "the", "fish", "blue", "red"]
    rows = []
    for i in range(n):
        k = rng.randint(2, 6)
        toks = list(rng.choice(vocab, size=k))
        toks.append("good" if i % 3 else "bad")
        logit = 2.0 * toks.count("good") / len(toks) - 2.0 * toks.count(
            "bad"
        ) / len(toks)
        y = int(rng.uniform() < 1.0 / (1.0 + math.exp(-logit)))
        rows.append((i, " ".join(toks), y))
    return rows


def test_mllib_fit_matches_numpy_kernel(spark):
    """Same data, same featurization: MLlib LBFGS (distributed) vs the
    repo's Newton logistic_mle (numpy) must land on the same MLE."""
    from polars_mas_spark.functions.stats import add_intercept, logistic_mle
    from polars_mas_spark.operators.text import train_quality_classifier

    buckets, salt = 8, "qt"
    rows = _corpus(buckets=buckets)
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w, bias = train_quality_classifier(
        df, "text", "label", n_buckets=buckets, salt=salt, tol=1e-10
    )

    X = np.stack([_featurize(t, buckets, salt) for _, t, _ in rows])
    y = np.array([float(yy) for *_, yy in rows])
    used = np.flatnonzero(X.any(axis=0))
    # Mean-pooled features sum to 1 per doc, so the intercept is
    # collinear with the full feature block and the MLE is a gauge
    # ridge (w + c, bias - c all equivalent — see the trainer
    # docstring). Fit the numpy reference on the IDENTIFIED design
    # (drop one used column; full rank with the intercept): on the
    # ridge itself Newton's `converged` flag depends on whether
    # LAPACK's singularity detection fires on a cond~1e17 hessian —
    # observed flipping with the BLAS environment (r13), while the
    # identifiable quantities below were always stable.
    beta, _cov, converged = logistic_mle(add_intercept(X[:, used[1:]]), y)
    assert converged
    # Compare the IDENTIFIABLE per-bucket logit contribution w[b]+bias:
    # with column used[0] dropped and sum(x)=1, its contribution is the
    # intercept alone (appended LAST by add_intercept), every other
    # bucket's is beta_b + intercept.
    ident = np.concatenate([[beta[-1]], beta[:-1] + beta[-1]])
    np.testing.assert_allclose(np.array(w)[used] + bias, ident, atol=1e-4)
    # unused hash slots carry exactly zero weight (no spurious signal)
    unused = [b for b in range(buckets) if b not in set(used.tolist())]
    assert all(w[b] == 0.0 for b in unused)


def test_trained_weights_roundtrip_through_scorer(spark):
    """(weights, bias) from the trainer drop straight into
    model_quality_score: the scored logit equals bias + mean(w[bucket])
    recomputed by hand for every doc."""
    from polars_mas_spark.operators.text import (
        model_quality_score,
        train_quality_classifier,
    )

    buckets, salt = 8, "qt"
    rows = _corpus(buckets=buckets)
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w, bias = train_quality_classifier(
        df, "text", "label", n_buckets=buckets, salt=salt
    )
    scored = {
        r["doc_id"]: r
        for r in model_quality_score(
            df, "doc_id", "text", weights=w, bias=bias,
            salt=salt, n_buckets=buckets,
        ).collect()
    }
    assert len(scored) == len(rows)
    for i, text, _y in rows:
        x = _featurize(text, buckets, salt)
        logit = bias + float(np.dot(w, x))
        assert abs(scored[i]["logit"] - round(logit, 6)) <= 1e-6, i
        assert scored[i]["kept"] == (1 / (1 + math.exp(-logit)) >= 0.5)
