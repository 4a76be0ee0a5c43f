"""Micro numeric-parity tests (SURVEY.md §5.2(3), FIXTURES.md §2):

The relational SGD must reproduce the reference's dense masked-matrix math
to 1e-9 on a tiny fixture with *injected* initial factors. The replica
below is an independent numpy implementation of the published update
equations (reference models/funk_svd.py:157-170, models/als.py:160-174),
including the quirks: bias regularizer scaled by the full axis length, the
FunkSVD item update using already-updated user factors against the stale
error, and ALS's two error recomputes per epoch."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from dask_recommender_system_spark.models import ALS, FunkSVD

# 8 users × 6 items, 23 observed cells (FIXTURES.md §2), k=2
RATINGS = [
    (0, 0, 5.0), (0, 1, 3.0), (0, 4, 1.0), (1, 0, 4.0), (1, 2, 2.0),
    (1, 5, 5.0), (2, 1, 1.0), (2, 3, 4.0), (3, 0, 2.0), (3, 2, 5.0),
    (3, 4, 3.0), (4, 1, 4.0), (4, 3, 2.0), (4, 5, 1.0), (5, 0, 3.0),
    (5, 2, 4.0), (5, 3, 5.0), (6, 1, 2.0), (6, 4, 4.0), (6, 5, 3.0),
    (7, 0, 1.0), (7, 3, 3.0), (7, 5, 4.0),
]
N_U, N_I, K = 8, 6, 2
LR, REG, EPOCHS = 0.01, 0.02, 3


def _inits():
    rng = np.random.RandomState(7)
    P0 = rng.uniform(0, 0.1, (N_U, K))
    Q0 = rng.uniform(0, 0.1, (N_I, K))
    return P0, Q0


def _numpy_error(X, M, mu, bu, bi, P, Q):
    pred = mu + bu + P @ Q.T + bi
    return X - pred * M


def _numpy_funk_svd(X, M, mu, P, Q):
    bu = np.zeros((N_U, 1))
    bi = np.zeros(N_I)
    P, Q = P.copy(), Q.copy()
    for _ in range(EPOCHS):
        err = _numpy_error(X, M, mu, bu, bi, P, Q)
        bu = bu + LR * np.sum(err - REG * bu, axis=1, keepdims=True)
        bi = bi + LR * np.sum(err - REG * bi, axis=0)
        P = P + LR * (err @ Q - REG * P)
        Q = Q + LR * ((P.T @ err).T - REG * Q)  # P already updated, err stale
    return bu, bi, P, Q


def _numpy_als(X, M, mu, P, Q):
    bu = np.zeros((N_U, 1))
    bi = np.zeros(N_I)
    P, Q = P.copy(), Q.copy()
    err = _numpy_error(X, M, mu, bu, bi, P, Q)
    for _ in range(EPOCHS):
        P = P + LR * (err @ Q - REG * P)
        bu = bu + LR * np.sum(err - REG * bu, axis=1, keepdims=True)
        err = _numpy_error(X, M, mu, bu, bi, P, Q)
        Q = Q + LR * ((P.T @ err).T - REG * Q)
        bi = bi + LR * np.sum(err - REG * bi, axis=0)
        err = _numpy_error(X, M, mu, bu, bi, P, Q)
    return bu, bi, P, Q


def _dense():
    X = np.zeros((N_U, N_I))
    M = np.zeros((N_U, N_I))
    for u, i, r in RATINGS:
        X[u, i] = r
        M[u, i] = 1.0
    return X, M


def _fit_spark(spark, model_cls, P0, Q0):
    rows = [(f"u{u}", f"i{i}", r) for u, i, r in RATINGS]
    df = spark.createDataFrame(rows, "user string, item string, rating double")
    u_init = spark.createDataFrame(
        [(int(u), 0.0, *map(float, P0[u])) for u in range(N_U)],
        f"u_idx long, bias double, {', '.join(f'f_{j} double' for j in range(K))}",
    )
    i_init = spark.createDataFrame(
        [(int(i), 0.0, *map(float, Q0[i])) for i in range(N_I)],
        f"i_idx long, bias double, {', '.join(f'f_{j} double' for j in range(K))}",
    )
    m = model_cls(n_factors=K, lr=LR, reg=REG, epochs=EPOCHS)
    m.fit(df, u_params_init=u_init, i_params_init=i_init, collect_errors=True)
    return m


def _collect_params(m):
    up = {r["u_idx"]: r for r in m.u_params.collect()}
    ip = {r["i_idx"]: r for r in m.i_params.collect()}
    bu = np.array([[up[u]["bias"]] for u in range(N_U)])
    bi = np.array([ip[i]["bias"] for i in range(N_I)])
    P = np.array([[up[u][f"f_{j}"] for j in range(K)] for u in range(N_U)])
    Q = np.array([[ip[i][f"f_{j}"] for j in range(K)] for i in range(N_I)])
    return bu, bi, P, Q


@pytest.mark.parametrize(
    "model_cls,replica", [(FunkSVD, _numpy_funk_svd), (ALS, _numpy_als)]
)
def test_gradient_parity(spark, model_cls, replica):
    X, M = _dense()
    mu = float(np.mean([r for _, _, r in RATINGS]))
    P0, Q0 = _inits()
    m = _fit_spark(spark, model_cls, P0, Q0)
    assert abs(m.stats.mean_rating - mu) < 1e-12
    bu_np, bi_np, P_np, Q_np = replica(X, M, mu, P0, Q0)
    bu, bi, P, Q = _collect_params(m)
    np.testing.assert_allclose(bu, bu_np, atol=1e-9)
    np.testing.assert_allclose(bi, bi_np, atol=1e-9)
    np.testing.assert_allclose(P, P_np, atol=1e-9)
    np.testing.assert_allclose(Q, Q_np, atol=1e-9)


def test_predict_known_and_cold_start(spark):
    P0, Q0 = _inits()
    m = _fit_spark(spark, FunkSVD, P0, Q0)
    X, M = _dense()
    mu = float(np.mean([r for _, _, r in RATINGS]))
    bu, bi, P, Q = _collect_params(m)
    test = spark.createDataFrame(
        [("u0", "i0"), ("u3", "i4"), ("uNEW", "i0"), ("u0", "iNEW")],
        "user string, item string",
    )
    got = {(r["user"], r["item"]): r["pred"] for r in m.predict(test).collect()}
    # known pairs: clipped score (reference models/als.py:211-212)
    for u, i in [(0, 0), (3, 4)]:
        raw = mu + bu[u, 0] + bi[i] + P[u] @ Q[i]
        exp = min(max(1.0, raw), 5.0)
        assert abs(got[(f"u{u}", f"i{i}")] - exp) < 1e-9
    # cold start: bare mu, unclipped (reference models/als.py:204-214)
    assert abs(got[("uNEW", "i0")] - mu) < 1e-12
    assert abs(got[("u0", "iNEW")] - mu) < 1e-12


def test_training_error_decreases(spark):
    P0, Q0 = _inits()
    m = _fit_spark(spark, ALS, P0, Q0)
    rmses = [t[2] for t in m.train_errors]
    assert len(rmses) == EPOCHS
    assert rmses == sorted(rmses, reverse=True), f"RMSE not decreasing: {rmses}"
