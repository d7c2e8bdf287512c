"""Fused Pallas ADMM kernel tests (interpreter mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from functools import partial

from mpc_tpu.ops.pallas_qp import _admm_kernel, pallas_admm_batch


def _random_batch(rng, n, m, B):
    H = rng.normal(size=(B, n, n)).astype(np.float32)
    P = H @ H.transpose(0, 2, 1) + n * np.eye(n, dtype=np.float32)
    q = rng.normal(size=(B, n)).astype(np.float32)
    A = rng.normal(size=(B, m, n)).astype(np.float32)
    xf = (rng.normal(size=(B, n)) * 0.1).astype(np.float32)
    Ax = np.einsum("bmn,bn->bm", A, xf)
    l = (Ax - 0.2).astype(np.float32)
    u = (Ax + 0.6).astype(np.float32)
    rho = np.full((B, m), 0.1, np.float32)
    Minv = np.linalg.inv(
        P + 1e-6 * np.eye(n, dtype=np.float32)
        + np.einsum("bmn,bm,bmk->bnk", A, rho, A)).astype(np.float32)
    return P, q, A, l, u, rho, Minv


def test_pallas_admm_matches_scipy():
    rng = np.random.default_rng(0)
    n, m, B = 4, 8, 128
    P, q, A, l, u, rho, Minv = _random_batch(rng, n, m, B)
    lm = lambda a: jnp.moveaxis(jnp.asarray(a), 0, -1)
    kernel = partial(_admm_kernel, iters=600, sigma=1e-6, alpha=1.6)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, B), jnp.float32),
        interpret=True,
    )(lm(Minv), lm(A), lm(q), lm(l), lm(u), lm(rho),
      lm(np.zeros((B, n), np.float32)))
    x_pal = np.moveaxis(np.asarray(out), -1, 0)
    from scipy.optimize import LinearConstraint, minimize
    for i in range(4):
        r = minimize(lambda x: 0.5 * x @ P[i] @ x + q[i] @ x, np.zeros(n),
                     jac=lambda x: P[i] @ x + q[i],
                     constraints=[LinearConstraint(A[i], l[i], u[i])],
                     method="SLSQP")
        assert np.max(np.abs(x_pal[i] - r.x)) < 5e-3, i


def test_pallas_size_guard():
    rng = np.random.default_rng(1)
    n, m, B = 64, 512, 128  # exceeds the VMEM budget
    _, q, A, l, u, rho, Minv = _random_batch(rng, n, m, B)
    lm = lambda a: jnp.moveaxis(jnp.asarray(a), 0, -1)
    with pytest.raises(ValueError):
        pallas_admm_batch(lm(Minv), lm(A), lm(q), lm(l), lm(u), lm(rho),
                          lm(np.zeros((B, n), np.float32)))
