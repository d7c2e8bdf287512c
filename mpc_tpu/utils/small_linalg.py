"""Unrolled small-matrix kernels (jnp, batched-friendly, no custom calls).

TPU rationale (measured, see PARITY.md round 4): ``jnp.linalg``'s
cholesky/LU/solve lower to SERIAL custom calls — a batched fleet pays one
per lane per call (11.0 ms of an 11.7 ms KF fleet step at B=16384 for a
2×2 solve).  For the small, STATICALLY-sized SPD matrices of control math
(innovation covariances, sigma-point draws, SQP subproblem Hessians) an
unrolled elimination is a handful of fused elementwise ops instead.

Everything here is also free of ``dot_general`` — safe to run in emulated
f64 on TPU, where elementwise f64 is cheap but f64 dots are pathological
(CLAUDE.md).
"""
from __future__ import annotations

import jax.numpy as jnp


def inv_spd_small(M):
    """Inverse of a small SPD matrix by UNROLLED Gauss-Jordan (no pivoting
    — stable for SPD), batched-friendly via ``...`` indexing.  Falls back
    to ``jnp.linalg.inv`` above n = 8 (the unrolled graph grows ~8n ops)."""
    n = M.shape[-1]
    if n > 8:
        return jnp.linalg.inv(M)
    A = M
    Inv = jnp.broadcast_to(jnp.eye(n, dtype=M.dtype), M.shape)
    for k in range(n):
        piv = A[..., k, k][..., None, None]
        rA = A[..., k, :][..., None, :] / piv
        rI = Inv[..., k, :][..., None, :] / piv
        f = A[..., :, k][..., :, None]
        mask = (jnp.arange(n) == k)[:, None]
        f = jnp.where(mask, jnp.zeros_like(f), f)
        A = jnp.where(mask, rA, A - f * rA)
        Inv = jnp.where(mask, rI, Inv - f * rI)
    return Inv


def chol_small(P):
    """Cholesky of a small SPD matrix by UNROLLED Cholesky–Banachiewicz
    (batched-friendly; static n ≤ 8); ``jnp.linalg.cholesky`` beyond."""
    n = P.shape[-1]
    if n > 8:
        return jnp.linalg.cholesky(P)
    rows = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            sacc = P[..., i, j]
            for k in range(j):
                sacc = sacc - rows[i][k] * rows[j][k]
            if i == j:
                rows[i][j] = jnp.sqrt(sacc)
            else:
                rows[i][j] = sacc / rows[j][j]
    zero = jnp.zeros_like(P[..., 0, 0])
    return jnp.stack([jnp.stack([rows[i][j] if j <= i else zero
                                 for j in range(n)], axis=-1)
                      for i in range(n)], axis=-2)
