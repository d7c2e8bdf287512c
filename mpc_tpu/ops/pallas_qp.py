"""Pallas TPU kernel: fused batched ADMM for the condensed-MPC QP.

The XLA path (`ops/qp.py` under vmap) re-materializes the iterate vectors
between fused regions; this kernel keeps the ENTIRE ADMM iteration state in
VMEM for a tile of problems and runs all iterations without touching HBM.

Layout: the batch is the **lane** dimension (last axis, tiles of 128) so every
elementwise op vectorizes across problems on the VPU, and the tiny per-problem
contractions (n, m ≤ a few hundred) unroll over the sublane axis:

    A     : (m, n, LANE)    per-problem constraint matrices
    Minv  : (n, n, LANE)    pre-factorized KKT inverse (P + σI + AᵀρA)⁻¹
    q,l,u : (n|m, LANE)
    state : x (n, LANE), z/y (m, LANE)

Grid: one program per batch tile.  Fixed iteration count (static bound, the
TPU way — no data-dependent trip counts), ½-precision friendly.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _admm_kernel(Minv_ref, A_ref, q_ref, l_ref, u_ref, rho_ref, x0_ref,
                 x_out_ref, *, iters: int, sigma: float, alpha: float):
    Minv = Minv_ref[:]          # (n, n, LANE)
    A = A_ref[:]                # (m, n, LANE)
    q = q_ref[:]                # (n, LANE)
    l = l_ref[:]                # (m, LANE)
    u = u_ref[:]                # (m, LANE)
    rho = rho_ref[:]            # (m, LANE)
    x = x0_ref[:]               # (n, LANE)

    n = q.shape[0]
    m = l.shape[0]

    # Contractions over the tiny per-problem dims as STATICALLY UNROLLED
    # accumulation loops: no (m, n, LANE) temporary (VMEM budget), only
    # static slicing (Mosaic cannot lower dynamic_slice on values or a
    # batched dot whose batch is the lane axis).
    def Amul(v):                # (n, LANE) -> (m, LANE)
        acc = jnp.zeros_like(l)
        for j in range(n):
            acc = acc + A[:, j, :] * v[j, :]
        return acc

    def ATmul(t):               # (m, LANE) -> (n, LANE)
        # accumulate over m with static slices — Mosaic cannot reduce over a
        # dimension with layout offsets, so no jnp.sum(axis=0) here
        acc = jnp.zeros_like(q)
        for mi in range(m):
            acc = acc + A[mi, :, :] * t[mi, :]
        return acc

    z = jnp.clip(Amul(x), l, u)
    y = jnp.zeros_like(z)

    def body(_, carry):
        x, z, y = carry
        rhs = sigma * x - q + ATmul(rho * z - y)
        xt = jnp.zeros_like(q)
        for k in range(n):
            xt = xt + Minv[:, k, :] * rhs[k, :]
        zt = Amul(xt)
        xn = alpha * xt + (1.0 - alpha) * x
        zp = alpha * zt + (1.0 - alpha) * z
        zn = jnp.clip(zp + y / rho, l, u)
        yn = y + rho * (zp - zn)
        return xn, zn, yn

    x, z, y = jax.lax.fori_loop(0, iters, body, (x, z, y))
    x_out_ref[:] = x


@partial(jax.jit, static_argnames=("iters", "sigma", "alpha"))
def pallas_admm_batch(Minv, A, q, l, u, rho, x0, *, iters=200, sigma=1e-6,
                      alpha=1.6):
    """Solve a lane-major batch of QPs with the fused in-VMEM ADMM kernel.

    Shapes (B a multiple of 128): Minv (n,n,B), A (m,n,B), q/x0 (n,B),
    l/u/rho (m,B).  Returns x (n,B).
    """
    n = q.shape[0]
    m = l.shape[0]
    B = q.shape[-1]
    assert B % LANE == 0, "batch must be a multiple of 128 lanes"
    # VMEM budget: the A tile (m·n·128·4B, double-buffered) plus Minv and the
    # iterate vectors must fit in ~16MB. Condensed-MPC problems (n ≤ 32,
    # m ≤ 256) fit comfortably; larger problems need the XLA path (ops/qp.py).
    vmem_est = (2 * m * n + 2 * n * n + 10 * (m + n)) * LANE * 4
    if vmem_est > 12 * 1024 * 1024:
        raise ValueError(
            f"problem too large for the fused VMEM kernel (~{vmem_est/2**20:.1f}MB "
            "of VMEM needed); use the XLA ADMM path (ops/qp.py) instead")
    ntiles = B // LANE

    def spec(*dims):
        # block covers full leading dims, one LANE tile of the batch axis
        nd = len(dims)
        return pl.BlockSpec(dims + (LANE,),
                            lambda i, nd=nd: (0,) * nd + (i,),
                            memory_space=pltpu.VMEM)

    kernel = partial(_admm_kernel, iters=iters, sigma=sigma, alpha=alpha)
    return pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[spec(n, n), spec(m, n), spec(n), spec(m), spec(m), spec(m),
                  spec(n)],
        out_specs=spec(n),
        out_shape=jax.ShapeDtypeStruct((n, B), q.dtype),
    )(Minv, A, q, l, u, rho, x0)


def pack_lane_major(arrs):
    """Stack batch-leading arrays [(B, ...)] into lane-major (… , B)."""
    return [jnp.moveaxis(jnp.asarray(a), 0, -1) for a in arrs]
