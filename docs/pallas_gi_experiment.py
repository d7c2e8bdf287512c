#!/usr/bin/env python
"""Pallas GI-scan experiment at the production large-config shape (round 4).

VERDICT r03 item 5 asked for a fused-GI-pivot Pallas experiment at the
8×8/Hp=15 shape.  Profiling first (jax.profiler trace of the large-config
fleet step, B=4096, n=33, m=577, gi_max_active=12):

  - device step            ≈ 33 ms   (jit_stepfn / 3 executions)
  - GI while-loops         ≈ 23 ms   (while.649 + while.532)
  - biggest single op      ≈ 1.5 ms/iteration — the violation scan A@x
    (multiply_reduce_fusion over the (B, 577, 33) f32 table, ~203 GB/s)
  - remainder/iteration    ≈ 3–6 ms — ~100 small slot-space ops
    (f64 (B,12,12) tables, bandwidth-trivial → dispatch-bound)

This script times the Pallas lane-major scan kernel (the pallas_qp.py
layout: batch on lanes, per-problem dims unrolled) against the XLA scan.

Results (v5e via axon, 2026-08-21; scalar-reduced in-graph so the tunnel
transfer of the (B, m) result does not pollute the timing — an earlier
pass that pulled the full result measured the transfer, not the scan):

  XLA einsum scan, (B,m,n) batch-major:      1.35 ms  → 231 GB/s
  XLA scan, (B,n,m) transposed:              ≈ same (layout-insensitive)
  Pallas lane-major (MT=128, LANE=128):      3.22 ms  → 107 GB/s  ← best
  Pallas (MT=256, LB=128):                   ~2.5× slower than best
  Pallas (MT=64/32/128, LB=256/512):         3–6× slower than best
  (MT=640 / LB≥256 configs exceed VMEM and fail to compile)

NEGATIVE RESULT: the best feasible Pallas block shape is 2.4× slower
than XLA's fused multiply-reduce — the 3D lane-major batched-matrix
layout forces strided DMA (each (MT, 33, LANE) block gathers MT·33
stripes of LANE floats, 512 B per stripe).  Fusing the REST of the GI
body (the dispatch-bound slot ops) would need f64 in the kernel, which
Mosaic does not support — double-single emulation would multiply the op
count ~5–8×, eating the fusion gain.  Ceiling even with a FREE scan:
step 33 → ~28 ms (≈1.2×), far under the 2× bar.  The XLA lockstep loop
stays the production path; the round-4 wins came from shrinking the
slot-space traffic (gi_max_active) instead.

RUNTIME FINDING (new): Mosaic/Pallas compilation FAILS outright under
``jax_enable_x64`` on this runtime (HTTP 500 from the remote compile
helper; i64 grid indices reach the Mosaic module).  Workaround: build and
jit the pallas_call inside ``with jax.enable_x64(False):``.  This also
retroactively explains why pallas experiments must be run x64-free while
bench.py enables x64 globally.
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, m, n, LANE, MT = 4096, 577, 33, 128, 128
    m_pad = ((m + MT - 1) // MT) * MT
    rng = np.random.default_rng(0)
    A_bm = jnp.asarray(rng.normal(size=(B, m, n)), jnp.float32)
    x_b = jnp.asarray(rng.normal(size=(B, n)), jnp.float32)
    A_lm = jnp.asarray(np.moveaxis(
        np.pad(np.asarray(A_bm), ((0, 0), (0, m_pad - m), (0, 0))), 0, -1)
        .copy())                                   # (m_pad, n, B)
    x_lm = jnp.asarray(np.asarray(x_b).T.copy())   # (n, B)

    def timeit(f, *a, nrep=30):
        r = f(*a)
        np.asarray(r)
        t0 = time.time()
        for _ in range(nrep):
            r = f(*a)
        np.asarray(r)                              # host transfer barrier
        return (time.time() - t0) / nrep * 1e3

    # reduce outputs to scalars IN-GRAPH: transferring the (B, m) result to
    # host (~10 MB over the tunnel) would dominate the timing otherwise
    f_xla = jax.jit(
        lambda A_, x_: jnp.sum(jnp.einsum("bmn,bn->bm", A_, x_)))
    ms = timeit(f_xla, A_bm, x_b)
    print(f"XLA scan: {ms:.2f} ms -> {B * m * n * 4 / ms * 1e3 / 1e9:.0f} GB/s")

    def kmv(a_ref, x_ref, o_ref):
        a = a_ref[:]
        xv = x_ref[:]
        acc = jnp.zeros((a.shape[0], a.shape[2]), jnp.float32)
        for j in range(n):                         # static unroll (Mosaic)
            acc = acc + a[:, j, :] * xv[j, :]
        o_ref[:] = acc

    # NOTE: must trace x64-free — Mosaic compile 500s under jax_enable_x64
    with jax.enable_x64(False):
        def scan_pl(A_, x_):
            return pl.pallas_call(
                kmv, grid=(m_pad // MT, B // LANE),
                in_specs=[pl.BlockSpec((MT, n, LANE), lambda i, b: (i, 0, b),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((n, LANE), lambda i, b: (0, b),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((MT, LANE), lambda i, b: (i, b),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((m_pad, B),
                                               jnp.float32))(A_, x_)

        r = jax.jit(scan_pl)(A_lm, x_lm)
        ref = np.einsum("mnb,nb->mb", np.asarray(A_lm), np.asarray(x_lm))
        print("pallas max err:", np.abs(np.asarray(r) - ref).max())
        f_pl = jax.jit(lambda A_, x_: jnp.sum(scan_pl(A_, x_)))
        ms = timeit(f_pl, A_lm, x_lm)
    print(f"Pallas lane-major scan: {ms:.2f} ms -> "
          f"{m_pad * n * B * 4 / ms * 1e3 / 1e9:.0f} GB/s")


if __name__ == "__main__":
    main()

# ---------------------------------------------------------------------------
# ROUND-5 SUPERSEDING MEASUREMENT (docs/gi_decomp_r5.py, v5e via axon,
# 2026-08-21, pure-f32 slot space — the production large-lane layout since
# round 4's end; the round-4 "fusion needs in-kernel f64 / double-single"
# blocker NO LONGER APPLIES):
#
#   full GI solve  (B=4096, n=33, m=897, cap=12, ~4 active rows,
#                   4096/4096 converged, pivots mean 5 / max 14): 11.66 ms
#   violation scans alone ×14 (the XLA-optimal part):              3.70 ms
#   → slot-space bookkeeping + loop overhead = 68% of the solve
#   → fused-pivot-kernel CEILING: 3.16× on the GI solve if the ~100
#     small per-iteration slot ops became one launch
#
# The fusion candidate is now a pure-f32 port of the ~100-op pivot body
# (ops/qp_active.py `body`) into ONE pallas_call per while iteration,
# keeping the violation scan + row gather in XLA.  Remaining blockers are
# engineering, not precision: Mosaic requires statically unrolled tiny
# contractions (the body's Pinv matvecs at n=33 unroll to ~2k vector FMAs
# per iteration — compile-time risk) and the round-4 finding that 3D
# lane-major slot tables DMA in 512 B stripes.  Recorded as the TOP
# device-side lever for the large lane (its device step is ~70% GI solve),
# with the ceiling quantified above; not built this round.
