#!/usr/bin/env python
"""Minimal repro: cross-program slowdown after long lockstep while_loops.

Symptom (found in round 3, CLAUDE.md): after a long-running lockstep
program (a vmapped while_loop with a few hundred iterations at B=4096)
executes on the tunneled-axon TPU runtime, every SUBSEQUENT program in the
same process runs orders of magnitude slower and never recovers — with
zero live device buffers from the first program.  bench.py works around it
with per-config subprocess isolation; this script is the isolated repro.

Protocol (all timings hard-synced by host transfer — block_until_ready is
not a barrier on this runtime):
  1. time a small fixed probe program (chained 512² matmuls)   → probe_0
  2. run the "heavy" program: B=4096 vmapped 300-iteration while_loop
     (ADMM-shaped: matvec + elementwise per iteration), N times
  3. delete every reference to the heavy program's buffers/executables
  4. re-time the SAME probe executable                          → probe_1
  5. re-compile the probe under a different shape and time      → probe_2

Interpretation: probe_1/probe_0 ≫ 1 with no live buffers reproduces the
bug; probe_2 distinguishes "executable-scoped" from "process-scoped"
degradation.  Run with REPRO_HEAVY=0 for the control (no heavy phase).

Result on the round-4 driver chip (2026-08-21, see
docs/cross_program_slowdown.md): NOT reproduced at these shapes — probe
ratios ≈ 1.0 with and without the heavy phase.  Kept as the harness for
future sightings; the round-3 measurement remains in bench.py's
subprocess-isolation rationale.
"""
import gc
import os
import sys
import time

import numpy as np


def probe(f, x, n=20):
    out = f(x)
    np.asarray(out)                       # compile + drain
    t0 = time.time()
    for _ in range(n):
        out = f(out)
    np.asarray(out)                       # host transfer = true barrier
    return (time.time() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    a = jnp.ones((512, 512), jnp.float32)
    f_probe = jax.jit(lambda x: (x @ x) * (1.0 / 512.0))
    p0 = probe(f_probe, a)
    print(f"probe_0: {p0:.3f} ms", file=sys.stderr)

    heavy_on = os.environ.get("REPRO_HEAVY", "1") == "1"
    if heavy_on:
        B, n, m, iters = 4096, 35, 80, 300

        def one(q, A):
            def body(st):
                x, k = st
                r = A.T @ (A @ x) + q          # ADMM-shaped matvec sweep
                x = x - 0.001 * r
                return x, k + 1

            x, _ = jax.lax.while_loop(lambda st: st[1] < iters, body,
                                      (jnp.zeros_like(q), 0))
            return x

        heavy = jax.jit(jax.vmap(one, in_axes=(0, None)))
        q = jnp.asarray(np.random.default_rng(0).normal(size=(B, n)),
                        jnp.float32)
        A = jnp.asarray(np.random.default_rng(1).normal(size=(m, n)),
                        jnp.float32)
        t0 = time.time()
        out = heavy(q, A)
        np.asarray(out)
        print(f"heavy compile+run: {time.time() - t0:.2f} s", file=sys.stderr)
        t0 = time.time()
        for _ in range(5):
            out = heavy(q, A)
        np.asarray(out)
        print(f"heavy steady: {(time.time() - t0) / 5 * 1e3:.1f} ms/step",
              file=sys.stderr)
        del heavy, q, A, out
        gc.collect()

    p1 = probe(f_probe, a)
    b = jnp.ones((640, 640), jnp.float32)       # fresh executable, new shape
    f_probe2 = jax.jit(lambda x: (x @ x) * (1.0 / 640.0))
    p2 = probe(f_probe2, b)
    import json
    print(json.dumps({
        "heavy_phase": heavy_on,
        "probe0_ms": round(p0, 3),
        "probe1_same_exec_ms": round(p1, 3),
        "probe2_fresh_exec_ms": round(p2, 3),
        "ratio_same_exec": round(p1 / p0, 2),
        "ratio_fresh_exec": round(p2 / p0, 2),
    }))


if __name__ == "__main__":
    main()
