#!/usr/bin/env python
"""Headline benchmark: batched LinMPC solves/s per chip.

BASELINE.json config 3: 4096 randomized LinModel scenarios solved in lockstep
(vmapped condensed QP + steady Kalman feedback), target ≥ 10,000 solves/s per
v5e chip.  Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    # x64 enables the mixed-precision polish (f64 residual accumulation in
    # ops/qp.py); all hot arrays stay float32
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    platform = jax.default_backend()
    # f32 on TPU (native speed); the parity story is f64 on CPU in tests
    from mpc_tpu.parallel import BatchedLinMPC, random_cstr_controllers

    B_total = int(os.environ.get("MPC_BENCH_BATCH", 4096))
    n_distinct = min(256, B_total)
    reps_tile = B_total // n_distinct

    t0 = time.time()
    ctrls = random_cstr_controllers(n_distinct, Hp=10, Hc=2, seed=0)
    # tile distinct scenarios to the full batch host-side, single upload
    bat = BatchedLinMPC(ctrls, dtype=jnp.float32, reps=reps_tile)
    construct_s = time.time() - t0

    rng = np.random.default_rng(1)
    ym = jnp.asarray(rng.normal(size=(B_total, 2)) * 0.5, jnp.float32)
    ry = jnp.asarray(rng.normal(size=(B_total, 2)) * 2.0, jnp.float32)

    # --- warm-up / compile ---
    t0 = time.time()
    u, n_conv = bat.step(ym, ry)
    jax.block_until_ready(u)
    compile_s = time.time() - t0

    # --- timed steady-state loop (per-step times for the p99 latency) ---
    n_iters = int(os.environ.get("MPC_BENCH_ITERS", 20))
    step_times = []
    t0 = time.time()
    for _ in range(n_iters):
        ts = time.time()
        u, n_conv = bat.step(ym, ry)
        jax.block_until_ready(u)
        step_times.append(time.time() - ts)
    elapsed = time.time() - t0
    solves_per_s = B_total * n_iters / elapsed
    p99 = float(np.percentile(step_times, 99))

    target = 10000.0
    print(json.dumps({
        "metric": f"batched LinMPC solves/s/chip (B={B_total}, Hp=10, Hc=2, "
                  f"soft y+hard u/du bounds, {platform})",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / target, 3),
    }))
    print(f"# construct={construct_s:.1f}s compile={compile_s:.1f}s "
          f"step={elapsed / n_iters * 1000:.1f}ms p99={p99 * 1000:.1f}ms "
          f"(soft real-time budget Ts=2000ms) "
          f"converged={int(n_conv)}/{B_total}", file=sys.stderr)


if __name__ == "__main__":
    main()
