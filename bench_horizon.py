#!/usr/bin/env python
"""Horizon scaling: condensed SingleShooting vs sparse MultipleShooting.

The reference's remedy for long prediction horizons is the sparse
MultipleShooting transcription (SURVEY §5 "horizon scaling"; the round-2
bench config lesson measured dense condensed Hp=25 QPs needing a median
~800-1100 ADMM iterations even in f64 — conditioning of the condensed
Hessian grows with the Â-power stack).  This bench measures the TPU-native
trade on the same 8×8 plants:

  SS: nZ = Hc·nu (+ε)      — tiny decision vector, dense ill-conditioned H
  MS: nZ = Hc·nu + Hp·nx̂   — bigger vector + defect equality rows, block-
                              banded well-conditioned H (cond ~ O(1) in Hp)

Per Hp × transcription it reports median step time, ADMM iteration stats
(max/mean over the batch), and convergence, in the same rotating-setpoint
receding-horizon regime as bench.py.  Run: python bench_horizon.py
(env: MPC_BENCH_BATCH=256 MPC_HORIZONS=10,15,25,40)
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from bench import _large_plant_controllers
    from mpc_tpu.controllers.transcription import MultipleShooting
    from mpc_tpu.parallel import BatchedLinMPC

    platform = jax.default_backend()
    B = int(os.environ.get("MPC_BENCH_BATCH", 256))
    horizons = [int(h) for h in
                os.environ.get("MPC_HORIZONS", "10,15,25,40").split(",")]
    nio = 8
    rows = []
    for Hp in horizons:
        for tr_name in ("SS", "MS"):
            tr = MultipleShooting() if tr_name == "MS" else None
            n_distinct = min(32, B)
            ctrls = _large_plant_controllers(n_distinct, Hp=Hp,
                                             transcription=tr)
            t0 = time.time()
            bat = BatchedLinMPC(ctrls, dtype=jnp.float32,
                                reps=B // n_distinct)
            construct_s = time.time() - t0
            rng = np.random.default_rng(1)
            ym0 = rng.normal(size=(B, nio)) * 0.5
            ry0 = rng.normal(size=(B, nio)) * 2.0
            seq = [(jnp.asarray(ym0 + rng.normal(size=(B, nio)) * 0.1,
                                jnp.float32),
                    jnp.asarray(ry0 + rng.normal(size=(B, nio)) * 0.2,
                                jnp.float32)) for _ in range(4)]
            t0 = time.time()
            u, nc = bat.step(*seq[0])
            np.asarray(u)   # host transfer: block_until_ready lies on axon
            compile_s = time.time() - t0
            times, iters_mx, iters_mn, convs = [], [], [], []
            for k in range(12):
                t0 = time.time()
                u, nc = bat.step(*seq[k % 4])
                np.asarray(u)   # hard sync
                times.append(time.time() - t0)
                mx, mn = np.asarray(bat.last_iters)
                iters_mx.append(int(mx))
                iters_mn.append(int(mn))
                convs.append(int(nc))
            med = float(np.median(times))
            row = dict(Hp=Hp, transcription=tr_name, B=B,
                       nZ=ctrls[0].nZt, n_rows=ctrls[0].A_stack.shape[0],
                       step_ms=round(med * 1e3, 2),
                       solves_per_s=round(B / med, 1),
                       iters_max=max(iters_mx),
                       iters_mean=round(float(np.mean(iters_mn)), 1),
                       converged=f"{min(convs)}/{B}",
                       construct_s=round(construct_s, 1),
                       compile_s=round(compile_s, 1), platform=platform)
            rows.append(row)
            print(json.dumps(row), file=sys.stderr, flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
