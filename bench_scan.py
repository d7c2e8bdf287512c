#!/usr/bin/env python
"""Scan-mode (compiled closed-loop) QP-backend comparison.

Round-1 finding (PARITY.md): in scan mode — sequential control steps fused
into ONE device program — the ADMM backend ran 3.5k controlled-steps/s vs
33.9k for the warm-started Goldfarb–Idnani active set, because ADMM's
per-step iteration chain of tiny serial ops is latency-bound on TPU.
Round 2 removed the serial pieces from the ADMM iteration (ρ-ladder of
precomputed inverses → loop is matmuls only; top-k polish).  This script
measures the effect: CSTR LinMPC `CompiledClosedLoop.run_fleet(B, N)` per
backend on the current device.

Run:  python bench_scan.py          (real TPU if available)
      MPC_SCAN_B=128 MPC_SCAN_N=50 python bench_scan.py
"""
import json
import os
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from mpc_tpu.sim_compiled import CompiledClosedLoop

    import mpc_tpu as mpc

    platform = jax.default_backend()
    B = int(os.environ.get("MPC_SCAN_B", 512))
    N = int(os.environ.get("MPC_SCAN_N", 100))
    dtype = jnp.float32 if platform == "tpu" else None
    G = np.array([[mpc.tf(1.90, [18, 1]), mpc.tf(1.90, [18, 1])],
                  [mpc.tf(-0.74, [8, 1]), mpc.tf(0.74, [8, 1])]], dtype=object)
    out = {}
    for solver in ("active_set", "admm"):
        model = mpc.LinModel(G, 2.0)
        model.setop(uop=[20, 20], yop=[50, 30])
        ctrl = mpc.LinMPC(model, Hp=10, Hc=2, Mwt=[1, 1], Nwt=[0.1, 0.1],
                          qp_solver=solver, dtype=dtype)
        ctrl.setconstraint(umin=[5, 5], umax=[35, 35], dumin=[-4, -4],
                           dumax=[4, 4], ymin=[-60, -60], ymax=[60, 60])
        loop = CompiledClosedLoop(ctrl)
        t0 = time.time()
        fl = loop.run_fleet(B, N, ry=[54.0, 30.0], y_noise=[0.1, 0.1], seed=0)
        np.asarray(fl["U"])   # host transfer: block_until_ready lies on axon
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            fl = loop.run_fleet(B, N, ry=[54.0, 30.0], y_noise=[0.1, 0.1],
                                seed=0)
            np.asarray(fl["U"])   # hard sync
            times.append(time.time() - t0)
        dt_med = float(np.median(times))
        steps_s = B * N / dt_med
        conv = int(np.asarray(fl["conv"]).sum())
        out[solver] = round(steps_s, 1)
        print(f"# {solver}: compile={compile_s:.1f}s run={dt_med * 1000:.0f}ms "
              f"steps/s={steps_s:.0f} conv={conv}/{B * N} "
              f"y1_end={float(np.asarray(fl['Y'])[:, -1, 0].mean()):.2f}")
    print(json.dumps({
        "metric": f"scan-mode controlled-steps/s (B={B}, N={N}, {platform})",
        "active_set": out.get("active_set"),
        "admm": out.get("admm"),
        "admm_vs_round1_3500": (round(out["admm"] / 3500.0, 2)
                                if platform == "tpu" else None),
    }))


if __name__ == "__main__":
    main()
