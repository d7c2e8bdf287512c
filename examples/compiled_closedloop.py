#!/usr/bin/env python
"""Compiled closed loops: the whole N-step simulation as ONE device call.

Two levels beyond the reference's host-driven `sim!`:
  * CompiledClosedLoop — plant, estimator, and condensed-QP controller fused
    into a single lax.scan (CSTR case: ~13x the host loop per step);
  * run_fleet — B independent noisy closed loops vmapped over that scan
    (Monte-Carlo controller validation in one XLA call).
"""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import mpc_tpu as mpc  # noqa: E402

# CSTR-like 2x2 plant (manual_linmpc.md case study)
G = mpc.tf_matrix([[mpc.tf(1.90, [18, 1]), mpc.tf(1.90, [18, 1])],
                   [mpc.tf(-0.74, [8, 1]), mpc.tf(0.74, [8, 1])]])
ctrl = mpc.LinMPC(mpc.LinModel(G, 2.0), Hp=10, Hc=2, Mwt=[1, 1],
                  Nwt=[0.1, 0.1], qp_solver="active_set")
ctrl.setconstraint(umin=[-20, -20], umax=[20, 20])

loop = mpc.CompiledClosedLoop(ctrl)
res = loop.run(50, ry=[5.0, 1.0])
print(f"single compiled loop: y[-1] = {res.y_data[-1]}")

t0 = time.time()
res = loop.run(50, ry=[5.0, 1.0])
print(f"  amortized {(time.time() - t0) / 50 * 1e6:.0f} us/step")

# Monte-Carlo fleet: 64 noisy loops, one device call
fleet = loop.run_fleet(64, 50, ry=[5.0, 1.0], y_noise=[0.1, 0.2],
                       u_noise=[0.05, 0.05], seed=0)
yN = fleet["Y"][:, -1, 0]
print(f"fleet of 64 noisy loops: all converged = {bool(fleet['conv'].all())}, "
      f"y1(N) = {yN.mean():.3f} +/- {yN.std():.3f}")
