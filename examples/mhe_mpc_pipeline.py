#!/usr/bin/env python
"""MHE -> LinMPC pipeline, host-composed and fully compiled.

The reference's ManualEstimator pattern (manual.jl docstring): a constrained
moving-horizon estimator supplies the state to a linear MPC through
setstate.  Here both forms run — the host composition, then the same
pipeline fused into ONE lax.scan device program (CompiledMHEMPCLoop) — and
their traces match to machine precision.
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


def make_model():
    return mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)


N, ry = 30, np.array([4.0])
rng = np.random.default_rng(1)
eps_y = 0.1 * rng.normal(size=(N, 1))

# --- host composition: MHE feeding a ManualEstimator LinMPC ---
mhe = mpc.MovingHorizonEstimator(make_model(), He=6)
mhe.setconstraint(xhatmin=[-20, -20], xhatmax=[20, 20])
ctrl = mpc.LinMPC(mpc.ManualEstimator(make_model()), Hp=10, Hc=2)
plant = make_model()
mhe.initstate(np.zeros(1), np.zeros(1))
U = np.zeros((N, 1))
t0 = time.time()
for k in range(N):
    y = plant.evaloutput() + eps_y[k]
    x_hat = mhe.preparestate(y)      # constrained estimate
    ctrl.setstate(x_hat)             # feed it to the MPC
    ctrl.preparestate(y)
    u = ctrl.moveinput(ry)
    U[k] = u
    plant.updatestate(u)
    mhe.updatestate(u, y)
print(f"host pipeline: {1e3 * (time.time() - t0) / N:.1f} ms/step, "
      f"y(N) ~ {plant.evaloutput()[0]:.3f}")

# --- same pipeline as ONE device call ---
mhe2 = mpc.MovingHorizonEstimator(make_model(), He=6)
mhe2.setconstraint(xhatmin=[-20, -20], xhatmax=[20, 20])
ctrl2 = mpc.LinMPC(mpc.ManualEstimator(make_model()), Hp=10, Hc=2)
mhe2.initstate(np.zeros(1), np.zeros(1))
loop = mpc.CompiledMHEMPCLoop(mhe2, ctrl2)
res = loop.run(N, ry=ry, y_noise=[0.1], seed=1)
t0 = time.time()
res = loop.run(N, ry=ry, y_noise=[0.1], seed=1)
print(f"compiled pipeline: {1e3 * (time.time() - t0) / N:.2f} ms/step, "
      f"max |u_host - u_compiled| = {np.abs(U - res.u_data).max():.2e}")
