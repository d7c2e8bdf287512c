#!/usr/bin/env python
"""Pendulum swing-up with NonLinMPC and successive-linearization adaptive MPC
(the reference manual's nonlinear case study, docs/src/manual/nonlinmpc.md)."""
import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import mpc_tpu as mpc  # noqa: E402


def f(x, u, d, par):
    g, L, K, m = par
    return jnp.array([x[1], -g / L * jnp.sin(x[0]) - K / m * x[1]
                      + u[0] / (m * L ** 2)])


h = lambda x, d, par: jnp.array([x[0] * 180 / jnp.pi])
par = (9.8, 0.4, 1.2, 0.3)


def make_pendulum():
    return mpc.NonLinModel(f, h, 0.1, 1, 2, 1, p=par,
                           solver=mpc.RungeKutta(4))


# --- full nonlinear MPC (in-graph SQP) ---
pend = make_pendulum()
estim = mpc.UnscentedKalmanFilter(pend, sigmaQ=[0.1, 1.0], sigmaR=[5.0],
                                  nint_ym=[1], sigmaQint_ym=[0.1])
nmpc = mpc.NonLinMPC(estim, Hp=20, Hc=2, Mwt=[0.5], Nwt=[2.5], Cwt=np.inf)
nmpc.setconstraint(umin=[-1.5], umax=[1.5])
t0 = time.time()
res = mpc.sim(nmpc, 60, [180.0])
t_nmpc = time.time() - t0
res.plot("pendulum_nmpc.png")
print(f"NonLinMPC:  θ final = {res.Y_data[-1, 0]:.2f}°, "
      f"|u|max = {np.abs(res.U_data).max():.3f}, {t_nmpc:.1f}s")

# --- successive linearization (the 210×-speedup pattern) ---
pend2 = make_pendulum()
linmodel = mpc.linearize(pend2, x=[0.0, 0.0], u=[0.0])
kf = mpc.KalmanFilter(linmodel, sigmaQ=[0.1, 1.0], sigmaR=[5.0],
                      nint_ym=[1], sigmaQint_ym=[0.1])
slmpc = mpc.LinMPC(kf, Hp=20, Hc=2, Mwt=[0.5], Nwt=[2.5], Cwt=np.inf)
slmpc.setconstraint(umin=[-1.5], umax=[1.5])
pend2.setstate([0.0, 0.0])
u = np.zeros(1)
t0 = time.time()
ys = []
for k in range(60):
    y = pend2.evaloutput()
    x_hat = slmpc.preparestate(y)
    mpc.linearize_(linmodel, pend2, x_hat[:2], u, np.zeros(0))
    slmpc.setmodel(linmodel)
    u = slmpc.moveinput([180.0])
    ys.append(y[0])
    pend2.updatestate(u)
    slmpc.updatestate(u, y)
t_sl = time.time() - t0
print(f"SL-MPC:     θ final = {ys[-1]:.2f}°, {t_sl:.1f}s "
      f"({t_nmpc / t_sl:.1f}× faster than NonLinMPC here)")
