"""Mixing-tank level/temperature control with measured-disturbance
feedforward (mirrors the reference manual docs/src/manual/linmpc.md).

A hot/cold water mixing process: u = [cold, hot] valve positions, the load
disturbance ul (extra cold flow) is *measurable*, so appending it as a
measured disturbance d gives the controller feedforward compensation.
"""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import mpc_tpu as mpc

Ts = 2.0
G = mpc.tf_matrix([
    [mpc.tf(1.90, [18, 1]), mpc.tf(1.90, [18, 1])],
    [mpc.tf(-0.74, [8, 1]), mpc.tf(0.74, [8, 1])],
])
# append the load column (same dynamics as the hot-water input on y1,
# manual: [G G[1:2, 2]] with i_d=[3])
Gd = mpc.tf_matrix([
    [mpc.tf(1.90, [18, 1]), mpc.tf(1.90, [18, 1]), mpc.tf(1.90, [18, 1])],
    [mpc.tf(-0.74, [8, 1]), mpc.tf(0.74, [8, 1]), mpc.tf(0.74, [8, 1])],
])


def run(feedforward=True, N=200, seed=0):
    if feedforward:
        model = mpc.LinModel(Gd, Ts, i_d=[2])
        model.setop(uop=[20, 20], yop=[50, 30], dop=[20])
        ctrl = mpc.LinMPC(model, Hp=10, Hc=2, Mwt=[1, 1], Nwt=[0.1, 0.1])
    else:
        model = mpc.LinModel(G, Ts)
        model.setop(uop=[20, 20], yop=[50, 30])
        ctrl = mpc.LinMPC(model, Hp=10, Hc=2, Mwt=[1, 1], Nwt=[0.1, 0.1])
    ctrl.setconstraint(ymin=[48, -np.inf])
    # the true plant always sees the load on its hot-water channel
    plant = mpc.LinModel(Gd, Ts, i_d=[2])
    plant.setop(uop=[20, 20], yop=[50, 30], dop=[20])
    ry, ul = np.array([50.0, 30.0]), 0.0
    u_data = np.zeros((N, 2))
    y_data = np.zeros((N, 2))
    ry_data = np.zeros((N, 2))
    for i in range(N):
        if i == 50:
            ry = np.array([50.0, 35.0])
        if i == 100:
            ry = np.array([54.0, 30.0])
        if i == 150:
            ul = -20.0
        d = np.array([ul + 20.0])
        y = plant.evaloutput(d)
        if feedforward:
            ctrl.preparestate(y, d)
            u = ctrl.moveinput(ry, d)
            ctrl.updatestate(u, y, d)
        else:
            ctrl.preparestate(y)
            u = ctrl.moveinput(ry)
            ctrl.updatestate(u, y)
        u_data[i], y_data[i], ry_data[i] = u, y, ry
        plant.updatestate(u, d)
    return u_data, y_data, ry_data


if __name__ == "__main__":
    u_ff, y_ff, ry = run(feedforward=True)
    u_fb, y_fb, _ = run(feedforward=False)
    e_ff = np.abs(y_ff[150:] - ry[150:]).max()
    e_fb = np.abs(y_fb[150:] - ry[150:]).max()
    print(f"max |y - ry| after load disturbance: feedforward={e_ff:.3f}  "
          f"feedback-only={e_fb:.3f}")
    res = mpc.SimResult(np.arange(200) * Ts, y_ff, u_ff, Ry_data=ry)
    res.plot(file="cstr_feedforward.png")
    print("plot saved to cstr_feedforward.png")
