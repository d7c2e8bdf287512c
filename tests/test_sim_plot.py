"""Simulation harness & plotting smoke tests (mirrors test/4_test_plot_sim.jl)."""
import os

import numpy as np
import pytest

import mpc_tpu as mpc


def test_sim_model_open_loop(tmp_path):
    model = mpc.LinModel(mpc.tf(2, [10, 1]), 1.0)
    res = mpc.sim(model, 30, u=[1.0])
    assert res.Y_data.shape == (30, 1)
    assert res.U_data.shape == (30, 1)
    f = tmp_path / "model.png"
    res.plot(str(f))
    assert f.exists() and f.stat().st_size > 0


def test_sim_estimator_closed_loop():
    model = mpc.LinModel(mpc.tf(2, [10, 1]), 1.0)
    est = mpc.SteadyKalmanFilter(model)
    res = mpc.sim(est, 25, [0.0], y_step=[0.3])
    assert res.Y_est_data is not None
    # estimator converges to the disturbed output
    assert np.allclose(res.Y_est_data[-1], res.Y_data[-1], atol=5e-2)


def test_sim_controller_with_noise(tmp_path):
    model = mpc.LinModel(mpc.tf(2, [10, 1]), 1.0)
    ctrl = mpc.LinMPC(model, Hp=10, Hc=2)
    res = mpc.sim(ctrl, 30, [1.0], y_noise=[0.01], u_noise=[0.01], seed=3)
    assert abs(res.Y_data[-1, 0] - 1.0) < 0.2
    f = tmp_path / "ctrl.png"
    res.plot(str(f), ymax=[1.5], ymin=[-0.5])
    assert f.exists()


def test_sim_with_x0_and_xhat0():
    model = mpc.LinModel(mpc.tf(2, [10, 1]), 1.0)
    ctrl = mpc.LinMPC(model, Hp=10, Hc=2)
    res = mpc.sim(ctrl, 15, [0.5], x_0=[1.0], x_hat_0=[1.0, 0.0])
    assert np.isfinite(res.Y_data).all()


def test_sim_measured_disturbance_plant():
    G = np.array([[mpc.tf(3, [30, 1]), mpc.tf(-2, [5, 1])]], dtype=object)
    model = mpc.LinModel(G, 1.0, i_d=[1])
    ctrl = mpc.LinMPC(model, Hp=15, Hc=2)
    res = mpc.sim(ctrl, 40, [1.0], d=[0.2], d_step=[0.1])
    assert abs(res.Y_data[-1, 0] - 1.0) < 1e-2
    assert res.D_data.shape[1] == 1
