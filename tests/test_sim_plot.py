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


def test_plot_recipe_options(tmp_path):
    """Reference recipe options (plot_sim.jl:362,484,745): per-signal
    selection, state/estimate panels, x̂-with-x overlay, x̂ bounds."""
    import mpc_tpu as mpc
    model = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    estim = mpc.KalmanFilter(model)
    res = mpc.sim(estim, 12, y_noise=[0.1], x_0=[2.0])
    # estimator run: ŷ overlay by default, x̂ panels on request
    fig = res.plot(str(tmp_path / "a.png"), plotxhat=True, plotxwithxhat=True,
                   plotx=True)
    assert len(fig.axes) == 1 + 1 + 1 + 2   # y + u + x + x̂(2)
    # per-signal selection: only output 0, no inputs
    fig2 = res.plot(str(tmp_path / "b.png"), ploty=[0], plotu=False)
    assert len(fig2.axes) == 1
    import pytest as _pt
    with _pt.raises(ValueError):
        res.plot(ploty=False, plotu=False)
    # MHE run with x̂ bounds drawn
    mhe = mpc.MovingHorizonEstimator(model, He=4)
    mhe.setconstraint(xhatmin=[-30, -30], xhatmax=[30, 30])
    res3 = mpc.sim(mhe, 8, y_noise=[0.1])
    fig3 = res3.plot(str(tmp_path / "c.png"), plotxhat=True)
    assert len(fig3.axes) == 1 + 1 + 2


def test_sim_progress_reporting():
    """Opt-in progress reporting (the reference's @progressif analogue,
    general.jl:301-310): callable form receives (k, N) per step; True
    prints a stderr ticker without touching the results."""
    import mpc_tpu as mpc
    m = mpc.LinModel(mpc.tf(2, [10, 1]), 3.0)
    hits = []
    r1 = mpc.sim(mpc.LinMPC(m, Hp=5), 8, [1.0],
                 progress=lambda k, n: hits.append((k, n)))
    assert hits == [(k, 8) for k in range(8)]
    r2 = mpc.sim(mpc.LinMPC(m, Hp=5), 8, [1.0], progress=True)
    assert np.allclose(r1.U_data, r2.U_data)
    # open-loop form too
    r3 = mpc.sim(m, 5, [1.0], progress=lambda k, n: hits.append((k, n)))
    assert len(hits) == 13
