"""CompiledClosedLoop: one-lax.scan closed loop ≡ host-loop sim()."""
import numpy as np
import pytest

import mpc_tpu as mpc
from mpc_tpu.sim_compiled import CompiledClosedLoop


def _cstr_G():
    return mpc.tf_matrix([[mpc.tf(1.90, [18, 1]), mpc.tf(1.90, [18, 1])],
                          [mpc.tf(-0.74, [8, 1]), mpc.tf(0.74, [8, 1])]])


def _mk(**kw):
    c = mpc.LinMPC(mpc.LinModel(_cstr_G(), 2.0), Hp=10, Hc=2,
                   Mwt=[1, 1], Nwt=[0.1, 0.1], **kw)
    c.setconstraint(umin=[-20, -20], umax=[20, 20])
    return c


def test_compiled_loop_matches_host_sim():
    res_h = mpc.sim(_mk(), 30, [5, 1])
    res_c = CompiledClosedLoop(_mk()).run(30, ry=[5, 1])
    assert np.allclose(res_h.u_data, res_c.u_data, atol=1e-9)
    assert np.allclose(res_h.y_data, res_c.y_data, atol=1e-9)
    assert np.allclose(res_h.X_est_data, res_c.X_est_data, atol=1e-9)


def test_compiled_loop_matches_host_sim_with_noise():
    """Identical RNG draw order ⇒ identical noisy traces."""
    kw = dict(y_noise=[0.1, 0.2], u_noise=[0.05, 0.05], u_step=[0.5, 0.0],
              y_step=[0.0, 0.3], seed=7)
    res_h = mpc.sim(_mk(), 25, [5, 1], **kw)
    res_c = CompiledClosedLoop(_mk()).run(25, ry=[5, 1], **kw)
    assert np.allclose(res_h.u_data, res_c.u_data, atol=1e-9)
    assert np.allclose(res_h.y_data, res_c.y_data, atol=1e-9)


def test_compiled_loop_active_set_backend():
    res_h = mpc.sim(_mk(), 20, [5, 1])
    res_c = CompiledClosedLoop(_mk(qp_solver="active_set")).run(20, ry=[5, 1])
    assert np.allclose(res_h.u_data, res_c.u_data, atol=1e-7)


def test_compiled_loop_rejects_unsupported():
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    c = mpc.LinMPC(mpc.UnscentedKalmanFilter(m), Hp=10, Hc=2)
    with pytest.raises(TypeError, match="constant-gain"):
        CompiledClosedLoop(c)


def test_compiled_loop_kalman_filter():
    """Time-varying KF (P̂ carried through the scan) ≡ host sim."""
    def mk():
        c = mpc.LinMPC(mpc.KalmanFilter(mpc.LinModel(_cstr_G(), 2.0)),
                       Hp=10, Hc=2, Mwt=[1, 1], Nwt=[0.1, 0.1])
        c.setconstraint(umin=[-20, -20], umax=[20, 20])
        return c
    res_h = mpc.sim(mk(), 25, [5, 1], y_noise=[0.1, 0.1], seed=4)
    res_c = CompiledClosedLoop(mk()).run(25, ry=[5, 1], y_noise=[0.1, 0.1],
                                         seed=4)
    assert np.allclose(res_h.u_data, res_c.u_data, atol=1e-8)
    assert np.allclose(res_h.y_data, res_c.y_data, atol=1e-8)
    assert np.allclose(res_h.X_est_data, res_c.X_est_data, atol=1e-8)


def test_compiled_slmpc_loop_matches_host(slpendulum=None):
    """Compiled SL-MPC scan ≡ stepping SLMPC + plant on the host."""
    import jax.numpy as jnp
    from mpc_tpu.controllers.slmpc import SLMPC
    from mpc_tpu.sim_compiled import CompiledSLLoop

    def f(x, u, d, par):
        g, L, K, m = par
        return jnp.array([x[1], -g / L * jnp.sin(x[0]) - K / m * x[1]
                          + u[0] / (m * L ** 2)])
    h = lambda x, d, par: jnp.array([x[0] * 180 / jnp.pi])

    def mkmodel():
        return mpc.NonLinModel(f, h, 0.1, 1, 2, 1, p=(9.8, 0.4, 1.2, 0.3),
                               solver=mpc.RungeKutta(4))

    def mkctrl():
        c = SLMPC(mkmodel(), Hp=20, Hc=2, Mwt=[0.5], Nwt=[2.5],
                  sigmaQ=[0.1, 1.0], sigmaR=[5.0], nint_ym=[1],
                  sigmaQint_ym=[0.1], qp_solver="active_set")
        c.setconstraint(umin=[-1.5], umax=[1.5])
        return c

    N, ry = 40, np.array([180.0])
    c1, plant1 = mkctrl(), mkmodel()
    Y1 = np.zeros((N, 1)); U1 = np.zeros((N, 1))
    for k in range(N):
        y = plant1.evaloutput(); Y1[k] = y
        u, _ = c1.moveinput_closed(y, ry)
        U1[k] = u
        plant1.updatestate(u)
    res = CompiledSLLoop(mkctrl()).run(N, ry=[180.0])
    assert np.abs(Y1 - res.y_data).max() < 1e-7
    assert np.abs(U1 - res.u_data).max() < 1e-7
    assert abs(res.y_data[-1, 0] - 180.0) < 5.0  # swing-up achieved


def test_run_fleet_matches_per_lane_runs():
    """B Monte-Carlo closed loops in one call ≡ B separate run() calls."""
    B, N = 3, 15
    loop = CompiledClosedLoop(_mk(qp_solver="active_set"))
    xh_abs = np.asarray(loop.estim.xop_hat, float)
    fleet = loop.run_fleet(B, N, ry=[5, 1], y_noise=[0.1, 0.2],
                           u_noise=[0.05, 0.05],
                           x_hat_0=np.tile(xh_abs, (B, 1)), seed=10)
    assert fleet["conv"].all()
    for i in range(B):
        ri = CompiledClosedLoop(_mk(qp_solver="active_set")).run(
            N, ry=[5, 1], y_noise=[0.1, 0.2], u_noise=[0.05, 0.05],
            x_hat_0=xh_abs, seed=10 + i)
        assert np.abs(fleet["U"][i] - ri.u_data).max() < 1e-9
        assert np.abs(fleet["Y"][i] - ri.y_data).max() < 1e-9


def test_sl_run_fleet_matches_per_lane():
    """Monte-Carlo SL-MPC fleet ≡ per-lane compiled runs."""
    import jax.numpy as jnp
    from mpc_tpu.controllers.slmpc import SLMPC
    from mpc_tpu.sim_compiled import CompiledSLLoop

    def f(x, u, d, par):
        g, L, K, m = par
        return jnp.array([x[1], -g / L * jnp.sin(x[0]) - K / m * x[1]
                          + u[0] / (m * L ** 2)])
    h = lambda x, d, par: jnp.array([x[0] * 180 / jnp.pi])

    def mk():
        c = SLMPC(mpc.NonLinModel(f, h, 0.1, 1, 2, 1, p=(9.8, 0.4, 1.2, 0.3),
                                  solver=mpc.RungeKutta(4)),
                  Hp=20, Hc=2, Mwt=[0.5], Nwt=[2.5], sigmaQ=[0.1, 1.0],
                  sigmaR=[5.0], nint_ym=[1], sigmaQint_ym=[0.1],
                  qp_solver="active_set")
        c.setconstraint(umin=[-1.5], umax=[1.5])
        return c

    B, N = 2, 20
    fleet = CompiledSLLoop(mk()).run_fleet(B, N, ry=[180.0], y_noise=[2.0],
                                           seed=5)
    for i in range(B):
        ri = CompiledSLLoop(mk()).run(N, ry=[180.0], y_noise=[2.0],
                                      seed=5 + i)
        assert np.abs(fleet["U"][i] - ri.u_data).max() < 1e-7
        assert np.abs(fleet["Y"][i] - ri.y_data).max() < 1e-7


def test_run_fleet_sharded_over_mesh():
    import jax
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("batch",))
    loop = CompiledClosedLoop(_mk(qp_solver="active_set"))
    f_sh = loop.run_fleet(8, 10, ry=[5, 1], y_noise=[0.1, 0.1], seed=2,
                          mesh=mesh)
    loop2 = CompiledClosedLoop(_mk(qp_solver="active_set"))
    f_un = loop2.run_fleet(8, 10, ry=[5, 1], y_noise=[0.1, 0.1], seed=2)
    assert np.allclose(f_sh["U"], f_un["U"], atol=1e-9)
    assert f_sh["conv"].all()


def test_compiled_loop_fuzz_random_plants():
    """Compiled scan ≡ host sim across randomized plants/tunings/noise."""
    from mpc_tpu.parallel import random_cstr_controllers
    for seed in (11, 29):
        c1 = random_cstr_controllers(1, Hp=8, Hc=3, seed=seed)[0]
        c2 = random_cstr_controllers(1, Hp=8, Hc=3, seed=seed)[0]
        kw = dict(y_noise=[0.3, 0.3], u_noise=[0.1, 0.1], seed=seed)
        rh = mpc.sim(c1, 20, [6, -2], **kw)
        rc = CompiledClosedLoop(c2).run(20, ry=[6, -2], **kw)
        assert np.abs(rh.u_data - rc.u_data).max() < 1e-7, seed
        assert np.abs(rh.y_data - rc.y_data).max() < 1e-7, seed


def test_compiled_loop_with_measured_disturbance():
    """nd>0: feedforward path (G/J matrices, d-noise RNG order) ≡ host."""
    G = mpc.tf_matrix([[mpc.tf(1.90, [18, 1]), mpc.tf(1.90, [18, 1])],
                       [mpc.tf(-0.74, [8, 1]), mpc.tf(0.74, [8, 1])]])
    Gd = mpc.tf_matrix([[mpc.tf(0.74, [8, 1])], [mpc.tf(0.74, [8, 1])]])
    GG = np.hstack([np.asarray(G, object), np.asarray(Gd, object)])

    def mk():
        m = mpc.LinModel(GG, 2.0, i_d=[2])
        c = mpc.LinMPC(m, Hp=10, Hc=2, Mwt=[1, 1], Nwt=[0.1, 0.1],
                       qp_solver="active_set")
        c.setconstraint(umin=[-20, -20], umax=[20, 20])
        return c
    kw = dict(d=[0.5], d_step=[0.3], d_noise=[0.05], y_noise=[0.05, 0.05],
              seed=6)
    rh = mpc.sim(mk(), 20, [4, 0], **kw)
    rc = CompiledClosedLoop(mk()).run(20, ry=[4, 0], **kw)
    assert np.abs(rh.u_data - rc.u_data).max() < 1e-8
    assert np.abs(rh.y_data - rc.y_data).max() < 1e-8


def test_compiled_nonlin_loop_matches_host():
    """Full SQP NonLinMPC + UKF + RK4 plant in one scan ≡ host sim."""
    import jax.numpy as jnp
    from mpc_tpu.sim_compiled import CompiledNonLinLoop

    def f(x, u, d, par):
        g, L, K, m = par
        return jnp.array([x[1], -g / L * jnp.sin(x[0]) - K / m * x[1]
                          + u[0] / (m * L ** 2)])
    h = lambda x, d, par: jnp.array([x[0] * 180 / jnp.pi])

    def mk():
        model = mpc.NonLinModel(f, h, 0.1, 1, 2, 1, p=(9.8, 0.4, 1.2, 0.3),
                                solver=mpc.RungeKutta(4))
        estim = mpc.UnscentedKalmanFilter(model, sigmaQ=[0.1, 1.0],
                                          sigmaR=[5.0], nint_ym=[1],
                                          sigmaQint_ym=[0.1])
        c = mpc.NonLinMPC(estim, Hp=20, Hc=2, Mwt=[0.5], Nwt=[2.5],
                          Cwt=np.inf)
        c.setconstraint(umin=[-1.5], umax=[1.5])
        return c
    N = 25
    res_h = mpc.sim(mk(), N, [180.0])
    res_c = CompiledNonLinLoop(mk()).run(N, ry=[180.0])
    assert np.abs(res_h.u_data - res_c.u_data).max() < 1e-6
    assert np.abs(res_h.y_data - res_c.y_data).max() < 1e-6


def test_compiled_nonlin_run_fleet_matches_per_lane():
    import jax.numpy as jnp
    from mpc_tpu.sim_compiled import CompiledNonLinLoop

    def f(x, u, d, par):
        g, L, K, m = par
        return jnp.array([x[1], -g / L * jnp.sin(x[0]) - K / m * x[1]
                          + u[0] / (m * L ** 2)])
    h = lambda x, d, par: jnp.array([x[0] * 180 / jnp.pi])

    def mk():
        model = mpc.NonLinModel(f, h, 0.1, 1, 2, 1, p=(9.8, 0.4, 1.2, 0.3),
                                solver=mpc.RungeKutta(4))
        estim = mpc.UnscentedKalmanFilter(model, sigmaQ=[0.1, 1.0],
                                          sigmaR=[5.0], nint_ym=[1],
                                          sigmaQint_ym=[0.1])
        c = mpc.NonLinMPC(estim, Hp=20, Hc=2, Mwt=[0.5], Nwt=[2.5],
                          Cwt=np.inf)
        c.setconstraint(umin=[-1.5], umax=[1.5])
        return c
    loop = CompiledNonLinLoop(mk())
    fl = loop.run_fleet(2, 12, ry=[180.0], y_noise=[2.0], seed=4)
    for i in range(2):
        ri = CompiledNonLinLoop(mk()).run(12, ry=[180.0], y_noise=[2.0],
                                          seed=4 + i)
        assert np.abs(fl["U"][i] - ri.u_data).max() < 1e-6


def test_heterogeneous_fleet_model_mismatch():
    """Per-lane plants ≠ controller models: lanes match single loops exactly
    and the integrator augmentation still gives offset-free tracking."""
    import copy
    from mpc_tpu.parallel import random_cstr_controllers
    from mpc_tpu.sim_compiled import CompiledClosedLoopFleet
    B, N = 2, 25
    ctrls = random_cstr_controllers(B, Hp=8, Hc=2, seed=5)
    plants = []
    for c in ctrls:
        p = copy.deepcopy(c.estim.model)
        p.Bu = np.asarray(p.Bu) * 1.1    # 10% gain mismatch
        plants.append(p)
    fleet = CompiledClosedLoopFleet(ctrls, [copy.deepcopy(p) for p in plants])
    out = fleet.run(N, ry=[5, 1], y_noise=[0.05, 0.05], seed=20)
    ctrls2 = random_cstr_controllers(B, Hp=8, Hc=2, seed=5)
    for i in range(B):
        c = ctrls2[i]
        xh_abs = np.asarray(c.estim.x0_hat + c.estim.xop_hat, float)
        ri = CompiledClosedLoop(c, copy.deepcopy(plants[i])).run(
            N, ry=[5, 1], y_noise=[0.05, 0.05], seed=20 + i, x_hat_0=xh_abs)
        assert np.abs(out["U"][i] - ri.u_data).max() < 1e-9
    # offset-free despite the gain error (SKF integrator augmentation)
    assert np.abs(out["Y"][:, -1, 0] - 5.0).max() < 0.35


def test_compiled_loop_time_varying_setpoint():
    """(N, ny) setpoint trajectories (previously unreachable branch)."""
    loop = CompiledClosedLoop(_mk(qp_solver="active_set"))
    ry_traj = np.vstack([np.tile([2.0, 0.5], (10, 1)),
                         np.tile([6.0, -1.0], (10, 1))])
    res = loop.run(20, ry=ry_traj)
    assert abs(res.y_data[9, 0] - 2.0) < 0.5
    assert abs(res.y_data[-1, 0] - 6.0) < 0.8


def test_run_fleet_nd_matches_per_lane():
    """nd>0 fleets: dop handling and RNG order (d draw consumed) ≡ run()."""
    Gd = mpc.tf_matrix([[mpc.tf(0.74, [8, 1])], [mpc.tf(0.74, [8, 1])]])
    GG = np.hstack([np.asarray(_cstr_G(), object), np.asarray(Gd, object)])

    def mk():
        c = mpc.LinMPC(mpc.LinModel(GG, 2.0, i_d=[2]), Hp=8, Hc=2,
                       Mwt=[1, 1], Nwt=[0.1, 0.1], qp_solver="active_set")
        c.setconstraint(umin=[-20, -20], umax=[20, 20])
        return c
    B, N = 2, 12
    loop = CompiledClosedLoop(mk())
    xh_abs = np.asarray(loop.estim.xop_hat, float)
    fl = loop.run_fleet(B, N, ry=[4, 0], d=[0.3], y_noise=[0.1, 0.1],
                        x_hat_0=np.tile(xh_abs, (B, 1)), seed=31)
    for i in range(B):
        ri = CompiledClosedLoop(mk()).run(N, ry=[4, 0], d=[0.3],
                                          y_noise=[0.1, 0.1],
                                          x_hat_0=xh_abs, seed=31 + i)
        assert np.abs(fl["U"][i] - ri.u_data).max() < 1e-9, i


def test_compiled_loop_active_set_f32():
    """f32 + GI compiled loops must carry the solver's hi-precision
    gi_state through the scan: _cast_tree once downcast gis_Ginv to f32
    while the solver returned f64, crashing the scan with a carry dtype
    mismatch (round-3 review finding)."""
    import jax.numpy as jnp
    res = CompiledClosedLoop(_mk(qp_solver="active_set",
                                 dtype=jnp.float32)).run(15, ry=[5, 1])
    assert np.all(np.isfinite(res.U_data))
    fl = CompiledClosedLoop(_mk(qp_solver="active_set",
                                dtype=jnp.float32)).run_fleet(
        4, 6, ry=[5.0, 1.0], seed=0)
    assert fl["U"].shape == (4, 6, 2)
    assert np.all(np.isfinite(fl["U"]))
