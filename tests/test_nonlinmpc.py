"""NonLinMPC tests (mirrors reference test/3_test_predictive_control.jl:782-1552
and the pendulum case study of docs/src/manual/nonlinmpc.md)."""
import numpy as np
import pytest

import jax.numpy as jnp

import mpc_tpu as mpc


def pendulum_model(p=(9.8, 40.0, 1.2, 0.3)):
    # inverted pendulum: θ'' = −g/L sinθ − K/m θ' + u/(m L²)
    def f(x, u, d, par):
        g, L, K, m = par
        th, om = x[0], x[1]
        return jnp.array([om, -g / L * jnp.sin(th) - K / m * om
                          + u[0] / (m * L ** 2)])

    h = lambda x, d, par: jnp.array([x[0] * 180 / jnp.pi])
    return mpc.NonLinModel(f, h, 0.1, 1, 2, 1, p=p,
                           solver=mpc.RungeKutta(4, supersample=1))


@pytest.fixture(scope="module")
def pendulum():
    # parameters from the reference manual: g=9.8, L=0.4, K=1.2, m=0.3
    def f(x, u, d, par):
        g, L, K, m = par
        return jnp.array([x[1], -g / L * jnp.sin(x[0]) - K / m * x[1]
                          + u[0] / (m * L ** 2)])

    h = lambda x, d, par: jnp.array([x[0] * 180 / jnp.pi])
    return mpc.NonLinModel(f, h, 0.1, 1, 2, 1, p=(9.8, 0.4, 1.2, 0.3),
                           solver=mpc.RungeKutta(4))


def test_nonlinmpc_equals_linmpc_on_linear_plant():
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    nmpc = mpc.NonLinMPC(m, Hp=10, Hc=2)
    lmpc = mpc.LinMPC(m, Hp=10, Hc=2)
    y = [0.0]
    for k in range(5):
        nmpc.preparestate(y)
        lmpc.preparestate(y)
        u1 = nmpc.moveinput([3.0])
        u2 = lmpc.moveinput([3.0])
        assert np.allclose(u1, u2, atol=1e-5), k
        nmpc.updatestate(u1, y)
        lmpc.updatestate(u2, y)


def test_pendulum_swing_to_180(pendulum):
    """Reference manual case: track θ = 180° with |u| ≤ 1.5 N·m."""
    estim = mpc.UnscentedKalmanFilter(pendulum, sigmaQ=[0.1, 1.0],
                                      sigmaR=[5.0], nint_ym=[1],
                                      sigmaQint_ym=[0.1])
    ctrl = mpc.NonLinMPC(estim, Hp=20, Hc=2, Mwt=[0.5], Nwt=[2.5], Cwt=np.inf)
    ctrl.setconstraint(umin=[-1.5], umax=[1.5])
    res = mpc.sim(ctrl, 60, [180.0])
    # pendulum reaches the inverted position
    assert abs(res.Y_data[-1, 0] - 180.0) < 2.0
    # torque limit respected
    assert np.max(np.abs(res.U_data)) <= 1.5 + 1e-6


def test_pendulum_multiple_shooting(pendulum):
    """MultipleShooting transcription solves the same problem."""
    estim = mpc.UnscentedKalmanFilter(pendulum, sigmaQ=[0.1, 1.0],
                                      sigmaR=[5.0], nint_ym=[1],
                                      sigmaQint_ym=[0.1])
    ctrl = mpc.NonLinMPC(estim, Hp=20, Hc=2, Mwt=[0.5], Nwt=[2.5], Cwt=np.inf,
                         transcription=mpc.MultipleShooting())
    ctrl.setconstraint(umin=[-1.5], umax=[1.5])
    res = mpc.sim(ctrl, 60, [180.0])
    assert abs(res.Y_data[-1, 0] - 180.0) < 2.0
    assert np.max(np.abs(res.U_data)) <= 1.5 + 1e-6


def test_economic_cost_reduces_energy(pendulum):
    """EMPC with JE = ∫ u·ω dt (motor work) uses less energy than plain MPC
    (reference manual: economic pendulum example)."""
    p_phys = (9.8, 0.4, 1.2, 0.3)

    def JE(Ue, Ye, De, p, eps):
        # work ≈ Σ τ·ω over the horizon (ω not directly in Ye; use u² proxy)
        return jnp.sum(Ue[:-1] ** 2)

    estim1 = mpc.UnscentedKalmanFilter(pendulum, sigmaQ=[0.1, 1.0],
                                       sigmaR=[5.0], nint_ym=[1],
                                       sigmaQint_ym=[0.1])
    empc = mpc.NonLinMPC(estim1, Hp=20, Hc=2, Mwt=[0.5], Nwt=[2.5],
                         Cwt=np.inf, Ewt=0.03, JE=JE)
    empc.setconstraint(umin=[-1.5], umax=[1.5])
    res_e = mpc.sim(empc, 60, [180.0])
    estim2 = mpc.UnscentedKalmanFilter(pendulum, sigmaQ=[0.1, 1.0],
                                       sigmaR=[5.0], nint_ym=[1],
                                       sigmaQint_ym=[0.1])
    plain = mpc.NonLinMPC(estim2, Hp=20, Hc=2, Mwt=[0.5], Nwt=[2.5], Cwt=np.inf)
    plain.setconstraint(umin=[-1.5], umax=[1.5])
    res_p = mpc.sim(plain, 60, [180.0])
    E_e = np.sum(res_e.U_data ** 2)
    E_p = np.sum(res_p.U_data ** 2)
    assert E_e < E_p  # economic term saves energy
    assert abs(res_e.Y_data[-1, 0] - 180.0) < 5.0  # still tracks


def test_custom_nonlinear_constraint(pendulum):
    """gc: predicted output must stay below 100° during the first swing."""
    estim = mpc.UnscentedKalmanFilter(pendulum, sigmaQ=[0.1, 1.0],
                                      sigmaR=[5.0], nint_ym=[1],
                                      sigmaQint_ym=[0.1])
    Hp = 20

    def gc(Ue, Ye, De, p, eps):
        # custom: all predicted angles ≤ 110° (soft via eps)
        return Ye[1:] - 110.0 - eps * 10.0

    ctrl = mpc.NonLinMPC(estim, Hp=Hp, Hc=2, Mwt=[0.5], Nwt=[2.5], Cwt=1e5,
                         gc=gc, nc=Hp)
    ctrl.setconstraint(umin=[-1.5], umax=[1.5])
    res = mpc.sim(ctrl, 60, [100.0])
    assert np.max(res.Y_data[:, 0]) < 112.0  # bound approximately honored
    assert abs(res.Y_data[-1, 0] - 100.0) < 3.0


def test_successive_linearization_adaptive_mpc(pendulum):
    """SL-MPC: LinMPC + linearize_ + setmodel each step (reference manual's
    210×-speedup pattern) controls the pendulum."""
    linmodel = mpc.linearize(pendulum, x=[0.0, 0.0], u=[0.0])
    kf = mpc.KalmanFilter(linmodel, sigmaQ=[0.1, 1.0], sigmaR=[5.0],
                          nint_ym=[1], sigmaQint_ym=[0.1])
    ctrl = mpc.LinMPC(kf, Hp=20, Hc=2, Mwt=[0.5], Nwt=[2.5], Cwt=np.inf)
    ctrl.setconstraint(umin=[-1.5], umax=[1.5])
    plant = pendulum
    plant.setstate([0.0, 0.0])
    y_hist, u_hist = [], []
    u = np.zeros(1)
    for k in range(70):
        y = plant.evaloutput()
        x_hat = ctrl.preparestate(y)
        # relinearize at the current estimate and hot-swap
        mpc.linearize_(linmodel, pendulum, x_hat[:2], u, np.zeros(0))
        ctrl.setmodel(linmodel)
        u = ctrl.moveinput([180.0])
        y_hist.append(y.copy())
        u_hist.append(u.copy())
        plant.updatestate(u)
        ctrl.updatestate(u, y)
    y_hist = np.array(y_hist)
    assert abs(y_hist[-1, 0] - 180.0) < 5.0
    assert np.max(np.abs(u_hist)) <= 1.5 + 1e-6


def test_pendulum_trapezoidal_collocation(pendulum):
    """TrapezoidalCollocation transcription solves the swing-up."""
    estim = mpc.UnscentedKalmanFilter(pendulum, sigmaQ=[0.1, 1.0],
                                      sigmaR=[5.0], nint_ym=[1],
                                      sigmaQint_ym=[0.1])
    ctrl = mpc.NonLinMPC(estim, Hp=20, Hc=2, Mwt=[0.5], Nwt=[2.5], Cwt=np.inf,
                         transcription=mpc.TrapezoidalCollocation(0))
    ctrl.setconstraint(umin=[-1.5], umax=[1.5])
    res = mpc.sim(ctrl, 45, [180.0])
    assert abs(res.Y_data[-1, 0] - 180.0) < 2.0
    assert np.max(np.abs(res.U_data)) <= 1.5 + 1e-6


def test_pendulum_orthogonal_collocation(pendulum):
    """OrthogonalCollocation (Gauss-Radau, no=3) solves the swing-up."""
    estim = mpc.UnscentedKalmanFilter(pendulum, sigmaQ=[0.1, 1.0],
                                      sigmaR=[5.0], nint_ym=[1],
                                      sigmaQint_ym=[0.1])
    ctrl = mpc.NonLinMPC(estim, Hp=20, Hc=2, Mwt=[0.5], Nwt=[2.5], Cwt=np.inf,
                         transcription=mpc.OrthogonalCollocation(0, 3))
    ctrl.setconstraint(umin=[-1.5], umax=[1.5])
    res = mpc.sim(ctrl, 45, [180.0])
    assert abs(res.Y_data[-1, 0] - 180.0) < 2.0
    assert np.max(np.abs(res.U_data)) <= 1.5 + 1e-6


def test_collocation_requires_continuous_model():
    f = lambda x, u, d, p: 0.5 * x + u
    h = lambda x, d, p: x
    m = mpc.NonLinModel(f, h, 1.0, 1, 1, 1, solver=None)  # discrete
    with pytest.raises(ValueError):
        mpc.NonLinMPC(m, Hp=5, Hc=2, transcription=mpc.TrapezoidalCollocation())


def test_nonlinmpc_with_disturbance():
    """NonLinModel with measured disturbance channel."""
    def f(x, u, d, p):
        return 0.6 * x + u + 0.5 * d

    h = lambda x, d, p: x
    m = mpc.NonLinModel(f, h, 1.0, 1, 1, 1, 1, solver=None)
    ctrl = mpc.NonLinMPC(m, Hp=10, Hc=2, Cwt=np.inf)
    res = mpc.sim(ctrl, 30, [2.0], d=[1.0])
    assert np.allclose(res.Y_data[-1], [2.0], atol=1e-2)


def test_custom_lincon_matches_linmpc():
    """W = Wy·ŷ + Wu·u rows on a LinModel: NonLinMPC SQP must match the
    LinMPC condensed-QP path (construct.jl:665-695, relaxW :1085-1160)."""
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    kw = dict(Hp=10, Hc=3, Wy=[[1.0]], Wu=[[0.5]])
    nmpc = mpc.NonLinMPC(m, **kw)
    lmpc = mpc.LinMPC(m, **kw)
    for c in (nmpc, lmpc):
        c.setconstraint(wmax=[2.2])     # ŷ + 0.5 u ≤ 2.2 along the horizon
    y = [0.0]
    for k in range(6):
        nmpc.preparestate(y)
        lmpc.preparestate(y)
        u1 = nmpc.moveinput([5.0])
        u2 = lmpc.moveinput([5.0])
        assert np.allclose(u1, u2, atol=2e-4), (k, u1, u2)
        nmpc.updatestate(u1, y)
        lmpc.updatestate(u2, y)
    # the combination constraint must actually bind below the unconstrained u
    free = mpc.LinMPC(m, Hp=10, Hc=3)
    free.preparestate(y)
    assert u1[0] < free.moveinput([5.0])[0] - 0.1


def test_custom_lincon_wu_nonlinear_plant(pendulum):
    """Wu-only custom linear constraint is allowed on NonLinModel
    (construct.jl:668-669 restricts only the Wy term to LinModel)."""
    nmpc = mpc.NonLinMPC(pendulum, Hp=20, Hc=2, Mwt=[0.5], Nwt=[2.5],
                         Cwt=np.inf)
    nmpc.setconstraint(umin=[-5], umax=[5])
    nmpc_w = mpc.NonLinMPC(pendulum, Hp=20, Hc=2, Mwt=[0.5], Nwt=[2.5],
                           Cwt=np.inf, Wu=[[1.0]])
    nmpc_w.setconstraint(umin=[-5], umax=[5], wmax=[0.8])
    y = [0.0]
    nmpc.preparestate(y)
    nmpc_w.preparestate(y)
    u_free = nmpc.moveinput([180.0])
    u_capped = nmpc_w.moveinput([180.0])
    assert u_free[0] > 1.0                    # swing-up wants large torque
    assert u_capped[0] <= 0.8 + 1e-5          # W row caps it
    # Wy on a nonlinear plant must be rejected
    with pytest.raises(ValueError):
        mpc.NonLinMPC(pendulum, Hp=5, Wy=[[1.0]])


def test_nonlinmpc_setmodel():
    """setmodel on a LinModel-backed NonLinMPC (execute.jl:621-699) matches
    a freshly built controller on the new model, and preserves bounds."""
    z = np.zeros((1, 0))
    m1 = mpc.LinModel(np.array([[0.5]]), np.array([[1.0]]), np.array([[1.0]]),
                      z, z, 1.0)
    m2 = mpc.LinModel(np.array([[0.8]]), np.array([[0.5]]), np.array([[1.0]]),
                      z, z, 1.0)
    a = mpc.NonLinMPC(m1, Hp=8, Hc=2)
    a.setconstraint(umax=[1.5])
    a.setmodel(m2)
    b = mpc.NonLinMPC(m2, Hp=8, Hc=2)
    b.setconstraint(umax=[1.5])
    y = [0.0]
    for k in range(4):
        a.preparestate(y)
        b.preparestate(y)
        u1 = a.moveinput([2.0])
        u2 = b.moveinput([2.0])
        assert np.allclose(u1, u2, atol=1e-6), (k, u1, u2)
        assert u1[0] <= 1.5 + 1e-8
        a.updatestate(u1, y)
        b.updatestate(u2, y)
    # NonLinModel-backed controllers refuse a model swap
    def f(x, u, d, p):
        return 0.5 * x + u
    h = lambda x, d, p: x
    nm = mpc.NonLinModel(f, h, 1.0, 1, 1, 1, solver=None)
    with pytest.raises(ValueError):
        mpc.NonLinMPC(nm, Hp=5).setmodel(m2)


def test_nonlinmpc_active_set_solver(pendulum):
    """qp_solver='active_set' (exact GI on the tiny reduced SQP subproblems)
    matches the ADMM path: linear plant ≡ LinMPC, and the MS pendulum
    swing-up reproduces the ADMM controls."""
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    nmpc = mpc.NonLinMPC(m, Hp=10, Hc=2, qp_solver="active_set")
    lmpc = mpc.LinMPC(m, Hp=10, Hc=2)
    y = [0.0]
    for k in range(5):
        nmpc.preparestate(y)
        lmpc.preparestate(y)
        u1 = nmpc.moveinput([3.0])
        u2 = lmpc.moveinput([3.0])
        assert np.allclose(u1, u2, atol=1e-6), k
        nmpc.updatestate(u1, y)
        lmpc.updatestate(u2, y)

    estim = mpc.UnscentedKalmanFilter(pendulum, sigmaQ=[0.1, 1.0],
                                      sigmaR=[5.0], nint_ym=[1],
                                      sigmaQint_ym=[0.1])
    ctrl = mpc.NonLinMPC(estim, Hp=20, Hc=2, Mwt=[0.5], Nwt=[2.5],
                         Cwt=np.inf, qp_solver="active_set",
                         transcription=mpc.MultipleShooting())
    ctrl.setconstraint(umin=[-1.5], umax=[1.5])
    res = mpc.sim(ctrl, 45, [180.0])
    assert abs(res.Y_data[-1, 0] - 180.0) < 2.0
    assert np.max(np.abs(res.U_data)) <= 1.5 + 1e-6


def test_collocation_traces_in_f32(pendulum):
    """Collocation closure constants dtype-follow the iterate (f32 fleets)."""
    for tr in (mpc.TrapezoidalCollocation(), mpc.OrthogonalCollocation(no=2)):
        c = mpc.NonLinMPC(pendulum, Hp=6, Hc=2, transcription=tr,
                          sqp_iters=2)
        p32 = {k: np.asarray(v, np.float32) if np.issubdtype(
            np.asarray(v).dtype, np.floating) else np.asarray(v)
            for k, v in c.params.items()}
        import jax.numpy as jnp
        nZ = c.nZt
        out = c._step(p32, jnp.zeros(c.estim.nx_hat, jnp.float32),
                      jnp.zeros(1, jnp.float32), jnp.zeros(0, jnp.float32),
                      jnp.zeros(0, jnp.float32),
                      jnp.zeros(6, jnp.float32), jnp.zeros(6, jnp.float32),
                      jnp.zeros(1, jnp.float32), jnp.zeros(1, jnp.float32),
                      jnp.zeros(nZ, jnp.float32), None)
        assert out[0].dtype == jnp.float32


def test_nonlinmpc_setmodel_weights_no_retrace():
    """Weight-only setmodel swaps params data; the jitted step survives."""
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    c = mpc.NonLinMPC(m, Hp=8, Hc=2)
    step_before = c._step
    c.setmodel(Mwt=[2.0])
    assert c._step is step_before
    c.preparestate([0.0])
    u = c.moveinput([3.0])
    assert np.isfinite(u).all()


def test_nonlinmpc_initstate_resets_coldstart(pendulum):
    c = mpc.NonLinMPC(pendulum, Hp=6, Hc=2,
                      transcription=mpc.MultipleShooting(), sqp_iters=4)
    c.preparestate([10.0])
    c.moveinput([90.0])
    assert c._solved_once
    c.initstate([0.0], [10.0])
    assert not c._solved_once
    assert c.y_dual is None


def test_nonlinmpc_arg_validation(pendulum):
    with pytest.raises(ValueError, match="gc"):
        mpc.NonLinMPC(pendulum, Hp=5, Hc=2, nc=2)      # nc without gc
    with pytest.raises(ValueError, match="gc"):
        mpc.NonLinMPC(pendulum, Hp=5, Hc=2,
                      gc=lambda *a: np.zeros(1))       # gc without nc
    c = mpc.NonLinMPC(pendulum, Hp=5, Hc=2)
    c.preparestate([0.0])
    with pytest.raises(TypeError, match="unknown moveinput"):
        c.moveinput([90.0], Rhat_y=np.zeros(5))        # typo'd kwarg


def test_nonlinmpc_failure_applies_warm_start():
    """Reference failure policy (controller/execute.jl:499-504): on a poor
    solve the SHIFTED WARM START is applied, not the violated plan."""
    import warnings as _w
    f = lambda x, u, d, p: 0.5 * x + u
    h = lambda x, d, p: 2.0 * x
    nm = mpc.NonLinModel(f, h, 1.0, 1, 1, 1, solver=None)
    ctrl = mpc.NonLinMPC(nm, Hp=5, Hc=2, Cwt=None)      # hard constraints
    ctrl.setconstraint(ymin=[10.0], umin=[-0.1], umax=[0.1])  # unreachable
    ctrl.preparestate([0.0])
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        u = ctrl.moveinput([10.0])
    assert any("shifted warm start" in str(r.message) for r in rec)
    # cold warm start is Z=0 → u = lastu0 + uop = 0, NOT the violated plan
    np.testing.assert_allclose(u, [0.0], atol=1e-12)
    assert ctrl.getinfo()["sol"]["failed"] is True


def test_nonlinmpc_getinfo_derivative_dumps():
    """getinfo parity with the reference's addinfo! (nonlinmpc.jl:565-660):
    ∇J, g values, defect norms, and a solution summary."""
    f = lambda x, u, d, p: 0.5 * x + u
    h = lambda x, d, p: 2.0 * x
    nm = mpc.NonLinModel(f, h, 1.0, 1, 1, 1, solver=None)
    ctrl = mpc.NonLinMPC(nm, Hp=5, Hc=2,
                         transcription=mpc.MultipleShooting(), sqp_iters=8)
    ctrl.preparestate([0.0])
    ctrl.moveinput([1.0])
    info = ctrl.getinfo()
    for k in ("gradJ", "g", "geq", "sol", "J", "viol", "iters"):
        assert k in info, k
    assert info["gradJ"].shape == (ctrl.nZt,)
    assert np.all(info["g"] <= 1e-6)          # feasible at the optimum
    assert info["sol"]["defect_norm"] < 1e-6  # MS defects closed
    assert info["sol"]["failed"] is False
    assert info["sol"]["iterations"] == info["iters"]


def test_nonlinmpc_setparam_swaps_without_retrace():
    """Runtime p swap (reference mutates nmpc.p, test :930): numeric pytree
    p travels in params — same structure swaps never rebuild the step."""
    import jax.numpy as jnp
    m = mpc.LinModel(mpc.tf(5, [2000, 1]), 3000.0)
    m.setop(yop=[10.0])

    def JE(Ue, Ye, De, p, eps):
        Wy, ry, Wu, ru = p
        return (Wy * jnp.sum((ry - Ye[1:]) ** 2)
                + Wu * jnp.sum((ru - Ue[:-1]) ** 2))

    c = mpc.NonLinMPC(m, Mwt=[0], Nwt=[0], Cwt=None, Ewt=1.0, JE=JE,
                      p=(1.0, 15.0, 0.0, 4.0), Hp=60, Hc=1)
    c.preparestate([10.0])
    u = c.moveinput()
    np.testing.assert_allclose(u, [1.0], atol=5e-2)   # output tracking
    step_before = c._step
    c.setparam((0.0, 15.0, 1.0, 4.0))                 # input tracking now
    assert c._step is step_before                     # no retrace
    u = c.moveinput()
    np.testing.assert_allclose(u, [4.0], atol=5e-2)


def test_nonlinmpc_gradJ_matches_finite_differences():
    """AD correctness vs numeric differentiation (the reference cross-checks
    its AD backends with FiniteDiff, Project.toml test deps)."""
    import jax.numpy as jnp
    f = lambda x, u, d, p: 0.5 * x + jnp.tanh(u)
    h = lambda x, d, p: 2.0 * x
    nm = mpc.NonLinModel(f, h, 1.0, 1, 1, 1, solver=None)
    c = mpc.NonLinMPC(nm, Hp=6, Hc=2, sqp_iters=6)
    c.preparestate([0.3])
    c.moveinput([1.0])
    info = c.getinfo()
    gJ = np.asarray(info["gradJ"])

    # rebuild J(Z̃) numerically through the diag objective
    import jax
    L = c._last
    args = (c._p_cache, jnp.asarray(L["x0_hat"]),
            jnp.asarray(c.lastu0_at_solve), jnp.asarray(L["d0"]),
            jnp.asarray(L["D0"]), jnp.asarray(c.R_hat_y),
            jnp.asarray(c.R_hat_u), jnp.asarray(L["yk"]),
            jnp.asarray(L["ry"]))
    def J_of(Z):
        Ja, _, _, _ = c._diag(*args, jnp.asarray(Z))
        return float(Ja)
    Z0 = c.Z_tilde.copy()
    fd = np.zeros_like(gJ)
    eps = 1e-6
    for i in range(Z0.size):
        zp, zm = Z0.copy(), Z0.copy()
        zp[i] += eps; zm[i] -= eps
        fd[i] = (J_of(zp) - J_of(zm)) / (2 * eps)
    np.testing.assert_allclose(gJ, fd, rtol=1e-4, atol=1e-6)


def test_exact_hessian_economic_pendulum():
    """hessian="exact" (full Lagrangian Hessian, PSD-projected) matches the
    GN solution on the economic pendulum and needs fewer SQP iterations per
    steady-state step — the reference's ± exact-Hessian axis
    (src/controller/nonlinmpc.jl:27-29,230-236)."""
    def f(x, u, d, par):
        g, L, K, m = par
        return jnp.array([x[1], -g / L * jnp.sin(x[0]) - K / m * x[1]
                          + u[0] / (m * L ** 2)])

    h2 = lambda x, d, par: jnp.array([x[0] * 180 / jnp.pi,
                                      x[1] * 180 / jnp.pi])

    def run(hess):
        pend = mpc.NonLinModel(f, h2, 0.1, 1, 2, 2, p=(9.8, 0.4, 1.2, 0.3),
                               solver=mpc.RungeKutta(4))
        estim = mpc.UnscentedKalmanFilter(
            pend, sigmaQ=[0.1, 1.0], sigmaR=[5.0, 5.0], nint_ym=[1, 0],
            sigmaQint_ym=[0.1])

        def JE(Ue, Ye, De, p_, eps_):
            omega = Ye[1::2][1:] * jnp.pi / 180
            return 0.1 * jnp.sum(jnp.abs(Ue[1:] * omega)
                                 + 0.01 * (Ue[1:] * omega) ** 2)

        ctrl = mpc.NonLinMPC(estim, Hp=15, Hc=2, Mwt=[0.5, 0.0], Nwt=[2.5],
                             Cwt=np.inf, Ewt=3.5e3, JE=JE, sqp_iters=40,
                             sqp_tol=1e-8, qp_solver="active_set",
                             hessian=hess)
        ctrl.setconstraint(umin=[-1.5], umax=[1.5])
        x = np.zeros(2)
        iters, us = [], []
        for k in range(8):
            ym = np.array([x[0] * 180 / np.pi, x[1] * 180 / np.pi])
            ctrl.preparestate(ym)
            u = ctrl.moveinput([180.0, 0.0])
            iters.append(ctrl.getinfo()["iters"])
            us.append(float(u[0]))
            x = np.asarray(pend.f(jnp.asarray(x), jnp.asarray(u),
                                  jnp.zeros(0), pend.p))
            ctrl.updatestate(u, ym)
        return np.array(iters), np.array(us)

    it_gn, u_gn = run("gauss_newton")
    it_ex, u_ex = run("exact")
    assert np.allclose(u_gn, u_ex, atol=1e-3)      # same optimum
    # steady-state steps (past the initial transient): exact curvature
    # converges in fewer SQP iterations than the GN model on the TYPICAL
    # step (median — individual steps near constraint-activity changes can
    # spike for either Hessian, and the counts are roundoff-sensitive)
    assert np.median(it_ex[2:]) < np.median(it_gn[2:]), (it_gn, it_ex)


def test_exact_hessian_option_validation():
    model = mpc.NonLinModel(lambda x, u, d, p: 0.5 * x + u,
                            lambda x, d, p: 2.0 * x, 1.0, 1, 1, 1,
                            solver=None)
    with pytest.raises(ValueError):
        mpc.NonLinMPC(model, Hp=4, hessian="bogus")
