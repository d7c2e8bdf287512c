"""MovingHorizonEstimator tests (mirrors reference test/2_test_state_estim.jl:886-1889)."""
import numpy as np
import pytest

import jax.numpy as jnp

import mpc_tpu as mpc


@pytest.fixture(scope="module")
def linmodel():
    G = np.array([[mpc.tf(1.90, [18, 1]), mpc.tf(1.90, [18, 1]), mpc.tf(1.90, [18, 1])],
                  [mpc.tf(-0.74, [8, 1]), mpc.tf(0.74, [8, 1]), mpc.tf(-0.74, [8, 1])]],
                 dtype=object)
    m = mpc.LinModel(G, 2.0, i_d=[2])
    m.setop(uop=[10, 50], yop=[50, 30], dop=[20])
    return m


def test_mhe_vs_kf_direct_false(linmodel):
    """Unconstrained MHE == KF, predictor form (ref :1750-1766)."""
    rng = np.random.default_rng(42)
    kf = mpc.KalmanFilter(linmodel, nint_ym=0, direct=False)
    mhe = mpc.MovingHorizonEstimator(linmodel, He=3, nint_ym=0, direct=False)
    for i in range(8):
        y = np.array([50, 31]) + rng.normal(size=2)
        x1 = mhe.preparestate(y, [25])
        x2 = kf.preparestate(y, [25])
        assert np.allclose(x1, x2, atol=1e-6, rtol=1e-6), i
        mhe.updatestate([11, 50], y, [25])
        kf.updatestate([11, 50], y, [25])


def test_mhe_vs_kf_direct_true(linmodel):
    """Unconstrained MHE == KF, filter form with seeded P̂(-1|-1)
    (ref :1767-1784)."""
    rng = np.random.default_rng(43)
    kf = mpc.KalmanFilter(linmodel, nint_ym=0, direct=True)
    kf.preparestate([50, 30], [20])
    P_corr = kf.P_hat.copy()
    mhe = mpc.MovingHorizonEstimator(linmodel, He=3, nint_ym=0, direct=True,
                                     P0_hat=P_corr)
    kf.updatestate([10, 50], [50, 30], [20])
    for i in range(8):
        y = np.array([50, 31]) + rng.normal(size=2)
        x1 = mhe.preparestate(y, [25])
        x2 = kf.preparestate(y, [25])
        assert np.allclose(x1, x2, atol=1e-6, rtol=1e-6), i
        mhe.updatestate([11, 50], y, [25])
        kf.updatestate([11, 50], y, [25])


def test_mhe_multiple_shooting_vs_kf(linmodel):
    """MS-MHE (Z = [x̂arr; X̂0; Ŵ] + defect equalities) == KF
    (mhe/transcription.jl:2-3)."""
    rng = np.random.default_rng(7)
    kf = mpc.KalmanFilter(linmodel, nint_ym=0, direct=False)
    mhe = mpc.MovingHorizonEstimator(linmodel, He=3, nint_ym=0, direct=False,
                                     transcription=mpc.MultipleShooting())
    for i in range(8):
        y = np.array([50, 31]) + rng.normal(size=2)
        x1 = mhe.preparestate(y, [25])
        x2 = kf.preparestate(y, [25])
        assert np.allclose(x1, x2, atol=1e-6, rtol=1e-6), i
        mhe.updatestate([11, 50], y, [25])
        kf.updatestate([11, 50], y, [25])


def test_mhe_nonlinear_vs_ekf(linmodel):
    """Nonlinear (wrapped-linear) MHE == EKF (ref :1786-1809)."""
    A, Bu, Bd = linmodel.A, linmodel.Bu, linmodel.Bd
    C, Dd = linmodel.C, linmodel.Dd
    f = lambda x, u, d, p: A @ x + Bu @ u + Bd @ d
    h = lambda x, d, p: C @ x + Dd @ d
    nl = mpc.NonLinModel(f, h, linmodel.Ts, 2, linmodel.nx, 2, 1, solver=None)
    nl.setop(uop=[10, 50], yop=[50, 30], dop=[20])
    rng = np.random.default_rng(44)
    ekf = mpc.ExtendedKalmanFilter(nl, nint_ym=0, direct=False)
    mhe = mpc.MovingHorizonEstimator(nl, He=4, nint_ym=0, direct=False)
    for i in range(7):
        y = np.array([50, 31]) + rng.normal(size=2)
        x1 = mhe.preparestate(y, [25])
        x2 = ekf.preparestate(y, [25])
        assert np.allclose(x1, x2, atol=1e-5, rtol=1e-5), (i, x1, x2)
        mhe.updatestate([11, 50], y, [25])
        ekf.updatestate([11, 50], y, [25])


def test_mhe_state_constraints():
    """Bounds on x̂ are enforced at the optimum (ref :1491,1582)."""
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    mhe = mpc.MovingHorizonEstimator(m, He=4, nint_ym=[1])
    mhe.setconstraint(xhatmin=[-0.1, -0.1], xhatmax=[0.1, 0.1])
    rng = np.random.default_rng(0)
    for i in range(10):
        y = [3.0 + rng.normal() * 0.1]   # large measurements push x̂ up
        x = mhe.preparestate(y)
        assert np.all(x <= 0.1 + 1e-5), (i, x)
        assert np.all(x >= -0.1 - 1e-5)
        mhe.updatestate([1.0], y)


def test_mhe_what_constraints():
    """Process-noise bounds ŵ ∈ [min, max]."""
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    mhe = mpc.MovingHorizonEstimator(m, He=4, nint_ym=[1])
    mhe.setconstraint(whatmin=[-1e-6, -1e-6], whatmax=[1e-6, 1e-6])
    rng = np.random.default_rng(1)
    for i in range(8):
        y = [rng.normal()]
        mhe.preparestate(y)
        mhe.updatestate([1.0], y)
    W = mhe.getinfo()["What"]
    assert np.all(np.abs(W) <= 1e-5)


def test_mhe_nan_measurements(linmodel):
    """NaN in ym is ignored in the objective (ref mhe NaN masking)."""
    mhe = mpc.MovingHorizonEstimator(linmodel, He=3, nint_ym=0)
    y = np.array([50.0, np.nan])
    x = mhe.preparestate(y, [25])
    assert np.all(np.isfinite(x))
    mhe.updatestate([10, 50], y, [25])
    x = mhe.preparestate([50.0, 30.0], [25])
    assert np.all(np.isfinite(x))


def test_mhe_custom_nonlinear_constraints():
    """gc(X̂e, V̂e, Ŵe, Ue, Yem, De, P̄, x̄, p, ε) ≤ 0 with NaN-padded windows
    (mhe/construct.jl:437-448)."""
    import jax.numpy as jnp
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    He = 4

    def gc(Xe, Ve, We, Ue, Yme, De, invP, xbar, p, eps):
        X = Xe.reshape(He + 1, 2)
        return jnp.nan_to_num(X[:, 0] - 0.4, nan=-1.0)

    mhe = mpc.MovingHorizonEstimator(m, He=He, gc=gc, nc=He + 1)
    rng = np.random.default_rng(0)
    for k in range(10):
        y = [3.0 + rng.normal() * 0.1]
        x = mhe.preparestate(y)
        assert x[0] <= 0.4 + 1e-5, (k, x)
        mhe.updatestate([1.0], y)


def test_mhe_offset_estimation():
    """MHE with integrator augmentation estimates a step output disturbance."""
    plant = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    model = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    mhe = mpc.MovingHorizonEstimator(model, He=5)
    for k in range(40):
        y = plant.evaloutput() + 0.5
        mhe.preparestate(y)
        plant.updatestate([1.0])
        mhe.updatestate([1.0], y)
    mhe.preparestate(plant.evaloutput() + 0.5)
    assert np.allclose(mhe.evaloutput(), plant.evaloutput() + 0.5, atol=1e-2)


def test_mhe_in_linmpc_loop():
    """ManualEstimator pattern: LinMPC fed by an MHE-estimated state."""
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    mhe = mpc.MovingHorizonEstimator(m, He=4)
    manual = mpc.ManualEstimator(m, nint_ym=[1])
    ctrl = mpc.LinMPC(manual, Hp=10, Hc=2)
    plant = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    for k in range(40):
        y = plant.evaloutput() + 0.2
        x_hat = mhe.preparestate(y)
        manual.setstate(x_hat)
        u = ctrl.moveinput([1.0])
        plant.updatestate(u)
        mhe.updatestate(u, y)
    assert np.allclose(plant.evaloutput() + 0.2, [1.0], atol=5e-2)


def test_mhe_vhat_constraints():
    """Sensor-noise bounds v̂ ∈ [min, max] (ref mhe/construct.jl:773-1046)."""
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    mhe = mpc.MovingHorizonEstimator(m, He=4, nint_ym=[1])
    mhe.setconstraint(vhatmin=[-0.02], vhatmax=[0.02])
    rng = np.random.default_rng(2)
    for i in range(8):
        y = [1.0 + rng.normal() * 0.5]    # noisy: unconstrained v̂ would be big
        mhe.preparestate(y)
        mhe.updatestate([1.0], y)
    V = mhe.getinfo()["Vhat"]
    assert np.all(np.abs(V) <= 0.02 + 1e-5), V


def test_mhe_time_varying_bounds():
    """Capital forms set per-window-slot bounds: tighten ŵ only on the most
    recent slot and check the rest stay free."""
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    He = 4
    mhe = mpc.MovingHorizonEstimator(m, He=He, nint_ym=[1])
    nx = mhe.nx_hat
    Wmax = np.full(He * nx, 1e17)
    Wmin = np.full(He * nx, -1e17)
    Wmax[-nx:] = 1e-6                 # newest slot: ŵ ≈ 0
    Wmin[-nx:] = -1e-6
    mhe.setconstraint(Whatmin=Wmin, Whatmax=Wmax)
    rng = np.random.default_rng(5)
    for i in range(8):
        y = [rng.normal()]
        mhe.preparestate(y)
        mhe.updatestate([1.0], y)
    W = mhe.getinfo()["What"].reshape(He, nx)
    assert np.all(np.abs(W[-1]) <= 1e-5)       # newest slot pinned
    assert np.any(np.abs(W[:-1]) > 1e-4)       # older slots still absorb noise


def test_mhe_setmodel_tracks_new_model():
    """After setmodel the MHE matches a KalmanFilter built on the new model
    (reference test/2:1668-1749 'MHE set model')."""
    z = np.zeros((1, 0))
    m1 = mpc.LinModel(np.array([[0.5]]), np.array([[1.0]]), np.array([[1.0]]),
                      z, z, 1.0)
    m2 = mpc.LinModel(np.array([[0.8]]), np.array([[0.6]]), np.array([[1.0]]),
                      z, z, 1.0)
    mhe = mpc.MovingHorizonEstimator(m1, He=3, nint_ym=[1])
    kf = mpc.KalmanFilter(m2, nint_ym=[1])
    # run a bit on the old model, then swap
    for k in range(3):
        mhe.preparestate([0.3])
        mhe.updatestate([0.5], [0.3])
    mhe.setmodel(m2)
    kf.setstate(mhe.x0_hat + mhe.xop_hat, mhe.P_arr)
    plant = mpc.LinModel(np.array([[0.8]]), np.array([[0.6]]),
                         np.array([[1.0]]), z, z, 1.0)
    plant.setstate([0.7])
    # both estimators must converge to the same trajectory on the new plant
    for k in range(50):
        y = plant.evaloutput()
        x_m = mhe.preparestate(y)
        x_k = kf.preparestate(y)
        mhe.updatestate([0.4], y)
        kf.updatestate([0.4], y)
        plant.updatestate([0.4])
    assert np.allclose(mhe.evaloutput(), plant.evaloutput(), atol=5e-5)
    assert np.allclose(x_m, x_k, atol=5e-4)


def test_mhe_nonlinear_multiple_shooting_vs_single_shooting():
    """NonLinModel MHE: MultipleShooting == SingleShooting estimates (the MS
    decision layout Z=[x̂arr;X̂0;Ŵ] with defect equalities reaches the same
    optimum; ref mhe/transcription.jl:406-545)."""
    def f(x, u, d, p):
        return jnp.array([0.6 * x[0] + 0.3 * jnp.tanh(x[1]) + 0.4 * u[0],
                          0.8 * x[1] + 0.2 * x[0]])

    h = lambda x, d, p: jnp.array([x[0] + 0.1 * jnp.sin(x[1])])
    mk = lambda: mpc.NonLinModel(f, h, 1.0, 1, 2, 1, solver=None)
    kw = dict(He=4, nint_ym=0, direct=False, sigmaQ=[0.4, 0.4], sigmaR=[0.2],
              sigmaP_0=[1.0, 1.0])
    ss = mpc.MovingHorizonEstimator(mk(), transcription=mpc.SingleShooting(),
                                    **kw)
    ms = mpc.MovingHorizonEstimator(mk(), transcription=mpc.MultipleShooting(),
                                    **kw)
    rng = np.random.default_rng(11)
    for k in range(10):
        ym = [float(rng.normal() * 0.5)]
        u = [float(rng.normal() * 0.5)]
        ss.preparestate(ym)
        ms.preparestate(ym)
        x1 = ss.updatestate(u, ym)
        x2 = ms.updatestate(u, ym)
        # nullspace-eliminated defect equalities reach the SS optimum to
        # ~7e-8 (stacked ADMM equality rows drifted ~2e-5)
        assert np.allclose(x1, x2, atol=1e-6), (k, x1, x2)


def _cont_model():
    def f(x, u, d, p):
        return jnp.array([-0.5 * x[0] + 0.3 * jnp.tanh(x[1]) + 0.4 * u[0],
                          -0.8 * x[1] + 0.2 * x[0]])

    h = lambda x, d, p: jnp.array([x[0] + 0.1 * jnp.sin(x[1])])
    return mpc.NonLinModel(f, h, 0.05, 1, 2, 1, solver="rk4")


def test_mhe_trapezoidal_vs_single_shooting():
    """TrapezoidalCollocation MHE ≈ SingleShooting MHE on a smooth
    continuous model (ref mhe/transcription.jl:1390-1470): the implicit
    trapezoid rule and RK4 discretization agree to O(Ts³), and the
    stochastic integrator states keep the discrete MS defects."""
    kw = dict(He=4, direct=True, sigmaQ=[0.4, 0.4], sigmaR=[0.2],
              sigmaP_0=[1.0, 1.0])  # default nint_ym=1 → stochastic defects
    ss = mpc.MovingHorizonEstimator(
        _cont_model(), transcription=mpc.SingleShooting(), **kw)
    tc = mpc.MovingHorizonEstimator(
        _cont_model(), transcription=mpc.TrapezoidalCollocation(), **kw)
    rng = np.random.default_rng(7)
    for k in range(10):
        ym = [float(rng.normal() * 0.5)]
        u = [float(rng.normal() * 0.5)]
        ss.preparestate(ym)
        tc.preparestate(ym)
        x1 = ss.updatestate(u, ym)
        x2 = tc.updatestate(u, ym)
        # RK4 and trapezoid are different discretizations: the optimum can
        # legitimately differ by the O(Ts³) defect gap amplified through Q/R
        assert np.allclose(x1, x2, atol=5e-3), (k, x1, x2)


def test_mhe_trapezoidal_exact_tustin_equivalence():
    """For a LINEAR continuous plant the implicit trapezoid rule is exactly
    the Tustin discretization with the noise entering through
    M=(I−Ts/2·A)⁻¹: a SingleShooting MHE on the discrete twin
    x⁺=A_d x+B_d u+M·w with Q_d=M·Q·Mᵀ reaches the same optimum to
    machine precision."""
    Ac = np.array([[-0.6, 0.25], [0.1, -0.9]])
    Bc = np.array([[0.5], [0.2]])
    Ts = 0.2
    f_c = lambda x, u, d, p: jnp.asarray(Ac) @ x + jnp.asarray(Bc) @ u
    h_f = lambda x, d, p: jnp.array([x[0] + 0.5 * x[1]])
    mc = mpc.NonLinModel(f_c, h_f, Ts, 1, 2, 1, solver="rk4")
    M = np.linalg.inv(np.eye(2) - 0.5 * Ts * Ac)
    Ad, Bd = M @ (np.eye(2) + 0.5 * Ts * Ac), M @ (Ts * Bc)
    f_d = lambda x, u, d, p: jnp.asarray(Ad) @ x + jnp.asarray(Bd) @ u
    md = mpc.NonLinModel(f_d, h_f, Ts, 1, 2, 1, solver=None)
    Q = np.diag([0.09, 0.09])
    R = np.diag([0.0225])
    P0 = np.eye(2)
    He = 6
    tc = mpc.MovingHorizonEstimator(
        mc, He=He, nint_ym=0, direct=True, Q_hat=Q, R_hat=R, P0_hat=P0,
        transcription=mpc.TrapezoidalCollocation(0))
    ss = mpc.MovingHorizonEstimator(
        md, He=He, nint_ym=0, direct=True, Q_hat=M @ Q @ M.T, R_hat=R,
        P0_hat=P0, transcription=mpc.SingleShooting())
    rng = np.random.default_rng(5)
    # stop before the window moves so both arrival covariances stay at P0
    # (the nested covestims use different discretizations)
    for k in range(He):
        ym = [float(rng.normal() * 0.3)]
        u = [float(rng.normal() * 0.3)]
        tc.preparestate(ym)
        ss.preparestate(ym)
        x1 = tc.updatestate(u, ym)
        x2 = ss.updatestate(u, ym)
        assert np.allclose(x1, x2, atol=2e-6), (k, x1, x2)


def test_mhe_trapezoidal_hold_order_one():
    """h=1 (linear input hold) runs and stays near the h=0 estimates."""
    kw = dict(He=3, nint_ym=0, direct=False, sigmaQ=[0.4, 0.4], sigmaR=[0.2],
              sigmaP_0=[1.0, 1.0])
    t0 = mpc.MovingHorizonEstimator(
        _cont_model(), transcription=mpc.TrapezoidalCollocation(0), **kw)
    t1 = mpc.MovingHorizonEstimator(
        _cont_model(), transcription=mpc.TrapezoidalCollocation(1), **kw)
    rng = np.random.default_rng(3)
    for k in range(6):
        ym = [float(rng.normal() * 0.4)]
        u = [float(rng.normal() * 0.4)]
        t0.preparestate(ym)
        t1.preparestate(ym)
        x0 = t0.updatestate(u, ym)
        x1 = t1.updatestate(u, ym)
        assert np.allclose(x0, x1, atol=5e-3), (k, x0, x1)


def test_mhe_transcription_validation():
    """OrthogonalCollocation is rejected (mhe/construct.jl:174-175);
    trapezoidal needs a continuous-time NonLinModel."""
    with pytest.raises(ValueError, match="OrthogonalCollocation"):
        mpc.MovingHorizonEstimator(
            _cont_model(), He=3, transcription=mpc.OrthogonalCollocation())
    def fd(x, u, d, p):
        return jnp.array([0.5 * x[0] + u[0]])
    disc = mpc.NonLinModel(fd, lambda x, d, p: x, 1.0, 1, 1, 1, solver=None)
    with pytest.raises(ValueError, match="continuous-time"):
        mpc.MovingHorizonEstimator(
            disc, He=3, transcription=mpc.TrapezoidalCollocation())
    lin = mpc.LinModel(np.array([[0.5]]), np.array([[1.0]]),
                       np.array([[1.0]]), np.zeros((1, 0)), np.zeros((1, 0)),
                       1.0)
    with pytest.raises(ValueError, match="continuous-time"):
        mpc.MovingHorizonEstimator(
            lin, He=3, transcription=mpc.TrapezoidalCollocation())


def test_mhe_linmodel_vs_wrapped_nonlinmodel():
    """LinModel MHE (one-shot QP path) ≡ the same plant wrapped as a
    NonLinModel (GN-SQP path), with active ŵ bounds (reference
    2_test_state_estim.jl:1839)."""
    A = np.array([[0.85, 0.1], [0.0, 0.7]])
    Bu = np.array([[0.5], [0.25]])
    C = np.array([[1.0, 0.4]])
    lin = mpc.LinModel(A, Bu, C, np.zeros((1, 0)), np.zeros((1, 0)), 1.0)
    fnl = lambda x, u, d, p: jnp.asarray(A) @ x + jnp.asarray(Bu) @ u
    hnl = lambda x, d, p: jnp.asarray(C) @ x
    nl = mpc.NonLinModel(fnl, hnl, 1.0, 1, 2, 1, solver=None)
    kw = dict(He=4, nint_ym=0, sigmaQ=[0.5, 0.5], sigmaR=[0.3],
              sigmaP_0=[1.0, 1.0], direct=True)
    e1 = mpc.MovingHorizonEstimator(lin, **kw)
    e2 = mpc.MovingHorizonEstimator(nl, **kw)
    wb = dict(whatmin=[-0.02, -0.02], whatmax=[0.02, 0.02])
    e1.setconstraint(**wb)
    e2.setconstraint(**wb)
    rng = np.random.default_rng(21)
    for k in range(9):
        ym = [float(0.5 * np.sin(0.4 * k) + rng.normal() * 0.1)]
        u = [float(np.cos(0.3 * k))]
        e1.preparestate(ym)
        e2.preparestate(ym)
        x1 = e1.updatestate(u, ym)
        x2 = e2.updatestate(u, ym)
        assert np.allclose(x1, x2, atol=5e-5), (k, x1, x2)


def test_mhe_arrival_cov_fallback():
    """Non-PD / non-finite arrival covariance P̄ is rejected with a warning
    and the previous inverse is kept (reference
    2_test_state_estim.jl:1339-1384, mhe/execute.jl:781-797)."""
    A = np.array([[0.8]])
    lin = mpc.LinModel(A, np.array([[1.0]]), np.array([[1.0]]),
                       np.zeros((1, 0)), np.zeros((1, 0)), 1.0)
    e = mpc.MovingHorizonEstimator(lin, He=1, nint_ym=0)
    for _ in range(2):
        e.preparestate([0.5])
        e.updatestate([0.1], [0.5])
    e.P_arr[0, 0] = -1e-3
    invP_copy = e.invP_arr.copy()
    with pytest.warns(UserWarning, match="keeping"):
        e.preparestate([0.5])
        e.updatestate([0.1], [0.5])
    assert np.allclose(e.invP_arr, invP_copy)
    e.P_arr[0, 0] = np.inf
    invP_copy = e.invP_arr.copy()
    with pytest.warns(UserWarning, match="keeping"):
        e.preparestate([0.5])
        e.updatestate([0.1], [0.5])
    assert np.allclose(e.invP_arr, invP_copy)


def test_mhe_setmodel_rebases_operating_points():
    """setmodel to a reparameterization of the SAME physics (shifted
    uop/xop/yop/fop) must leave the estimate stream unchanged — requires the
    deviation-form window/warm-start rebase of mhe/execute.jl:1009-1050."""
    def mk():
        return mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    m0 = mk()
    A, Bu, C = np.asarray(m0.A), np.asarray(m0.Bu), np.asarray(m0.C)
    uop = np.array([2.0])
    xop = np.linalg.solve(np.eye(len(A)) - A, Bu @ uop)
    mB = mk()
    mB.setop(uop=uop, yop=C @ xop, xop=xop, fop=A @ xop + Bu @ uop)

    mhe = mpc.MovingHorizonEstimator(mk(), He=4, nint_ym=0, direct=False)
    kf = mpc.KalmanFilter(mk(), nint_ym=0, direct=False)
    rng = np.random.default_rng(0)
    u = np.zeros(1)
    for k in range(6):
        y = rng.normal(size=1) * 0.5
        x1 = mhe.preparestate(y); x2 = kf.preparestate(y)
        assert np.allclose(x1, x2, atol=1e-6), ("pre", k)
        mhe.updatestate(u, y); kf.updatestate(u, y)
        u = rng.normal(size=1) * 0.2
    mhe.setmodel(mB)
    kf.setmodel(mB)
    for k in range(8):
        y = rng.normal(size=1) * 0.5
        x1 = mhe.preparestate(y); x2 = kf.preparestate(y)
        assert np.allclose(x1, x2, atol=1e-6), ("post", k)
        u = rng.normal(size=1) * 0.2
        mhe.updatestate(u, y); kf.updatestate(u, y)


def test_mhe_initstate_seeds_prewindow_disturbance():
    """initstate stores d0(-1) in the pre-window slot (mhe/execute.jl:30):
    MHE ≡ KF during the transient with d != dop."""
    G = mpc.tf_matrix([[mpc.tf(3, [10, 1]), mpc.tf(1, [5, 1])]])
    m = mpc.LinModel(G, 1.0, i_d=[1])
    mhe = mpc.MovingHorizonEstimator(m, He=4, nint_ym=0, direct=False)
    kf = mpc.KalmanFilter(m, nint_ym=0, direct=False)
    d = np.array([0.7])
    y0 = np.asarray(m.yop + 0.3)
    mhe.initstate(np.zeros(1), y0, d)
    kf.initstate(np.zeros(1), y0, d)
    rng = np.random.default_rng(2)
    for k in range(6):
        y = rng.normal(size=1) * 0.4
        xm = mhe.preparestate(y, d)
        xk = kf.preparestate(y, d)
        assert np.allclose(xm, xk, atol=1e-6), k
        u = rng.normal(size=1) * 0.1
        mhe.updatestate(u, y, d); kf.updatestate(u, y, d)


def test_mhe_transient_bounds_end_aligned():
    """Per-slot bounds are end-aligned while the window grows
    (trunc_bounds, mhe/execute.jl:572-580): the 'newest slot' bound applies
    to the newest sample even when Nk < He."""
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    He = 4
    mhe = mpc.MovingHorizonEstimator(m, He=He, nint_ym=[1])
    nx = mhe.nx_hat
    Wmax = np.full(He * nx, 1e17); Wmin = np.full(He * nx, -1e17)
    Wmax[-nx:] = 1e-6; Wmin[-nx:] = -1e-6    # newest slot: ŵ ≈ 0
    mhe.setconstraint(Whatmin=Wmin, Whatmax=Wmax)
    rng = np.random.default_rng(5)
    for i in range(2):                        # Nk = 2 < He: still growing
        y = [3.0 * rng.normal()]
        mhe.preparestate(y)
        W = mhe.getinfo()["What"].reshape(-1, nx)  # valid slots only
        assert np.all(np.abs(W[-1]) <= 1e-5), i   # newest VALID slot pinned
        mhe.updatestate([1.0], y)


def test_mhe_rejects_nan_inputs():
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    mhe = mpc.MovingHorizonEstimator(m, He=3)
    mhe.preparestate([0.1])
    mhe.updatestate([np.nan], [0.1])
    with pytest.raises(ValueError, match="NaN"):
        mhe.preparestate([0.1])   # NaN u hits the window append


def test_mhe_setmodel_linmodel_does_not_retrace():
    """LinModel matrices travel in the params dict: setmodel swaps data
    without rebuilding the jitted window solver (CLAUDE.md invariant:
    setmodel swaps data only, never retraces)."""
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    mhe = mpc.MovingHorizonEstimator(m, He=3)
    solver_before = mhe._solve_jit
    m2 = mpc.LinModel(mpc.tf(2, [8, 1]), 1.0)
    mhe.setmodel(m2)
    assert mhe._solve_jit is solver_before
    # and the swapped matrices actually take effect (tracks the new model)
    kf = mpc.KalmanFilter(m2, nint_ym=[1])
    kf.setstate(mhe.x0_hat + mhe.xop_hat)
    kf.P_hat = mhe.P_arr.copy()
    rng = np.random.default_rng(1)
    for k in range(6):
        y = rng.normal(size=1) * 0.5
        mhe.preparestate(y)
        mhe.updatestate([0.5], y)
    assert np.all(np.isfinite(mhe.x0_hat))


def test_mhe_getinfo_key_parity():
    """getinfo key set matches the reference's documented dictionary
    (mhe/execute.jl:86-203 + non-Unicode aliases)."""
    m = mpc.LinModel(mpc.ss(0.5, 1.0, 1.0, 0.0, 1.0), 1.0)
    est = mpc.MovingHorizonEstimator(m, He=3)
    for k in range(4):
        est.preparestate([0.1 * k])
        est.updatestate([0.0], [0.1 * k])
    info = est.getinfo()
    for key in ("What", "epsilon", "Xhat", "xhat", "Vhat", "Pbar", "xbar",
                "Yhat", "Yhatm", "xhatarr", "J", "Ym", "U", "D", "sol",
                "nablaJ"):
        assert key in info, key
    assert info["sol"]["window_fill"] == "3/3"


def test_mhe_getinfo_derivative_and_objective_golden():
    """Golden checks on the getinfo derivative dump (reference ∇J,
    mhe/execute.jl:86-203): at an unconstrained optimum ∇J ≈ 0, and the
    dumped J equals the objective re-evaluated by hand from the dumped
    (x̄, Ŵ, V̂) using the estimator's own weight matrices."""
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    est = mpc.MovingHorizonEstimator(m, He=4)
    rng = np.random.default_rng(3)
    u = np.zeros(1)
    for k in range(7):
        ym = rng.normal(size=1) * 0.3
        est.preparestate(ym)
        if k < 6:
            u = rng.normal(size=1) * 0.2
            est.updatestate(u, ym)
    # read the dump right after preparestate (the solve): updatestate
    # advances the arrival covariance PAST the solved window, after which
    # the arrival-block gradient is legitimately nonzero
    info = est.getinfo()
    # 1) stationarity: unconstrained window optimum → ∇J ≈ 0
    assert np.linalg.norm(info["nablaJ"], np.inf) < 1e-6
    # 2) objective golden: J == x̄ᵀP̄⁻¹x̄ + ŴᵀQ̂⁻¹Ŵ + V̂ᵀR̂⁻¹V̂ (Nk slots)
    Nk = info["Nk"]
    xbar = info["xbar"]
    W = info["What"].reshape(Nk, est.nx_hat)
    V = info["Vhat"].reshape(Nk, est.nym)
    J_manual = (xbar @ est.invP_arr @ xbar
                + np.sum((W @ est.invQ) * W)
                + np.sum((V @ est.invR) * V))
    assert np.isclose(info["J"], J_manual, rtol=1e-8), (info["J"], J_manual)
    # 3) window-state consistency: X̂ rolls out from (x̂arr, Ŵ, U, D)
    X = info["Xhat"]
    x = info["xhatarr"] - est.xop_hat
    for j in range(Nk):
        x = (np.asarray(est.A_hat) @ x
             + np.asarray(est.Bu_hat) @ (info["U"][j] - m.uop)
             + (est.fop_hat - est.xop_hat) + W[j])
        assert np.allclose(x, X[j], atol=1e-9), j


def test_mhe_constrained_getinfo_gradient_matches_fd():
    """With active x̂ bounds, the dumped ∇J matches central finite
    differences of the masked MHE objective at the solution."""
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    est = mpc.MovingHorizonEstimator(m, He=3)
    est.setconstraint(xhatmin=[-0.15, -np.inf], xhatmax=[0.15, np.inf])
    rng = np.random.default_rng(1)
    u = np.zeros(1)
    for k in range(6):
        ym = rng.normal(size=1)
        est.preparestate(ym)
        u = rng.normal(size=1) * 0.3
        est.updatestate(u, ym)
    info = est.getinfo()
    import jax
    import jax.numpy as jnp
    p = jax.device_put(est._windows_params())
    f = lambda z: float(est._obj_fn(p, jnp.asarray(z)))
    z0 = est.Z_tilde.copy()
    g_fd = np.zeros_like(z0)
    h = 1e-6
    for i in range(z0.size):
        zp = z0.copy(); zp[i] += h
        zm = z0.copy(); zm[i] -= h
        g_fd[i] = (f(zp) - f(zm)) / (2 * h)
    assert np.allclose(info["nablaJ"], g_fd, atol=1e-4)


def test_mhe_covestim_size_validation():
    """covestim with a mismatched P̂ size is rejected
    (mhe/construct.jl:655)."""
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    bad = mpc.KalmanFilter(m, nint_ym=0)     # nx̂=1 vs MHE default nx̂=2
    with pytest.raises(ValueError, match="covestim"):
        mpc.MovingHorizonEstimator(m, He=3, covestim=bad)


def test_mhe_negative_softness_weights_rejected():
    """Negative C_* softness weights are rejected
    (mhe/construct.jl:966-996)."""
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    est = mpc.MovingHorizonEstimator(m, He=3, Cwt=1e4)
    with pytest.raises(ValueError, match="non-negative"):
        est.setconstraint(c_xhatmin=[-1.0, 1.0])


def test_mhe_soft_constraints_fast_matches_general():
    """Finite-Cwt (soft) MHE: the construct-time-matrix + GI fast path
    matches the general in-graph solver through a constrained run where
    the slack is active (tight x̂ bounds the estimate must violate)."""
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)

    def run(force_general):
        est = mpc.MovingHorizonEstimator(m, He=4, Cwt=1e4)
        est.setconstraint(xhatmin=[-0.05, -np.inf], xhatmax=[0.05, np.inf])
        if force_general:
            est._fast_applicable = lambda: False
        rng = np.random.default_rng(9)
        u = np.zeros(1)
        out, eps = [], []
        for k in range(8):
            ym = rng.normal(size=1)   # big innovations → bound violations
            out.append(est.preparestate(ym).copy())
            eps.append(est.getinfo()["epsilon"])
            u = rng.normal(size=1) * 0.3
            est.updatestate(u, ym)
        return np.array(out), np.array(eps)

    x_f, e_f = run(False)
    x_g, e_g = run(True)
    assert np.max(e_f) > 1e-4            # the slack actually engaged
    assert np.allclose(x_f, x_g, atol=2e-6), np.abs(x_f - x_g).max()
    assert np.allclose(e_f, e_g, atol=2e-6)


def test_mhe_fast_path_resumes_after_nan_interlude(linmodel):
    """A multi-step NaN interlude routes the window through the general
    solver while the window keeps MOVING; on resume the fast path must
    slot-shift its warm duals once PER MOVE (a single shift leaves them
    misaligned by up to He−1 slots).  Exactness check: the resumed warm
    solve must match a cold-dual twin to solver precision, with no
    degradation warning."""
    import warnings

    def run(cold_resume):
        rng = np.random.default_rng(7)
        mhe = mpc.MovingHorizonEstimator(linmodel, He=4, nint_ym=0)
        nxh = mhe.nx_hat
        mhe.setconstraint(xhatmin=[-100.0] * nxh, xhatmax=[100.0] * nxh)
        xs = []
        for i in range(14):
            if 6 <= i < 9:                      # 3-step NaN interlude
                y = np.array([50.0, np.nan])
            else:
                y = np.array([50, 31]) + rng.normal(size=2)
            if i == 9 and cold_resume:
                mhe._y_fast = None              # cold twin
            with warnings.catch_warnings():
                if i >= 9:
                    warnings.simplefilter("error")
                x = mhe.preparestate(y, [25])
                mhe.updatestate([11, 50], y, [25])
            xs.append(np.asarray(x))
        return np.stack(xs)

    warm = run(cold_resume=False)
    cold = run(cold_resume=True)
    assert np.all(np.isfinite(warm))
    assert np.allclose(warm, cold, atol=1e-8)


def test_nonlinear_mhe_active_set_matches_admm():
    """The GI active-set window-QP backend (round-5) reproduces the ADMM
    backend on a constrained nonlinear pendulum MHE (both transcriptions
    of the general solver path)."""
    import jax.numpy as jnp

    def f(x, u, d, par):
        g, L, K_, m_ = par
        return jnp.array([x[1], -g / L * jnp.sin(x[0]) - K_ / m_ * x[1]
                          + u[0] / (m_ * L ** 2)])

    h = lambda x, d, par: jnp.array([x[0]])

    def mk(qp):
        pend = mpc.NonLinModel(f, h, 0.1, 1, 2, 1, p=(9.8, 0.4, 1.2, 0.3),
                               solver=mpc.RungeKutta(4))
        e = mpc.MovingHorizonEstimator(pend, He=4, sigmaQ=[0.1, 1.0],
                                       sigmaR=[0.5], nint_ym=[1],
                                       sigmaQint_ym=[0.1], qp_solver=qp)
        e.setconstraint(xhatmin=[-0.3, -5.0, -5.0],
                        xhatmax=[0.3, 5.0, 5.0])
        return e

    ea, eb = mk("active_set"), mk("admm")
    rng = np.random.default_rng(47)
    for k in range(8):
        ym = rng.normal(size=1) * 0.3
        xa = ea.preparestate(ym)
        xb = eb.preparestate(ym)
        assert np.allclose(xa, xb, atol=2e-5), (k, np.abs(xa - xb).max())
        assert xa[0] <= 0.3 + 1e-6
        u = rng.normal(size=1) * 0.3
        ea.updatestate(u, ym)
        eb.updatestate(u, ym)
