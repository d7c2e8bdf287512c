"""Cross-composition tests: estimator × controller combinations the reference
exercises in its precompile workload (src/precompile.jl:33-122)."""
import numpy as np
import pytest

import jax.numpy as jnp

import mpc_tpu as mpc


@pytest.fixture(scope="module")
def linmodel():
    return mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)


def test_linmpc_with_each_linear_estimator(linmodel):
    for E in (mpc.SteadyKalmanFilter, mpc.KalmanFilter, mpc.Luenberger):
        est = E(linmodel)
        ctrl = mpc.LinMPC(est, Hp=10, Hc=2)
        res = mpc.sim(ctrl, 25, [1.0])
        assert abs(res.Y_data[-1, 0] - 1.0) < 5e-2, E.__name__


def test_linmpc_with_ukf_ekf(linmodel):
    for E in (mpc.UnscentedKalmanFilter, mpc.ExtendedKalmanFilter):
        est = E(linmodel)
        ctrl = mpc.LinMPC(est, Hp=10, Hc=2)
        res = mpc.sim(ctrl, 25, [1.0])
        assert abs(res.Y_data[-1, 0] - 1.0) < 5e-2, E.__name__


def test_nonlinmpc_with_mhe():
    """NonLinMPC fed by an MHE (the full nonlinear pipeline of BASELINE
    config 5)."""
    def f(x, u, d, p):
        return 0.6 * x + u

    h = lambda x, d, p: x
    m = mpc.NonLinModel(f, h, 1.0, 1, 1, 1, solver=None)
    mhe = mpc.MovingHorizonEstimator(m, He=5)
    ctrl = mpc.NonLinMPC(mhe, Hp=10, Hc=2, Cwt=np.inf)
    res = mpc.sim(ctrl, 25, [2.0], y_step=[0.2])
    assert abs(res.Y_data[-1, 0] - 2.0) < 5e-2


def test_nonlinmpc_with_internal_model(linmodel):
    """InternalModel stochastic predictions flow into the NonLinMPC rollout
    (offset-free under an output step disturbance)."""
    im = mpc.InternalModel(linmodel)
    ctrl = mpc.NonLinMPC(im, Hp=15, Hc=2, Cwt=np.inf)
    res = mpc.sim(ctrl, 40, [1.0], y_step=[0.3])
    assert abs(res.Y_data[-1, 0] - 1.0) < 1e-2


def test_explicitmpc_with_luenberger(linmodel):
    est = mpc.Luenberger(linmodel)
    ctrl = mpc.ExplicitMPC(est, Hp=10, Hc=2)
    res = mpc.sim(ctrl, 25, [1.0])
    assert abs(res.Y_data[-1, 0] - 1.0) < 5e-2


def test_time_varying_constraint_vectors(linmodel):
    """Capital-letter full-horizon bound kwargs (setconstraint! Extended Help)."""
    ctrl = mpc.LinMPC(linmodel, Hp=6, Hc=2, Cwt=np.inf)
    Umax = np.concatenate([np.full(3, 0.5), np.full(3, 2.0)])
    ctrl.setconstraint(Umax=Umax, Umin=-Umax)
    ctrl.preparestate([0])
    u = ctrl.moveinput([10.0])
    assert u[0] <= 0.5 + 1e-7   # first-step bound is the tight one


def test_disturbance_preview(linmodel):
    """D̂ preview: knowing a future disturbance changes the current move."""
    G = np.array([[mpc.tf(3, [10, 1]), mpc.tf(2, [5, 1])]], dtype=object)
    m = mpc.LinModel(G, 1.0, i_d=[1])
    c1 = mpc.LinMPC(m, Hp=10, Hc=5)
    c2 = mpc.LinMPC(m, Hp=10, Hc=5)
    d_now = [0.0]
    D_future = np.concatenate([np.zeros(5), np.full(5, 1.0)])  # step at k+5
    c1.preparestate([0], d_now)
    u_preview = c1.moveinput([0.0], d_now, D_hat=D_future)
    c2.preparestate([0], d_now)
    u_flat = c2.moveinput([0.0], d_now)
    assert not np.allclose(u_preview, u_flat)


def test_default_hp_requires_linmodel():
    f = lambda x, u, d, p: x + u
    h = lambda x, d, p: x
    m = mpc.NonLinModel(f, h, 1.0, 1, 1, 1, solver=None)
    with pytest.raises(ValueError):
        mpc.NonLinMPC(m)   # Hp must be explicit for NonLinModel


def test_forward_euler_supersample():
    f = lambda x, u, d, p: -0.5 * x + u
    h = lambda x, d, p: x
    m = mpc.NonLinModel(f, h, 0.1, 1, 1, 1,
                        solver=mpc.ForwardEuler(supersample=20))
    lin = mpc.LinModel(mpc.ss(-0.5, 1.0, 1.0, 0.0), 0.1)
    xn = m.updatestate([1.0])
    xl = lin.updatestate([1.0])
    assert np.allclose(xn, xl, atol=1e-3)  # Euler is O(h); h = Ts/20


def test_kf_setmodel_covariances(linmodel):
    kf = mpc.KalmanFilter(linmodel)
    ctrl = mpc.LinMPC(kf, Hp=10, Hc=2)
    m2 = mpc.LinModel(mpc.tf(4, [8, 1]), 1.0)
    ctrl.setmodel(m2, Q_hat=np.diag([0.5, 0.5]), R_hat=np.diag([2.0]))
    assert np.allclose(kf.Q_hat, np.diag([0.5, 0.5]))
    assert np.allclose(kf.R_hat, np.diag([2.0]))
    ctrl.preparestate([0])
    assert np.isfinite(ctrl.moveinput([1.0])).all()


def test_all_mpcs_with_move_blocking():
    """ExplicitMPC / LinMPC(SS,MS) / NonLinMPC(SS,MS; lin+nonlin model) agree
    under the blocking vector Hc=[2,3,4,21] (reference test/3:1593-1634)."""
    G = mpc.tf(10, [400, 1])
    linmodel = mpc.LinModel(G, 100.0)
    A, Bu, C = linmodel.A, linmodel.Bu, linmodel.C

    def f(x, u, d, p):
        return A @ x + Bu @ u

    def h(x, d, p):
        return C @ x

    nonlinmodel = mpc.NonLinModel(f, h, 100.0, 1, 1, 1, solver=None)
    kw = dict(Mwt=[1.0], Nwt=[0.0], Hp=30, Hc=[2, 3, 4, 21])
    ctrls = [
        mpc.ExplicitMPC(linmodel, **kw),
        mpc.LinMPC(linmodel, transcription=mpc.SingleShooting(), **kw),
        mpc.LinMPC(linmodel, transcription=mpc.MultipleShooting(), **kw),
        mpc.NonLinMPC(linmodel, transcription=mpc.SingleShooting(), **kw),
        mpc.NonLinMPC(linmodel, transcription=mpc.MultipleShooting(), **kw),
        mpc.NonLinMPC(nonlinmodel, transcription=mpc.SingleShooting(), **kw),
        mpc.NonLinMPC(nonlinmodel, transcription=mpc.MultipleShooting(), **kw),
    ]
    N = 12
    plant = mpc.LinModel(G, 100.0)
    U = np.zeros((len(ctrls), N))
    for i in range(N):
        y = plant.evaloutput()
        for j, c in enumerate(ctrls):
            c.preparestate(y)
            U[j, i] = c.moveinput([5.0])[0]
            c.updatestate([U[j, i]], y)
        plant.updatestate([U[1, i]])
    for j in range(1, len(ctrls)):
        assert np.allclose(U[0], U[j], atol=1e-3), (j, U[0], U[j])
