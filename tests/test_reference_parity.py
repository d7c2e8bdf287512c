"""Golden-trace parity vs the reference's own published numbers.

Every test here pins a numeric output printed in the reference's executable
docstrings (jldoctest blocks, doctest-verified on the reference's CI —
test/6_test_doctest.jl): the closest thing to a cross-implementation oracle
without a Julia runtime.  Tolerances are the printed precision of each value.
Reference indices are 1-based; this API is 0-based (i_ym=[2] → i_ym=[1]).
"""
import warnings

import numpy as np
import pytest

import mpc_tpu as mpc


# ---------------------------------------------------------------------------
# models
# ---------------------------------------------------------------------------

def test_linmodel_step_response_golden():
    """plot_sim.jl:43 — tf(1,[1,1]) @ Ts=1, u=1 bump, 5 steps."""
    model = mpc.LinModel(mpc.tf(1, [1, 1]), 1.0)
    got = []
    for _ in range(5):
        model.updatestate(np.array([1.0]))
        got.append(model()[0])
    np.testing.assert_allclose(
        got, [0.632121, 0.864665, 0.950213, 0.981684, 0.993262], atol=5e-7)


def test_linmodel_initstate_golden():
    """sim_model.jl:190 — initstate puts the model at steady state."""
    model = mpc.LinModel(mpc.tf(6, [10, 1]), 2.0)
    x = model.initstate(np.array([1.0]))
    y = model.evaloutput()
    np.testing.assert_allclose(y, [6.0], atol=5e-4)
    x2 = model.updatestate(np.array([1.0]))
    np.testing.assert_allclose(x2, x, atol=1e-12)  # steady state is fixed


def test_linmodel_updatestate_golden():
    """sim_model.jl:231 — x⁺ = 1·x + 1·u."""
    model = mpc.LinModel(mpc.ss(1.0, 1.0, 1.0, 0.0, 1.0), 1.0)
    x = model.updatestate(np.array([1.0]))
    np.testing.assert_allclose(x, [1.0], atol=1e-12)


def test_linmodel_yop_golden():
    """sim_model.jl:86,261 / state_estim.jl:11 — output at op is yop."""
    model = mpc.LinModel(mpc.tf(2, [10, 1]), 5.0)
    model.setop(yop=[20.0])
    np.testing.assert_allclose(model.evaloutput(), [20.0], atol=1e-12)
    kf = mpc.SteadyKalmanFilter(model, direct=False)
    np.testing.assert_allclose(kf.evaloutput(), [20.0], atol=1e-12)


def test_nonlinmodel_output_golden():
    """sim_model.jl:11 — h adds 20 at x=0."""
    import jax.numpy as jnp
    model = mpc.NonLinModel(lambda x, u, d, p: -x + u,
                            lambda x, d, p: x + 20.0, 4.0, 1, 1, 1, solver=None)
    np.testing.assert_allclose(model.evaloutput(), [20.0], atol=1e-12)


def test_linmodel_tf_id_split_dims():
    """linmodel.jl:213 — [tf(3,[30,1]) tf(-2,[5,1])] @ 0.5s, i_d=[2]→[1]."""
    G = np.array([[mpc.tf(3, [30, 1]), mpc.tf(-2, [5, 1])]], dtype=object)
    model = mpc.LinModel(G, 0.5, i_d=[1])
    assert (model.nu, model.nx, model.ny, model.nd) == (1, 2, 1, 1)


def test_linearize_golden():
    """linearization.jl:71,147 — d/dx (x³+u) = 3x²."""
    import jax.numpy as jnp
    model = mpc.NonLinModel(lambda x, u, d, p: x ** 3 + u,
                            lambda x, d, p: x, 0.1, 1, 1, 1, solver=None)
    lin = mpc.linearize(model, x=[10.0], u=[0.0])
    np.testing.assert_allclose(lin.A, [[300.0]], atol=1e-9)
    lin2 = mpc.linearize(model, x=[20.0], u=[0.0])
    np.testing.assert_allclose(lin2.A, [[1200.0]], atol=1e-9)


# ---------------------------------------------------------------------------
# estimators
# ---------------------------------------------------------------------------

def _append3():
    """construct.jl:355 — append(tf(3,[10,1]), tf(2,[1,0]), tf(4,[-5,1])) @ 1s."""
    z = mpc.tf(0, [1])
    G = np.array([[mpc.tf(3, [10, 1]), z, z],
                  [z, mpc.tf(2, [1, 0]), z],
                  [z, z, mpc.tf(4, [-5, 1])]], dtype=object)
    return mpc.LinModel(G, 1.0)


def test_default_nint_golden():
    """construct.jl:355 — integrating and unstable outputs get no integrator."""
    model = _append3()
    assert list(mpc.default_nint(model)) == [1, 0, 1]


def test_skf_initstate_golden():
    """estimator/execute.jl:192 — initstate! with nint_ym=[2], direct=false."""
    estim = mpc.SteadyKalmanFilter(mpc.LinModel(mpc.tf(3, [10, 1]), 0.5),
                                   nint_ym=[2], direct=False)
    u, y = np.array([1.0]), np.array([3 - 0.1])
    x_hat = estim.initstate(u, y)
    np.testing.assert_allclose(x_hat, [10.0, 0.0, -0.1], atol=5e-4)
    x2 = estim.updatestate(u, y)
    np.testing.assert_allclose(x2, x_hat, atol=1e-9)   # already steady
    np.testing.assert_allclose(estim.evaloutput(), y, atol=1e-9)


def test_skf_prepare_direct_forms_golden():
    """estimator/execute.jl:320 — filter vs predictor form at first step."""
    m = mpc.LinModel(mpc.ss(0.1, 0.5, 1.0, 0.0, 4.0), 4.0)
    e2 = mpc.SteadyKalmanFilter(m, nint_ym=0, direct=True)
    np.testing.assert_allclose(e2.preparestate([1.0]), [0.5], atol=5e-3)
    m1 = mpc.LinModel(mpc.ss(0.1, 0.5, 1.0, 0.0, 4.0), 4.0)
    e1 = mpc.SteadyKalmanFilter(m1, nint_ym=0, direct=False)
    np.testing.assert_allclose(e1.preparestate([1.0]), [0.0], atol=1e-12)


def test_skf_updatestate_golden():
    """estimator/execute.jl:363 — x̂⁺ = [0.5, 0.0] after (u=1, ym=0)."""
    kf = mpc.SteadyKalmanFilter(mpc.LinModel(mpc.ss(0.1, 0.5, 1.0, 0.0, 4.0), 4.0))
    kf.preparestate([0.0])
    x_hat = kf.updatestate([1.0], [0.0])
    np.testing.assert_allclose(x_hat, [0.5, 0.0], atol=1e-9)


def test_kf_setmodel_golden():
    """estimator/execute.jl:464 — covariance defaults and setmodel swap."""
    kf = mpc.KalmanFilter(mpc.LinModel(mpc.ss(0.1, 0.5, 1.0, 0.0, 4.0), 4.0),
                          sigmaQ=[np.sqrt(4.0)], sigmaQint_ym=[np.sqrt(0.25)])
    assert kf.model.A[0, 0] == pytest.approx(0.1)
    assert kf.Q_hat[0, 0] == pytest.approx(4.0)
    assert kf.Q_hat[1, 1] == pytest.approx(0.25)
    kf.setmodel(mpc.LinModel(mpc.ss(0.42, 0.5, 1.0, 0.0, 4.0), 4.0),
                Qhat=np.array([[1.0, 0.0], [0.0, 0.5]]))
    assert kf.model.A[0, 0] == pytest.approx(0.42)
    assert kf.Q_hat[0, 0] == pytest.approx(1.0)
    assert kf.Q_hat[1, 1] == pytest.approx(0.5)


def test_estimator_dims_golden():
    """Dimension lines of the estimator show blocks (kalman.jl:116,412,663,
    1034; luenberger.jl:82; manual.jl:76; internal_model.jl:81)."""
    G = np.array([[mpc.tf(3, [30, 1])], [mpc.tf(-2, [5, 1])]], dtype=object)
    model = mpc.LinModel(G, 0.5)
    skf = mpc.SteadyKalmanFilter(model, i_ym=[1], sigmaR=[1], sigmaQint_ym=[0.01])
    assert (skf.nx_hat, skf.nym) == (3, 1)
    kf = mpc.KalmanFilter(model, i_ym=[1], sigmaR=[1], sigmaP_0=[100, 100],
                          sigmaQint_ym=[0.01])
    assert (kf.nx_hat, kf.nym) == (3, 1)
    lo = mpc.Luenberger(model, nint_ym=[1, 1], poles=[0.61, 0.62, 0.63, 0.64])
    assert lo.nx_hat == 4
    man = mpc.ManualEstimator(model, nint_ym=0)
    assert man.nx_hat == 2 and man.direct is False
    im = mpc.InternalModel(model, i_ym=[1])
    assert (im.nx_hat, im.nym) == (2, 1)
    import jax.numpy as jnp
    nlm = mpc.NonLinModel(lambda x, u, d, p: 0.1 * x + u,
                          lambda x, d, p: 2 * x, 10.0, 1, 1, 1, solver=None)
    ukf = mpc.UnscentedKalmanFilter(nlm, sigmaR=[1], nint_ym=[2],
                                    sigmaPint_ym_0=[1, 1])
    assert ukf.nx_hat == 3
    nlm2 = mpc.NonLinModel(lambda x, u, d, p: 0.2 * x + u,
                           lambda x, d, p: -3 * x, 5.0, 1, 1, 1, solver=None)
    ekf = mpc.ExtendedKalmanFilter(nlm2, sigmaQ=[2], sigmaQint_ym=[2],
                                   sigmaP_0=[0.1], sigmaPint_ym_0=[0.1])
    assert ekf.nx_hat == 2


def test_mhe_getinfo_golden():
    """mhe/execute.jl:134 — Ŷ = [0.5] after one update on a pure integrator."""
    model = mpc.LinModel(mpc.ss(1.0, 1.0, 1.0, 0.0, 5.0), 5.0)
    estim = mpc.MovingHorizonEstimator(model, He=1, nint_ym=0, direct=False)
    estim.updatestate([0.0], [1.0])
    info = estim.getinfo()
    np.testing.assert_allclose(np.asarray(info["Yhat"]).ravel(), [0.5],
                               atol=5e-4)


def test_mhe_dims_golden():
    """mhe/construct.jl:353,813 — decision-variable counts (SS layout)."""
    import jax.numpy as jnp
    nlm = mpc.NonLinModel(lambda x, u, d, p: 0.1 * x + u,
                          lambda x, d, p: 2 * x, 10.0, 1, 1, 1, solver=None)
    estim = mpc.MovingHorizonEstimator(nlm, He=5, sigmaR=[1], sigmaP_0=[0.01])
    # Z̃ = [x̂arr; Ŵ] = nx̂ + He·nx̂ = 2 + 10 = 12, no slack
    assert estim.n_eps == 0 and estim.nx_hat == 2
    m = mpc.LinModel(mpc.ss(0.5, 1.0, 1.0, 0.0, 1.0), 1.0)
    estim2 = mpc.MovingHorizonEstimator(m, He=3)
    estim2.setconstraint(xhatmin=[-50, -50], xhatmax=[50, 50])
    assert estim2.nx_hat == 2 and estim2.He == 3


# ---------------------------------------------------------------------------
# controllers
# ---------------------------------------------------------------------------

def test_linmpc_moveinput_golden():
    """controller/execute.jl:49 — steady-state u for ry=5 is exactly 1."""
    model = mpc.LinModel(mpc.tf(5, [2, 1]), 3.0)
    ctrl = mpc.LinMPC(model, Nwt=[0], Hp=1000, Hc=1)
    ctrl.preparestate([0.0])
    u = ctrl.moveinput([5.0])
    np.testing.assert_allclose(u, [1.0], atol=5e-4)


def test_linmpc_call_predictor_golden():
    """predictive_control.jl:11 — same via __call__ with direct=false."""
    model = mpc.LinModel(mpc.tf(5, [2, 1]), 3.0)
    ctrl = mpc.LinMPC(model, Nwt=[0], Hp=1000, Hc=1, direct=False)
    u = ctrl([5.0])
    np.testing.assert_allclose(u, [1.0], atol=5e-4)


def test_linmpc_getinfo_golden():
    """controller/execute.jl:135 — Ŷ = [10.0] with Hp=Hc=1, Nwt=0."""
    model = mpc.LinModel(mpc.tf(5, [2, 1]), 3.0)
    ctrl = mpc.LinMPC(model, Nwt=[0], Hp=1, Hc=1)
    ctrl.preparestate([0.0])
    ctrl.moveinput([10.0])
    info = ctrl.getinfo()
    np.testing.assert_allclose(np.asarray(info["Yhat"]).ravel(), [10.0],
                               atol=5e-4)


def test_linmpc_setmodel_golden():
    """controller/execute.jl:609 — setmodel swaps A, R̂ and weights."""
    estim = mpc.KalmanFilter(mpc.LinModel(mpc.ss(0.1, 0.5, 1.0, 0.0, 4.0), 4.0),
                             sigmaR=[np.sqrt(25)])
    ctrl = mpc.LinMPC(estim, Hp=1, Hc=1)
    assert ctrl.estim.model.A[0, 0] == pytest.approx(0.1)
    assert ctrl.estim.R_hat[0, 0] == pytest.approx(25.0)
    assert ctrl.weights.M_Hp[0, 0] == pytest.approx(1.0)
    assert ctrl.weights.Nt_Hc[0, 0] == pytest.approx(0.1)
    ctrl.setmodel(mpc.LinModel(mpc.ss(0.42, 0.5, 1.0, 0.0, 4.0), 4.0),
                  Rhat=[[9.0]], Mwt=[10.0], Nwt=[0.666])
    assert ctrl.estim.model.A[0, 0] == pytest.approx(0.42)
    assert ctrl.estim.R_hat[0, 0] == pytest.approx(9.0)
    assert ctrl.weights.M_Hp[0, 0] == pytest.approx(10.0)
    assert ctrl.weights.Nt_Hc[0, 0] == pytest.approx(0.666)


def test_controller_dims_golden():
    """Dimension/optimization lines of the controller show blocks
    (linmpc.jl:175,265; explicitmpc.jl:117; construct.jl:247;
    nonlinmpc.jl:241,387)."""
    G = np.array([[mpc.tf(3, [30, 1])], [mpc.tf(-2, [5, 1])]], dtype=object)
    model = mpc.LinModel(G, 4.0)
    c = mpc.LinMPC(model, Mwt=[0, 1], Nwt=[0.5], Hp=30, Hc=1)
    assert (c.Hp, c.Hc, c.estim.nx_hat, c.nZt) == (30, 1, 4, 2)
    estim = mpc.KalmanFilter(model, i_ym=[1])
    c2 = mpc.LinMPC(estim, Mwt=[0, 1], Nwt=[0.5], Hp=30, Hc=1)
    assert (c2.estim.nx_hat, c2.estim.nym, c2.nZt) == (3, 1, 2)
    e = mpc.ExplicitMPC(model, Mwt=[0, 1], Nwt=[0.5], Hp=30, Hc=1)
    assert (e.Hp, e.Hc, e.estim.nx_hat) == (30, 1, 4)
    # construct.jl:247 — SISO with defaults: Hp=10, Hc=2, nx̂=2, nZ̃=3
    m1 = mpc.LinModel(mpc.tf(3, [30, 1]), 4.0)
    m1.setop(uop=[50], yop=[25])
    c3 = mpc.LinMPC(m1)
    c3.setconstraint(umin=[0], umax=[100], dumin=[-10], dumax=[10])
    assert (c3.Hp, c3.Hc, c3.estim.nx_hat, c3.nZt) == (10, 2, 2, 3)
    # nonlinmpc.jl:241 — MultipleShooting: nZ̃ = nu·Hc + nx̂·Hp + 1 = 51
    import jax.numpy as jnp
    nlm = mpc.NonLinModel(lambda x, u, d, p: 0.5 * x + u,
                          lambda x, d, p: 2 * x, 10.0, 1, 1, 1, solver=None)
    n = mpc.NonLinMPC(nlm, Hp=20, Hc=10, transcription=mpc.MultipleShooting())
    assert n.nZt == 51 and n.estim.nx_hat == 2
    n2 = mpc.NonLinMPC(mpc.UnscentedKalmanFilter(nlm, sigmaQint_ym=[0.05]),
                       Hp=20, Cwt=1e4)
    assert n2.nZt == 3 and n2.Hc == 2


def test_manual_estimator_mhe_pipeline_golden():
    """manual.jl:99-128 man_sim() — the full ManualEstimator + nonlinear MHE
    + LinMPC closed loop, 2×5 matrix printed to 6 digits in the docstring."""
    import jax.numpy as jnp

    def f(x, u, d, p):
        return 0.5 * jnp.sin(x + u)

    def h(x, d, p):
        return x

    model = mpc.NonLinModel(f, h, 100.0, 1, 1, 1, solver=None)
    lin_model = mpc.linearize(model, x=[0.0], u=[0.0])
    man = mpc.ManualEstimator(lin_model, nint_u=[1])
    ctrl = mpc.LinMPC(man)
    estim = mpc.MovingHorizonEstimator(model, nint_u=[1], He=5)
    estim.setconstraint(vhatmin=[-0.001], vhatmax=[0.001])
    estim.initstate([0.0], [0.0])
    y_data, yhat_data = np.zeros(5), np.zeros(5)
    for i in range(5):
        y = model.evaloutput()
        x_hat = estim.preparestate(y)
        y_hat = estim.evaloutput()
        ctrl.setstate(x_hat)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            u = ctrl.moveinput([0.0])
        y_data[i], yhat_data[i] = y[0], y_hat[0]
        estim.updatestate(u, y)
        model.updatestate(u + 0.5)     # load disturbance on the plant
    np.testing.assert_allclose(
        y_data, [0.0, 0.239713, 0.227556, 0.157837, 0.098629], atol=2e-6)
    np.testing.assert_allclose(
        yhat_data, [-0.0, 0.238713, 0.226556, 0.156837, 0.097629], atol=2e-6)


# ---------------------------------------------------------------------------
# reference test-suite oracle values (computed against real OSQP/Ipopt on the
# reference's CI — test/3_test_predictive_control.jl)
# ---------------------------------------------------------------------------

def _yop10():
    m = mpc.LinModel(mpc.tf(5, [2, 1]), 3.0)
    m.setop(yop=[10.0])
    return m


def test_linmpc_moves_item():
    """3_test_predictive_control.jl:92-138 'LinMPC moves and getinfo'."""
    mpc1 = mpc.LinMPC(_yop10(), Nwt=[0], Hp=1000, Hc=1)
    mpc1.preparestate([10.0])
    u = mpc1.moveinput([15.0])
    np.testing.assert_allclose(u, [1.0], atol=1e-2)          # :100
    u = mpc1([15.0], lastu=[-1.0])
    np.testing.assert_allclose(u, [1.0], atol=1e-2)          # :102
    info = mpc1.getinfo()
    np.testing.assert_allclose(info["u"], u, atol=1e-9)
    assert info["Yhat"][-1] == pytest.approx(15.0, abs=1e-2)
    np.testing.assert_allclose(info["DeltaU"], [2.0], atol=1e-2)
    # input-target-only tuning tracks R̂u (:113-114)
    mpc3 = mpc.LinMPC(_yop10(), Mwt=[0], Nwt=[0], Lwt=[1])
    mpc3.preparestate([10.0])
    u = mpc3.moveinput([0.0], R_hat_u=np.full(mpc3.Hp, 12.0))
    np.testing.assert_allclose(u, [12.0], atol=1e-2)
    # MultipleShooting agrees (:120-127; Hp=100 here — same steady state,
    # bounded matrix sizes for the dense in-repo QP)
    mpc5 = mpc.LinMPC(_yop10(), Nwt=[0], Hp=100, Hc=1,
                      transcription=mpc.MultipleShooting())
    mpc5.preparestate([10.0])
    u = mpc5.moveinput([15.0])
    np.testing.assert_allclose(u, [1.0], atol=1e-2)
    info5 = mpc5.getinfo()
    # 2e-2 (not the reference's 1e-2): Hp shortened 1000→100 and the dense
    # MS QP carries 201 variables through ADMM+polish
    assert info5["Yhat"][-1] == pytest.approx(15.0, abs=2e-2)


def test_linmpc_feedforward_item():
    """:128-134 — measured disturbance reaching the setpoint needs u=0."""
    G = np.array([[mpc.tf(5, [2000, 1]), mpc.tf(7, [8000, 1])]], dtype=object)
    m = mpc.LinModel(G, 3000.0, i_d=[1])
    c = mpc.LinMPC(m, Nwt=[0], Hp=1000, Hc=1)
    c.preparestate([0.0], [0.0])
    u = c.moveinput([0.7], [0.1])
    np.testing.assert_allclose(u, [0.0], atol=1e-2)


def test_linmpc_move_blocking_pattern_item():
    """:135-141 — vector Hc=[1,2,3,4]: held moves are exactly held."""
    c = mpc.LinMPC(_yop10(), Hp=10, Hc=[1, 2, 3, 4], Nwt=[10])
    c.preparestate([10.0])
    c.moveinput([15.0])
    dU = np.diff(c.getinfo()["U"])
    np.testing.assert_allclose(dU[[1, 3, 4, 6, 7, 8]], np.zeros(6), atol=1e-9)


@pytest.mark.parametrize("kind", ["internal_model", "nint_u", "nint_ym"])
def test_linmpc_step_disturbance_rejection_item(kind):
    """:159-207 — unmeasured output-disturbance rejection is offset-free for
    all three augmentation schemes; endpoint u≈2, ym≈15 (OSQP oracle)."""
    plant = _yop10()
    r, outdist = 15.0, 5.0
    if kind == "internal_model":
        ctrl = mpc.LinMPC(mpc.InternalModel(_yop10()))
    elif kind == "nint_u":
        ctrl = mpc.LinMPC(mpc.SteadyKalmanFilter(_yop10(), nint_u=[1]))
    else:
        ctrl = mpc.LinMPC(mpc.SteadyKalmanFilter(_yop10(), nint_ym=[1]))
    plant.setstate(np.zeros(1))
    u = np.zeros(1)
    for _ in range(25):
        ym = plant.evaloutput() - outdist
        ctrl.preparestate(ym)
        u = ctrl.moveinput([r])
        ctrl.updatestate(u, ym)
        plant.updatestate(u)
    np.testing.assert_allclose(u, [2.0], atol=1e-2)
    np.testing.assert_allclose(ym, [r], atol=1e-2)


def test_explicitmpc_moves_item():
    """:640-668 'ExplicitMPC moves and getinfo' + disturbance rejection."""
    m = mpc.LinModel(mpc.tf(5, [2, 1]), 3.0)
    m.setop(yop=[10.0])
    e1 = mpc.ExplicitMPC(m, Nwt=[0], Hp=1000, Hc=1)
    e1.preparestate([10.0])
    u = e1.moveinput([15.0])
    np.testing.assert_allclose(u, [1.0], atol=1e-2)
    u = e1([15.0], lastu=[-1.0])
    np.testing.assert_allclose(u, [1.0], atol=1e-2)
    info = e1.getinfo()
    np.testing.assert_allclose(info["u"], u, atol=1e-9)
    assert info["Yhat"][-1] == pytest.approx(15.0, abs=1e-2)
    np.testing.assert_allclose(info["DeltaU"], [2.0], atol=1e-2)
    e3 = mpc.ExplicitMPC(m, Mwt=[0], Nwt=[0], Lwt=[1])
    e3.preparestate([10.0])
    u = e3.moveinput([0.0], R_hat_u=np.full(e3.Hp, 12.0))
    np.testing.assert_allclose(u, [12.0], atol=1e-2)
    # offset-free rejection through the InternalModel (:936-953)
    plant = _yop10()
    ctrl = mpc.ExplicitMPC(mpc.InternalModel(_yop10()))
    plant.setstate(np.zeros(1))
    u = np.zeros(1)
    for _ in range(25):
        ym = plant.evaloutput() - 5.0
        ctrl.preparestate(ym)
        u = ctrl.moveinput([15.0])
        ctrl.updatestate(u, ym)
        plant.updatestate(u)
    np.testing.assert_allclose(u, [2.0], atol=1e-2)
    np.testing.assert_allclose(ym, [15.0], atol=1e-2)


def test_nonlinmpc_linmodel_moves_item():
    """:908-935 'NonLinMPC moves and getinfo (LinModel)' — the hybrid path."""
    m = mpc.LinModel(mpc.tf(5, [2000, 1]), 3000.0)
    m.setop(yop=[10.0])
    Hp = 100
    n1 = mpc.NonLinMPC(m, Nwt=[0], Hp=Hp, Hc=1)
    n1.preparestate([10.0])
    u = n1.moveinput([15.0])
    np.testing.assert_allclose(u, [1.0], atol=5e-2)
    u = n1([15.0], lastu=[-1.0])
    np.testing.assert_allclose(u, [1.0], atol=5e-2)
    info = n1.getinfo()
    np.testing.assert_allclose(np.asarray(info["u"], float), u, atol=1e-9)
    assert info["Yhat"][-1] == pytest.approx(15.0, abs=5e-2)
    np.testing.assert_allclose(info["DeltaU"], [2.0], atol=5e-2)
    # input-target tuning via setmodel weight swap (:921-923)
    n1.setmodel(Mwt=[0], Lwt=[1])
    u = n1.moveinput(R_hat_u=np.full(Hp, 4.0))
    np.testing.assert_allclose(u, [4.0], atol=5e-2)
    # economic-only tracking (:924-934): JE recreates the tracking cost
    import jax.numpy as jnp

    def JE(Ue, Ye, De, p, eps):
        Wy, ry, Wu, ru = p
        return (Wy * jnp.sum((ry - Ye[1:]) ** 2)
                + Wu * jnp.sum((ru - Ue[:-1]) ** 2))

    n2 = mpc.NonLinMPC(m, Mwt=[0], Nwt=[0], Cwt=None, Ewt=1.0, JE=JE,
                       p=(1.0, 15.0, 0.0, 4.0), Hp=Hp, Hc=1)
    n2.preparestate([10.0])
    u = n2.moveinput()
    np.testing.assert_allclose(u, [1.0], atol=5e-2)
    n3 = mpc.NonLinMPC(m, Mwt=[0], Nwt=[0], Cwt=None, Ewt=1.0, JE=JE,
                       p=(0.0, 15.0, 1.0, 4.0), Hp=Hp, Hc=1)
    n3.preparestate([10.0])
    u = n3.moveinput()
    np.testing.assert_allclose(u, [4.0], atol=5e-2)
    # MultipleShooting variant (:941-946)
    n9 = mpc.NonLinMPC(m, Nwt=[0], Hp=Hp, Hc=1,
                       transcription=mpc.MultipleShooting())
    n9.preparestate([10.0])
    u = n9.moveinput([20.0])
    np.testing.assert_allclose(u, [2.0], atol=5e-2)


def test_sim_model_x0_golden():
    """plot_sim.jl:123 — open-loop sim with x_0: x⁺=0.1x+u+d, y=2x."""
    import jax.numpy as jnp
    plant = mpc.NonLinModel(lambda x, u, d, p: 0.1 * x + u + d,
                            lambda x, d, p: 2 * x, 5.0, 1, 1, 1, 1,
                            solver=None)
    res = mpc.sim(plant, 15, [0.0], [0.0], x_0=[1.0])
    expect = 2.0 * 0.1 ** np.arange(15)
    np.testing.assert_allclose(res.y_data.ravel(), expect, atol=1e-12)
