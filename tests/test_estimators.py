"""State-estimator tests (mirrors reference test/2_test_state_estim.jl)."""
import numpy as np
import pytest

import mpc_tpu as mpc


@pytest.fixture(scope="module")
def sysmodel():
    # shared 2×2 system similar to the reference fixture
    G = np.array([[mpc.tf(1.90, [18, 1]), mpc.tf(1.90, [18, 1])],
                  [mpc.tf(-0.74, [8, 1]), mpc.tf(0.74, [8, 1])]], dtype=object)
    return mpc.LinModel(G, 2.0)


def test_skf_construction(sysmodel):
    kf = mpc.SteadyKalmanFilter(sysmodel)
    assert kf.nym == 2 and kf.nyu == 0
    assert kf.nxs == 2
    assert kf.nx̂ == sysmodel.nx + 2
    assert kf.nint_ym == [1, 1]
    kf3 = mpc.SteadyKalmanFilter(sysmodel, nint_ym=0)
    assert kf3.nxs == 0 and kf3.nx̂ == sysmodel.nx
    kf4 = mpc.SteadyKalmanFilter(sysmodel, nint_ym=[2, 2])
    assert kf4.nxs == 4
    kf5 = mpc.SteadyKalmanFilter(sysmodel, nint_u=[1, 1])
    assert kf5.nint_u == [1, 1] and kf5.nint_ym == [0, 0]
    with pytest.raises(ValueError):
        mpc.SteadyKalmanFilter(sysmodel, nint_ym=[1, 1, 1])
    with pytest.raises(ValueError):
        mpc.SteadyKalmanFilter(sysmodel, nint_ym=[-1, 0])


def test_default_nint_integrating_model():
    # integrating output must get 0 integrators to stay observable
    m_int = mpc.LinModel(np.array([[1.0]]), np.array([[1.0]]),
                         np.array([[1.0]]), 0, 0, 1.0)
    assert mpc.default_nint(m_int) == [0]


def test_skf_estimation(sysmodel):
    model = mpc.LinModel(sysmodel.A, sysmodel.Bu, sysmodel.C, 0, 0, sysmodel.Ts)
    model.setop(uop=[10, 50], yop=[50, 30])
    kf = mpc.SteadyKalmanFilter(model, nint_ym=[1, 1])
    y = [50, 30]
    kf.preparestate(y)
    assert np.allclose(kf.updatestate([10, 50], y), np.zeros(model.nx + 2))
    kf.preparestate(y)
    assert np.allclose(kf.evaloutput(), [50, 30])
    # convergence under step input offset
    for _ in range(100):
        kf.preparestate([50, 30])
        kf.updatestate([11, 52], [50, 30])
    kf.preparestate([50, 30])
    assert np.allclose(kf.evaloutput(), [50, 30], atol=1e-3)


def test_skf_direct_false(sysmodel):
    model = mpc.LinModel(sysmodel.A, sysmodel.Bu, sysmodel.C, 0, 0, sysmodel.Ts)
    model.setop(uop=[10, 50], yop=[50, 30])
    kf = mpc.SteadyKalmanFilter(model, nint_u=[1, 1], direct=False)
    for _ in range(100):
        kf.preparestate([50, 30])
        kf.updatestate([11, 52], [50, 30])
    assert np.allclose(kf.evaloutput(), [50, 30], atol=1e-3)


def test_skf_nan_skips_correction(sysmodel):
    kf = mpc.SteadyKalmanFilter(sysmodel, nint_ym=[1, 1])
    kf.x0_hat[:] = 7.0
    with pytest.warns(UserWarning):
        kf.preparestate([55, np.nan])
    assert np.allclose(kf.x0_hat, 7.0)


def test_kf_vs_skf_asymptotic(sysmodel):
    """Time-varying KF converges to the steady-state KF gain behavior."""
    skf = mpc.SteadyKalmanFilter(sysmodel, nint_ym=[1, 1])
    kf = mpc.KalmanFilter(sysmodel, nint_ym=[1, 1])
    rng = np.random.default_rng(0)
    for i in range(200):
        y = rng.normal(size=2) * 0.1
        skf.preparestate(y)
        kf.preparestate(y)
        u = rng.normal(size=2) * 0.1
        skf.updatestate(u, y)
        kf.updatestate(u, y)
    # after convergence the two track each other
    for i in range(10):
        y = rng.normal(size=2) * 0.1
        x1 = skf.preparestate(y)
        x2 = kf.preparestate(y)
        u = rng.normal(size=2) * 0.1
        skf.updatestate(u, y)
        kf.updatestate(u, y)
    assert np.allclose(x1, x2, atol=1e-4)


def test_ekf_equals_kf_on_linear(sysmodel):
    """EKF on a linear model must match the KF exactly."""
    kf = mpc.KalmanFilter(sysmodel, nint_ym=[1, 1])
    ekf = mpc.ExtendedKalmanFilter(sysmodel, nint_ym=[1, 1])
    rng = np.random.default_rng(1)
    for _ in range(30):
        y = rng.normal(size=2)
        kf.preparestate(y)
        ekf.preparestate(y)
        u = rng.normal(size=2)
        xk = kf.updatestate(u, y)
        xe = ekf.updatestate(u, y)
    assert np.allclose(xk, xe, atol=1e-10)
    assert np.allclose(kf.P_hat, ekf.P_hat, atol=1e-10)


def test_ukf_close_to_kf_on_linear(sysmodel):
    """UKF on a linear model equals the KF (unscented transform is exact for
    linear maps)."""
    kf = mpc.KalmanFilter(sysmodel, nint_ym=[1, 1])
    ukf = mpc.UnscentedKalmanFilter(sysmodel, nint_ym=[1, 1])
    rng = np.random.default_rng(2)
    for _ in range(20):
        y = rng.normal(size=2)
        kf.preparestate(y)
        ukf.preparestate(y)
        u = rng.normal(size=2)
        xk = kf.updatestate(u, y)
        xu = ukf.updatestate(u, y)
    assert np.allclose(xk, xu, atol=1e-6)


def test_ukf_nonlinear():
    import jax.numpy as jnp
    f = lambda x, u, d, p: 0.5 * jnp.sin(x) + u
    h = lambda x, d, p: x
    model = mpc.NonLinModel(f, h, 1.0, 1, 1, 1, solver=None)
    ukf = mpc.UnscentedKalmanFilter(model, nint_ym=[1])
    for _ in range(50):
        ukf.preparestate([1.0])
        ukf.updatestate([0.3], [1.0])
    assert np.allclose(ukf.evaloutput(), [1.0], atol=1e-2)


def test_ekf_nonlinear():
    import jax.numpy as jnp
    f = lambda x, u, d, p: 0.5 * jnp.sin(x) + u
    h = lambda x, d, p: x
    model = mpc.NonLinModel(f, h, 1.0, 1, 1, 1, solver=None)
    ekf = mpc.ExtendedKalmanFilter(model, nint_ym=[1])
    for _ in range(50):
        ekf.preparestate([1.0])
        ekf.updatestate([0.3], [1.0])
    assert np.allclose(ekf.evaloutput(), [1.0], atol=1e-2)


def test_luenberger(sysmodel):
    lo = mpc.Luenberger(sysmodel, nint_ym=[1, 1])
    assert lo.nx̂ == sysmodel.nx + 2
    # closed-loop observer eigenvalues are the requested poles
    Acl = lo.A_hat - lo.A_hat @ lo.K_hat @ lo.Cm_hat
    poles = 1e-3 * np.arange(1, lo.nx̂ + 1) + 0.5
    assert np.allclose(np.sort(np.abs(np.linalg.eigvals(Acl))), np.sort(poles), atol=1e-6)
    for _ in range(100):
        lo.preparestate([0.5, -0.3])
        lo.updatestate([0.1, 0.2], [0.5, -0.3])
    assert np.allclose(lo.evaloutput(), [0.5, -0.3], atol=1e-3)
    with pytest.raises(ValueError):
        mpc.Luenberger(sysmodel, poles=[1.1] * 4)


def test_internal_model(sysmodel):
    im = mpc.InternalModel(sysmodel)
    assert im.nx̂ == sysmodel.nx
    # constant disturbance is absorbed into ŷs
    for _ in range(30):
        im.preparestate([1.0, 2.0])
        im.updatestate([0, 0], [1.0, 2.0])
    im.preparestate([1.0, 2.0])
    assert np.allclose(im.evaloutput(), [1.0, 2.0], atol=1e-6)
    # unstable model rejected
    bad = mpc.LinModel(np.array([[1.5]]), np.array([[1.0]]), np.array([[1.0]]),
                       0, 0, 1.0)
    with pytest.raises(ValueError):
        mpc.InternalModel(bad)


def test_manual_estimator(sysmodel):
    me = mpc.ManualEstimator(sysmodel, nint_ym=0)
    me.setstate(np.arange(sysmodel.nx, dtype=float))
    me.preparestate([0, 0])
    me.updatestate([0, 0], [0, 0])
    assert np.allclose(me.x0_hat, np.arange(sysmodel.nx))  # untouched


def test_initstate_bumpless(sysmodel):
    model = mpc.LinModel(mpc.tf(3, [10, 1]), 0.5)
    estim = mpc.SteadyKalmanFilter(model, nint_ym=[2], direct=False)
    x = estim.initstate([1], [3 - 0.1])
    assert np.allclose(estim.evaloutput(), [3 - 0.1])
    x2 = estim.updatestate([1], [3 - 0.1])
    assert np.allclose(x, x2, atol=1e-9)


def test_estimator_setmodel_public_api():
    """setmodel on estimators directly (execute.jl:440-544): matrices swap,
    x̂ is rebased, jitted kernels are invalidated, SKF regains its gain."""
    A1, A2 = np.array([[0.5]]), np.array([[0.8]])
    z = np.zeros((1, 0))
    m1 = mpc.LinModel(A1, np.array([[1.0]]), np.array([[1.0]]), z, z, 1.0)
    m2 = mpc.LinModel(A2, np.array([[1.0]]), np.array([[1.0]]), z, z, 1.0)
    kf = mpc.KalmanFilter(m1, nint_ym=[1])
    kf.setmodel(m2, Qhat=np.eye(2) * 0.1)
    assert kf.A_hat[0, 0] == 0.8 and kf.Q_hat[0, 0] == 0.1
    skf = mpc.SteadyKalmanFilter(m1, nint_ym=[1])
    K1 = skf.K_hat.copy()
    skf.setmodel(m2)
    assert not np.allclose(K1, skf.K_hat)
    # UKF: the jitted kernels must pick up the new model
    ukf = mpc.UnscentedKalmanFilter(m1, nint_ym=[1])
    ukf.preparestate([0.0])
    ukf.updatestate([0.0], [0.0])
    ukf.setmodel(m2)
    plant = mpc.LinModel(A2, np.array([[1.0]]), np.array([[1.0]]), z, z, 1.0)
    for _ in range(60):
        y = plant.evaloutput()
        ukf.preparestate(y)
        ukf.updatestate([0.3], y)
        plant.updatestate([0.3])
    assert np.allclose(ukf.evaloutput(), plant.evaloutput(), atol=1e-3)
    with pytest.raises(ValueError):
        mpc.Luenberger(m1, nint_ym=[1]).setmodel(m2)
    m3 = mpc.LinModel(np.eye(2) * 0.5, np.ones((2, 1)), np.ones((1, 2)),
                      np.zeros((1, 0)), np.zeros((1, 0)), 1.0)
    with pytest.raises(ValueError):
        kf.setmodel(m3)


def test_partial_measurement_i_ym():
    """Only output 0 measured (i_ym=[0]): estimator reconstructs the full
    output vector and the MPC still tracks consistent setpoints
    (ref estimator/construct.jl i_ym handling)."""
    G = np.array([[mpc.tf(2, [8, 1])], [mpc.tf(4, [3, 1])]], dtype=object)
    m = mpc.LinModel(G, 1.0)
    kf = mpc.KalmanFilter(m, i_ym=[0])
    assert kf.nym == 1 and kf.nyu == 1
    # default_nint adds one integrator for the single measured output
    assert kf.nx_hat == m.nx + 1
    ctrl = mpc.LinMPC(mpc.KalmanFilter(mpc.LinModel(G, 1.0), i_ym=[0]),
                      Hp=15, Hc=2)
    res = mpc.sim(ctrl, 50, [1.0, 2.0])  # consistent: u=0.5 gives [1, 2]
    assert np.allclose(res.Y_data[-1], [1.0, 2.0], atol=1e-3)


def test_partial_measurement_estimator_equivalences():
    """EKF == KF and UKF ~= KF also hold with a measured-output subset."""
    G = np.array([[mpc.tf(2, [8, 1])], [mpc.tf(4, [3, 1])]], dtype=object)
    m = mpc.LinModel(G, 1.0)

    def wrap(model):
        import jax.numpy as jnp
        A, Bu, C = map(jnp.asarray, (model.A, model.Bu, model.C))
        f = lambda x, u, d, p: A @ x + Bu @ u
        h = lambda x, d, p: C @ x
        return mpc.NonLinModel(f, h, model.Ts, model.nu, model.nx, model.ny,
                                solver=None)

    kf = mpc.KalmanFilter(m, i_ym=[1], sigmaQ=[0.5] * m.nx, sigmaR=[0.3])
    ekf = mpc.ExtendedKalmanFilter(wrap(m), i_ym=[1], sigmaQ=[0.5] * m.nx,
                                   sigmaR=[0.3])
    ukf = mpc.UnscentedKalmanFilter(wrap(m), i_ym=[1], sigmaQ=[0.5] * m.nx,
                                    sigmaR=[0.3])
    rng = np.random.default_rng(3)
    for k in range(25):
        ym = [float(rng.normal())]
        u = [float(rng.normal())]
        kf.preparestate(ym)
        ekf.preparestate(ym)
        ukf.preparestate(ym)
        xk = kf.updatestate(u, ym)
        xe = ekf.updatestate(u, ym)
        xu = ukf.updatestate(u, ym)
        assert np.allclose(xk, xe, atol=1e-9), k
        assert np.allclose(xk, xu, atol=1e-6), k


def test_partial_measurement_mhe_matches_kf():
    """MHE == KF equivalence holds with i_ym=[1] as well (seeded arrival
    covariance, filter form — same recipe as test_mhe_vs_kf_direct_true)."""
    G = np.array([[mpc.tf(2, [8, 1])], [mpc.tf(4, [3, 1])]], dtype=object)
    m = mpc.LinModel(G, 1.0)
    rng = np.random.default_rng(5)
    kf = mpc.KalmanFilter(m, i_ym=[1], nint_ym=0, direct=True,
                          sigmaQ=[0.5] * m.nx, sigmaR=[0.3])
    kf.preparestate([0.0])  # zero deviation: information-free correction
    P_corr = kf.P_hat.copy()
    mhe = mpc.MovingHorizonEstimator(
        mpc.LinModel(G, 1.0), He=3, i_ym=[1], nint_ym=0, direct=True,
        sigmaQ=[0.5] * m.nx, sigmaR=[0.3], P0_hat=P_corr)
    kf.updatestate([0.0], [0.0])  # zero deviation: no-op in deviation space
    for i in range(8):
        ym = [0.5 + float(rng.normal())]
        u = [float(rng.normal())]
        x1 = mhe.preparestate(ym)
        x2 = kf.preparestate(ym)
        assert np.allclose(x1, x2, atol=1e-6, rtol=1e-6), i
        mhe.updatestate(u, ym)
        kf.updatestate(u, ym)
