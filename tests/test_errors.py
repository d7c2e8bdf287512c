"""Constructor/validation error paths (reference tests the error branches of
every constructor — test/1_test_sim_model.jl, 2_test_state_estim.jl,
3_test_predictive_control.jl error items)."""
import numpy as np
import pytest
import jax.numpy as jnp

import mpc_tpu as mpc


@pytest.fixture(scope="module")
def m():
    return mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)


def test_controller_construction_errors(m):
    with pytest.raises(ValueError):
        mpc.LinMPC(m, Hp=-1)
    with pytest.raises(ValueError):
        mpc.LinMPC(m, Hp=2, Hc=5)
    with pytest.raises(ValueError):
        mpc.LinMPC(m, Mwt=[1, 2])       # wrong size
    with pytest.raises(ValueError):
        mpc.LinMPC(m, Mwt=[-1])         # negative weight


def test_setconstraint_errors(m):
    ctrl = mpc.LinMPC(m)
    with pytest.raises(ValueError):
        ctrl.setconstraint(umin=[1, 2])           # wrong size
    with pytest.raises(ValueError):
        ctrl.setconstraint(Umin=np.ones(3))       # wrong horizon size


def test_estimator_construction_errors(m):
    with pytest.raises(ValueError):
        mpc.KalmanFilter(m, sigmaQ=[1, 2, 3, 4])  # wrong size
    with pytest.raises(ValueError):
        mpc.KalmanFilter(m, i_ym=[5])             # out of range
    G2 = np.array([[mpc.tf(1, [1, 1])], [mpc.tf(1, [2, 1])]], dtype=object)
    with pytest.raises(ValueError):
        mpc.KalmanFilter(mpc.LinModel(G2, 1.0), i_ym=[0, 0])  # duplicate
    with pytest.raises(ValueError):
        mpc.MovingHorizonEstimator(m, He=0)
    with pytest.raises(ValueError):
        mpc.Luenberger(m, poles=[1.5])            # unstable pole


def test_internalmodel_rejects_unstable():
    A = np.array([[1.2]]); B = np.array([[1.0]])
    C = np.array([[1.0]]); D = np.array([[0.0]])
    unstable = mpc.LinModel(mpc.ss(A, B, C, D, 1.0), 1.0)
    with pytest.raises(ValueError):
        mpc.InternalModel(unstable)


def test_setmodel_dimension_mismatch(m):
    ctrl = mpc.LinMPC(m)
    G2 = np.array([[mpc.tf(1, [1, 1])], [mpc.tf(1, [2, 1])]], dtype=object)
    with pytest.raises(ValueError):
        ctrl.setmodel(mpc.LinModel(G2, 1.0))


def test_nonlinmodel_shape_validation():
    f_bad = lambda x, u, d, p: jnp.zeros(3)     # declared nx=2
    h = lambda x, d, p: jnp.zeros(1)
    with pytest.raises(ValueError):
        mpc.NonLinModel(f_bad, h, 1.0, 1, 2, 1)
    f = lambda x, u, d, p: jnp.zeros(2)
    h_bad = lambda x, d, p: jnp.zeros(4)        # declared ny=1
    with pytest.raises(ValueError):
        mpc.NonLinModel(f, h_bad, 1.0, 1, 2, 1)
    f_untraceable = lambda x, u, d, p: jnp.zeros(2 if float(x[0]) > 0 else 1)
    with pytest.raises(ValueError):
        mpc.NonLinModel(f_untraceable, h, 1.0, 1, 2, 1)


def test_model_construction_errors():
    with pytest.raises(ValueError):
        mpc.LinModel(mpc.tf(1, [1, 1]), -1.0)    # negative Ts
    with pytest.raises(TypeError):
        mpc.NonLinModel(lambda *a: None, lambda *a: None, 1.0, 1, 1, 1,
                        solver="bogus")
