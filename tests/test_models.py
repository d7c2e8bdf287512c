"""Plant-model layer tests (mirrors reference test/1_test_sim_model.jl)."""
import numpy as np
import pytest

import mpc_tpu as mpc
from mpc_tpu.utils import lti


def test_tf_siso_construction():
    # LinModel(tf(2, [10, 1]), 3.0): zoh of 2/(10s+1) at Ts=3
    model = mpc.LinModel(mpc.tf(2, [10, 1]), 3.0)
    assert (model.nu, model.nx, model.ny, model.nd) == (1, 1, 1, 0)
    a = np.exp(-3.0 / 10.0)
    assert np.isclose(model.A[0, 0], a)
    # steady-state gain of discrete model must be 2
    gain = model.C @ np.linalg.solve(np.eye(1) - model.A, model.Bu)
    assert np.isclose(gain[0, 0], 2.0)


def test_readme_delay_model():
    # G = [2exp(-20s)/(10s+1); 10/(4s+1)], Ts=1 → 1 input, 2 outputs, delays
    G = mpc.tf_matrix([[mpc.tf(2, [10, 1]) * mpc.delay(20)],
                       [mpc.tf(10, [4, 1])]])
    model = mpc.LinModel(G, 1.0)
    assert model.nu == 1 and model.ny == 2 and model.nd == 0
    assert model.nx == 22  # 1 + 20 delay states + 1
    # step response: y1 delayed 20+1 samples, y2 responds immediately
    ys = []
    for _ in range(30):
        model.updatestate([1.0])
        ys.append(model.evaloutput())
    ys = np.array(ys)
    assert np.allclose(ys[:20, 0], 0.0, atol=1e-9)
    assert ys[21, 0] > 0
    assert ys[0, 1] > 0
    # final values approach dc gains 2 and 10
    model2 = mpc.LinModel(G, 1.0)
    model2.initstate([1.0])
    y_ss = model2.evaloutput()
    assert np.allclose(y_ss, [2.0, 10.0], atol=1e-9)


def test_ss_continuous_and_discrete():
    m1 = mpc.LinModel(mpc.ss(-0.1, 1.0, 1.0, 0.0), 2.0)
    assert np.isclose(m1.A[0, 0], np.exp(-0.2))
    m2 = mpc.LinModel(mpc.ss(0.4, 0.2, 0.3, 0.0, Ts=0.1))
    assert m2.Ts == 0.1 and np.isclose(m2.A[0, 0], 0.4)


def test_i_u_i_d_split():
    # LinModel([tf(3,[30,1]) tf(-2,[5,1])], 0.5, i_d=[2]) → nu=1, nd=1
    G = np.array([[mpc.tf(3, [30, 1]), mpc.tf(-2, [5, 1])]], dtype=object)
    model = mpc.LinModel(G, 0.5, i_d=[1])
    assert model.nu == 1 and model.nd == 1 and model.ny == 1
    assert model.nx == 2


def test_setop_and_outputs():
    model = mpc.LinModel(mpc.tf(3, [10, 1]), 2.0)
    model.setop(uop=[50], yop=[20])
    y = model.evaloutput()
    assert np.allclose(y, [20.0])


def test_initstate_steadystate():
    model = mpc.LinModel(mpc.tf(6, [10, 1]), 2.0)
    x = model.initstate([1])
    y = model.evaloutput()
    assert np.allclose(y, [6.0], atol=1e-9)
    xnext = model.updatestate([1])
    assert np.allclose(x, xnext)


def test_nonlinmodel_discrete():
    f = lambda x, u, d, p: -x + u
    h = lambda x, d, p: x + 20.0
    model = mpc.NonLinModel(f, h, 4.0, 1, 1, 1, solver=None)
    y = model.evaloutput()
    assert np.allclose(y, [20.0])
    model.updatestate([3.0])
    assert np.allclose(model.x0, [3.0])


def test_nonlinmodel_rk4_matches_linear():
    # dx/dt = -0.5x + u integrated with RK4 should match zoh discretization well
    f = lambda x, u, d, p: -0.5 * x + u
    h = lambda x, d, p: x
    model = mpc.NonLinModel(f, h, 0.1, 1, 1, 1, solver=mpc.RungeKutta(4, supersample=2))
    lin = mpc.LinModel(mpc.ss(-0.5, 1.0, 1.0, 0.0), 0.1)
    xn = model.updatestate([1.0])
    xl = lin.updatestate([1.0])
    assert np.allclose(xn, xl, atol=1e-8)


def test_linearize():
    f = lambda x, u, d, p: x ** 3 + u
    h = lambda x, d, p: x
    model = mpc.NonLinModel(f, h, 0.1, 1, 1, 1, solver=None)
    linmodel = mpc.linearize(model, x=[10.0], u=[0.0])
    assert np.isclose(linmodel.A[0, 0], 300.0)
    mpc.linearize_(linmodel, model, np.array([20.0]), np.array([0.0]), np.zeros(0))
    assert np.isclose(linmodel.A[0, 0], 1200.0)
    # non-equilibrium point: linear prediction matches nonlinear at the point
    assert np.allclose(linmodel.fop, [20.0 ** 3])


def test_linearize_consistency_with_dynamics():
    # pendulum-like model; check linearized next-state matches f at the op point
    import jax.numpy as jnp

    def f(x, u, d, p):
        theta, omega = x[0], x[1]
        return jnp.array([omega, -9.8 * jnp.sin(theta) - 0.1 * omega + u[0]])

    h = lambda x, d, p: x[:1]
    model = mpc.NonLinModel(f, h, 0.05, 1, 2, 1, solver=mpc.RungeKutta(4))
    x_pt, u_pt = np.array([0.3, -0.2]), np.array([0.5])
    linmodel = mpc.linearize(model, x=x_pt, u=u_pt)
    # at the linearization point, linear model reproduces nonlinear step
    model.setstate(x_pt)
    xnext_nl = model.updatestate(u_pt)
    linmodel.setstate(x_pt)
    xnext_lin = linmodel.updatestate(u_pt)
    assert np.allclose(xnext_nl, xnext_lin, atol=1e-9)


def test_minreal_removes_states():
    # two identical first-order systems in series with cancellation
    A = np.array([[0.5, 0.0], [0.0, 0.5]])
    B = np.array([[1.0], [1.0]])
    C = np.array([[1.0, -1.0]])  # unobservable combination
    sys = lti.StateSpace(A, B, C, np.zeros((1, 1)), 1.0)
    m = lti.minreal(sys)
    assert m.nx == 0  # y ≡ 0


def test_resampling():
    sys_d = lti.c2d_zoh(lti.StateSpace(-0.1, 1.0, 1.0, 0.0), 1.0)
    m = mpc.LinModel(sys_d, 2.0)
    assert np.isclose(m.A[0, 0], np.exp(-0.2), atol=1e-9)


def test_savetime_periodsleep():
    """Soft real-time pacing (sim_model.jl:287-338): periodsleep waits out
    the remainder of the sample period from the last savetime mark."""
    import time
    z = np.zeros((1, 0))
    m = mpc.LinModel(np.array([[0.5]]), np.array([[1.0]]), np.array([[1.0]]),
                     z, z, 0.05)
    t0 = m.savetime()
    m.periodsleep()
    el1 = time.time() - t0
    assert 0.04 <= el1 < 0.5          # waited ≈ Ts (load tolerant)
    # a period that is already exceeded must not sleep
    m.savetime()
    time.sleep(0.06)
    t1 = time.time()
    m.periodsleep()
    assert time.time() - t1 < 0.02
    # busy-wait flavor
    m.savetime()
    t2 = time.time()
    m.periodsleep(busywait=True)
    assert 0.04 <= time.time() - t2 < 0.5


def test_tustin_d2c_roundtrip():
    """c2d_tustin → d2c_tustin must be an exact inverse, including the D
    feedthrough (regression: the D correction used Cc instead of Cd, breaking
    resampling of disturbance channels and InternalModel's stochastic model)."""
    from mpc_tpu.utils import lti
    rng = np.random.default_rng(3)
    n, m, p = 4, 2, 3
    A = rng.normal(size=(n, n)) * 0.3 - 0.5 * np.eye(n)
    B = rng.normal(size=(n, m))
    C = rng.normal(size=(p, n))
    D = rng.normal(size=(p, m))
    sysc = lti.StateSpace(A, B, C, D, None)
    back = lti.d2c_tustin(lti.c2d_tustin(sysc, 0.7))
    for X, Y in ((back.A, A), (back.B, B), (back.C, C), (back.D, D)):
        np.testing.assert_allclose(X, Y, atol=1e-12)
