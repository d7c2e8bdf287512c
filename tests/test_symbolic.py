"""Symbolic-model bridge tests (reference docs/src/manual/mtk.md analogue)."""
import numpy as np
import pytest

import jax.numpy as jnp

import mpc_tpu as mpc

sp = pytest.importorskip("sympy")

from mpc_tpu.utils.symbolic import nonlinmodel_from_sympy  # noqa: E402


def _sym_pendulum():
    th, om, tau, g, L, K, m = sp.symbols("theta omega tau g L K m")
    odes = {th: om, om: -g / L * sp.sin(th) - K / m * om + tau / (m * L**2)}
    return nonlinmodel_from_sympy(
        odes, outputs=[th * 180 / sp.pi], Ts=0.1, inputs=[tau],
        params={g: 9.8, L: 0.4, K: 1.2, m: 0.3})


def _jax_pendulum():
    def f(x, u, d, par):
        g, L, K, m = par
        return jnp.array([x[1], -g / L * jnp.sin(x[0]) - K / m * x[1]
                          + u[0] / (m * L ** 2)])
    h = lambda x, d, par: jnp.array([x[0] * 180 / jnp.pi])
    return mpc.NonLinModel(f, h, 0.1, 1, 2, 1, p=(9.8, 0.4, 1.2, 0.3),
                           solver=mpc.RungeKutta(4))


def test_symbolic_matches_handwritten_rollout():
    msym, info = _sym_pendulum()
    mjax = _jax_pendulum()
    assert [str(s) for s in info["x_syms"]] == ["theta", "omega"]
    assert [str(s) for s in info["p_syms"]] == ["g", "L", "K", "m"]
    rng = np.random.default_rng(0)
    msym.setstate(np.array([0.1, -0.2]))
    mjax.setstate(np.array([0.1, -0.2]))
    for k in range(20):
        u = rng.normal(size=1)
        y1, y2 = msym.evaloutput(), mjax.evaloutput()
        assert np.allclose(y1, y2, atol=1e-10), k
        msym.updatestate(u)
        mjax.updatestate(u)


def test_symbolic_model_linearizes_and_controls():
    """The lambdified model supports jacfwd (linearize) and full NonLinMPC."""
    msym, _ = _sym_pendulum()
    lin = mpc.linearize(msym, x=[np.pi, 0.0], u=[0.0])
    # at the inverted equilibrium dθ'' /dθ = +g/L (unstable)
    # discrete A eigenvalues one inside/one outside the unit circle
    eig = np.abs(np.linalg.eigvals(np.asarray(lin.A)))
    assert eig.max() > 1.0 and eig.min() < 1.0
    estim = mpc.UnscentedKalmanFilter(msym, sigmaQ=[0.1, 1.0], sigmaR=[5.0],
                                      nint_ym=[1], sigmaQint_ym=[0.1])
    ctrl = mpc.NonLinMPC(estim, Hp=20, Hc=2, Mwt=[0.5], Nwt=[2.5],
                         Cwt=np.inf)
    ctrl.setconstraint(umin=[-1.5], umax=[1.5])
    res = mpc.sim(ctrl, 30, [180.0])
    assert abs(res.y_data[-1, 0] - 180.0) < 10.0


def test_symbolic_with_disturbance_and_errors():
    x1, u1, d1, a = sp.symbols("x1 u1 d1 a")
    m, info = nonlinmodel_from_sympy(
        {x1: -a * x1 + u1 + d1}, outputs=[2 * x1], Ts=0.5,
        inputs=[u1], disturbances=[d1], params={a: 0.5})
    assert (m.nu, m.nx, m.ny, m.nd) == (1, 1, 1, 1)
    m.updatestate([1.0], d=[0.3])
    # strictly-proper guard (reference mtk.md h! MethodError)
    with pytest.raises(ValueError, match="strictly proper"):
        nonlinmodel_from_sympy({x1: -x1 + u1}, outputs=[x1 + u1], Ts=0.5,
                               inputs=[u1])
    # unknown free symbol
    with pytest.raises(ValueError, match="free symbols"):
        nonlinmodel_from_sympy({x1: -a * x1 + u1}, outputs=[x1], Ts=0.5,
                               inputs=[u1])
    # non-symbol state key (algebraic / higher-order rejection)
    with pytest.raises(TypeError, match="first-order"):
        nonlinmodel_from_sympy({sp.Derivative(x1): -x1 + u1}, outputs=[x1],
                               Ts=0.5, inputs=[u1])
