"""In-graph successive-linearization MPC (SLMPC) tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mpc_tpu as mpc


def make_pendulum():
    def f(x, u, d, par):
        g, L, K, m = par
        return jnp.array([x[1], -g / L * jnp.sin(x[0]) - K / m * x[1]
                          + u[0] / (m * L ** 2)])

    h = lambda x, d, par: jnp.array([x[0] * 180 / jnp.pi])
    return mpc.NonLinModel(f, h, 0.1, 1, 2, 1, p=(9.8, 0.4, 1.2, 0.3),
                           solver=mpc.RungeKutta(4))


def test_slmpc_pendulum_swing_up():
    pend = make_pendulum()
    ctrl = mpc.SLMPC(pend, Hp=20, Hc=2, Mwt=[0.5], Nwt=[2.5],
                     sigmaQ=[0.1, 1.0], sigmaR=[5.0], sigmaQint_ym=[0.1])
    ctrl.setconstraint(umin=[-1.5], umax=[1.5])
    plant = make_pendulum()
    plant.setstate([0.0, 0.0])
    us = []
    for k in range(70):
        y = plant.evaloutput()
        u, conv = ctrl.moveinput_closed(y, np.array([180.0]))
        us.append(u[0])
        plant.updatestate(u)
    assert abs(plant.evaloutput()[0] - 180.0) < 2.0
    assert np.max(np.abs(us)) <= 1.5 + 1e-9


def test_slmpc_fleet_vmap():
    """The whole SLMPC step vmaps over a fleet with per-lane linearization."""
    pend = make_pendulum()
    ctrl = mpc.SLMPC(pend, Hp=15, Hc=2, Mwt=[0.5], Nwt=[2.5],
                     sigmaQ=[0.1, 1.0], sigmaR=[5.0], sigmaQint_ym=[0.1])
    ctrl.setconstraint(umin=[-1.5], umax=[1.5])
    B = 4
    step_v = jax.jit(jax.vmap(ctrl._make_step(), in_axes=(0, 0, 0, 0, None)))
    bounds = ctrl.bounds()
    st = jax.tree.map(lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim),
                      ctrl.state)
    rng = np.random.default_rng(0)
    X = jnp.stack([jnp.asarray(rng.uniform(-0.3, 0.3, B)), jnp.zeros(B)], 1)
    fv = jax.jit(jax.vmap(lambda x, u: pend.f(x, u, jnp.zeros(0), pend.p)))
    ry = jnp.full((B, 1), 90.0)
    d = jnp.zeros((B, 0))
    for k in range(40):
        ym = X[:, :1] * 180 / np.pi
        u, conv, st = step_v(st, ym, ry, d, bounds)
        assert np.all(np.abs(np.asarray(u)) <= 1.5 + 1e-9)
        X = fv(X, u)
    deg = np.asarray(X[:, 0]) * 180 / np.pi
    assert np.all(np.abs(deg - 90.0) < 10.0)


def test_slmpc_requires_nonlinmodel():
    m = mpc.LinModel(mpc.tf(1, [1, 1]), 1.0)
    with pytest.raises(TypeError):
        mpc.SLMPC(m)


def test_slmpc_fleet_chunked():
    """make_fleet_step chunks the vmap under lax.map: results must equal the
    plain vmapped step, and any B that is a chunk multiple runs."""
    pend = make_pendulum()
    ctrl = mpc.SLMPC(pend, Hp=15, Hc=2, Mwt=[0.5], Nwt=[2.5],
                     sigmaQ=[0.1, 1.0], sigmaR=[5.0], sigmaQint_ym=[0.1])
    ctrl.setconstraint(umin=[-1.5], umax=[1.5])
    B, CH = 8, 4
    bounds = ctrl.bounds()
    cstep = ctrl.make_fleet_step(B, chunk=CH)
    vstep = jax.jit(jax.vmap(ctrl._make_step(), in_axes=(0, 0, 0, 0, None)))
    st = ctrl.fleet_state(B)
    rng = np.random.default_rng(1)
    ym = jnp.asarray(rng.uniform(-20, 20, (B, 1)))
    ry = jnp.full((B, 1), 90.0)
    d = jnp.zeros((B, 0))
    u_c, conv_c, st_c = cstep(st, ym, ry, d, bounds)
    u_v, conv_v, st_v = vstep(st, ym, ry, d, bounds)
    assert np.allclose(np.asarray(u_c), np.asarray(u_v), atol=1e-10)
    assert np.array_equal(np.asarray(conv_c), np.asarray(conv_v))
    with pytest.raises(ValueError):
        ctrl.make_fleet_step(10, chunk=4)


def test_slmpc_active_set_solver():
    """SLMPC with the GI active-set QP matches the ADMM path and swings up."""

    def run(qp):
        sl = mpc.SLMPC(make_pendulum(), Hp=20, Hc=2, Mwt=[0.5], Nwt=[2.5],
                       sigmaQ=[0.1, 1.0], sigmaR=[5.0], sigmaQint_ym=[0.1],
                       qp_solver=qp)
        sl.setconstraint(umin=[-1.5], umax=[1.5])
        plant = make_pendulum()
        plant.setstate([0.0, 0.0])
        ry = jnp.asarray([180.0])
        us = []
        for k in range(40):
            y = plant.evaloutput()
            u, _ = sl.moveinput_closed(jnp.asarray(y), ry)
            us.append(float(u[0]))
            plant.updatestate(u)
        return np.array(us), float(y[0])

    ua, ya = run("admm")
    ub, yb = run("active_set")
    assert abs(ya - 180) < 2 and abs(yb - 180) < 2
    assert np.allclose(ua, ub, atol=1e-6)


def test_slmpc_operating_point_invariance():
    """Two op-point parameterizations of the SAME physics act identically
    (the deviation convention, sim_model.jl:50-125, applied to SLMPC)."""
    import jax.numpy as jnp
    from mpc_tpu.controllers.slmpc import SLMPC

    def f(x, u, d, par):
        g, L, K, m = par
        return jnp.array([x[1], -g / L * jnp.sin(x[0]) - K / m * x[1]
                          + u[0] / (m * L ** 2)])
    h = lambda x, d, par: jnp.array([x[0] * 180 / jnp.pi])
    p = (9.8, 0.4, 1.2, 0.3)
    uop, yop = 0.5, 30.0
    # same physics expressed around (uop, yop): absolute u and y agree
    fB = lambda x, u0, d, par: f(x, jnp.asarray(u0) + uop, d, par)
    hB = lambda x, d, par: h(x, d, par) - yop

    mA = mpc.NonLinModel(f, h, 0.1, 1, 2, 1, p=p, solver=mpc.RungeKutta(4))
    mB = mpc.NonLinModel(fB, hB, 0.1, 1, 2, 1, p=p, solver=mpc.RungeKutta(4))
    mB.setop(uop=[uop], yop=[yop])

    def mk(m):
        c = SLMPC(m, Hp=15, Hc=2, Mwt=[0.5], Nwt=[2.5], sigmaQ=[0.1, 1.0],
                  sigmaR=[5.0], nint_ym=[1], sigmaQint_ym=[0.1],
                  qp_solver="active_set")
        c.setconstraint(umin=[-1.5], umax=[1.5])
        return c
    cA, cB = mk(mA), mk(mB)
    plant = mpc.NonLinModel(f, h, 0.1, 1, 2, 1, p=p,
                            solver=mpc.RungeKutta(4))
    ry = np.array([120.0])
    for k in range(25):
        y = plant.evaloutput()          # absolute measurement
        uA, _ = cA.moveinput_closed(y, ry)
        uB, _ = cB.moveinput_closed(y, ry)
        assert np.allclose(uA, uB, atol=1e-7), k
        plant.updatestate(uA)


def test_slmpc_setstate_getstate():
    import jax.numpy as jnp
    from mpc_tpu.controllers.slmpc import SLMPC

    def f(x, u, d, par):
        return jnp.array([x[1], -jnp.sin(x[0]) - x[1] + u[0]])
    h = lambda x, d, par: jnp.array([x[0]])
    m = mpc.NonLinModel(f, h, 0.1, 1, 2, 1, solver=mpc.RungeKutta(4))
    c = SLMPC(m, Hp=5, Hc=2)
    c.setstate([0.3, -0.1, 0.05])
    assert np.allclose(c.getstate(), [0.3, -0.1, 0.05])
    import pytest as _pt
    with _pt.raises(NotImplementedError):
        c.preparestate([0.0])
