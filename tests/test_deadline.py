"""Ts-deadline solve policy (the reference's `limit_solve_time` analogue,
src/general.jl:109-121): every solve can be capped at an iteration budget
derived from the sampling time, and an overrun raises `deadline_miss`."""
import numpy as np
import pytest

import jax.numpy as jnp

import mpc_tpu as mpc
from mpc_tpu.ops import solve_qp


def _hard_qp(n=20, m=60, seed=3):
    """A QP that needs well over 100 ADMM iterations (ill-scaled, many
    active rows)."""
    rng = np.random.default_rng(seed)
    H = rng.normal(size=(n, n))
    scales = np.logspace(-2, 2, n)
    P = (H * scales) @ (H * scales).T + 1e-3 * np.eye(n)
    q = rng.normal(size=n) * 10
    A = rng.normal(size=(m, n))
    x_f = rng.normal(size=n) * 0.05
    Ax = A @ x_f
    l = Ax - rng.uniform(0.01, 0.1, m)
    u = Ax + rng.uniform(0.01, 0.1, m)
    return P, q, A, l, u


def test_iter_budget_caps_solver_iterations():
    """A runtime (traced) iter_budget stops the ADMM loop at the budget
    boundary without retracing — the mechanism the Ts policy rides on."""
    P, q, A, l, u = map(jnp.asarray, _hard_qp())
    free = solve_qp(P, q, A, l, u, scaling=0)      # unscaled: many iters
    assert int(free.iters) > 60
    capped = solve_qp(P, q, A, l, u, scaling=0,
                      iter_budget=jnp.asarray(30, jnp.int32))
    # the loop tests the budget every check_every=10 iterations
    assert int(capped.iters) <= 40
    # explicit max_iter is still honoured as the static bound
    capped2 = solve_qp(P, q, A, l, u, scaling=0, max_iter=20)
    assert int(capped2.iters) <= 20


def test_linmpc_deadline_policy_caps_and_flags():
    """With limit_solve_time=True, a Ts far below the achievable solve time
    (1) derives a finite iteration budget from the measured per-iteration
    cost, (2) caps the QP iterations at it, and (3) flags deadline_miss —
    the reference caps wall time via the solver's time limit
    (general.jl:109-121); here the budget is iterations (jit-safe data)."""
    G = mpc.ss(np.diag([0.6, 0.5, 0.7, 0.4]), np.eye(4), np.eye(4),
               np.zeros((4, 4)), 1e-6)
    m = mpc.LinModel(G, 1e-6)   # Ts = 1 µs: unmeetable on any host
    c = mpc.LinMPC(m, Hp=10, Hc=4, Mwt=np.ones(4), Nwt=np.full(4, 0.1),
                   Cwt=1e3, limit_solve_time=True)
    c.setconstraint(umin=np.full(4, -0.3), umax=np.full(4, 0.3),
                    ymin=np.full(4, -0.2), ymax=np.full(4, 0.2))
    ry = np.full(4, 5.0)   # far outside the feasible band: many iterations
    for k in range(3):
        c.estim.preparestate(np.full(4, 0.1 * k))
        c.moveinput(ry=-ry if k % 2 else ry)
        c.estim.updatestate(c.getinfo()["u"], np.full(4, 0.1 * k))
    info = c.getinfo()
    # after the first measured step the EWMA exists and the budget is finite
    assert c._iter_cost is not None and c._iter_cost > 0
    assert info["iter_budget"] < 2**30
    # Ts = 1 µs → the budget clamps to its floor of 50 iterations and the
    # solve demonstrably respects it (+check_every slack)
    assert info["iter_budget"] == 50
    assert info["iters"] <= 60
    assert info["deadline_miss"] is True
    assert info["solve_time"] > m.Ts


def test_linmpc_deadline_policy_no_miss_when_fast():
    """A generous Ts never caps iterations nor flags a miss."""
    G = mpc.ss(np.array([[0.5]]), np.array([[1.0]]), np.array([[1.0]]),
               np.array([[0.0]]), 50.0)
    m = mpc.LinModel(G, 50.0)
    c = mpc.LinMPC(m, Hp=5, Hc=2, limit_solve_time=True)
    for k in range(3):
        c.estim.preparestate([0.0])
        c.moveinput(ry=[1.0])
        c.estim.updatestate(c.getinfo()["u"], [0.0])
    info = c.getinfo()
    assert info["deadline_miss"] is False
    assert info["converged"]


def test_batched_fleet_deadline_stats():
    """BatchedLinMPC(limit_solve_time=True) records per-step wall time and
    the miss counter (the fleet-serving surface of the Ts policy)."""
    from mpc_tpu.parallel import BatchedLinMPC
    G = mpc.ss(np.array([[0.5]]), np.array([[1.0]]), np.array([[1.0]]),
               np.array([[0.0]]), 1e-6)
    ctrls = [mpc.LinMPC(mpc.LinModel(G, 1e-6), Hp=5, Hc=2) for _ in range(2)]
    bat = BatchedLinMPC(ctrls, reps=2, limit_solve_time=True)
    for k in range(3):
        bat.step(jnp.full((4, 1), 0.1 * k), jnp.ones((4, 1)))
    assert bat.last_step_time is not None and bat.last_step_time > 0
    # Ts = 1 µs: every post-first step is a miss
    assert bat.last_deadline_miss is True
    assert bat.deadline_miss_count >= 1
    assert bat.last_iter_budget >= 50


def test_multistep_deadline_in_graph():
    """The serving scan's Ts policy is IN-GRAPH: the iteration budget is
    derived inside the dispatch from the host-measured per-iteration cost
    EWMA, and per-period misses are estimated without a per-step host sync
    (the per-step sync cost a tunnel RTT per period on the remote rig)."""
    from mpc_tpu.parallel import BatchedLinMPC
    G = mpc.ss(np.diag([0.6, 0.5]), np.eye(2), np.eye(2),
               np.zeros((2, 2)), 1e-6)
    ctrls = [mpc.LinMPC(mpc.LinModel(G, 1e-6), Hp=8, Hc=3,
                        Cwt=1e3) for _ in range(2)]
    for c in ctrls:
        c.setconstraint(umin=np.full(2, -0.3), umax=np.full(2, 0.3),
                        ymin=np.full(2, -0.2), ymax=np.full(2, 0.2))
    bat = BatchedLinMPC(ctrls, reps=2, limit_solve_time=True)
    B = bat.B
    rng = np.random.default_rng(31)
    K = 4
    ym_s = rng.normal(size=(K, B, 2)) * 0.1
    ry_s = np.tile(np.array([5.0, -5.0]), (K, B, 1))  # infeasible: many iters
    # dispatch 1 includes compile (neither EWMA nor misses); dispatch 2
    # seeds the per-iteration cost EWMA (policy still off in-graph)
    U, NC = bat.multistep(ym_s, ry_s)
    assert U.shape == (K, B, 2)
    U, NC = bat.multistep(ym_s, ry_s)
    assert bat._iter_cost is not None and bat._iter_cost > 0
    n0 = bat.deadline_miss_count
    # dispatch 3: policy ON in-graph; Ts = 1 µs is unmeetable → every
    # period estimated as a miss, counted from ONE host sync per dispatch
    U, NC = bat.multistep(ym_s, ry_s)
    assert bat.deadline_miss_count - n0 == K
    assert bat.last_deadline_miss is True
    # and the derived budget clamps the solver (floor 50 + check slack)
    it_max = float(np.asarray(bat.last_iters)[0])
    assert it_max <= 80
