"""QP solver tests: cross-checked against scipy reference solutions."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mpc_tpu.ops import solve_qp, solve_qp_batch

BIG = 1e20


def scipy_qp(P, q, A, l, u):
    """Reference solution via scipy.optimize.minimize with constraints."""
    from scipy.optimize import LinearConstraint, minimize
    n = len(q)
    cons = [LinearConstraint(A, l, u)]
    r = minimize(lambda x: 0.5 * x @ P @ x + q @ x, np.zeros(n),
                 jac=lambda x: P @ x + q, constraints=cons, method="SLSQP",
                 options={"maxiter": 500, "ftol": 1e-12})
    return r.x


def random_qp(rng, n, m, n_eq=0):
    H = rng.normal(size=(n, n))
    P = H @ H.T + n * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    x_feas = rng.normal(size=n) * 0.1
    margin = rng.uniform(0.05, 1.0, size=m)
    Ax = A @ x_feas
    l = Ax - margin
    u = Ax + margin
    # one-sided rows
    one_sided = rng.random(m) < 0.3
    l = np.where(one_sided, -BIG, l)
    for i in range(n_eq):
        l[i] = u[i] = Ax[i]
    return P, q, A, l, u


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_qp_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    P, q, A, l, u = random_qp(rng, n=6, m=10, n_eq=2)
    sol = solve_qp(jnp.asarray(P), jnp.asarray(q), jnp.asarray(A),
                   jnp.asarray(l), jnp.asarray(u))
    x_ref = scipy_qp(P, q, A, l, u)
    assert bool(sol.converged)
    assert np.allclose(np.asarray(sol.x), x_ref, atol=1e-6)
    # feasibility
    Ax = A @ np.asarray(sol.x)
    assert np.all(Ax <= u + 1e-7) and np.all(Ax >= l - 1e-7)


def test_unconstrained():
    rng = np.random.default_rng(7)
    P, q, _, _, _ = random_qp(rng, 5, 1)
    A = np.zeros((1, 5))
    l, u = np.array([-BIG]), np.array([BIG])
    sol = solve_qp(jnp.asarray(P), jnp.asarray(q), jnp.asarray(A),
                   jnp.asarray(l), jnp.asarray(u))
    assert np.allclose(np.asarray(sol.x), np.linalg.solve(P, -q), atol=1e-6)


def test_equality_only():
    P = np.eye(2)
    q = np.array([-1.0, -1.0])
    A = np.array([[1.0, 1.0]])
    l = u = np.array([1.0])
    sol = solve_qp(jnp.asarray(P), jnp.asarray(q), jnp.asarray(A),
                   jnp.asarray(l), jnp.asarray(u))
    assert np.allclose(np.asarray(sol.x), [0.5, 0.5], atol=1e-8)


def test_active_box():
    # min ½||x||² - 10 x1 s.t. x1 ≤ 2 → x = (2, 0)
    P = np.eye(2)
    q = np.array([-10.0, 0.0])
    A = np.array([[1.0, 0.0]])
    l, u = np.array([-BIG]), np.array([2.0])
    sol = solve_qp(jnp.asarray(P), jnp.asarray(q), jnp.asarray(A),
                   jnp.asarray(l), jnp.asarray(u))
    assert np.allclose(np.asarray(sol.x), [2.0, 0.0], atol=1e-8)
    # exact saturation thanks to polish
    assert abs(float(sol.x[0]) - 2.0) < 1e-9


def test_warm_start_speeds_up():
    rng = np.random.default_rng(11)
    P, q, A, l, u = random_qp(rng, 8, 14)
    Pj, qj, Aj, lj, uj = map(jnp.asarray, (P, q, A, l, u))
    s1 = solve_qp(Pj, qj, Aj, lj, uj)
    s2 = solve_qp(Pj, qj, Aj, lj, uj, x0=s1.x, y0=s1.y)
    assert int(s2.iters) <= int(s1.iters)
    assert np.allclose(np.asarray(s1.x), np.asarray(s2.x), atol=1e-7)


def test_batched_vmap():
    rng = np.random.default_rng(5)
    B, n, m = 16, 5, 8
    Ps, qs, As, ls, us = [], [], [], [], []
    for _ in range(B):
        P, q, A, l, u = random_qp(rng, n, m)
        Ps.append(P); qs.append(q); As.append(A); ls.append(l); us.append(u)
    Ps, qs, As, ls, us = map(lambda a: jnp.asarray(np.stack(a)),
                             (Ps, qs, As, ls, us))
    sols = solve_qp_batch(Ps, qs, As, ls, us)
    assert sols.x.shape == (B, n)
    for i in range(B):
        x_ref = scipy_qp(np.asarray(Ps[i]), np.asarray(qs[i]), np.asarray(As[i]),
                         np.asarray(ls[i]), np.asarray(us[i]))
        assert np.allclose(np.asarray(sols.x[i]), x_ref, atol=1e-5), i


def test_jit_compiles():
    rng = np.random.default_rng(9)
    P, q, A, l, u = random_qp(rng, 4, 6)
    f = jax.jit(lambda *args: solve_qp(*args).x)
    x1 = f(jnp.asarray(P), jnp.asarray(q), jnp.asarray(A), jnp.asarray(l),
           jnp.asarray(u))
    x_ref = scipy_qp(P, q, A, l, u)
    assert np.allclose(np.asarray(x1), x_ref, atol=1e-6)


# ---------------------------------------------------------------------------
# Goldfarb–Idnani dual active set (ops/qp_active.py — the DAQP role,
# reference benchmark/3_bench_predictive_control.jl:166-215)

def test_active_set_random_matches_scipy():
    from mpc_tpu.ops.qp_active import solve_qp_active
    rng = np.random.default_rng(17)
    for trial in range(12):
        n = int(rng.integers(2, 9))
        m = int(rng.integers(3, 30))
        P, q, A, l, u = random_qp(rng, n, m)
        sol = solve_qp_active(jnp.asarray(P), jnp.asarray(q), jnp.asarray(A),
                              jnp.asarray(l), jnp.asarray(u))
        assert bool(sol.converged), trial
        x_ref = scipy_qp(P, q, A, l, u)
        assert np.allclose(np.asarray(sol.x), x_ref, atol=1e-6), trial


def test_active_set_exactness_vs_admm():
    """GI terminates on the exact optimum — agreement with polished ADMM
    should be near machine precision, and the KKT residual ~0."""
    from mpc_tpu.ops.qp_active import solve_qp_active
    rng = np.random.default_rng(23)
    P, q, A, l, u = random_qp(rng, 6, 24)
    args = tuple(map(jnp.asarray, (P, q, A, l, u)))
    s_gi = solve_qp_active(*args)
    s_ad = solve_qp(*args)
    assert np.allclose(np.asarray(s_gi.x), np.asarray(s_ad.x), atol=1e-9)
    # stationarity: Px + q + Aᵀy = 0
    r = P @ np.asarray(s_gi.x) + q + A.T @ np.asarray(s_gi.y)
    assert np.max(np.abs(r)) < 1e-9


def test_active_set_unconstrained_and_vmap():
    from mpc_tpu.ops.qp_active import solve_qp_active
    rng = np.random.default_rng(29)
    n, m, B = 4, 7, 8
    P, q, A, l, u = random_qp(rng, n, m)
    loose = solve_qp_active(jnp.asarray(P), jnp.asarray(q), jnp.asarray(A),
                            jnp.full(m, -BIG), jnp.full(m, BIG))
    assert np.allclose(np.asarray(loose.x), -np.linalg.solve(P, q), atol=1e-10)
    # vmap over a batch of right-hand sides
    qs = jnp.asarray(rng.normal(size=(B, n)))
    f = jax.vmap(lambda qq: solve_qp_active(
        jnp.asarray(P), qq, jnp.asarray(A), jnp.asarray(l),
        jnp.asarray(u)).x)
    xs = f(qs)
    for i in range(B):
        assert np.allclose(np.asarray(xs[i]),
                           scipy_qp(P, np.asarray(qs[i]), A, l, u), atol=1e-6)


def test_active_set_warm_start():
    """Warm-starting GI from a previous solve's duals reproduces the optimum
    in one cheap lockstep iteration per active row (warm-build) plus the
    KKT-jump and one optimality scan; a garbage warm start still converges
    exactly."""
    from mpc_tpu.ops.qp_active import solve_qp_active
    rng = np.random.default_rng(31)
    P, q, A, l, u = random_qp(rng, 5, 20)
    args = tuple(map(jnp.asarray, (P, q, A, l, u)))
    cold = solve_qp_active(*args)
    warm = solve_qp_active(*args, y0=cold.y)
    junk = solve_qp_active(*args, y0=jnp.asarray(rng.normal(size=20)))
    n_act = int(np.sum(np.abs(np.asarray(cold.y)) > 1e-12))
    # warm cost: one insert per active row + KKT jump + optimality scan
    # (the fused select+pivot body makes cold solves cheap too, so the
    # meaningful bound is absolute, not warm-vs-cold)
    assert int(warm.iters) <= n_act + 3
    assert np.allclose(np.asarray(warm.x), np.asarray(cold.x), atol=1e-9)
    assert np.allclose(np.asarray(junk.x), np.asarray(cold.x), atol=1e-8)
    assert bool(warm.converged) and bool(junk.converged)


def test_qp_zero_constraint_row():
    """An all-zero A row (flat constraint Jacobian) must not blow up the
    Ruiz scaling (1e6x/iteration compounding) or poison the solve."""
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    n, m = 4, 6
    M = rng.normal(size=(n, n))
    P = M @ M.T + np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    A[2] = 0.0                      # zero row, satisfied bounds
    l = np.full(m, -5.0); u = np.full(m, 5.0)
    sol = solve_qp(jnp.asarray(P), jnp.asarray(q), jnp.asarray(A),
                   jnp.asarray(l), jnp.asarray(u))
    assert bool(sol.converged)
    assert np.all(np.isfinite(np.asarray(sol.x)))
    ref = scipy_qp(P, q, A, l, u)
    assert np.allclose(np.asarray(sol.x), ref, atol=1e-5)
    # f32 path must also survive
    sol32 = solve_qp(jnp.asarray(P, jnp.float32), jnp.asarray(q, jnp.float32),
                     jnp.asarray(A, jnp.float32), jnp.asarray(l, jnp.float32),
                     jnp.asarray(u, jnp.float32))
    assert np.all(np.isfinite(np.asarray(sol32.x)))


def test_active_set_f32():
    """GI in float32: tolerance floor above f32 roundoff; exact-set result."""
    from mpc_tpu.ops.qp_active import solve_qp_active
    rng = np.random.default_rng(3)
    n, m = 4, 10
    M = rng.normal(size=(n, n)); P = M @ M.T + np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    l = np.full(m, -0.5); u = np.full(m, 0.5)
    ref = scipy_qp(P, q, A, l, u)
    s32 = solve_qp_active(jnp.asarray(P, jnp.float32),
                          jnp.asarray(q, jnp.float32),
                          jnp.asarray(A, jnp.float32),
                          jnp.asarray(l, jnp.float32),
                          jnp.asarray(u, jnp.float32))
    assert bool(s32.converged)
    assert np.allclose(np.asarray(s32.x), ref, atol=5e-4)


def test_active_set_max_active_cap():
    """Slot-buffer cap (max_active): exact when the true active set fits,
    honest converged=False when it overflows — never a silently suboptimal
    'converged' answer."""
    from mpc_tpu.ops.qp_active import build_gi_cache, solve_qp_active
    rng = np.random.default_rng(11)
    n, m = 10, 24
    M = rng.normal(size=(n, n)); P = M @ M.T + n * np.eye(n)
    q = rng.normal(size=n) * 2
    A = rng.normal(size=(m, n))
    # box the solution loosely so only a FEW rows are active
    x_un = np.linalg.solve(P, -q)
    c = A @ x_un
    l = c - np.abs(rng.normal(size=m)) - 0.05
    u = c + np.abs(rng.normal(size=m)) + 0.05
    u[:3] = c[:3] - 0.3            # force ~3 upper rows active
    l[:3] = u[:3] - 5.0
    ref = scipy_qp(P, q, A, l, u)
    n_act = int(np.sum((np.abs(A @ ref - l) < 1e-7)
                       | (np.abs(A @ ref - u) < 1e-7)))
    assert 1 <= n_act <= 6
    cache = build_gi_cache(P, A)
    for cap in (None, 8):
        s = solve_qp_active(jnp.asarray(P), jnp.asarray(q), jnp.asarray(A),
                            jnp.asarray(l), jnp.asarray(u), cache=cache,
                            max_active=cap)
        assert bool(s.converged), cap
        assert np.allclose(np.asarray(s.x), ref, atol=1e-6), cap
        ns = cap or n
        assert s.gi_state["gis_Ginv"].shape == (ns, ns)
    # overflow: cap below the true active-set size must refuse
    tight = solve_qp_active(jnp.asarray(P), jnp.asarray(q), jnp.asarray(A),
                            jnp.asarray(l), jnp.asarray(u), cache=cache,
                            max_active=max(1, n_act - 1))
    assert not bool(tight.converged)


def test_active_set_cap_overflow_from_warm_start_pollution():
    """A slot buffer filled with STALE warm-start rows must not make the
    capped solve refuse an optimum that fits the cap: the first overflow
    spends the one-shot cold restart (clearing the polluted slots), and
    only a post-restart overflow reports converged=False."""
    from mpc_tpu.ops.qp_active import build_gi_cache, solve_qp_active
    rng = np.random.default_rng(7)
    n, m = 8, 20
    M = rng.normal(size=(n, n)); P = M @ M.T + n * np.eye(n)
    q = rng.normal(size=n) * 2
    A = rng.normal(size=(m, n))
    x_un = np.linalg.solve(P, -q)
    c = A @ x_un
    l = c - np.abs(rng.normal(size=m)) - 1.0
    u = c + np.abs(rng.normal(size=m)) + 1.0
    u[0] = c[0] - 0.4
    l[0] = u[0] - 5.0                       # exactly one active row
    ref = scipy_qp(P, q, A, l, u)
    act = np.sum((np.abs(A @ ref - l) < 1e-7) | (np.abs(A @ ref - u) < 1e-7))
    assert act <= 2
    cache = build_gi_cache(P, A)
    y0 = np.zeros(m)
    y0[5] = 3.0
    y0[9] = 2.5                             # inert-row pollution fills cap=2
    s = solve_qp_active(jnp.asarray(P), jnp.asarray(q), jnp.asarray(A),
                        jnp.asarray(l), jnp.asarray(u), y0=jnp.asarray(y0),
                        cache=cache, max_active=2)
    assert bool(s.converged)
    assert np.allclose(np.asarray(s.x), ref, atol=1e-6)
    # a GENUINELY over-cap active set must still refuse post-restart
    u2 = u.copy(); u2[:4] = c[:4] - 0.3
    l2 = l.copy(); l2[:4] = u2[:4] - 5.0
    ref2 = scipy_qp(P, q, A, l2, u2)
    act2 = np.sum((np.abs(A @ ref2 - l2) < 1e-7)
                  | (np.abs(A @ ref2 - u2) < 1e-7))
    assert act2 >= 3
    s2 = solve_qp_active(jnp.asarray(P), jnp.asarray(q), jnp.asarray(A),
                         jnp.asarray(l2), jnp.asarray(u2), cache=cache,
                         max_active=2)
    assert not bool(s2.converged)
