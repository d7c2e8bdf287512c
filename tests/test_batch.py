"""Batched pipeline tests (parallel/)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mpc_tpu as mpc
from mpc_tpu.parallel import (BatchedLinMPC, BatchedNonLinMPC,
                              random_cstr_controllers)


def test_batched_linmpc_matches_single():
    """The vmapped pipeline reproduces the single-controller path."""
    ctrls = random_cstr_controllers(4, Hp=10, Hc=2, seed=0)
    bat = BatchedLinMPC(ctrls)
    B = bat.B
    rng = np.random.default_rng(2)
    ym = rng.normal(size=(B, 2)) * 0.5
    ry = rng.normal(size=(B, 2))
    u_b, n_conv = bat.step(jnp.asarray(ym), jnp.asarray(ry))
    assert int(n_conv) == B
    for i in range(B):
        c = ctrls[i]
        c.preparestate(ym[i])
        u_s = c.moveinput(ry[i])
        assert np.allclose(np.asarray(u_b[i]), u_s, atol=1e-6), i


def test_batched_linmpc_sharded():
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("batch",))
    ctrls = random_cstr_controllers(8, Hp=8, Hc=2, seed=1)
    bat = BatchedLinMPC(ctrls, mesh=mesh)
    u, n_conv = bat.step(jnp.zeros((8, 2)), jnp.ones((8, 2)))
    assert int(n_conv) == 8
    assert "batch" in str(u.sharding)


def test_batched_mhe_matches_singles():
    """Vmapped MHE fleet reproduces per-stream single MHEs exactly."""
    from mpc_tpu.parallel import BatchedMHE
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    tmpl = mpc.MovingHorizonEstimator(m, He=4)
    B = 4
    bat = BatchedMHE(tmpl, B)
    singles = [mpc.MovingHorizonEstimator(m, He=4) for _ in range(B)]
    rng = np.random.default_rng(0)
    u_prev = np.zeros((B, 1))
    for k in range(8):
        ym = rng.normal(size=(B, 1))
        xb = bat.step(ym, u_prev)
        xs = np.array([singles[i].preparestate(ym[i]) for i in range(B)])
        assert np.allclose(xb, xs, atol=1e-8), k
        u_prev = rng.normal(size=(B, 1)) * 0.2
        for i in range(B):
            singles[i].updatestate(u_prev[i], ym[i])


def test_batched_mhe_nan_fallback_and_bounds():
    """A NaN measurement step routes through the per-lane H̃-downdate fast
    variant (diag invR; round-5 — previously the WHOLE fleet de-fast-pathed
    to the general solver for He steps), then returns to the zero-overhead
    clean path once the NaN drains out of the window — estimates keep
    matching the per-stream single MHEs (which NaN-mask exactly)
    throughout, and constrained lanes respect the x̂ bounds."""
    from mpc_tpu.parallel import BatchedMHE
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    tmpl = mpc.MovingHorizonEstimator(m, He=3)
    tmpl.setconstraint(xhatmin=[-0.2] * tmpl.nx_hat,
                       xhatmax=[0.2] * tmpl.nx_hat)
    B = 3
    bat = BatchedMHE(tmpl, B)
    assert bat._fast
    def mk():
        s = mpc.MovingHorizonEstimator(m, He=3)
        s.setconstraint(xhatmin=[-0.2] * s.nx_hat, xhatmax=[0.2] * s.nx_hat)
        return s
    singles = [mk() for _ in range(B)]
    rng = np.random.default_rng(5)
    u_prev = np.zeros((B, 1))
    for k in range(10):
        ym = rng.normal(size=(B, 1))
        if k == 4:
            ym[1, 0] = np.nan        # sensor dropout on one lane
        xb = bat.step(ym, u_prev)
        xs = np.array([singles[i].preparestate(ym[i]) for i in range(B)])
        assert np.allclose(xb, xs, atol=1e-7), k
        assert np.all(np.asarray(xb) <= 0.2 + 1e-7), k
        expected_guard = max(0, 3 - (k - 4)) if k >= 4 else 0
        assert bat._nan_guard == expected_guard, k
        u_prev = rng.normal(size=(B, 1)) * 0.2
        for i in range(B):
            singles[i].updatestate(u_prev[i], ym[i])


def test_batched_nonlinmpc_fleet():
    """A fleet of nonlinear MPC problems steps in lockstep."""
    def f(x, u, d, par):
        g, L, K, m = par
        return jnp.array([x[1], -g / L * jnp.sin(x[0]) - K / m * x[1]
                          + u[0] / (m * L ** 2)])

    h = lambda x, d, par: jnp.array([x[0] * 180 / jnp.pi])
    pend = mpc.NonLinModel(f, h, 0.1, 1, 2, 1, p=(9.8, 0.4, 1.2, 0.3),
                           solver=mpc.RungeKutta(4))
    estim = mpc.UnscentedKalmanFilter(pend, sigmaQ=[0.1, 1.0], sigmaR=[5.0],
                                      nint_ym=[1], sigmaQint_ym=[0.1])
    ctrl = mpc.NonLinMPC(estim, Hp=15, Hc=2, Mwt=[0.5], Nwt=[2.5],
                         Cwt=np.inf, sqp_iters=8)
    ctrl.setconstraint(umin=[-1.5], umax=[1.5])
    B = 4
    fleet = BatchedNonLinMPC(ctrl, B)
    ry = np.full((B, 1), 30.0)      # modest setpoint, few steps
    fv = jax.jit(jax.vmap(lambda x, u: pend.f(x, u, jnp.zeros(0), pend.p)))
    X = jnp.zeros((B, 2))
    for k in range(12):
        ym = np.asarray(X[:, 0] * 180 / np.pi)[:, None]
        u, J = fleet.step(jnp.asarray(ym), jnp.asarray(ry))
        assert np.all(np.abs(np.asarray(u)) <= 1.5 + 1e-6)
        X = fv(X, u)
    deg = np.asarray(X[:, 0]) * 180 / np.pi
    assert np.all(np.abs(deg - 30.0) < 15.0)   # heading to the setpoint


def test_batched_kalman_matches_single():
    """BatchedKalman (SKF and KF fleets) reproduces the single-estimator
    protocol exactly across heterogeneous streams."""
    import jax.numpy as jnp
    from mpc_tpu.parallel import BatchedKalman

    G = np.array([[mpc.tf(3, [10, 1])], [mpc.tf(-1, [4, 1])]], dtype=object)
    rng = np.random.default_rng(7)

    def mk(kind, i):
        m = mpc.LinModel(G, 1.0)
        m.setop(uop=[float(i)], yop=[0.0, 0.0])
        return kind(m, sigmaQ=[0.4 + 0.1 * i] * m.nx, sigmaR=[0.2, 0.3])

    for kind in (mpc.SteadyKalmanFilter, mpc.KalmanFilter):
        singles = [mk(kind, i) for i in range(3)]
        fleet = BatchedKalman([mk(kind, i) for i in range(3)], reps=2)
        assert fleet.B == 6
        for k in range(8):
            ym = rng.normal(size=(3, 2))
            u = rng.normal(size=(3, 1))
            xs = []
            for i, e in enumerate(singles):
                xc = e.preparestate(ym[i])
                e.updatestate(u[i], ym[i])
                xs.append(xc)
            xf = np.asarray(fleet.step(np.tile(ym, (2, 1)),
                                       np.tile(u, (2, 1))))
            assert np.allclose(xf[:3], np.stack(xs), atol=1e-9), (kind, k)
            assert np.allclose(xf[3:], np.stack(xs), atol=1e-9)


def test_gi_fleet_serving_stability():
    """Long-run regression guard for the GI carried-operator machinery:
    a 40-step rotating-setpoint f32 fleet on stiff 4x4 plants must stay
    fully converged with a bounded lockstep pivot count (the round-3
    failure modes — stale-slot accumulation, f32 degeneracy cycles, false
    infeasibility certificates — all grew over serving steps)."""
    from mpc_tpu.parallel import BatchedLinMPC
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    ctrls = []
    for _ in range(4):
        A = np.diag(rng.uniform(0.45, 0.8, 4)) + rng.normal(size=(4, 4)) * 0.02
        A *= min(1.0, 0.85 / np.max(np.abs(np.linalg.eigvals(A))))
        model = mpc.LinModel(mpc.ss(A, np.eye(4) + 0.5 * rng.normal(size=(4, 4)),
                                    np.eye(4), np.zeros((4, 4)), 2.0), 2.0)
        c = mpc.LinMPC(model, Hp=10, Hc=3, Mwt=np.ones(4), Nwt=np.ones(4),
                       Cwt=1e3, qp_solver="active_set")
        c.setconstraint(umin=np.full(4, -10.0), umax=np.full(4, 10.0),
                        dumin=np.full(4, -4.0), dumax=np.full(4, 4.0),
                        ymin=np.full(4, -60.0), ymax=np.full(4, 60.0))
        ctrls.append(c)
    B = 128
    bat = BatchedLinMPC(ctrls, dtype=jnp.float32, reps=B // 4)
    ym0 = rng.normal(size=(B, 4)) * 0.5
    ry0 = rng.normal(size=(B, 4)) * 2.0
    seq = [(jnp.asarray(ym0 + rng.normal(size=(B, 4)) * 0.1, jnp.float32),
            jnp.asarray(ry0 + rng.normal(size=(B, 4)) * 0.2, jnp.float32))
           for _ in range(4)]
    worst = 0
    for k in range(40):
        u, nc = bat.step(*seq[k % 4])
        it = np.asarray(bat.last_iters)
        worst = max(worst, int(it[0]))
        assert int(nc) == B, (k, int(nc))
    assert worst < 60, worst


def test_batched_mhe_gi_cap_matches_uncapped():
    """gi_max_active-capped BatchedMHE reproduces the uncapped fleet exactly
    while lanes' true active sets fit the cap."""
    from mpc_tpu.parallel import BatchedMHE
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    def mk():
        t = mpc.MovingHorizonEstimator(m, He=4)
        # bound ONE state component so the active set stays ≤ He+1 ≤ cap
        t.setconstraint(xhatmin=[-0.25, -np.inf], xhatmax=[0.25, np.inf])
        return t
    B = 4
    full = BatchedMHE(mk(), B)
    capped = BatchedMHE(mk(), B, gi_max_active=8)
    rng = np.random.default_rng(7)
    u_prev = np.zeros((B, 1))
    for k in range(8):
        ym = rng.normal(size=(B, 1))
        xa = full.step(ym, u_prev)
        xb = capped.step(ym, u_prev)
        assert np.allclose(np.asarray(xa), np.asarray(xb), atol=1e-9), k
        assert int(np.asarray(capped.last_ok).sum()) == B, k
        u_prev = rng.normal(size=(B, 1)) * 0.2


def test_batched_linmpc_gi_cap_matches_uncapped():
    """gi_max_active-capped LinMPC fleet matches the uncapped one."""
    ctrls_a = random_cstr_controllers(4, Hp=8, Hc=2, seed=4,
                                      qp_solver="active_set")
    ctrls_b = random_cstr_controllers(4, Hp=8, Hc=2, seed=4,
                                      qp_solver="active_set")
    for c in ctrls_b:
        # rebuild with a slot cap (same plants/weights via seed)
        c.gi_max_active = 3
        c.gi_slots = min(c.n_qp, 3)
        c._build()
    bat_a = BatchedLinMPC(ctrls_a)
    bat_b = BatchedLinMPC(ctrls_b)
    rng = np.random.default_rng(2)
    for k in range(4):
        ym = rng.normal(size=(4, 2)) * 0.5
        ry = rng.normal(size=(4, 2))
        ua, na = bat_a.step(jnp.asarray(ym), jnp.asarray(ry))
        ub, nb = bat_b.step(jnp.asarray(ym), jnp.asarray(ry))
        assert int(na) == 4 and int(nb) == 4, k
        assert np.allclose(np.asarray(ua), np.asarray(ub), atol=1e-7), k


def test_batched_mhe_measured_disturbances():
    """BatchedMHE with nd > 0: per-step d enters window slot i+1 exactly as
    the single-stream add_data_windows! protocol — fleet matches per-stream
    singles through a d-driven transient (incl. nonzero dop)."""
    from mpc_tpu.parallel import BatchedMHE
    G = np.array([[mpc.tf(1.9, [18, 1]), mpc.tf(1.9, [18, 1])],
                  [mpc.tf(-0.74, [8, 1]), mpc.tf(0.74, [8, 1])]],
                 dtype=object)
    def mk():
        m = mpc.LinModel(G, 2.0, i_d=[1])
        m.setop(uop=[10], yop=[50, 30], dop=[20])
        return mpc.MovingHorizonEstimator(m, He=3, nint_ym=0)
    B = 3
    bat = BatchedMHE(mk(), B)
    assert bat._fast
    singles = [mk() for _ in range(B)]
    rng = np.random.default_rng(11)
    u_prev = np.full((B, 1), 10.0)
    for k in range(8):
        ym = np.array([50.0, 30.0]) + rng.normal(size=(B, 2))
        d = np.full((B, 1), 20.0) + rng.normal(size=(B, 1)) * 2.0
        xb = bat.step(ym, u_prev, d=d)
        xs = np.array([singles[i].preparestate(ym[i], d[i])
                       for i in range(B)])
        assert np.allclose(np.asarray(xb), xs, atol=1e-8), k
        u_prev = np.full((B, 1), 10.0) + rng.normal(size=(B, 1)) * 0.5
        for i in range(B):
            singles[i].updatestate(u_prev[i], ym[i], d[i])


def test_batched_linmpc_grouped_lane_mapping():
    """Grouped (distinct×reps) execution preserves the public tiled lane
    order exactly: lane r·n_d + c must match controller c driven with that
    lane's own (ym, ry) stream."""
    n_d, reps = 3, 2
    ctrls = random_cstr_controllers(n_d, Hp=8, Hc=2, seed=6,
                                    qp_solver="active_set")
    bat = BatchedLinMPC(random_cstr_controllers(n_d, Hp=8, Hc=2, seed=6,
                                                qp_solver="active_set"),
                        reps=reps)
    assert bat.grouped and bat.B == n_d * reps
    rng = np.random.default_rng(3)
    # independent per-lane streams (different across reps of a scenario)
    singles = {}
    for r in range(reps):
        for c in range(n_d):
            singles[(r, c)] = random_cstr_controllers(
                n_d, Hp=8, Hc=2, seed=6, qp_solver="active_set")[c]
    for k in range(4):
        ym = rng.normal(size=(bat.B, 2)) * 0.5
        ry = rng.normal(size=(bat.B, 2)) * 1.5
        u_b, n_conv = bat.step(jnp.asarray(ym), jnp.asarray(ry))
        assert int(n_conv) == bat.B, k
        u_b = np.asarray(u_b)
        for r in range(reps):
            for c in range(n_d):
                lane = r * n_d + c
                s = singles[(r, c)]
                s.preparestate(ym[lane])
                u_s = s.moveinput(ry[lane])
                s.updatestate(u_s, ym[lane])
                assert np.allclose(u_b[lane], u_s, atol=1e-6), (k, lane)


def test_batched_linmpc_grouped_chunks_matches_full():
    """grouped_chunks splits the distinct axis under lax.map; the result
    (and the public tiled lane order) must match full-width grouped
    execution exactly."""
    n_d, reps = 4, 3
    mk = lambda: random_cstr_controllers(n_d, Hp=8, Hc=2, seed=9,
                                         qp_solver="active_set")
    full = BatchedLinMPC(mk(), reps=reps)
    chk = BatchedLinMPC(mk(), reps=reps, grouped_chunks=2)
    assert full.grouped and chk.grouped
    rng = np.random.default_rng(5)
    for k in range(5):
        ym = rng.normal(size=(full.B, 2)) * 0.5
        ry = rng.normal(size=(full.B, 2)) * 1.5
        u_f, c_f = full.step(jnp.asarray(ym), jnp.asarray(ry))
        u_c, c_c = chk.step(jnp.asarray(ym), jnp.asarray(ry))
        assert int(c_f) == int(c_c) == full.B, k
        assert np.allclose(np.asarray(u_f), np.asarray(u_c), atol=1e-9), k
    import pytest
    with pytest.raises(ValueError):
        BatchedLinMPC(mk(), reps=reps, grouped_chunks=3)


def test_batched_explicitmpc_matches_singles():
    """BatchedExplicitMPC (grouped, reps>1) lane r·n_d + c must match
    controller c driven standalone with that lane's own streams
    (preparestate → moveinput → updatestate)."""
    from mpc_tpu.parallel import BatchedExplicitMPC

    def mk():
        ctrls = []
        for seed in range(3):
            rng = np.random.default_rng(seed)
            g = rng.uniform(0.8, 1.6, size=4) * np.array([1.9, 1.9, -0.74,
                                                          0.74])
            G = np.array([[mpc.tf(g[0], [18, 1]), mpc.tf(g[1], [18, 1])],
                          [mpc.tf(g[2], [8, 1]), mpc.tf(g[3], [8, 1])]],
                         dtype=object)
            m = mpc.LinModel(G, 2.0)
            ctrls.append(mpc.ExplicitMPC(m, Hp=8, Hc=2, Mwt=[1, 1],
                                         Nwt=[0.1, 0.1]))
        return ctrls

    n_d, reps = 3, 2
    bat = BatchedExplicitMPC(mk(), reps=reps)
    singles = {(r, c): mk()[c] for r in range(reps) for c in range(n_d)}
    rng = np.random.default_rng(7)
    for k in range(4):
        ym = rng.normal(size=(bat.B, 2)) * 0.5
        ry = rng.normal(size=(bat.B, 2)) * 1.5
        u_b = np.asarray(bat.step(jnp.asarray(ym), jnp.asarray(ry)))
        for r in range(reps):
            for c in range(n_d):
                lane = r * n_d + c
                s = singles[(r, c)]
                s.estim.preparestate(ym[lane])
                u_s = s.moveinput(ry[lane])
                s.estim.updatestate(u_s, ym[lane])
                assert np.allclose(u_b[lane], u_s, atol=1e-8), (k, lane)


# ---------------------------------------------------------------------------
# multi-period serving mode (steps_per_dispatch): K periods per dispatch
# ---------------------------------------------------------------------------

def test_batched_linmpc_multistep_matches_steps():
    """multistep(K) ≡ K successive step() calls at machine precision —
    the serving mode only amortizes dispatch, never changes the math."""
    ctrls = random_cstr_controllers(4, Hp=10, Hc=2, seed=3)
    bat_a = BatchedLinMPC(ctrls)
    bat_b = BatchedLinMPC(random_cstr_controllers(4, Hp=10, Hc=2, seed=3))
    B, K = bat_a.B, 5
    rng = np.random.default_rng(11)
    ym_s = rng.normal(size=(K, B, 2)) * 0.5
    ry_s = rng.normal(size=(K, B, 2))
    U, NC = bat_a.multistep(ym_s, ry_s)
    assert U.shape == (K, B, bat_a.nu) and NC.shape == (K,)
    for k in range(K):
        u_k, nc_k = bat_b.step(ym_s[k], ry_s[k])
        assert np.allclose(np.asarray(U[k]), np.asarray(u_k),
                           atol=1e-12), k
        assert int(NC[k]) == int(nc_k), k
    # states converged identically → next steps agree too
    u_a, _ = bat_a.step(ym_s[0], ry_s[0])
    u_b2, _ = bat_b.step(ym_s[0], ry_s[0])
    assert np.allclose(np.asarray(u_a), np.asarray(u_b2), atol=1e-12)


def test_batched_linmpc_multistep_grouped_and_shared():
    """The serving scan composes with the grouped / shared-plant fleet
    layouts (the bench's big-shape configs)."""
    def mk():
        return random_cstr_controllers(2, Hp=8, Hc=2, seed=5)

    for kw in (dict(reps=4),                          # grouped
               dict(reps=4, grouped_chunks=2)):       # grouped + chunked
        bat_a = BatchedLinMPC(mk(), **kw)
        bat_b = BatchedLinMPC(mk(), **kw)
        B, K = bat_a.B, 3
        rng = np.random.default_rng(13)
        ym_s = rng.normal(size=(K, B, 2)) * 0.3
        ry_s = rng.normal(size=(K, B, 2))
        U, NC = bat_a.multistep(ym_s, ry_s)
        for k in range(K):
            u_k, nc_k = bat_b.step(ym_s[k], ry_s[k])
            assert np.allclose(np.asarray(U[k]), np.asarray(u_k),
                               atol=1e-12), (kw, k)


def test_batched_mhe_multistep_matches_steps():
    """BatchedMHE.multistep(K) ≡ K step() calls, across the fill→moving
    window boundary (the per-period Nk/invP̄/H̃ host recursion must mirror
    step() exactly)."""
    from mpc_tpu.parallel import BatchedMHE
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    tmpl = mpc.MovingHorizonEstimator(m, He=4)
    tmpl.setconstraint(xhatmin=[-5.0] * tmpl.nx_hat,
                       xhatmax=[5.0] * tmpl.nx_hat)
    B = 3
    bat_a = BatchedMHE(tmpl, B)
    bat_b = BatchedMHE(mpc.MovingHorizonEstimator(m, He=4), B)
    bat_b.t.setconstraint(xhatmin=[-5.0] * tmpl.nx_hat,
                          xhatmax=[5.0] * tmpl.nx_hat)
    rng = np.random.default_rng(17)
    # first step has no u_prev: do it with step() on both, then multistep
    ym0 = rng.normal(size=(B, 1))
    xa = bat_a.step(ym0)
    xb = bat_b.step(ym0)
    K = 7                      # crosses the He=4 fill → moving boundary
    ym_s = rng.normal(size=(K, B, 1))
    u_s = rng.normal(size=(K, B, 1)) * 0.2
    X = bat_a.multistep(ym_s, u_s)
    assert X.shape == (K, B, tmpl.nx_hat)
    for k in range(K):
        xk = bat_b.step(ym_s[k], u_prev=u_s[k])
        assert np.allclose(np.asarray(X[k]), np.asarray(xk),
                           atol=1e-10), k
    assert bat_a.Nk == bat_b.Nk
    assert np.allclose(bat_a.invP_arr, bat_b.invP_arr)
    # converged flags of the final period
    assert np.asarray(bat_a.last_ok).all()


def test_batched_mhe_multistep_nan_routes_and_matches():
    """A NaN inside the sequence routes the dispatch through the per-lane
    H̃-downdate variant and still matches step()-by-step execution."""
    from mpc_tpu.parallel import BatchedMHE
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    tmpl = mpc.MovingHorizonEstimator(m, He=3)
    B = 3
    bat_a = BatchedMHE(tmpl, B)
    bat_b = BatchedMHE(mpc.MovingHorizonEstimator(m, He=3), B)
    rng = np.random.default_rng(19)
    ym0 = rng.normal(size=(B, 1))
    bat_a.step(ym0)
    bat_b.step(ym0)
    K = 6
    ym_s = rng.normal(size=(K, B, 1))
    ym_s[2, 1, 0] = np.nan
    u_s = rng.normal(size=(K, B, 1)) * 0.2
    X = bat_a.multistep(ym_s, u_s)
    for k in range(K):
        xk = bat_b.step(ym_s[k], u_prev=u_s[k])
        assert np.allclose(np.asarray(X[k]), np.asarray(xk),
                           atol=1e-8), k
    assert bat_a._nan_guard == bat_b._nan_guard


def test_batched_nonlinmpc_multistep_matches_steps():
    """BatchedNonLinMPC.multistep(K) ≡ K step() calls."""
    def f(x, u, d, par):
        g, L, K_, m_ = par
        return jnp.array([x[1], -g / L * jnp.sin(x[0]) - K_ / m_ * x[1]
                          + u[0] / (m_ * L ** 2)])

    h = lambda x, d, par: jnp.array([x[0] * 180 / jnp.pi])

    def mk():
        pend = mpc.NonLinModel(f, h, 0.1, 1, 2, 1, p=(9.8, 0.4, 1.2, 0.3),
                               solver=mpc.RungeKutta(4))
        estim = mpc.UnscentedKalmanFilter(pend, sigmaQ=[0.1, 1.0],
                                          sigmaR=[5.0], nint_ym=[1],
                                          sigmaQint_ym=[0.1])
        c = mpc.NonLinMPC(estim, Hp=8, Hc=2, Mwt=[0.5], Nwt=[2.5],
                          Cwt=np.inf, sqp_iters=5)
        c.setconstraint(umin=[-1.5], umax=[1.5])
        return c

    B, K = 3, 4
    fl_a = BatchedNonLinMPC(mk(), B)
    fl_b = BatchedNonLinMPC(mk(), B)
    rng = np.random.default_rng(23)
    ym_s = rng.normal(size=(K, B, 1)) * 5.0
    ry_s = np.tile(np.array([30.0]), (K, B, 1))
    U, J = fl_a.multistep(ym_s, ry_s)
    assert U.shape == (K, B, 1)
    for k in range(K):
        u_k, J_k = fl_b.step(ym_s[k], ry_s[k])
        assert np.allclose(np.asarray(U[k]), np.asarray(u_k),
                           atol=1e-10), k
        assert np.allclose(np.asarray(J[k]), np.asarray(J_k), rtol=1e-8), k


def test_batched_mhe_nan_lane_isolation():
    """A NaN in ONE lane must not perturb the other lanes' estimates
    (the per-lane H̃ downdate is exactly lane-local)."""
    from mpc_tpu.parallel import BatchedMHE
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    B = 4
    bat_a = BatchedMHE(mpc.MovingHorizonEstimator(m, He=3), B)
    bat_b = BatchedMHE(mpc.MovingHorizonEstimator(m, He=3), B)
    rng = np.random.default_rng(29)
    yms = [rng.normal(size=(B, 1)) for _ in range(8)]
    us = [rng.normal(size=(B, 1)) * 0.2 for _ in range(8)]
    xa = xb = None
    for k in range(8):
        ym_n = yms[k].copy()
        if k == 5:
            ym_n[2, 0] = np.nan
        xa = np.asarray(bat_a.step(ym_n, u_prev=us[k - 1] if k else None))
        xb = np.asarray(bat_b.step(yms[k], u_prev=us[k - 1] if k else None))
        clean = [i for i in range(B) if i != 2]
        assert np.allclose(xa[clean], xb[clean], atol=1e-9), k


def test_batched_mhe_nan_variant_matches_general_fleet():
    """The per-lane H̃-downdate NaN variant ≡ the general in-graph solver
    on every lane THROUGH a dropout (the round-4 verdict's equivalence
    bar).  The fleet's arrival covariance is shared by design (see the
    BatchedMHE docstring), so the comparison is fleet-vs-fleet."""
    from mpc_tpu.parallel import BatchedMHE
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    mk = lambda: mpc.MovingHorizonEstimator(m, He=3)
    B = 3
    bm = BatchedMHE(mk(), B)
    bg = BatchedMHE(mk(), B, solver="general")
    assert bm._nan_fast_ok
    rng = np.random.default_rng(37)
    u_prev = None
    used_nan = False
    for k in range(10):
        ym = rng.normal(size=(B, 1))
        if k == 5:
            ym[1, 0] = np.nan
        xb = np.asarray(bm.step(ym, u_prev=u_prev))
        xg = np.asarray(bg.step(ym, u_prev=u_prev))
        assert np.allclose(xb, xg, atol=1e-9), k
        if 5 <= k < 8:
            assert bm._nan_guard > 0      # the NaN variant actually ran
            used_nan = True
        u_prev = rng.normal(size=(B, 1)) * 0.2
    assert used_nan and bm._nan_guard == 0


def test_batched_mhe_nonlinear_matches_singles():
    """NonLinModel MHE fleet (round-5): the per-lane arrival covariance
    advances IN-GRAPH with the EKF-linearized covestim law — with
    covestim=ExtendedKalmanFilter the fleet is an exact mirror of the
    single-stream estimator (same kf_correct/predict formulas, same
    jacfwd linearization points), including the per-lane NaN skip."""
    from mpc_tpu.parallel import BatchedMHE

    def f(x, u, d, par):
        g, L, K_, m_ = par
        return jnp.array([x[1], -g / L * jnp.sin(x[0]) - K_ / m_ * x[1]
                          + u[0] / (m_ * L ** 2)])

    h = lambda x, d, par: jnp.array([x[0]])

    def mk():
        pend = mpc.NonLinModel(f, h, 0.1, 1, 2, 1, p=(9.8, 0.4, 1.2, 0.3),
                               solver=mpc.RungeKutta(4))
        ce = mpc.ExtendedKalmanFilter(pend, sigmaQ=[0.1, 1.0], sigmaR=[0.5],
                                      nint_ym=[1], sigmaQint_ym=[0.1])
        e = mpc.MovingHorizonEstimator(pend, He=4, sigmaQ=[0.1, 1.0],
                                       sigmaR=[0.5], nint_ym=[1],
                                       sigmaQint_ym=[0.1], covestim=ce)
        return e

    B = 3
    bat = BatchedMHE(mk(), B)
    assert not bat._lin and not bat._fast
    singles = [mk() for _ in range(B)]
    rng = np.random.default_rng(41)
    u_prev = None
    for k in range(8):
        ym = rng.normal(size=(B, 1)) * 0.3
        if k == 4:
            ym[0, 0] = np.nan          # per-lane NaN: in-graph masking
        xb = np.asarray(bat.step(ym, u_prev=u_prev))
        xs = np.array([singles[i].preparestate(ym[i]) for i in range(B)])
        assert np.allclose(xb, xs, atol=2e-6), (k, np.abs(xb - xs).max())
        u_prev = rng.normal(size=(B, 1)) * 0.3
        for i in range(B):
            singles[i].updatestate(u_prev[i], ym[i])
    # multistep ≡ step-by-step for the nonlinear fleet
    bat2 = BatchedMHE(mk(), B)
    rng2 = np.random.default_rng(41)
    u0 = None
    ym0 = rng2.normal(size=(B, 1)) * 0.3
    bat2.step(ym0)
    K = 5
    ym_s = rng2.normal(size=(K, B, 1)) * 0.3
    u_s = rng2.normal(size=(K, B, 1)) * 0.3
    bat3 = BatchedMHE(mk(), B)
    bat3.step(ym0)
    X = bat2.multistep(ym_s, u_s)
    for k in range(K):
        xk = np.asarray(bat3.step(ym_s[k], u_prev=u_s[k]))
        assert np.allclose(np.asarray(X[k]), xk, atol=1e-9), k


def test_batched_mhe_multipleshooting_fast_matches_singles():
    """MS-MHE fleets ride the condensed fast path (round-5): for a
    LinModel the defect equalities are linear so eliminating X̂ is exact —
    the MS fleet runs the SAME kernels as the SS fleet and must match the
    per-stream MS singles (which also condense) and the SS fleet's
    estimates exactly."""
    from mpc_tpu.parallel import BatchedMHE
    from mpc_tpu.controllers.transcription import MultipleShooting
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)

    def mk(tr):
        e = mpc.MovingHorizonEstimator(
            m, He=4, transcription=tr() if tr else None)
        e.setconstraint(xhatmin=[-0.5] * e.nx_hat,
                        xhatmax=[0.5] * e.nx_hat)
        return e

    B = 3
    bat_ms = BatchedMHE(mk(MultipleShooting), B)
    bat_ss = BatchedMHE(mk(None), B)
    assert bat_ms._fast and bat_ms._ms_cond
    singles = [mk(MultipleShooting) for _ in range(B)]
    rng = np.random.default_rng(43)
    u_prev = np.zeros((B, 1))
    for k in range(9):
        ym = rng.normal(size=(B, 1))
        xm = np.asarray(bat_ms.step(ym, u_prev))
        xs_fleet = np.asarray(bat_ss.step(ym, u_prev))
        xs = np.array([singles[i].preparestate(ym[i]) for i in range(B)])
        assert np.allclose(xm, xs, atol=1e-8), k
        assert np.allclose(xm, xs_fleet, atol=1e-9), k
        u_prev = rng.normal(size=(B, 1)) * 0.2
        for i in range(B):
            singles[i].updatestate(u_prev[i], ym[i])
    # NaN dropout keeps the MS fleet on the (nan-variant) fast path too
    ym = rng.normal(size=(B, 1))
    ym[1, 0] = np.nan
    xm = np.asarray(bat_ms.step(ym, u_prev))
    xs_fleet = np.asarray(bat_ss.step(ym, u_prev))
    assert np.allclose(xm, xs_fleet, atol=1e-9)
    assert np.asarray(bat_ms.last_ok).all()


def test_multistep_sharded_mesh():
    """Sharded fleets' multistep places the stacked (K, B, ·) inputs with
    the LANE axis (dim 1) on the mesh — PartitionSpec("batch") on dim 0
    would partition the TIME axis (crashing when K % n_dev != 0 and
    resharding every scan step otherwise; advisor-found round 5).  K=3 on
    a 4-device mesh is exactly the crashing case."""
    from mpc_tpu.parallel import BatchedMHE
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("batch",))
    # LinMPC fleet
    ctrls = random_cstr_controllers(8, Hp=8, Hc=2, seed=1)
    bat = BatchedLinMPC(ctrls, mesh=mesh)
    bat_ref = BatchedLinMPC(random_cstr_controllers(8, Hp=8, Hc=2, seed=1))
    rng = np.random.default_rng(53)
    K = 3
    ym_s = rng.normal(size=(K, 8, 2)) * 0.3
    ry_s = rng.normal(size=(K, 8, 2))
    U, NC = bat.multistep(ym_s, ry_s)
    U2, _ = bat_ref.multistep(ym_s, ry_s)
    assert np.allclose(np.asarray(U), np.asarray(U2), atol=1e-10)
    assert "batch" in str(U.sharding)
    # MHE fleet (fast path ships per-period shared H-tilde too)
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    bm = BatchedMHE(mpc.MovingHorizonEstimator(m, He=3), 8, mesh=mesh)
    bm_ref = BatchedMHE(mpc.MovingHorizonEstimator(m, He=3), 8)
    ym0 = rng.normal(size=(8, 1))
    bm.step(ym0)
    bm_ref.step(ym0)
    ym_q = rng.normal(size=(K, 8, 1))
    u_q = rng.normal(size=(K, 8, 1)) * 0.2
    X = bm.multistep(ym_q, u_q)
    X2 = bm_ref.multistep(ym_q, u_q)
    assert np.allclose(np.asarray(X), np.asarray(X2), atol=1e-10)
