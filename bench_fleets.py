#!/usr/bin/env python
"""Fleet throughput benchmarks beyond the headline LinMPC bench (bench.py):

* BatchedKalman   — SKF and KF sensor-stream filtering fleets
* BatchedNonLinMPC — pendulum swing-up fleet (SQP + UKF per lane)

Each prints one JSON line. Runs on whatever backend jax selects (the real
TPU chip under axon; CPU elsewhere).
"""
import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import mpc_tpu as mpc
    from mpc_tpu.parallel import BatchedKalman, BatchedNonLinMPC

    platform = jax.default_backend()
    rng = np.random.default_rng(0)

    # ---------------- Kalman fleets ----------------
    G = np.array([[mpc.tf(3, [10, 1])], [mpc.tf(-1, [4, 1])]], dtype=object)

    for kind, B_total in ((mpc.SteadyKalmanFilter, 65536),
                          (mpc.KalmanFilter, 16384)):
        n_distinct = 64
        m0 = mpc.LinModel(G, 1.0)
        ests = [kind(mpc.LinModel(G, 1.0), sigmaQ=[0.3 + 0.01 * i] * m0.nx,
                     sigmaR=[0.2, 0.2])
                for i in range(n_distinct)]
        fleet = BatchedKalman(ests, dtype=jnp.float32,
                              reps=B_total // n_distinct)
        ym = jnp.asarray(rng.normal(size=(B_total, 2)), jnp.float32)
        u = jnp.asarray(rng.normal(size=(B_total, 1)), jnp.float32)
        x = fleet.step(ym, u)
        np.asarray(x)      # HOST TRANSFER: block_until_ready lies on axon
        iters = 30
        t0 = time.time()
        for _ in range(iters):
            x = fleet.step(ym, u)
        np.asarray(x)      # hard sync
        dt = (time.time() - t0) / iters
        print(json.dumps({
            "metric": f"Batched{kind.__name__} updates/s/chip "
                      f"(B={B_total}, nx̂={ests[0].nx_hat}, {platform})",
            "value": round(B_total / dt, 1), "unit": "updates/s",
            "step_ms": round(dt * 1e3, 3)}))

    # ---------------- ExplicitMPC fleet ----------------
    # unconstrained analytic MPC (Z̃ = −H̃⁻¹q̃) + SKF feedback, closed
    # loop around each lane's true plant (reference per-call analogue:
    # benchmark/3_bench_predictive_control.jl ExplicitMPC cases)
    from mpc_tpu.parallel import BatchedExplicitMPC
    from mpc_tpu.utils.config import jit32

    B_total, n_distinct = 16384, 64
    ctrls_e, plants = [], []
    for i in range(n_distinct):
        rngi = np.random.default_rng(100 + i)
        g = rngi.uniform(0.8, 1.6, size=4) * np.array([1.9, 1.9, -0.74,
                                                       0.74])
        Ge = np.array([[mpc.tf(g[0], [18, 1]), mpc.tf(g[1], [18, 1])],
                       [mpc.tf(g[2], [8, 1]), mpc.tf(g[3], [8, 1])]],
                      dtype=object)
        me = mpc.LinModel(Ge, 2.0)
        ctrls_e.append(mpc.ExplicitMPC(me, Hp=10, Hc=2, Mwt=[1, 1],
                                       Nwt=[0.1, 0.1]))
        plants.append((np.asarray(me.A), np.asarray(me.Bu),
                       np.asarray(me.C)))
    reps_e = B_total // n_distinct
    fleet_e = BatchedExplicitMPC(ctrls_e, dtype=jnp.float32, reps=reps_e)
    tile = lambda i: jnp.asarray(np.tile(
        np.stack([p[i] for p in plants]), (reps_e, 1, 1)), jnp.float32)
    A_t, B_t, C_t = tile(0), tile(1), tile(2)
    raw_e = fleet_e._step

    @jit32
    def closed_e(p, ep, st, xt, noise, ry, d, Ap, Bp, Cp):
        ym = jnp.einsum("bij,bj->bi", Cp, xt) + noise
        u, new_st = raw_e(p, ep, st, ym, ry, d)
        xt2 = (jnp.einsum("bij,bj->bi", Ap, xt)
               + jnp.einsum("bij,bj->bi", Bp, u))
        return u, new_st, xt2

    seq_e = [(jnp.asarray(rng.normal(size=(B_total, 2)) * 0.1, jnp.float32),
              jnp.asarray(rng.normal(size=(B_total, 2)) * 2.0, jnp.float32))
             for _ in range(4)]
    d_e = jnp.zeros((B_total, 0), jnp.float32)
    xt = jnp.zeros((B_total, plants[0][0].shape[0]), jnp.float32)
    u, fleet_e.state, xt = closed_e(fleet_e.params, fleet_e.eparams,
                                    fleet_e.state, xt, *seq_e[0], d_e,
                                    A_t, B_t, C_t)
    np.asarray(u)
    iters = 30
    t0 = time.time()
    for k in range(iters):
        u, fleet_e.state, xt = closed_e(fleet_e.params, fleet_e.eparams,
                                        fleet_e.state, xt, *seq_e[k % 4],
                                        d_e, A_t, B_t, C_t)
    np.asarray(u)
    dt = (time.time() - t0) / iters
    print(json.dumps({
        "metric": f"BatchedExplicitMPC solves/s/chip (2x2, Hp=10, closed "
                  f"loop, B={B_total}, {platform})",
        "value": round(B_total / dt, 1), "unit": "solves/s",
        "step_ms": round(dt * 1e3, 3)}))

    # ---------------- NonLinMPC fleet ----------------
    def f(x, u, d, par):
        g, L, K, m = par
        return jnp.array([x[1], -g / L * jnp.sin(x[0]) - K / m * x[1]
                          + u[0] / (m * L ** 2)])

    h = lambda x, d, par: jnp.array([x[0] * 180 / jnp.pi])
    pend = mpc.NonLinModel(f, h, 0.1, 1, 2, 1, p=(9.8, 0.4, 1.2, 0.3),
                           solver=mpc.RungeKutta(4))
    estim = mpc.UnscentedKalmanFilter(pend, sigmaQ=[0.1, 1.0], sigmaR=[5.0],
                                      nint_ym=[1], sigmaQint_ym=[0.1],
                                      alpha=0.5)   # f32 fleet envelope
    t = mpc.NonLinMPC(estim, Hp=15, Hc=2, Mwt=[0.5], Nwt=[2.5], Cwt=np.inf,
                      sqp_iters=15, qp_solver="active_set")
    t.setconstraint(umin=[-1.5], umax=[1.5])
    B = 256
    fleet = BatchedNonLinMPC(t, batch=B, dtype=jnp.float32)
    ym = jnp.asarray(rng.normal(size=(B, 1)) * 5.0, jnp.float32)
    ry = jnp.full((B, 1), 180.0, jnp.float32)
    u, J = fleet.step(ym, ry)
    np.asarray(u)          # hard sync
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        u, J = fleet.step(ym, ry)
    np.asarray(u)          # hard sync
    dt = (time.time() - t0) / iters
    print(json.dumps({
        "metric": f"BatchedNonLinMPC solves/s/chip (pendulum, Hp=15, "
                  f"SQP15+UKF, B={B}, {platform})",
        "value": round(B / dt, 1), "unit": "solves/s",
        "step_ms": round(dt * 1e3, 2)}))


if __name__ == "__main__":
    main()
