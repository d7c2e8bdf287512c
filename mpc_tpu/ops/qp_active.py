"""Dual active-set QP solver (Goldfarb–Idnani) — the DAQP/qpOASES role.

The reference's benchmark suite uses DAQP (a dual active-set C solver) as
the low-latency alternative to OSQP for small condensed MPC QPs
(``benchmark/3_bench_predictive_control.jl:166-215``).  This is the
TPU-native equivalent: a fixed-shape, jit/vmap-able Goldfarb–Idnani method.

Why it exists alongside ``ops/qp.py``'s ADMM: first-order ADMM needs
~100–500 sequential O(mn) sweeps to reach polish-grade accuracy, which is
*latency*-bound for a single small problem (the SL-MPC per-step hot path).
GI terminates in ~#active-set-changes pivots (typically 2–15 for MPC),
each a small dense solve, and returns the **exact** optimum — no polish
needed.  ADMM remains the batched-throughput workhorse (its per-iteration
matmuls batch perfectly on the MXU); GI is the single-stream latency
kernel.

Problem form matches ``solve_qp``:  min ½xᵀPx + qᵀx  s.t.  l ≤ Ax ≤ u
with P strictly convex (SPD).  One-sided rows use ∓BIG bounds.  Equality
rows (l == u) are supported but cost extra pivots (each side activates
separately); condensed MPC QPs have none.

Algorithm (Goldfarb & Idnani 1983, two-sided form): start at the
unconstrained minimum (dual feasible, primal infeasible); repeatedly pick
the most violated row/side, then take the largest step in the (primal,
dual) direction that keeps dual feasibility, dropping blocking constraints
until the new row activates.  GI maintains ≤ n linearly-independent active
normals, so the active set lives in a **capacity-n slot buffer** (row
index, side, multiplier per slot): every pivot gathers an n×n system from
the precomputed G = A P⁻¹ Aᵀ instead of solving a masked m×m one — the
per-pivot cost is O(n³ + nm), independent of the constraint count.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .qp import QPSolution, _BIG


def build_gi_cache(P, A):
    """Precompute the step-invariant part of :func:`solve_qp_active`.

    Receding-horizon MPC solves the same (P=H̃, A=A_stack) every control
    period; GI's only P-dependent work is the unconstrained minimum
    ``x0 = −P⁻¹q`` and the column table ``P⁻¹Aᵀ`` — both built from P⁻¹.
    Computing them in-solve needs a Cholesky factorization plus triangular
    solves, which are SERIAL on TPU (the latency killer in a jitted loop);
    with the cache the per-solve setup is two matmuls.  Host NumPy f64 with
    one Newton refinement step, so f32 runs get a rounded-f64 inverse.
    Returns a dict of plain NumPy arrays (pytree-friendly: travels inside a
    controller's params dict, stacks across fleets).
    """
    import numpy as np
    P = np.asarray(P, np.float64)
    A = np.asarray(A, np.float64)
    n = P.shape[0]
    Pinv = np.linalg.inv(P)
    Pinv = Pinv @ (2.0 * np.eye(n) - P @ Pinv)   # Newton: squares residual
    return dict(gic_Pinv=Pinv, gic_HinvAT=Pinv @ A.T)


def solve_qp_active(P, q, A, l, u, y0=None, *, max_pivots=150, tol=1e-9,
                    cache=None):
    """Solve one dense QP by dual active set.  jit- and vmap-compatible.

    Exact at termination (up to the small gathered-KKT solves' accuracy) —
    intended for float64 single-stream latency paths; works in float32 with
    the usual caveats.  ``max_pivots`` bounds LOOP iterations (each
    add costs one selection scan plus one or more add/drop steps, so the
    effective pivot budget is roughly half); `converged` is False if the
    bound is hit or the duals detect primal infeasibility.

    ``y0`` warm-starts the ACTIVE SET from a previous solve's duals (their
    signs give the active sides): the warm phase solves the gathered KKT for
    that set and drops wrong-sign multipliers one at a time, after which the
    usual GI pivoting continues.  In receding-horizon use the active set is
    nearly stationary, so a warm solve is typically one KKT solve + one
    optimality scan (~2 "pivots").

    ``cache``: output of :func:`build_gi_cache` for this (P, A) — skips the
    in-solve Cholesky setup (serial triangular solves on TPU) in favour of
    two matmuls against a precomputed f64-refined P⁻¹.
    """
    with jax.default_matmul_precision("float32"):
        return _gi_impl(P, q, A, l, u, y0, max_pivots=max_pivots, tol=tol,
                        cache=cache)


def _gi_impl(P, q, A, l, u, y0, *, max_pivots, tol, cache=None):
    dt = q.dtype
    n = q.shape[0]
    m = A.shape[0]
    if dt == jnp.float32:
        # f32 roundoff on A@x sits ~1e-7; a 1e-9 test would re-pick
        # already-active rows forever (same floor policy as _solve_qp_impl)
        tol = max(tol, 3e-6)
    eps = jnp.asarray(tol, dt)
    inf = jnp.asarray(jnp.inf, dt)

    if cache is not None:
        Pinv = jnp.asarray(cache["gic_Pinv"], dt)
        x0 = -(Pinv @ q)                            # unconstrained minimum
        HinvAT = jnp.asarray(cache["gic_HinvAT"], dt)  # (n, m): P⁻¹aᵢ cols
    else:
        cho = jax.scipy.linalg.cho_factor(P)
        x0 = -jax.scipy.linalg.cho_solve(cho, q)    # unconstrained minimum
        HinvAT = jax.scipy.linalg.cho_solve(cho, A.T)  # (n, m): P⁻¹aᵢ cols
    # Gram entries aᵢᵀP⁻¹aⱼ are gathered on the fly from HinvAT — the full
    # (m, m) G precompute is O(m²) memory, which at condensed-MPC shapes
    # like m≈900 × B=512 lanes is gigabytes of HBM for entries GI never
    # touches (it only ever needs an (n_active × n_active) block per pivot)

    has_lo = l > -_BIG
    has_up = u < _BIG
    slot_id = jnp.arange(n)

    # state: x; slot buffer idx/side/lam (capacity n) with fill count;
    # row being added p (−1 = selection mode, −2 = warm-start KKT phase),
    # its side sp, its multiplier lam_p; pivot counter; done/feasible flags
    def cond(st):
        return (~st["done"]) & (st["it"] < max_pivots)

    def body(st):
        def warm(st):
            """Solve the gathered KKT for the warm active set; drop the most
            wrong-signed multiplier, or adopt the point and start selecting."""
            idx, side, cnt = st["idx"], st["side"], st["cnt"]
            valid = slot_id < cnt
            vf = valid.astype(dt)
            Arows = A[idx] * vf[:, None]
            bnd = jnp.where(side > 0, u[idx], l[idx]) * vf
            K = jnp.block([[P, Arows.T],
                           [Arows, jnp.diag(1.0 - vf)]])
            sol = jnp.linalg.solve(K, jnp.concatenate([-q, bnd]))
            xw, w = sol[:n], sol[n:]
            lamw = side.astype(dt) * w          # λ = s·w must be ≥ 0
            lam_chk = jnp.where(valid, lamw, inf)
            k = jnp.argmin(lam_chk)
            neg = lam_chk[k] < -eps
            ok = jnp.all(jnp.isfinite(xw)) & jnp.all(jnp.isfinite(w))
            # dependent warm normals → singular KKT → cold reset
            last = jnp.maximum(cnt - 1, 0)
            idx_d = idx.at[k].set(idx[last])
            side_d = side.at[k].set(side[last])
            drop = ok & neg
            adopt = ok & ~neg
            return dict(
                x=jnp.where(adopt, xw, st["x"]),
                idx=jnp.where(drop, idx_d, idx),
                side=jnp.where(drop, side_d,
                               jnp.where(ok, side, jnp.zeros_like(side))),
                lam=jnp.where(adopt,
                              jnp.where(valid, jnp.maximum(lamw, 0.0), 0.0),
                              st["lam"]),
                cnt=jnp.where(drop, cnt - 1,
                              jnp.where(ok, cnt, 0)),
                p=jnp.where(drop, -2, -1).astype(jnp.int32),
                sp=jnp.asarray(0, jnp.int32),
                lam_p=jnp.asarray(0.0, dt), it=st["it"] + 1,
                done=st["done"], feas=st["feas"])

        def select(st):
            Ax = A @ st["x"]
            vl = jnp.where(has_lo, l - Ax, -inf)
            vu = jnp.where(has_up, Ax - u, -inf)
            v = jnp.maximum(vl, vu)
            j = jnp.argmax(v)
            opt = v[j] <= eps
            side = jnp.where(vu[j] >= vl[j], 1, -1).astype(jnp.int32)
            return dict(st, p=jnp.where(opt, -1, j).astype(jnp.int32),
                        sp=jnp.where(opt, 0, side).astype(jnp.int32),
                        lam_p=jnp.asarray(0.0, dt), it=st["it"] + 1,
                        done=opt)

        def step(st):
            x, idx, side, lam, cnt = (st["x"], st["idx"], st["side"],
                                      st["lam"], st["cnt"])
            p, sp, lam_p = st["p"], st["sp"], st["lam_p"]
            valid = slot_id < cnt
            s = jnp.where(valid, side, 0).astype(dt)       # (n,) slot signs
            spf = sp.astype(dt)
            # gathered NᵀP⁻¹N system (n×n) for the dual direction r
            A_idx = A[idx]                               # (n, nvar)
            Gsub = (A_idx @ HinvAT[:, idx]) * jnp.outer(s, s)
            Mm = jnp.where(jnp.eye(n, dtype=bool),
                           jnp.where(valid, jnp.diag(Gsub), 1.0), Gsub)
            rhs = s * spf * (A_idx @ HinvAT[:, p])
            r = jnp.linalg.solve(Mm, rhs)
            r = jnp.where(valid, r, 0.0)
            # primal direction z = P⁻¹(ν⁺ − Σ r_j ν_j), ν_j = −s_j a_{idx_j}
            z = HinvAT[:, idx] @ (r * s) - spf * HinvAT[:, p]
            nu_z = -spf * (A[p] @ z)
            bnd_p = jnp.where(sp > 0, u[p], l[p])
            slack = spf * (A[p] @ x - bnd_p)        # > 0 (p is violated)
            # full step (activates p) and dual blocking step (drops a slot)
            t2 = jnp.where(nu_z > eps, slack / jnp.maximum(nu_z, eps), inf)
            ratio = jnp.where(valid & (r > eps),
                              lam / jnp.maximum(r, eps), inf)
            k = jnp.argmin(ratio)
            t1 = ratio[k]
            t = jnp.minimum(t1, t2)
            infeasible = ~jnp.isfinite(t)
            t = jnp.where(infeasible, 0.0, t)
            x = x + t * z
            lam = jnp.maximum(lam - t * r, 0.0)
            lam_p = lam_p + t
            full = (t2 <= t1) & jnp.isfinite(t2) & (cnt < n)
            # full step → append p to the slots; else swap-remove slot k
            # (GI invariant: cnt < n whenever a full step is possible —
            # with n active independent normals, ν⁺ ∈ span(N) ⇒ z = 0)
            last = jnp.maximum(cnt - 1, 0)
            app = jnp.minimum(cnt, n - 1)
            idx_f = idx.at[app].set(p)
            side_f = side.at[app].set(sp)
            lam_f = lam.at[app].set(lam_p)
            idx_d = idx.at[k].set(idx[last])
            side_d = side.at[k].set(side[last])
            lam_d = lam.at[k].set(lam[last])
            upd = ~infeasible   # infeasible exit must not corrupt the slots
            return dict(
                x=x,
                idx=jnp.where(upd, jnp.where(full, idx_f, idx_d), idx),
                side=jnp.where(upd, jnp.where(full, side_f, side_d), side),
                lam=jnp.where(upd, jnp.where(full, lam_f, lam_d), lam),
                cnt=jnp.where(upd, jnp.where(full, cnt + 1, cnt - 1), cnt),
                p=jnp.where(full | infeasible, -1, p).astype(jnp.int32),
                sp=jnp.where(full | infeasible, 0, sp).astype(jnp.int32),
                lam_p=jnp.where(full, 0.0, lam_p),
                it=st["it"] + 1,
                done=st["done"] | infeasible,
                feas=st["feas"] & ~infeasible)

        phase = jnp.where(st["p"] == -2, 0, jnp.where(st["p"] == -1, 1, 2))
        return jax.lax.switch(phase, [warm, select, step], st)

    if y0 is None:
        idx0 = jnp.zeros(n, jnp.int32)
        side0 = jnp.zeros(n, jnp.int32)
        cnt0 = jnp.asarray(0, jnp.int32)
        p0 = jnp.asarray(-1, jnp.int32)
    else:
        # seed the active set from the previous duals: sign gives the side,
        # magnitude ranks the candidates (≤ n can be active)
        usable = jnp.where(y0 > 0, has_up, has_lo)
        mag = jnp.where(usable, jnp.abs(y0), 0.0)
        topv, topi = jax.lax.top_k(mag, min(n, m))
        hot = topv > 1e-12
        cnt0 = jnp.sum(hot).astype(jnp.int32)
        idx0 = jnp.zeros(n, jnp.int32).at[:topi.shape[0]].set(
            topi.astype(jnp.int32))
        side0 = jnp.zeros(n, jnp.int32).at[:topi.shape[0]].set(
            jnp.where(hot, jnp.where(y0[topi] > 0, 1, -1), 0)
            .astype(jnp.int32))
        p0 = jnp.asarray(-2, jnp.int32)

    st0 = dict(x=x0, idx=idx0, side=side0, lam=jnp.zeros(n, dt),
               cnt=cnt0,
               p=p0, sp=jnp.asarray(0, jnp.int32),
               lam_p=jnp.asarray(0.0, dt), it=jnp.asarray(0, jnp.int32),
               done=jnp.asarray(False), feas=jnp.asarray(True))
    st = jax.lax.while_loop(cond, body, st0)
    # duals back to row space, OSQP sign convention (+ at upper bound)
    valid = slot_id < st["cnt"]
    contrib = jnp.where(valid, st["side"].astype(dt) * st["lam"], 0.0)
    y = jnp.zeros(m, dt).at[st["idx"]].add(contrib)
    x = st["x"]
    return QPSolution(x=x, y=y, z=A @ x,
                      converged=st["done"] & st["feas"], iters=st["it"],
                      obj=0.5 * x @ P @ x + q @ x)
