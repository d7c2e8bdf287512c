"""Batched dense QP solver — OSQP-style ADMM with active-set polish.

This replaces the reference's binary OSQP dependency (default LinMPC/MHE
optimizer, ``src/general.jl:9``) with a fixed-shape, jit/vmap-able JAX
implementation designed for TPU:

* problem form  ``min ½ xᵀPx + qᵀx  s.t.  l ≤ Ax ≤ u``  (equalities: l == u,
  one-sided rows: ∓BIG) — all shapes static;
* ADMM with a cached dense Cholesky of ``P + σI + AᵀρA`` (MXU matmuls), over-
  relaxation, per-row ρ (equality rows get 1000× weight, as in OSQP);
* ``lax.while_loop`` with residual-based termination (vmap lifts this to a
  lockstep loop with per-problem masks);
* active-set **polish** step (OSQP §5.2-style): detect the active set from
  the dual signs, solve the equality-constrained KKT system with a masked
  static-shape formulation + iterative refinement — this is what brings
  solutions to ~1e-9 accuracy so control traces match the reference ≤1e-5.

Everything is a pure function of arrays → `jax.vmap(solve_qp)` solves
thousands of scenarios in lockstep on the MXU.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_BIG = 1e18  # bounds beyond this are treated as infinite


class QPSolution(NamedTuple):
    x: jax.Array          # primal solution (n,)
    y: jax.Array          # dual solution (m,)
    z: jax.Array          # Ax at solution (m,)
    converged: jax.Array  # bool scalar
    iters: jax.Array      # int scalar
    obj: jax.Array        # ½xᵀPx + qᵀx
    # final ρ-ladder rung (ADMM only; None elsewhere).  Receding-horizon
    # callers feed it back as ``rung0`` so the next warm-started solve
    # starts on the rung the problem settled on instead of re-adapting
    # from the ladder centre — the re-adaptation transient is what rode
    # individual fleet lanes to the f32 iteration cap.
    rung: jax.Array | None = None
    # GI active-set operator state (qp_active only; None for ADMM).
    # Receding-horizon callers feed it back as ``state0=`` — (P, A) are
    # step-invariant, so the carried inverse Gram stays exactly valid and
    # a quiet period costs ~2 lockstep pivots.
    gi_state: dict | None = None


def _rho_vec(eq, loose, rho):
    """Per-row rho from the equality/loose masks (classified on the
    ORIGINAL bounds — equilibration must not flip a row's class)."""
    return jnp.where(eq, 1e3 * rho, jnp.where(loose, 1e-6 * rho, rho))


def _ruiz_equilibrate(P, q, A, iters=10):
    """Modified Ruiz equilibration of [[P, Aᵀ], [A, 0]] (OSQP §5.1).

    Returns scaled (P̄, q̄, Ā) and the diagonal scalings (D, E, c) with
    P̄ = c·D P D, q̄ = c·D q, Ā = E A D.  Solution recovery: x = D x̄,
    y = E ȳ / c.
    """
    n = q.shape[0]
    m = A.shape[0]
    dt = q.dtype
    D = jnp.ones(n, dt)
    E = jnp.ones(m, dt)
    c = jnp.asarray(1.0, dt)

    def body(i, carry):
        P, q, A, D, E, c = carry
        # column norms of [P; A] → D update
        col = jnp.maximum(jnp.max(jnp.abs(P), axis=0),
                          jnp.max(jnp.abs(A), axis=0) if m else 0.0)
        # zero/tiny norms keep scale 1 (OSQP limit_scaling): 1/sqrt(eps)
        # would otherwise compound 1e6x per iteration on an all-zero row
        d = jnp.where(col < 1e-10, 1.0,
                      1.0 / jnp.sqrt(jnp.clip(col, 1e-12, 1e12)))
        row = jnp.max(jnp.abs(A), axis=1) if m else jnp.zeros(0, dt)
        e = jnp.where(row < 1e-10, 1.0,
                      1.0 / jnp.sqrt(jnp.clip(row, 1e-12, 1e12)))
        P = (d[:, None] * P) * d[None, :]
        q = d * q
        A = (e[:, None] * A) * d[None, :]
        # cost normalization
        gamma = 1.0 / jnp.clip(jnp.maximum(jnp.mean(jnp.max(jnp.abs(P), axis=0)),
                                           jnp.max(jnp.abs(q))), 1e-12, 1e12)
        P = gamma * P
        q = gamma * q
        return P, q, A, D * d, E * e, c * gamma

    P, q, A, D, E, c = jax.lax.fori_loop(0, iters, body, (P, q, A, D, E, c))
    return P, q, A, D, E, c


def build_solver_cache(P, A, eq_mask, loose_mask, *,
                       sigma=1e-6, rho=0.1, scaling=10, q_scale=0.0):
    """Precompute the step-invariant part of ``solve_qp`` (host NumPy, f64).

    MPC solves the same (P=H̃, A=A_stack) every control period — only
    (q, l, u) move.  The Ruiz equilibration (10 data sweeps) and the
    ρ-ladder of Newton-refined normal-matrix inverses depend ONLY on
    (P, A) and the row-classification masks, yet were rebuilt inside every
    solve: at bench shapes they dominate the per-solve setup FLOPs.  Build
    once per controller configuration (masks from the bound structure —
    one-sided rows stay one-sided, defect rows stay equalities; the
    reference's matching restriction is that ±Inf bounds cannot be toggled
    after construction, mhe/construct.jl:1036-1038) and pass the result as
    ``solve_qp(..., cache=...)``.  f64 host construction also gives
    f32 runs a rounded-f64 inverse, slightly better than an f32-computed
    one.  Returns a dict of plain NumPy arrays (pytree-friendly: travels
    inside a controller's params dict, stacks across fleets, ships in the
    single device_put).

    Caveat (vs the in-solve Ruiz): the cost normalization here uses
    ``q_ref = q_scale`` (default 0 — gamma from the mean column norm of P
    alone), while the uncached path folds the live max|q| into gamma.  For
    problems whose |q| is persistently large relative to P this slows ADMM
    convergence (never correctness: residual tests are unscaled); pass a
    representative magnitude as ``q_scale`` to fold it into the cached
    scaling.  ``sigma``/``rho`` are recorded in the cache and validated by
    :func:`solve_qp` when it runs eagerly (a cache built for different
    penalties would silently centre the ρ-ladder on the wrong rung).
    """
    import numpy as np
    P = np.asarray(P, np.float64)
    A = np.asarray(A, np.float64)
    eq = np.asarray(eq_mask, bool)
    loose = np.asarray(loose_mask, bool)
    n = P.shape[0]
    m = A.shape[0]
    # --- Ruiz equilibration of [[P, Aᵀ],[A, 0]] with q_ref = 0 ------------
    D = np.ones(n)
    E = np.ones(m)
    c = 1.0
    Ps, As = P.copy(), A.copy()
    for _ in range(int(scaling)):
        col = np.max(np.abs(Ps), axis=0)
        if m:
            col = np.maximum(col, np.max(np.abs(As), axis=0))
        d = np.where(col < 1e-10, 1.0, 1.0 / np.sqrt(np.clip(col, 1e-12, 1e12)))
        row = np.max(np.abs(As), axis=1) if m else np.zeros(0)
        e = np.where(row < 1e-10, 1.0, 1.0 / np.sqrt(np.clip(row, 1e-12, 1e12)))
        Ps = (d[:, None] * Ps) * d[None, :]
        As = (e[:, None] * As) * d[None, :]
        gamma = 1.0 / np.clip(
            max(np.mean(np.max(np.abs(Ps), axis=0)), c * q_scale),
            1e-12, 1e12)
        Ps *= gamma
        D *= d
        E *= e
        c *= gamma
    # --- ρ-ladder of Newton-refined inverses ------------------------------
    N_LAD = 9
    lad = rho * np.logspace(-2.0, 2.0, N_LAD)
    rhovs = np.stack([np.where(eq, 1e3 * r, np.where(loose, 1e-6 * r, r))
                      for r in lad])
    Ms = Ps[None] + sigma * np.eye(n)[None] + \
        np.einsum("ji,kj,jl->kil", As, rhovs, As)
    Minvs = np.linalg.inv(Ms)
    Minvs = Minvs @ (2.0 * np.eye(n)[None] - Ms @ Minvs)
    return dict(qpc_D=D, qpc_E=E, qpc_c=np.float64(c),
                qpc_eq=eq, qpc_loose=loose,
                qpc_rhovs=rhovs, qpc_Minvs=Minvs,
                qpc_sigma=np.float64(sigma), qpc_rho=np.float64(rho))


def solve_qp(P, q, A, l, u, x0=None, y0=None, *,
             sigma=1e-6, rho=0.1, alpha=1.6,
             max_iter=None, tol=1e-6, tol_final=1e-7, check_every=10,
             scaling=10, polish=True, polish_iters=3, polish_delta=1e-11,
             polish_rounds=2, cache=None, rung0=None, iter_budget=None,
             n_lad=9):
    """Solve one dense QP.  jit- and vmap-compatible (static shapes only).

    Matmuls run at full float32 precision: the TPU MXU's default reduced
    precision (~bf16 mantissa) breaks the ADMM residual tests.

    ``max_iter=None`` (the default) means 2000 iterations, CLAMPED to 250
    for float32 inputs (iterations past the f32 arithmetic floor buy no
    accuracy, and one straggler lane stalls a whole lockstep vmapped
    fleet).  An explicitly passed ``max_iter`` is honoured as-is in every
    dtype.

    ``cache``: output of :func:`build_solver_cache` for this (P, A) — skips
    the in-solve equilibration and ρ-ladder factorization (the whole
    step-invariant setup) for receding-horizon serving.

    ``rung0``: initial ρ-ladder rung (int scalar, traced OK), typically the
    ``rung`` field of the previous control period's solution — warm-starts
    the ρ adaptation the way ``x0/y0`` warm-start the iterates.

    ``iter_budget``: optional RUNTIME iteration cap (int scalar, traced OK)
    ANDed with ``max_iter`` — the Ts-deadline policy feeds a measured
    per-iteration cost through here without retracing (``max_iter`` is a
    static trace constant, this is data).
    """
    with jax.default_matmul_precision("float32"):
        return _solve_qp_impl(P, q, A, l, u, x0, y0, sigma=sigma, rho=rho,
                              alpha=alpha, max_iter=max_iter, tol=tol,
                              tol_final=tol_final, check_every=check_every,
                              scaling=scaling, polish=polish,
                              polish_iters=polish_iters,
                              polish_delta=polish_delta,
                              polish_rounds=polish_rounds, cache=cache,
                              rung0=rung0, iter_budget=iter_budget,
                              n_lad=n_lad)


def _solve_qp_impl(P, q, A, l, u, x0=None, y0=None, *,
                   sigma=1e-6, rho=0.1, alpha=1.6,
                   max_iter=None, tol=1e-6, tol_final=1e-7, check_every=10,
                   scaling=10, polish=True, polish_iters=3, polish_delta=1e-11,
                   polish_rounds=2, cache=None, rung0=None, iter_budget=None,
                   n_lad=9):
    n = q.shape[0]
    m = l.shape[0]
    dt = q.dtype
    default_iters = max_iter is None
    if default_iters:
        max_iter = 2000
    if dt == jnp.float32:
        # f32 (TPU-native) cannot reach f64 tolerances — loosen to its floor
        tol = max(tol, 3e-5)
        tol_final = max(tol_final, 3e-4)
        polish_delta = max(polish_delta, 1e-6)
        # the f32 KKT inverse (3-pass-bf16 matmuls on TPU) converges the
        # mixed-precision refinement slowly on big active sets — extra IR
        # sweeps are matvec-cheap and rescue lanes the 3-sweep default lost
        polish_iters = max(polish_iters, 8)
        # f32 iterations past a few hundred cannot buy accuracy the
        # arithmetic floor already denies (and the polish supplies) — but a
        # single oscillating lane that dodges the plateau detector makes a
        # lockstep vmapped fleet run the FULL batch to max_iter (measured:
        # batch mean 62 iterations, one lane at the 2000 cap).  Cap the f32
        # loop — only for the DEFAULT budget: an explicit max_iter is the
        # caller's informed choice; `converged` stays an honest post-polish
        # KKT assessment either way.  Cap value: 250 (was 600) — measured
        # on the B=4096 headline fleet over 50 rotating-setpoint steps,
        # min-converged is 4089/4096 at 600 and 4088/4096 at 250 (the same
        # handful of plateau lanes fail either way and recover on the next
        # warm start), so the extra 350 lockstep iterations bought nothing
        # while the slowest lane taxed the whole fleet.
        if default_iters:
            max_iter = min(max_iter, 250)
    x = jnp.zeros(n, dt) if x0 is None else x0
    y = jnp.zeros(m, dt) if y0 is None else y0
    if m == 0:
        xs = jnp.linalg.solve(P, -q)
        ok = jnp.all(jnp.isfinite(xs))
        return QPSolution(xs, y, jnp.zeros(0, dt), ok,
                          jnp.array(0), 0.5 * xs @ P @ xs + q @ xs)

    P_orig, q_orig, A_orig, l_orig, u_orig = P, q, A, l, u
    fin_l = l > -_BIG
    fin_u = u < _BIG
    if cache is not None:
        # step-invariant setup precomputed by build_solver_cache: scale the
        # data with the cached diagonals (one elementwise pass — ~1/30th of
        # the 10-sweep Ruiz loop) and reuse the cached ladder inverses.
        # Validate the cache was built for THESE penalties when the values
        # are concrete (inside jit they are traced and the check is free to
        # skip — the builder-side APIs always pair cache and call): a cache
        # built with a different rho centres the ladder on the wrong rung
        # and pairs Minv with the wrong sigma — wrong iterates that only
        # the post-solve KKT check would catch, with no error raised.
        sc, rc = cache.get("qpc_sigma"), cache.get("qpc_rho")
        if (sc is not None and not isinstance(sc, jax.core.Tracer)
                and not isinstance(rc, jax.core.Tracer)):
            if (abs(float(sc) - sigma) > 1e-12 * max(1.0, abs(sigma))
                    or abs(float(rc) - rho) > 1e-12 * max(1.0, abs(rho))):
                raise ValueError(
                    f"solver cache was built with sigma={float(sc)}, "
                    f"rho={float(rc)} but solve_qp was called with "
                    f"sigma={sigma}, rho={rho}; rebuild the cache with "
                    "matching penalties")
        eq_mask = cache["qpc_eq"]
        loose_mask = cache["qpc_loose"]
        D = jnp.asarray(cache["qpc_D"], dt)
        Esc = jnp.asarray(cache["qpc_E"], dt)
        c = jnp.asarray(cache["qpc_c"], dt)
        P = (c * D[:, None]) * P * D[None, :]
        q = c * D * q
        A = (Esc[:, None] * A) * D[None, :]
        l = jnp.clip(Esc * l, -2e18, 2e18)
        u = jnp.clip(Esc * u, -2e18, 2e18)
        x = x / D
        y = c * y / Esc
        rhovs_lad = jnp.asarray(cache["qpc_rhovs"], dt)
        Minvs_lad = jnp.asarray(cache["qpc_Minvs"], dt)
        N_LAD = rhovs_lad.shape[0]
    else:
        eq_mask = (u - l) < 1e-12
        loose_mask = (u >= _BIG) & (l <= -_BIG)
        if scaling:
            P, q, A, D, Esc, c = _ruiz_equilibrate(P, q, A, iters=scaling)
            l = jnp.clip(Esc * l, -2e18, 2e18)
            u = jnp.clip(Esc * u, -2e18, 2e18)
            x = x / D
            y = c * y / Esc
        else:
            D = jnp.ones(n, dt)
            Esc = jnp.ones(m, dt)
            c = jnp.asarray(1.0, dt)

        # ---- ρ-ladder of precomputed inverses ---------------------------
        # TPU redesign of OSQP's adaptive-ρ refactorization: a cached
        # Cholesky costs two SERIAL triangular solves per iteration, and a
        # refactorization under vmapped lax.cond executes on every residual
        # check regardless.  Instead, ρ adaptation SNAPS to a geometric
        # ladder whose normal-matrix inverses are all precomputed up front
        # (batched matmuls + one batched inv, Newton-refined to f32-safe
        # accuracy) — the ADMM loop then contains only matmuls and gathers,
        # nothing serial.  ``n_lad`` sets the rung count: the uncached
        # (per-step H̃) path pays one batched inversion PER RUNG, so
        # warm-started serving callers (MHE fleets) pass a small ladder —
        # measured on the B=4096 MHE fleet: n_lad 9 → 3 cut the step 1.7×
        # with identical convergence (the ±1-decade span still covers the
        # warm adaptation range).
        N_LAD = int(n_lad)
        half_span = 2.0 if N_LAD >= 5 else 1.0
        lad = jnp.asarray(rho, dt) * jnp.logspace(-half_span, half_span,
                                                  N_LAD).astype(dt)

        def _build_ladder():
            rhovs = jax.vmap(lambda r: _rho_vec(eq_mask, loose_mask, r))(lad)
            Ms = P[None] + sigma * jnp.eye(n, dtype=dt)[None] + \
                jnp.einsum("ji,kj,jl->kil", A, rhovs, A)
            Minvs = jnp.linalg.inv(Ms)
            # one Newton step X ← X(2I − MX): squares the inverse's
            # residual, which keeps f32 lanes from stalling on
            # ill-conditioned problems
            Minvs = Minvs @ (2.0 * jnp.eye(n, dtype=dt)[None] - Ms @ Minvs)
            return rhovs, Minvs

        rhovs_lad, Minvs_lad = _build_ladder()

    Dinv, Einv, cinv = 1.0 / D, 1.0 / Esc, 1.0 / c
    span = 4.0 if N_LAD >= 5 or cache is not None else 2.0
    log_step = span / max(N_LAD - 1, 1)
    j0 = jnp.asarray((N_LAD - 1) // 2, jnp.int32)   # lad[j0] == rho
    if rung0 is not None:
        # carry the rung across control periods like the duals: the centre
        # restart forces every period to re-walk the ladder to the
        # problem's preferred rung, and that re-adaptation transient (each
        # rung change resets the f32 plateau counter early on) is what
        # rode single fleet lanes to the iteration cap
        j0 = jnp.clip(jnp.asarray(rung0, jnp.int32), 0, N_LAD - 1)
    if iter_budget is not None:
        # runtime (traced) cap — the Ts-deadline policy; max_iter stays the
        # static compile-time bound
        max_iter = jnp.minimum(jnp.asarray(iter_budget, jnp.int32),
                               max_iter)

    z = jnp.clip(A @ x, l, u)

    # scaling terms for relative tolerances (original units)
    qnorm = jnp.maximum(jnp.linalg.norm(Dinv * q, jnp.inf), 1.0)

    def admm_step(carry):
        x, z, y, it, _, rhov, Lm = carry
        rhs = sigma * x - q + A.T @ (rhov * z - y)
        xt = Lm @ rhs
        zt = A @ xt
        xn = alpha * xt + (1 - alpha) * x
        z_pre = alpha * zt + (1 - alpha) * z
        zn = jnp.clip(z_pre + y / rhov, l, u)
        yn = y + rhov * (z_pre - zn)
        return xn, zn, yn, it + 1, jnp.array(False), rhov, Lm

    def residuals(x, z, y):
        # residuals UNSCALED to original problem units (OSQP §5.1): the
        # user tolerance must not depend on the equilibration
        Ax = A @ x
        r_prim = jnp.linalg.norm(Einv * (Ax - z), jnp.inf)
        r_dual = cinv * jnp.linalg.norm(Dinv * (P @ x + q + A.T @ y), jnp.inf)
        s_prim = jnp.maximum(jnp.maximum(
            jnp.linalg.norm(Einv * Ax, jnp.inf),
            jnp.linalg.norm(Einv * z, jnp.inf)), 1.0)
        s_dual = cinv * jnp.maximum(jnp.maximum(
            jnp.linalg.norm(Dinv * (P @ x), jnp.inf),
            jnp.linalg.norm(Dinv * (A.T @ y), jnp.inf)), qnorm)
        return r_prim / s_prim, r_dual / (s_dual + 1e-30)

    def cond(carry):
        return (~carry[4]) & (carry[3] < max_iter)

    def body(carry):
        # run `check_every` ADMM steps then test residuals + infeasibility
        (x0_, z0_, y0_, it0, done0, infeas0, j0_, best0, stall0,
         _res_ok0) = carry
        rhov = jnp.take(rhovs_lad, j0_, axis=0)
        Lm = jnp.take(Minvs_lad, j0_, axis=0)
        def inner(i, c):
            return admm_step(c)
        x, z, y, it, _, _, _ = jax.lax.fori_loop(
            0, check_every, inner, (x0_, z0_, y0_, it0, done0, rhov, Lm))
        rp, rd = residuals(x, z, y)
        done = (rp < tol) & (rd < tol)
        # OSQP §3.4 primal-infeasibility certificate from the dual direction
        dy = y - y0_
        ndy = jnp.linalg.norm(dy, jnp.inf)
        crit1 = jnp.linalg.norm(A.T @ dy, jnp.inf) <= 1e-5 * ndy
        sup = jnp.sum(jnp.where(dy > 0, jnp.minimum(u, 1e17) * dy, 0.0)
                      + jnp.where(dy < 0, jnp.maximum(l, -1e17) * dy, 0.0))
        crit2 = sup < -1e-5 * ndy
        infeas = infeas0 | ((ndy > 1e-12) & crit1 & crit2)
        # OSQP §5.2 adaptive ρ, snapped to the precomputed ladder, with the
        # original 5× hysteresis (adapting on small imbalances ping-pongs
        # between rungs and stalls the iteration)
        ratio = jnp.sqrt((rp + 1e-18) / (rd + 1e-18))
        dj = jnp.round(jnp.log10(ratio) / log_step).astype(jnp.int32)
        move = (ratio > 5.0) | (ratio < 0.2)
        j_new = jnp.clip(j0_ + dj, 0, N_LAD - 1)
        adapt = (~done) & ~infeas & move
        j_next = jnp.where(adapt, j_new, j0_)
        # ---- plateau detection (f32 ONLY) -------------------------------
        # f32 ADMM has an arithmetic floor: on equality-heavy problems
        # (MultipleShooting defect rows) the dual residual floors ORDERS
        # above the tolerance, and certain right-hand sides put the f32
        # iteration into a genuine limit cycle (the same QP converges in
        # ~30 iterations in f64) — either way the loop would spin to
        # max_iter while the iterates stopped moving.  Exit once the worst
        # relative residual has not improved ≥2% over five consecutive
        # checks — the mixed-precision polish (f64 refinement) supplies
        # the final accuracy, and `converged` is assessed on the
        # post-polish KKT residuals either way.  The counter resets on a
        # ρ-rung change (residuals jump after one).  f64 keeps exact
        # OSQP termination semantics: its slow-but-descending phases must
        # not be mistaken for the (f32-specific) floor.
        if dt == jnp.float32:
            score = jnp.maximum(rp, rd)
            improved = score < 0.98 * best0
            best = jnp.minimum(score, best0)
            # a ρ-rung change resets the counter (residuals jump after one)
            # — but only EARLY: a lane whose rung keeps oscillating would
            # reset forever and ride to max_iter, and in a vmapped fleet
            # the lockstep while_loop makes every lane pay for that tail
            # (measured: batch mean 62 iterations, one lane at the 2000
            # cap → the whole B=4096 step ran 2000).  Past iteration 300
            # only genuine improvement resets the counter.
            reset = improved | ((j_next != j0_) & (it < 300))
            stall = jnp.where(reset, 0, stall0 + 1)
            plateau = stall >= 5
        else:
            best, stall = best0, stall0
            plateau = jnp.array(False)
        # carry slot 4 is the EXIT flag; `done` (the actual residual pass)
        # travels separately — a plateau exit must not report convergence
        return (x, z, y, it, done | infeas | plateau, infeas, j_next,
                best, stall, done)

    (x, z, y, iters, _exit, infeasible, j_fin, _, _,
     done) = jax.lax.while_loop(
        cond, body, (x, z, y, jnp.array(0), jnp.array(False), jnp.array(False),
                     j0, jnp.asarray(jnp.inf, dt), jnp.array(0),
                     jnp.array(False)))

    if polish:
        x, y, z = _polish(P, q, A, l, u, x, y, fin_l, fin_u, eq_mask,
                          iters=polish_iters, delta=polish_delta,
                          rounds=polish_rounds)

    # convergence assessed on the final (post-polish) KKT residuals: the ADMM
    # loop only needs to identify the active set; polish supplies accuracy.
    # Complementarity/dual-sign residual is REQUIRED here: the polish solves
    # an equality KKT whose multipliers can carry wrong signs, which
    # stationarity+feasibility alone cannot detect (a mis-detected active set
    # then reports "converged" at a non-optimal vertex).
    rp, rd = residuals(x, z, y)
    # unscale (x = D x̄, y = E ȳ / c, z = z̄ / E)
    x = D * x
    y = Esc * y / c
    z = z / Esc
    Ax_o = A_orig @ x
    y_pos = jnp.maximum(y, 0.0)
    y_neg = jnp.minimum(y, 0.0)
    gap_u = jnp.where(fin_u, u_orig - Ax_o, 0.0)
    gap_l = jnp.where(fin_l, Ax_o - l_orig, 0.0)
    comp_scale = jnp.maximum(jnp.max(jnp.abs(y), initial=0.0), 1.0) * \
        jnp.maximum(jnp.max(jnp.abs(Ax_o), initial=0.0), 1.0)
    comp = (jnp.max(jnp.abs(y_pos * gap_u), initial=0.0)
            + jnp.max(jnp.abs(y_neg * gap_l), initial=0.0)) / comp_scale
    # wrong-side multipliers (y>0 must pair with a FINITE upper bound, y<0
    # with a finite lower bound)
    sgn_bad = (jnp.max(jnp.where(fin_u, 0.0, y_pos), initial=0.0)
               + jnp.max(jnp.where(fin_l, 0.0, -y_neg), initial=0.0))
    tol_c = 1e2 * tol_final
    kkt_ok = (rp < tol_final) & (rd < tol_final) & (comp < tol_c) & \
        (sgn_bad < tol_c)
    converged = (kkt_ok | done) & ~infeasible
    obj = 0.5 * x @ P_orig @ x + q_orig @ x
    return QPSolution(x, y, z, converged, iters, obj, rung=j_fin)


def _polish(P, q, A, l, u, x, y, fin_l, fin_u, eq_mask=None, iters=3,
            delta=1e-11, rounds=2):
    """Iterated active-set polish with top-k gathered KKT + refinement.

    The active set is detected from BOTH the dual signs and primal proximity
    (|Ax − bound| below a row-scaled tolerance): on nearly-flat QPs (condensed
    MPC of an unstable plant, cond(H) ≳ 1e6) the ADMM duals alone misidentify
    the set and the objective gap, though relatively tiny, moves the first
    control input by O(1).  A second round re-detects the set from the first
    polished point, which empirically recovers the exact optimum (OSQP §5.2
    polish, generalized to multiple rounds).

    At a nondegenerate optimum at most ``n`` rows are active, so the KKT is
    built from the ``k = min(m, n + 8)`` highest-activity rows gathered with
    ``top_k`` (equality rows always selected) — an (n+k)² factorization
    instead of the previous (n+m)²: at condensed-MPC shapes (n≈33, m≈900)
    this is ~1000× less factorization work per polish.  A degenerate optimum
    with > k active rows polishes a subset; the best-of-rounds score below
    then keeps the plain ADMM point if the subset polish is worse.

    For float32 inputs the refinement residual is accumulated in float64
    (classic mixed-precision IR): the hot factorization stays f32/TPU-native,
    but the polished solution reaches near-f64 accuracy.
    """
    n, m = q.shape[0], l.shape[0]
    dt = q.dtype
    k = min(m, n + 8)
    hi = jnp.float64 if (dt == jnp.float32 and
                         jax.config.jax_enable_x64) else dt
    P_h, q_h = P.astype(hi), q.astype(hi)
    prox = 1e-5 if dt == jnp.float32 else 1e-7
    absA = jnp.abs(A)
    if eq_mask is None:
        eq_mask = (u - l) < 1e-12

    def one_round(x, y):
        z = A @ x
        row_scale = jnp.maximum(absA @ jnp.abs(x) + 1e-12, 1.0)
        tol_p = prox * row_scale
        act_low = (((z - l) < tol_p) | (y < -delta)) & fin_l
        act_up = (((u - z) < tol_p) | (y > delta)) & fin_u
        act_low = act_low & ~act_up
        act = act_low | act_up
        b = jnp.where(act_low, l, u)
        # rank rows by activity: equalities first, then |dual| + proximity
        margin = jnp.minimum(jnp.abs(z - l), jnp.abs(u - z)) / row_scale
        score = (act.astype(dt) * (1.0 + jnp.abs(y) + 1.0 / (margin + 1e-6))
                 + jnp.where(eq_mask, jnp.asarray(_BIG, dt), 0.0))
        _, idx = jax.lax.top_k(score, k)
        Ak = A[idx]
        actk = act[idx] | eq_mask[idx]
        bk = jnp.where(eq_mask[idx], l[idx], b[idx])
        actf = actk.astype(dt)
        Am = Ak * actf[:, None]
        # K = [[P+δI, Amᵀ], [Am, -δI - diag(1-act)]]  on the gathered rows
        K = jnp.block([
            [P + delta * jnp.eye(n, dtype=dt), Am.T],
            [Am, -delta * jnp.eye(k, dtype=dt) - jnp.diag(1.0 - actf)],
        ])
        # explicit inverse: each lu_solve is two serial triangular solves on
        # TPU; Kinv @ rhs is one matmul, and the f64 refinement below absorbs
        # the inverse's extra rounding
        Kinv = jnp.linalg.inv(K)
        rhs = jnp.concatenate([-q, actf * bk])
        Am_h, actf_h, b_h = Am.astype(hi), actf.astype(hi), bk.astype(hi)

        def refine(i, sol):
            # residual of the UNregularized system, in high precision.
            # The f64 matvecs are written as elementwise multiply+reduce:
            # XLA:TPU emulates an f64 dot_general as a multi-pass nested
            # while-loop with 8x temporaries (~100s of ms per dot at
            # B=4096 fleet shapes inside the vmapped polish — measured as
            # the DOMINANT cost of the whole MHE fleet step)
            xs, nu = sol[:n].astype(hi), sol[n:].astype(hi)
            res_top = (jnp.sum(P_h * xs[None, :], axis=1)
                       + jnp.sum(Am_h * nu[:, None], axis=0) + q_h)
            res_bot = (jnp.sum(Am_h * xs[None, :], axis=1)
                       - (1.0 - actf_h) * nu - actf_h * b_h)
            res = -jnp.concatenate([res_top, res_bot]).astype(dt)
            return sol + Kinv @ res

        sol0 = Kinv @ rhs
        sol = jax.lax.fori_loop(0, iters, refine, sol0)
        x_r, nu = sol[:n], sol[n:]
        y_r = jnp.zeros(m, dt).at[idx].set(jnp.where(actk, nu, 0.0))
        ok = jnp.all(jnp.isfinite(x_r)) & jnp.all(jnp.isfinite(y_r))
        x_r = jnp.where(ok, x_r, x)
        y_r = jnp.where(ok, y_r, y)
        return x_r, y_r

    def score(xx, yy):
        Ax = A @ xx
        viol = jnp.maximum(jnp.max(Ax - u), jnp.max(l - Ax))
        viol = jnp.maximum(viol, 0.0)
        rd = jnp.linalg.norm(P @ xx + q + A.T @ yy, jnp.inf)
        # complementarity residual: a mis-detected active set yields
        # wrong-signed / non-complementary multipliers that stationarity
        # alone can miss (the vertex looks "optimal" without it)
        y_p, y_n = jnp.maximum(yy, 0.0), jnp.minimum(yy, 0.0)
        comp = (jnp.max(jnp.abs(y_p * jnp.where(fin_u, u - Ax, 0.0)),
                        initial=0.0)
                + jnp.max(jnp.abs(y_n * jnp.where(fin_l, Ax - l, 0.0)),
                          initial=0.0))
        return jnp.where(jnp.all(jnp.isfinite(xx)), viol + rd + comp,
                         jnp.inf)

    # best-of-rounds: a later round re-detecting a worse active set must
    # not discard an earlier, strictly better polish
    best_x, best_y, best_s = x, y, score(x, y)
    x_pol, y_pol = x, y
    for _ in range(rounds):
        x_pol, y_pol = one_round(x_pol, y_pol)
        s = score(x_pol, y_pol)
        take = s <= best_s
        best_x = jnp.where(take, x_pol, best_x)
        best_y = jnp.where(take, y_pol, best_y)
        best_s = jnp.where(take, s, best_s)
    # clipped z in EVERY branch: the final residual check must measure the
    # true primal violation (z = A@x would zero it out)
    z = jnp.clip(A @ best_x, l, u)
    return best_x, best_y, z


def solve_qp_batch(P, q, A, l, u, x0=None, y0=None, **kw):
    """vmapped batch solve: leading batch axis on every argument (or None)."""
    fn = lambda P_, q_, A_, l_, u_, x0_, y0_: solve_qp(
        P_, q_, A_, l_, u_, x0_, y0_, **kw)
    in_axes = (0, 0, 0, 0, 0,
               0 if x0 is not None else None,
               0 if y0 is not None else None)
    return jax.vmap(fn, in_axes=in_axes)(P, q, A, l, u, x0, y0)
