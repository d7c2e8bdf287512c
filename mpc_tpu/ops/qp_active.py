"""Dual active-set QP solver (Goldfarb–Idnani) — the DAQP/qpOASES role.

The reference's benchmark suite uses DAQP (a dual active-set C solver) as
the low-latency alternative to OSQP for small condensed MPC QPs
(``benchmark/3_bench_predictive_control.jl:166-215``).  This is the
TPU-native equivalent: a fixed-shape, jit/vmap-able Goldfarb–Idnani method.

Why it exists alongside ``ops/qp.py``'s ADMM: first-order ADMM needs
~100–500 sequential O(mn) sweeps to reach polish-grade accuracy; GI
terminates in ~#active-set-changes pivots (typically 1–15 for warm-started
MPC) and returns the **exact** optimum — no polish needed.  It is both the
single-stream latency kernel and the batched large-problem kernel.

Problem form matches ``solve_qp``:  min ½xᵀPx + qᵀx  s.t.  l ≤ Ax ≤ u
with P strictly convex (SPD).  One-sided rows use ∓BIG bounds.  Equality
rows (l == u) are supported but cost extra pivots (each side activates
separately); condensed MPC QPs have none.

TPU design notes (each of these was measured, not guessed):

* **No linear solves inside the loop.**  A first version solved a gathered
  KKT system per pivot with ``jnp.linalg.solve``; on TPU a batched
  LAPACK-style LU is a serial row loop of small ops — ~25 ms per lockstep
  pivot at B=1024 (worse than ADMM).  This implementation is the classic
  Goldfarb–Idnani operator scheme: it carries the inverse Gram
  ``Ginv = (N̄ᵀP⁻¹N̄)⁻¹`` of the signed active normals and updates it by
  RANK-ONE bordering (add) / downdating (drop) — masked matmuls, gathers
  and outer products only.
* **One fused loop body, not a 4-way ``lax.switch``.**  Under ``vmap``
  every switch branch executes for every lane at every iteration, so a
  multi-phase solver pays the op-count of ALL phases per iteration — and
  at B=4096 the per-iteration cost is op-count × small-op dispatch, not
  bytes.  The body below is straight-line: warm-KKT work, violation scan,
  and the add/drop pivot are computed once with mode masks, and a
  selection and its first pivot step complete in the SAME iteration.
* **Slot-local tables.**  The active rows ``A[idx]`` and ``(P⁻¹aᵢ)ᵀ`` live
  in (n, nvar) state tables updated incrementally, so the loop never
  re-gathers 33 rows from the (m, nvar) tables — only single-row gathers
  of the new pivot row per add.
* **Cross-period operator carry.**  In receding-horizon MPC, (P, A) are
  step-invariant — the active-set operators (Ginv and the slot tables)
  remain EXACTLY valid across control periods.  ``state0=`` re-enters the
  solver at the warm-KKT point with the previous period's operators, so a
  quiet period costs ~2 lockstep iterations total.  All rank-one updates
  run in the hi-precision slot space (f64 when x64 is enabled), so
  cross-period drift is ~1e-16 per update and no refresh is needed; in a
  pure-f32 session (x64 disabled) the carried Ginv is f32 and drift is
  NOT healed — prefer fresh ``y0`` warm starts there.

Algorithm (Goldfarb & Idnani 1983, two-sided form): start at the
unconstrained minimum (dual feasible, primal infeasible); repeatedly pick
the most violated row/side, then take the largest step in the (primal,
dual) direction that keeps dual feasibility, dropping blocking constraints
until the new row activates.  GI maintains ≤ n linearly-independent active
normals, so the active set lives in a capacity-n slot buffer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .qp import QPSolution, _BIG


def build_gi_cache(P, A):
    """Precompute the step-invariant part of :func:`solve_qp_active`.

    Receding-horizon MPC solves the same P=H̃ every control period; GI's
    only P-dependent table is the refined inverse ``P⁻¹`` — the
    unconstrained minimum and every per-pivot column (P⁻¹aₚ) are computed
    from it with small matvecs in the solver's hi precision.  Computing
    P⁻¹ in-solve needs a Cholesky factorization plus triangular solves,
    which are SERIAL on TPU; with the cache the per-solve setup is
    matmuls.  Host NumPy f64 with one Newton refinement step, so f32 runs
    get a rounded-f64 inverse.  ``A`` is accepted for API symmetry with
    :func:`mpc_tpu.ops.qp.build_solver_cache` but UNUSED — the cache stays
    valid when only the constraint rows change.  Returns a dict of plain
    NumPy arrays (pytree-friendly: travels inside a controller's params
    dict, stacks across fleets).
    """
    import numpy as np
    del A
    P = np.asarray(P, np.float64)
    n = P.shape[0]
    Pinv = np.linalg.inv(P)
    Pinv = Pinv @ (2.0 * np.eye(n) - P @ Pinv)   # Newton: squares residual
    return dict(gic_Pinv=Pinv)


def gi_state_init(n, like=None, batch=None):
    """Fresh cross-period GI operator state (empty active set).

    ``n``: SLOT count — the decision-variable count, or the ``max_active``
    cap when the solver is called with one; ``like``: dtype reference;
    ``batch``: optional leading batch shape for fleets.  Pass the returned
    dict as ``solve_qp_active(..., state0=...)`` and feed the solution's
    ``gi_state`` back on the next control period.
    """
    import numpy as np
    import jax
    # Ginv dtype must match the solver's internal "hi" precision: f64
    # whenever x64 is available (the mixed-precision slot space), f32 only
    # in pure-f32 sessions.  ``like`` is kept for API compatibility.
    del like
    dt = np.float64 if jax.config.jax_enable_x64 else np.float32
    b = () if batch is None else (int(batch),)
    return dict(
        gis_idx=np.zeros(b + (n,), np.int32),
        gis_side=np.zeros(b + (n,), np.int32),
        gis_vmask=np.zeros(b + (n,), bool),
        gis_Ginv=np.broadcast_to(np.eye(n, dtype=dt), b + (n, n)).copy(),
    )


def solve_qp_active(P, q, A, l, u, y0=None, *, max_pivots=150, tol=1e-9,
                    cache=None, state0=None, iter_budget=None,
                    max_active=None):
    """Solve one dense QP by dual active set.  jit- and vmap-compatible.

    Exact at termination (up to the rank-one-updated operators' accuracy) —
    f64 matches reference solvers to ~1e-9; float32 works with the usual
    roundoff-floor caveats.  ``max_pivots`` bounds LOOP iterations;
    `converged` is False if the bound is hit or the duals detect primal
    infeasibility.

    ``y0`` warm-starts the ACTIVE SET from a previous solve's duals (their
    signs give the active sides): the warm phase rebuilds the slot-space
    inverse Gram by incremental bordering (one cheap lockstep iteration per
    warm row, dependent rows skipped), jumps to the equality-KKT optimum of
    that set, drops wrong-sign multipliers, then continues with the usual
    GI pivoting.

    ``state0`` (preferred for receding-horizon serving): the ``gi_state``
    of the PREVIOUS period's solution for the SAME (P, A) — re-enters at
    the warm-KKT point with the carried operators (no rebuild at all).
    Updates run in the hi-precision slot space with no refresh: with x64
    enabled the carried Ginv is f64 and cross-period drift is negligible;
    in a pure-f32 session the carried operators drift unhealed — prefer
    ``y0`` warm starts there.  Bounds may have changed: slot bounds are
    re-gathered from the live (l, u).  Overrides ``y0``.

    ``cache``: output of :func:`build_gi_cache` for this (P, A) — skips the
    in-solve Cholesky setup (serial triangular solves on TPU).

    ``iter_budget``: optional RUNTIME pivot cap (int scalar, traced OK)
    ANDed with ``max_pivots`` — the Ts-deadline policy feeds a measured
    per-pivot cost through here without retracing.

    ``max_active``: STATIC cap on the slot-buffer size (default n, the GI
    worst case).  The per-iteration cost of a lockstep fleet is the
    bandwidth of the (B, n_slots, n_slots) f64 Ginv / (B, n_slots, nvar)
    Aact tables — warm-started MPC/MHE active sets are typically ≤ 4-8
    rows, so an 8-slot buffer cuts that traffic ~10× at n≈33.  The solve
    stays EXACT whenever the solve's active-set trajectory fits the cap.
    A buffer filled with STALE warm-start rows (y0 top-k insert or a
    cross-period ``state0`` carry) that blocks a needed activation spends
    the one-shot cold restart first — the cold pivot order re-activates
    only what the trajectory needs, so an optimum that fits the cap is
    still found exactly; if the buffer fills again post-restart the
    solver reports ``converged=False`` (honest failure — re-solve with a
    larger cap).  ``state0`` slot shapes must match the cap.

    The returned :class:`QPSolution` carries ``gi_state`` for the next
    period.
    """
    with jax.default_matmul_precision("float32"):
        return _gi_impl(P, q, A, l, u, y0, max_pivots=max_pivots, tol=tol,
                        cache=cache, state0=state0, iter_budget=iter_budget,
                        max_active=max_active)


def _gi_impl(P, q, A, l, u, y0, *, max_pivots, tol, cache=None, state0=None,
             iter_budget=None, max_active=None):
    dt = q.dtype
    n = q.shape[0]
    m = A.shape[0]
    # slot-buffer size: the bandwidth knob (see solve_qp_active docstring);
    # all slot-space tables/decisions below are sized ns, the primal x and
    # the violation scan stay full-size
    if max_active is not None and int(max_active) < 1:
        raise ValueError("max_active must be ≥ 1")
    ns = n if max_active is None else min(n, int(max_active))
    if dt == jnp.float32:
        # f32 roundoff on a·x sits ~1e-7·‖a‖‖x‖; a 1e-9 test would re-pick
        # already-active rows forever (same floor policy as _solve_qp_impl)
        tol = max(tol, 3e-6)
    # MIXED PRECISION (f32 inputs + x64 available): the (m, ·) violation
    # scan runs in f32 (it touches the big A table and only RANKS rows),
    # but slot-space DECISION operators (x, λ, Ginv) and pivot decisions
    # run in f64 — those tensors are (n, n)-tiny, f64 there is
    # bandwidth-trivial, and it buys f64-grade pivoting: the measured f32
    # failure modes (period-8 add/drop cycles, false infeasibility
    # certificates on near-degenerate vertices) all disappear in f64
    # (worst-lane pivots 150 → 11 on the fleet that exposed them).  The
    # Aact slot TABLE stays in dt storage: its entries are exact copies of
    # A's f32 rows, so upcasting on use is numerically identical while the
    # fleet's (B, ns, nvar) table — the largest slot-space array — moves
    # half the bytes.
    hi = jnp.float64 if (dt == jnp.float32 and
                         jax.config.jax_enable_x64) else dt
    eps = jnp.asarray(tol, hi)
    eps_d = jnp.asarray(tol, dt)
    inf = jnp.asarray(jnp.inf, hi)
    inf_d = jnp.asarray(jnp.inf, dt)

    if cache is not None:
        Pinv = jnp.asarray(cache["gic_Pinv"], hi)
    elif n <= 8:
        # unrolled Gauss-Jordan in the hi slot precision — pure elementwise
        # ops (no dot_general, no custom call).  The cho_factor fallback
        # below is a SERIAL custom call per lane: measured 3.4 ms/step of
        # the B=1024 NonLinMPC fleet whose SQP re-solves an uncached 2-var
        # subproblem 15×/step.
        from ..utils.small_linalg import inv_spd_small
        Pinv = inv_spd_small(P.astype(hi))
    else:
        cho = jax.scipy.linalg.cho_factor(P)
        Pinv = jax.scipy.linalg.cho_solve(
            cho, jnp.eye(n, dtype=dt)).astype(hi)
    x_un = -jnp.sum(Pinv * q.astype(hi)[None, :], axis=1)  # uncon. min
    # per-pivot column (P⁻¹aₚ)ᵀ comes from the SMALL f64 Pinv (one (n,n)
    # matvec) instead of a precomputed (m, n) table: no big-table gather in
    # the loop, no f32 rounding of the column, and the fleet params shrink
    # by the whole table (≈500 MB at B=4096 condensed-MPC shapes)

    if iter_budget is not None:
        # runtime (traced) pivot cap — the Ts-deadline policy; max_pivots
        # stays the static compile-time bound
        max_pivots = jnp.minimum(jnp.asarray(iter_budget, jnp.int32),
                                 max_pivots)

    has_lo = l > -_BIG
    has_up = u < _BIG
    slot_id = jnp.arange(ns)
    # roundoff scale of each aᵢᵀx dot product: ‖aᵢ‖₂·‖x‖₂ (Cauchy–Schwarz)
    row_nrm = jnp.linalg.norm(A, axis=1)
    eye = jnp.eye(ns, dtype=hi)
    tiny = jnp.asarray(1e-30, hi)

    def bound_of(idx, side):
        return jnp.where(side > 0, u[idx], l[idx]).astype(hi)

    # hi-precision matvecs as ELEMENTWISE multiply + reduce: XLA:TPU
    # emulates an f64 dot_general as a multi-pass while-loop over f32
    # pieces with 8x temporaries and relayouts (measured ~50 ms per dot at
    # B=4096); the broadcast+sum form lowers to plain emulated elementwise
    # ops and a reduction, ~100x cheaper at slot shapes.
    def mv(M, v):          # M @ v
        return jnp.sum(M * v[None, :], axis=1)

    def vm(v, M):          # v @ M
        return jnp.sum(M * v[:, None], axis=0)

    # ---------------- initial slot state -----------------------------------
    # Slots are a FREE LIST (validity mask), not a compacted prefix: a drop
    # clears one mask bit and restores the identity diagonal of Ginv — no
    # swap-remove permutation.  (The one-hot permutation matmuls of the
    # compacted design measured ~7–10 ms EACH per lockstep iteration in
    # the f64 slot space on the v5e; the mask design deletes them, and the
    # stale Aact/Hrow rows of freed slots are masked out of every product.)
    if state0 is not None:
        idx0 = jnp.asarray(state0["gis_idx"], jnp.int32)
        side0 = jnp.asarray(state0["gis_side"], jnp.int32)
        vmask0 = jnp.asarray(state0["gis_vmask"], bool)
        Ginv0 = jnp.asarray(state0["gis_Ginv"], hi)
        # Aact is stored in the SOURCE precision dt: its entries are exact
        # copies of A's rows (and {0,1} mask products), so upcast-on-use
        # in the hi-precision products is numerically identical while the
        # fleet's (B, ns, nvar) slot-table traffic halves vs f64 storage
        Aact0 = jnp.where(vmask0[:, None], A[idx0], jnp.asarray(0.0, dt))
        # NOTE: no Newton refresh of the carried Ginv — all updates run in
        # the f64 slot space, so cross-period drift is ~1e-16 per rank-one
        # update (the refresh was an artifact of the f32-slot era, and its
        # f64 matmuls would pay the dot-emulation cost at every solve)
        widx = jnp.zeros(ns, jnp.int32)
        wside = jnp.zeros(ns, jnp.int32)
        wcnt = jnp.asarray(0, jnp.int32)
        warm0 = jnp.asarray(True)
    else:
        idx0 = jnp.zeros(ns, jnp.int32)
        side0 = jnp.zeros(ns, jnp.int32)
        vmask0 = jnp.zeros(ns, bool)
        Ginv0 = eye
        Aact0 = jnp.zeros((ns, A.shape[1]), dt)
        if y0 is None:
            widx = jnp.zeros(ns, jnp.int32)
            wside = jnp.zeros(ns, jnp.int32)
            wcnt = jnp.asarray(0, jnp.int32)
            warm0 = jnp.asarray(False)
        else:
            # seed the warm list from the previous duals: sign gives the
            # side, magnitude ranks the candidates (≤ n can be active)
            usable = jnp.where(y0 > 0, has_up, has_lo)
            mag = jnp.where(usable, jnp.abs(y0), 0.0)
            topv, topi = jax.lax.top_k(mag, min(ns, m))
            hot = topv > 1e-12
            wcnt = jnp.sum(hot).astype(jnp.int32)
            widx = jnp.zeros(ns, jnp.int32).at[:topi.shape[0]].set(
                topi.astype(jnp.int32))
            wside = jnp.zeros(ns, jnp.int32).at[:topi.shape[0]].set(
                jnp.where(hot, jnp.where(y0[topi] > 0, 1, -1), 0)
                .astype(jnp.int32))
            warm0 = jnp.asarray(True)

    # ---------------- mask-based slot-update primitives -------------------
    # No scatters, no permutations, no dynamic indexing of hi arrays:
    # everything is one-hot outer products and masked matmuls.

    def onehot(i):
        return (slot_id == i).astype(hi)

    def add_update(Ginv, Aact, r, sc, app, arow):
        e = onehot(app)
        w = r - e
        Gv = (Ginv + jnp.outer(w, w) / jnp.maximum(sc, tiny)
              - jnp.outer(e, e))
        # Aact stays in dt storage (see Aact0): mask and row are downcast
        # exactly ({0,1} and f32-sourced values)
        e_d = e.astype(dt)
        Aacta = Aact * (1.0 - e_d)[:, None] + jnp.outer(e_d, arow.astype(dt))
        return Gv, Aacta

    def drop_update(Ginv, k):
        """Free slot k: rank-one downdate zeroes row/col k of Ginv; adding
        e_k e_kᵀ restores the freed slot's identity diagonal.  Aact keeps
        its (now-masked) stale row; multipliers are maintained by the
        callers (the warm adopt recomputes them from the KKT)."""
        e_k = onehot(k)
        ck = vm(e_k, Ginv)                         # row k == column k (sym)
        piv = jnp.maximum(jnp.sum(ck * e_k), tiny)
        return Ginv - jnp.outer(ck, ck) / piv + jnp.outer(e_k, e_k)

    # ---------------- warm loop (insert + KKT jump + wrong-sign drops) ----
    # Hoisted OUT of the main loop: under vmap every lane executes every
    # op of the body at every lockstep iteration, so warm-only work
    # (slot-table rebuild, KKT multipliers) must not ride along for the
    # pivot iterations of the slowest lane.

    def warm_body(st):
        idx, side, lam, vmask = (st["idx"], st["side"], st["lam"],
                                 st["vmask"])
        Ginv, Aact = st["Ginv"], st["Aact"]
        s = jnp.where(vmask, side, 0).astype(hi)
        free = ~jnp.all(vmask)
        inserting = st["wpos"] < wcnt
        # --- insert one pending warm row (bordering update) --------------
        wsel = jnp.minimum(st["wpos"], ns - 1)
        cand = widx[wsel]
        cspf = wside[wsel].astype(hi)
        arow = A[cand].astype(hi)
        col = mv(Pinv, arow)
        g = jnp.where(vmask, mv(Aact, col) * s * cspf, 0.0)
        gamma = jnp.sum(arow * col)
        r = jnp.where(vmask, mv(Ginv, g), 0.0)
        sc = gamma - jnp.sum(g * r)
        ins_ok = inserting & (sc > eps * jnp.maximum(1.0, gamma)) & free
        app = jnp.argmin(vmask)            # first free slot
        Gv_add, Aact_add = add_update(Ginv, Aact, r, sc, app, arow)
        # --- KKT jump of the current set + wrong-sign drop ---------------
        bnd_act = bound_of(idx, side)
        dvec = s * (mv(Aact, x_un) - bnd_act)
        lamw = mv(Ginv, jnp.where(vmask, dvec, 0.0))
        lam_chk = jnp.where(vmask, lamw, inf)
        k_w = jnp.argmin(lam_chk)
        negw = jnp.min(lam_chk) < -eps
        kkt = ~inserting
        adopt = kkt & ~negw
        wdrop = kkt & negw
        Gv_drop = drop_update(Ginv, k_w)
        e_w = slot_id == k_w

        def pick(add_v, drop_v, keep_v):
            return jnp.where(ins_ok, add_v, jnp.where(wdrop, drop_v, keep_v))

        ii = slot_id == app
        return dict(
            x=jnp.where(adopt, x_un - mv(Pinv, vm(s * lamw, Aact)),
                        st["x"]),
            idx=jnp.where(ins_ok, jnp.where(ii, cand, idx), idx),
            side=jnp.where(ins_ok, jnp.where(ii, wside[wsel], side), side),
            lam=jnp.where(adopt,
                          jnp.where(vmask, jnp.maximum(lamw, 0.0), 0.0), lam),
            vmask=pick(vmask | ii, vmask & ~e_w, vmask),
            Ginv=pick(Gv_add, Gv_drop, Ginv),
            Aact=jnp.where(ins_ok, Aact_add, Aact),
            wpos=st["wpos"] + inserting.astype(jnp.int32),
            it=st["it"] + 1,
            done=st["done"] | adopt,
        )

    def warm_cond(st):
        return (~st["done"]) & (st["it"] < max_pivots)

    stw = dict(x=x_un, idx=idx0, side=side0, lam=jnp.zeros(ns, hi),
               vmask=vmask0, Ginv=Ginv0, Aact=Aact0,
               wpos=jnp.asarray(0, jnp.int32),
               it=jnp.asarray(0, jnp.int32),
               done=~(warm0 | (wcnt > 0)))
    stw = jax.lax.while_loop(warm_cond, warm_body, stw)

    # ---------------- main loop: fused select + pivot step ----------------
    # One lockstep iteration = (selection scan if between pivots) + one
    # add/drop step toward the selected row.  All rank-one updates are
    # single outer-product identities; the only big-table work per
    # iteration is the A@x violation scan and one f32 row gather.

    def body(st):
        idx, side, lam, vmask = (st["idx"], st["side"], st["lam"],
                                 st["vmask"])
        Ginv, Aact = st["Ginv"], st["Aact"]
        x = st["x"]
        s = jnp.where(vmask, side, 0).astype(hi)
        free = ~jnp.all(vmask)

        # --- violation scan in dt (touches the big A table; only RANKS) ---
        x_d = x.astype(dt)
        Ax = A @ x_d
        scale = jnp.maximum(row_nrm * jnp.linalg.norm(x_d), 1.0)
        vl = jnp.where(has_lo, l - Ax, -inf_d)
        vu = jnp.where(has_up, Ax - u, -inf_d)
        v = jnp.maximum(vl, vu)
        j = jnp.argmax(v / scale)
        opt = v[j] / scale[j] <= eps_d
        j_side = jnp.where(vu[j] >= vl[j], 1, -1).astype(jnp.int32)

        cont = st["p"] >= 0               # continuing a partial activation
        fresh = ~cont & ~opt
        stepping = cont | fresh
        p_eff = jnp.where(cont, st["p"], j).astype(jnp.int32)
        sp = jnp.where(cont, st["sp"], j_side).astype(jnp.int32)
        spf = sp.astype(hi)
        slack = jnp.where(cont, st["slack"],
                          jnp.maximum(v[j], 0.0).astype(hi))
        lam_p = jnp.where(cont, st["lam_p"], 0.0)

        # --- Gram work for the pivot row (hi precision) -------------------
        arow = A[p_eff].astype(hi)        # (nvar,) row gather
        col = mv(Pinv, arow)              # (P⁻¹aₚ): exact from f64 Pinv
        g = jnp.where(vmask, mv(Aact, col) * s * spf, 0.0)
        gamma = jnp.sum(arow * col)
        r = jnp.where(vmask, mv(Ginv, g), 0.0)
        sc = gamma - jnp.sum(g * r)       # Schur complement = −sp·aᵀz

        # --- step lengths --------------------------------------------------
        t2 = jnp.where(sc > eps, slack / jnp.maximum(sc, tiny), inf)
        ratio = jnp.where(vmask & (r > eps), lam / jnp.maximum(r, eps), inf)
        k_b = jnp.argmin(ratio)
        t1 = jnp.min(ratio)               # no dynamic read of an hi array
        t = jnp.minimum(t1, t2)
        infeas_raw = stepping & ~jnp.isfinite(t)
        t = jnp.where(jnp.isfinite(t), t, 0.0)
        z = mv(Pinv, vm(r * s, Aact)) - spf * col
        x_step = x + t * z
        lam_step = jnp.where(vmask, jnp.maximum(lam - t * r, 0.0), lam)
        lam_p_new = lam_p + t
        slack_new = jnp.maximum(slack - t * sc, 0.0)
        full = (t2 <= t1) & jnp.isfinite(t2) & free
        do_add = stepping & full & ~infeas_raw
        # drop only when the BLOCKING step is actually the one taken
        # (t1 ≤ t2): with a full slot buffer (free=False) and roundoff
        # giving finite t2 ≤ t1, an unconditional ~full drop would evict
        # slot argmin(ratio) whose multiplier λ−t2·r is still strictly
        # positive — silently discarding dual mass (unreachable in exact
        # arithmetic, but this IS the f32-degenerate regime)
        do_drop = (stepping & ~full & (t1 <= t2) & ~infeas_raw
                   & jnp.isfinite(t1))
        # SLOT-BUFFER OVERFLOW (max_active < active-set size): the selected
        # row must activate (t2 ≤ t1) but no slot is free.  The solve
        # CANNOT proceed correctly — taking the t2 step without activating
        # the row breaks the GI invariant "x minimizes over the active
        # set", after which a clean violation scan would falsely certify
        # optimality.  A warm start (y0 top-k insert or a cross-period
        # state0 carry) can fill the buffer with STALE rows that the
        # optimum does not need, so a first overflow spends the one-shot
        # cold restart (the cold pivot order re-activates only what the
        # trajectory needs); only a POST-restart overflow terminates with
        # converged=False.
        overflow_raw = (stepping & ~free & jnp.isfinite(t2) & (t2 <= t1)
                        & ~infeas_raw)

        # --- f32 anti-cycling.  Exact GI cannot cycle (the dual objective
        # strictly increases), but f32 DATA on near-degenerate vertices
        # still produces measured add/drop cycles and false infeasibility
        # certificates.  Detectors: (a) n+2 consecutive zero-length steps;
        # (b) a fresh selection RE-PICKS a row dropped within the last two
        # drops, 4 times in a row — the signature of the measured period-8
        # add/drop cycles, and (unlike a stalled-violation heuristic) it
        # can never fire on benign cold solves that legitimately activate
        # many equal-violation rows, because those make no drops at all;
        # (c) an infeasibility certificate on the first try.  Escape = ONE
        # cold restart from the unconstrained minimum (the cold pivot
        # order avoids the degenerate vertex); post-restart certificates
        # are honored and reported.  NOTE: the restart budget is ONE SHOT
        # SHARED across all escape triggers (stall, cycling, infeasibility,
        # slot-cap overflow): a lane that spends it clearing warm-start
        # pollution cannot escape a later f32 degenerate cycle in the same
        # solve and burns pivots to max_pivots, reporting converged=False —
        # honest but slower (advisor r04; kept one-shot deliberately, a
        # second restart from the same cold point cannot help).
        zero_run = jnp.where(stepping & (t <= tiny), st["zrun"] + 1, 0)
        rehit = fresh & ((j == st["d1"]) | (j == st["d2"]))
        vstall = jnp.where(rehit, st["vstall"] + 1,
                           jnp.where(fresh, 0, st["vstall"]))
        restart = (~st["restarted"]) & ((zero_run > ns + 2) | (vstall >= 4)
                                        | infeas_raw | overflow_raw)
        infeasible = infeas_raw & st["restarted"]
        overflow = overflow_raw & st["restarted"]

        app = jnp.argmin(vmask)            # first free slot
        e_b = slot_id == k_b
        ii = slot_id == app
        e_app = ii.astype(hi)
        # --- UNIFIED rank-one update: add, drop and keep are all
        #   Ginv + c1·aaᵀ + c2·bbᵀ
        # (add: a=w=r−e_app, c1=1/sc, b=e_app, c2=−1;  drop: a=row k of
        # Ginv, c1=−1/piv, b=e_k, c2=+1;  keep: c1=c2=0).  One fused
        # expression touches the (n,n) hi array ~4× per iteration instead
        # of ~10 — on TPU the f64 slot arrays are the iteration's entire
        # bandwidth bill, so the op count on them IS the step time.
        e_bh = e_b.astype(hi)
        ck = vm(e_bh, Ginv)                        # row k == column k (sym)
        piv = jnp.maximum(jnp.sum(ck * e_bh), tiny)
        w = r - e_app
        a_vec = jnp.where(do_add, w, ck)
        c1 = jnp.where(do_add, 1.0 / jnp.maximum(sc, tiny),
                       jnp.where(do_drop, -1.0 / piv, 0.0))
        b_vec = jnp.where(do_add, e_app, e_b.astype(hi))
        c2 = jnp.where(do_add, -1.0, jnp.where(do_drop, 1.0, 0.0))
        Ginv_n = (Ginv + c1 * jnp.outer(a_vec, a_vec)
                  + c2 * jnp.outer(b_vec, b_vec))
        am = jnp.where(do_add, e_app, 0.0)         # add-row write mask
        am_d = am.astype(dt)                       # Aact dt storage (exact)
        Aact_n = (Aact * (1.0 - am_d)[:, None]
                  + jnp.outer(am_d, arow.astype(dt)))

        def pick(add_v, drop_v, keep_v):
            return jnp.where(do_add, add_v, jnp.where(do_drop, drop_v,
                                                      keep_v))

        # keep path must NOT apply the step's dual update: on the final
        # (optimal) iteration the scan can "select" an already-active row
        # whose dependent direction r = e_slot would wrongly drain that
        # slot's multiplier through lam_step
        nxt = dict(
            x=jnp.where(stepping & ~infeas_raw & ~overflow_raw, x_step, x),
            idx=jnp.where(do_add, jnp.where(ii, p_eff, idx), idx),
            side=jnp.where(do_add, jnp.where(ii, sp, side), side),
            lam=pick(jnp.where(ii, lam_p_new, lam_step),
                     lam_step * (1.0 - e_b.astype(hi)),
                     jnp.where(stepping & ~overflow_raw, lam_step, lam)),
            vmask=pick(vmask | ii, vmask & ~e_b, vmask),
            Ginv=Ginv_n,
            Aact=Aact_n,
            p=jnp.where(do_drop, p_eff, -1).astype(jnp.int32),
            sp=jnp.where(do_drop, sp, 0).astype(jnp.int32),
            slack=jnp.where(do_drop, slack_new, 0.0),
            lam_p=jnp.where(do_drop, lam_p_new, 0.0),
            zrun=zero_run,
            d1=jnp.where(do_drop, idx[k_b], st["d1"]).astype(jnp.int32),
            d2=jnp.where(do_drop, st["d1"], st["d2"]).astype(jnp.int32),
            vstall=vstall,
            it=st["it"] + 1,
            done=st["done"] | infeasible | overflow | (~cont & opt),
            feas=st["feas"] & ~infeasible & ~overflow,
        )
        # cold restart overrides everything except the iteration counter
        return dict(
            x=jnp.where(restart, x_un, nxt["x"]),
            idx=jnp.where(restart, jnp.zeros(ns, jnp.int32), nxt["idx"]),
            side=jnp.where(restart, jnp.zeros(ns, jnp.int32), nxt["side"]),
            lam=jnp.where(restart, jnp.zeros(ns, hi), nxt["lam"]),
            vmask=jnp.where(restart, jnp.zeros(ns, bool), nxt["vmask"]),
            Ginv=jnp.where(restart, eye, nxt["Ginv"]),
            Aact=jnp.where(restart, jnp.zeros_like(Aact), nxt["Aact"]),
            p=jnp.where(restart, -1, nxt["p"]).astype(jnp.int32),
            sp=jnp.where(restart, 0, nxt["sp"]).astype(jnp.int32),
            slack=jnp.where(restart, 0.0, nxt["slack"]),
            lam_p=jnp.where(restart, 0.0, nxt["lam_p"]),
            zrun=jnp.where(restart, 0, nxt["zrun"]),
            d1=jnp.where(restart, -1, nxt["d1"]).astype(jnp.int32),
            d2=jnp.where(restart, -1, nxt["d2"]).astype(jnp.int32),
            vstall=jnp.where(restart, 0, nxt["vstall"]),
            restarted=st["restarted"] | restart,
            it=nxt["it"], done=nxt["done"], feas=nxt["feas"],
        )

    def cond(st):
        return (~st["done"]) & (st["it"] < max_pivots)

    st0 = dict(x=stw["x"], idx=stw["idx"], side=stw["side"], lam=stw["lam"],
               vmask=stw["vmask"], Ginv=stw["Ginv"], Aact=stw["Aact"],
               p=jnp.asarray(-1, jnp.int32), sp=jnp.asarray(0, jnp.int32),
               slack=jnp.asarray(0.0, hi), lam_p=jnp.asarray(0.0, hi),
               zrun=jnp.asarray(0, jnp.int32),
               d1=jnp.asarray(-1, jnp.int32), d2=jnp.asarray(-1, jnp.int32),
               vstall=jnp.asarray(0, jnp.int32),
               restarted=jnp.asarray(False),
               it=stw["it"],
               done=jnp.asarray(False), feas=jnp.asarray(True))
    st = jax.lax.while_loop(cond, body, st0)
    # duals back to row space, OSQP sign convention (+ at upper bound)
    contrib = jnp.where(st["vmask"], st["side"].astype(hi) * st["lam"],
                        0.0).astype(dt)
    y = jnp.zeros(m, dt).at[st["idx"]].add(contrib)
    x = st["x"].astype(dt)
    gi_state = dict(gis_idx=st["idx"], gis_side=st["side"],
                    gis_vmask=st["vmask"], gis_Ginv=st["Ginv"])
    return QPSolution(x=x, y=y, z=A @ x,
                      converged=st["done"] & st["feas"], iters=st["it"],
                      obj=0.5 * x @ P @ x + q @ x, gi_state=gi_state)
