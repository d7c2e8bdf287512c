"""Construct-time MHE window prediction matrices + GI window-QP backend.

The reference builds the MHE window prediction matrices E, G, J, B once at
construction (src/estimator/mhe/transcription.jl:20-260) and its per-step QP
update only refreshes the q̃/H̃ truncations (mhe/execute.jl:390-457).  This
module is the TPU-native equivalent for the LinModel + SingleShooting path:

* ``build_pred_mats`` — all window maps as plain NumPy arrays at construct
  time.  With the decision vector Z̃ = [ϵ?; x̂arr; Ŵ] the window rollout is

      X̂  = Sx·x̂arr + Sw·Ŵ + Su·vec(U) + Sd·vec(Df) + s1       (He·nx̂,)
      Ŷm = Mx·x̂arr + Mw·Ŵ + (per-step data offset c_y)          (He·nym,)

  so the QP constraint matrix is **constant** — the growing window enters
  only through masked bounds (invalid slots get ±BIG) and the masked
  weights of H̃, exactly like the reference's truncated updates.
* ``build_step_qp`` — the per-step H̃ (depends only on the SHARED
  ``mask_w`` and ``invP̄``) and its Newton-refined inverse for the GI
  cache, host NumPy f64: a 33×33 build costs microseconds while the
  previous in-graph ``jacfwd`` + in-solve ρ-ladder cost 0.6 s per fleet
  step at B=4096.
* ``make_assembler`` — the jitted per-lane (q, l, u) assembly: two small
  matvecs from the window data.  The QP is then solved by the exact GI
  active-set kernel (:func:`mpc_tpu.ops.qp_active.solve_qp_active`) with
  the previous step's duals (slot-shifted) as warm start — the same trade
  that made the batched LinMPC fleets fast.

Applicability: LinModel, SingleShooting, nc == 0, and no NaN measurement
inside the current window (a NaN changes the per-lane V-row weights and
hence H̃; callers fall back to the general in-graph solver for those
steps).  Both the p=0 (direct/filter) and p=1 (predictor) forms are built.
"""
from __future__ import annotations

import numpy as np

from ..utils.config import BIG


def build_pred_mats(estim):
    """Window prediction matrices for a LinModel MHE (NumPy f64).

    Mirrors the semantics of the in-graph ``rollout`` of
    :class:`~mpc_tpu.estimators.mhe.MovingHorizonEstimator` exactly:
    p=0: x̂(j) = Â x̂(j−1) + B̂u u(j) + B̂d d(j) + (f̂op−x̂op) + ŵ(j),
    ŷm(j) = Ĉm x̂(j) + D̂dm d(j+1);  p=1 uses d(j+1) in the dynamics and
    evaluates outputs at [x̂arr, X̂[:-1]].
    """
    m = estim.model
    He, nx = estim.He, estim.nx_hat
    nu, nd, nym = m.nu, m.nd, estim.nym
    A = np.asarray(estim.A_hat, float)
    Bu = np.asarray(estim.Bu_hat, float)
    Bd = (np.asarray(estim.Bd_hat, float) if nd else np.zeros((nx, 0)))
    Cm = np.asarray(estim.Cm_hat, float)
    Ddm = (np.asarray(estim.Ddm_hat, float) if nd else np.zeros((nym, 0)))
    p_form = 0 if estim.direct else 1
    n_eps = estim.n_eps
    nZt = n_eps + nx + He * nx

    Ap = [np.eye(nx)]
    for _ in range(He):
        Ap.append(A @ Ap[-1])
    Sx = np.vstack([Ap[j + 1] for j in range(He)])
    Sw = np.zeros((He * nx, He * nx))
    Su = np.zeros((He * nx, He * nu))
    Sd = np.zeros((He * nx, He * nd))
    for j in range(He):
        for k in range(j + 1):
            blk = Ap[j - k]
            Sw[j * nx:(j + 1) * nx, k * nx:(k + 1) * nx] = blk
            Su[j * nx:(j + 1) * nx, k * nu:(k + 1) * nu] = blk @ Bu
            if nd:
                Sd[j * nx:(j + 1) * nx, k * nd:(k + 1) * nd] = blk @ Bd
    fop = np.asarray(estim.fop_hat - estim.xop_hat, float)
    acc = np.zeros((nx, nx))
    s1 = np.zeros(He * nx)
    for j in range(He):
        acc = acc + Ap[j]
        s1[j * nx:(j + 1) * nx] = acc @ fop

    # measurement maps (on [x̂arr; Ŵ])
    Cm_blk = np.kron(np.eye(He), Cm)
    if p_form == 0:
        Mx = Cm_blk @ Sx
        Mw = Cm_blk @ Sw
    else:
        Xm_x = np.vstack([np.eye(nx)] + [Ap[j + 1] for j in range(He - 1)])
        Xm_w = np.zeros((He * nx, He * nx))
        Xm_w[nx:, :] = Sw[:-nx, :]
        Mx = Cm_blk @ Xm_x
        Mw = Cm_blk @ Xm_w

    # full-width maps on Z̃ = [ϵ?; x̂arr; Ŵ]
    def widen(Bx, Bw):
        out = np.zeros((Bx.shape[0], nZt))
        out[:, n_eps:n_eps + nx] = Bx
        out[:, n_eps + nx:] = Bw
        return out

    Gx = widen(Sx, Sw)                       # X̂ map
    Gy = widen(Mx, Mw)                       # Ŷm map
    E_a = np.zeros((nx, nZt))
    E_a[:, n_eps:n_eps + nx] = np.eye(nx)
    E_w = np.zeros((He * nx, nZt))
    E_w[:, n_eps + nx:] = np.eye(He * nx)

    # base constraint rows: [x̂arr; X̂ window; Ŵ; V̂] — V̂ = r − Gy·Z̃ so its
    # base row is −Gy with per-lane offset r = y0m − c_y
    M_all = np.vstack([E_a, Gx, E_w, -Gy])
    return dict(He=He, nx=nx, nu=nu, nd=nd, nym=nym, n_eps=n_eps, nZt=nZt,
                p_form=p_form, Sx=Sx, Sw=Sw, Su=Su, Sd=Sd, s1=s1,
                Cm=Cm, Ddm=Ddm, Gx=Gx, Gy=Gy, E_a=E_a, E_w=E_w, M_all=M_all,
                n_rows0=M_all.shape[0])


def build_rows(mats, C_xmin, C_xmax, C_wmin, C_wmax, C_vmin, C_vmax):
    """Final constraint matrix with the softness (ϵ) columns folded in.

    n_eps=0 → two-sided rows (l ≤ M·Z̃ ≤ u), one row per bound pair.
    n_eps=1 → one-sided ≥/≤ row blocks (the ϵ coefficient differs per
    side) plus the ϵ ≥ 0 row, mirroring the general solver's row set.
    """
    M = mats["M_all"]
    if mats["n_eps"] == 0:
        return M
    nx = mats["nx"]
    cmin = np.concatenate([np.asarray(C_xmin, float),
                           np.asarray(C_wmin, float),
                           np.asarray(C_vmin, float)])
    cmax = np.concatenate([np.asarray(C_xmax, float),
                           np.asarray(C_wmax, float),
                           np.asarray(C_vmax, float)])
    A_min = M.copy()
    A_min[:, 0] = cmin            # M·Z̃ + Cmin·ϵ ≥ lo
    A_max = M.copy()
    A_max[:, 0] = -cmax           # M·Z̃ − Cmax·ϵ ≤ hi
    e_eps = np.zeros((1, mats["nZt"]))
    e_eps[0, 0] = 1.0
    return np.vstack([A_min, A_max, e_eps])


def build_step_qp(mats, mask_w, invP, invQ, invR, Cwt):
    """Per-step H̃ (QP ``P`` matrix) and its Newton-refined inverse.

    ``mask_w`` and ``invP̄`` are SHARED across a fleet (the arrival-cov
    recursion is data-independent for the LinModel covestim), so one host
    NumPy build serves every lane.  Invalid Ŵ slots get unit weight
    (driving them to 0) exactly like the in-graph objective.
    """
    He, nx, nym, n_eps = (mats["He"], mats["nx"], mats["nym"],
                          mats["n_eps"])
    Gy, E_a, E_w = mats["Gy"], mats["E_a"], mats["E_w"]
    mask_w = np.asarray(mask_w, float)
    Rbar = np.kron(np.diag(mask_w), np.asarray(invR, float))
    Qbar = (np.kron(np.diag(mask_w), np.asarray(invQ, float))
            + np.kron(np.diag(1.0 - mask_w), np.eye(nx)))
    P = 2.0 * (Gy.T @ Rbar @ Gy + E_a.T @ np.asarray(invP, float) @ E_a
               + E_w.T @ Qbar @ E_w)
    if n_eps:
        P[0, 0] += 2.0 * float(Cwt)
    Pinv = np.linalg.inv(P)
    Pinv = Pinv @ (2.0 * np.eye(P.shape[0]) - P @ Pinv)  # Newton refinement
    return P, Pinv


def make_assembler(mats):
    """Jitted per-lane (q, l, u, c_x, r) assembly from the window data.

    Returns a pure function of
    ``(U0 (He,nu), D0 (He+1,nd), Y0m_nn (He,nym), x_prior (nx̂),
    mask_w (He,), invP (nx̂,nx̂), bounds dict)`` — vmap it over the lane
    axis for fleets.  ``Y0m_nn`` must be nan_to_num'd; masked slots are
    inert (zero weight + ±BIG bounds).  All arrays may be f32; the exact
    solve happens in the GI kernel's hi-precision slot space.
    """
    import jax.numpy as jnp

    He, nx, nym, n_eps = (mats["He"], mats["nx"], mats["nym"],
                          mats["n_eps"])
    p_form = mats["p_form"]

    def assemble(c, U0, D0, Y0m, x_prior, mask_w, invP, mask_v=None):
        """``mask_v`` (He, nym), optional: per-element V-row validity —
        ``mask_w`` broadcast AND non-NaN measurement.  Defaults to the
        broadcast of ``mask_w`` (no NaN in the window).  With a diagonal
        ``invR`` the elementwise masking reproduces the general solver's
        NaN semantics (masked V residuals, mhe.py objective) exactly; the
        matching H̃ downdate is :func:`make_nan_downdate`."""
        dt = U0.dtype
        if mask_v is None:
            mask_v = mask_w[:, None] * jnp.ones((1, nym), mask_w.dtype)
        uvec = U0.reshape(-1)
        Df = (D0[:-1] if p_form == 0 else D0[1:]).reshape(-1)
        cx = c["Su"] @ uvec + c["Sd"] @ Df + c["s1"]          # (He·nx,)
        cxm = (cx if p_form == 0
               else jnp.concatenate([jnp.zeros(nx, dt), cx[:-nx]]))
        cy = (cxm.reshape(He, nx) @ c["Cm"].T + D0[1:] @ c["Ddm"].T)
        r = (Y0m - cy).reshape(-1)                            # (He·nym,)
        # gradient: q = −2·Gyᵀ R̄ r − 2·E_aᵀ invP̄ x_prior
        rr = (((Y0m - cy) * mask_v) @ c["invR"]) * mask_v
        q = -2.0 * (rr.reshape(-1) @ c["Gy"])
        q = q.at[n_eps:n_eps + nx].add(-2.0 * (invP @ x_prior))
        # bounds per base-row section (arrival, X̂ window, Ŵ, V̂)
        big = jnp.asarray(BIG, dt)
        mxr = jnp.repeat(mask_w, nx) > 0
        mvr = mask_v.reshape(-1) > 0
        lo = jnp.concatenate([
            c["Xmin"][:nx],
            jnp.where(mxr, c["Xmin"][nx:] - cx, -big),
            jnp.where(mxr, c["Wmin"], -big),
            jnp.where(mvr, c["Vmin"] - r, -big)])
        hi = jnp.concatenate([
            c["Xmax"][:nx],
            jnp.where(mxr, c["Xmax"][nx:] - cx, big),
            jnp.where(mxr, c["Wmax"], big),
            jnp.where(mvr, c["Vmax"] - r, big)])
        if n_eps:
            n0 = lo.shape[0]
            l_full = jnp.concatenate([lo, jnp.full(n0, -big, dt),
                                      jnp.zeros(1, dt)])
            u_full = jnp.concatenate([jnp.full(n0, big, dt), hi,
                                      jnp.full(1, big, dt)])
        else:
            l_full, u_full = lo, hi
        return q, l_full, u_full, cx, r

    return assemble


def make_nan_downdate(mats):
    """Per-lane (H̃, H̃⁻¹) low-rank downdate for NaN'd V rows (diag invR).

    A NaN measurement element removes exactly one scalar V row from the
    window objective (the general solver's masked-residual semantics,
    reference ``src/estimator/mhe/transcription.jl:1173-1186``), i.e. the
    shared H̃ loses ``2·invR_jj · gy_j gy_jᵀ`` for each NaN'd element j.
    This returns a jax fn ``downdate(Pq, Pinv, w_nan) -> (Pq_l, Pinv_l)``
    with ``w_nan`` (He·nym,) the per-lane removed weights (``2·invR_jj``
    where NaN inside the valid window, else 0): ``Pq_l`` by one small
    matmul, ``Pinv_l`` by a Sherman–Morrison chain over the He·nym
    candidate rows (zero-weight rows are exact no-ops) plus one Newton
    refinement step to bound f32 drift.  vmap it over the lane axis —
    this is what keeps a 1%-NaN fleet on the fast path instead of
    de-fast-pathing all B lanes to the general solver for He steps.

    Matvecs are written as broadcast-multiply + sum: under x64 an f64
    ``dot_general`` on TPU is emulated as a multi-pass while-loop (~100×
    slower than elementwise, see ops/qp_active.py mv/vm).
    """
    import jax
    import jax.numpy as jnp

    Gy_np = np.asarray(mats["Gy"], float)
    m_rows = Gy_np.shape[0]

    def downdate(Pq, Pinv, w_nan):
        Gy_q = jnp.asarray(Gy_np, Pq.dtype)
        wq = w_nan.astype(Pq.dtype)
        Pq_l = Pq - (Gy_q * wq[:, None]).T @ Gy_q
        Gy_p = jnp.asarray(Gy_np, Pinv.dtype)
        wp = w_nan.astype(Pinv.dtype)

        def body(P, j):
            g = Gy_p[j]
            s = wp[j]
            u = jnp.sum(P * g[None, :], axis=1)        # P @ g (symmetric P)
            denom = 1.0 - s * jnp.sum(g * u)
            return P + (s / denom) * jnp.outer(u, u), 0

        P_l, _ = jax.lax.scan(body, Pinv, jnp.arange(m_rows))
        if P_l.dtype != jnp.float64:
            # one Newton step vs the downdated H̃ bounds the f32 SM chain's
            # drift (the GI kernel expects a refined inverse in its cache).
            # Skipped in f64 — the chain is already accurate there, and a
            # per-lane (n,n) f64 matmul is the pathological emulated
            # dot_general on TPU (~50 ms per dot at fleet shapes)
            Pq_p = Pq_l.astype(P_l.dtype)
            P_l = P_l @ (2.0 * jnp.eye(P_l.shape[0], dtype=P_l.dtype)
                         - Pq_p @ P_l)
        return Pq_l, P_l

    return downdate


def shift_warm_duals(mats, y, moving):
    """Slot-shift the previous step's duals when the window moves: section
    blocks (X̂, Ŵ, V̂) drop slot 0 and zero the new last slot; arrival-row
    (and ϵ-row) duals are kept.  Works on (..., m) arrays (host or jnp)."""
    import jax.numpy as jnp

    He, nx, nym, n_eps = (mats["He"], mats["nx"], mats["nym"],
                          mats["n_eps"])
    xp = jnp if hasattr(y, "ndim") and not isinstance(y, np.ndarray) else np

    def shift_sec(block, n):
        b = block.reshape(block.shape[:-1] + (He, n))
        z = xp.zeros_like(b[..., -1:, :])
        return xp.concatenate([b[..., 1:, :], z], axis=-2).reshape(
            block.shape)

    def shift_one(y1):
        o = 0
        parts = [y1[..., o:o + nx]]          # arrival rows: keep
        o += nx
        for n in (nx, nx, nym):              # X̂, Ŵ, V̂ sections
            parts.append(shift_sec(y1[..., o:o + He * n], n))
            o += He * n
        return xp.concatenate(parts, axis=-1)

    n0 = mats["n_rows0"]
    if n_eps == 0:
        y_sh = shift_one(y)
    else:
        y_sh = xp.concatenate([shift_one(y[..., :n0]),
                               shift_one(y[..., n0:2 * n0]),
                               y[..., 2 * n0:]], axis=-1)
    if isinstance(moving, (bool, np.bool_)):
        return y_sh if moving else y
    return xp.where(moving, y_sh, y)


def make_single_solver(mats):
    """ONE jitted function for the single-stream fast window solve.

    Folds the (q, l, u) assembly, the GI solve and the output rollout into
    a single trace — the eager per-op dispatch of a host-side assembly was
    ~4 ms/step on CPU (26 device_puts per solve), vs ~0.2 ms fused.  All
    per-step data (windows, bounds, H̃, its inverse, warm duals) are
    ARGUMENTS, so bound rolls / invP̄ updates / setconstraint never
    retrace.
    """
    import jax.numpy as jnp

    from ..utils.config import jit32
    from ..ops.qp_active import solve_qp_active

    asm = make_assembler(mats)
    Gx = mats["Gx"]
    He, nx, nym = mats["He"], mats["nx"], mats["nym"]

    @jit32
    def solve_single(c, U0, D0, Y0m_nn, x_prior, mask_w, invP, Pq, Pinv,
                     A_rows, y0):
        q, l, u, cx, r = asm(c, U0, D0, Y0m_nn, x_prior, mask_w, invP)
        sol = solve_qp_active(Pq, q, A_rows, l, u, y0=y0,
                              cache=dict(gic_Pinv=Pinv))
        Z = sol.x
        X = (Z @ jnp.asarray(Gx, Z.dtype).T + cx).reshape(He, nx)
        # model prediction Ŷm = Gy·Z + c_y, with c_y = Y0m − r
        Ym = (Y0m_nn.reshape(-1) - r
              + Z @ jnp.asarray(mats["Gy"], Z.dtype).T).reshape(He, nym)
        return Z, X, Ym, sol.converged, sol.y, q, r

    return solve_single
