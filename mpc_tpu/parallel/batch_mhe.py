"""Batched MovingHorizonEstimator: many estimation problems in lockstep.

The MHE solver is already one pure jitted function of (params, Z̃₀); a fleet
over independent measurement streams vmaps it — thousands of constrained
estimators run as a single TPU computation (the reference solves one MHE at
a time through OSQP/Ipopt).

Round-3 redesign: the measurement/input/state windows live ON DEVICE and the
window shift/insert bookkeeping is part of the jitted step (one-hot slot
writes under a traced ``Nk``), so a serving step uploads only
``(ym, u_prev, invP̄, Nk)`` — the previous host-side bookkeeping re-shipped
the whole ``(B, He, ·)`` window tree every step, and on a tunneled TPU the
fleet was upload-bound, not solve-bound.  The arrival-covariance recursion
(data-independent for the LinModel covestim) stays on the host.

Round-4 redesign (the reference's own architecture, mhe/transcription.jl:
20-260 + mhe/execute.jl:390-457): for the LinModel + SingleShooting fleet
the window QP's H̃ depends only on the SHARED (mask_w, invP̄) — one host
NumPy f64 build per step serves every lane — and the constraint matrix is
CONSTANT (construct-time prediction matrices; the growing window enters
through masked bounds only).  Per-lane work collapses to two small matvecs
(q, l, u assembly) plus one exact GI active-set solve warm-started from the
previous step's slot-shifted duals.  This replaces the per-step in-graph
``jacfwd`` Gauss-Newton machinery and the in-solve ADMM ρ-ladder (9×
batched 44² inversions/lane/step) that made the round-3 fleet 100× slower
than the LinMPC fleets.  General path retained for NonLinModel /
MultipleShooting / NaN-measurement steps.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.config import jit32

from ..estimators.mhe import MovingHorizonEstimator


class BatchedMHE:
    """Lockstep batch of one MHE problem over many measurement streams.

    ``step(ym, u_prev)`` advances every stream's window and solves in one
    jitted device call.  ``direct=True`` (filter form) only.  Time-varying
    (capital-form) bounds are honored once the window is FULL; during the
    fill phase the fleet does not END-align per-slot bounds (use
    slot-uniform bounds if the transient matters — the single-stream
    estimator implements the reference's trunc_bounds roll).

    ``solver``: ``"auto"`` (default) uses the construct-time-matrix + GI
    fast path when applicable (LinModel, SingleShooting, nc == 0, finite
    measurements) and falls back to the general in-graph solver for NaN
    steps; ``"general"`` forces the in-graph GN/ADMM solver.

    ``gi_max_active``: slot-buffer cap for the GI fast path (see
    :func:`mpc_tpu.ops.qp_active.solve_qp_active`).  The fleet step's
    bandwidth bill is the (B, slots, slots) f64 Ginv table, so capping at
    the expected active-set size (MHE windows typically pin ≤ a handful of
    bounds) is a large win; lanes whose true active set overflows the cap
    report ``converged=False`` in ``last_ok``.  Default: full size.

    **NaN semantics (fleet approximation)**: the per-lane V-row masking of
    NaN measurements — the solution-critical part — is exact (equivalent to
    the general in-graph solver, and to the single-stream estimator's
    masked objective).  The ARRIVAL covariance however is fleet-shared and
    advanced by the data-independent host recursion; the single-stream
    estimator (and the reference, mhe/execute.jl:729-752) SKIPS the
    arrival correct when the window's exiting measurement is NaN, which
    would make P̄ per-lane path-dependent forever after any dropout.  The
    fleet keeps the correction for all lanes; the difference is a
    geometrically decaying arrival-weight perturbation on the NaN lane
    only (measured ~2e-2 → 5e-4 within 2 steps on the 2×1 bench model).

    ``gi_chunks``: split the fast path's GI solve into this many
    ``lax.map`` chunks over the batch axis — each chunk's lockstep pivot
    loop exits at ITS OWN slowest lane instead of the fleet-wide max (the
    BatchedLinMPC grouped_chunks trade); single-device fast path only.
    Measured on the bench's He=10 fleet (B=4096, cap 8) chunking LOSES
    (551k full-width vs 478k at 8 chunks): the window QP's pivot counts
    are small and uniform, so there is no tail to cut — only the large
    diffuse-tail LinMPC configs win from chunking.  Default: full width.
    """

    def __init__(self, template: MovingHorizonEstimator, batch: int,
                 mesh=None, dtype=None, solver: str = "auto",
                 gi_max_active: int | None = None,
                 gi_chunks: int = 1):
        if not template.direct:
            raise ValueError("BatchedMHE supports the direct (p=0) form")
        if solver not in ("auto", "general"):
            raise ValueError("solver must be 'auto' or 'general'")
        # validate gi_chunks UNCONDITIONALLY: it only takes effect on the
        # GI fast path, and a user requesting it on a general-solver fleet
        # would otherwise silently run unchunked (advisor r04)
        if int(gi_chunks) < 1:
            raise ValueError("gi_chunks must be ≥ 1")
        if int(gi_chunks) > 1 and (mesh is not None
                                   or int(batch) % int(gi_chunks)):
            raise ValueError("gi_chunks requires a single-device fleet "
                             "with batch % gi_chunks == 0")
        self.t = template
        self.B = int(batch)
        # dtype=jnp.float32 runs the vmapped window QP in TPU-native f32
        # (f64 LuDecomposition is unimplemented on TPU); the arrival-cov
        # recursion stays f64 on host
        self._dt = dtype
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            self._shard_b = NamedSharding(mesh, PartitionSpec("batch"))
            # stacked (K, B, ·) multistep inputs: lanes are DIM 1
            self._shard_t = NamedSharding(mesh,
                                          PartitionSpec(None, "batch"))
            self._shard_r = NamedSharding(mesh, PartitionSpec())
        else:
            self._shard_b = self._shard_t = self._shard_r = None
        t = template
        He, nym = t.He, t.nym
        nu, nd = t.model.nu, t.model.nd
        nx = t.nx_hat
        np_dt = np.dtype(dtype) if dtype is not None else np.float64
        self._np_dt = np_dt
        cast = (lambda a: np.asarray(a).astype(np_dt)
                if np.issubdtype(np.asarray(a).dtype, np.floating)
                else np.asarray(a))
        from ..models import LinModel
        self._lin = isinstance(t.model, LinModel)
        # MS windows ride the SAME fast path (round-5): for a LinModel the
        # defect equalities are linear, so condensing X̂ out is exact — the
        # fleet carries the SS-form decisions [ϵ; x̂arr; Ŵ] and the MS
        # layout is reconstructed only for the general-solver fallback
        # (see MovingHorizonEstimator._fast_applicable)
        self._fast = (solver == "auto" and self._lin and t.nc == 0)
        self._ms_cond = bool(self._fast and t.is_ms)
        if int(gi_chunks) > 1 and not self._fast:
            import warnings
            warnings.warn("gi_chunks only affects the GI fast path; this "
                          "fleet resolves to the general in-graph solver "
                          f"(solver={solver!r}, LinModel={self._lin}, "
                          f"nc={t.nc}, ms={t.is_ms}) and will run "
                          "unchunked")
        # ---- device-resident per-stream window state ----------------------
        state = dict(
            Y0m=np.full((batch, He, nym), np.nan, np_dt),
            U0=np.zeros((batch, He, nu), np_dt),
            D0=np.zeros((batch, He + 1, nd), np_dt),
            X0_old=np.zeros((batch, He, nx), np_dt),
            # condensed SS-form decisions for fast MS fleets (X̂ exact-
            # eliminated); full t.nZt layout otherwise
            Z=np.zeros((batch, (t.n_eps + nx + He * nx) if self._ms_cond
                        else t.nZt), np_dt),
            x0_hat=np.zeros((batch, nx), np_dt),
            pending_u0=np.zeros((batch, nu), np_dt),
        )
        # ---- step-invariant solver constants (uploaded once) --------------
        consts = dict(
            invQ=cast(t.invQ), invR=cast(t.invR),
            fop_m_xop=cast(t.fop_hat - t.xop_hat),
            Xmin=cast(t.X_min), Xmax=cast(t.X_max),
            Wmin=cast(t.W_min), Wmax=cast(t.W_max),
            Vmin=cast(t.V_min), Vmax=cast(t.V_max),
            C_xmin=cast(t.C_xmin), C_xmax=cast(t.C_xmax),
            C_wmin=cast(t.C_wmin), C_wmax=cast(t.C_wmax),
            C_vmin=cast(t.C_vmin), C_vmax=cast(t.C_vmax),
            yop_m=cast(t.model.yop[np.asarray(t.i_ym, int)]),
            uop=cast(t.model.uop), dop=cast(t.model.dop),
            xop_hat=cast(t.xop_hat),
        )
        if self._lin:
            consts.update(A_hat=cast(t.A_hat), Bu_hat=cast(t.Bu_hat),
                          Bd_hat=cast(t.Bd_hat), Cm_hat=cast(t.Cm_hat),
                          Ddm_hat=cast(t.Ddm_hat))
        if self._fast:
            from ..estimators import mhe_fast
            self._mats = mhe_fast.build_pred_mats(t)
            A_rows = mhe_fast.build_rows(
                self._mats, t.C_xmin, t.C_xmax, t.C_wmin, t.C_wmax,
                t.C_vmin, t.C_vmax)
            self._m_rows = A_rows.shape[0]
            consts.update(A_rows=cast(A_rows), Su=cast(self._mats["Su"]),
                          Sd=cast(self._mats["Sd"]), s1=cast(self._mats["s1"]),
                          Gy=cast(self._mats["Gy"]), Gx=cast(self._mats["Gx"]))
            state["y_warm"] = np.zeros((batch, self._m_rows), np_dt)
        if self._shard_b is not None:
            self._consts = jax.device_put(consts, self._shard_r)
            self.state = jax.device_put(state, self._shard_b)
        else:
            self._consts = jax.device_put(consts)
            self.state = jax.device_put(state)
        # host mirrors for the data-independent parts (LinModel covestim:
        # the arrival-cov recursion never depends on the data, so ONE host
        # recursion serves every lane).  For a NonLinModel the recursion
        # linearizes at each lane's arrival state → it lives ON DEVICE as
        # per-lane state (see _advance_nl below).
        self.Nk = 0
        self.P_arr = t.P0_hat.copy()
        self.invP_arr = np.linalg.inv(self.P_arr)
        self._nan_guard = 0       # steps until NaN-touched windows drain
        ce = t.covestim
        if self._lin:
            self._P_correct = lambda P: np.asarray(
                _kf_P_correct(P, ce.Cm_hat, ce.R_hat))
            self._P_predict = lambda P: np.asarray(
                ce.A_hat @ P @ ce.A_hat.T + ce.Q_hat)

        ne = t.n_eps
        is_lin = self._lin

        def shift_insert(c, st, ym, u_prev, d, has_u, Nk_prev):
            """Window shift + insert, on device (shared by both backends).

            Mirrors the reference's add_data_windows! semantics
            (mhe/execute.jl:497-547) under a TRACED window count: the
            shift/insert become jnp.where selects and one-hot slot writes,
            so window growth never retraces.
            """
            y0m = ym - c["yop_m"]
            d0 = d - c["dop"]
            pend = jnp.where(has_u, u_prev - c["uop"], st["pending_u0"])
            moving = Nk_prev + 1 > He
            x0_old = st["x0_hat"]

            def shift(a):   # the host shift duplicated the last slot
                return jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)

            Y0m = jnp.where(moving, shift(st["Y0m"]), st["Y0m"])
            U0 = jnp.where(moving, shift(st["U0"]), st["U0"])
            D0 = jnp.where(moving, shift(st["D0"]), st["D0"])
            X0o = jnp.where(moving, shift(st["X0_old"]), st["X0_old"])
            Z = st["Z"]
            ms_full = t.is_ms and not self._ms_cond  # MS layout in state
            wo = ne + nx + (He * nx if ms_full else 0)   # Ŵ block offset
            if He > 1:
                # warm start shift: X̂ block (full-MS layout only) then Ŵ
                # block + arrival seed (mirrors _add_data,
                # mhe/transcription.jl:936-1075)
                Zs = Z
                if ms_full:
                    xo = ne + nx
                    Zs = Zs.at[:, xo:xo + (He - 1) * nx].set(
                        Z[:, xo + nx:xo + He * nx])
                Zs = Zs.at[:, wo:wo + (He - 1) * nx].set(Zs[:, wo + nx:])
                Zs = Zs.at[:, wo + (He - 1) * nx:].set(0.0)
                Z = jnp.where(moving, Zs, Z)
            Nk = jnp.where(moving, Nk_prev, Nk_prev + 1)
            i = Nk - 1
            # insert via where, NOT an arithmetic blend: empty Y0m slots are
            # NaN and NaN·0 = NaN would keep them NaN forever
            oh = (jnp.arange(He) == i)[None, :, None]
            Y0m = jnp.where(oh, y0m[:, None, :], Y0m)
            X0o = jnp.where(oh, x0_old[:, None, :], X0o)
            U0 = jnp.where(oh, pend[:, None, :], U0)
            # measured disturbance goes to slot i+1 of the He+1-slot D0
            # window (slot 0 = pre-window d; mhe/execute.jl:521-538)
            oh_d = (jnp.arange(He + 1) == i + 1)[None, :, None]
            D0 = jnp.where(oh_d, d0[:, None, :], D0)
            x_arr = X0o[:, 0]
            Z = jnp.where(moving, Z.at[:, ne:ne + nx].set(x_arr), Z)
            mask_w = (jnp.arange(He) < Nk).astype(Y0m.dtype)
            return (Y0m, U0, D0, X0o, Z, pend, x_arr, Nk, mask_w, moving)

        ms_cond = self._ms_cond

        def advance(c, st, ym, u_prev, d, has_u, invP, Nk_prev):
            """General backend: the in-graph GN/ADMM window solver."""
            (Y0m, U0, D0, X0o, Z, pend, x_arr, Nk,
             mask_w, moving) = shift_insert(c, st, ym, u_prev, d, has_u,
                                            Nk_prev)
            if ms_cond:
                # fast-MS fleet falling back to the general solver: the
                # state carries the CONDENSED [ϵ; x̂arr; Ŵ] decisions —
                # reinsert the exactly-eliminated X̂ block from the rollout
                # (Gx·Z + c_x) so the MS-layout solver gets a consistent
                # warm start, and condense back after the solve
                def expand(z, U0l, D0l):
                    cx = (c["Su"] @ U0l.reshape(-1)
                          + c["Sd"] @ D0l[:-1].reshape(-1) + c["s1"])
                    Xb = c["Gx"] @ z + cx
                    return jnp.concatenate([z[:ne + nx], Xb, z[ne + nx:]])

                Z = jax.vmap(expand)(Z, U0, D0)
            mask_v = (mask_w[None, :, None] > 0) & jnp.isfinite(Y0m)
            p = dict(
                U=U0, D=D0, Y0m=jnp.nan_to_num(Y0m),
                mask_w=mask_w, mask_v=mask_v,
                invP=invP, invQ=c["invQ"], invR=c["invR"],
                x_arr_prior=x_arr, fop_m_xop=c["fop_m_xop"],
                Xmin=c["Xmin"], Xmax=c["Xmax"], Wmin=c["Wmin"],
                Wmax=c["Wmax"], Vmin=c["Vmin"], Vmax=c["Vmax"],
                C_xmin=c["C_xmin"], C_xmax=c["C_xmax"],
                C_wmin=c["C_wmin"], C_wmax=c["C_wmax"],
                C_vmin=c["C_vmin"], C_vmax=c["C_vmax"], Nk=Nk)
            if is_lin:
                p.update(A_hat=c["A_hat"], Bu_hat=c["Bu_hat"],
                         Bd_hat=c["Bd_hat"], Cm_hat=c["Cm_hat"],
                         Ddm_hat=c["Ddm_hat"])
            in_ax = {k: (None if k in
                         ("mask_w", "invP", "invQ", "invR", "fop_m_xop",
                          "Xmin", "Xmax", "Wmin", "Wmax", "Vmin", "Vmax",
                          "C_xmin", "C_xmax", "C_wmin", "C_wmax", "C_vmin",
                          "C_vmax", "Nk", "A_hat", "Bu_hat", "Bd_hat",
                          "Cm_hat", "Ddm_hat") else 0)
                     for k in p}
            Zt, x_new, X, Ym, J, ok = jax.vmap(
                t._solve_jit, in_axes=(in_ax, 0))(p, Z)
            if ms_cond:
                wo_ms = ne + nx + He * nx
                Zt = jnp.concatenate([Zt[:, :ne + nx], Zt[:, wo_ms:]],
                                     axis=1)
            new_st = dict(st, Y0m=Y0m, U0=U0, D0=D0, X0_old=X0o, Z=Zt,
                          x0_hat=x_new, pending_u0=pend)
            return new_st, x_new + c["xop_hat"], ok, jnp.zeros((), jnp.int32)

        self._advance = jit32(advance)

        if not self._lin:
            # ---- NonLinModel fleet: per-lane in-graph arrival covariance --
            # The reference advances P̄ with the covestim estimator at each
            # stream's own arrival state (mhe/execute.jl:729-779) — for a
            # fleet that is per-lane state, advanced in-graph with the
            # EKF-linearized law (jacfwd of f̂/ĥm at x̄arr; exactly the
            # covestim=ExtendedKalmanFilter recursion incl. its per-lane
            # NaN skip via kf_correct).  A UKF covestim's sigma-point
            # recursion is approximated by this linearization (documented).
            from ..estimators.kalman import kf_correct
            from ..utils.small_linalg import inv_spd_small
            f_hat, h_hat_m = t.f_hat, t.h_hat_m
            Q_ce = cast(ce.Q_hat)
            R_ce = cast(ce.R_hat)
            Q_ce_d, R_ce_d = jax.device_put((Q_ce, R_ce), self._shard_r) \
                if self._shard_r is not None else jax.device_put((Q_ce, R_ce))
            state_np = dict(P_arr=np.tile(np.asarray(t.P0_hat, np_dt)[None],
                                          (batch, 1, 1)))
            self.state = dict(self.state, **(
                jax.device_put(state_np, self._shard_b)
                if self._shard_b is not None else jax.device_put(state_np)))

            def advance_nl(c, st, ym, u_prev, d, has_u, Nk_prev):
                (Y0m, U0, D0, X0o, Z, pend, x_arr, Nk,
                 mask_w, moving) = shift_insert(c, st, ym, u_prev, d, has_u,
                                                Nk_prev)
                P = st["P_arr"]

                def corr1(xa, P1, y0, d0_):
                    Hm = jax.jacfwd(
                        lambda xx: jnp.asarray(h_hat_m(xx, d0_)))(xa)
                    y0p = jnp.asarray(h_hat_m(xa, d0_))
                    _, Pc = kf_correct(xa, P1, y0p, y0, Hm, R_ce_d)
                    return Pc

                Pc = jax.vmap(corr1)(x_arr, P, Y0m[:, 0], D0[:, 0])
                P1 = jnp.where(moving, Pc, P)
                invP = jax.vmap(inv_spd_small)(P1)
                mask_v = (mask_w[None, :, None] > 0) & jnp.isfinite(Y0m)
                p = dict(
                    U=U0, D=D0, Y0m=jnp.nan_to_num(Y0m),
                    mask_w=mask_w, mask_v=mask_v,
                    invP=invP, invQ=c["invQ"], invR=c["invR"],
                    x_arr_prior=x_arr, fop_m_xop=c["fop_m_xop"],
                    Xmin=c["Xmin"], Xmax=c["Xmax"], Wmin=c["Wmin"],
                    Wmax=c["Wmax"], Vmin=c["Vmin"], Vmax=c["Vmax"],
                    C_xmin=c["C_xmin"], C_xmax=c["C_xmax"],
                    C_wmin=c["C_wmin"], C_wmax=c["C_wmax"],
                    C_vmin=c["C_vmin"], C_vmax=c["C_vmax"], Nk=Nk)
                in_ax = {k: (None if k in
                             ("mask_w", "invQ", "invR", "fop_m_xop",
                              "Xmin", "Xmax", "Wmin", "Wmax", "Vmin",
                              "Vmax", "C_xmin", "C_xmax", "C_wmin",
                              "C_wmax", "C_vmin", "C_vmax", "Nk")
                             else 0)
                         for k in p}
                Zt, x_new, X, Ym, J, ok = jax.vmap(
                    t._solve_jit, in_axes=(in_ax, 0))(p, Z)

                def pred1(xa, P1_, u0_, d0_):
                    F = jax.jacfwd(
                        lambda xx: jnp.asarray(f_hat(xx, u0_, d0_)))(xa)
                    Pn = F @ P1_ @ F.T + Q_ce_d
                    return 0.5 * (Pn + Pn.T)

                Pp = jax.vmap(pred1)(x_arr, P1, U0[:, 0], D0[:, 0])
                P2 = jnp.where(Nk >= He, Pp, P1)
                new_st = dict(st, Y0m=Y0m, U0=U0, D0=D0, X0_old=X0o, Z=Zt,
                              x0_hat=x_new, pending_u0=pend, P_arr=P2)
                return new_st, x_new + c["xop_hat"], ok, jnp.zeros(
                    (), jnp.int32)

            self._advance_nl = jit32(advance_nl)

        if self._fast:
            from ..estimators import mhe_fast
            from ..ops.qp_active import solve_qp_active
            mats = self._mats
            asm = mhe_fast.make_assembler(mats)

            gi_cap = gi_max_active
            nch = int(gi_chunks)   # validated in __init__ (unconditionally)

            def gi(Pq, q, A, l, u, y0, Pinv):
                return solve_qp_active(Pq, q, A, l, u, y0=y0,
                                       cache=dict(gic_Pinv=Pinv),
                                       max_active=gi_cap)

            vgi = jax.vmap(gi, in_axes=(None, 0, None, 0, 0, 0, None))

            def solve_fleet(Pq, q, A, l, u, y0, Pinv):
                if nch == 1:
                    return vgi(Pq, q, A, l, u, y0, Pinv)
                chb = batch // nch
                resh = lambda a: a.reshape((nch, chb) + a.shape[1:])
                sol = jax.lax.map(
                    lambda t_: vgi(Pq, t_[0], A, t_[1], t_[2], t_[3], Pinv),
                    (resh(q), resh(l), resh(u), resh(y0)))
                return jax.tree_util.tree_map(
                    lambda a: a.reshape((batch,) + a.shape[2:]), sol)

            def advance_fast(c, st, ym, u_prev, d, has_u, invP, Nk_prev,
                             Pq, Pinv):
                (Y0m, U0, D0, X0o, Z, pend, x_arr, Nk,
                 mask_w, moving) = shift_insert(c, st, ym, u_prev, d, has_u,
                                                Nk_prev)
                ac = dict(Su=c["Su"], Sd=c["Sd"], s1=c["s1"],
                          Cm=c["Cm_hat"], Ddm=c["Ddm_hat"], Gy=c["Gy"],
                          invR=c["invR"], Xmin=c["Xmin"], Xmax=c["Xmax"],
                          Wmin=c["Wmin"], Wmax=c["Wmax"], Vmin=c["Vmin"],
                          Vmax=c["Vmax"])
                q, l, u, cx, r = jax.vmap(
                    lambda U, D, Y, xp: asm(ac, U, D, Y, xp, mask_w, invP)
                )(U0, D0, jnp.nan_to_num(Y0m), x_arr)
                y0 = mhe_fast.shift_warm_duals(mats, st["y_warm"], moving)
                sol = solve_fleet(Pq, q, c["A_rows"], l, u, y0, Pinv)
                # failed lanes (slot-cap overflow / pivot-cap exhaustion)
                # must NOT contaminate persistent state: keep the shifted
                # warm-start Z (graceful degradation, like the
                # single-stream path) and cold-start their duals next step
                okl = sol.converged[:, None]
                Zt = jnp.where(okl, sol.x, Z)
                Xf = Zt @ c["Gx"].T + cx             # (B, He·nx)
                idx = jnp.clip(Nk - 1, 0, He - 1)
                x_new = Xf.reshape(-1, He, nx)[:, idx]
                y_next = jnp.where(okl, sol.y, 0.0)
                new_st = dict(st, Y0m=Y0m, U0=U0, D0=D0, X0_old=X0o, Z=Zt,
                              x0_hat=x_new, pending_u0=pend,
                              y_warm=y_next.astype(st["y_warm"].dtype))
                return (new_st, x_new + c["xop_hat"], sol.converged,
                        jnp.max(sol.iters))

            self._advance_fast = jit32(advance_fast)

            # ---- NaN-tolerant fast variant (per-lane H̃ downdate) --------
            # One lane's sensor dropout must not de-fast-path the whole
            # fleet: with a DIAGONAL invR, a NaN element removes exactly one
            # scalar V row from that lane's window QP — a low-rank downdate
            # of the SHARED H̃ (Sherman–Morrison on the cached inverse).
            # Cost is ~He·nym masked rank-one updates per lane; the clean
            # dispatch path is untouched (zero overhead without NaN).
            invR_np = np.asarray(t.invR, float)
            self._nan_fast_ok = bool(
                np.allclose(invR_np, np.diag(np.diag(invR_np))))
            if self._nan_fast_ok:
                ddn = mhe_fast.make_nan_downdate(self._mats)
                vdd = jax.vmap(ddn, in_axes=(None, None, 0))
                r_diag = 2.0 * np.diag(invR_np)
                nym_ = t.nym

                def advance_fast_nan(c, st, ym, u_prev, d, has_u, invP,
                                     Nk_prev, Pq, Pinv):
                    (Y0m, U0, D0, X0o, Z, pend, x_arr, Nk,
                     mask_w, moving) = shift_insert(c, st, ym, u_prev, d,
                                                    has_u, Nk_prev)
                    ac = dict(Su=c["Su"], Sd=c["Sd"], s1=c["s1"],
                              Cm=c["Cm_hat"], Ddm=c["Ddm_hat"], Gy=c["Gy"],
                              invR=c["invR"], Xmin=c["Xmin"], Xmax=c["Xmax"],
                              Wmin=c["Wmin"], Wmax=c["Wmax"],
                              Vmin=c["Vmin"], Vmax=c["Vmax"])
                    finite = jnp.isfinite(Y0m)
                    mask_v = (mask_w[None, :, None]
                              * finite.astype(mask_w.dtype))   # (B, He, nym)
                    w_nan = (jnp.asarray(r_diag, Pinv.dtype)[None, None, :]
                             * (mask_w[None, :, None] > 0)
                             * (~finite)).reshape(Y0m.shape[0], -1)
                    Pq_l, Pinv_l = vdd(Pq, Pinv, w_nan)
                    q, l, u, cx, r = jax.vmap(
                        lambda U, D, Y, xp, mv: asm(ac, U, D, Y, xp, mask_w,
                                                    invP, mask_v=mv)
                    )(U0, D0, jnp.nan_to_num(Y0m), x_arr, mask_v)
                    y0 = mhe_fast.shift_warm_duals(mats, st["y_warm"],
                                                   moving)
                    sol = jax.vmap(
                        lambda Pql, qq, ll, uu, yy, Pil: solve_qp_active(
                            Pql, qq, c["A_rows"], ll, uu, y0=yy,
                            cache=dict(gic_Pinv=Pil), max_active=gi_cap)
                    )(Pq_l, q, l, u, y0, Pinv_l)
                    okl = sol.converged[:, None]
                    Zt = jnp.where(okl, sol.x, Z)
                    Xf = Zt @ c["Gx"].T + cx
                    idx = jnp.clip(Nk - 1, 0, He - 1)
                    x_new = Xf.reshape(-1, He, nx)[:, idx]
                    y_next = jnp.where(okl, sol.y, 0.0)
                    new_st = dict(st, Y0m=Y0m, U0=U0, D0=D0, X0_old=X0o,
                                  Z=Zt, x0_hat=x_new, pending_u0=pend,
                                  y_warm=y_next.astype(st["y_warm"].dtype))
                    return (new_st, x_new + c["xop_hat"], sol.converged,
                            jnp.max(sol.iters))

                self._advance_fast_nan = jit32(advance_fast_nan)
            else:
                self._advance_fast_nan = None
        else:
            self._nan_fast_ok = False
            self._advance_fast_nan = None

    def multistep(self, ym_seq, u_prev_seq=None, d_seq=None):
        """K estimation periods in ONE device dispatch (serving mode).

        ``ym_seq`` (K, B, nym); ``u_prev_seq`` optional (K, B, nu) — the
        input applied before each period; ``d_seq`` optional (K, B, nd).
        Returns the stacked absolute estimates (K, B, nx̂) as a DEVICE
        array.  Equivalent to K successive ``step`` calls (tested).

        The host-side per-period data — the data-independent
        arrival-covariance recursion, window counts and (fast path) the
        shared H̃ + inverse — is precomputed for all K periods and shipped
        as ONE stacked upload; the K window-shift+solve advances run under
        a single ``lax.scan``, amortizing the per-dispatch tunnel overhead
        (see BatchedLinMPC._make_multistep).  A NaN anywhere in the
        sequence routes the WHOLE dispatch through the per-lane-H̃ NaN
        variant (diag invR) or the general solver.
        """
        t = self.t
        dt = self._dt if self._dt is not None else np.float64
        ym_np = np.asarray(ym_seq, dt)
        K = ym_np.shape[0]
        has_u = u_prev_seq is not None
        u_np = (np.asarray(u_prev_seq, dt) if has_u
                else np.zeros((K, self.B, t.model.nu), dt))
        d_np = (np.asarray(d_seq, dt) if d_seq is not None
                else np.zeros((K, self.B, t.model.nd), dt))
        # routing for the whole dispatch (mirrors step(); conservative: one
        # NaN anywhere → NaN handling for all K periods)
        seq_nan = bool(np.isnan(ym_np).any())
        nan_live = seq_nan or self._nan_guard > 0
        use_fast = self._fast and (not nan_live or self._nan_fast_ok)
        use_nan = use_fast and nan_live
        if not self._lin:
            # NonLinModel fleet: everything per-period is in-graph (per-lane
            # arrival covariance); only the Nk window count mirrors on host
            Nks = []
            Nk = self.Nk
            for _ in range(K):
                Nks.append(np.int32(Nk))
                if (Nk + 1) <= t.He:
                    Nk += 1
            self.Nk = Nk
            big = dict(ym=ym_np, u_prev=u_np, d=d_np, Nk=np.stack(Nks),
                       has_u=np.bool_(has_u))
            if self._shard_t is not None:
                batched = {"ym", "u_prev", "d"}
                big = {k: jax.device_put(v, self._shard_t if k in batched
                                         else self._shard_r)
                       for k, v in big.items()}
            else:
                big = jax.device_put(big)
            if getattr(self, "_mscan", None) is None:
                self._mscan = {}
            if "nl" not in self._mscan:
                advn = self._advance_nl

                def scan_nl(c, st, ym_s, u_s, d_s, hu, Nk_s):
                    def body(st_, inp):
                        st2, x_abs, ok, piv = advn(c, st_, *inp[:3], hu,
                                                   inp[3])
                        return st2, (x_abs, ok)

                    st2, (X, OK) = jax.lax.scan(
                        body, st, (ym_s, u_s, d_s, Nk_s))
                    return st2, X, OK

                self._mscan["nl"] = jit32(scan_nl)
            self.state, X, OK = self._mscan["nl"](
                self._consts, self.state, big["ym"], big["u_prev"],
                big["d"], big["has_u"], big["Nk"])
            self.last_ok = OK[-1]
            return X
        # ---- host mirror: K-period recursion (data-independent) ----------
        from ..estimators import mhe_fast
        P, invP, Nk = self.P_arr, self.invP_arr, self.Nk
        invPs, Nks, Pqs, Pinvs, movings = [], [], [], [], []
        last_nan_k = -1
        for k in range(K):
            moving = (Nk + 1) > t.He
            movings.append(moving)
            if moving:
                P = self._P_correct(P)
                invP = np.linalg.inv(P)
            invPs.append(np.asarray(invP, dt))
            Nks.append(np.int32(Nk))
            if use_fast:
                Nk_next = t.He if moving else Nk + 1
                mask_w = (np.arange(t.He) < Nk_next).astype(float)
                Pq, Pinv = mhe_fast.build_step_qp(
                    self._mats, mask_w, invP, t.invQ, t.invR, t.Cwt)
                Pqs.append(np.asarray(Pq, dt))
                Pinvs.append(Pinv)
            if np.isnan(ym_np[k]).any():
                last_nan_k = k
            if not moving:
                Nk += 1
            if Nk == t.He:
                P = self._P_predict(P)
                invP = np.linalg.inv(P)
        # NaN drain accounting: guard = He minus the MOVING periods since
        # the last NaN insertion (NaNs only shift out of a moving window)
        if last_nan_k >= 0:
            drained = sum(movings[last_nan_k + 1:])
            self._nan_guard = max(0, t.He - drained)
        elif self._nan_guard:
            self._nan_guard = max(0, self._nan_guard - sum(movings))
        self.P_arr, self.invP_arr, self.Nk = P, invP, Nk
        # ---- one stacked upload + one scanned dispatch -------------------
        big = dict(ym=ym_np, u_prev=u_np, d=d_np,
                   invP=np.stack(invPs), Nk=np.stack(Nks),
                   has_u=np.bool_(has_u))
        if use_fast:
            big["Pq"] = np.stack(Pqs)
            big["Pinv"] = np.stack(Pinvs)      # f64: GI hi-precision cache
        if self._shard_t is not None:
            batched = {"ym", "u_prev", "d"}
            big = {k: jax.device_put(v, self._shard_t if k in batched
                                     else self._shard_r)
                   for k, v in big.items()}
        else:
            big = jax.device_put(big)
        if getattr(self, "_mscan", None) is None:
            self._mscan = {}
        kind = "nan" if use_nan else ("fast" if use_fast else "gen")
        if kind not in self._mscan:
            if use_fast:
                adv = (self._advance_fast_nan if use_nan
                       else self._advance_fast)

                def scan_fast(c, st, ym_s, u_s, d_s, hu, invP_s, Nk_s,
                              Pq_s, Pinv_s):
                    def body(st_, inp):
                        st2, x_abs, ok, piv = adv(c, st_, *inp[:3], hu,
                                                  *inp[3:])
                        return st2, (x_abs, ok, piv)

                    st2, (X, OK, PIV) = jax.lax.scan(
                        body, st, (ym_s, u_s, d_s, invP_s, Nk_s, Pq_s,
                                   Pinv_s))
                    return st2, X, OK, PIV

                self._mscan[kind] = jit32(scan_fast)
            else:
                advg = self._advance

                def scan_gen(c, st, ym_s, u_s, d_s, hu, invP_s, Nk_s):
                    def body(st_, inp):
                        st2, x_abs, ok, piv = advg(c, st_, *inp[:3], hu,
                                                   *inp[3:])
                        return st2, (x_abs, ok, piv)

                    st2, (X, OK, PIV) = jax.lax.scan(
                        body, st, (ym_s, u_s, d_s, invP_s, Nk_s))
                    return st2, X, OK, PIV

                self._mscan[kind] = jit32(scan_gen)
        if use_fast:
            self.state, X, OK, PIV = self._mscan[kind](
                self._consts, self.state, big["ym"], big["u_prev"],
                big["d"], big["has_u"], big["invP"], big["Nk"],
                big["Pq"], big["Pinv"])
            self.last_pivots = PIV[-1]
        else:
            y_w = self.state.get("y_warm") if self._fast else None
            st = {k: v for k, v in self.state.items() if k != "y_warm"}
            new_st, X, OK, _ = self._mscan[kind](
                self._consts, st, big["ym"], big["u_prev"], big["d"],
                big["has_u"], big["invP"], big["Nk"])
            if y_w is not None:
                new_st["y_warm"] = jnp.zeros_like(y_w)
            self.state = new_st
        self.last_ok = OK[-1]
        return X

    def step(self, ym, u_prev=None, d=None):
        """Append measurements for every stream and solve in lockstep.
        ``u_prev`` is the input applied at the previous step (B, nu);
        ``d`` the current measured disturbances (B, nd) when the model has
        them (window slot i+1, mirroring add_data_windows!).

        Returns the absolute state estimates (B, nx̂) as a DEVICE array
        (``np.asarray`` it to sync) — a per-step host round trip is exactly
        what made the previous host-bookkeeping fleet upload-bound.
        """
        t = self.t
        dt = self._dt if self._dt is not None else np.float64
        has_u = u_prev is not None
        moving = (self.Nk + 1) > t.He
        if not self._lin:
            # NonLinModel fleet: the whole step (window bookkeeping +
            # per-lane EKF-linearized arrival covariance + GN window solve)
            # is one jitted in-graph advance; only Nk mirrors on host
            nu = t.model.nu
            small = dict(
                ym=np.asarray(ym, dt),
                u_prev=(np.asarray(u_prev, dt) if has_u
                        else np.zeros((self.B, nu), dt)),
                d=(np.asarray(d, dt) if d is not None
                   else np.zeros((self.B, t.model.nd), dt)),
                Nk=np.int32(self.Nk), has_u=np.bool_(has_u))
            if self._shard_b is not None:
                batched = {"ym", "u_prev", "d"}
                small = {k: jax.device_put(v, self._shard_b if k in batched
                                           else self._shard_r)
                         for k, v in small.items()}
            else:
                small = jax.device_put(small)
            self.state, x_abs, ok, _ = self._advance_nl(
                self._consts, self.state, small["ym"], small["u_prev"],
                small["d"], small["has_u"], small["Nk"])
            self.last_ok = ok
            if not moving:
                self.Nk += 1
            return x_abs
        # host mirror of the data-independent arrival-cov recursion:
        # correct at a moving preparestate (before the solve uses invP̄)
        if moving:
            self.P_arr = self._P_correct(self.P_arr)
            self.invP_arr = np.linalg.inv(self.P_arr)
        nu = t.model.nu
        ym_h = np.asarray(ym, dt)
        # NaN measurements change per-lane V-row weights → the per-lane
        # H̃-downdate fast variant while any window may hold a NaN (diag
        # invR), else the general solver until the NaNs drain (He MOVING
        # steps — a NaN inserted during the fill phase only starts
        # shifting out once the window moves)
        if np.isnan(ym_h).any():
            self._nan_guard = t.He
        elif self._nan_guard and moving:
            self._nan_guard -= 1
        nan_live = self._nan_guard > 0
        use_fast = self._fast and (not nan_live or self._nan_fast_ok)
        use_nan = use_fast and nan_live
        small = dict(
            ym=ym_h,
            u_prev=(np.asarray(u_prev, dt) if has_u
                    else np.zeros((self.B, nu), dt)),
            d=(np.asarray(d, dt) if d is not None
               else np.zeros((self.B, t.model.nd), dt)),
            invP=np.asarray(self.invP_arr, dt),
            Nk=np.int32(self.Nk), has_u=np.bool_(has_u))
        if use_fast:
            from ..estimators import mhe_fast
            Nk_next = t.He if moving else self.Nk + 1
            mask_w = (np.arange(t.He) < Nk_next).astype(float)
            Pq, Pinv = mhe_fast.build_step_qp(
                self._mats, mask_w, self.invP_arr, t.invQ, t.invR, t.Cwt)
            small["Pq"] = np.asarray(Pq, dt)
            small["Pinv"] = Pinv          # stays f64: GI hi-precision cache
        if self._shard_b is not None:
            batched = {"ym", "u_prev", "d"}
            small = {k: jax.device_put(v, self._shard_b if k in batched
                                       else self._shard_r)
                     for k, v in small.items()}
        else:
            small = jax.device_put(small)
        if use_fast:
            adv = self._advance_fast_nan if use_nan else self._advance_fast
            self.state, x_abs, ok, piv = adv(
                self._consts, self.state, small["ym"], small["u_prev"],
                small["d"], small["has_u"], small["invP"], small["Nk"],
                small["Pq"], small["Pinv"])
            self.last_pivots = piv
        else:
            y_w = self.state.get("y_warm") if self._fast else None
            # strip NON-destructively: popping from the live dict would
            # leave self.state permanently missing y_warm if _advance
            # raises (tunnel/XLA error), crashing every later fast step
            st = {k: v for k, v in self.state.items() if k != "y_warm"}
            new_st, x_abs, ok, _ = self._advance(
                self._consts, st, small["ym"], small["u_prev"],
                small["d"], small["has_u"], small["invP"], small["Nk"])
            if y_w is not None:
                # general step invalidates the fast path's dual warm start
                new_st["y_warm"] = jnp.zeros_like(y_w)
            self.state = new_st
        self.last_ok = ok            # per-stream converged flags (device)
        if not moving:
            self.Nk += 1
        # update_cov! predict once the window is full (updatestate cadence)
        if self.Nk == t.He:
            self.P_arr = self._P_predict(self.P_arr)
            self.invP_arr = np.linalg.inv(self.P_arr)
        return x_abs


def _kf_P_correct(P, Cm, R):
    PCt = P @ Cm.T
    M = Cm @ PCt + R
    K = np.linalg.solve(M.T, PCt.T).T
    Pc = (np.eye(P.shape[0]) - K @ Cm) @ P
    return 0.5 * (Pc + Pc.T)
