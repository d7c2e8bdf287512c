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
        self.t = template
        self.B = int(batch)
        # dtype=jnp.float32 runs the vmapped window QP in TPU-native f32
        # (f64 LuDecomposition is unimplemented on TPU); the arrival-cov
        # recursion stays f64 on host
        self._dt = dtype
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            self._shard_b = NamedSharding(mesh, PartitionSpec("batch"))
            self._shard_r = NamedSharding(mesh, PartitionSpec())
        else:
            self._shard_b = self._shard_r = None
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
        self._fast = (solver == "auto" and self._lin and t.nc == 0
                      and not t.is_ms)
        # ---- device-resident per-stream window state ----------------------
        state = dict(
            Y0m=np.full((batch, He, nym), np.nan, np_dt),
            U0=np.zeros((batch, He, nu), np_dt),
            D0=np.zeros((batch, He + 1, nd), np_dt),
            X0_old=np.zeros((batch, He, nx), np_dt),
            Z=np.zeros((batch, t.nZt), np_dt),
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
        # host mirrors for the data-independent parts
        self.Nk = 0
        self.P_arr = t.P0_hat.copy()
        self.invP_arr = np.linalg.inv(self.P_arr)
        self._nan_guard = 0       # steps until NaN-touched windows drain
        ce = t.covestim
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
            if He > 1:
                # warm start shift (Ŵ block) + arrival seed
                Zs = Z.at[:, ne + nx:ne + nx + (He - 1) * nx].set(
                    Z[:, ne + 2 * nx:])
                Zs = Zs.at[:, ne + nx + (He - 1) * nx:].set(0.0)
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

        def advance(c, st, ym, u_prev, d, has_u, invP, Nk_prev):
            """General backend: the in-graph GN/ADMM window solver."""
            (Y0m, U0, D0, X0o, Z, pend, x_arr, Nk,
             mask_w, moving) = shift_insert(c, st, ym, u_prev, d, has_u,
                                            Nk_prev)
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
            new_st = dict(st, Y0m=Y0m, U0=U0, D0=D0, X0_old=X0o, Z=Zt,
                          x0_hat=x_new, pending_u0=pend)
            return new_st, x_new + c["xop_hat"], ok, jnp.zeros((), jnp.int32)

        self._advance = jit32(advance)

        if self._fast:
            from ..estimators import mhe_fast
            from ..ops.qp_active import solve_qp_active
            mats = self._mats
            asm = mhe_fast.make_assembler(mats)

            gi_cap = gi_max_active
            nch = int(gi_chunks)
            if nch > 1 and (mesh is not None or batch % nch):
                raise ValueError("gi_chunks requires a single-device fleet "
                                 "with batch % gi_chunks == 0")

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
        # host mirror of the data-independent arrival-cov recursion:
        # correct at a moving preparestate (before the solve uses invP̄)
        if moving:
            self.P_arr = self._P_correct(self.P_arr)
            self.invP_arr = np.linalg.inv(self.P_arr)
        nu = t.model.nu
        ym_h = np.asarray(ym, dt)
        # NaN measurements change per-lane V-row weights → general solver
        # until every NaN has drained out of the windows (He steps)
        if np.isnan(ym_h).any():
            self._nan_guard = t.He
        elif self._nan_guard:
            self._nan_guard -= 1
        use_fast = self._fast and self._nan_guard == 0
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
            self.state, x_abs, ok, piv = self._advance_fast(
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
