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
    jitted device call.  ``direct=True`` (filter form) only.
    """

    def __init__(self, template: MovingHorizonEstimator, batch: int,
                 mesh=None, dtype=None):
        if not template.direct:
            raise ValueError("BatchedMHE supports the direct (p=0) form")
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
        cast = (lambda a: np.asarray(a).astype(np_dt)
                if np.issubdtype(np.asarray(a).dtype, np.floating)
                else np.asarray(a))
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
            uop=cast(t.model.uop), xop_hat=cast(t.xop_hat),
        )
        from ..models import LinModel
        self._lin = isinstance(t.model, LinModel)
        if self._lin:
            consts.update(A_hat=cast(t.A_hat), Bu_hat=cast(t.Bu_hat),
                          Bd_hat=cast(t.Bd_hat), Cm_hat=cast(t.Cm_hat),
                          Ddm_hat=cast(t.Ddm_hat))
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
        ce = t.covestim
        self._P_correct = lambda P: np.asarray(
            _kf_P_correct(P, ce.Cm_hat, ce.R_hat))
        self._P_predict = lambda P: np.asarray(
            ce.A_hat @ P @ ce.A_hat.T + ce.Q_hat)

        in_ax = dict(U=0, D=0, Y0m=0, mask_w=None, mask_v=0, invP=None,
                     invQ=None, invR=None, x_arr_prior=0, fop_m_xop=None,
                     Xmin=None, Xmax=None, Wmin=None, Wmax=None, Vmin=None,
                     Vmax=None, C_xmin=None, C_xmax=None, C_wmin=None,
                     C_wmax=None, C_vmin=None, C_vmax=None, Nk=None)
        if self._lin:
            in_ax.update(A_hat=None, Bu_hat=None, Bd_hat=None, Cm_hat=None,
                         Ddm_hat=None)
        vsolve = jax.vmap(t._solve_jit, in_axes=(in_ax, 0))
        ne = t.n_eps
        is_lin = self._lin

        def advance(c, st, ym, u_prev, has_u, invP, Nk_prev):
            """Window shift + insert + solve, all on device.

            Mirrors the reference's add_data_windows! semantics
            (mhe/execute.jl:497-547) under a TRACED window count: the
            shift/insert become jnp.where selects and one-hot slot writes,
            so window growth never retraces.
            """
            y0m = ym - c["yop_m"]
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
            x_arr = X0o[:, 0]
            Z = jnp.where(moving, Z.at[:, ne:ne + nx].set(x_arr), Z)
            mask_w = (jnp.arange(He) < Nk).astype(Y0m.dtype)
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
            Zt, x_new, X, Ym, J, ok = vsolve(p, Z)
            new_st = dict(Y0m=Y0m, U0=U0, D0=D0, X0_old=X0o, Z=Zt,
                          x0_hat=x_new, pending_u0=pend)
            return new_st, x_new + c["xop_hat"], ok

        self._advance = jit32(advance)

    def step(self, ym, u_prev=None):
        """Append measurements for every stream and solve in lockstep.
        ``u_prev`` is the input applied at the previous step (B, nu).

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
        small = dict(
            ym=np.asarray(ym, dt),
            u_prev=(np.asarray(u_prev, dt) if has_u
                    else np.zeros((self.B, nu), dt)),
            invP=np.asarray(self.invP_arr, dt),
            Nk=np.int32(self.Nk), has_u=np.bool_(has_u))
        if self._shard_b is not None:
            batched = {"ym", "u_prev"}
            small = {k: jax.device_put(v, self._shard_b if k in batched
                                       else self._shard_r)
                     for k, v in small.items()}
        else:
            small = jax.device_put(small)
        self.state, x_abs, ok = self._advance(
            self._consts, self.state, small["ym"], small["u_prev"],
            small["has_u"], small["invP"], small["Nk"])
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
