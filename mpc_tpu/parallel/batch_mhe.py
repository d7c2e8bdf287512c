"""Batched MovingHorizonEstimator: many estimation problems in lockstep.

The MHE solver is already one pure jitted function of (params, Z̃₀); a fleet
over independent measurement streams vmaps it — thousands of constrained
estimators run as a single TPU computation (the reference solves one MHE at
a time through OSQP/Ipopt).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.config import jit32

from ..estimators.mhe import MovingHorizonEstimator


class BatchedMHE:
    """Lockstep batch of one MHE problem over many measurement streams.

    Host-side window bookkeeping is vectorized NumPy; the solve is a single
    vmapped jitted call.  ``direct=True`` (filter form) only.
    """

    def __init__(self, template: MovingHorizonEstimator, batch: int,
                 mesh=None, dtype=None):
        if not template.direct:
            raise ValueError("BatchedMHE supports the direct (p=0) form")
        self.t = template
        self.B = int(batch)
        # dtype=jnp.float32 runs the vmapped window QP in TPU-native f32
        # (f64 LuDecomposition is unimplemented on TPU); host window
        # bookkeeping stays f64
        self._dt = dtype
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            self._shard_b = NamedSharding(mesh, PartitionSpec("batch"))
            self._shard_r = NamedSharding(mesh, PartitionSpec())
        else:
            self._shard_b = self._shard_r = None
        He, nym = template.He, template.nym
        nu, nd = template.model.nu, template.model.nd
        nx = template.nx_hat
        self.Y0m = np.full((batch, He, nym), np.nan)
        self.U0 = np.zeros((batch, He, nu))
        self.D0 = np.zeros((batch, He + 1, nd))
        self.X0_old = np.zeros((batch, He, nx))
        self.Nk = 0
        self.x_arr_prior = np.zeros((batch, nx))
        self.Z = np.zeros((batch, template.nZt))
        self.x0_hat = np.zeros((batch, nx))
        self.pending_u0 = np.zeros((batch, nu))
        # the LinModel-KF arrival covariance recursion is data-independent,
        # so one P̄ tracks all streams (correct ↔ predict per the reference's
        # correct_cov!/update_cov! cadence)
        self.P_arr = template.P0_hat.copy()
        self.invP_arr = np.linalg.inv(self.P_arr)
        ce = template.covestim
        self._P_correct = lambda P: np.asarray(
            _kf_P_correct(P, ce.Cm_hat, ce.R_hat))
        self._P_predict = lambda P: np.asarray(
            ce.A_hat @ P @ ce.A_hat.T + ce.Q_hat)
        in_ax = dict(U=0, D=0, Y0m=0, mask_w=None, mask_v=0, invP=None,
                     invQ=None, invR=None, x_arr_prior=0, fop_m_xop=None,
                     Xmin=None, Xmax=None, Wmin=None, Wmax=None, Vmin=None,
                     Vmax=None, C_xmin=None, C_xmax=None, C_wmin=None,
                     C_wmax=None, C_vmin=None, C_vmax=None, Nk=None)
        from ..models import LinModel
        self._lin = isinstance(template.model, LinModel)
        if self._lin:
            in_ax.update(A_hat=None, Bu_hat=None, Bd_hat=None, Cm_hat=None,
                         Ddm_hat=None)
        self._solve = jit32(jax.vmap(template._solve_jit, in_axes=(in_ax, 0)))

    def step(self, ym, u_prev=None):
        """Append measurements for every stream and solve in lockstep.
        ``u_prev`` is the input applied at the previous step (B, nu)."""
        t = self.t
        He = t.He
        ym = np.asarray(ym, float)
        y0m = ym - t.model.yop[np.asarray(t.i_ym, int)]
        if u_prev is not None:
            self.pending_u0 = np.asarray(u_prev, float) - t.model.uop
        moving = (self.Nk + 1) > He
        x0_old = self.x0_hat.copy()
        if moving:
            self.Y0m[:, :-1] = self.Y0m[:, 1:]
            self.U0[:, :-1] = self.U0[:, 1:]
            self.D0[:, :-1] = self.D0[:, 1:]
            self.X0_old[:, :-1] = self.X0_old[:, 1:]
            self.Nk -= 1
            # warm start shift (Ŵ block) + arrival seed
            ne, nx = t.n_eps, t.nx_hat
            self.Z[:, ne + nx:ne + nx + (He - 1) * nx] = self.Z[:, ne + 2 * nx:]
            self.Z[:, ne + nx + (He - 1) * nx:] = 0.0
        i = self.Nk
        self.Y0m[:, i] = y0m
        self.X0_old[:, i] = x0_old
        self.Nk += 1
        self.U0[:, self.Nk - 1] = self.pending_u0
        self.x_arr_prior = self.X0_old[:, 0].copy()
        if moving:
            self.Z[:, t.n_eps:t.n_eps + t.nx_hat] = self.x_arr_prior
            # correct_cov! at the (moving) preparestate
            self.P_arr = self._P_correct(self.P_arr)
            self.invP_arr = np.linalg.inv(self.P_arr)
        mask_w = (np.arange(He) < self.Nk).astype(float)
        mask_v = (mask_w[None, :, None] > 0) & np.isfinite(self.Y0m)
        # one device_put for the whole tree: per-leaf eager uploads cost a
        # full network round trip each on a tunneled TPU
        tree = dict(
            U=self.U0, D=self.D0, Y0m=np.nan_to_num(self.Y0m),
            mask_w=mask_w, mask_v=mask_v,
            invP=self.invP_arr, invQ=np.asarray(t.invQ),
            invR=np.asarray(t.invR),
            x_arr_prior=self.x_arr_prior,
            fop_m_xop=t.fop_hat - t.xop_hat,
            Xmin=np.asarray(t.X_min), Xmax=np.asarray(t.X_max),
            Wmin=np.asarray(t.W_min), Wmax=np.asarray(t.W_max),
            Vmin=np.asarray(t.V_min), Vmax=np.asarray(t.V_max),
            C_xmin=np.asarray(t.C_xmin), C_xmax=np.asarray(t.C_xmax),
            C_wmin=np.asarray(t.C_wmin), C_wmax=np.asarray(t.C_wmax),
            C_vmin=np.asarray(t.C_vmin), C_vmax=np.asarray(t.C_vmax),
            Nk=np.int32(self.Nk),
            **({"A_hat": np.asarray(t.A_hat), "Bu_hat": np.asarray(t.Bu_hat),
                "Bd_hat": np.asarray(t.Bd_hat),
                "Cm_hat": np.asarray(t.Cm_hat),
                "Ddm_hat": np.asarray(t.Ddm_hat)} if self._lin else {}))
        if self._dt is not None:
            np_dt = np.dtype(self._dt)
            tree = {k: (v.astype(np_dt)
                        if np.issubdtype(np.asarray(v).dtype, np.floating)
                        else v)
                    for k, v in tree.items()}
            Z0 = jnp.asarray(self.Z, self._dt)
        else:
            Z0 = jnp.asarray(self.Z)
        if self._shard_b is not None:
            # batch-axis leaves shard over the mesh, shared leaves replicate
            batched = {"U", "D", "Y0m", "mask_v", "x_arr_prior"}
            p = {k: jax.device_put(v, self._shard_b if k in batched
                                   else self._shard_r)
                 for k, v in tree.items()}
            Z0 = jax.device_put(Z0, self._shard_b)
        else:
            p = jax.device_put(tree)
        Zt, x_new, X, Ym, J, ok = self._solve(p, Z0)
        self.last_ok = ok            # per-stream converged flags (device)
        self.Z = np.array(Zt)
        self.x0_hat = np.array(x_new)
        # update_cov! predict once the window is full (updatestate cadence)
        if self.Nk == self.t.He:
            self.P_arr = self._P_predict(self.P_arr)
            self.invP_arr = np.linalg.inv(self.P_arr)
        return self.x0_hat + self.t.xop_hat


def _kf_P_correct(P, Cm, R):
    PCt = P @ Cm.T
    M = Cm @ PCt + R
    K = np.linalg.solve(M.T, PCt.T).T
    Pc = (np.eye(P.shape[0]) - K @ Cm) @ P
    return 0.5 * (Pc + Pc.T)
