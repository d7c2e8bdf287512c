"""Batched Kalman estimation — lockstep fleets of SKF/KF estimators.

Thousands of independent sensor streams filtered in one jitted, vmapped
computation (the estimation-side analogue of BatchedLinMPC; new surface
relative to the reference, which filters one stream at a time).  Stacking,
dtype casts and tiling happen host-side with a single device upload (every
eager device op on a tunneled TPU costs a full network round trip).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.config import jit32

from ..estimators.kalman import SteadyKalmanFilter, KalmanFilter, kf_correct, \
    kf_predict


class BatchedKalman:
    """Lockstep batch of SteadyKalmanFilter or KalmanFilter estimators.

    ``step(ym, u, d)`` runs one full filter cycle for every stream:
    correction with the current measurement, then prediction with the
    applied input.  Returns the corrected absolute state estimates (B, nx̂).
    """

    def __init__(self, estimators, dtype=None, reps: int = 1):
        e0 = estimators[0]
        if not isinstance(e0, (SteadyKalmanFilter, KalmanFilter)):
            raise TypeError("BatchedKalman supports SteadyKalmanFilter and "
                            "KalmanFilter fleets")
        self.steady = isinstance(e0, SteadyKalmanFilter)
        if any(isinstance(e, SteadyKalmanFilter) != self.steady
               for e in estimators):
            raise TypeError("mixed estimator kinds in one fleet")
        self.B = len(estimators) * reps
        # grouped (distinct × reps) execution, as in BatchedLinMPC: params
        # stacked over the n_d DISTINCT estimators only; the inner vmap has
        # params in_axes=None so each stream group reads its matrices once
        self.grouped = reps > 1
        self.n_distinct = len(estimators)
        self.reps = int(reps)
        self.nx_hat = e0.nx_hat
        self.nym = e0.nym
        self.nd = e0.model.nd

        def g(attr):
            return np.stack([np.asarray(getattr(e, attr), float)
                             for e in estimators])

        params = dict(A_hat=g("A_hat"), Bu_hat=g("Bu_hat"), Bd_hat=g("Bd_hat"),
                      Cm_hat=g("Cm_hat"), Ddm_hat=g("Ddm_hat"),
                      fop_m_xop=np.stack([e.fop_hat - e.xop_hat
                                          for e in estimators]),
                      xop_hat=g("xop_hat"),
                      yopm=np.stack([e.model.yop[np.asarray(e.i_ym, int)]
                                     for e in estimators]),
                      uop=np.stack([e.model.uop for e in estimators]),
                      dop=np.stack([e.model.dop for e in estimators]))
        if self.steady:
            params["K_hat"] = g("K_hat")
        else:
            params["Q_hat"] = g("Q_hat")
            params["R_hat"] = g("R_hat")
        state = dict(x0_hat=np.stack([np.asarray(e.x0_hat, float)
                                      for e in estimators]))
        if not self.steady:
            state["P_hat"] = g("P_hat")

        np_dt = np.dtype(dtype) if dtype is not None else None

        def prep(a, tile):
            if np_dt is not None and np.issubdtype(a.dtype, np.floating):
                a = a.astype(np_dt)
            if reps > 1 and tile:
                a = np.tile(a, (reps,) + (1,) * (a.ndim - 1))
            return a

        # params stay distinct-stacked (grouped); per-stream state is tiled
        params = {k: prep(v, tile=False) for k, v in params.items()}
        state = {k: prep(v, tile=True) for k, v in state.items()}
        self.params, self.state = jax.device_put((params, state))

        steady, nd = self.steady, self.nd

        def one(p, st, ym, u, d):
            d0 = d - p["dop"] if nd else d
            y0m = ym - p["yopm"]
            u0 = u - p["uop"]
            x0 = st["x0_hat"]
            y0m_pred = p["Cm_hat"] @ x0 + (p["Ddm_hat"] @ d0 if nd else 0.0)
            if steady:
                x0c = x0 + p["K_hat"] @ (y0m - y0m_pred)
                x0n = (p["A_hat"] @ x0c + p["Bu_hat"] @ u0
                       + (p["Bd_hat"] @ d0 if nd else 0.0) + p["fop_m_xop"])
                new = dict(x0_hat=x0n)
            else:
                x0c, Pc = kf_correct(x0, st["P_hat"], y0m_pred, y0m,
                                     p["Cm_hat"], p["R_hat"])
                xr = (p["A_hat"] @ x0c + p["Bu_hat"] @ u0
                      + (p["Bd_hat"] @ d0 if nd else 0.0))
                x0n, Pn = kf_predict(xr, Pc, p["A_hat"], p["Q_hat"],
                                     p["fop_m_xop"])
                new = dict(x0_hat=x0n, P_hat=Pn)
            return x0c + p["xop_hat"], new

        if self.grouped:
            from .grouped import grouped_transforms
            n_d, reps_ = self.n_distinct, self.reps
            vrep = jax.vmap(one, in_axes=(None, 0, 0, 0, 0))
            vgrp = jax.vmap(vrep, in_axes=(0, 0, 0, 0, 0))
            regroup, flat = grouped_transforms(n_d, reps_)

            def stepfn(p, st, ym, u, d):
                st_g = jax.tree_util.tree_map(regroup, st)
                xh, new_g = vgrp(p, st_g, regroup(ym), regroup(u),
                                 regroup(d))
                return flat(xh), jax.tree_util.tree_map(flat, new_g)

            self._step = jit32(stepfn)
        else:
            self._step = jit32(jax.vmap(one, in_axes=(0, 0, 0, 0, 0)))

    def step(self, ym, u, d=None):
        if d is None:
            if getattr(self, "_dzero", None) is None:
                self._dzero = jnp.zeros((self.B, self.nd))
                jax.block_until_ready(self._dzero)
            d = self._dzero
        x_hat, self.state = self._step(self.params, self.state,
                                       jnp.asarray(ym), jnp.asarray(u),
                                       jnp.asarray(d))
        return x_hat
