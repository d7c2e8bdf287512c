"""Batched ExplicitMPC: lockstep fleets of unconstrained analytic MPC.

The ExplicitMPC step is a pure params function (Z̃ = −H̃⁻¹q̃ with a
Newton-refined host inverse — ``controllers/explicitmpc.py``); a fleet
over independent plants/states is one vmapped jitted computation with the
SteadyKalmanFilter feedback inline, exactly like
:class:`~mpc_tpu.parallel.batch.BatchedLinMPC` minus the QP loop.  The
per-step cost is a handful of matvecs, so this is the fastest fleet
surface in the framework (the reference benchmarks ExplicitMPC per call,
`benchmark/3_bench_predictive_control.jl` — this is the batched
analogue).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.config import jit32

from .batch import estimator_params


class BatchedExplicitMPC:
    """Lockstep batch of ExplicitMPC controllers (one plant model each).

    ``step(ym, ry, d)`` runs the full control period for every scenario:
    SKF correction, analytic solve, receding input, SKF prediction — one
    jitted call.  ``reps`` tiles the distinct controllers along the batch
    axis with grouped (distinct × reps) double-vmap execution (params
    read once per replica group; public lane order ``lane = r·n_d + c``).
    """

    def __init__(self, controllers, dtype=None, reps: int = 1):
        c0 = controllers[0]
        # homogeneity contract (advisor r04): heterogeneous fleets would
        # otherwise die inside np.stack with an opaque shape error
        for i, c in enumerate(controllers[1:], 1):
            m0, mi = c0.estim.model, c.estim.model
            key0 = (c0.Hp, c0.Hc, m0.nu, m0.ny, m0.nd)
            keyi = (c.Hp, c.Hc, mi.nu, mi.ny, mi.nd)
            if keyi != key0:
                raise ValueError(
                    f"BatchedExplicitMPC needs homogeneous controllers: "
                    f"controller 0 has (Hp, Hc, nu, ny, nd)={key0}, "
                    f"controller {i} has {keyi}")
        self.n_distinct = len(controllers)
        self.reps = int(reps)
        self.B = self.n_distinct * self.reps
        self.Hp = c0.Hp
        self.nu = c0.estim.model.nu
        self.ny = c0.estim.model.ny
        self.nd = c0.estim.model.nd
        params = {k: np.stack([np.asarray(c.params[k]) for c in controllers])
                  for k in c0.params}
        eparams = estimator_params(controllers)
        np_dt = np.dtype(dtype) if dtype is not None else None

        def cast(a):
            if np_dt is not None and np.issubdtype(a.dtype, np.floating):
                return a.astype(np_dt)
            return a

        params = {k: cast(v) for k, v in params.items()}
        eparams = {k: cast(v) for k, v in eparams.items()}
        dt = params["H_inv"].dtype
        state = dict(
            x0_hat=np.zeros((self.B, c0.estim.nx_hat), dt),
            lastu0=np.zeros((self.B, self.nu), dt),
        )
        self.params, self.eparams, self.state = jax.device_put(
            (params, eparams, state))

        step_raw = c0._step
        nd, Hp, ny = self.nd, self.Hp, self.ny

        def one(p, ep, st, ym, ry, d):
            d0 = d - ep["dop"] if nd else d
            y0m = ym - ep["yop_m"]
            x0 = st["x0_hat"]
            v = y0m - ep["Cm_hat"] @ x0 - (ep["Ddm_hat"] @ d0 if nd else 0.0)
            x0c = x0 + ep["K_hat"] @ v
            D0 = jnp.tile(d0, Hp)
            R_hat_y = jnp.tile(ry, Hp)          # absolute setpoints
            R_hat_u = p["Uop"]
            nxs = p["Ks"].shape[1]
            u, Z, F = step_raw(p, x0c, st["lastu0"], d0, D0, R_hat_y,
                               R_hat_u, jnp.zeros(nxs, x0.dtype),
                               jnp.zeros(ny, x0.dtype))
            lastu0 = u - ep["uop"]
            x0n = ep["A_hat"] @ x0c + ep["Bu_hat"] @ lastu0
            if nd:
                x0n = x0n + ep["Bd_hat"] @ d0
            x0n = x0n + ep["fop_m_xop"]
            return u, dict(x0_hat=x0n, lastu0=lastu0)

        if self.reps > 1:
            from .grouped import grouped_transforms
            regroup, flat = grouped_transforms(self.n_distinct, self.reps)
            vrep = jax.vmap(one, in_axes=(None, None, 0, 0, 0, 0))
            vgrp = jax.vmap(vrep, in_axes=(0, 0, 0, 0, 0, 0))

            def stepfn(p, ep, st, ym, ry, d):
                st_g = jax.tree_util.tree_map(regroup, st)
                u, new_g = vgrp(p, ep, st_g, regroup(ym), regroup(ry),
                                regroup(d))
                return flat(u), jax.tree_util.tree_map(flat, new_g)

            self._step = jit32(stepfn)
        else:
            self._step = jit32(jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0)))

    def step(self, ym, ry, d=None):
        if d is None:
            if getattr(self, "_dzero", None) is None:
                self._dzero = jnp.zeros((self.B, self.nd),
                                        self.params["H_inv"].dtype)
                jax.block_until_ready(self._dzero)
            d = self._dzero
        dt = self.params["H_inv"].dtype
        u, self.state = self._step(self.params, self.eparams, self.state,
                                   jnp.asarray(ym, dt), jnp.asarray(ry, dt),
                                   jnp.asarray(d, dt))
        return u
