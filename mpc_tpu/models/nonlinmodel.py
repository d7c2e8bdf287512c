"""Nonlinear plant model (reference: src/model/nonlinmodel.jl).

User supplies jax-traceable ``f(x, u, d, p)`` / ``h(x, d, p)``; continuous
dynamics are discretized with a :class:`~mpc_tpu.models.solver.RungeKutta`
solver (``solver=None`` means ``f`` is already discrete, mirroring
``nonlinmodel.jl:4-13``).  Unlike the reference's mutating/non-mutating
method-signature detection (``nonlinmodel.jl:221-295``), everything here is
pure-functional — the natural JAX form.
"""
from __future__ import annotations

import numpy as np

from .base import SimModel

from ..utils.config import jit32
from .solver import DiffSolver, EmptySolver, RungeKutta


class NonLinModel(SimModel):
    def __init__(self, f, h, Ts, nu, nx, ny, nd=0, p=None, solver="rk4"):
        if solver is None:
            solver = EmptySolver()
        elif solver == "rk4":
            solver = RungeKutta(4)
        elif not isinstance(solver, DiffSolver):
            raise TypeError("solver must be None, 'rk4' or a DiffSolver")
        self.solver = solver
        self._f_user, self._h_user = f, h
        self._fd = solver.discretize(f, Ts)
        self._init_common(nu, nx, ny, nd, Ts)
        self.p = p
        # jitted host-API step (eager lax.fori_loop dispatch is ~100ms/call);
        # the pure self.f stays unjitted for tracing inside larger graphs
        import jax
        self._fd_jit = jit32(self._fd)
        self._h_jit = jit32(h)
        # validate the user functions' output shapes abstractly (no FLOPs):
        # a silent nx/ny mismatch otherwise surfaces much later as an opaque
        # XLA shape error inside an estimator or controller trace
        import jax.numpy as jnp
        xs = jax.ShapeDtypeStruct((nx,), jnp.float64 if
                                  jax.config.jax_enable_x64 else jnp.float32)
        us = jax.ShapeDtypeStruct((nu,), xs.dtype)
        ds = jax.ShapeDtypeStruct((nd,), xs.dtype)
        try:
            f_shape = jax.eval_shape(self._fd, xs, us, ds, p).shape
            h_shape = jax.eval_shape(h, xs, ds, p).shape
        except Exception as e:
            raise ValueError(
                f"f/h are not traceable with x({nx},), u({nu},), d({nd},): {e}"
            ) from e
        if f_shape != (nx,):
            raise ValueError(f"f must return shape ({nx},), got {f_shape}")
        if h_shape != (ny,):
            raise ValueError(f"h must return shape ({ny},), got {h_shape}")

    def f(self, x0, u0, d0, p):
        # inside a trace, stay traceable; from the host API, use the jitted step
        if isinstance(x0, np.ndarray) or np.isscalar(x0):
            return self._fd_jit(x0, u0, d0, p)
        return self._fd(x0, u0, d0, p)

    def h(self, x0, d0, p):
        if isinstance(x0, np.ndarray) or np.isscalar(x0):
            return self._h_jit(x0, d0, p)
        return self._h_user(x0, d0, p)

    def __repr__(self):
        sname = type(self.solver).__name__
        if isinstance(self.solver, RungeKutta):
            sname = f"RungeKutta({self.solver.order}, supersample={self.solver.supersample})"
        return (f"NonLinModel with a sample time Ts = {self.Ts} s, {sname} solver:\n"
                f"└ dimensions:\n"
                f"  ├ {self.nu} manipulated inputs u\n"
                f"  ├ {self.nx} states x\n"
                f"  ├ {self.ny} outputs y\n"
                f"  └ {self.nd} measured disturbances d")
