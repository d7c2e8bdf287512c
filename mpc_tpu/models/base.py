"""SimModel base class (reference: src/sim_model.jl).

Operating-point ("deviation vector") convention, mirroring ``setop!``
(``sim_model.jl:50-125``):

    u0 = u - uop,  d0 = d - dop,  y0 = y - yop,  x0 = x - xop
    x0(k+1) = f(x0, u0, d0) + fop - xop
    y0(k)   = h(x0, d0)

Construct-time data is NumPy (host); the pure dynamics ``f``/``h`` are
jax-traceable and consumed by the jitted estimator/controller kernels.  The
mutable ``x0`` state plus ``updatestate``/``evaloutput`` give the same
single-plant simulation API as the reference.
"""
from __future__ import annotations

import time

import numpy as np


class SimModel:
    """Abstract plant model."""

    # subclasses set: nu, nx, ny, nd, Ts, and pure fns f(x0,u0,d0,p), h(x0,d0,p)

    def _init_common(self, nu, nx, ny, nd, Ts):
        self.nu, self.nx, self.ny, self.nd = nu, nx, ny, nd
        self.Ts = float(Ts)
        self.uop = np.zeros(nu)
        self.yop = np.zeros(ny)
        self.dop = np.zeros(nd)
        self.xop = np.zeros(nx)
        self.fop = np.zeros(nx)
        self.uname = [f"u_{i+1}" for i in range(nu)]
        self.yname = [f"y_{i+1}" for i in range(ny)]
        self.dname = [f"d_{i+1}" for i in range(nd)]
        self.xname = [f"x_{i+1}" for i in range(nx)]
        self.x0 = np.zeros(nx)
        self.t = 0.0
        self.p = None

    # -- operating points (sim_model.jl:101-125) --
    def setop(self, uop=None, yop=None, dop=None, xop=None, fop=None):
        for name, val, n in (("uop", uop, self.nu), ("yop", yop, self.ny),
                             ("dop", dop, self.nd), ("xop", xop, self.nx),
                             ("fop", fop, self.nx)):
            if val is not None:
                val = np.asarray(val, float).ravel()
                if val.shape != (n,):
                    raise ValueError(f"{name} size must be ({n},)")
                getattr(self, name)[:] = val
        return self

    def setname(self, u=None, y=None, d=None, x=None):
        for name, val, n in (("uname", u, self.nu), ("yname", y, self.ny),
                             ("dname", d, self.nd), ("xname", x, self.nx)):
            if val is not None:
                if len(val) != n:
                    raise ValueError(f"{name} size must be ({n},)")
                setattr(self, name, list(val))
        return self

    def setstate(self, x):
        x = np.asarray(x, float).ravel()
        if x.shape != (self.nx,):
            raise ValueError(f"x size must be ({self.nx},)")
        self.x0 = x - self.xop
        return self

    # -- pure dynamics (overridden) --
    def f(self, x0, u0, d0, p):
        raise NotImplementedError

    def h(self, x0, d0, p):
        raise NotImplementedError

    # -- simulation API (sim_model.jl:201-277) --
    def _check(self, d, u=None):
        d = np.zeros(0) if d is None else np.asarray(d, float).ravel()
        if d.shape != (self.nd,):
            raise ValueError(f"d size {d.shape} ≠ meas. dist. size ({self.nd},)")
        if u is not None:
            u = np.asarray(u, float).ravel()
            if u.shape != (self.nu,):
                raise ValueError(f"u size {u.shape} ≠ manip. input size ({self.nu},)")
        return (d, u) if u is not None else d

    def initstate(self, u, d=None):
        d, u = self._check(d, u)
        self.steadystate(u - self.uop, d - self.dop)
        return self.x0 + self.xop

    def steadystate(self, u0, d0):
        """LinModel overrides; NonLinModel leaves x0 unchanged."""
        return None

    def preparestate(self):
        return self.x0 + self.xop

    def updatestate(self, u, d=None):
        d, u = self._check(d, u)
        u0, d0 = u - self.uop, d - self.dop
        x0next = np.asarray(self.f(self.x0, u0, d0, self.p), float)
        x0next = x0next + self.fop - self.xop
        self.x0 = x0next
        return x0next + self.xop

    def evaloutput(self, d=None):
        d = self._check(d)
        d0 = d - self.dop
        y0 = np.asarray(self.h(self.x0, d0, self.p), float)
        return y0 + self.yop

    __call__ = evaloutput

    # -- soft real-time helpers (sim_model.jl:280-338) --
    def savetime(self):
        self.t = time.time()
        return self.t

    def periodsleep(self, busywait=False):
        if not busywait:
            dt = self.Ts - (time.time() - self.t)
            if dt > 0:
                time.sleep(dt)
        else:
            while time.time() - self.t < self.Ts:
                pass

    def __repr__(self):
        return (f"{type(self).__name__} with a sample time Ts = {self.Ts} s:\n"
                f"└ dimensions:\n"
                f"  ├ {self.nu} manipulated inputs u\n"
                f"  ├ {self.nx} states x\n"
                f"  ├ {self.ny} outputs y\n"
                f"  └ {self.nd} measured disturbances d")
