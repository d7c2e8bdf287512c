"""PredictiveController base: the moveinput protocol and estimator plumbing.

Reference: ``src/predictive_control.jl`` and ``src/controller/execute.jl``.
The controller owns a state estimator; ``preparestate``/``updatestate`` are
forwarded to it (execute.jl:518-556).
"""
from __future__ import annotations

import numpy as np

from ..estimators import StateEstimator
from ..models import LinModel


def estimate_delays(model):
    """Hp safety margin = number of dead-time states (construct.jl:576-591).

    The reference counts ≈0 poles; after our orthogonal ``minreal`` the
    exactly-nilpotent shift registers are rotated and their eigenvalues
    inflate to ~ε^(1/n), so the structural count recorded at discretization
    (``model.nk``) is used, with the eigenvalue test as a fallback.
    """
    if isinstance(model, LinModel):
        nk = getattr(model, "nk", 0)
        if nk:
            return int(nk)
        poles = np.linalg.eigvals(model.A)
        return int(np.sum(np.isclose(np.abs(poles), 0.0, atol=1e-3)))
    return 0


def info2debugstr(info):
    """Format a ``getinfo`` dict for debug logs (general.jl:64-81): one
    ``key => value`` line each, ASCII aliases and the solution summary
    collapsed."""
    import numpy as np
    lines = ["Content of getinfo dictionary:"]
    for k, v in info.items():
        if k == "sol":
            continue
        if any(ord(c) > 127 for c in k):
            continue  # Unicode duplicate of an ASCII key
        if isinstance(v, np.ndarray):
            v = np.array2string(np.asarray(v), precision=4, threshold=12)
        lines.append(f"  :{k} => {v}")
    if "sol" in info:
        lines.append("  :sol =>")
        for sk, sv in dict(info["sol"]).items():
            lines.append(f"    {sk}: {sv}")
    return "\n".join(lines) + "\n"


def default_Hp(model):
    if not isinstance(model, LinModel):
        raise ValueError("Prediction horizon Hp must be explicitly specified "
                         "if model is not a LinModel.")
    return 10 + estimate_delays(model)


class PredictiveController:
    estim: StateEstimator

    # -- estimator forwarding --
    def preparestate(self, ym, d=None):
        return self.estim.preparestate(ym, d)

    def updatestate(self, u, ym, d=None):
        return self.estim.updatestate(u, ym, d)

    def setstate(self, x_hat, P_hat=None):
        self.estim.setstate(x_hat, P_hat)
        return self

    def initstate(self, u, ym, d=None):
        """Init estimator states and reset warm start (execute.jl:9-13)."""
        self.Z_tilde = np.zeros_like(self.Z_tilde)
        self.lastu0 = np.asarray(u, float) - self.estim.model.uop
        return self.estim.initstate(u, ym, d)

    def savetime(self):
        return self.estim.model.savetime()

    def periodsleep(self, busywait=False):
        return self.estim.model.periodsleep(busywait)

    # -- moveinput argument handling (execute.jl:59-80) --
    def _prepare_args(self, ry, d, D_hat, R_hat_y, R_hat_u, lastu):
        model = self.estim.model
        ny, nd, nu, Hp = model.ny, model.nd, model.nu, self.Hp
        ry = model.yop if ry is None else np.asarray(ry, float).ravel()
        d = np.zeros(0) if d is None else np.asarray(d, float).ravel()
        if ry.shape != (ny,):
            raise ValueError(f"ry size {ry.shape} ≠ output size ({ny},)")
        if d.shape != (nd,):
            raise ValueError(f"d size {d.shape} ≠ measured dist. size ({nd},)")
        D_hat = np.tile(d, Hp) if D_hat is None else np.asarray(D_hat, float).ravel()
        R_hat_y = np.tile(ry, Hp) if R_hat_y is None else np.asarray(R_hat_y, float).ravel()
        R_hat_u = self.Uop if R_hat_u is None else np.asarray(R_hat_u, float).ravel()
        lastu = (self.lastu0 + model.uop) if lastu is None else np.asarray(lastu, float).ravel()
        if D_hat.shape != (nd * Hp,):
            raise ValueError(f"D̂ size {D_hat.shape} ≠ ({nd * Hp},)")
        if R_hat_y.shape != (ny * Hp,):
            raise ValueError(f"R̂y size {R_hat_y.shape} ≠ ({ny * Hp},)")
        if R_hat_u.shape != (nu * Hp,):
            raise ValueError(f"R̂u size {R_hat_u.shape} ≠ ({nu * Hp},)")
        if lastu.shape != (nu,):
            raise ValueError(f"lastu size {lastu.shape} ≠ ({nu},)")
        return ry, d, D_hat, R_hat_y, R_hat_u, lastu

    def __call__(self, ry=None, d=None, **kw):
        return self.moveinput(ry, d, **kw)
