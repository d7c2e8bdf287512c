"""ExplicitMPC — unconstrained LinMPC solved analytically.

Reference: ``src/controller/explicitmpc.jl``: Z̃ = −H̃⁻¹ q̃ via a cached
Cholesky factorization (explicitmpc.jl:203-209,262-266); no optimizer at all.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.config import jit32

from ..estimators import StateEstimator, SteadyKalmanFilter
from ..models import LinModel
from .base import PredictiveController, default_Hp
from .construct import ControllerWeights, init_quadprog
from .transcription import (SingleShooting, init_predmat, init_ZtoDU,
                            init_ZtoU, move_blocking)


class ExplicitMPC(PredictiveController):
    def __init__(self, model_or_estim, Hp=None, Hc=2,
                 Mwt=None, Nwt=None, Lwt=None, M_Hp=None, N_Hc=None, L_Hp=None,
                 **estim_kwargs):
        if isinstance(model_or_estim, StateEstimator):
            estim = model_or_estim
            model = estim.model
        else:
            model = model_or_estim
            estim = SteadyKalmanFilter(model, **estim_kwargs)
        if not isinstance(model, LinModel):
            raise TypeError("model type must be a LinModel")
        self.estim = estim
        self.transcription = SingleShooting()
        Hp = default_Hp(model) if Hp is None else int(Hp)
        nb = move_blocking(Hp, Hc)
        Hc = len(nb)
        self.Hp, self.Hc, self.nb = Hp, Hc, nb
        nu, ny, nd, nx_hat = model.nu, model.ny, model.nd, estim.nx_hat
        # no slack variable: Cwt = Inf (hard == absent constraints)
        self.weights = ControllerWeights(nu, ny, Hp, Hc, Mwt, Nwt, Lwt,
                                         M_Hp, N_Hc, L_Hp, Cwt=np.inf)
        self.n_eps = 0
        self._build()
        self.Z_tilde = np.zeros(self.nZt)
        self.lastu0 = np.zeros(nu)
        self._step = _build_step(nu, nd)
        self._last = {}

    def _build(self):
        from ..estimators import InternalModel
        from .linmpc import _init_stochpred
        model, estim = self.estim.model, self.estim
        Hp, Hc, nb = self.Hp, self.Hc, self.nb
        nu, ny, nx_hat = model.nu, model.ny, estim.nx_hat
        if isinstance(estim, InternalModel):
            # deterministic model predictions + stochastic output predictions
            # Ŷs via Ks/Ps (init_stochpred, construct.jl:1236-1267) — exactly
            # the LinMPC InternalModel path
            A_hat, Bu_hat, C_hat = model.A, model.Bu, model.C
            Bd_hat, Dd_hat = model.Bd, model.Dd
            xop_hat, fop_hat = model.xop, model.fop
            Ks, Ps = _init_stochpred(estim, Hp)
        else:
            A_hat, Bu_hat, C_hat = estim.A_hat, estim.Bu_hat, estim.C_hat
            Bd_hat, Dd_hat = estim.Bd_hat, estim.Dd_hat
            xop_hat, fop_hat = estim.xop_hat, estim.fop_hat
            Ks = np.zeros((ny * Hp, getattr(estim, "nxs", 0)))
            Ps = np.zeros((ny * Hp, ny))
        (E, G, J, K, V, B, ex, gx, jx, kx, vx, bx) = init_predmat(
            self.transcription, A_hat, Bu_hat, C_hat,
            Bd_hat, Dd_hat, xop_hat, fop_hat, Hp, Hc, nb)
        nx_pred = A_hat.shape[0]
        PDu = init_ZtoDU(self.transcription, nu, nx_pred, Hp, Hc)
        Pu, Tu = init_ZtoU(self.transcription, nu, nx_pred, Hp, Hc, nb)
        H = init_quadprog(E, PDu, Pu, self.weights)
        self.nZ = self.nZt = E.shape[1]
        self._p_cache = None  # invalidate uploaded copy
        Hinv = np.linalg.inv(H)
        Hinv = Hinv @ (2.0 * np.eye(H.shape[0]) - H @ Hinv)  # Newton refine
        self.params = dict(H_inv=Hinv, E=E, G=G, J=J, K=K,
                           V=V, B=B, Pu=Pu, Tu=Tu, Ks=Ks, Ps=Ps,
                           M_Hp=self.weights.M_Hp, L_Hp=self.weights.L_Hp,
                           Uop=np.tile(model.uop, Hp), Yop=np.tile(model.yop, Hp))
        self._H = H
        self.Uop = np.tile(model.uop, Hp)
        self.Yop = np.tile(model.yop, Hp)
        self.Dop = np.tile(model.dop, Hp)

    def setconstraint(self, **kw):
        """ExplicitMPC solves the unconstrained QP analytically — constraints
        are not supported (reference explicitmpc.jl: no setconstraint!
        method; use LinMPC for constrained problems)."""
        raise NotImplementedError(
            "ExplicitMPC does not support constraints; use LinMPC instead")

    def setmodel(self, model=None, Mwt=None, Nwt=None, Lwt=None, **cov):
        """Hot-swap the plant model (explicitmpc.jl setmodel! support)."""
        from .linmpc import _setmodel_estimator
        model_ = self.estim.model
        if model is not None:
            lastu_abs = self.lastu0 + model_.uop
            _setmodel_estimator(self.estim, model, **cov)
            self.lastu0 = lastu_abs - model.uop
            model_ = model
        if Mwt is not None or Nwt is not None or Lwt is not None:
            self.weights = ControllerWeights(
                model_.nu, model_.ny, self.Hp, self.Hc,
                Mwt if Mwt is not None else np.diag(self.weights.M_Hp)[:model_.ny],
                Nwt if Nwt is not None else np.diag(self.weights.N_Hc)[:model_.nu],
                Lwt if Lwt is not None else np.diag(self.weights.L_Hp)[:model_.nu],
                Cwt=np.inf)
        self._build()
        return self

    def moveinput(self, ry=None, d=None, D_hat=None, R_hat_y=None,
                  R_hat_u=None, lastu=None, **alias):
        model, estim = self.estim.model, self.estim
        D_hat = D_hat if D_hat is not None else alias.get("Dhat")
        R_hat_y = R_hat_y if R_hat_y is not None else alias.get("Rhaty")
        R_hat_u = R_hat_u if R_hat_u is not None else alias.get("Rhatu")
        ry, d, D_hat, R_hat_y, R_hat_u, lastu = self._prepare_args(
            ry, d, D_hat, R_hat_y, R_hat_u, lastu)
        self.lastu0 = lastu - model.uop
        d0 = d - model.dop
        D0 = D_hat - self.Dop
        if getattr(self, "_p_cache", None) is None:
            self._p_cache = jax.device_put(
                {k: np.asarray(v) for k, v in self.params.items()})
        p = self._p_cache
        from ..estimators import InternalModel
        if isinstance(estim, InternalModel):
            xs_hat, ys_full = estim.xs_hat, estim.ys_hat
        else:
            xs_hat = np.zeros(self.params["Ks"].shape[1])
            ys_full = np.zeros(model.ny)
        u, Z, F = self._step(p, jnp.asarray(estim.x0_hat), jnp.asarray(self.lastu0),
                             jnp.asarray(d0), jnp.asarray(D0),
                             jnp.asarray(R_hat_y), jnp.asarray(R_hat_u),
                             jnp.asarray(xs_hat), jnp.asarray(ys_full))
        self.lastu0_at_solve = self.lastu0.copy()
        self.Z_tilde = np.asarray(Z)
        self._last = dict(F=np.asarray(F), d=d, D_hat=D_hat,
                          R_hat_y=R_hat_y, R_hat_u=R_hat_u)
        u = np.asarray(u)
        self.lastu0 = u - model.uop
        return u

    def getinfo(self):
        nu = self.estim.model.nu
        Z = self.Z_tilde
        info = {}
        info["DeltaU"] = info["ΔU"] = Z[:nu * self.Hc]
        info["epsilon"] = info["ϵ"] = 0.0
        U0 = self.params["Pu"] @ Z + self.params["Tu"] @ self.lastu0_at_solve
        info["U"] = U0 + self.Uop
        info["u"] = info["U"][:nu]
        Y0 = self.params["E"] @ Z + self._last["F"]
        info["Yhat"] = info["Ŷ"] = Y0 + self.Yop
        info["xhat"] = info["x̂"] = self.estim.x0_hat + self.estim.xop_hat
        info["yhat"] = info["ŷ"] = np.asarray(
            self.estim.evaloutput(self._last.get("d")
                                  if self.estim.model.nd else None), float)
        # objective value from the tracking terms (execute.jl:172)
        w = self.weights
        ey = Y0 + self.Yop - self._last["R_hat_y"]
        eu = U0 + self.Uop - self._last["R_hat_u"]
        DU = info["DeltaU"]
        info["J"] = float(ey @ w.M_Hp @ ey + DU @ w.N_Hc @ DU
                          + eu @ w.L_Hp @ eu)
        info["lastu"] = self.lastu0_at_solve + self.estim.model.uop
        return info

    def __repr__(self):
        model = self.estim.model
        return (f"ExplicitMPC controller with a sample time Ts = {model.Ts} s:\n"
                f"├ estimator: {type(self.estim).__name__}\n"
                f"└ dimensions: Hp={self.Hp}, Hc={self.Hc}, nu={model.nu}, "
                f"nx̂={self.estim.nx_hat}")


def _build_step(nu, nd):
    @jit32
    def step(p, x0_hat, lastu0, d0, D0, R_hat_y, R_hat_u, xs_hat, ys_full):
        F = p["B"] + p["K"] @ x0_hat + p["V"] @ lastu0
        if nd:
            F = F + p["G"] @ d0 + p["J"] @ D0
        # InternalModel stochastic output predictions (predictstoch!,
        # execute.jl:321-327); zero matrices otherwise
        F = F + p["Ks"] @ xs_hat + p["Ps"] @ ys_full
        Cy = F + p["Yop"] - R_hat_y
        Cu = p["Tu"] @ lastu0 + p["Uop"] - R_hat_u
        q = 2.0 * (p["E"].T @ (p["M_Hp"] @ Cy) + p["Pu"].T @ (p["L_Hp"] @ Cu))
        # Z = −H⁻¹q with the Newton-refined host inverse: cho_solve's
        # triangular solves are SERIAL custom calls on TPU; the matvec is
        # one fused op and is exact to f64 roundoff for this SPD H
        Z = -(p["H_inv"] @ q)
        u = Z[:nu] + lastu0 + p["Uop"][:nu]
        return u, Z, F

    return step
