"""Kalman-family estimators (reference: src/estimator/kalman.jl).

SteadyKalmanFilter, KalmanFilter, UnscentedKalmanFilter, ExtendedKalmanFilter.
The correct/predict math is written as pure jnp kernels so the same code runs
eagerly in the stateful API and traced inside jit/vmap batched pipelines.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.config import jit32

from ..models import LinModel
from ..utils import linalg as ula
from .base import StateEstimator
from .construct import validate_covariances


def _sigma_scales(nu_or_sigma, n, name):
    v = np.asarray(nu_or_sigma, float).ravel()
    if v.shape != (n,):
        raise ValueError(f"{name} size {v.shape} ≠ ({n},)")
    if np.any(v < 0):
        # σ values are standard deviations; a negative one silently squares
        # into a "valid" covariance and hides the user error (the reference
        # rejects them at construction)
        raise ValueError(f"{name} entries must be non-negative")
    return v


def _default_sigmas(model, i_ym, nint_u, nint_ym, sigmaQ, sigmaR,
                    sigmaQint_u, sigmaQint_ym):
    nx, nym = model.nx, len(i_ym)
    sQ = np.full(nx, 1 / nx) if sigmaQ is None else _sigma_scales(sigmaQ, nx, "σQ")
    sR = np.ones(nym) if sigmaR is None else _sigma_scales(sigmaR, nym, "σR")
    nu_int = sum(nint_u) if not np.isscalar(nint_u) else 0
    nym_int = sum(nint_ym) if not np.isscalar(nint_ym) else 0
    sQu = np.ones(nu_int) if sigmaQint_u is None else _sigma_scales(sigmaQint_u, nu_int, "σQint_u")
    sQy = np.ones(nym_int) if sigmaQint_ym is None else _sigma_scales(sigmaQint_ym, nym_int, "σQint_ym")
    Q_hat = np.diag(np.concatenate([sQ, sQu, sQy]) ** 2)
    R_hat = np.diag(sR ** 2)
    return Q_hat, R_hat


# ---------------------------------------------------------------------------
class SteadyKalmanFilter(StateEstimator):
    """Asymptotic Kalman filter for LinModel (kalman.jl:4-309).

    The gain is the steady-state filter gain from the prediction-form DARE so
    the estimator matches :class:`KalmanFilter` asymptotically for both
    ``direct`` settings.
    """

    def __init__(self, model: LinModel, i_ym=None, nint_u=0, nint_ym=None,
                 sigmaQ=None, sigmaR=None, sigmaQint_u=None, sigmaQint_ym=None,
                 Q_hat=None, R_hat=None, direct=True):
        if not isinstance(model, LinModel):
            raise TypeError("SteadyKalmanFilter requires a LinModel")
        self._init_common(model, i_ym, nint_u, nint_ym, direct)
        if Q_hat is None or R_hat is None:
            # integrator counts resolved by _init_common
            Q_hat, R_hat = _default_sigmas(model, self.i_ym, self.nint_u, self.nint_ym,
                                           sigmaQ, sigmaR, sigmaQint_u, sigmaQint_ym)
        Q_hat, R_hat = validate_covariances(self.nx_hat, self.nym, Q_hat, R_hat)
        self.Q_hat, self.R_hat = Q_hat, R_hat
        try:
            K_hat, P_hat = ula.steady_kalman_gain(self.A_hat, self.Cm_hat, Q_hat,
                                                  R_hat, direct=direct)
        except Exception as err:
            raise ValueError(
                "Cannot compute the optimal Kalman gain K̂ for the SteadyKalmanFilter. "
                "You may try to remove integrators with nint_u/nint_ym parameter or "
                "use the time-varying KalmanFilter.") from err
        self.K_hat, self.P_hat = K_hat, P_hat

    def _correct(self, y0m, d0):
        x0 = self.x0_hat
        y0m_pred = self.Cm_hat @ x0 + self.Ddm_hat @ d0
        v = y0m - y0m_pred
        if np.any(np.isnan(v)):
            import warnings
            warnings.warn("NaN values in the Kalman filter measurements ym: "
                          "skipping correction step")
            return
        self.x0_hat = x0 + self.K_hat @ v

    def _predict(self, u0, d0):
        x0n = np.asarray(self.f_hat(self.x0_hat, u0, d0), float)
        self.x0_hat = x0n + self.fop_hat - self.xop_hat

    def _update_model(self, model, Qhat, Rhat):
        """Unlike the reference (which rejects setmodel! on the
        SteadyKalmanFilter, kalman.jl:228-234), the steady gain is simply
        recomputed from the new model's DARE — a host-side solve that keeps
        successive-linearization adaptive MPC working with the default
        estimator."""
        super()._update_model(model, Qhat, Rhat)
        self.K_hat, self.P_hat = ula.steady_kalman_gain(
            self.A_hat, self.Cm_hat, self.Q_hat, self.R_hat, direct=self.direct)


# ---------------------------------------------------------------------------
# pure kernels for the time-varying KF (shared by KF and EKF)
# re-exported from utils.small_linalg (shared with ops/qp_active)
from ..utils.small_linalg import chol_small, inv_spd_small  # noqa: E402,F401


def kf_correct(x0, P, y0m_pred, y0m, Cm, R):
    """Time-varying KF correction (kalman.jl:1235-1264), NaN-safe."""
    PCt = P @ Cm.T
    M = Cm @ PCt + R
    K = PCt @ inv_spd_small(0.5 * (M + M.T))
    v = y0m - y0m_pred
    skip = jnp.any(jnp.isnan(v))
    v = jnp.nan_to_num(v)
    x0c = x0 + K @ v
    Pc = (jnp.eye(P.shape[0], dtype=P.dtype) - K @ Cm) @ P
    x0c = jnp.where(skip, x0, x0c)
    Pc = jnp.where(skip, P, Pc)
    return x0c, 0.5 * (Pc + Pc.T)


def kf_predict(x0n_raw, P, A, Q, fop_m_xop):
    """Time-varying KF prediction (kalman.jl:1275-1290)."""
    x0n = x0n_raw + fop_m_xop
    Pn = A @ P @ A.T + Q
    return x0n, 0.5 * (Pn + Pn.T)


class KalmanFilter(StateEstimator):
    """Time-varying Kalman filter for LinModel (kalman.jl:311-527)."""

    def __init__(self, model: LinModel, i_ym=None, nint_u=0, nint_ym=None,
                 sigmaQ=None, sigmaR=None, sigmaQint_u=None, sigmaQint_ym=None,
                 sigmaP_0=None, sigmaPint_u_0=None, sigmaPint_ym_0=None,
                 Q_hat=None, R_hat=None, P0_hat=None, direct=True):
        if not isinstance(model, LinModel):
            raise TypeError("KalmanFilter requires a LinModel")
        self._init_common(model, i_ym, nint_u, nint_ym, direct)
        if Q_hat is None or R_hat is None:
            Q_hat, R_hat = _default_sigmas(model, self.i_ym, self.nint_u, self.nint_ym,
                                           sigmaQ, sigmaR, sigmaQint_u, sigmaQint_ym)
        if P0_hat is None:
            P0_hat = _default_P0(model, self.nint_u, self.nint_ym,
                                 sigmaP_0, sigmaPint_u_0, sigmaPint_ym_0)
        Q_hat, R_hat, P0_hat = validate_covariances(self.nx_hat, self.nym,
                                                    Q_hat, R_hat, P0_hat)
        self.Q_hat, self.R_hat, self.P0_hat = Q_hat, R_hat, P0_hat
        self.P_hat = P0_hat.copy()

    def _init_cov(self):
        self.P_hat = self.P0_hat.copy()

    def _set_cov(self, P_hat):
        if P_hat.shape != (self.nx_hat, self.nx_hat):
            raise ValueError(f"P̂ size must be {(self.nx_hat, self.nx_hat)}")
        self.P_hat = P_hat

    def _correct(self, y0m, d0):
        """Host NumPy f64 form of :func:`kf_correct` (same math, same
        NaN-skip semantics): the single-stream protocol path was dominated
        by eager-jnp dispatch (~1 ms/call for a handful of tiny matmuls);
        the traced fleets keep the jnp kernel."""
        y0m_pred = self.Cm_hat @ self.x0_hat + self.Ddm_hat @ d0
        if np.any(np.isnan(y0m)):
            import warnings
            warnings.warn("NaN values in the Kalman filter measurements ym: "
                          "skipping correction step")
            return
        P = self.P_hat
        PCt = P @ self.Cm_hat.T
        M = self.Cm_hat @ PCt + self.R_hat
        K = np.linalg.solve(M.T, PCt.T).T
        self.x0_hat = self.x0_hat + K @ (np.asarray(y0m, float) - y0m_pred)
        Pc = (np.eye(P.shape[0]) - K @ self.Cm_hat) @ P
        self.P_hat = 0.5 * (Pc + Pc.T)

    def _predict(self, u0, d0):
        """Host NumPy f64 form of :func:`kf_predict` (same math)."""
        x0n_raw = np.asarray(self.f_hat(self.x0_hat, u0, d0), float)
        self.x0_hat = x0n_raw + (self.fop_hat - self.xop_hat)
        Pn = self.A_hat @ self.P_hat @ self.A_hat.T + self.Q_hat
        self.P_hat = 0.5 * (Pn + Pn.T)


def _default_P0(model, nint_u, nint_ym, sigmaP_0, sigmaPint_u_0, sigmaPint_ym_0):
    nx = model.nx
    # reference default σP_0 = fill(1/nx, nx), same as σQ (kalman.jl:430-431)
    sP = np.full(nx, 1.0 / nx) if sigmaP_0 is None else _sigma_scales(sigmaP_0, nx, "σP_0")
    nu_int, nym_int = sum(nint_u), sum(nint_ym)
    sPu = np.ones(nu_int) if sigmaPint_u_0 is None else _sigma_scales(sigmaPint_u_0, nu_int, "σPint_u_0")
    sPy = np.ones(nym_int) if sigmaPint_ym_0 is None else _sigma_scales(sigmaPint_ym_0, nym_int, "σPint_ym_0")
    return np.diag(np.concatenate([sP, sPu, sPy]) ** 2)


# ---------------------------------------------------------------------------
class UnscentedKalmanFilter(StateEstimator):
    """UKF for any SimModel (kalman.jl:528-906), generalized unscented
    transform with 2nx̂+1 sigma points."""

    def __init__(self, model, i_ym=None, nint_u=0, nint_ym=None,
                 sigmaQ=None, sigmaR=None, sigmaQint_u=None, sigmaQint_ym=None,
                 sigmaP_0=None, sigmaPint_u_0=None, sigmaPint_ym_0=None,
                 Q_hat=None, R_hat=None, P0_hat=None,
                 alpha=1e-3, beta=2.0, kappa=0.0, direct=True):
        self._init_common(model, i_ym, nint_u, nint_ym, direct)
        if Q_hat is None or R_hat is None:
            Q_hat, R_hat = _default_sigmas(model, self.i_ym, self.nint_u, self.nint_ym,
                                           sigmaQ, sigmaR, sigmaQint_u, sigmaQint_ym)
        if P0_hat is None:
            P0_hat = _default_P0(model, self.nint_u, self.nint_ym,
                                 sigmaP_0, sigmaPint_u_0, sigmaPint_ym_0)
        Q_hat, R_hat, P0_hat = validate_covariances(self.nx_hat, self.nym,
                                                    Q_hat, R_hat, P0_hat)
        self.Q_hat, self.R_hat, self.P0_hat = Q_hat, R_hat, P0_hat
        self.P_hat = P0_hat.copy()
        # init_ukf constants (kalman.jl:760-770)
        nx_hat = self.nx_hat
        gamma = alpha * np.sqrt(nx_hat + kappa)
        m0 = 1 - nx_hat / gamma ** 2
        w = 1 / (2 * gamma ** 2)
        self.gamma = float(gamma)  # python float: weak-typed under jax promotion
        # kept for the f32-fleet envelope guard (BatchedNonLinMPC): the
        # sigma weights scale ~1/α², which amplifies f32 rounding
        self.alpha = float(alpha)
        self.m_hat = np.concatenate([[m0], np.full(2 * nx_hat, w)])
        self.S_hat = np.concatenate([[m0 + 1 - alpha ** 2 + beta], np.full(2 * nx_hat, w)])

    _init_cov = KalmanFilter._init_cov
    _set_cov = KalmanFilter._set_cov

    def _kernels(self):
        """Jitted correct/predict kernels (vmapped sigma points)."""
        k = getattr(self, "_jit_kernels", None)
        if k is not None:
            return k
        nx_hat = self.nx_hat
        gamma = self.gamma
        h_hat_m, f_hat = self.h_hat_m, self.f_hat

        def sigma_points(x0, P):
            L = chol_small(P)
            gL = gamma * L
            X = jnp.tile(x0[:, None], (1, 2 * nx_hat + 1))
            X = X.at[:, 1:nx_hat + 1].add(gL)
            X = X.at[:, nx_hat + 1:].add(-gL)
            return X

        @jit32
        def correct(x0, P, y0m, d0, m, S, R):
            X = sigma_points(x0, P)
            Ym = jax.vmap(lambda xc: jnp.asarray(h_hat_m(xc, d0)),
                          in_axes=1, out_axes=1)(X)
            y0m_pred = Ym @ m
            Xb = X - x0[:, None]
            Yb = Ym - y0m_pred[:, None]
            M = (Yb * S) @ Yb.T + R
            K = ((Xb * S) @ Yb.T) @ inv_spd_small(0.5 * (M + M.T))
            v = y0m - y0m_pred
            x0c = x0 + K @ v
            Pc = P - K @ M @ K.T
            return x0c, 0.5 * (Pc + Pc.T)

        @jit32
        def predict(x0, P, u0, d0, m, S, Q, fop_m_xop):
            X = sigma_points(x0, P)
            Xn = jax.vmap(lambda xc: jnp.asarray(f_hat(xc, u0, d0)) + fop_m_xop,
                          in_axes=1, out_axes=1)(X)
            x0n = Xn @ m
            Xb = Xn - x0n[:, None]
            Pn = (Xb * S) @ Xb.T + Q
            return x0n, 0.5 * (Pn + Pn.T)

        self._jit_kernels = (correct, predict)
        return self._jit_kernels

    def _correct(self, y0m, d0):
        if np.any(np.isnan(y0m)):
            import warnings
            warnings.warn("NaN values in the Kalman filter measurements ym: "
                          "skipping correction step")
            return
        correct, _ = self._kernels()
        x0c, Pc = correct(jnp.asarray(self.x0_hat), jnp.asarray(self.P_hat),
                          jnp.asarray(y0m), jnp.asarray(d0),
                          jnp.asarray(self.m_hat), jnp.asarray(self.S_hat),
                          jnp.asarray(self.R_hat))
        self.x0_hat = np.asarray(x0c)
        self.P_hat = np.asarray(Pc)

    def _predict(self, u0, d0):
        _, predict = self._kernels()
        x0n, Pn = predict(jnp.asarray(self.x0_hat), jnp.asarray(self.P_hat),
                          jnp.asarray(u0), jnp.asarray(d0),
                          jnp.asarray(self.m_hat), jnp.asarray(self.S_hat),
                          jnp.asarray(self.Q_hat),
                          jnp.asarray(self.fop_hat - self.xop_hat))
        self.x0_hat = np.asarray(x0n)
        self.P_hat = np.asarray(Pn)


# ---------------------------------------------------------------------------
class ExtendedKalmanFilter(StateEstimator):
    """EKF with jax.jacfwd Jacobians of the augmented model
    (kalman.jl:908-1211)."""

    def __init__(self, model, i_ym=None, nint_u=0, nint_ym=None,
                 sigmaQ=None, sigmaR=None, sigmaQint_u=None, sigmaQint_ym=None,
                 sigmaP_0=None, sigmaPint_u_0=None, sigmaPint_ym_0=None,
                 Q_hat=None, R_hat=None, P0_hat=None, direct=True):
        self._init_common(model, i_ym, nint_u, nint_ym, direct)
        if Q_hat is None or R_hat is None:
            Q_hat, R_hat = _default_sigmas(model, self.i_ym, self.nint_u, self.nint_ym,
                                           sigmaQ, sigmaR, sigmaQint_u, sigmaQint_ym)
        if P0_hat is None:
            P0_hat = _default_P0(model, self.nint_u, self.nint_ym,
                                 sigmaP_0, sigmaPint_u_0, sigmaPint_ym_0)
        Q_hat, R_hat, P0_hat = validate_covariances(self.nx_hat, self.nym,
                                                    Q_hat, R_hat, P0_hat)
        self.Q_hat, self.R_hat, self.P0_hat = Q_hat, R_hat, P0_hat
        self.P_hat = P0_hat.copy()

    _init_cov = KalmanFilter._init_cov
    _set_cov = KalmanFilter._set_cov

    def _kernels(self):
        """Jitted correct/predict kernels with jacfwd Jacobians."""
        k = getattr(self, "_jit_kernels", None)
        if k is not None:
            return k
        f_hat, h_hat_m = self.f_hat, self.h_hat_m
        is_lin = isinstance(self.model, LinModel)
        A_hat = self.A_hat if is_lin else None
        Cm_hat = self.Cm_hat if is_lin else None

        @jit32
        def correct(x0, P, y0m, d0, R):
            if is_lin:
                Hm = jnp.asarray(Cm_hat)
            else:
                Hm = jax.jacfwd(lambda xx: jnp.asarray(h_hat_m(xx, d0)))(x0)
            y0m_pred = jnp.asarray(h_hat_m(x0, d0))
            return kf_correct(x0, P, y0m_pred, y0m, Hm, R)

        @jit32
        def predict(x0, P, u0, d0, Q, fop_m_xop):
            if is_lin:
                F = jnp.asarray(A_hat)
            else:
                F = jax.jacfwd(lambda xx: jnp.asarray(f_hat(xx, u0, d0)))(x0)
            x0n_raw = jnp.asarray(f_hat(x0, u0, d0))
            return kf_predict(x0n_raw, P, F, Q, fop_m_xop)

        self._jit_kernels = (correct, predict)
        return self._jit_kernels

    def _correct(self, y0m, d0):
        if np.any(np.isnan(y0m)):
            import warnings
            warnings.warn("NaN values in the Kalman filter measurements ym: "
                          "skipping correction step")
        correct, _ = self._kernels()
        x0c, Pc = correct(jnp.asarray(self.x0_hat), jnp.asarray(self.P_hat),
                          jnp.asarray(y0m), jnp.asarray(d0),
                          jnp.asarray(self.R_hat))
        self.x0_hat, self.P_hat = np.asarray(x0c), np.asarray(Pc)

    def _predict(self, u0, d0):
        _, predict = self._kernels()
        x0n, Pn = predict(jnp.asarray(self.x0_hat), jnp.asarray(self.P_hat),
                          jnp.asarray(u0), jnp.asarray(d0),
                          jnp.asarray(self.Q_hat),
                          jnp.asarray(self.fop_hat - self.xop_hat))
        self.x0_hat, self.P_hat = np.asarray(x0n), np.asarray(Pn)
