"""Construct-time linear-algebra helpers (host-side NumPy/SciPy).

Replaces the binary dependencies of the reference: ControlSystemsBase's DARE
(``src/estimator/kalman.jl:204-227``) and pole placement
(``src/estimator/luenberger.jl:38-42``).  All of this runs once at object
construction; the jitted runtime only consumes the resulting gain matrices.
"""
from __future__ import annotations

import numpy as np
import scipy.linalg as sla
import scipy.signal


def dare(A, C, Q, R):
    """Solve the filter DARE for the a-priori error covariance P⁻.

    ``P = A P Aᵀ − A P Cᵀ (C P Cᵀ + R)⁻¹ C P Aᵀ + Q``
    """
    # scipy solves the control DARE: X = AᵀXA − AᵀXB(R+BᵀXB)⁻¹BᵀXA + Q;
    # the filter DARE is its dual with A→Aᵀ, B→Cᵀ.
    return sla.solve_discrete_are(A.T, C.T, Q, R)


def steady_kalman_gain(A, C, Q, R, direct=True):
    """Asymptotic Kalman gain K̂ and covariance P̂.

    Filter gain ``K̂ = P⁻Cᵀ(CP⁻Cᵀ+R)⁻¹`` (the steady-state limit of the
    time-varying filter's correction, ``src/estimator/kalman.jl:502-505``) so
    that the SKF matches the KalmanFilter asymptotically for both ``direct``
    settings.  Returns the corrected covariance for ``direct=True`` and the
    a-priori covariance otherwise.
    """
    P_pred = dare(A, C, Q, R)
    S = C @ P_pred @ C.T + R
    K = np.linalg.solve(S.T, (P_pred @ C.T).T).T
    P = (np.eye(A.shape[0]) - K @ C) @ P_pred if direct else P_pred
    return K, 0.5 * (P + P.T)


def place_poles(A, B, poles):
    """Pole placement gain K with eig(A − B K) = poles (Luenberger dual)."""
    res = scipy.signal.place_poles(np.asarray(A, float), np.asarray(B, float),
                                   np.sort_complex(np.asarray(poles)))
    return res.gain_matrix


def repeatdiag(M, n):
    """Block-diagonal matrix with ``n`` copies of ``M`` (general.jl repeatdiag)."""
    M = np.atleast_2d(M)
    if n == 0:
        return np.zeros((0, 0))
    return sla.block_diag(*([M] * n))


def to_hermitian(M):
    return 0.5 * (M + M.T)
