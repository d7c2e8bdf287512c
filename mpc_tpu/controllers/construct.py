"""Shared controller construction: weights, slack relaxation, Hessian.

Reference: ``src/controller/construct.jl`` (ControllerWeights :45-102,
relaxU/relaxΔU/relaxŶ/relaxterminal :976-1199, init_quadprog :811-845).
"""
from __future__ import annotations

import numpy as np


class ControllerWeights:
    """M_Hp, Ñ_Hc, L_Hp, Cwt (slack), Ewt (economic)."""

    def __init__(self, nu, ny, Hp, Hc, Mwt=None, Nwt=None, Lwt=None,
                 M_Hp=None, N_Hc=None, L_Hp=None, Cwt=1e5, Ewt=0.0):
        Cwt = np.inf if Cwt is None else Cwt   # None == hard constraints
        if np.ndim(Cwt) != 0 or np.ndim(Ewt) != 0:
            # scalars only (construct.jl:80, nonlinmpc.jl:823)
            raise ValueError("Cwt and Ewt must be scalar weights")
        Mwt = np.full(ny, 1.0) if Mwt is None else np.asarray(Mwt, float).ravel()
        Nwt = np.full(nu, 0.1) if Nwt is None else np.asarray(Nwt, float).ravel()
        Lwt = np.full(nu, 0.0) if Lwt is None else np.asarray(Lwt, float).ravel()
        if M_Hp is None:
            if Mwt.shape != (ny,):
                raise ValueError(f"Mwt size must be ({ny},)")
            if np.any(Mwt < 0):
                raise ValueError("Mwt values should be nonnegative")
            M_Hp = np.diag(np.tile(Mwt, Hp))
        if N_Hc is None:
            if Nwt.shape != (nu,):
                raise ValueError(f"Nwt size must be ({nu},)")
            if np.any(Nwt < 0):
                raise ValueError("Nwt values should be nonnegative")
            N_Hc = np.diag(np.tile(Nwt, Hc))
        if L_Hp is None:
            if Lwt.shape != (nu,):
                raise ValueError(f"Lwt size must be ({nu},)")
            if np.any(Lwt < 0):
                raise ValueError("Lwt values should be nonnegative")
            L_Hp = np.diag(np.tile(Lwt, Hp))
        M_Hp = np.asarray(M_Hp, float)
        N_Hc = np.asarray(N_Hc, float)
        L_Hp = np.asarray(L_Hp, float)
        if M_Hp.shape != (ny * Hp, ny * Hp):
            raise ValueError(f"M_Hp size must be {(ny * Hp, ny * Hp)}")
        if N_Hc.shape != (nu * Hc, nu * Hc):
            raise ValueError(f"N_Hc size must be {(nu * Hc, nu * Hc)}")
        if L_Hp.shape != (nu * Hp, nu * Hp):
            raise ValueError(f"L_Hp size must be {(nu * Hp, nu * Hp)}")
        if Cwt < 0:
            raise ValueError("Cwt weight should be ≥ 0")
        self.M_Hp, self.N_Hc, self.L_Hp = M_Hp, N_Hc, L_Hp
        self.Cwt, self.Ewt = float(Cwt), float(Ewt)
        self.isinf_C = np.isinf(Cwt)
        self.n_eps = 0 if self.isinf_C else 1
        # ΔŨ = [ΔU; ϵ] slack augmentation (construct.jl:69-79)
        if self.n_eps:
            nDU = N_Hc.shape[0]
            self.Nt_Hc = np.block([[N_Hc, np.zeros((nDU, 1))],
                                   [np.zeros((1, nDU)), np.array([[Cwt]])]])
        else:
            self.Nt_Hc = N_Hc
        self.iszero_M_Hp = not np.any(M_Hp)
        self.iszero_N_Hc = not np.any(self.Nt_Hc)
        self.iszero_L_Hp = not np.any(L_Hp)
        self.iszero_E = Ewt == 0.0


def relax_U(Pu, C_umin, C_umax, n_eps):
    """(construct.jl:976-1010): A_Umin, A_Umax, P̃u."""
    if n_eps == 1:
        A_Umin = -np.hstack([Pu, C_umin[:, None]])
        A_Umax = np.hstack([Pu, -C_umax[:, None]])
        Pu_t = np.hstack([Pu, np.zeros((Pu.shape[0], 1))])
    else:
        A_Umin, A_Umax, Pu_t = -Pu, Pu, Pu
    return A_Umin, A_Umax, Pu_t


def relax_DU(PDu, C_dumin, C_dumax, n_eps):
    """(construct.jl:1012-1044): A_ΔUmin, A_ΔUmax, P̃Δu (maps Z̃→ΔŨ=[ΔU;ϵ])."""
    if n_eps == 1:
        A_DUmin = -np.hstack([PDu, C_dumin[:, None]])
        A_DUmax = np.hstack([PDu, -C_dumax[:, None]])
        nDU, nZ = PDu.shape
        PDu_t = np.block([[PDu, np.zeros((nDU, 1))],
                          [np.zeros((1, nZ)), np.ones((1, 1))]])
    else:
        A_DUmin, A_DUmax, PDu_t = -PDu, PDu, PDu
    return A_DUmin, A_DUmax, PDu_t


def relax_Y(E, C_ymin, C_ymax, n_eps):
    """(construct.jl:1046-1083): A_Ymin, A_Ymax, Ẽ."""
    if n_eps == 1:
        if E.shape[0] == 0:
            C_ymin = C_ymax = np.zeros(0)
        A_Ymin = -np.hstack([E, C_ymin[:, None]]) if E.shape[0] else np.zeros((0, E.shape[1] + 1))
        A_Ymax = np.hstack([E, -C_ymax[:, None]]) if E.shape[0] else np.zeros((0, E.shape[1] + 1))
        E_t = np.hstack([E, np.zeros((E.shape[0], 1))])
    else:
        A_Ymin, A_Ymax, E_t = -E, E, E
    return A_Ymin, A_Ymax, E_t


def relax_terminal(ex, c_xmin, c_xmax, n_eps):
    """(construct.jl:1162-1199): A_x̂min, A_x̂max, ẽx̂."""
    if n_eps == 1:
        if ex.shape[0] == 0:
            c_xmin = c_xmax = np.zeros(0)
        A_xmin = -np.hstack([ex, c_xmin[:, None]]) if ex.shape[0] else np.zeros((0, ex.shape[1] + 1))
        A_xmax = np.hstack([ex, -c_xmax[:, None]]) if ex.shape[0] else np.zeros((0, ex.shape[1] + 1))
        ex_t = np.hstack([ex, np.zeros((ex.shape[0], 1))])
    else:
        A_xmin, A_xmax, ex_t = -ex, ex, ex
    return A_xmin, A_xmax, ex_t


def init_quadprog(E_t, PDu_t, Pu_t, weights: ControllerWeights,
                  warn_cond=1e6, single_shooting=True):
    """H̃ = 2(ẼᵀM_HpẼ + P̃ΔuᵀÑ_HcP̃Δu + P̃uᵀL_HpP̃u) (construct.jl:811-845).

    Warns when ``cond(H̃) > warn_cond`` for SingleShooting (``verify_cond``,
    construct.jl:854-868) — an ill-conditioned condensed Hessian hurts the
    f32 ADMM path on TPU even more than it hurts OSQP.
    """
    H = 2.0 * (E_t.T @ weights.M_Hp @ E_t
               + PDu_t.T @ weights.Nt_Hc @ PDu_t
               + Pu_t.T @ weights.L_Hp @ Pu_t)
    H = 0.5 * (H + H.T)
    if single_shooting and np.isfinite(warn_cond) and H.size:
        cond_H = np.linalg.cond(H)
        if cond_H > warn_cond:
            import warnings
            warnings.warn(
                f"The Hessian condition number {cond_H:.3g} > {warn_cond:.3g}."
                " The optimization problem may be ill-conditioned; consider"
                " changing the tunings or using MultipleShooting.")
    return H
