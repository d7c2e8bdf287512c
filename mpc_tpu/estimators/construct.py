"""Estimator construction helpers (reference: src/estimator/construct.jl).

Pure NumPy matrix builders for the stochastic ("integrator") disturbance
model, the augmented model, and the default integrator selection — all
construct-time.
"""
from __future__ import annotations

import numpy as np
import scipy.linalg as sla

from ..models import LinModel, SimModel
from ..utils.lti import is_observable


def init_integrators(nint, ny, varname):
    """A, C matrices from integrator counts (construct.jl:211-251)."""
    if np.isscalar(nint):
        if nint == 0:
            nint = [0] * ny
        else:
            raise ValueError(f"nint_{varname} must be 0 or a vector of length {ny}")
    nint = list(nint)
    if len(nint) != ny:
        raise ValueError(f"nint_{varname} length ({len(nint)}) ≠ n{varname} ({ny})")
    if any(n < 0 for n in nint):
        raise ValueError(f"nint_{varname} values should be ≥ 0")
    nx = sum(nint)
    A = np.zeros((nx, nx))
    C = np.zeros((ny, nx))
    i = 0
    for iy, n in enumerate(nint):
        if n:
            # chain of integrators: lower bidiagonal of ones
            A[i:i + n, i:i + n] = np.eye(n) + np.diag(np.ones(n - 1), -1) if n > 1 else np.ones((1, 1))
            C[iy, i + n - 1] = 1.0
            i += n
    return A, C, nint


def init_estimstoch(model: SimModel, i_ym, nint_u, nint_ym):
    """Stochastic model (As, Cs_u, Cs_y) from integrator specs
    (construct.jl:153-185)."""
    nu, ny = model.nu, model.ny
    nym = len(i_ym)
    As_u, Cs_u, nint_u = init_integrators(nint_u, nu, "u")
    As_ym, Cs_ym, nint_ym = init_integrators(nint_ym, nym, "ym")
    # measured-output stochastic model → all outputs (stoch_ym2y)
    As_y = As_ym
    Cs_y = np.zeros((ny, Cs_ym.shape[1]))
    Cs_y[np.asarray(i_ym, int), :] = Cs_ym
    nxs_u, nxs_y = As_u.shape[0], As_y.shape[0]
    As = sla.block_diag(As_u, As_y)
    Cs_u = np.hstack([Cs_u, np.zeros((nu, nxs_y))])
    Cs_y = np.hstack([np.zeros((ny, nxs_u)), Cs_y])
    return As, Cs_u, Cs_y, nint_u, nint_ym


def validate_ym(model: SimModel, i_ym):
    i_ym = list(i_ym)
    if len(set(i_ym)) != len(i_ym) or (i_ym and max(i_ym) >= model.ny) or (i_ym and min(i_ym) < 0):
        raise ValueError("Measured output indices i_ym should contain valid and unique indices")
    return len(i_ym), model.ny - len(i_ym)


def augment_model(model: SimModel, As, Cs_u, Cs_y, verify_obsv=True):
    """Augmented state-space (Â, B̂u, Ĉ, B̂d, D̂d, x̂op, f̂op)
    (construct.jl:254-341)."""
    nxs = As.shape[0]
    if isinstance(model, LinModel):
        nu, nx, nd = model.nu, model.nx, model.nd
        A_hat = np.block([[model.A, model.Bu @ Cs_u],
                          [np.zeros((nxs, nx)), As]])
        Bu_hat = np.vstack([model.Bu, np.zeros((nxs, nu))])
        C_hat = np.hstack([model.C, Cs_y])
        Bd_hat = np.vstack([model.Bd, np.zeros((nxs, nd))])
        Dd_hat = model.Dd
        if verify_obsv and not is_observable(A_hat, C_hat):
            raise ValueError(
                "The augmented model is unobservable. You may try to use 0 integrator on "
                "model integrating outputs with nint_ym parameter. Adding integrators at "
                "both inputs (nint_u) and outputs (nint_ym) can also violate observability.")
        xop_hat = np.concatenate([model.xop, np.zeros(nxs)])
        fop_hat = np.concatenate([model.fop, np.zeros(nxs)])
        return A_hat, Bu_hat, C_hat, Bd_hat, Dd_hat, xop_hat, fop_hat
    # NonLinModel: matrices are not materialized; only the op-points matter
    nx = model.nx
    xop_hat = np.concatenate([model.xop, np.zeros(nxs)])
    fop_hat = np.concatenate([model.fop, np.zeros(nxs)])
    return None, None, None, None, None, xop_hat, fop_hat


def default_nint(model: SimModel, i_ym=None, nint_u=0):
    """Default integrator count per measured output (construct.jl:343-394)."""
    i_ym = list(range(model.ny)) if i_ym is None else list(i_ym)
    validate_ym(model, i_ym)
    if not isinstance(model, LinModel):
        nz = nint_u == 0 if np.isscalar(nint_u) else all(n == 0 for n in nint_u)
        return [1] * len(i_ym) if nz else [0] * len(i_ym)
    nint_ym = [0] * len(i_ym)
    for i in range(len(i_ym)):
        nint_ym[i] = 1
        As, Cs_u, Cs_y, _, _ = init_estimstoch(model, i_ym, nint_u, nint_ym)
        A_hat, _, C_hat, _, _, _, _ = augment_model(model, As, Cs_u, Cs_y, verify_obsv=False)
        if not is_observable(A_hat, C_hat):
            nint_ym[i] = 0
    return nint_ym


def validate_covariances(nx_hat, nym, Q_hat, R_hat, P0_hat=None):
    Q_hat = np.atleast_2d(np.asarray(Q_hat, float))
    R_hat = np.atleast_2d(np.asarray(R_hat, float))
    if Q_hat.shape != (nx_hat, nx_hat):
        raise ValueError(f"Q̂ size {Q_hat.shape} ≠ (nx̂, nx̂) {(nx_hat, nx_hat)}")
    if R_hat.shape != (nym, nym):
        raise ValueError(f"R̂ size {R_hat.shape} ≠ (nym, nym) {(nym, nym)}")
    if not np.allclose(Q_hat, Q_hat.T):
        raise ValueError("Q̂ is not Hermitian")
    if not np.allclose(R_hat, R_hat.T):
        raise ValueError("R̂ is not Hermitian")
    for M, name in ((Q_hat, "Q̂"), (R_hat, "R̂")):
        if np.any(np.linalg.eigvalsh(M) <= 0):
            raise ValueError(f"{name} is not positive definite")
    if P0_hat is not None:
        P0_hat = np.atleast_2d(np.asarray(P0_hat, float))
        if P0_hat.shape != (nx_hat, nx_hat):
            raise ValueError(f"P̂_0 size {P0_hat.shape} ≠ (nx̂, nx̂) {(nx_hat, nx_hat)}")
        if np.any(np.linalg.eigvalsh(P0_hat) <= 0):
            raise ValueError("P̂_0 is not positive definite")
        return Q_hat, R_hat, P0_hat
    return Q_hat, R_hat
