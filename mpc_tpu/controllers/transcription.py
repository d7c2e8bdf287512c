"""Transcription methods and prediction/defect matrix builders.

Reference: ``src/transcription.jl`` (type tags) and
``src/controller/transcription.jl:12-482`` (the mathematical core: condensed
prediction matrices from powers of Â for SingleShooting, sparse selector form
for MultipleShooting, and the defect matrices for the equality constraints).
All construct-time NumPy.
"""
from __future__ import annotations

import numpy as np

from ..utils.linalg import repeatdiag


class TranscriptionMethod:
    pass


class SingleShooting(TranscriptionMethod):
    """Z = ΔU (transcription.jl:54)."""

    def nZ(self, nu, nx_hat, Hp, Hc):
        return nu * Hc


class MultipleShooting(TranscriptionMethod):
    """Z = [ΔU; X̂0] (transcription.jl:113-119)."""

    def nZ(self, nu, nx_hat, Hp, Hc):
        return nu * Hc + nx_hat * Hp


class CollocationMethod(TranscriptionMethod):
    pass


class TrapezoidalCollocation(CollocationMethod):
    """Implicit trapezoidal rule with h-th order hold on u
    (transcription.jl:121-168).  Decision variables are the same as
    MultipleShooting; the deterministic-state defects use the continuous-time
    dynamics: ŝ(k+j+1) = x̂d(k+j) + Ts/2·(k̇1 + k̇2) − x̂d(k+j+1)
    (controller/transcription.jl:1373-1437).  Stochastic states keep the
    discrete MultipleShooting defects."""

    def __init__(self, h: int = 0):
        if h not in (0, 1):
            raise ValueError("h argument must be 0 or 1 for TrapezoidalCollocation.")
        self.h = h
        self.no = 2

    def nZ(self, nu, nx_hat, Hp, Hc):
        return nu * Hc + nx_hat * Hp


class OrthogonalCollocation(CollocationMethod):
    """Orthogonal collocation on finite elements (transcription.jl:171-254):
    Z = [ΔU; X̂0; K] with nₒ collocation-point states per interval at
    Gauss-Radau or Gauss-Legendre roots; collocation defects
    Mo(kᵢ−x̂d) − k̇ᵢ = 0 plus linear continuity Co·k + λo·x̂d − x̂d⁺ = 0
    (controller/transcription.jl:1440-1541)."""

    def __init__(self, h: int = 0, no: int = 3, roots: str = "gaussradau"):
        if h not in (0, 1):
            raise ValueError("h argument must be 0 or 1 for OrthogonalCollocation.")
        self.h = h
        self.no = int(no)
        if roots == "gaussradau":
            # Gauss-Radau nodes on [-1,1] (left endpoint fixed), mirrored so
            # that τ includes the 1.0 node (transcription.jl:240-243)
            x = _gaussradau_nodes(no)
            tau = ((-x)[::-1] + 1) / 2
        elif roots == "gausslegendre":
            x, _ = np.polynomial.legendre.leggauss(no)
            tau = (x + 1) / 2
        else:
            raise ValueError("roots argument must be 'gaussradau' or 'gausslegendre'.")
        self.tau = np.asarray(tau, float)

    def nZ(self, nu, nx_hat, Hp, Hc):
        # nx (deterministic) collocation states set by the caller via init
        raise RuntimeError("OrthogonalCollocation.nZ needs nx; use nZ_colloc")

    def nZ_colloc(self, nu, nx_hat, nx, Hp, Hc):
        return nu * Hc + nx_hat * Hp + nx * self.no * Hp


def _gaussradau_nodes(n):
    """Gauss-Radau nodes on [-1, 1] with fixed endpoint x = -1."""
    if n == 1:
        return np.array([-1.0])
    # nodes: -1 plus roots of P_{n-1} + P_n of Legendre (standard result)
    Pn1 = np.polynomial.legendre.Legendre.basis(n - 1)
    Pn = np.polynomial.legendre.Legendre.basis(n)
    poly = Pn1 + Pn
    r = poly.roots()
    r = np.sort(np.real(r[np.abs(np.imag(r)) < 1e-12]))
    return np.concatenate([[-1.0], r[np.abs(r + 1) > 1e-10]])[:n]


def init_orthocolloc(nx, Ts, transcription: OrthogonalCollocation):
    """Differentiation/continuity matrices Mo, Co, λo
    (transcription.jl:256-344)."""
    no = transcription.no
    tau = transcription.tau
    Po = np.zeros((no, no))
    Pdo = np.zeros((no, no))
    for i in range(no):
        for j in range(1, no + 1):
            Po[i, j - 1] = tau[i] ** j
            Pdo[i, j - 1] = j * tau[i] ** (j - 1)
    Mo_small = Pdo @ np.linalg.inv(Po) / Ts      # (no × no), scalar form
    Mo = np.kron(Mo_small, np.eye(nx))
    # Lagrange basis at τ=1 over nodes [0, τ1..τno]
    taus = np.concatenate([[0.0], tau])

    def lagrange_end(j):
        L = 1.0
        for i in range(len(taus)):
            if i == j:
                continue
            L *= (1.0 - taus[i]) / (taus[j] - taus[i])
        return L

    Co_small = np.array([lagrange_end(j) for j in range(1, no + 1)])
    Co = np.kron(Co_small[None, :], np.eye(nx))
    lam_o = lagrange_end(0)
    return Mo, Co, lam_o


def move_blocking(Hp, Hc):
    """Move-blocking vector nb (controller/construct.jl:596-660)."""
    if np.isscalar(Hc):
        Hc = int(Hc)
        if Hc < 1:
            raise ValueError("Control horizon Hc should be ≥ 1")
        nb = [1] * Hc
        nb[-1] = Hp - Hc + 1
        if nb[-1] < 1:
            raise ValueError("Control horizon Hc should be ≤ prediction horizon Hp")
        return nb
    nb = [int(n) for n in Hc]
    if any(n <= 0 for n in nb):
        raise ValueError("Move blocking vector must be strictly positive integers.")
    s = sum(nb)
    if s < Hp:
        nb = nb + [Hp - s]
    elif s > Hp:
        cs = np.cumsum(nb)
        keep = int(np.argmax(cs >= Hp)) + 1
        nb = nb[:keep]
        nb[-1] = Hp - sum(nb[:-1])
    return nb


def init_predmat(transcription, A_hat, Bu_hat, C_hat, Bd_hat, Dd_hat,
                 xop_hat, fop_hat, Hp, Hc, nb):
    """Output prediction + terminal-state matrices.

    SingleShooting (transcription.jl:115-194): Ŷ0 = E Z + G d0 + J D̂0
    + K x̂0 + V u0(k-1) + B, with move-blocking-aware E via the S(m)=ΣÂˡ
    cumulative powers.  MultipleShooting (:217-240): sparse selector form.
    """
    nx_hat = A_hat.shape[0]
    ny = C_hat.shape[0]
    nu = Bu_hat.shape[1]
    nd = Bd_hat.shape[1]
    nZ = transcription.nZ(nu, nx_hat, Hp, Hc)
    if isinstance(transcription, MultipleShooting):
        K = np.zeros((Hp * ny, nx_hat))
        kx = np.zeros((nx_hat, nx_hat))
        V = np.zeros((Hp * ny, nu))
        vx = np.zeros((nx_hat, nu))
        E = np.hstack([np.zeros((Hp * ny, Hc * nu)), repeatdiag(C_hat, Hp)])
        ex = np.hstack([np.zeros((nx_hat, Hc * nu + (Hp - 1) * nx_hat)),
                        np.eye(nx_hat)])
        G = np.zeros((Hp * ny, nd))
        gx = np.zeros((nx_hat, nd))
        J = repeatdiag(Dd_hat, Hp) if nd else np.zeros((Hp * ny, 0))
        jx = np.zeros((nx_hat, Hp * nd))
        B = np.zeros(Hp * ny)
        bx = np.zeros(nx_hat)
        return E, G, J, K, V, B, ex, gx, jx, kx, vx, bx

    # ---- SingleShooting condensed matrices ----
    # Âpow[j] = Â^j for j=0..Hp ; Âcum[m] = Σ_{ℓ=0}^m Â^ℓ
    Apow = np.empty((Hp + 1, nx_hat, nx_hat))
    Apow[0] = np.eye(nx_hat)
    for j in range(1, Hp + 1):
        Apow[j] = Apow[j - 1] @ A_hat
    Acum = np.cumsum(Apow, axis=0)

    jl = np.concatenate([[0], np.cumsum(nb)])  # jℓ of move_blocking docstring

    def S(m):
        return Acum[m]

    def Q_block(i, mstop, b):
        """rows ĈS(i-b+ℓ)B̂u for ℓ=0..mstop-i-1 (transcription.jl:134-140)."""
        rows = [C_hat @ S(i - b + el) @ Bu_hat for el in range(mstop - i)]
        return np.vstack(rows) if rows else np.zeros((0, nu))

    # K: ĈÂ^j, j=1..Hp
    K = np.vstack([C_hat @ Apow[j] for j in range(1, Hp + 1)])
    kx = Apow[Hp]
    # V = Q(0,Hp,0); vx̂ = S(Hp-1)B̂u
    V = Q_block(0, Hp, 0)
    vx = S(Hp - 1) @ Bu_hat
    # E and ex̂ with move blocking
    E = np.zeros((Hp * ny, nZ))
    ex = np.zeros((nx_hat, nZ))
    for j in range(Hc):
        cols = slice(nu * j, nu * (j + 1))
        for i in range(j, Hc):
            iQ, mQ, bQ = jl[i], jl[i + 1], jl[j]
            rows = slice(ny * iQ, ny * iQ + ny * nb[i])
            E[rows, cols] = Q_block(iQ, mQ, bQ)
        ex[:, cols] = S(Hp - jl[j] - 1) @ Bu_hat
    # G, J, jx̂, gx̂
    gx = Apow[Hp - 1] @ Bd_hat if nd else np.zeros((nx_hat, 0))
    J = repeatdiag(Dd_hat, Hp) if nd else np.zeros((Hp * ny, 0))
    G = np.zeros((Hp * ny, nd))
    jx = np.zeros((nx_hat, Hp * nd))
    if nd > 0:
        for j in range(Hp):
            G[ny * j:ny * (j + 1), :] = C_hat @ Apow[j] @ Bd_hat
        for j in range(1, Hp + 1):
            cols = slice(nd * (j - 1), nd * j)
            if j < Hp:
                rows = slice(ny * j, ny * Hp)
                J[rows, cols] = G[:ny * (Hp - j), :]
                jx[:, cols] = Apow[Hp - j - 1] @ Bd_hat
    # B, bx̂ from op points
    f_m_x = fop_hat - xop_hat
    B = np.concatenate([C_hat @ S(j) @ f_m_x for j in range(Hp)])
    bx = S(Hp - 1) @ f_m_x
    return E, G, J, K, V, B, ex, gx, jx, kx, vx, bx


def init_defectmat(transcription, A_hat, Bu_hat, Bd_hat, xop_hat, fop_hat,
                   Hp, Hc, nb):
    """Defect matrices Ŝ = ES Z + GS d0 + JS D̂0 + KS x̂0 + VS u0(k-1) + BS = 0
    for MultipleShooting (controller/transcription.jl:304-414); empty for
    SingleShooting."""
    nx_hat = A_hat.shape[0]
    nu = Bu_hat.shape[1]
    nd = Bd_hat.shape[1]
    nZ = transcription.nZ(nu, nx_hat, Hp, Hc)
    if isinstance(transcription, SingleShooting):
        z = np.zeros
        return (z((0, nZ)), z((0, nd)), z((0, Hp * nd)), z((0, nx_hat)),
                z((0, nu)), z(0))
    KS = np.vstack([A_hat, np.zeros(((Hp - 1) * nx_hat, nx_hat))])
    VS = np.tile(Bu_hat, (Hp, 1))
    ES = np.hstack([np.zeros((nx_hat * Hp, nu * Hc)),
                    repeatdiag(-np.eye(nx_hat), Hp)])
    for j in range(Hc):
        cols = slice(nu * j, nu * (j + 1))
        for i in range(j, Hc):
            ni = nb[i]
            r0 = nx_hat * sum(nb[:i])
            for el in range(ni):
                ES[r0 + nx_hat * el: r0 + nx_hat * (el + 1), cols] = Bu_hat
    for j in range(1, Hp):
        rows = slice(nx_hat * j, nx_hat * (j + 1))
        cols = slice(nu * Hc + nx_hat * (j - 1), nu * Hc + nx_hat * j)
        ES[rows, cols] = A_hat
    GS = np.vstack([Bd_hat, np.zeros(((Hp - 1) * nx_hat, nd))])
    JS = np.zeros((nx_hat * Hp, nd * Hp))
    if nd:
        JS[nx_hat:, :nd * (Hp - 1)] = repeatdiag(Bd_hat, Hp - 1)
    BS = np.tile(fop_hat - xop_hat, Hp)
    return ES, GS, JS, KS, VS, BS


def init_ZtoDU(transcription, nu, nx_hat, Hp, Hc):
    """PΔu: Z → ΔU (controller/construct.jl:712-741)."""
    nZ = transcription.nZ(nu, nx_hat, Hp, Hc)
    nDU = nu * Hc
    return np.hstack([np.eye(nDU), np.zeros((nDU, nZ - nDU))])


def init_ZtoU(transcription, nu, nx_hat, Hp, Hc, nb):
    """Pu, Tu: U = Pu Z + Tu u(k-1) (controller/construct.jl:743-809)."""
    nZ = transcription.nZ(nu, nx_hat, Hp, Hc)
    I_nu = np.eye(nu)
    Pu_d = np.zeros((nu * Hp, nu * Hc))
    for i in range(Hc):
        ni = nb[i]
        r0 = nu * sum(nb[:i])
        for el in range(ni):
            for j in range(i + 1):
                Pu_d[r0 + nu * el: r0 + nu * (el + 1), nu * j: nu * (j + 1)] = I_nu
    Pu = np.hstack([Pu_d, np.zeros((nu * Hp, nZ - nu * Hc))])
    Tu = np.tile(I_nu, (Hp, 1))
    return Pu, Tu
