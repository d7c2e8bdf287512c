"""Construct-time LTI toolbox (NumPy/SciPy, host-side).

Replaces the ControlSystemsBase functionality the reference relies on for its
``LinModel`` constructors (``src/model/linmodel.jl:148-239``): transfer
functions, state-space models, dead time, zoh/tustin discretization,
resampling and minimal realization.  None of this runs on TPU — it is the
"compile" phase of the framework; the resulting discrete (A, Bu, C, Bd, Dd)
matrices are what the jitted runtime consumes.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import scipy.linalg as sla
import scipy.signal


# ---------------------------------------------------------------------------
# Transfer functions with dead time
# ---------------------------------------------------------------------------
@dataclass
class TransferFunction:
    """SISO rational transfer function ``num/den`` with optional dead time.

    ``Ts is None`` → continuous time; ``Ts > 0`` → discrete time.  ``iodelay``
    is the dead time in seconds (continuous) and must be an integer multiple of
    the sample time when discretized (mirrors the reference's DelayLtiSystem
    path, ``src/model/linmodel.jl:236-239``).
    """

    num: np.ndarray
    den: np.ndarray
    Ts: float | None = None
    iodelay: float = 0.0

    def __post_init__(self):
        self.num = np.atleast_1d(np.asarray(self.num, dtype=float))
        self.den = np.atleast_1d(np.asarray(self.den, dtype=float))
        # normalize leading denominator coefficient
        nz = np.flatnonzero(self.den)
        if nz.size == 0:
            raise ValueError("zero denominator")
        self.den = self.den[nz[0]:]
        self.num = np.trim_zeros(self.num, "f")
        if self.num.size == 0:
            self.num = np.zeros(1)
        lead = self.den[0]
        self.num = self.num / lead
        self.den = self.den / lead

    def __mul__(self, other):
        if isinstance(other, TransferFunction):
            if (self.Ts or None) != (other.Ts or None):
                raise ValueError("sample time mismatch")
            return TransferFunction(
                np.polymul(self.num, other.num),
                np.polymul(self.den, other.den),
                self.Ts,
                self.iodelay + other.iodelay,
            )
        return TransferFunction(self.num * float(other), self.den, self.Ts, self.iodelay)

    __rmul__ = __mul__


def tf(num, den, Ts: float | None = None) -> TransferFunction:
    """Create a transfer function (reference API: ``tf(num, den)``)."""
    return TransferFunction(np.asarray(num, float), np.asarray(den, float), Ts)


def delay(tau: float) -> TransferFunction:
    """Pure dead time ``exp(-tau*s)`` (reference API: ``delay(tau)``)."""
    return TransferFunction(np.ones(1), np.ones(1), None, float(tau))


def tf_matrix(entries) -> np.ndarray:
    """2-D object array of TransferFunction entries (ny × nu)."""
    arr = np.array(entries, dtype=object)
    if arr.ndim == 1:
        arr = arr[:, None]
    return arr


# ---------------------------------------------------------------------------
# State space
# ---------------------------------------------------------------------------
@dataclass
class StateSpace:
    """MIMO state-space model; ``Ts is None`` → continuous.

    ``n_delay_states`` tracks how many states come from discretized dead time
    (shift registers).  After ``minreal`` rotates the basis, those exactly-zero
    poles become numerically ill-conditioned (ε^(1/n) inflation), so the count
    must be carried structurally for the default-Hp heuristic
    (reference ``estimate_delays``, controller/construct.jl:576-591).
    """

    A: np.ndarray
    B: np.ndarray
    C: np.ndarray
    D: np.ndarray
    Ts: float | None = None
    n_delay_states: int = 0

    def __post_init__(self):
        self.A = np.atleast_2d(np.asarray(self.A, float))
        self.B = np.atleast_2d(np.asarray(self.B, float))
        self.C = np.atleast_2d(np.asarray(self.C, float))
        self.D = np.atleast_2d(np.asarray(self.D, float))

    @property
    def nx(self):
        return self.A.shape[0]

    @property
    def nu(self):
        return self.B.shape[1]

    @property
    def ny(self):
        return self.C.shape[0]

    def __getitem__(self, key):
        """Column (input-channel) selection: ``sys[:, idx]``."""
        rows, cols = key
        cols = np.atleast_1d(np.asarray(cols, int)) if not isinstance(cols, slice) else np.arange(self.nu)[cols]
        if isinstance(rows, slice):
            rows = np.arange(self.ny)[rows]
        else:
            rows = np.atleast_1d(np.asarray(rows, int))
        return StateSpace(self.A, self.B[:, cols], self.C[rows, :], self.D[np.ix_(rows, cols)], self.Ts)


def ss(A, B=None, C=None, D=None, Ts: float | None = None) -> StateSpace:
    if B is None and isinstance(A, (TransferFunction, np.ndarray)):
        return tf2ss(A)
    return StateSpace(A, B, C, D, Ts)


def _siso_tf2ss(num, den):
    """Controller-canonical realization of a SISO rational function."""
    n = len(den) - 1
    if n == 0:
        return (np.zeros((0, 0)), np.zeros((0, 1)), np.zeros((1, 0)),
                np.atleast_2d(num[-1] / den[-1]) if len(num) else np.zeros((1, 1)))
    A, B, C, D = scipy.signal.tf2ss(num, den)
    return A, B, C, D


def tf2ss(G, Ts: float | None = None) -> StateSpace:
    """Convert a (matrix of) TransferFunction(s) to a StateSpace.

    Each SISO entry is realized separately then block-stacked; a ``minreal``
    pass afterwards merges common poles — mirroring the reference's
    ``ss(sys)`` + ``minreal`` pipeline (``src/model/linmodel.jl:223-226``).
    Dead times must be discretized first (see :func:`c2d`).
    """
    if isinstance(G, TransferFunction):
        G = tf_matrix([[G]])
    ny, nu = G.shape
    Ts = Ts if Ts is not None else G[0, 0].Ts
    blocks = []
    for i in range(ny):
        for j in range(nu):
            g = G[i, j]
            if g.iodelay != 0:
                raise ValueError("discretize dead times with c2d before tf2ss")
            A, B, C, D = _siso_tf2ss(g.num, g.den)
            blocks.append((i, j, A, B, C, D))
    nx = sum(b[2].shape[0] for b in blocks)
    A = np.zeros((nx, nx))
    B = np.zeros((nx, nu))
    C = np.zeros((ny, nx))
    D = np.zeros((ny, nu))
    k = 0
    for (i, j, Ab, Bb, Cb, Db) in blocks:
        n = Ab.shape[0]
        A[k:k + n, k:k + n] = Ab
        B[k:k + n, j:j + 1] = Bb
        C[i:i + 1, k:k + n] = Cb
        D[i, j] += Db[0, 0]
        k += n
    return StateSpace(A, B, C, D, Ts)


# ---------------------------------------------------------------------------
# Discretization
# ---------------------------------------------------------------------------
def c2d_zoh(sys: StateSpace, Ts: float) -> StateSpace:
    """Zero-order-hold discretization via the augmented matrix exponential."""
    nx, nu = sys.nx, sys.nu
    if nx == 0:
        return StateSpace(sys.A, sys.B, sys.C, sys.D, Ts)
    M = np.zeros((nx + nu, nx + nu))
    M[:nx, :nx] = sys.A * Ts
    M[:nx, nx:] = sys.B * Ts
    E = sla.expm(M)
    return StateSpace(E[:nx, :nx], E[:nx, nx:], sys.C, sys.D, Ts)


def c2d_tustin(sys: StateSpace, Ts: float) -> StateSpace:
    """Bilinear (Tustin) discretization."""
    nx = sys.nx
    if nx == 0:
        return StateSpace(sys.A, sys.B, sys.C, sys.D, Ts)
    I = np.eye(nx)
    M = I - (Ts / 2.0) * sys.A
    Minv = sla.inv(M)
    Ad = Minv @ (I + (Ts / 2.0) * sys.A)
    Bd = Minv @ sys.B * Ts
    Cd = sys.C @ Minv
    Dd = sys.D + (Ts / 2.0) * sys.C @ Minv @ sys.B
    return StateSpace(Ad, Bd, Cd, Dd, Ts)


def d2c_zoh(sys: StateSpace) -> StateSpace:
    """Inverse of zoh discretization (matrix logarithm)."""
    nx, nu = sys.nx, sys.nu
    M = np.zeros((nx + nu, nx + nu))
    M[:nx, :nx] = sys.A
    M[:nx, nx:] = sys.B
    M[nx:, nx:] = np.eye(nu)
    L = sla.logm(M) / sys.Ts
    return StateSpace(L[:nx, :nx].real, L[:nx, nx:].real, sys.C, sys.D, None)


def d2c_tustin(sys: StateSpace) -> StateSpace:
    nx = sys.nx
    I = np.eye(nx)
    Ts = sys.Ts
    M = sla.inv(I + sys.A)
    Ac = (2.0 / Ts) * M @ (sys.A - I)
    # Bd = inv(I - Ts/2 Ac) Bc Ts  →  Bc = (I - Ts/2 Ac) Bd / Ts
    Bc = (I - (Ts / 2.0) * Ac) @ sys.B / Ts
    Cc = sys.C @ (I - (Ts / 2.0) * Ac)
    # forward map: Dd = Dc + Ts/2·Cc·(I−Ts/2·Ac)⁻¹·Bc and Cd = Cc·(I−Ts/2·Ac)⁻¹,
    # so the correction term is exactly Ts/2·Cd·Bc (NOT Ts/2·Cc·Bc)
    Dc = sys.D - (Ts / 2.0) * sys.C @ Bc
    return StateSpace(Ac, Bc, Cc, Dc, None)


def c2d_tf_zoh(g: TransferFunction, Ts: float) -> StateSpace:
    """Discretize one SISO entry with zoh, absorbing dead time as delay states.

    The dead time must be an integer multiple of ``Ts`` (same restriction as
    the reference's DelayLtiSystem path).  Delay states are appended on the
    *input* side: ``x_delay`` is a shift register of past inputs.
    """
    k = g.iodelay / Ts
    k_int = int(round(k))
    if abs(k - k_int) > 1e-8:
        raise ValueError(f"dead time {g.iodelay} is not a multiple of Ts={Ts}")
    A, B, C, D = _siso_tf2ss(g.num, g.den)
    dsys = c2d_zoh(StateSpace(A, B, C, D, None), Ts)
    if k_int == 0:
        return dsys
    if not np.allclose(D, 0):
        raise ValueError("dead time with direct feedthrough is not supported")
    # augment with k_int input-delay states: z1(k+1)=u, z2(k+1)=z1, ...
    nx = dsys.nx
    n = nx + k_int
    Ad = np.zeros((n, n))
    Bd = np.zeros((n, 1))
    Cd = np.zeros((1, n))
    Ad[:nx, :nx] = dsys.A
    Ad[:nx, nx + k_int - 1:nx + k_int] = dsys.B  # plant is fed the oldest sample
    Bd[nx, 0] = 1.0
    for i in range(1, k_int):
        Ad[nx + i, nx + i - 1] = 1.0
    Cd[0, :nx] = dsys.C
    return StateSpace(Ad, Bd, Cd, np.zeros((1, 1)), Ts, n_delay_states=k_int)


def c2d(sys, Ts: float, method: str = "zoh"):
    """Discretize a StateSpace or TransferFunction(-matrix)."""
    if isinstance(sys, StateSpace):
        if sys.Ts is not None:
            raise ValueError("system is already discrete; use resample")
        return c2d_zoh(sys, Ts) if method == "zoh" else c2d_tustin(sys, Ts)
    if isinstance(sys, TransferFunction):
        sys = tf_matrix([[sys]])
    # matrix of transfer functions, possibly with dead time → per-entry zoh
    if method != "zoh":
        if any(g.iodelay for g in sys.ravel()):
            raise ValueError("only zoh supports dead time")
        return c2d(tf2ss(sys), Ts, method)
    ny, nu = sys.shape
    blocks = [[c2d_tf_zoh(sys[i, j], Ts) for j in range(nu)] for i in range(ny)]
    n_delay = sum(b.n_delay_states for row in blocks for b in row)
    nx = sum(b.nx for row in blocks for b in row)
    A = np.zeros((nx, nx))
    B = np.zeros((nx, nu))
    C = np.zeros((ny, nx))
    D = np.zeros((ny, nu))
    k = 0
    for i in range(ny):
        for j in range(nu):
            b = blocks[i][j]
            n = b.nx
            A[k:k + n, k:k + n] = b.A
            B[k:k + n, j:j + 1] = b.B
            C[i:i + 1, k:k + n] = b.C
            D[i, j] += b.D[0, 0]
            k += n
    return StateSpace(A, B, C, D, Ts, n_delay_states=n_delay)


# ---------------------------------------------------------------------------
# Minimal realization (staircase / Kalman decomposition)
# ---------------------------------------------------------------------------
def _staircase_ctrb(A, B, tol):
    """Orthogonal controllability staircase; returns (T, nc) with the
    controllable subspace spanned by the first nc columns of T."""
    n = A.shape[0]
    if n == 0:
        return np.eye(0), 0
    T = np.eye(n)
    Ak, Bk = A.copy(), B.copy()
    nc = 0
    m = n
    while m > 0 and Bk.shape[1] > 0:
        U, s, _ = sla.svd(Bk, full_matrices=True)
        scale = max(1.0, sla.norm(A), sla.norm(B))
        r = int(np.sum(s > tol * scale))
        if r == 0:
            break
        T[:, nc:] = T[:, nc:] @ U
        Ak = U.T @ Ak @ U
        nc += r
        if nc >= n:
            nc = n
            break
        Bk = Ak[r:, :r]
        Ak = Ak[r:, r:]
        m -= r
    return T, nc


def minreal(sys: StateSpace, tol: float = 1e-9) -> StateSpace:
    """Remove uncontrollable then unobservable states (orthogonal staircase).

    Plays the role of ``ControlSystemsBase.minreal`` in the reference's
    constructor (``src/model/linmodel.jl:190-191``): merges common poles and
    guarantees controllability/observability of the final realization.
    """
    # 1. controllable part
    T, nc = _staircase_ctrb(sys.A, sys.B, tol)
    A = (T.T @ sys.A @ T)[:nc, :nc]
    B = (T.T @ sys.B)[:nc, :]
    C = (sys.C @ T)[:, :nc]
    # 2. observable part (duality)
    T2, no = _staircase_ctrb(A.T, C.T, tol)
    A2 = (T2.T @ A @ T2)[:no, :no]
    B2 = (T2.T @ B)[:no, :]
    C2 = (C @ T2)[:, :no]
    return StateSpace(A2, B2, C2, sys.D, sys.Ts,
                      n_delay_states=min(sys.n_delay_states, no))


def sminreal(sys: StateSpace) -> StateSpace:
    """Structural minreal: drop states with no structural I/O connection.

    Mirrors ``sminreal`` used to split u- and d-channels in the reference
    (``src/model/linmodel.jl:165-166``), which guarantees that states feeding
    only the dropped channels are removed without altering the others.
    """
    nx = sys.nx
    if nx == 0:
        return sys
    Abool = sys.A != 0
    # reachable from inputs (structurally)
    reach = np.any(sys.B != 0, axis=1)
    for _ in range(nx):
        new = reach | (Abool @ reach)
        if np.array_equal(new, reach):
            break
        reach = new
    # observable to outputs (structurally)
    obs = np.any(sys.C != 0, axis=0)
    for _ in range(nx):
        new = obs | (Abool.T @ obs)
        if np.array_equal(new, obs):
            break
        obs = new
    keep = reach & obs
    idx = np.flatnonzero(keep)
    return StateSpace(sys.A[np.ix_(idx, idx)], sys.B[idx, :], sys.C[:, idx], sys.D, sys.Ts)


# ---------------------------------------------------------------------------
# Observability / controllability
# ---------------------------------------------------------------------------
def obsv_matrix(A, C):
    n = A.shape[0]
    blocks = []
    Ck = np.atleast_2d(C).copy()
    for _ in range(n):
        blocks.append(Ck)
        Ck = Ck @ A
    return np.vstack(blocks) if blocks else np.zeros((0, n))


def is_observable(A, C, tol: float | None = None) -> bool:
    n = A.shape[0]
    if n == 0:
        return True
    O = obsv_matrix(A, C)
    return np.linalg.matrix_rank(O, tol=tol) == n


def is_controllable(A, B, tol: float | None = None) -> bool:
    return is_observable(A.T, B.T, tol)
