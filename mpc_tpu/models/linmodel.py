"""Discrete LTI plant model (reference: src/model/linmodel.jl).

    x0(k+1) = A x0(k) + Bu u0(k) + Bd d0(k)   [+ fop - xop]
    y0(k)   = C x0(k) + Dd d0(k)

Constructors accept raw matrices, :class:`~mpc_tpu.utils.lti.StateSpace`, a
(matrix of) :class:`~mpc_tpu.utils.lti.TransferFunction` (with dead time), in
continuous or discrete time — reproducing ``LinModel(sys, Ts; i_u, i_d)``
(``linmodel.jl:148-239``): zoh discretization for manipulated inputs, tustin
for measured disturbances, resampling, minimal realization, and the
strictly-proper (Du = 0) check.
"""
from __future__ import annotations

import numpy as np

from ..utils import lti
from .base import SimModel


def _validate_split_indices(i_u, i_d, ns):
    """i_u/i_d must be unique, in range, with i_u nonempty (linmodel.jl:159-163)."""
    if len(set(i_u)) != len(i_u) or any(not 0 <= i < ns for i in i_u):
        raise ValueError("Manipulated input indices i_u should contain valid "
                         "and unique indices")
    if len(set(i_d)) != len(i_d) or any(not 0 <= i < ns for i in i_d):
        raise ValueError("Measured disturbances indices i_d should contain "
                         "valid and unique indices")


class LinModel(SimModel):
    def __init__(self, *args, Ts=None, i_u=None, i_d=None):
        # --- dispatch on argument forms ---
        if len(args) == 6:
            A, Bu, C, Bd, Dd, Ts_ = args
            self._init_from_matrices(A, Bu, C, Bd, Dd, Ts_)
            return
        sys = args[0]
        if len(args) >= 2 and Ts is None:
            Ts = args[1]
        if isinstance(sys, (lti.TransferFunction, np.ndarray, list)):
            if isinstance(sys, list):
                sys = lti.tf_matrix(sys)
            if isinstance(sys, lti.TransferFunction):
                sys = lti.tf_matrix([[sys]])
            if sys.dtype != object:
                raise TypeError(
                    "numeric-matrix form requires all 6 matrices: "
                    "LinModel(A, Bu, C, Bd, Dd, Ts)")
            # continuous tf (possibly with dead time) → discretize entries
            if sys.ravel()[0].Ts is None:
                if Ts is None:
                    raise ValueError("Sample time Ts must be specified if sys is continuous")
                # delays handled per-entry by zoh; split i_u/i_d below on the ss
                dsys_u, dsys_d, Ts = self._split_and_discretize_tf(sys, Ts, i_u, i_d)
            else:
                raise NotImplementedError("discrete tf matrices: convert to StateSpace first")
            sys_dis = self._hcat(dsys_u, dsys_d)
            sys_min = lti.minreal(sys_dis)
            nu = dsys_u.nu
            self._init_from_split(sys_min, nu, Ts)
            return
        if isinstance(sys, lti.StateSpace):
            self._init_from_ss(sys, Ts, i_u, i_d)
            return
        raise TypeError(f"unsupported model description {type(sys)}")

    # ------------------------------------------------------------------
    def _split_and_discretize_tf(self, G, Ts, i_u, i_d):
        ny, ns = G.shape
        i_u = list(range(ns)) if i_u is None else list(np.atleast_1d(i_u))
        i_d = [] if i_d is None else list(np.atleast_1d(i_d))
        i_u = [i for i in i_u if i not in i_d]
        _validate_split_indices(i_u, i_d, ns)
        Gu = G[:, i_u] if i_u else np.empty((ny, 0), object)
        Gd = G[:, i_d] if i_d else np.empty((ny, 0), object)
        dsys_u = lti.c2d(Gu, Ts, "zoh") if Gu.size else lti.StateSpace(
            np.zeros((0, 0)), np.zeros((0, 0)), np.zeros((ny, 0)), np.zeros((ny, 0)), Ts)
        if Gd.size:
            if any(g.iodelay for g in Gd.ravel()):
                dsys_d = lti.c2d(Gd, Ts, "zoh")
            else:
                dsys_d = lti.c2d(lti.tf2ss(Gd), Ts, "tustin")
        else:
            dsys_d = lti.StateSpace(np.zeros((0, 0)), np.zeros((0, 0)),
                                    np.zeros((ny, 0)), np.zeros((ny, 0)), Ts)
        if not np.allclose(dsys_u.D, 0):
            raise ValueError("LinModel only supports strictly proper systems for "
                             "manipulated inputs u (Du must be 0)")
        return dsys_u, dsys_d, Ts

    @staticmethod
    def _hcat(su, sd):
        import scipy.linalg as sla
        nxu, nxd = su.A.shape[0], sd.A.shape[0]
        A = sla.block_diag(su.A, sd.A)
        B = np.zeros((nxu + nxd, su.nu + sd.nu))
        B[:nxu, :su.nu] = su.B
        B[nxu:, su.nu:] = sd.B
        C = np.hstack([su.C, sd.C])
        D = np.hstack([su.D, sd.D])
        return lti.StateSpace(A, B, C, D, su.Ts,
                              n_delay_states=su.n_delay_states + sd.n_delay_states)

    def _init_from_split(self, sys, nu, Ts):
        A = sys.A
        Bu = sys.B[:, :nu]
        Bd = sys.B[:, nu:]
        C = sys.C
        Dd = sys.D[:, nu:]
        self._init_from_matrices(A, Bu, C, Bd, Dd, Ts)
        self.nk = sys.n_delay_states  # structural dead-time state count

    def _init_from_ss(self, sys, Ts, i_u, i_d):
        ns = sys.nu
        i_u = list(range(ns)) if i_u is None else list(np.atleast_1d(i_u))
        i_d = [] if i_d is None else list(np.atleast_1d(i_d))
        i_u = [i for i in i_u if i not in i_d]
        _validate_split_indices(i_u, i_d, ns)
        sysu = lti.sminreal(sys[:, i_u])
        sysd = lti.sminreal(sys[:, i_d])
        if not np.allclose(sysu.D, 0):
            raise ValueError("LinModel only supports strictly proper systems (D must be"
                             " 0 for columns associated to manipulated inputs u)")
        if sys.Ts is None:  # continuous
            if Ts is None:
                raise ValueError("Sample time Ts must be specified if sys is continuous")
            sysu_dis = lti.c2d_zoh(sysu, Ts)
            sysd_dis = lti.c2d_tustin(sysd, Ts)
        else:
            if Ts is not None and not np.isclose(Ts, sys.Ts):
                sysu_c = lti.d2c_zoh(sysu)
                sysd_c = lti.d2c_tustin(sysd)
                sysu_dis = lti.c2d_zoh(sysu_c, Ts)
                sysd_dis = lti.c2d_tustin(sysd_c, Ts)
            else:
                Ts = sys.Ts
                sysu_dis, sysd_dis = sysu, sysd
        sys_dis = lti.minreal(self._hcat(sysu_dis, sysd_dis))
        self._init_from_split(sys_dis, len(i_u), Ts)

    def _init_from_matrices(self, A, Bu, C, Bd, Dd, Ts):
        A = np.atleast_2d(np.asarray(A, float))
        nx = A.shape[0]
        Bu = np.asarray(Bu, float)
        if Bu.ndim < 2:
            Bu = Bu.reshape(nx, -1)
        nu = Bu.shape[1]
        if np.isscalar(C) or (isinstance(C, str)):
            raise TypeError("C must be a matrix")
        C = np.atleast_2d(np.asarray(C, float))
        ny = C.shape[0]
        if np.isscalar(Bd) and Bd == 0:
            Bd = np.zeros((nx, 0))
        Bd = np.atleast_2d(np.asarray(Bd, float))
        if Bd.size == 0:
            Bd = Bd.reshape(nx, 0)
        nd = Bd.shape[1]
        if np.isscalar(Dd) and Dd == 0:
            Dd = np.zeros((ny, nd))
        Dd = np.atleast_2d(np.asarray(Dd, float))
        if Dd.size == 0:
            Dd = Dd.reshape(ny, nd)
        if A.shape != (nx, nx):
            raise ValueError(f"A size must be {(nx, nx)}")
        if Bu.shape != (nx, nu):
            raise ValueError(f"Bu size must be {(nx, nu)}")
        if C.shape != (ny, nx):
            raise ValueError(f"C size must be {(ny, nx)}")
        if Bd.shape != (nx, nd):
            raise ValueError(f"Bd size must be {(nx, nd)}")
        if Dd.shape != (ny, nd):
            raise ValueError(f"Dd size must be {(ny, nd)}")
        if not Ts or Ts <= 0:
            raise ValueError("Sampling time Ts must be positive")
        self.A, self.Bu, self.C, self.Bd, self.Dd = A, Bu, C, Bd, Dd
        self._init_common(nu, nx, ny, nd, Ts)
        self.nk = 0  # overwritten by the tf-with-delay construction path

    # ------------------------------------------------------------------
    # pure dynamics (numpy or jax arrays — pure matrix math works for both)
    def f(self, x0, u0, d0, p):
        r = self.A @ x0 + self.Bu @ u0
        if self.nd:
            r = r + self.Bd @ d0
        return r

    def h(self, x0, d0, p):
        r = self.C @ x0
        if self.nd:
            r = r + self.Dd @ d0
        return r

    def steadystate(self, u0, d0):
        """x0 = pinv(I − A)(Bu u0 + Bd d0 + fop − xop)  (linmodel.jl:268-277)."""
        rhs = self.Bu @ u0 + self.fop - self.xop
        if self.nd:
            rhs = rhs + self.Bd @ d0
        M = np.eye(self.nx) - self.A
        self.x0 = np.linalg.pinv(M, rcond=np.sqrt(np.finfo(float).eps)) @ rhs
        return None
