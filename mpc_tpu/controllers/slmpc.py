"""SLMPC — successive-linearization adaptive MPC, fully in-graph.

The reference's fastest nonlinear-control pattern is successive linearization
(linearize! + setmodel! + LinMPC each step — the 210×-speedup headline,
docs/src/manual/nonlinmpc.md:417-502).  Its reference implementation rebuilds
prediction matrices on the host every period.  Here the ENTIRE per-step
pipeline is one jitted pure function:

    jacfwd linearization of f/h at (x̂, u, d)
      → augmented matrices (integrator blocks are static structure)
      → condensed prediction matrices from Â-power cumulative products
        (lax.scan of small matmuls — MXU work)
      → H̃/q̃ build → Ruiz + ADMM + polish QP → receding input
      → EKF-style covariance/state update with the fresh Jacobians

No host round trip, no retrace — and because it is a pure function, a FLEET
of nonlinear plants runs under ``vmap`` with per-scenario linearization
points, something the reference architecture cannot express.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.config import jit32

from ..estimators.construct import init_estimstoch
from ..estimators.kalman import kf_correct, kf_predict, _default_P0, _default_sigmas
from ..models import NonLinModel
from ..ops.qp import solve_qp
from ..ops.qp_active import solve_qp_active
from ..utils.config import BIG
from .base import PredictiveController
from .construct import ControllerWeights
from .transcription import move_blocking


class SLMPC(PredictiveController):
    """Successive-linearization MPC on a NonLinModel with EKF feedback."""

    def __init__(self, model: NonLinModel, Hp=10, Hc=2,
                 Mwt=None, Nwt=None, Lwt=None, Cwt=1e5,
                 i_ym=None, nint_u=0, nint_ym=None,
                 sigmaQ=None, sigmaR=None, sigmaQint_u=None, sigmaQint_ym=None,
                 sigmaP_0=None, sigmaPint_u_0=None, sigmaPint_ym_0=None,
                 qp_solver="admm", dtype=None):
        # dtype=jnp.float32 runs the fused step in TPU-native f32 (f64
        # LuDecomposition is unimplemented on TPU); host math stays f64
        self._dt = dtype
        if not isinstance(model, NonLinModel):
            raise TypeError("SLMPC requires a NonLinModel (use LinMPC otherwise)")
        if qp_solver not in ("admm", "active_set"):
            raise ValueError("qp_solver must be 'admm' or 'active_set'")
        self.qp_solver = qp_solver
        self.model = model
        nb = move_blocking(Hp, Hc)
        if any(n != 1 for n in nb[:-1]):
            raise ValueError("SLMPC supports the default move-blocking pattern")
        self.Hp, self.Hc = int(Hp), len(nb)
        nu, ny, nd, nx = model.nu, model.ny, model.nd, model.nx
        # estimator structure (integrator augmentation, default 1/ym)
        i_ym = list(range(ny)) if i_ym is None else list(i_ym)
        if nint_ym is None:
            nint_ym = [1] * len(i_ym)
        As, Cs_u, Cs_y, nint_u, nint_ym = init_estimstoch(model, i_ym,
                                                          nint_u, nint_ym)
        self.i_ym = i_ym
        self.As, self.Cs_u, self.Cs_y = As, Cs_u, Cs_y
        self.nxs = As.shape[0]
        self.nx_hat = nx + self.nxs
        Q_hat, R_hat = _default_sigmas(model, i_ym, nint_u, nint_ym, sigmaQ,
                                       sigmaR, sigmaQint_u, sigmaQint_ym)
        P0_hat = _default_P0(model, nint_u, nint_ym, sigmaP_0,
                             sigmaPint_u_0, sigmaPint_ym_0)
        self.Q_hat, self.R_hat, self.P0_hat = Q_hat, R_hat, P0_hat
        self.weights = ControllerWeights(nu, ny, self.Hp, self.Hc, Mwt, Nwt,
                                         Lwt, Cwt=Cwt)
        self.n_eps = self.weights.n_eps
        self.nZt = nu * self.Hc + self.n_eps
        # bounds (absolute; converted per-step in-graph with fresh op points)
        self.umin = np.full(nu, -BIG)
        self.umax = np.full(nu, BIG)
        self.dumin = np.full(nu, -BIG)
        self.dumax = np.full(nu, BIG)
        self.ymin = np.full(ny, -BIG)
        self.ymax = np.full(ny, BIG)
        # runtime state
        dt = self._dt
        self.state = dict(x_hat=jnp.zeros(self.nx_hat, dt),
                          P_hat=jnp.asarray(P0_hat, dt),
                          lastu=jnp.asarray(model.uop, dt),
                          Z=jnp.zeros(self.nZt, dt),
                          ydual=jnp.zeros(2 * nu * self.Hp + 2 * nu * self.Hc
                                          + 2 * ny * self.Hp + self.n_eps,
                                          dt))
        self._step = jit32(self._make_step())
        self._bounds_cache = None

    def setconstraint(self, umin=None, umax=None, dumin=None, dumax=None,
                      ymin=None, ymax=None):
        from .linmpc import _clipinf
        for name, v in (("umin", umin), ("umax", umax), ("dumin", dumin),
                        ("dumax", dumax), ("ymin", ymin), ("ymax", ymax)):
            if v is not None:
                getattr(self, name)[:] = _clipinf(np.asarray(v, float))
        self._bounds_cache = None  # re-upload on next step
        return self

    # -- state access (PredictiveController protocol; SLMPC owns its own
    #    fused estimator, so the estim-forwarding base methods don't apply) --
    def setstate(self, x_hat, P_hat=None):
        """Set the absolute augmented state estimate (and optionally P̂)."""
        x_hat = np.asarray(x_hat, float).ravel()
        xop_hat = np.concatenate([np.asarray(self.model.xop, float),
                                  np.zeros(self.nxs)])
        if x_hat.shape != (self.nx_hat,):
            raise ValueError(f"x̂ size must be {self.nx_hat}")
        st = dict(self.state)
        st["x_hat"] = jnp.asarray(x_hat - xop_hat, self._dt)
        if P_hat is not None:
            P_hat = np.asarray(P_hat, float)
            if P_hat.shape != (self.nx_hat, self.nx_hat):
                raise ValueError("P̂ shape mismatch")
            st["P_hat"] = jnp.asarray(P_hat, self._dt)
        self.state = st
        return self

    def getstate(self):
        """Absolute augmented state estimate."""
        xop_hat = np.concatenate([np.asarray(self.model.xop, float),
                                  np.zeros(self.nxs)])
        return np.asarray(self.state["x_hat"]) + xop_hat

    def preparestate(self, *args, **kwargs):
        raise NotImplementedError(
            "SLMPC fuses estimation and control in one step: drive it with "
            "moveinput_closed(ym, ry, d)")

    updatestate = initstate = preparestate

    # ------------------------------------------------------------------
    def _make_step(self):
        model = self.model
        nu, ny, nd, nx = model.nu, model.ny, model.nd, model.nx
        nxs, nx_hat = self.nxs, self.nx_hat
        Hp, Hc, n_eps = self.Hp, self.Hc, self.n_eps
        nZt = self.nZt
        use_as = self.qp_solver == "active_set"
        fd, hh = model._fd, model._h_user
        p_mod = model.p
        dt = self._dt
        ja = (lambda a: jnp.asarray(a, dt)) if dt is not None else jnp.asarray
        As = ja(self.As)
        Cs_u = ja(self.Cs_u)
        Cs_y = ja(self.Cs_y)
        i_ym = np.asarray(self.i_ym, int)
        M_Hp = ja(self.weights.M_Hp)
        Nt_Hc = ja(self.weights.Nt_Hc)
        L_Hp = ja(self.weights.L_Hp)
        Q_hat = ja(self.Q_hat)
        R_hat = ja(self.R_hat)
        uop = ja(model.uop)
        dop = ja(model.dop)
        yop = ja(model.yop)
        yopm = ja(np.asarray(model.yop)[i_ym])
        fop_m_xop_d = ja(model.fop - model.xop)

        def linearize(x0, u0, d0):
            """Jacobians of the DEVIATION-coordinate dynamics at (x0, u0, d0)
            (Bd/Dd are not needed: d is pinned to its value over Hp, so the
            deviation from the linearization point is zero)."""
            A = jax.jacfwd(lambda xx: fd(xx, u0, d0, p_mod))(x0)
            Bu = jax.jacfwd(lambda uu: fd(x0, uu, d0, p_mod))(u0)
            C = jax.jacfwd(lambda xx: hh(xx, d0, p_mod))(x0)
            fx = fd(x0, u0, d0, p_mod)    # next deviation state at the point
            yx = hh(x0, d0, p_mod)        # deviation output at the point
            return A, Bu, C, fx, yx

        def augment(A, Bu, C):
            Ah = jnp.block([[A, Bu @ Cs_u],
                            [jnp.zeros((nxs, nx), A.dtype), As]])
            Buh = jnp.vstack([Bu, jnp.zeros((nxs, nu), A.dtype)])
            Ch = jnp.hstack([C, Cs_y])
            return Ah, Buh, Ch

        def predmat(Ah, Buh, Ch):
            """Condensed E, K, V, B-coef from Â-power scans (default move
            blocking [1,…,1,Hp−Hc+1]) — controller/transcription.jl:115-194
            in-graph."""
            def pow_step(Ap, _):
                An = Ap @ Ah
                return An, An
            _, Apows = jax.lax.scan(pow_step, jnp.eye(nx_hat, dtype=Ah.dtype),
                                    None, length=Hp)
            Apows = jnp.concatenate([jnp.eye(nx_hat, dtype=Ah.dtype)[None],
                                     Apows])  # Â^0..Â^Hp
            S = jnp.cumsum(Apows, axis=0)                            # S(m)=ΣÂ^ℓ
            CSB = jnp.einsum("ox,kxy,yu->kou", Ch, S, Buh)           # ĈS(k)B̂u
            CA = jnp.einsum("ox,kxy->koy", Ch, Apows)                # ĈÂ^k
            # K rows: ĈÂ^j, j=1..Hp
            K = CA[1:Hp + 1].reshape(Hp * ny, nx_hat)
            # E block (stage i, move j) = ĈS(i−j)B̂u for i ≥ j — a gather over
            # the precomputed CSB stack (default move blocking)
            idx = jnp.arange(Hp)[:, None] - jnp.arange(Hc)[None, :]
            valid = idx >= 0
            gathered = CSB[jnp.clip(idx, 0, Hp)]          # (Hp, Hc, ny, nu)
            E_blocks = jnp.where(valid[:, :, None, None], gathered, 0.0)
            E = E_blocks.transpose(0, 2, 1, 3).reshape(Hp * ny, Hc * nu)
            Bc = jnp.einsum("ox,kxy->koy", Ch, S[0:Hp]).reshape(Hp * ny, nx_hat)
            return E, K, Bc

        Cwt = self.weights.Cwt

        def step(st, ym, ry, d, bounds):
            # bounds are runtime data (NOT closure constants: jnp.asarray of a
            # host array may alias or copy unpredictably on CPU)
            umin, umax = bounds["umin"], bounds["umax"]
            dumin, dumax = bounds["dumin"], bounds["dumax"]
            ymin, ymax = bounds["ymin"], bounds["ymax"]
            x_hat, P_hat, lastu = st["x_hat"], st["P_hat"], st["lastu"]
            # op-point convention: x_hat is the DEVIATION augmented state
            # (x0 = x - xop; sim_model.jl:50-125), lastu/ym/d are absolute
            d0 = d - dop if nd else d
            u0_last = lastu - uop
            xd = x_hat[:nx]
            xs = x_hat[nx:]
            # --- EKF correction: h-Jacobian at the prior estimate (the
            # "previous model", as in the reference SL pattern where the
            # estimator still holds last period's linearization) ---
            C1 = jax.jacfwd(lambda xx: hh(xx, d0, p_mod))(xd)
            Chm = jnp.hstack([C1, Cs_y])[i_ym, :]
            y_pred_m = (jnp.asarray(hh(xd, d0, p_mod)) + Cs_y @ xs)[i_ym] \
                + yopm
            xc, Pc = kf_correct(x_hat, P_hat, y_pred_m, ym, Chm, R_hat)
            xcd = xc[:nx]
            # --- re-linearize at the corrected estimate (linearize! after
            # preparestate!, docs/src/manual/nonlinmpc.md SL pattern) ---
            A, Bu, C, fx, yx = linearize(xcd, u0_last, d0)
            Ah, Buh, Ch = augment(A, Bu, C)
            E, K, Bc = predmat(Ah, Buh, Ch)
            # deviation around the linearization point [xcd; 0]: only the
            # stochastic substate is displaced
            x0c = jnp.concatenate([jnp.zeros(nx, xcd.dtype), xc[nx:]])
            f_aff = jnp.concatenate([fx + fop_m_xop_d - xcd,
                                     jnp.zeros(nxs, xcd.dtype)])
            F = K @ x0c + Bc @ f_aff
            Yop = jnp.tile(yx + yop, Hp)  # absolute outputs at the op point
            # u deviation: u0 = u − lastu (op point = lastu) ⇒ lastu0 = 0
            Cy = F + Yop - ry_full(ry)
            Cu = jnp.tile(lastu - uop, Hp)   # input target = uop (R̂u = Uop)
            q = 2.0 * (E_t(E).T @ (M_Hp @ Cy) + Pu_t(E).T @ (L_Hp @ Cu))
            H = 2.0 * (E_t(E).T @ M_Hp @ E_t(E) + PDu_t().T @ Nt_Hc @ PDu_t()
                       + Pu_t(E).T @ L_Hp @ Pu_t(E))
            H = 0.5 * (H + H.T) + 1e-9 * jnp.eye(nZt, dtype=H.dtype)
            # --- constraint rows (U, ΔU, Ŷ) ---
            A_rows, l, u = rows(E, F, Yop, lastu, bounds)
            if use_as:
                # exact GI dual active set, warm-started from the previous
                # period's duals (the active set is nearly stationary in
                # receding horizon → typically one KKT solve + one scan)
                sol = solve_qp_active(H, q, A_rows, l, u, y0=st["ydual"])
            else:
                sol = solve_qp(H, q, A_rows, l, u, x0=shift(st["Z"]),
                               y0=st["ydual"], max_iter=1000)
            Z = jnp.where(sol.converged, sol.x, shift(st["Z"]))
            du = Z[:nu]
            u_new = jnp.clip(du + lastu, umin, umax)
            # --- EKF prediction (exact augmented deviation dynamics) ---
            u0_dist = (u_new - uop) + Cs_u @ xc[nx:]
            xn_raw = jnp.concatenate([jnp.asarray(fd(xcd, u0_dist, d0, p_mod))
                                      + fop_m_xop_d,
                                      As @ xc[nx:]])
            xn, Pn = kf_predict(xn_raw, Pc, Ah, Q_hat,
                                jnp.zeros(nx_hat, xn_raw.dtype))
            new_st = dict(x_hat=xn, P_hat=Pn, lastu=u_new, Z=Z, ydual=sol.y)
            return u_new, sol.converged, new_st

        # ---- helpers over static shapes ----
        def ry_full(ry):
            return jnp.tile(ry, Hp)

        def E_t(E):
            return jnp.hstack([E, jnp.zeros((Hp * ny, n_eps), E.dtype)])

        def PDu_t():
            P = jnp.eye(Hc * nu, nZt, dtype=dt)
            if n_eps:
                P = jnp.vstack([P, jnp.zeros((1, nZt), dt).at[0, -1].set(1.0)])
            return P

        _Pu = np.zeros((Hp * nu, Hc * nu))
        for i in range(Hp):
            for j in range(min(i + 1, Hc)):
                _Pu[i * nu:(i + 1) * nu, j * nu:(j + 1) * nu] = np.eye(nu)
        _Pu_j = ja(_Pu)

        def Pu_t(E):
            return jnp.hstack([_Pu_j, jnp.zeros((Hp * nu, n_eps), E.dtype)])

        def shift(Z):
            Zs = jnp.zeros_like(Z)
            Zs = Zs.at[:(Hc - 1) * nu].set(Z[nu:Hc * nu])
            if n_eps:
                Zs = Zs.at[-1].set(Z[-1])
            return Zs

        def rows(E, F, Yop, lastu, bounds):
            umin, umax = bounds["umin"], bounds["umax"]
            dumin, dumax = bounds["dumin"], bounds["dumax"]
            ymin, ymax = bounds["ymin"], bounds["ymax"]
            dt = F.dtype
            big = jnp.asarray(2e18, dt)
            Pu_full = jnp.hstack([_Pu_j, jnp.zeros((Hp * nu, n_eps), dt)])
            Umin_d = jnp.tile(umin, Hp) - jnp.tile(lastu, Hp)
            Umax_d = jnp.tile(umax, Hp) - jnp.tile(lastu, Hp)
            PDu_rows = jnp.eye(Hc * nu, nZt, dtype=dt)
            Et = jnp.hstack([E, -jnp.ones((Hp * ny, n_eps), dt)]) if n_eps else E
            Etm = jnp.hstack([E, jnp.ones((Hp * ny, n_eps), dt)]) if n_eps else E
            A_rows = jnp.vstack([
                -Pu_full, Pu_full,
                -PDu_rows, PDu_rows,
                -Etm, Et,
            ] + ([jnp.zeros((1, nZt), dt).at[0, -1].set(1.0)] if n_eps else []))
            bU_min = jnp.clip(-Umin_d, -big, big)
            bU_max = jnp.clip(Umax_d, -big, big)
            bDU_min = jnp.clip(-jnp.tile(dumin, Hc), -big, big)
            bDU_max = jnp.clip(jnp.tile(dumax, Hc), -big, big)
            bY_min = jnp.clip(-(jnp.tile(ymin, Hp) - Yop) + F, -big, big)
            bY_max = jnp.clip(jnp.tile(ymax, Hp) - Yop - F, -big, big)
            u_vec = jnp.concatenate([bU_min, bU_max, bDU_min, bDU_max,
                                     bY_min, bY_max]
                                    + ([jnp.full(1, big, dt)] if n_eps else []))
            l_vec = jnp.concatenate([jnp.full(u_vec.shape[0] - n_eps, -big, dt)]
                                    + ([jnp.zeros(1, dt)] if n_eps else []))
            return A_rows, l_vec, u_vec

        return step

    # ------------------------------------------------------------------
    def bounds(self):
        # device-resident cache: rebuilding six arrays per control period is
        # pure host↔device overhead (0.4 ms/step on CPU); setconstraint
        # invalidates it
        if getattr(self, "_bounds_cache", None) is None:
            dt = self._dt
            self._bounds_cache = dict(
                umin=jnp.array(self.umin, dt), umax=jnp.array(self.umax, dt),
                dumin=jnp.array(self.dumin, dt),
                dumax=jnp.array(self.dumax, dt),
                ymin=jnp.array(self.ymin, dt), ymax=jnp.array(self.ymax, dt))
        return self._bounds_cache

    def moveinput_closed(self, ym, ry, d=None):
        """One full control period: EKF correct → linearize → QP → predict.
        Returns the applied u."""
        dt = self._dt if self._dt is not None else float
        d = np.zeros(0) if d is None else np.asarray(d, float)
        # ONE upload for the step inputs (tunneled-TPU transfer discipline)
        ym_d, ry_d, d_d = jax.device_put((np.asarray(ym, dt),
                                          np.asarray(ry, dt),
                                          np.asarray(d, dt)))
        u, conv, self.state = self._step(self.state, ym_d, ry_d, d_d,
                                         self.bounds())
        return np.asarray(u), bool(conv)

    # ------------------------------------------------------------------
    def fleet_state(self, B):
        """Replicate the controller state across a fleet of B scenarios."""
        return jax.tree.map(
            lambda a: jnp.tile(a[None], (B,) + (1,) * a.ndim), self.state)

    def make_fleet_step(self, B, chunk=256):
        """Jitted fleet step over B scenarios: per-lane linearization → QP →
        EKF, vmapped in chunks of ``chunk`` under ``lax.map``.

        The chunking bounds each lockstep GI solve to ``chunk`` lanes — the
        while_loop of a chunk exits at ITS OWN slowest lane instead of the
        whole fleet's, so moderate chunks beat one full-width vmap (measured
        on a v5e chip at B=1024: 176k solves/s at chunk=64, 212k at 256,
        186k at 1024 full-width; B=4096/chunk=256 reaches 380k — vs the
        reference's single-plant successive-linearization benchmark,
        manual/nonlinmpc.md:495-502).

        Returns ``step(states, ym, ry, d, bounds) -> (u, converged, states)``
        with leading batch axis B on every argument except ``bounds``.

        ``chunk`` larger than ``B`` is CLAMPED to ``B`` (full-width vmap)
        — the default chunk=256 should not force every small fleet to
        pass an explicit value; pass ``chunk=B`` explicitly if you want
        to be alerted to a mismatch via the divisibility check below.
        """
        chunk = min(int(chunk), int(B))
        if B % chunk:
            raise ValueError(f"B ({B}) must be a multiple of chunk ({chunk})")
        n = B // chunk
        vstep = jax.vmap(self._make_step(), in_axes=(0, 0, 0, 0, None))
        resh = lambda a: a.reshape((n, chunk) + a.shape[1:])
        unr = lambda a: a.reshape((B,) + a.shape[2:])

        def chunked(st, ym, ry, d, bounds):
            stc = jax.tree.map(resh, st)

            def body(args):
                s, y, r, dd = args
                return vstep(s, y, r, dd, bounds)

            u, conv, stn = jax.lax.map(
                body, (stc, resh(ym), resh(ry), resh(d)))
            return unr(u), unr(conv), jax.tree.map(unr, stn)

        return jit32(chunked)
