"""MovingHorizonEstimator (reference: src/estimator/mhe/*.jl, ~4.3 kLoC).

Objective (mhe/construct.jl:253-258):

    min_{Z̃}  x̄ᵀP̄⁻¹x̄ + ŴᵀQ̂_Nk⁻¹Ŵ + V̂ᵀR̂_Nk⁻¹V̂ + Cε²

with Z = [x̂arr; Ŵ] (SingleShooting), x̄ = x̂arr_prior − x̂arr, and the window
rollout  x̂(j+1) = f̂(x̂(j), u(j), d(j)) + ŵ(j),  v̂(j+1) = ym(j+1) − ĥm(x̂(j+1), d(j+1)).

TPU-first design decisions vs the reference:

* the growing window ``Nk ≤ He`` (mhe/execute.jl:497-547) becomes **masking
  over fixed He-shaped arrays** — the reference already zero-pads unused
  decision slots (fill0unused!, mhe/transcription.jl:1077-1090), so the masked
  formulation is exact: invalid V̂ rows get zero weight, unused Ŵ slots get
  unit weight (driving them to 0), NaN measurements get zero weight rows
  (mhe/transcription.jl:1173-1186);
* LinModel + SingleShooting (round 4) → construct-time window prediction
  matrices + one exact GI active-set solve per step (``mhe_fast.py``, the
  reference's own E/G/J/B architecture, mhe/transcription.jl:20-260) with
  warm slot-shifted duals; the general in-graph GN + ADMM solver remains
  for MultipleShooting / custom gc / NaN-measurement windows;
* NonLinModel → fixed-iteration Gauss-Newton SQP with ``lax.scan`` rollout;
* the arrival covariance is advanced by a nested covestim KalmanFilter /
  UnscentedKalmanFilter exactly like the reference (mhe/execute.jl:728-797).
"""
from __future__ import annotations

import warnings

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.config import jit32

from ..models import LinModel
from ..utils.config import BIG  # noqa: F401  (used throughout)
from .base import StateEstimator
from .construct import validate_covariances
from .kalman import KalmanFilter, UnscentedKalmanFilter, _default_P0, _default_sigmas


class MovingHorizonEstimator(StateEstimator):
    def __init__(self, model, He=None, i_ym=None, nint_u=0, nint_ym=None,
                 sigmaQ=None, sigmaR=None, sigmaQint_u=None, sigmaQint_ym=None,
                 sigmaP_0=None, sigmaPint_u_0=None, sigmaPint_ym_0=None,
                 Q_hat=None, R_hat=None, P0_hat=None, Cwt=np.inf,
                 covestim=None, direct=True, sqp_iters=12, sqp_tol=1e-6,
                 qp_solver="admm", gc=None, nc=0, p=None,
                 transcription=None):
        if He is None or He < 1:
            raise ValueError("estimation horizon He should be ≥ 1")
        self._init_common(model, i_ym, nint_u, nint_ym, direct)
        self.He = int(He)
        if Q_hat is None or R_hat is None:
            Q_hat, R_hat = _default_sigmas(model, self.i_ym, self.nint_u,
                                           self.nint_ym, sigmaQ, sigmaR,
                                           sigmaQint_u, sigmaQint_ym)
        if P0_hat is None:
            P0_hat = _default_P0(model, self.nint_u, self.nint_ym, sigmaP_0,
                                 sigmaPint_u_0, sigmaPint_ym_0)
        Q_hat, R_hat, P0_hat = validate_covariances(self.nx_hat, self.nym,
                                                    Q_hat, R_hat, P0_hat)
        self.Q_hat, self.R_hat, self.P0_hat = Q_hat, R_hat, P0_hat
        self.invQ = np.linalg.inv(Q_hat)
        self.invR = np.linalg.inv(R_hat)
        self.Cwt = float(Cwt)
        if self.Cwt < 0:
            raise ValueError("Cwt weight should be ≥ 0")
        self.n_eps = 0 if np.isinf(Cwt) else 1
        self.sqp_iters = int(sqp_iters)
        # relative step-norm exit of the GN loop (round-5): warm-started
        # receding windows re-converge in 1-2 iterations at steady state —
        # a FIXED 12-iteration fori burned ~6-10× the needed work on every
        # nonlinear window solve (and on every lane of a fleet)
        self.sqp_tol = float(sqp_tol)
        # QP backend of the GENERAL (nonlinear / custom-constraint) window
        # solver: "admm" (ρ-ladder, round-3 default) or "active_set" (exact
        # GI pivots — the same OSQP→DAQP trade that carried every other
        # fleet; the LinModel fast path always uses GI regardless)
        if qp_solver not in ("admm", "active_set"):
            raise ValueError("qp_solver must be 'admm' or 'active_set'")
        self.qp_solver = qp_solver
        # custom nonlinear constraints gc(X̂e, V̂e, Ŵe, Ue, Yem, De, P̄, x̄, p, ε)
        # ≤ 0 (mhe/construct.jl:437-448); invalid window slots are NaN-padded
        self.gc = gc
        self.nc = int(nc)
        self.p_user = p if p is not None else model.p
        # nested arrival-covariance estimator (mhe/construct.jl:641-648)
        if covestim is not None:
            P_ce = getattr(covestim, "P0_hat", None)
            if P_ce is not None and np.shape(P_ce) != (self.nx_hat,
                                                       self.nx_hat):
                # mhe/construct.jl:655: covestim P̂ must match nx̂
                raise ValueError(
                    f"P̂ covariance size {np.shape(P_ce)} of covestim does "
                    f"not match nx̂={self.nx_hat}")
            self.covestim = covestim
        elif isinstance(model, LinModel):
            self.covestim = KalmanFilter(model, i_ym=self.i_ym,
                                         nint_u=self.nint_u, nint_ym=self.nint_ym,
                                         Q_hat=Q_hat, R_hat=R_hat, P0_hat=P0_hat,
                                         direct=direct)
        else:
            self.covestim = UnscentedKalmanFilter(
                model, i_ym=self.i_ym, nint_u=self.nint_u, nint_ym=self.nint_ym,
                Q_hat=Q_hat, R_hat=R_hat, P0_hat=P0_hat, direct=direct)
        # fixed-shape data windows (left-aligned, oldest first); slot j of all
        # windows holds the data of the j-th measurement in the window
        He_, nu, nd, nym, nx_hat = self.He, model.nu, model.nd, self.nym, self.nx_hat
        self.Y0m_win = np.full((He_, nym), np.nan)
        self.U0_win = np.zeros((He_, nu))
        self.D0_win = np.zeros((He_ + 1, nd))   # slot 0 = pre-window d (zeros)
        self.X0_old_win = np.zeros((He_, nx_hat))
        self.Nk = 0
        self.x_arr_prior = np.zeros(nx_hat)
        self.P_arr = P0_hat.copy()
        self.invP_arr = np.linalg.inv(self.P_arr)
        # decision vector: Z̃ = [ϵ; x̂arr; Ŵ] (SingleShooting) or
        # [ϵ; x̂arr; X̂0; Ŵ] with defect equalities (MultipleShooting,
        # mhe/transcription.jl:2-3)
        from ..controllers.transcription import (MultipleShooting,
                                                 OrthogonalCollocation,
                                                 SingleShooting,
                                                 TrapezoidalCollocation)
        self.transcription = transcription or SingleShooting()
        if isinstance(self.transcription, OrthogonalCollocation):
            # mirrors the reference's restriction (mhe/construct.jl:174-175)
            raise ValueError("OrthogonalCollocation is not supported for the "
                             "MHE for now.")
        self.is_trap = isinstance(self.transcription, TrapezoidalCollocation)
        if self.is_trap:
            from ..models import NonLinModel, RungeKutta
            if not isinstance(model, NonLinModel) or not isinstance(
                    model.solver, RungeKutta):
                raise ValueError("TrapezoidalCollocation requires a "
                                 "continuous-time NonLinModel (with a "
                                 "RungeKutta solver).")
        # trapezoidal shares the MultipleShooting decision layout
        # (mhe/transcription.jl:3 — get_nZ_mhe for ::TranscriptionMethod)
        self.is_ms = isinstance(self.transcription, MultipleShooting) or self.is_trap
        self.nZ = nx_hat + He_ * nx_hat + (He_ * nx_hat if self.is_ms else 0)
        self.nZt = self.nZ + self.n_eps
        self._w_off = self.n_eps + nx_hat + (He_ * nx_hat if self.is_ms else 0)
        self.Z_tilde = np.zeros(self.nZt)
        self._pending_u0 = np.zeros(nu)
        # bounds, full-window shaped so time-varying (capital) forms work
        # (mhe/construct.jl:773-1046): X̂ has He+1 slots (slot 0 = arrival)
        self.X_min = np.full((He + 1) * nx_hat, -BIG)
        self.X_max = np.full((He + 1) * nx_hat, BIG)
        self.W_min = np.full(He * nx_hat, -BIG)
        self.W_max = np.full(He * nx_hat, BIG)
        self.V_min = np.full(He * nym, -BIG)
        self.V_max = np.full(He * nym, BIG)
        self.C_xmin = np.ones((He + 1) * nx_hat)
        self.C_xmax = np.ones((He + 1) * nx_hat)
        self.C_wmin = np.ones(He * nx_hat)
        self.C_wmax = np.ones(He * nx_hat)
        self.C_vmin = np.ones(He * nym)
        self.C_vmax = np.ones(He * nym)
        self._solve_jit = self._make_solver()
        self._last = {}
        # construct-time fast path (LinModel + SingleShooting + nc == 0):
        # window prediction matrices + exact GI window QP — the reference's
        # own architecture (mhe/transcription.jl:20-260 builds E,G,J,B once;
        # per-step updates only truncate q̃/H̃, mhe/execute.jl:390-457)
        self._fast_mats = None
        self._fast_solve = None
        self._fast_step_cache = None
        self._y_fast = None
        # COUNT of window moves since the last fast solve: a multi-step
        # general-solver interlude (NaN measurements) moves the window
        # several times, and the warm duals must be slot-shifted once per
        # move when the fast path resumes (a bool under-shifted by He−1)
        self._moves_since_solve = 0

    # ------------------------------------------------------------------
    def setconstraint(self, **kw):
        """Bounds on x̂, ŵ, v̂ (mhe/construct.jl:773-1046).  Lowercase
        keywords (xhatmin …) tile over the window; the capital forms
        (Xhatmin of size ``nx̂*(He+1)``, Whatmin/Vhatmin of size ``nx̂*He`` /
        ``nym*He``) set time-varying bounds per window slot (slot 0 of the
        X̂ forms is the arrival state)."""
        nx_hat, nym, He = self.nx_hat, self.nym, self.He
        # key -> (attr, per-slot size, slot count, subtract xop?)
        m = {"xhatmin": ("X_min", nx_hat, He + 1, True),
             "xhatmax": ("X_max", nx_hat, He + 1, True),
             "whatmin": ("W_min", nx_hat, He, False),
             "whatmax": ("W_max", nx_hat, He, False),
             "vhatmin": ("V_min", nym, He, False),
             "vhatmax": ("V_max", nym, He, False),
             "c_xhatmin": ("C_xmin", nx_hat, He + 1, False),
             "c_xhatmax": ("C_xmax", nx_hat, He + 1, False),
             "c_whatmin": ("C_wmin", nx_hat, He, False),
             "c_whatmax": ("C_wmax", nx_hat, He, False),
             "c_vhatmin": ("C_vmin", nym, He, False),
             "c_vhatmax": ("C_vmax", nym, He, False)}
        for k, v in kw.items():
            key = k.lower()
            if key not in m:
                raise ValueError(f"unknown constraint keyword {k}")
            attr, n, rep, sub_op = m[key]
            v = np.asarray(v, float).ravel()
            if v.shape == (n,):
                v = np.tile(v, rep)
            if v.shape != (n * rep,):
                raise ValueError(f"{k} size must be ({n},) or ({n * rep},)")
            if key.startswith("c_"):
                if self.n_eps != 1:
                    raise ValueError("Slack variable weight Cwt must be "
                                     "finite to set softness parameters")
                if np.any(v < 0):
                    # mhe/construct.jl:966-996: softness weights ≥ 0
                    raise ValueError(f"{k} weights should be non-negative")
            val = v.copy()
            if sub_op:
                val = val - np.tile(self.xop_hat, rep)
            getattr(self, attr)[:] = np.clip(np.nan_to_num(val, posinf=BIG,
                                                           neginf=-BIG), -BIG, BIG)
        self._fast_step_cache = None    # bounds feed the cached A_rows/consts
        return self

    # ------------------------------------------------------------------
    def _make_solver(self):
        model = self.model
        estim = self
        He, nu, nd, nym, nx_hat = self.He, model.nu, model.nd, self.nym, self.nx_hat
        n_eps = self.n_eps
        nZ, nZt = self.nZ, self.nZt
        is_lin = isinstance(model, LinModel)
        if is_lin:
            # read the matrices from p: setmodel swaps data without a retrace
            def f_hat(x, u0, d0, _p=None):
                r = _p["A_hat"] @ x + _p["Bu_hat"] @ u0
                if model.nd:
                    r = r + _p["Bd_hat"] @ d0
                return r

            def h_hat_m(x, d0, _p=None):
                r = _p["Cm_hat"] @ x
                if model.nd:
                    r = r + _p["Ddm_hat"] @ d0
                return r
        else:
            _fh, _hm = self.f_hat, self.h_hat_m
            f_hat = lambda x, u0, d0, _p=None: _fh(x, u0, d0)
            h_hat_m = lambda x, d0, _p=None: _hm(x, d0)
        Cwt = self.Cwt
        sqp_iters = self.sqp_iters
        sqp_tol = self.sqp_tol
        use_as = self.qp_solver == "active_set"
        from ..ops.qp import solve_qp
        from ..ops.qp_active import solve_qp_active

        p_form = 0 if self.direct else 1
        gc, nc, p_user = self.gc, self.nc, self.p_user
        i_ym = np.asarray(self.i_ym, int)
        yopm = self.model.yop[i_ym]

        def rollout(p, x_arr, W, U, D):
            """Window states and measurement predictions.

            ``D`` has He+1 slots with slot 0 the pre-window disturbance
            (mirrors the reference's D0 window, mhe/execute.jl:521-538).
            p=0 (direct/filter form): x̂(t0+j+1) = f̂(x̂(t0+j), u(t0+j), D[j]),
            ŷm row j at state X[j] with D[j+1].
            p=1 (predictor form): dynamics use D[j+1]; outputs evaluated at
            [x̂arr, X[:-1]] with D[j+1].
            """
            Wm = W.reshape(He, nx_hat)
            Df = D[:-1] if p_form == 0 else D[1:]

            def scan_f(x, inp):
                u0, d0f, w = inp
                xn = jnp.asarray(f_hat(x, u0, d0f, p)) + p["fop_m_xop"] + w
                return xn, xn

            _, X = jax.lax.scan(scan_f, x_arr, (U, Df, Wm))
            if p_form == 0:
                Xmeas = X
            else:
                Xmeas = jnp.vstack([x_arr[None, :], X[:-1]])
            Ym = jax.vmap(lambda x, d0h: jnp.asarray(h_hat_m(x, d0h, p)))(
                Xmeas, D[1:])
            return X, Ym

        is_ms = self.is_ms
        w_off = n_eps + nx_hat + (He * nx_hat if is_ms else 0)

        def pack_problem(p, Zt):
            eps = Zt[0] if n_eps else jnp.asarray(0.0)
            x_arr = Zt[n_eps:n_eps + nx_hat]
            W = Zt[w_off:]
            return eps, x_arr, W

        def rollout_z(p, Zt):
            """Transcription-aware window states + measurement predictions."""
            eps, x_arr, W = pack_problem(p, Zt)
            if not is_ms:
                return rollout(p, x_arr, W, p["U"], p["D"])
            X = Zt[n_eps + nx_hat:w_off].reshape(He, nx_hat)
            Xmeas = X if p_form == 0 else jnp.vstack([x_arr[None, :], X[:-1]])
            Ym = jax.vmap(lambda x, d0h: jnp.asarray(h_hat_m(x, d0h, p)))(
                Xmeas, p["D"][1:])
            return X, Ym

        is_trap = self.is_trap
        if is_trap:
            nx_d = model.nx
            f_cont = model._f_user
            p_model = model.p
            Ts_m = model.Ts
            As_s = self.As
            Cs_u_s = self.Cs_u
            hold = self.transcription.h

        def defects_z(p, Zt):
            """Defect equalities per stage (MS: ŵ(j) = x̂(j+1) − f̂(x̂(j));
            trapezoidal: implicit-trapezoid rule on the deterministic
            substates, discrete MS on the stochastic ones,
            mhe/transcription.jl:1390-1470); masked stages copy the state
            forward so they stay anchored."""
            eps, x_arr, W = pack_problem(p, Zt)
            X = Zt[n_eps + nx_hat:w_off].reshape(He, nx_hat)
            Wm = W.reshape(He, nx_hat)
            X_prev = jnp.vstack([x_arr[None, :], X[:-1]])
            Df = p["D"][:-1] if p_form == 0 else p["D"][1:]
            if is_trap:
                # disturbed inputs û(j) = u(j) + Cs_u·x̂s(j), x̂s from the
                # interval's START state (disturbedinput!, execute.jl:162-173)
                Uh = p["U"] + X_prev[:, nx_d:] @ jnp.asarray(Cs_u_s).T
                # d at the END of interval j: slot j+1 of the He+1-slot window
                # (d0next, mhe/transcription.jl:1447); clamp for p=1
                Dn = (p["D"][1:] if p_form == 0
                      else jnp.vstack([Df[1:], Df[-1:]]))
                if hold >= 1:
                    # û(end of newest valid interval) is unavailable at k —
                    # reference clamps to û(j) at j ≥ Nk (transcription.jl:1460)
                    j = jnp.arange(He)
                    Un = Uh[jnp.where(j + 1 < p["Nk"], j + 1, j)]
                else:
                    Un = Uh
                k1 = jax.vmap(lambda x, u, d: jnp.asarray(
                    f_cont(x, u, d, p_model)))(X_prev[:, :nx_d], Uh, Df)
                k2 = jax.vmap(lambda x, u, d: jnp.asarray(
                    f_cont(x, u, d, p_model)))(X[:, :nx_d], Un, Dn)
                S_det = (X_prev[:, :nx_d] - X[:, :nx_d]
                         + 0.5 * Ts_m * (k1 + k2) + Wm[:, :nx_d])
                S_sto = (X_prev[:, nx_d:] @ jnp.asarray(As_s).T
                         - X[:, nx_d:] + Wm[:, nx_d:])
                S_valid = jnp.concatenate([S_det, S_sto], axis=1)
            else:
                F = jax.vmap(lambda x, u, d: jnp.asarray(f_hat(x, u, d, p)))(
                    X_prev, p["U"], Df) + p["fop_m_xop"]
                S_valid = F + Wm - X
            S_anchor = X_prev + Wm - X
            mask = p["mask_w"][:, None] > 0
            return jnp.where(mask, S_valid, S_anchor).reshape(-1)

        def objective(p, Zt):
            eps, x_arr, W = pack_problem(p, Zt)
            X, Ym = rollout_z(p, Zt)
            V = p["Y0m"] - Ym                       # (He, nym)
            xb = p["x_arr_prior"] - x_arr
            Wm = W.reshape(He, nx_hat)
            # masks: valid window steps & non-NaN measurements
            Vv = jnp.where(p["mask_v"], V, 0.0)
            J = (xb @ p["invP"] @ xb
                 + jnp.sum((Wm @ p["invQ"]) * Wm * p["mask_w"][:, None])
                 + jnp.sum(jnp.maximum(1.0 - p["mask_w"][:, None], 0.0) * Wm ** 2)
                 + jnp.sum((Vv @ p["invR"]) * Vv))
            if n_eps:
                J = J + Cwt * eps ** 2
            return J

        def ineq_violation(p, Zt):
            """ℓ1 violation of the TRUE (nonlinear) soft bounds — the merit
            must see infeasibility or the line search undoes the QP step's
            progress toward the active v̂/x̂ bounds (an objective-only merit
            accepted iterates with v̂ 90× outside its bound on the reference's
            manual.jl:99 example)."""
            eps, x_arr, W = pack_problem(p, Zt)
            X, Ym = rollout_z(p, Zt)
            relu = lambda a: jnp.sum(jnp.maximum(a, 0.0))
            big = jnp.asarray(2e18, Zt.dtype)
            mw = jnp.repeat(p["mask_w"], nx_hat)
            mv = p["mask_v"].reshape(-1)
            ce = (lambda c: c * eps) if n_eps else (lambda c: 0.0)
            v = relu(p["Xmin"][:nx_hat] - ce(p["C_xmin"][:nx_hat]) - x_arr)
            v += relu(x_arr - p["Xmax"][:nx_hat] - ce(p["C_xmax"][:nx_hat]))
            Xv = X.reshape(-1)
            v += relu(jnp.where(mw, p["Xmin"][nx_hat:], -big)
                      - ce(p["C_xmin"][nx_hat:]) - Xv)
            v += relu(Xv - jnp.where(mw, p["Xmax"][nx_hat:], big)
                      - ce(p["C_xmax"][nx_hat:]))
            v += relu(jnp.where(mw, p["Wmin"], -big) - ce(p["C_wmin"]) - W)
            v += relu(W - jnp.where(mw, p["Wmax"], big) - ce(p["C_wmax"]))
            Vv = jnp.where(p["mask_v"], p["Y0m"] - Ym, 0.0).reshape(-1)
            v += relu(jnp.where(mv, p["Vmin"], -big) - ce(p["C_vmin"]) - Vv)
            v += relu(Vv - jnp.where(mv, p["Vmax"], big) - ce(p["C_vmax"]))
            if n_eps:
                v += relu(-eps)
            return v

        # expose for getinfo's derivative dumps (reference mhe/execute.jl
        # getinfo ∇J diagnostics)
        self._obj_fn = objective

        @jit32
        def solve(p, Zt0):
            dt = Zt0.dtype

            def constraint_rows(Zt):
                """Linearized soft bounds on X̂ (window), Ŵ, V̂ + ϵ ≥ 0."""
                eps, x_arr, W = pack_problem(p, Zt)

                def xv_fun(Zt_):
                    X, Ym = rollout_z(p, Zt_)
                    V = p["Y0m"] - Ym
                    return X.reshape(-1), V.reshape(-1)

                Xv, Vv = xv_fun(Zt)
                JX, JV = jax.jacfwd(xv_fun)(Zt)
                rows, lo, up = [], [], []
                mw = jnp.repeat(p["mask_w"], nx_hat)
                mv = p["mask_v"].reshape(-1)
                big = jnp.asarray(2e18, dt)

                def add(Ar, lr, ur):
                    rows.append(Ar)
                    lo.append(lr)
                    up.append(ur)

                # x̂ window bounds (incl. arrival via first rows of X? the
                # arrival state itself):
                e_arr = jnp.zeros((nx_hat, nZt), dt)
                e_arr = e_arr.at[:, n_eps:n_eps + nx_hat].set(jnp.eye(nx_hat, dtype=dt))
                if n_eps:
                    e_arr_min = e_arr.at[:, 0].add(p["C_xmin"][:nx_hat])
                    e_arr_max = e_arr.at[:, 0].add(-p["C_xmax"][:nx_hat])
                else:
                    e_arr_min = e_arr_max = e_arr
                add(-e_arr_min, jnp.full(nx_hat, -big, dt),
                    -(p["Xmin"][:nx_hat] - x_arr) +
                    (p["C_xmin"][:nx_hat] * eps if n_eps else 0.0))
                add(e_arr_max, jnp.full(nx_hat, -big, dt),
                    p["Xmax"][:nx_hat] - x_arr +
                    (p["C_xmax"][:nx_hat] * eps if n_eps else 0.0))
                # window states (slots 1..He of the window-shaped arrays)
                Xmin_t = jnp.where(mw, p["Xmin"][nx_hat:], -big)
                Xmax_t = jnp.where(mw, p["Xmax"][nx_hat:], big)
                JXmin = JX.at[:, 0].add(p["C_xmin"][nx_hat:]) if n_eps else JX
                JXmax = JX.at[:, 0].add(-p["C_xmax"][nx_hat:]) if n_eps else JX
                ceps_x = (p["C_xmin"][nx_hat:] * eps) if n_eps else 0.0
                ceps_X = (p["C_xmax"][nx_hat:] * eps) if n_eps else 0.0
                add(-JXmin, jnp.full(He * nx_hat, -big, dt), -(Xmin_t - ceps_x - Xv))
                add(JXmax, jnp.full(He * nx_hat, -big, dt), Xmax_t + ceps_X - Xv)
                # ŵ bounds (linear rows on decision block)
                e_w = jnp.zeros((He * nx_hat, nZt), dt)
                e_w = e_w.at[:, w_off:].set(jnp.eye(He * nx_hat, dtype=dt))
                Wv = Zt[w_off:]
                Wmin_t = jnp.where(mw, p["Wmin"], -big)
                Wmax_t = jnp.where(mw, p["Wmax"], big)
                ew_min = e_w.at[:, 0].add(p["C_wmin"]) if n_eps else e_w
                ew_max = e_w.at[:, 0].add(-p["C_wmax"]) if n_eps else e_w
                cw_min = (p["C_wmin"] * eps) if n_eps else 0.0
                cw_max = (p["C_wmax"] * eps) if n_eps else 0.0
                add(-ew_min, jnp.full(He * nx_hat, -big, dt), -(Wmin_t - cw_min - Wv))
                add(ew_max, jnp.full(He * nx_hat, -big, dt), Wmax_t + cw_max - Wv)
                # v̂ bounds
                Vmin_t = jnp.where(mv, p["Vmin"], -big)
                Vmax_t = jnp.where(mv, p["Vmax"], big)
                JVmin = JV.at[:, 0].add(p["C_vmin"]) if n_eps else JV
                JVmax = JV.at[:, 0].add(-p["C_vmax"]) if n_eps else JV
                cv_min = (p["C_vmin"] * eps) if n_eps else 0.0
                cv_max = (p["C_vmax"] * eps) if n_eps else 0.0
                add(-JVmin, jnp.full(He * nym, -big, dt), -(Vmin_t - cv_min - Vv))
                add(JVmax, jnp.full(He * nym, -big, dt), Vmax_t + cv_max - Vv)
                if n_eps:
                    er = jnp.zeros((1, nZt), dt).at[0, 0].set(1.0)
                    add(er, jnp.atleast_1d(-eps), jnp.full(1, big, dt))
                # (MS defect equalities are handled by nullspace elimination
                # in the solve body, not as ADMM rows — see below)
                # custom nonlinear constraints gc ≤ 0, linearized at the
                # iterate (NaN-padded aligned windows, mhe/construct.jl:437-448)
                if nc:
                    def gfun(Zt_):
                        eps_, xa, W_ = pack_problem(p, Zt_)
                        X, Ym = rollout_z(p, Zt_)
                        nanv = jnp.asarray(jnp.nan, dt)
                        mw = p["mask_w"][:, None] > 0
                        Xe = jnp.vstack([xa[None, :],
                                         jnp.where(mw, X, nanv)])
                        V = jnp.where(p["mask_v"], p["Y0m"] - Ym, nanv)
                        Ve = jnp.vstack([jnp.full((1, V.shape[1]), nanv), V])
                        We = jnp.vstack([jnp.where(mw, W_.reshape(He, -1), nanv),
                                         jnp.full((1, nx_hat), nanv)])
                        Ue = jnp.vstack([jnp.where(mw, p["U"], nanv),
                                         jnp.full((1, p["U"].shape[1]), nanv)])
                        Yme = jnp.vstack([jnp.full((1, V.shape[1]), nanv),
                                          jnp.where(p["mask_v"], p["Y0m"]
                                                    + jnp.asarray(yopm), nanv)])
                        De = p["D"]
                        xb = p["x_arr_prior"] - xa
                        g = jnp.asarray(gc(Xe.reshape(-1), Ve.reshape(-1),
                                           We.reshape(-1), Ue.reshape(-1),
                                           Yme.reshape(-1), De.reshape(-1),
                                           p["invP"], xb, p_user, eps_))
                        return jnp.nan_to_num(g, nan=-1.0)
                    gcv = gfun(Zt)
                    Jgc = jax.jacfwd(gfun)(Zt)
                    add(Jgc, jnp.full(nc, -big, dt), -gcv)
                return (jnp.vstack(rows), jnp.concatenate(lo),
                        jnp.concatenate(up), Xv, Vv)

            obj = lambda Zt: objective(p, Zt)
            grad_f = jax.grad(obj)

            def gn_hessian(Zt):
                """Gauss-Newton Hessian: exact for LinModel (objective is a
                quadratic), GN for nonlinear."""
                def res_fun(Zt_):
                    X, Ym = rollout_z(p, Zt_)
                    V = jnp.where(p["mask_v"], p["Y0m"] - Ym, 0.0)
                    return V.reshape(-1)

                JV = jax.jacfwd(res_fun)(Zt)
                # dtype-follow the params: a default (f64-under-x64) eye in
                # the krons silently upcasts H while q stays f32, which
                # breaks the fori carry of the f32 fleet path
                dtp = p["invR"].dtype
                invR_blk = jnp.kron(jnp.eye(He, dtype=dtp), p["invR"])
                H = 2.0 * JV.T @ invR_blk @ JV
                # arrival + Ŵ terms (quadratic in Z̃ directly)
                H = H.at[n_eps:n_eps + nx_hat, n_eps:n_eps + nx_hat].add(2.0 * p["invP"])
                wblk = jnp.kron(jnp.diag(p["mask_w"]), p["invQ"]) + \
                    jnp.kron(jnp.diag(1.0 - p["mask_w"]),
                             jnp.eye(nx_hat, dtype=dtp))
                H = H.at[w_off:, w_off:].add(2.0 * wblk)
                if n_eps:
                    H = H.at[0, 0].add(2.0 * Cwt)
                return H + 1e-10 * jnp.eye(nZt, dtype=H.dtype)

            n_iters = 1 if (is_lin and nc == 0) else sqp_iters

            neq = He * nx_hat if is_ms else 0

            def body(carry):
                Zt, y_d, _, mu, it, _ = carry
                g = grad_f(Zt)
                H = gn_hessian(Zt)
                A, l, u, Xv, Vv = constraint_rows(Zt)
                # dual warm start across SQP iterations (multipliers
                # stabilize; ADMM converges in far fewer sweeps)
                if is_ms:
                    # Linearized defect equalities Js·dz = −S eliminated
                    # EXACTLY via QR nullspace (dz = dp + N v): ADMM only sees
                    # the inequality-reduced QP it solves accurately.  Stacked
                    # equality rows in ADMM were inexact — nonlinear MS≡SS
                    # drifted ~2e-5 and linear MS-MHE≡KF sat at 1e-8.
                    Sv = defects_z(p, Zt)
                    Js = jax.jacfwd(lambda Zt_: defects_z(p, Zt_))(Zt)
                    Qf, Rf = jnp.linalg.qr(Js.T, mode="complete")
                    Q1, Nn = Qf[:, :neq], Qf[:, neq:]
                    Rsq = Rf[:neq, :]
                    dp = Q1 @ jax.scipy.linalg.solve_triangular(
                        Rsq.T, -Sv, lower=True)
                    Hr = Nn.T @ H @ Nn
                    gr = Nn.T @ (g + H @ dp)
                    if use_as:
                        sol = solve_qp_active(Hr, gr, A @ Nn, l - A @ dp,
                                              u - A @ dp, y0=y_d)
                    else:
                        sol = solve_qp(Hr, gr, A @ Nn, l - A @ dp,
                                       u - A @ dp, y0=y_d, max_iter=None,
                                       tol=1e-8, n_lad=3)
                    dz = dp + Nn @ sol.x
                    # equality multipliers from stationarity → adaptive ℓ1
                    # penalty (must dominate the duals, N&W Thm 17.3)
                    resid = H @ dz + g + A.T @ sol.y
                    lam = jax.scipy.linalg.solve_triangular(
                        Rsq, -(Q1.T @ resid), lower=False)
                    dual_inf = jnp.maximum(jnp.linalg.norm(sol.y, jnp.inf),
                                           jnp.linalg.norm(lam, jnp.inf))
                    mu = jnp.clip(mu, 2.0 * dual_inf, 20.0 * dual_inf + 1e3)
                else:
                    # max_iter=None: the dtype-aware default (2000 in
                    # f64, 250 in f32 — iterations past the f32 floor buy
                    # nothing and tax the whole lockstep fleet; an explicit
                    # 1500 here cost the B=4096 window fleet 7x).
                    # n_lad=3: H̃ changes every step (invP̄), so the ρ-ladder
                    # is rebuilt in-solve — each rung is one batched
                    # inversion, and warm-started window QPs never walk far
                    # from the centre rung (measured: 9→3 is 1.7× on the
                    # B=4096 fleet with identical convergence)
                    if use_as:
                        sol = solve_qp_active(H, g, A, l, u, y0=y_d)
                    else:
                        sol = solve_qp(H, g, A, l, u, y0=y_d, max_iter=None,
                                       tol=1e-8, n_lad=3)
                    dz = sol.x
                    dual_inf = jnp.linalg.norm(sol.y, jnp.inf)
                    mu = jnp.clip(mu, 2.0 * dual_inf, 20.0 * dual_inf + 1e3)
                # line search only needed for nonlinear models
                if is_lin:
                    Zn = Zt + dz
                else:
                    # l1 exact-penalty merit: an objective-only merit accepts
                    # damped steps that lower J while leaving the true
                    # nonlinear defects violated (the optimizer then "cheats"
                    # the dynamics and never tightens them)
                    if is_ms:
                        merit = lambda Zt_: (obj(Zt_)
                                             + mu * jnp.sum(
                                                 jnp.abs(defects_z(p, Zt_)))
                                             + mu * ineq_violation(p, Zt_))
                        # second-order correction: restore the defects at the
                        # trial point through the same QR so the merit accepts
                        # full steps despite defect curvature (N&W §15.6)
                        c_soc = Q1 @ jax.scipy.linalg.solve_triangular(
                            Rsq.T, -defects_z(p, Zt + dz), lower=True)
                    else:
                        merit = lambda Zt_: (obj(Zt_)
                                             + mu * ineq_violation(p, Zt_))
                        c_soc = jnp.zeros_like(dz)
                    # deep backtracking: a grid that bottoms out at 0.1 can
                    # deterministically lock at α=0 from a bad warm start (the
                    # GN step is a descent direction, but only for small α) —
                    # the loop then never moves regardless of sqp_iters
                    alphas = jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.03, 0.01,
                                          0.003, 0.001], dt)
                    merits = jax.vmap(
                        lambda a: merit(Zt + a * dz + (a * a) * c_soc))(alphas)
                    best = jnp.argmin(merits)
                    a = jnp.where(merits[best] < merit(Zt), alphas[best], 0.0)
                    Zn = Zt + a * dz + (a * a) * c_soc
                sn = jnp.linalg.norm(Zn - Zt, jnp.inf)
                return Zn, sol.y, sol.converged, mu, it + 1, sn

            def cond(carry):
                Zt, _, _, _, it, sn = carry
                # step-norm early exit (round-5): warm-started receding
                # windows re-converge in 1-2 GN iterations at steady state;
                # the old fixed fori burned all sqp_iters on every solve
                # (and on every lane of a lockstep fleet)
                return (it < n_iters) & ((it < 1) | (
                    sn > sqp_tol * (1.0 + jnp.linalg.norm(Zt, jnp.inf))))

            n_rows = (2 * nx_hat + 4 * He * nx_hat + 2 * He * nym + n_eps
                      + nc)
            y0_init = jnp.zeros(n_rows, dt)
            Zt, _, ok, _, _, _ = jax.lax.while_loop(
                cond, body,
                (Zt0, y0_init, jnp.array(True), jnp.asarray(1e4, dt),
                 jnp.array(0), jnp.asarray(jnp.inf, dt)))
            # final rollout for the state estimate
            eps, x_arr, W = pack_problem(p, Zt)
            X, Ym = rollout_z(p, Zt)
            # x̂0 = x̂ at window slot Nk−1 (the newest valid state)
            idx = jnp.clip(p["Nk"] - 1, 0, He - 1)
            x_hat_new = jnp.where(p["Nk"] > 0, X[idx], x_arr)
            J = objective(p, Zt)
            return Zt, x_hat_new, X, Ym, J, ok

        return solve

    # ------------------------------------------------------------------
    def _windows_params(self):
        mask_w = (np.arange(self.He) < self.Nk).astype(float)
        mask_v = (mask_w[:, None] > 0) & np.isfinite(self.Y0m_win)
        extra = {}
        if isinstance(self.model, LinModel):
            # model matrices live in p: setmodel swaps data, never retraces
            extra = dict(A_hat=self.A_hat, Bu_hat=self.Bu_hat,
                         Bd_hat=self.Bd_hat, Cm_hat=self.Cm_hat,
                         Ddm_hat=self.Ddm_hat)
        return dict(
            **extra,
            U=self.U0_win, D=self.D0_win,
            Y0m=np.nan_to_num(self.Y0m_win),
            mask_w=mask_w, mask_v=mask_v,
            invP=self.invP_arr, invQ=self.invQ, invR=self.invR,
            x_arr_prior=self.x_arr_prior,
            fop_m_xop=self.fop_hat - self.xop_hat,
            Xmin=self.X_min, Xmax=self.X_max,
            Wmin=self.W_min, Wmax=self.W_max,
            Vmin=self.V_min, Vmax=self.V_max,
            C_xmin=self.C_xmin, C_xmax=self.C_xmax,
            C_wmin=self.C_wmin, C_wmax=self.C_wmax,
            C_vmin=self.C_vmin, C_vmax=self.C_vmax,
            Nk=np.int32(self.Nk),
        )

    # ------------------------------------------------------------------
    def _fast_applicable(self):
        """Construct-time-matrix + GI path: LinModel, no custom
        constraints, and no NaN measurement in the window (a NaN changes
        the per-lane V-row weights and hence H̃).  MultipleShooting
        windows are served by the SAME path (round-5): for a LinModel the
        defect equalities are linear, so condensing X̂ = Gx·Z_ss + c_x is
        EXACT — the fast solver works on the SS-form decisions
        [ϵ; x̂arr; Ŵ] and the MS-layout Z̃ (with its X̂ block) is
        reconstructed from the rollout for warm starts / the general
        fallback (reference MS-MHE decision layout:
        mhe/transcription.jl:92-111,406-545).  TrapezoidalCollocation
        never reaches here (it requires a NonLinModel)."""
        return (isinstance(self.model, LinModel) and self.nc == 0
                and not np.any(np.isnan(self.Y0m_win[:self.Nk])))

    def _solve_window_fast(self):
        """One exact GI solve of the window QP from the construct-time
        prediction matrices (no in-graph jacfwd, no ADMM ρ-ladder)."""
        from . import mhe_fast

        if self._fast_mats is None:
            self._fast_mats = mhe_fast.build_pred_mats(self)
            self._fast_solve = mhe_fast.make_single_solver(self._fast_mats)
        mats = self._fast_mats
        He, nx, nym = self.He, self.nx_hat, self.nym
        # A_rows/consts depend only on (bounds, min(Nk, He)): once the
        # window is full they are byte-identical every step, so cache the
        # assembled arrays (re-shipping ~100 KB of unchanged constants per
        # step costs real upload time on a tunneled TPU); setconstraint /
        # setmodel invalidate the cache
        ck = min(self.Nk, He)
        cache = getattr(self, "_fast_step_cache", None)
        if cache is not None and cache[0] == ck:
            _, A_rows, consts = cache
        else:
            b = {k: np.asarray(getattr(self, a), float) for k, a in
                 (("Xmin", "X_min"), ("Xmax", "X_max"), ("Wmin", "W_min"),
                  ("Wmax", "W_max"), ("Vmin", "V_min"), ("Vmax", "V_max"),
                  ("C_xmin", "C_xmin"), ("C_xmax", "C_xmax"),
                  ("C_wmin", "C_wmin"), ("C_wmax", "C_wmax"),
                  ("C_vmin", "C_vmin"), ("C_vmax", "C_vmax"))}
            if self.Nk < self.He:
                # END-align per-slot bounds (trunc_bounds,
                # mhe/execute.jl:572-580)
                shift = He - self.Nk
                roll = lambda v, slots, n: np.roll(
                    v.reshape(slots, n), -shift, axis=0).reshape(-1)
                for k, n, slots in (("Xmin", nx, He + 1),
                                    ("Xmax", nx, He + 1),
                                    ("Wmin", nx, He), ("Wmax", nx, He),
                                    ("Vmin", nym, He), ("Vmax", nym, He),
                                    ("C_xmin", nx, He + 1),
                                    ("C_xmax", nx, He + 1),
                                    ("C_wmin", nx, He), ("C_wmax", nx, He),
                                    ("C_vmin", nym, He),
                                    ("C_vmax", nym, He)):
                    b[k] = roll(b[k], slots, n)
            A_rows = mhe_fast.build_rows(mats, b["C_xmin"], b["C_xmax"],
                                         b["C_wmin"], b["C_wmax"],
                                         b["C_vmin"], b["C_vmax"])
            consts = dict(Su=mats["Su"], Sd=mats["Sd"], s1=mats["s1"],
                          Cm=mats["Cm"], Ddm=mats["Ddm"], Gy=mats["Gy"],
                          invR=np.asarray(self.invR, float),
                          Xmin=b["Xmin"], Xmax=b["Xmax"], Wmin=b["Wmin"],
                          Wmax=b["Wmax"], Vmin=b["Vmin"], Vmax=b["Vmax"])
            self._fast_step_cache = (ck, A_rows, consts)
        mask_w = (np.arange(He) < self.Nk).astype(float)
        P, Pinv = mhe_fast.build_step_qp(mats, mask_w, self.invP_arr,
                                         self.invQ, self.invR, self.Cwt)
        Y0m_nn = np.nan_to_num(self.Y0m_win)
        if self._y_fast is None:
            self._y_fast = np.zeros(A_rows.shape[0])
        else:
            for _ in range(min(self._moves_since_solve, He)):
                self._y_fast = np.asarray(
                    mhe_fast.shift_warm_duals(mats, self._y_fast, True))
        self._moves_since_solve = 0
        # ONE jitted call: assembly + GI solve + output rollout fused —
        # eager per-op assembly cost ~4 ms/step of pure dispatch on CPU
        Zd, Xd, Ymd, conv, y_new, q, r = self._fast_solve(
            consts, self.U0_win, self.D0_win, Y0m_nn, self.x_arr_prior,
            mask_w, np.asarray(self.invP_arr), P, Pinv, A_rows,
            self._y_fast)
        Z = np.asarray(Zd)
        ok = bool(conv) and np.all(np.isfinite(Z))
        if not ok:
            warnings.warn("MHE window solve failed; keeping the warm-start "
                          "solution (graceful degradation)")
            return
        self._y_fast = np.asarray(y_new)
        X = np.asarray(Xd)
        Ym = np.asarray(Ymd)
        if self.is_ms:
            # MS layout [ϵ; x̂arr; X̂; Ŵ]: the condensed solve returns the
            # SS-form [ϵ; x̂arr; Ŵ]; reinsert the (exactly eliminated) X̂
            # block from the rollout so general-path fallbacks and warm
            # shifts see a consistent MS warm start
            ne, nx_ = self.n_eps, self.nx_hat
            self.Z_tilde = np.concatenate([
                Z[:ne + nx_], X.reshape(-1), Z[ne + nx_:]])
        else:
            self.Z_tilde = Z.copy()
        idx = int(np.clip(self.Nk - 1, 0, He - 1))
        self.x0_hat = (X[idx] if self.Nk > 0
                       else Z[self.n_eps:self.n_eps + nx]).copy()
        # J = ½ZᵀPZ + qᵀZ + const, const = x̂priorᵀP̄⁻¹x̂prior + Σⱼ mⱼ rⱼᵀR̂⁻¹rⱼ
        rm = np.asarray(r).reshape(He, nym) * mask_w[:, None]
        J = (0.5 * Z @ P @ Z + np.asarray(q) @ Z
             + float(self.x_arr_prior @ self.invP_arr @ self.x_arr_prior)
             + float(np.sum((rm @ self.invR) * rm)))
        self._last = dict(J=float(J), X=X, Ym=Ym,
                          x_arr=Z[self.n_eps:self.n_eps + nx])

    def _solve_window(self):
        if self._fast_applicable():
            self._solve_window_fast()
            return
        p = self._windows_params()
        if self.Nk < self.He:
            # growing window: END-align the per-slot bound vectors so bound
            # slot He always corresponds to the current time (the reference's
            # trunc_bounds, mhe/execute.jl:572-580); out-of-window slots are
            # masked in the solver, so the wrapped tail is inert
            He, nx, nym = self.He, self.nx_hat, self.nym
            shift = He - self.Nk
            roll = lambda b, slots, n: np.roll(
                np.asarray(b).reshape(slots, n), -shift, axis=0).reshape(-1)
            for k, n, slots in (("Xmin", nx, He + 1), ("Xmax", nx, He + 1),
                                ("Wmin", nx, He), ("Wmax", nx, He),
                                ("Vmin", nym, He), ("Vmax", nym, He),
                                ("C_xmin", nx, He + 1), ("C_xmax", nx, He + 1),
                                ("C_wmin", nx, He), ("C_wmax", nx, He),
                                ("C_vmin", nym, He), ("C_vmax", nym, He)):
                p[k] = roll(p[k], slots, n)
        p = jax.device_put(p)  # one upload per solve
        Zt0 = jnp.asarray(self.Z_tilde)
        Zt, x_new, X, Ym, J, ok = self._solve_jit(p, Zt0)
        if not (bool(ok) and np.all(np.isfinite(np.asarray(x_new)))):
            warnings.warn("MHE window solve failed; keeping the warm-start "
                          "solution (graceful degradation)")
            Zt = Zt0
            x_new = self.x0_hat
        self.Z_tilde = np.array(Zt)   # writable copy (warm-start shifts mutate)
        self.x0_hat = np.array(x_new)
        self._last = dict(J=float(J), X=np.asarray(X), Ym=np.asarray(Ym),
                          x_arr=np.asarray(Zt[self.n_eps:self.n_eps + self.nx_hat]))

    # ------------------------------------------------------------------
    # reference protocol (mhe/execute.jl:44-84)
    def _add_data(self, y0m, d0, u0):
        """add_data_windows! (mhe/execute.jl:497-547): shift when full, then
        append (y, d, u, x̂0_old); returns True when the window is moving."""
        He = self.He
        if np.any(np.isnan(u0)):
            raise ValueError("manipulated input u contains NaN values")
        if np.any(np.isnan(d0)):
            raise ValueError("measured disturbance d contains NaN values")
        x0_old = self.x0_hat.copy()
        moving = (self.Nk + 1) > He
        if moving:
            self.Y0m_win[:-1] = self.Y0m_win[1:]
            self.U0_win[:-1] = self.U0_win[1:]
            self.D0_win[:-1] = self.D0_win[1:]   # He+1 slots; slot 0 = pre-window d
            self.X0_old_win[:-1] = self.X0_old_win[1:]
            self.Nk = He - 1
            # warm start: shift the window blocks one slot
            # (mhe/transcription.jl:936-1075)
            nx, ne, wo = self.nx_hat, self.n_eps, self._w_off
            Z = self.Z_tilde
            if self.is_ms:  # shift X̂0 block
                Z[ne + nx:ne + nx + (He - 1) * nx] = Z[ne + 2 * nx:ne + nx + He * nx]
            Z[wo:wo + (He - 1) * nx] = Z[wo + nx:]
            Z[wo + (He - 1) * nx:] = 0.0
            self._moves_since_solve += 1
        i = self.Nk
        self.Y0m_win[i] = y0m
        self.D0_win[i + 1] = d0
        self.U0_win[i] = u0
        self.X0_old_win[i] = x0_old
        self.Nk = i + 1
        self.x_arr_prior = self.X0_old_win[0].copy()
        if moving:
            self.Z_tilde[self.n_eps:self.n_eps + self.nx_hat] = self.x_arr_prior
        return moving

    def _P_arr_valid(self):
        """The stored P̄ must be finite and PD before it can be advanced
        (the reference's cholesky! throws on a corrupted P̄ and the previous
        covariance is retained, mhe/execute.jl:781-797)."""
        P = self.P_arr
        if not np.all(np.isfinite(P)):
            warnings.warn("Arrival covariance P̄ is not finite: keeping the "
                          "old one")
            return False
        if not np.all(np.linalg.eigvalsh(0.5 * (P + P.T)) > 0):
            warnings.warn("Arrival covariance P̄ is not positive definite: "
                          "keeping the old one")
            return False
        return True

    def _correct_cov(self):
        """correct_cov! (mhe/execute.jl:729-752): correct P̄ at the arrival
        with the oldest window data; the state is only a linearization point."""
        if not self._P_arr_valid():
            return
        ce = self.covestim
        ce.x0_hat = self.x_arr_prior.copy()
        ce.P_hat = self.P_arr.copy()
        y0m_arr, d0_arr = self.Y0m_win[0], self.D0_win[0]
        try:
            if not np.any(np.isnan(y0m_arr)):
                ce._correct(y0m_arr, d0_arr)
            self._accept_cov(ce.P_hat)
        except Exception:
            warnings.warn("MHE arrival covariance correction failed; keeping "
                          "the previous covariance")

    def _update_cov(self):
        """update_cov! (mhe/execute.jl:755-779): advance P̄ one step (predict
        only when direct — the correction was already done in _correct_cov)."""
        if not self._P_arr_valid():
            return
        ce = self.covestim
        ce.x0_hat = self.x_arr_prior.copy()
        ce.P_hat = self.P_arr.copy()
        u0_arr, y0m_arr, d0_arr = self.U0_win[0], self.Y0m_win[0], self.D0_win[0]
        try:
            if not self.direct and not np.any(np.isnan(y0m_arr)):
                ce._correct(y0m_arr, d0_arr)
            ce._predict(u0_arr, d0_arr)
            self._accept_cov(ce.P_hat)
        except Exception:
            warnings.warn("MHE arrival covariance update failed; keeping the "
                          "previous covariance")

    def _accept_cov(self, P_new):
        if np.all(np.isfinite(P_new)) and np.all(
                np.linalg.eigvalsh(0.5 * (P_new + P_new.T)) > 0):
            self.P_arr = 0.5 * (P_new + P_new.T)
            self.invP_arr = np.linalg.inv(self.P_arr)
        else:
            warnings.warn("Arrival covariance P̄ is not positive definite: "
                          "keeping the old one")

    def _correct(self, y0m, d0):
        if self.direct:
            moving = self._add_data(y0m, d0, self._pending_u0)
            if moving:
                self._correct_cov()
            self._solve_window()
        else:
            self._y0m_pending = np.asarray(y0m, float).copy()

    def _predict(self, u0, d0):
        if self.direct:
            if self.Nk == self.He:
                self._update_cov()
            self._pending_u0 = np.asarray(u0, float).copy()
        else:
            self._add_data(self._y0m_pending, d0, np.asarray(u0, float))
            self._solve_window()
            if self.Nk == self.He:
                self._update_cov()

    def initstate(self, u, ym, d=None):
        x = super().initstate(u, ym, d)
        self.Nk = 0
        self.Y0m_win[:] = np.nan
        self.U0_win[:] = 0.0
        self.D0_win[:] = 0.0
        if d is not None and self.model.nd:
            # seed the pre-window slot with d0(-1) (mhe/execute.jl:30)
            self.D0_win[0] = np.asarray(d, float) - self.model.dop
        self.X0_old_win[:] = 0.0
        self.Z_tilde[:] = 0.0
        self.x_arr_prior = self.x0_hat.copy()
        self.Z_tilde[self.n_eps:self.n_eps + self.nx_hat] = self.x0_hat
        self._pending_u0 = np.asarray(u, float) - self.model.uop
        self._y_fast = None
        self._moves_since_solve = 0
        return x

    def _update_model(self, model, Qhat, Rhat):
        """setmodel_estimator! for MHE (mhe/execute.jl:944-1050): re-augment,
        rebase every deviation-form window/warm-start/bound from the old
        operating points to the new ones, refresh the objective inverses,
        swap the nested covestim's model, and rebuild the jitted window
        solver (the old matrices were baked into the trace as constants)."""
        old = self.model
        uop_old, dop_old = old.uop.copy(), old.dop.copy()
        yopm_old = old.yop[np.asarray(self.i_ym, int)].copy()
        xop_hat_old = self.xop_hat.copy()
        super()._update_model(model, Qhat, Rhat)
        du = uop_old - model.uop
        dd = dop_old - model.dop
        dym = yopm_old - model.yop[np.asarray(self.i_ym, int)]
        dx = xop_hat_old - self.xop_hat
        He, ne, nx = self.He, self.n_eps, self.nx_hat
        self.Y0m_win += dym          # NaN slots stay NaN
        self.U0_win += du
        self.D0_win += dd
        self.X0_old_win += dx
        self.x_arr_prior = self.x_arr_prior + dx
        self.Z_tilde[ne:ne + nx] += dx
        if self.is_ms:               # shift the X̂0 window block too
            self.Z_tilde[ne + nx:ne + nx + He * nx] += np.tile(dx, He)
        self._pending_u0 = getattr(self, "_pending_u0",
                                   np.zeros(model.nu)) + du
        for attr in ("X_min", "X_max"):
            b = getattr(self, attr)
            b += np.tile(dx, He + 1)
            np.clip(b, -BIG, BIG, out=b)
        if Qhat is not None:
            self.invQ = np.linalg.inv(self.Q_hat)
        if Rhat is not None:
            self.invR = np.linalg.inv(self.R_hat)
        if self.covestim is not None and self.covestim is not self:
            self.covestim.setmodel(model, Qhat, Rhat)
        if not isinstance(model, LinModel):
            # NonLinModel f/h are baked into the trace; LinModel matrices
            # travel in the params dict, so no retrace is needed there
            self._solve_jit = self._make_solver()
        # fast-path prediction matrices bake the OLD Â/B̂/Ĉ — rebuild
        self._fast_mats = None
        self._fast_solve = None
        self._fast_step_cache = None
        self._y_fast = None

    def _init_cov(self):
        self.P_arr = self.P0_hat.copy()
        self.invP_arr = np.linalg.inv(self.P_arr)

    def _set_cov(self, P_hat):
        if P_hat.shape != (self.nx_hat, self.nx_hat):
            raise ValueError(f"P̂ size must be {(self.nx_hat, self.nx_hat)}")
        self.P_arr = P_hat
        self.invP_arr = np.linalg.inv(P_hat)

    def getinfo(self):
        info = {}
        ne, nx = self.n_eps, self.nx_hat
        Nk = self.Nk
        info["What"] = info["Ŵ"] = self.Z_tilde[self._w_off:][:nx * Nk]
        x_arr = self._last.get("x_arr", self.x_arr_prior)
        info["xbar"] = info["x̄"] = self.x_arr_prior - x_arr
        info["xhatarr"] = info["x̂arr"] = x_arr + self.xop_hat
        info["epsilon"] = info["ϵ"] = float(self.Z_tilde[0]) if ne else 0.0
        info["J"] = self._last.get("J")
        info["Xhat"] = info["X̂"] = self._last.get("X")
        info["xhat"] = info["x̂"] = self.x0_hat + self.xop_hat
        info["Pbar"] = info["P̄"] = self.P_arr
        info["Ym"] = self._last.get("Ym")
        info["U"] = self.U0_win[:Nk] + self.model.uop
        info["D"] = self.D0_win + self.model.dop
        info["Nk"] = Nk
        # full output predictions over the valid window slots
        X = self._last.get("X")
        if X is not None and Nk > 0:
            d_slots = self.D0_win[1:Nk + 1]
            Yh = np.stack([np.asarray(self.h_hat(X[j], d_slots[j]), float)
                           for j in range(Nk)]) + self.model.yop
            info["Yhat"] = info["Ŷ"] = Yh.reshape(-1)
            info["Yhatm"] = info["Ŷm"] = Yh[:, np.asarray(self.i_ym, int)
                                            ].reshape(-1)
        # sensor-noise estimates V̂ = ym − ŷm over the valid window slots
        # (reference getinfo :V̂, mhe/execute.jl:86-203)
        Ym_pred = self._last.get("Ym")
        if Ym_pred is not None:
            mask_w = np.arange(self.He) < self.Nk
            mask_v = mask_w[:, None] & np.isfinite(self.Y0m_win)
            V = np.where(mask_v, np.nan_to_num(self.Y0m_win) - Ym_pred, 0.0)
            info["Vhat"] = info["V̂"] = V[mask_w]
        # derivative dumps at the optimum (reference getinfo :∇J)
        try:
            import jax
            import jax.numpy as jnp
            p = jax.device_put(self._windows_params())  # one upload per solve
            g = jax.grad(lambda Zt: self._obj_fn(p, Zt))(jnp.asarray(self.Z_tilde))
            info["nablaJ"] = info["∇J"] = np.asarray(g)
        except Exception:
            pass
        # solution summary (the reference attaches JuMP.solution_summary)
        info["sol"] = dict(
            solver=("time-varying QP (GI active set, construct-time "
                    "prediction matrices)" if self._fast_applicable()
                    else "time-varying QP (ADMM)" if self._is_lin_qp()
                    else "GN-SQP (ADMM subproblems)"),
            objective=self._last.get("J"),
            window_fill=f"{Nk}/{self.He}",
            transcription=type(self.transcription).__name__,
            nZt=self.nZt)
        return info

    def _is_lin_qp(self):
        from ..models import LinModel
        return isinstance(self.model, LinModel)
