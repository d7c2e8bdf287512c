"""LinMPC — condensed-QP linear model predictive controller.

Reference: ``src/controller/linmpc.jl`` + the prediction-matrix engine
(``src/controller/transcription.jl``).  TPU-first design: everything
shape-dependent is precomputed at construction into a ``params`` pytree of
matrices; the per-step hot path is ONE jitted pure function (prediction
F/q̃ build → constraint RHS → warm start shift → batched ADMM QP → receding
input extraction).  ``setconstraint``/``setmodel`` only swap data in
``params`` — no retrace, no recompile, which is what makes
successive-linearization adaptive MPC cheap.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.config import jit32

from ..estimators import InternalModel, StateEstimator, SteadyKalmanFilter
from ..models import LinModel
from ..ops.qp import build_solver_cache, solve_qp
from ..ops.qp_active import solve_qp_active
from ..utils.config import BIG
from .base import PredictiveController, default_Hp, estimate_delays
from .construct import (ControllerWeights, init_quadprog, relax_DU,
                        relax_terminal, relax_U, relax_Y)
from .transcription import (MultipleShooting, SingleShooting,
                            TranscriptionMethod, init_defectmat, init_predmat,
                            init_ZtoDU, init_ZtoU, move_blocking)


def _clipinf(v):
    return np.clip(np.nan_to_num(v, nan=0.0, posinf=BIG, neginf=-BIG), -BIG, BIG)


class LinMPC(PredictiveController):
    def __init__(self, model_or_estim, Hp=None, Hc=2,
                 Mwt=None, Nwt=None, Lwt=None, M_Hp=None, N_Hc=None, L_Hp=None,
                 Cwt=1e5, transcription: TranscriptionMethod | None = None,
                 Wy=None, Wu=None, Wd=None, Wr=None,
                 optim=None, dtype=None, qp_solver="admm",
                 gi_max_active=None,
                 limit_solve_time=False, **estim_kwargs):
        # dtype=jnp.float32 runs the jitted step in TPU-native f32 (construct
        # math stays f64 on host); None inherits the jax default (x64-aware).
        # f32 matches f64 traces ~1e-5 on well-conditioned weights; weakly
        # weighted directions (e.g. Mwt entries of 0) may drift O(1) along
        # the QP's flat valley while still tracking and respecting bounds
        self._dt = dtype
        if isinstance(model_or_estim, StateEstimator):
            estim = model_or_estim
            model = estim.model
            if not isinstance(model, LinModel):
                raise TypeError("estim.model type must be a LinModel")
        else:
            model = model_or_estim
            if not isinstance(model, LinModel):
                raise TypeError("model type must be a LinModel")
            estim = SteadyKalmanFilter(model, **estim_kwargs)
        self.estim = estim
        self.transcription = transcription or SingleShooting()
        if not isinstance(self.transcription, (SingleShooting, MultipleShooting)):
            # reference restricts LinMPC to SS/MS (src/controller/linmpc.jl:244);
            # collocation defect rows are inconsistent with the condensed QP
            raise ValueError(
                "LinMPC only supports SingleShooting and MultipleShooting "
                f"transcriptions, got {type(self.transcription).__name__}; "
                "use NonLinMPC for collocation methods")
        if qp_solver not in ("admm", "active_set"):
            raise ValueError("qp_solver must be 'admm' or 'active_set'")
        # (both solvers support MultipleShooting: the defect equalities are
        # eliminated at construct time via QR nullspace, see _build)
        self.qp_solver = qp_solver
        # GI slot-buffer cap (ops/qp_active.py max_active): the lockstep
        # fleet's bandwidth bill is the (B, slots, slots) f64 Ginv table;
        # capping at the expected active-set size is a large win, and lanes
        # whose true active set overflows report converged=False
        self.gi_max_active = (None if gi_max_active is None
                              else int(gi_max_active))
        Hp = default_Hp(model) if Hp is None else int(Hp)
        nk_delays = estimate_delays(model)
        if Hp <= nk_delays:
            import warnings
            warnings.warn(f"prediction horizon Hp ({Hp}) <= estimated number "
                          f"of delays in model ({nk_delays}), the closed-loop "
                          "system may be unstable or zero-gain (unresponsive)")
        nb = move_blocking(Hp, Hc)
        Hc = len(nb)
        self.Hp, self.Hc, self.nb = Hp, Hc, nb
        nu, ny, nd, nx_hat = model.nu, model.ny, model.nd, estim.nx_hat
        self.weights = ControllerWeights(nu, ny, Hp, Hc, Mwt, Nwt, Lwt,
                                         M_Hp, N_Hc, L_Hp, Cwt)
        self.n_eps = self.weights.n_eps
        # custom linear constraints W (construct.jl:665-695, relaxW :1085-1160)
        self.Wy, self.Wu, self.Wd, self.Wr, self.nw = _validate_custom_lincon(
            model, Wy, Wu, Wd, Wr)
        self.optim_kwargs = optim or {}
        # Ts-deadline solve policy (the reference caps every solve at the
        # sampling time, limit_solve_time ∈ general.jl:109-121): when
        # enabled, the ADMM iteration budget for the NEXT period is derived
        # from Ts and an EWMA of the measured per-iteration wall cost, and
        # a finished step that overran Ts raises the `deadline_miss` flag
        # in getinfo.  Opt-in: iteration budgets only bind on a saturated
        # real-time host, and the flag is the honest signal either way.
        self.limit_solve_time = bool(limit_solve_time)
        self._iter_cost = None      # EWMA seconds per ADMM iteration
        self._deadline_miss = False
        self._solve_time = None
        self._build(rebuild_weights=False)
        # runtime state
        self.Uop = np.tile(model.uop, Hp)
        self.Yop = np.tile(model.yop, Hp)
        self.Dop = np.tile(model.dop, Hp)
        self.Z_tilde = np.zeros(self.nZt)
        self.y_dual = np.zeros(self.A_stack.shape[0])
        self.rho_rung = 4      # ρ-ladder rung, carried across periods
        self.lastu0 = np.zeros(nu)
        self.d0 = np.zeros(nd)
        self.D_hat_0 = np.zeros(nd * Hp)
        self.R_hat_y = np.tile(model.yop, Hp)
        self.R_hat_u = self.Uop.copy()
        self.ry = model.yop.copy()
        self._last = {}

    # ------------------------------------------------------------------
    def _build(self, rebuild_weights=True):
        """(Re)build all construct-time matrices into self.params."""
        model, estim = self.estim.model, self.estim
        Hp, Hc, nb = self.Hp, self.Hc, self.nb
        nu, ny, nd, nx_hat = model.nu, model.ny, model.nd, estim.nx_hat
        tr = self.transcription
        n_eps = self.n_eps
        if isinstance(estim, InternalModel):
            A_hat, Bu_hat, C_hat = model.A, model.Bu, model.C
            Bd_hat, Dd_hat = model.Bd, model.Dd
            xop_hat, fop_hat = model.xop, model.fop
        else:
            A_hat, Bu_hat, C_hat = estim.A_hat, estim.Bu_hat, estim.C_hat
            Bd_hat, Dd_hat = estim.Bd_hat, estim.Dd_hat
            xop_hat, fop_hat = estim.xop_hat, estim.fop_hat
        (E, G, J, K, V, B, ex, gx, jx, kx, vx, bx) = init_predmat(
            tr, A_hat, Bu_hat, C_hat, Bd_hat, Dd_hat, xop_hat, fop_hat, Hp, Hc, nb)
        ES, GS, JS, KS, VS, BS = init_defectmat(
            tr, A_hat, Bu_hat, Bd_hat, xop_hat, fop_hat, Hp, Hc, nb)
        PDu = init_ZtoDU(tr, nu, nx_hat, Hp, Hc)
        Pu, Tu = init_ZtoU(tr, nu, nx_hat, Hp, Hc, nb)
        nZ = tr.nZ(nu, nx_hat, Hp, Hc)
        self.nZ = nZ
        self.nZt = nZ + n_eps
        # softness parameters (defaults: hard u/Δu, soft y/terminal)
        if not hasattr(self, "C_umin"):
            self.C_umin = np.zeros(nu * Hp)
            self.C_umax = np.zeros(nu * Hp)
            self.C_dumin = np.zeros(nu * Hc)
            self.C_dumax = np.zeros(nu * Hc)
            self.C_ymin = np.ones(ny * Hp)
            self.C_ymax = np.ones(ny * Hp)
            self.c_xmin = np.ones(nx_hat)
            self.c_xmax = np.ones(nx_hat)
        A_Umin, A_Umax, Pu_t = relax_U(Pu, self.C_umin, self.C_umax, n_eps)
        A_DUmin, A_DUmax, PDu_t = relax_DU(PDu, self.C_dumin, self.C_dumax, n_eps)
        A_Ymin, A_Ymax, E_t = relax_Y(E, self.C_ymin, self.C_ymax, n_eps)
        A_xmin, A_xmax, ex_t = relax_terminal(ex, self.c_xmin, self.c_xmax, n_eps)
        # custom linear constraints: W = Ew Z + Fw (relaxW, construct.jl:1085-1160)
        nw = self.nw
        nW = nw * (Hp + 1)
        from ..utils.linalg import repeatdiag
        Wy_bar = repeatdiag(self.Wy, Hp + 1) if nw else np.zeros((0, (Hp + 1) * ny))
        Wu_bar = repeatdiag(self.Wu, Hp + 1) if nw else np.zeros((0, (Hp + 1) * nu))
        Wd_bar = repeatdiag(self.Wd, Hp + 1) if nw else np.zeros((0, (Hp + 1) * nd))
        Wr_bar = repeatdiag(self.Wr, Hp + 1) if nw else np.zeros((0, (Hp + 1) * ny))
        if nw:
            Ew = (Wy_bar @ np.vstack([np.zeros((ny, E.shape[1])), E])
                  + Wu_bar @ np.vstack([Pu, Pu[-nu:, :]]))
            if not hasattr(self, "C_wmin"):
                self.C_wmin = np.ones(nW)
                self.C_wmax = np.ones(nW)
                self.Wmin_b = np.full(nW, -BIG)
                self.Wmax_b = np.full(nW, BIG)
            if n_eps:
                A_Wmin = -np.hstack([Ew, self.C_wmin[:, None]])
                A_Wmax = np.hstack([Ew, -self.C_wmax[:, None]])
            else:
                A_Wmin, A_Wmax = -Ew, Ew
        else:
            self.C_wmin = np.zeros(0)
            self.C_wmax = np.zeros(0)
            self.Wmin_b = np.zeros(0)
            self.Wmax_b = np.zeros(0)
            A_Wmin = np.zeros((0, self.nZt))
            A_Wmax = np.zeros((0, self.nZt))
        if n_eps:
            ES_t = np.hstack([ES, np.zeros((ES.shape[0], 1))])
        else:
            ES_t = ES
        H = init_quadprog(E_t, PDu_t, Pu_t, self.weights,
                          single_shooting=isinstance(tr, SingleShooting))
        # one-sided inequality row stack (order = linconstraint! b layout,
        # controller/transcription.jl:824-842) + ϵ ≥ 0 + equality rows
        rows = [A_Umin, A_Umax, A_DUmin, A_DUmax, A_Ymin, A_Ymax,
                A_Wmin, A_Wmax, A_xmin, A_xmax]
        A_ineq = np.vstack(rows)
        self._blk = np.cumsum([0] + [r.shape[0] for r in rows])
        if n_eps:
            eps_row = np.zeros((1, self.nZt))
            eps_row[0, -1] = 1.0
        else:
            eps_row = np.zeros((0, self.nZt))
        self.A_stack = np.vstack([A_ineq, eps_row, ES_t])
        self.n_ineq = A_ineq.shape[0]
        self.n_eq = ES_t.shape[0]
        # --- construct-time equality elimination (MultipleShooting) -------
        # The MS defect rows ES̃ Z̃ = beq are LINEAR for a LinModel, so they
        # are eliminated here via a QR nullspace (Z̃ = Z̃p + N v, ES̃ N = 0):
        # the QP the device solves has SingleShooting SIZE and the
        # conditioning of an ORTHONORMAL basis (better than the Â-power
        # stack), while the sparse MS form is used only at construct time.
        # This is the TPU answer to the reference's sparse-KKT long-horizon
        # remedy (transcription.jl:56-119 + OSQP's f64 sparse factorization):
        # TPU f32 ADMM on the equality-heavy MS rows hits an arithmetic
        # floor (PARITY.md round-2 horizon study); the reduced form removes
        # the equality rows from the iteration entirely.  Equalities are
        # satisfied to assembly precision by construction (Z̃p = ES̃⁺ beq).
        self.elim_eq = self.n_eq > 0
        if self.elim_eq:
            Q, R = np.linalg.qr(ES_t.T, mode="complete")
            N = Q[:, self.n_eq:]                     # orthonormal null basis
            Aeq_dag = Q[:, :self.n_eq] @ np.linalg.inv(R[:self.n_eq, :]).T
            A_ie = np.vstack([A_ineq, eps_row])      # rows kept in the QP
            self._elim = dict(Nnull=N, Aeq_dag=Aeq_dag, NTH=N.T @ H,
                              H_r=N.T @ H @ N, A_r=A_ie @ N)
        else:
            self._elim = {}
        # size of the QP the device actually solves (post-elimination)
        self.n_qp = self.nZt - self.n_eq if self.elim_eq else self.nZt
        # GI slot-buffer size: capped by gi_max_active when set
        self.gi_slots = (self.n_qp if self.gi_max_active is None
                         else min(self.n_qp, self.gi_max_active))
        # default bounds (deviation form), kept as data
        if not hasattr(self, "U0min"):
            self.U0min = np.full(nu * Hp, -BIG)
            self.U0max = np.full(nu * Hp, BIG)
            self.DUmin = np.full(nu * Hc, -BIG)
            self.DUmax = np.full(nu * Hc, BIG)
            self.Y0min = np.full(ny * Hp, -BIG)
            self.Y0max = np.full(ny * Hp, BIG)
            self.x0min = np.full(nx_hat, -BIG)
            self.x0max = np.full(nx_hat, BIG)
        # stochastic prediction (InternalModel only)
        if isinstance(estim, InternalModel):
            Ks_l, Ps_l = _init_stochpred(estim, Hp)
        else:
            Ks_l = np.zeros((ny * Hp, getattr(estim, "nxs", 0)))
            Ps_l = np.zeros((ny * Hp, ny))
        # bumped on every params mutation; moveinput caches the uploaded tree
        self._params_version = getattr(self, "_params_version", 0) + 1
        self.params = dict(
            H=H, E_t=E_t, G=G, J=J, K=K, V=V, B=B,
            gx=gx, jx=jx, kx=kx, vx=vx, bx=bx,
            GS=GS, JS=JS, KS=KS, VS=VS, BS=BS,
            Pu_t=Pu_t, PDu_t=PDu_t, Tu=Tu,
            A_stack=self.A_stack,
            M_Hp=self.weights.M_Hp, L_Hp=self.weights.L_Hp,
            Uop=np.tile(model.uop, Hp), Yop=np.tile(model.yop, Hp),
            U0min=self.U0min, U0max=self.U0max,
            DUmin=self.DUmin, DUmax=self.DUmax,
            Y0min=self.Y0min, Y0max=self.Y0max,
            x0min=self.x0min, x0max=self.x0max,
            C_umin_u=self.C_umin[:nu], C_umax_u=self.C_umax[:nu],
            Ks=Ks_l, Ps=Ps_l, ex_t=ex_t,
            Wy_bar=Wy_bar, Wu_bar=Wu_bar, Wd_bar=Wd_bar, Wr_bar=Wr_bar,
            Wmin_b=self.Wmin_b, Wmax_b=self.Wmax_b,
            dop_w=model.dop, Dop_w=np.tile(model.dop, Hp),
            **self._elim,
        )
        self._rebuild_qp_cache()
        # (re)create the jitted step only when the shapes changed — setmodel
        # swaps data every control period in successive-linearization MPC and
        # must NOT trigger a retrace (a silent 1000× slowdown otherwise)
        shape_key = (nu, self.Hc, nd, self.n_eps, self.nZ, tuple(self._blk),
                     self.n_ineq, self.n_eq, self.nw, Hp, ny,
                     isinstance(self.transcription, MultipleShooting),
                     self.estim.nx_hat, self.qp_solver, self.gi_max_active)
        if getattr(self, "_step_shape_key", None) != shape_key:
            self._step_raw = _build_step(
                nu, self.Hc, nd, self.n_eps, self.nZ, self._blk, self.n_ineq,
                self.n_eq, isinstance(self.transcription, MultipleShooting),
                self.estim.nx_hat, self.nw, Hp, model.ny,
                qp_solver=self.qp_solver, gi_max_active=self.gi_max_active)
            self._step = jit32(self._step_raw)
            self._step_shape_key = shape_key
        # GI cross-period operator state: valid only for the CURRENT (H, A)
        # — any rebuild resets it (fresh empty active set)
        if self.qp_solver == "active_set":
            from ..ops.qp_active import gi_state_init
            self._qp_state = gi_state_init(
                self.gi_slots, like=np.float32 if self._dt is not None and
                np.dtype(self._dt) == np.float32 else np.float64)
        else:
            self._qp_state = None
        self._rung_dev = None       # re-upload the rung seed after rebuilds
        self._solved_once = False

    # ------------------------------------------------------------------
    def _rebuild_qp_cache(self):
        """Step-invariant ADMM setup (Ruiz diagonals + ρ-ladder inverses)
        for the current (H̃, A_stack) and bound classification — built
        host-side in f64 (ops.qp.build_solver_cache) and shipped inside the
        params tree, so per-period solves skip the whole in-solve setup.
        Row classes follow the A_stack layout in _build; they only change
        when a bound crosses ±BIG, which re-enters here via setconstraint.

        With equality elimination (MultipleShooting) the caches are built on
        the REDUCED problem (H_r, A_r) — SS-sized, inequality-only."""
        if getattr(self, "elim_eq", False):
            Hm, Am = self.params["H_r"], self.params["A_r"]
        else:
            Hm, Am = self.params["H"], self.A_stack
        if self.qp_solver != "admm":
            # GI active set: only P⁻¹-derived tables are step-invariant
            from ..ops.qp_active import build_gi_cache
            self.params.update(build_gi_cache(Hm, Am))
            return
        TH = 1e18   # ops.qp._BIG: rows at/beyond this are "infinite"
        loose = np.concatenate([
            self.U0min <= -TH, self.U0max >= TH,
            self.DUmin <= -TH, self.DUmax >= TH,
            self.Y0min <= -TH, self.Y0max >= TH,
            self.Wmin_b <= -TH, self.Wmax_b >= TH,
            self.x0min <= -TH, self.x0max >= TH,
            np.zeros(self.n_eps, bool)])
        if not getattr(self, "elim_eq", False):
            loose = np.concatenate([loose, np.zeros(self.n_eq, bool)])
        eq = np.zeros(Am.shape[0], bool)
        if self.n_eq and not getattr(self, "elim_eq", False):
            eq[-self.n_eq:] = True
        self.params.update(build_solver_cache(Hm, Am, eq, loose))

    # ------------------------------------------------------------------
    def setconstraint(self, **kw):
        """Set bound constraints (setconstraint!, construct.jl:324-559).

        Keywords: umin/umax, Δumin (dumin)/Δumax (dumax), ymin/ymax,
        x̂min (xhatmin)/x̂max (xhatmax); capitalized versions (Umin, Ymax, …)
        for full-horizon time-varying bounds; c_* / C_* softness weights
        (before first solve only).
        """
        model, estim = self.estim.model, self.estim
        nu, ny, nx_hat = model.nu, model.ny, estim.nx_hat
        Hp, Hc = self.Hp, self.Hc
        g = kw.get

        def pick(small, cap, n, rep):
            v = g(cap)
            if v is not None:
                v = np.asarray(v, float).ravel()
                if v.shape != (n * rep,):
                    raise ValueError(f"{cap} size must be ({n * rep},)")
                return v
            v = g(small)
            if v is not None:
                v = np.asarray(v, float).ravel()
                if v.shape != (n,):
                    raise ValueError(f"{small} size must be ({n},)")
                return np.tile(v, rep)
            return None

        v = pick("umin", "Umin", nu, Hp)
        if v is not None:
            self.U0min[:] = _clipinf(v - self.Uop)
        v = pick("umax", "Umax", nu, Hp)
        if v is not None:
            self.U0max[:] = _clipinf(v - self.Uop)
        v = pick("dumin", "DUmin", nu, Hc) if "dumin" in kw or "DUmin" in kw else \
            pick("Deltaumin", "DeltaUmin", nu, Hc)
        if v is not None:
            self.DUmin[:] = _clipinf(v)
        v = pick("dumax", "DUmax", nu, Hc) if "dumax" in kw or "DUmax" in kw else \
            pick("Deltaumax", "DeltaUmax", nu, Hc)
        if v is not None:
            self.DUmax[:] = _clipinf(v)
        v = pick("ymin", "Ymin", ny, Hp)
        if v is not None:
            self.Y0min[:] = _clipinf(v - self.Yop)
        v = pick("ymax", "Ymax", ny, Hp)
        if v is not None:
            self.Y0max[:] = _clipinf(v - self.Yop)
        for kws, attr in (("xhatmin", "x0min"), ("xhatmax", "x0max")):
            v = g(kws)
            if v is not None:
                v = np.asarray(v, float).ravel()
                if v.shape != (nx_hat,):
                    raise ValueError(f"{kws} size must be ({nx_hat},)")
                getattr(self, attr)[:] = _clipinf(v - estim.xop_hat)
        # custom linear constraint bounds (nw rows per step over Hp+1)
        if self.nw:
            v = pick("wmin", "Wmin", self.nw, Hp + 1)
            if v is not None:
                self.Wmin_b[:] = _clipinf(v)
            v = pick("wmax", "Wmax", self.nw, Hp + 1)
            if v is not None:
                self.Wmax_b[:] = _clipinf(v)
        # softness updates rebuild the A matrices (construct-time only)
        soft = {k: v for k, v in kw.items() if k.startswith("c_") or k.startswith("C_")}
        if soft:
            if self.n_eps != 1:
                raise ValueError("Slack variable weight Cwt must be finite to set "
                                 "softness parameters")
            if self._solved_once:
                raise RuntimeError("Cannot set softness parameters after calling "
                                   "moveinput")
            m = {"c_umin": ("C_umin", nu, Hp), "c_umax": ("C_umax", nu, Hp),
                 "c_dumin": ("C_dumin", nu, Hc), "c_dumax": ("C_dumax", nu, Hc),
                 "c_Deltaumin": ("C_dumin", nu, Hc), "c_Deltaumax": ("C_dumax", nu, Hc),
                 "c_ymin": ("C_ymin", ny, Hp), "c_ymax": ("C_ymax", ny, Hp),
                 "c_xhatmin": ("c_xmin", nx_hat, 1), "c_xhatmax": ("c_xmax", nx_hat, 1)}
            for k, v in soft.items():
                key = k if k.startswith("c_") else "c_" + k[2:].lower()
                if key not in m:
                    raise ValueError(f"unknown softness parameter {k}")
                attr, n, rep = m[key]
                v = np.asarray(v, float).ravel()
                if np.any(v < 0):
                    raise ValueError(f"{k} weights should be non-negative")
                vv = np.tile(v, rep) if v.shape == (n,) else v
                if vv.shape != (n * rep,):
                    raise ValueError(f"{k} size must be ({n},) or ({n * rep},)")
                setattr(self, attr, vv)
            self._build()
        else:
            for name in ("U0min", "U0max", "DUmin", "DUmax", "Y0min", "Y0max",
                         "x0min", "x0max", "Wmin_b", "Wmax_b"):
                self.params[name] = getattr(self, name)
            # a bound crossing ±BIG changes the ADMM row classification
            # (and with it the cached ρ-ladder) — rebuild the cache
            self._rebuild_qp_cache()
            self._params_version += 1
        return self

    # ------------------------------------------------------------------
    def setmodel(self, model=None, Mwt=None, Nwt=None, Lwt=None, **cov):
        """Hot-swap the plant model / weights (execute.jl:579-799): rebuilds
        all prediction and constraint matrices with unchanged shapes."""
        if model is not None:
            old = self.estim.model
            if (model.nu, model.nx, model.ny, model.nd) != (old.nu, old.nx, old.ny, old.nd):
                raise ValueError("new model must have the same dimensions")
            # convert runtime bound data to absolute, re-derive with new ops
            Umin = self.U0min + self.Uop
            Umax = self.U0max + self.Uop
            Ymin = self.Y0min + self.Yop
            Ymax = self.Y0max + self.Yop
            xmin = self.x0min + self.estim.xop_hat
            xmax = self.x0max + self.estim.xop_hat
            lastu_abs = self.lastu0 + old.uop  # rebase below with the new uop
            _setmodel_estimator(self.estim, model, **cov)
            self.Uop = np.tile(model.uop, self.Hp)
            self.Yop = np.tile(model.yop, self.Hp)
            self.Dop = np.tile(model.dop, self.Hp)
            self.U0min[:] = _clipinf(Umin - self.Uop)
            self.U0max[:] = _clipinf(Umax - self.Uop)
            self.Y0min[:] = _clipinf(Ymin - self.Yop)
            self.Y0max[:] = _clipinf(Ymax - self.Yop)
            self.x0min[:] = _clipinf(xmin - self.estim.xop_hat)
            self.x0max[:] = _clipinf(xmax - self.estim.xop_hat)
            self.lastu0 = lastu_abs - model.uop
        if Mwt is not None or Nwt is not None or Lwt is not None:
            w = self.weights
            model_ = self.estim.model
            self.weights = ControllerWeights(
                model_.nu, model_.ny, self.Hp, self.Hc,
                Mwt if Mwt is not None else np.diag(w.M_Hp)[:model_.ny],
                Nwt if Nwt is not None else np.diag(w.N_Hc)[:model_.nu],
                Lwt if Lwt is not None else np.diag(w.L_Hp)[:model_.nu],
                Cwt=w.Cwt)
        self._build()
        return self

    # ------------------------------------------------------------------
    def moveinput(self, ry=None, d=None, D_hat=None, R_hat_y=None,
                  R_hat_u=None, lastu=None, Dhat=None, Rhaty=None, Rhatu=None):
        """Solve the MPC problem, return u(k) (execute.jl:59-80)."""
        estim, model = self.estim, self.estim.model
        if estim.direct and not estim.prepared:
            import warnings
            warnings.warn("preparestate should be called before moveinput with "
                          "current estimators")
        D_hat = D_hat if D_hat is not None else Dhat
        R_hat_y = R_hat_y if R_hat_y is not None else Rhaty
        R_hat_u = R_hat_u if R_hat_u is not None else Rhatu
        ry, d, D_hat, R_hat_y, R_hat_u, lastu = self._prepare_args(
            ry, d, D_hat, R_hat_y, R_hat_u, lastu)
        self.lastu0 = lastu - model.uop
        self.d0 = d - model.dop
        self.D_hat_0 = D_hat - self.Dop
        self.ry, self.R_hat_y, self.R_hat_u = ry, R_hat_y, R_hat_u
        # stochastic prediction inputs (InternalModel)
        if isinstance(estim, InternalModel):
            xs_hat, ys_full = estim.xs_hat, estim.ys_hat
        else:
            xs_hat = np.zeros(self.params["Ks"].shape[1])
            ys_full = np.zeros(model.ny)
        if self.nw:
            y_now = np.asarray(estim.evaloutput(d if model.nd else None), float)
        else:
            y_now = np.zeros(model.ny)
        if getattr(self, "_p_ver", None) != self._params_version:
            # one device_put per params version, not ~40 eager uploads/step
            dtc = self._dt
            cast = (lambda a: a.astype(dtc) if dtc is not None and
                    np.issubdtype(a.dtype, np.floating) else a)
            self._p_cache = jax.device_put(
                {k: cast(np.asarray(v)) for k, v in self.params.items()})
            self._p_ver = self._params_version
        p = self._p_cache
        ja = (lambda a: jnp.asarray(a, self._dt)) if self._dt is not None \
            else jnp.asarray
        # Ts-deadline iteration budget for THIS solve, from the measured
        # per-iteration cost (floor of 50: the budget must never forbid the
        # warm-started typical case); 2**30 = "unlimited" keeps one trace
        if self.limit_solve_time and self._iter_cost:
            Ts = model.Ts
            budget = int(np.clip(0.8 * Ts / self._iter_cost, 50, 2**30))
        else:
            budget = 2**30
        # device scalars cached across periods (each per-step jnp.asarray
        # of a host scalar costs one tunnel round trip): the rung carries
        # as the device handle the step returned; the budget re-ships only
        # when its value changes
        if getattr(self, "_budget_dev", (None,))[0] != budget:
            self._budget_dev = (budget, jax.device_put(
                np.asarray(budget, np.int32)))
        if getattr(self, "_rung_dev", None) is None:
            self._rung_dev = jax.device_put(
                np.asarray(self.rho_rung, np.int32))
        import time as _time
        t0_solve = _time.perf_counter()
        out = self._step(p, ja(estim.x0_hat), ja(self.lastu0),
                         ja(self.d0), ja(self.D_hat_0),
                         ja(R_hat_y), ja(R_hat_u),
                         ja(xs_hat), ja(ys_full),
                         ja(self.Z_tilde), ja(self.y_dual),
                         ja(ry), ja(y_now),
                         self._rung_dev,
                         self._budget_dev[1],
                         self._qp_state)
        u, Z_t, y_dual, converged, F, obj, iters, rung, qp_state = out
        self._qp_state = qp_state
        self._rung_dev = rung       # device handle, no host sync
        u = np.asarray(u)           # blocks: honest wall-clock for the solve
        wall = _time.perf_counter() - t0_solve
        self.lastu0_at_solve = self.lastu0.copy()
        self.Z_tilde = np.asarray(Z_t)
        self.y_dual = np.asarray(y_dual)
        it = int(iters)
        if self._solved_once and it > 0:
            # EWMA of seconds/iteration, measured on warm (post-compile)
            # steps only; the first call includes the jit compile
            c = wall / it
            self._iter_cost = c if self._iter_cost is None else \
                0.7 * self._iter_cost + 0.3 * c
        self._solve_time = wall
        self._deadline_miss = bool(self.limit_solve_time
                                   and self._solved_once
                                   and wall > model.Ts)
        self._last = dict(F=np.asarray(F), converged=bool(converged),
                          obj=float(obj), d=d, D_hat=D_hat,
                          iters=it, iter_budget=budget,
                          x0_hat=estim.x0_hat.copy())
        self._solved_once = True
        if not self._last["converged"]:
            import logging
            import warnings
            warnings.warn("MPC solver did not converge; applying shifted warm "
                          "start (graceful degradation)")
            from .base import info2debugstr
            logging.getLogger("mpc_tpu").debug(info2debugstr(self.getinfo()))
        self.lastu0 = u - model.uop
        return u

    # ------------------------------------------------------------------
    def getinfo(self):
        """Optimum diagnostics (execute.jl:145-198)."""
        model, estim = self.estim.model, self.estim
        nu, ny = model.nu, model.ny
        Z_t = self.Z_tilde
        info = {}
        eps = float(Z_t[-1]) if self.n_eps else 0.0
        DU = Z_t[:nu * self.Hc]
        lastu0 = getattr(self, "lastu0_at_solve", self.lastu0)
        U0 = self.params["Pu_t"] @ Z_t + self.params["Tu"] @ lastu0
        Y0 = self.params["E_t"] @ Z_t + self._last["F"]
        info["DeltaU"] = info["ΔU"] = np.asarray(DU)
        info["epsilon"] = info["ϵ"] = eps
        info["J"] = self._last["obj"]
        info["U"] = np.asarray(U0) + self.Uop
        info["u"] = info["U"][:nu]
        info["d"] = self._last.get("d")
        info["Dhat"] = info["D̂"] = self._last.get("D_hat")
        info["xhat"] = info["x̂"] = estim.x0_hat + estim.xop_hat
        info["Yhat"] = info["Ŷ"] = np.asarray(Y0) + self.Yop
        info["Rhaty"] = info["R̂y"] = self.R_hat_y
        info["Rhatu"] = info["R̂u"] = self.R_hat_u
        info["lastu"] = lastu0 + model.uop
        # current output estimate ŷ and stochastic predictions Ŷs
        # (execute.jl:179-182)
        d_now = self._last.get("d")
        info["yhat"] = info["ŷ"] = np.asarray(
            estim.evaloutput(d_now if model.nd else None), float)
        if isinstance(estim, InternalModel):
            info["Yhats"] = info["Ŷs"] = np.asarray(
                self.params["Ks"] @ estim.xs_hat
                + self.params["Ps"] @ estim.ys_hat)
        else:
            info["Yhats"] = info["Ŷs"] = np.zeros(ny * self.Hp)
        # terminal state x̂(k+Hp) = ẽx̂ Z̃ + fx̂ (linconstraint!, :806-821)
        x0s = self._last.get("x0_hat")
        if x0s is not None:
            p = self.params
            fx = p["bx"] + p["kx"] @ x0s + p["vx"] @ lastu0
            if model.nd:
                fx = fx + p["gx"] @ self.d0 + p["jx"] @ self.D_hat_0
            info["xhatend"] = info["x̂end"] = (
                np.asarray(p["ex_t"]) @ Z_t + fx + estim.xop_hat)
        info["converged"] = self._last["converged"]
        # QP iteration count (the reference's solution_summary carries the
        # solver's iteration statistics, controller/execute.jl:145-198)
        info["iters"] = self._last.get("iters")
        # Ts-deadline policy diagnostics (the limit_solve_time analogue,
        # general.jl:109-121): solve wall time, the iteration budget the
        # policy derived for this solve, and whether the deadline was missed
        info["solve_time"] = self._solve_time
        info["iter_budget"] = self._last.get("iter_budget")
        info["deadline_miss"] = self._deadline_miss
        return info

    def __repr__(self):
        model = self.estim.model
        return (f"{type(self).__name__} controller with a sample time Ts = "
                f"{model.Ts} s:\n"
                f"├ estimator: {type(self.estim).__name__}\n"
                f"├ model: {type(model).__name__}\n"
                f"├ optimizer: ADMM-QP (jax)\n"
                f"├ transcription: {type(self.transcription).__name__}\n"
                f"└ dimensions: Hp={self.Hp}, Hc={self.Hc}, nu={model.nu}, "
                f"nx̂={self.estim.nx_hat}, nym={self.estim.nym}, nd={model.nd}, "
                f"nZ̃={self.nZt}")


def _validate_custom_lincon(model, Wy, Wu, Wd, Wr):
    """Validate W matrices (construct.jl:665-695); None → zero matrices."""
    nu, nd, ny = model.nu, model.nd, model.ny
    nw = 0
    for M in (Wy, Wu, Wd, Wr):
        if M is not None:
            nw = np.atleast_2d(np.asarray(M, float)).shape[0]
            break
    def pad(M, ncols, name):
        if M is None:
            return np.zeros((nw, ncols))
        M = np.atleast_2d(np.asarray(M, float))
        if M.shape != (nw, ncols):
            raise ValueError(f"{name} must have shape ({nw}, {ncols})")
        return M
    return (pad(Wy, ny, "Wy"), pad(Wu, nu, "Wu"), pad(Wd, nd, "Wd"),
            pad(Wr, ny, "Wr"), nw)


def _init_stochpred(estim: InternalModel, Hp):
    """Ks, Ps: Ŷs = Ks x̂s + Ps ŷs, all-output form (construct.jl:1236-1267)."""
    As, Bs_hat, Cs = estim.As, estim.Bs_hat, estim.Cs
    ny = estim.model.ny
    nxs = estim.nxs
    Ks = np.zeros((ny * Hp, nxs))
    Ps = np.zeros((ny * Hp, ny))
    Apow = np.eye(nxs)
    for i in range(1, Hp + 1):
        Ms = Cs @ Apow @ Bs_hat          # Cs As^(i-1) B̂s
        rows = slice(ny * (i - 1), ny * i)
        Ks[rows, :] = Cs @ Apow @ As - Ms @ Cs  # Cs As^i − Ms Cs
        Ps[rows, :] = Ms
        Apow = Apow @ As
    return Ks, Ps


def _setmodel_estimator(estim, model, **cov):
    """Delegate to the public estimator API (execute.jl:440-544)."""
    estim.setmodel(model, Qhat=cov.get("Q_hat", cov.get("Qhat")),
                   Rhat=cov.get("R_hat", cov.get("Rhat")))


# ---------------------------------------------------------------------------
def _build_step(nu, Hc, nd, n_eps, nZ, blk, n_ineq, n_eq, is_ms, nx_hat,
                nw=0, Hp=None, ny=None, qp_solver="admm", gi_max_active=None):
    """Create the per-step solve (pure function; caller jits / vmaps it)."""
    blk = tuple(int(b) for b in blk)
    use_as = qp_solver == "active_set"

    def step(p, x0_hat, lastu0, d0, D_hat_0, R_hat_y, R_hat_u,
             xs_hat, ys_hat, Z_prev, y_prev, ry=None, y_now=None,
             rung_prev=None, iter_budget=None, qp_state=None):
        # --- stochastic + deterministic output predictions F (initpred!) ---
        Ys = p["Ks"] @ xs_hat + p["Ps"] @ ys_hat
        F = p["B"] + p["K"] @ x0_hat + p["V"] @ lastu0 + Ys
        if nd:
            F = F + p["G"] @ d0 + p["J"] @ D_hat_0
        Tu_lastu0 = p["Tu"] @ lastu0
        # --- linear coefficient q̃ (initpred!, execute.jl:247-277) ---
        Cy = F + p["Yop"] - R_hat_y
        Cu = Tu_lastu0 + p["Uop"] - R_hat_u
        q = 2.0 * (p["E_t"].T @ (p["M_Hp"] @ Cy) + p["Pu_t"].T @ (p["L_Hp"] @ Cu))
        r_const = Cy @ p["M_Hp"] @ Cy + Cu @ p["L_Hp"] @ Cu
        # --- terminal prediction fx̂ (linconstraint!) ---
        fx = p["bx"] + p["kx"] @ x0_hat + p["vx"] @ lastu0
        if nd:
            fx = fx + p["gx"] @ d0 + p["jx"] @ D_hat_0
        # --- custom linear constraints Fw (relaxW + linconstraint_custom!,
        # execute.jl:337-366) ---
        if nw:
            Ue_t = jnp.concatenate([Tu_lastu0 + p["Uop"],
                                    lastu0 + p["Uop"][:nu]])
            Fw = p["Wu_bar"] @ Ue_t
            if nd:
                De_t = jnp.concatenate([d0 + p["dop_w"], D_hat_0 + p["Dop_w"]])
                Fw = Fw + p["Wd_bar"] @ De_t
            Re_t = jnp.concatenate([ry, R_hat_y])
            Fw = Fw + p["Wr_bar"] @ Re_t
            Ye_t = jnp.concatenate([y_now, F + p["Yop"]])
            Fw = Fw + p["Wy_bar"] @ Ye_t
            bW = jnp.concatenate([-p["Wmin_b"] + Fw, p["Wmax_b"] - Fw])
        else:
            bW = jnp.zeros(0, F.dtype)
        # --- inequality RHS b (transcription.jl:824-842 order) ---
        b = jnp.concatenate([
            -p["U0min"] + Tu_lastu0,
            p["U0max"] - Tu_lastu0,
            -p["DUmin"],
            p["DUmax"],
            -p["Y0min"] + F,
            p["Y0max"] - F,
            bW,
            -p["x0min"] + fx,
            p["x0max"] - fx,
        ])
        b = jnp.clip(b, -2e18, 2e18)
        # --- equality RHS beq = −FS (linconstrainteq!) ---
        FS = p["BS"] + p["KS"] @ x0_hat + p["VS"] @ lastu0
        if nd and n_eq:
            FS = FS + p["GS"] @ d0 + p["JS"] @ D_hat_0
        beq = -FS
        # --- stack l ≤ A Z̃ ≤ u ---
        l = jnp.concatenate([
            jnp.full(n_ineq, -2e18, b.dtype),
            jnp.zeros(n_eps, b.dtype),      # ϵ ≥ 0
            beq,
        ])
        u_vec = jnp.concatenate([
            b,
            jnp.full(n_eps, 2e18, b.dtype),
            beq,
        ])
        # --- warm start: shift previous solution (transcription.jl:997-1100) ---
        nDU = nu * Hc
        Zs = jnp.zeros_like(Z_prev)
        Zs = Zs.at[:nDU - nu].set(Z_prev[nu:nDU])
        if is_ms:
            nX = nx_hat * (nZ - nDU) // nx_hat  # = nx̂*Hp
            Zs = Zs.at[nDU:nDU + nX - nx_hat].set(Z_prev[nDU + nx_hat:nDU + nX])
            Zs = Zs.at[nDU + nX - nx_hat:nDU + nX].set(Z_prev[nDU + nX - nx_hat:nDU + nX])
        if n_eps:
            Zs = Zs.at[-1].set(Z_prev[-1])
        # --- solve QP ---
        admm_cache_keys = ("qpc_D", "qpc_E", "qpc_c", "qpc_eq",
                           "qpc_loose", "qpc_rhovs", "qpc_Minvs")
        if is_ms and n_eq:
            # MultipleShooting via construct-time equality elimination:
            # Z̃ = Z̃p + N v with ES̃ N = 0 — the device QP is SS-sized,
            # inequality-only, and conditioned by an orthonormal basis
            # (the TPU form of the reference's sparse long-horizon remedy)
            n_ie = n_ineq + n_eps
            Zp = p["Aeq_dag"] @ beq
            q_r = p["Nnull"].T @ q + p["NTH"] @ Zp
            shift = p["A_stack"][:n_ie] @ Zp
            l_r = jnp.clip(l[:n_ie] - shift, -2e18, 2e18)
            u_r = jnp.clip(u_vec[:n_ie] - shift, -2e18, 2e18)
            v0 = p["Nnull"].T @ (Zs - Zp)
            y0r = y_prev[:n_ie]
            if use_as:
                # GI with cross-period operator carry when the caller
                # supplies qp_state (P/A step-invariant → the carried
                # inverse Gram is exact); dual-seed warm start otherwise
                sol = solve_qp_active(p["H_r"], q_r, p["A_r"], l_r, u_r,
                                      y0=None if qp_state is not None
                                      else y0r,
                                      state0=qp_state,
                                      iter_budget=iter_budget,
                                      max_active=gi_max_active,
                                      cache={k: p[k] for k in
                                             ("gic_Pinv",)})
            else:
                sol = solve_qp(p["H_r"], q_r, p["A_r"], l_r, u_r, x0=v0,
                               y0=y0r, rung0=rung_prev,
                               iter_budget=iter_budget,
                               cache={k: p[k] for k in admm_cache_keys})
            Z_sol = Zp + p["Nnull"] @ sol.x
            y_full = jnp.concatenate(
                [sol.y, jnp.zeros(n_eq, sol.y.dtype)])
            HZp = p["H"] @ Zp
            obj = sol.obj + 0.5 * Zp @ HZp + q @ Zp
            sol = sol._replace(x=Z_sol, y=y_full, obj=obj)
        elif use_as:
            # Goldfarb–Idnani exact dual active set (the DAQP role): carry
            # the active-set operators across periods when the caller
            # supplies qp_state (the active set is nearly stationary in
            # receding horizon → a quiet period costs ~2 lockstep pivots);
            # dual-seed warm start otherwise
            sol = solve_qp_active(p["H"], q, p["A_stack"], l, u_vec,
                                  y0=None if qp_state is not None
                                  else y_prev,
                                  state0=qp_state,
                                  iter_budget=iter_budget,
                                  max_active=gi_max_active,
                                  cache={k: p[k] for k in
                                         ("gic_Pinv",)})
        else:
            sol = solve_qp(p["H"], q, p["A_stack"], l, u_vec, x0=Zs,
                           y0=y_prev, rung0=rung_prev,
                           iter_budget=iter_budget,
                           cache={k: p[k] for k in admm_cache_keys})
        Z_t = jnp.where(sol.converged, sol.x, Zs)
        # --- receding horizon input (getinput!, execute.jl:536-546),
        # clamped to the (soft-relaxed) actuator box for hard safety ---
        du = Z_t[:nu]
        u0 = du + lastu0
        eps_f = Z_t[-1] if n_eps else jnp.asarray(0.0, du.dtype)
        u0 = jnp.clip(u0,
                      p["U0min"][:nu] - p["C_umin_u"] * eps_f,
                      p["U0max"][:nu] + p["C_umax_u"] * eps_f)
        u = u0 + p["Uop"][:nu]
        rung = sol.rung if sol.rung is not None else jnp.asarray(4, jnp.int32)
        return (u, Z_t, sol.y, sol.converged, F, sol.obj + r_const,
                sol.iters, rung, sol.gi_state)

    return step
