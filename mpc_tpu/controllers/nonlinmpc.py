"""NonLinMPC — nonlinear MPC via an in-graph SQP loop.

Reference: ``src/controller/nonlinmpc.jl``.  The reference wires AD oracles
into Ipopt through JuMP/MOI (nonlinmpc.jl:806-1098); here the entire solve is
a fixed-iteration SQP loop *inside one jitted function*, TPU-style:

* rollout of the augmented model over Hp via ``lax.scan`` (SingleShooting) or
  stage-parallel evaluation via ``vmap`` (MultipleShooting — the natural TPU
  form of the reference's threaded stage loop, transcription.jl:1335-1364);
* Jacobians by ``jax.jacfwd`` (decision vector is small) — replacing the
  DifferentiationInterface + sparse-coloring apparatus;
* Gauss-Newton Hessian of the tracking terms + exact Hessian of the economic
  term; QP subproblem solved by the batched ADMM+polish solver (ops/qp.py);
* ℓ1-merit backtracking line search evaluated in parallel over candidate
  step sizes; fixed max iterations with convergence masks (static shapes).

Supports the economic cost ``Ewt·JE(Ue, Ŷe, D̂e, p, ϵ)`` and custom nonlinear
inequality constraints ``gc(Ue, Ŷe, D̂e, p, ϵ) ≤ 0`` (nonlinmpc.jl:150-225) as
user jax-traceable callables.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.config import jit32

from ..estimators import (InternalModel, StateEstimator, SteadyKalmanFilter,
                          UnscentedKalmanFilter)
# (InternalModel also needs its stochastic output predictions added to the
# rollout outputs — wired through params["Ks"]/["Ps"] and the Ys argument)
from ..models import LinModel
from ..ops.qp import solve_qp
from ..ops.qp_active import solve_qp_active
from ..utils.config import BIG
from .base import PredictiveController, default_Hp
from .construct import ControllerWeights
from .linmpc import _clipinf
from .transcription import (CollocationMethod, MultipleShooting,
                            OrthogonalCollocation, SingleShooting,
                            TrapezoidalCollocation, init_orthocolloc,
                            init_ZtoDU, init_ZtoU, move_blocking)


def _numeric_p(p):
    """Return p as a device-able numeric pytree, or None if any leaf is not
    numeric (then p stays a baked closure constant)."""
    if p is None:
        return None
    try:
        leaves = jax.tree.leaves(p)
        if not leaves:
            return None
        arrs = [np.asarray(x) for x in leaves]
        if not all(np.issubdtype(a.dtype, np.number) for a in arrs):
            return None
        return jax.tree.map(lambda x: np.asarray(x, float), p)
    except (TypeError, ValueError):
        return None


class NonLinMPC(PredictiveController):
    def __init__(self, model_or_estim, Hp=None, Hc=2,
                 Mwt=None, Nwt=None, Lwt=None, M_Hp=None, N_Hc=None, L_Hp=None,
                 Cwt=1e5, Ewt=0.0, JE=None, gc=None, nc=0, p=None,
                 Wy=None, Wu=None, Wd=None, Wr=None,
                 transcription=None, sqp_iters=30, sqp_tol=1e-8,
                 kkt_tol=0.0, kkt_feas_tol=1e-4,
                 trust_radius=None, qp_solver="admm",
                 hessian="gauss_newton", **estim_kwargs):
        if isinstance(model_or_estim, StateEstimator):
            estim = model_or_estim
            model = estim.model
        else:
            model = model_or_estim
            if isinstance(model, LinModel):
                estim = SteadyKalmanFilter(model, **estim_kwargs)
            else:
                estim = UnscentedKalmanFilter(model, **estim_kwargs)
        self.estim = estim
        self.transcription = transcription or SingleShooting()
        Hp = default_Hp(model) if Hp is None else int(Hp)
        nb = move_blocking(Hp, Hc)
        Hc = len(nb)
        self.Hp, self.Hc, self.nb = Hp, Hc, nb
        nu, ny, nd, nx_hat = model.nu, model.ny, model.nd, estim.nx_hat
        self.weights = ControllerWeights(nu, ny, Hp, Hc, Mwt, Nwt, Lwt,
                                         M_Hp, N_Hc, L_Hp, Cwt, Ewt)
        self.n_eps = self.weights.n_eps
        if JE is not None:
            # the economic cost must accept (Ue, Ŷe, D̂e, p, ϵ) — the
            # reference validates the method signature up front
            # (nonlinmpc.jl:824-825); a wrong arity here would otherwise
            # only explode deep inside the traced SQP objective
            import inspect
            try:
                params = inspect.signature(JE).parameters
                var_pos = any(p.kind == p.VAR_POSITIONAL
                              for p in params.values())
                n_args = len(params)
            except (TypeError, ValueError):
                var_pos, n_args = True, 5
            if not var_pos and n_args != 5:
                raise ValueError(
                    f"the JE function should have 5 arguments "
                    f"(Ue, Ye, De, p, eps), got {n_args}")
        self.JE = JE or (lambda Ue, Ye, De, p_, eps: 0.0)
        if (gc is not None) != (int(nc) > 0):
            raise ValueError(
                "custom constraints need BOTH gc and nc>0: got "
                f"gc={'set' if gc is not None else 'None'}, nc={int(nc)}")
        self.gc = gc
        self.nc = int(nc)
        # custom linear constraints W (construct.jl:665-695): the Wy (output)
        # term is linear in Z only for LinModel (construct.jl:668-669)
        if Wy is not None and not isinstance(model, LinModel):
            raise ValueError("Wy matrix can be specified only with LinModel")
        from .linmpc import _validate_custom_lincon
        self.Wy, self.Wu, self.Wd, self.Wr, self.nw = _validate_custom_lincon(
            model, Wy, Wu, Wd, Wr)
        self.p = p if p is not None else model.p
        self.sqp_iters = int(sqp_iters)
        self.sqp_tol = float(sqp_tol)
        # KKT early exit (reference analogue: Ipopt's tol/constr_viol_tol
        # stopping pair, classified per solve in src/general.jl:44-61):
        # kkt_tol > 0 lets the SQP loop exit once the RELATIVE stationarity
        # residual ‖∇f + Jᵀy‖∞/(1+‖∇f‖∞) < kkt_tol AND the worst single
        # constraint violation < kkt_feas_tol — at f32 fleet precision the
        # default step-norm test (1e-8) is unreachable and lanes burn to
        # the iteration cap after they are KKT-converged.  Default 0 keeps
        # the legacy step-norm-only exit.
        self.kkt_tol = float(kkt_tol)
        self.kkt_feas_tol = float(kkt_feas_tol)
        self.trust_radius = trust_radius
        if qp_solver not in ("admm", "active_set"):
            raise ValueError("qp_solver must be 'admm' or 'active_set'")
        self.qp_solver = qp_solver
        # Hessian backend (the reference exposes selectable gradient/
        # Jacobian/Hessian backends and benchmarks ± exact Hessian,
        # src/controller/nonlinmpc.jl:27-29,230-236): "gauss_newton" is the
        # tracking-cost GN model (+ exact economic-term curvature);
        # "exact" is the full Lagrangian Hessian ∇²J + Σᵢ yᵢ∇²cᵢ at the
        # iterate with the previous QP's multipliers, projected to its PSD
        # part (eigh) so the QP subproblem stays convex — the projection is
        # the trust-region-compatible indefiniteness guard.  Exact pays one
        # (nZt,nZt) eigh per SQP iteration; it wins on curvature-dominated
        # economic problems where GN's model is poor.
        if hessian not in ("gauss_newton", "exact"):
            raise ValueError("hessian must be 'gauss_newton' or 'exact'")
        self.hessian = hessian
        self._build()
        self.Uop = np.tile(model.uop, Hp)
        self.Yop = np.tile(model.yop, Hp)
        self.Dop = np.tile(model.dop, Hp)
        self.Z_tilde = np.zeros(self.nZt)
        self.lastu0 = np.zeros(nu)
        self._last = {}

    # ------------------------------------------------------------------
    def _build(self, rebuild_step=True):
        model, estim = self.estim.model, self.estim
        Hp, Hc, nb = self.Hp, self.Hc, self.nb
        nu, ny, nd, nx_hat = model.nu, model.ny, model.nd, estim.nx_hat
        tr = self.transcription
        self.is_ms = isinstance(tr, (MultipleShooting, CollocationMethod))
        self.is_colloc = isinstance(tr, CollocationMethod)
        if self.is_colloc:
            from ..models import NonLinModel, RungeKutta
            if not isinstance(model, NonLinModel) or not isinstance(
                    model.solver, RungeKutta):
                raise ValueError("Collocation methods require a continuous-time "
                                 "NonLinModel (with a RungeKutta solver).")
        if isinstance(tr, OrthogonalCollocation):
            nZ = tr.nZ_colloc(nu, nx_hat, model.nx, Hp, Hc)
            self.Mo, self.Co, self.lam_o = init_orthocolloc(model.nx, model.Ts, tr)
        else:
            nZ = tr.nZ(nu, nx_hat, Hp, Hc)
        self.nZ = nZ
        self.nZt = nZ + self.n_eps
        # PΔu/Pu only need the leading [ΔU; X̂0] layout; extra K columns are 0
        class _NZ:
            def nZ(_, nu_, nxh_, Hp_, Hc_):
                return nZ
        PDu = init_ZtoDU(_NZ(), nu, nx_hat, Hp, Hc)
        Pu, Tu = init_ZtoU(_NZ(), nu, nx_hat, Hp, Hc, nb)
        # soft/hard constraint bound storage (deviation form, data-only)
        self.U0min = np.full(nu * Hp, -BIG)
        self.U0max = np.full(nu * Hp, BIG)
        self.DUmin = np.full(nu * Hc, -BIG)
        self.DUmax = np.full(nu * Hc, BIG)
        self.Y0min = np.full(ny * Hp, -BIG)
        self.Y0max = np.full(ny * Hp, BIG)
        self.x0min = np.full(nx_hat, -BIG)
        self.x0max = np.full(nx_hat, BIG)
        self.C_umin = np.zeros(nu * Hp)
        self.C_umax = np.zeros(nu * Hp)
        self.C_dumin = np.zeros(nu * Hc)
        self.C_dumax = np.zeros(nu * Hc)
        self.C_ymin = np.ones(ny * Hp)
        self.C_ymax = np.ones(ny * Hp)
        self.c_xmin = np.ones(nx_hat)
        self.c_xmax = np.ones(nx_hat)
        # custom linear constraints: W(Z) rows (relaxW, construct.jl:1085-1160)
        nw = self.nw
        nW = nw * (Hp + 1)
        self.nW = nW
        from ..utils.linalg import repeatdiag
        if nw:
            Wy_bar = repeatdiag(self.Wy, Hp + 1)
            Wu_bar = repeatdiag(self.Wu, Hp + 1)
            Wd_bar = repeatdiag(self.Wd, Hp + 1)
            Wr_bar = repeatdiag(self.Wr, Hp + 1)
            # fold the held terminal input u(k+Hp)=u(k+Hp−1) into the U block
            Wu_fold = Wu_bar[:, :nu * Hp].copy()
            Wu_fold[:, -nu:] += Wu_bar[:, nu * Hp:]
            Wy_now, Wy_pred = Wy_bar[:, :ny], Wy_bar[:, ny:]
        else:
            Wy_now = np.zeros((0, ny))
            Wy_pred = np.zeros((0, ny * Hp))
            Wu_fold = np.zeros((0, nu * Hp))
            Wd_bar = np.zeros((0, (Hp + 1) * nd))
            Wr_bar = np.zeros((0, (Hp + 1) * ny))
        self.C_wmin = np.ones(nW)
        self.C_wmax = np.ones(nW)
        self.Wmin_b = np.full(nW, -BIG)
        self.Wmax_b = np.full(nW, BIG)
        # InternalModel stochastic output predictions Ŷs (construct.jl:1236-1267)
        if isinstance(estim, InternalModel):
            from .linmpc import _init_stochpred
            Ks_l, Ps_l = _init_stochpred(estim, Hp)
        else:
            Ks_l = np.zeros((ny * Hp, getattr(estim, "nxs", 0)))
            Ps_l = np.zeros((ny * Hp, ny))
        # bumped on every params mutation (and on rebuild); fleet wrappers
        # use it to cache the device-resident copy of this tree
        self._params_version = getattr(self, "_params_version", 0) + 1
        self.params = dict(
            Ks=Ks_l, Ps=Ps_l, Ys_now=np.zeros(ny * Hp),
            Pu=Pu, PDu=PDu, Tu=Tu,
            M_Hp=self.weights.M_Hp, Nt_Hc=self.weights.Nt_Hc,
            L_Hp=self.weights.L_Hp,
            Uop=np.tile(model.uop, Hp), Yop=np.tile(model.yop, Hp),
            U0min=self.U0min, U0max=self.U0max,
            DUmin=self.DUmin, DUmax=self.DUmax,
            Y0min=self.Y0min, Y0max=self.Y0max,
            x0min=self.x0min, x0max=self.x0max,
            C_umin=self.C_umin, C_umax=self.C_umax,
            C_dumin=self.C_dumin, C_dumax=self.C_dumax,
            C_ymin=self.C_ymin, C_ymax=self.C_ymax,
            c_xmin=self.c_xmin, c_xmax=self.c_xmax,
            Wy_now=Wy_now, Wy_pred=Wy_pred, Wu_fold=Wu_fold,
            Wd_bar=Wd_bar, Wr_bar=Wr_bar,
            Wmin_b=self.Wmin_b, Wmax_b=self.Wmax_b,
            C_wmin=self.C_wmin, C_wmax=self.C_wmax,
            fop_m_xop=estim.fop_hat - estim.xop_hat,
            yop=model.yop, uop=model.uop, dop=model.dop,
        )
        # user parameter p travels in params when it is a numeric pytree
        # (reference: nmpc.p is mutable at runtime, nonlinmpc.jl test :930);
        # non-numeric p (e.g. a model object) stays a baked closure constant
        p_num = _numeric_p(self.p)
        self._p_traced = p_num is not None
        if self._p_traced:
            self.params["p_user"] = p_num
        if rebuild_step or getattr(self, "_step", None) is None:
            # the jitted step bakes in f/h and shapes; weight/covariance
            # swaps travel in params and must NOT retrace (CLAUDE.md)
            self._step, self._diag = self._make_step()
            self._coldstart_fn = None
        self._solved_once = False

    # ------------------------------------------------------------------
    def setconstraint(self, **kw):
        model, estim = self.estim.model, self.estim
        nu, ny, nx_hat = model.nu, model.ny, estim.nx_hat
        Hp, Hc = self.Hp, self.Hc

        def pick(small, cap, n, rep):
            v = kw.get(cap)
            if v is not None:
                v = np.asarray(v, float).ravel()
                if v.shape != (n * rep,):
                    raise ValueError(f"{cap} size must be ({n * rep},)")
                return v
            v = kw.get(small)
            if v is not None:
                v = np.asarray(v, float).ravel()
                if v.shape != (n,):
                    raise ValueError(f"{small} size must be ({n},)")
                return np.tile(v, rep)
            return None

        m = [("umin", "Umin", nu, Hp, "U0min", self.Uop),
             ("umax", "Umax", nu, Hp, "U0max", self.Uop),
             ("dumin", "DUmin", nu, Hc, "DUmin", 0.0),
             ("dumax", "DUmax", nu, Hc, "DUmax", 0.0),
             ("Deltaumin", "DeltaUmin", nu, Hc, "DUmin", 0.0),
             ("Deltaumax", "DeltaUmax", nu, Hc, "DUmax", 0.0),
             ("ymin", "Ymin", ny, Hp, "Y0min", self.Yop),
             ("ymax", "Ymax", ny, Hp, "Y0max", self.Yop)]
        for small, cap, n, rep, attr, op in m:
            v = pick(small, cap, n, rep)
            if v is not None:
                getattr(self, attr)[:] = _clipinf(v - op)
        for kws, attr in (("xhatmin", "x0min"), ("xhatmax", "x0max")):
            v = kw.get(kws)
            if v is not None:
                v = np.asarray(v, float).ravel()
                if v.shape != (nx_hat,):
                    raise ValueError(f"{kws} size must be ({nx_hat},)")
                getattr(self, attr)[:] = _clipinf(v - estim.xop_hat)
        if self.nw:
            for small, cap, attr in (("wmin", "Wmin", "Wmin_b"),
                                     ("wmax", "Wmax", "Wmax_b")):
                v = pick(small, cap, self.nw, Hp + 1)
                if v is not None:
                    getattr(self, attr)[:] = _clipinf(v)
        for name in ("U0min", "U0max", "DUmin", "DUmax", "Y0min", "Y0max",
                     "x0min", "x0max", "Wmin_b", "Wmax_b"):
            self.params[name] = getattr(self, name)
        self._params_version += 1
        # softness parameters
        soft = {k: v for k, v in kw.items() if k.startswith("c_") or k.startswith("C_")}
        if soft:
            if self.n_eps != 1:
                raise ValueError("Slack variable weight Cwt must be finite to "
                                 "set softness parameters")
            sm = {"c_umin": ("C_umin", nu, Hp), "c_umax": ("C_umax", nu, Hp),
                  "c_dumin": ("C_dumin", nu, Hc), "c_dumax": ("C_dumax", nu, Hc),
                  "c_ymin": ("C_ymin", ny, Hp), "c_ymax": ("C_ymax", ny, Hp),
                  "c_xhatmin": ("c_xmin", nx_hat, 1), "c_xhatmax": ("c_xmax", nx_hat, 1),
                  "c_wmin": ("C_wmin", self.nw, Hp + 1),
                  "c_wmax": ("C_wmax", self.nw, Hp + 1)}
            for k, v in soft.items():
                key = k if k.startswith("c_") else "c_" + k[2:].lower()
                if key not in sm:
                    raise ValueError(f"unknown softness parameter {k}")
                attr, n, rep = sm[key]
                v = np.asarray(v, float).ravel()
                vv = np.tile(v, rep) if v.shape == (n,) else v
                if vv.shape != (n * rep,):
                    raise ValueError(f"{k} size must be ({n},) or ({n * rep},)")
                getattr(self, attr)[:] = vv
                self.params[attr] = getattr(self, attr)
                self._params_version += 1
        return self

    # ------------------------------------------------------------------
    def _rollout_fns(self):
        """Pure rollout of the augmented model for this transcription."""
        estim, model = self.estim, self.estim.model
        nu, ny, nd, nx_hat = model.nu, model.ny, model.nd, estim.nx_hat
        Hp, nZ = self.Hp, self.nZ
        f_hat, h_hat = estim.f_hat, estim.h_hat
        nDU = nu * self.Hc

        def outputs_ss(p, Z, x0_hat, lastu0, Df, Dh):
            U0 = (p["Pu"] @ Z + p["Tu"] @ lastu0)
            U0m = U0.reshape(Hp, nu)

            def scan_f(x, inp):
                u0, d0f, d0h = inp
                xn = jnp.asarray(f_hat(x, u0, d0f)) + p["fop_m_xop"]
                y = jnp.asarray(h_hat(xn, d0h))
                return xn, (y, xn)

            # unroll: the SS rollout runs ~10× per SQP iteration (jacfwd +
            # line-search merits) inside a vmapped lockstep loop, where each
            # scan iteration pays op-count × dispatch; unrolling lets XLA
            # fuse across stages (measured win on the pendulum fleet)
            xend, (Y, X) = jax.lax.scan(scan_f, x0_hat, (U0m, Df, Dh),
                                        unroll=min(Hp, 16))
            return Y.reshape(-1) + p["Ys_now"], xend, jnp.zeros(0, Z.dtype), U0

        def outputs_ms(p, Z, x0_hat, lastu0, Df, Dh):
            U0 = (p["Pu"] @ Z + p["Tu"] @ lastu0)
            U0m = U0.reshape(Hp, nu)
            X = Z[nDU:nDU + nx_hat * Hp].reshape(Hp, nx_hat)
            Y = jax.vmap(lambda x, dh: jnp.asarray(h_hat(x, dh)))(X, Dh)
            # defects ŝ_j = f̂(x̂_{j-1}) + (f̂op−x̂op) − x̂_j  (stage-parallel)
            X_prev = jnp.vstack([x0_hat[None, :], X[:-1]])
            F = jax.vmap(lambda x, u, df: jnp.asarray(f_hat(x, u, df)))(
                X_prev, U0m, Df) + p["fop_m_xop"]
            S = (F - X).reshape(-1)
            return Y.reshape(-1) + p["Ys_now"], X[-1], S, U0

        nx = model.nx
        Cs_u = estim.Cs_u if hasattr(estim, "Cs_u") else np.zeros((nu, 0))
        As_s = estim.As if hasattr(estim, "As") else np.zeros((0, 0))
        f_cont = getattr(model, "_f_user", None)
        p_model = model.p
        Ts = model.Ts
        tr = self.transcription
        hold = getattr(tr, "h", 0)

        def _disturbed_inputs(U0m, X_prev):
            # û_j = u_j + Cs_u·x̂s(j) (estimator/execute.jl:162-173)
            return U0m + X_prev[:, nx:] @ jnp.asarray(Cs_u, U0m.dtype).T

        def outputs_trap(p, Z, x0_hat, lastu0, Df, Dh):
            """Trapezoidal defects (controller/transcription.jl:1392-1437),
            all stages evaluated in parallel with vmap."""
            U0 = (p["Pu"] @ Z + p["Tu"] @ lastu0)
            U0m = U0.reshape(Hp, nu)
            X = Z[nDU:nDU + nx_hat * Hp].reshape(Hp, nx_hat)
            Y = jax.vmap(lambda x, dh: jnp.asarray(h_hat(x, dh)))(X, Dh)
            X_prev = jnp.vstack([x0_hat[None, :], X[:-1]])
            Uh = _disturbed_inputs(U0m, X_prev)
            # u at the END of interval j: u_{j+1} for h=1 (clamped), u_j for h=0
            Uh_next = jnp.vstack([Uh[1:], Uh[-1:]]) if hold else Uh
            k1 = jax.vmap(lambda x, u, d: jnp.asarray(f_cont(x, u, d, p_model)))(
                X_prev[:, :nx], Uh, Df)
            k2 = jax.vmap(lambda x, u, d: jnp.asarray(f_cont(x, u, d, p_model)))(
                X[:, :nx], Uh_next, Dh)
            S_det = X_prev[:, :nx] - X[:, :nx] + 0.5 * Ts * (k1 + k2)
            S_sto = X_prev[:, nx:] @ jnp.asarray(As_s, X.dtype).T - X[:, nx:]
            S = jnp.concatenate([S_det, S_sto], axis=1).reshape(-1)
            return Y.reshape(-1) + p["Ys_now"], X[-1], S, U0

        def outputs_ortho(p, Z, x0_hat, lastu0, Df, Dh):
            """Orthogonal collocation defects
            (controller/transcription.jl:1486-1541): Mo(kᵢ−x̂d) − k̇ᵢ per
            point, linear continuity Co·k + λo·x̂d − x̂d⁺, stochastic MS."""
            no = tr.no
            dt_z = Z.dtype
            tau = jnp.asarray(tr.tau, dt_z)
            Mo = jnp.asarray(self.Mo, dt_z)
            Co = jnp.asarray(self.Co, dt_z)
            lam = float(self.lam_o)   # np.float64 scalar would upcast f32
            U0 = (p["Pu"] @ Z + p["Tu"] @ lastu0)
            U0m = U0.reshape(Hp, nu)
            X = Z[nDU:nDU + nx_hat * Hp].reshape(Hp, nx_hat)
            K = Z[nDU + nx_hat * Hp:].reshape(Hp, no, nx)
            Y = jax.vmap(lambda x, dh: jnp.asarray(h_hat(x, dh)))(X, Dh)
            X_prev = jnp.vstack([x0_hat[None, :], X[:-1]])
            Uh = _disturbed_inputs(U0m, X_prev)
            Uh_next = jnp.vstack([Uh[1:], Uh[-1:]])

            def stage(xp, xn, kj, u0j, u0nj, d0j, d0nj):
                xd = xp[:nx]
                dk = (kj - xd[None, :]).reshape(-1)
                sk = Mo @ dk
                def point(i):
                    di = (1 - tau[i]) * d0j + tau[i] * d0nj
                    ui = u0j if hold < 1 else (1 - tau[i]) * u0j + tau[i] * u0nj
                    return jnp.asarray(f_cont(kj[i], ui, di, p_model))
                kdot = jnp.stack([point(i) for i in range(no)]).reshape(-1)
                sk = sk - kdot
                sc = Co @ kj.reshape(-1) + lam * xd - xn[:nx]
                ss = jnp.asarray(As_s, xp.dtype) @ xp[nx:] - xn[nx:]
                return jnp.concatenate([sk, sc, ss])

            S = jax.vmap(stage)(X_prev, X, K, Uh, Uh_next, Df, Dh).reshape(-1)
            return Y.reshape(-1) + p["Ys_now"], X[-1], S, U0

        if isinstance(tr, OrthogonalCollocation):
            return outputs_ortho
        if isinstance(tr, TrapezoidalCollocation):
            return outputs_trap
        return outputs_ms if self.is_ms else outputs_ss

    def _make_coldstart(self):
        """Feasibility cold start for MS/collocation decision states: fill the
        X̂ block with the held-input (ΔU=0) rollout from x̂0 and the
        orthogonal-collocation K block with the linear interpolation of the
        deterministic substate across each interval, so the first SQP solve
        starts with near-zero defects instead of the ~O(1) violations of an
        all-zero (operating-point) initialization.  Returned in *pre-shifted*
        form: step() shifts Z_prev one slot before use, so block j+1 here
        lands in slot j there (last slot duplicates slot Hp−2 — harmless)."""
        estim, model = self.estim, self.estim.model
        nu, nx_hat, nx, nd = model.nu, estim.nx_hat, model.nx, model.nd
        Hp = self.Hp
        nDU = nu * self.Hc
        f_hat = estim.f_hat
        tr = self.transcription
        is_oc = isinstance(tr, OrthogonalCollocation)
        no = tr.no if is_oc else 0
        tau_np = np.asarray(tr.tau) if is_oc else None
        nZt = self.nZt

        @jit32
        def coldstart(p, x0_hat, lastu0, d0, D_hat_0):
            dt = x0_hat.dtype
            if nd:
                Dall = jnp.concatenate([d0, D_hat_0]).reshape(Hp + 1, nd)
                Df = Dall[:-1]
            else:
                Df = jnp.zeros((Hp, 0), dt)
            U0m = (p["Tu"] @ lastu0).reshape(Hp, nu)

            def scan_f(x, inp):
                u0, d0f = inp
                xn = jnp.asarray(f_hat(x, u0, d0f)) + p["fop_m_xop"]
                return xn, xn

            _, X = jax.lax.scan(scan_f, x0_hat, (U0m, Df))
            Zp = jnp.zeros(nZt, dt)
            # slot 0 of every block is discarded by step()'s shift
            Zp = Zp.at[nDU + nx_hat:nDU + nx_hat * Hp].set(X[:-1].reshape(-1))
            if no:
                X_prev = jnp.vstack([x0_hat[None, :], X[:-1]])
                tau = jnp.asarray(tau_np, dt)
                Kd = (X_prev[:, None, :nx] * (1 - tau)[None, :, None]
                      + X[:, None, :nx] * tau[None, :, None])
                o = nDU + nx_hat * Hp
                nk_st = no * nx
                Zp = Zp.at[o + nk_st:o + Hp * nk_st].set(Kd[:-1].reshape(-1))
            return Zp

        return coldstart

    def _make_step(self):
        estim, model = self.estim, self.estim.model
        nu, ny, nd, nx_hat = model.nu, model.ny, model.nd, estim.nx_hat
        Hp, Hc, nZ, nZt = self.Hp, self.Hc, self.nZ, self.nZt
        n_eps, nc = self.n_eps, self.nc
        nDU = nu * Hc
        if isinstance(self.transcription, OrthogonalCollocation):
            neq = Hp * (self.transcription.no * model.nx + nx_hat)
        elif self.is_ms:
            neq = nx_hat * Hp
        else:
            neq = 0
        nK = self.nZ - nDU - nx_hat * Hp if self.is_ms else 0  # ortho K block
        nw, nW = self.nw, self.nW
        JE, gc = self.JE, self.gc
        if self._p_traced:
            getp = lambda p: p["p_user"]
        else:
            p_static = self.p
            getp = lambda p: p_static
        Cwt = self.weights.Cwt
        Ewt = self.weights.Ewt
        rollout = self._rollout_fns()
        sqp_iters, sqp_tol = self.sqp_iters, self.sqp_tol
        kkt_tol, kkt_feas_tol = self.kkt_tol, self.kkt_feas_tol
        # structured nullspace applies to PLAIN MultipleShooting only:
        # collocation defect rows have ∂S/∂x̂_j ≠ −I (trap: −I + Ts/2·∂k₂;
        # ortho: its own K-block coupling) — those keep the generic QR
        use_struct = (type(self.transcription) is MultipleShooting)
        is_ms = self.is_ms
        use_as = self.qp_solver == "active_set"
        use_exact_h = self.hessian == "exact"
        tr0 = float(self.trust_radius) if self.trust_radius else 16.0
        alphas_f = [1.0, 0.5, 0.25, 0.1, 0.03, 0.01]

        def split(Zt):
            return Zt[:nZ], (Zt[-1] if n_eps else jnp.asarray(0.0, Zt.dtype))

        def extended(p, U0, Y0, d, D_hat, yk):
            Ue = jnp.concatenate([U0 + p["Uop"], U0[-nu:] + p["Uop"][-nu:]])
            Ye = jnp.concatenate([yk, Y0 + p["Yop"]])
            De = jnp.concatenate([d, D_hat]) if nd else jnp.zeros((Hp + 1) * 0)
            return Ue, Ye, De

        def objective(p, Zt, x0_hat, lastu0, Df, Dh, R_y, R_u, d, D_hat, yk):
            Z, eps = split(Zt)
            Y0, xend, S, U0 = rollout(p, Z, x0_hat, lastu0, Df, Dh)
            DUt = jnp.concatenate([Z[:nDU], Zt[nZ:]])  # [ΔU; ϵ]
            ey = Y0 + p["Yop"] - R_y
            eu = U0 + p["Uop"] - R_u
            J = ey @ p["M_Hp"] @ ey + DUt @ p["Nt_Hc"] @ DUt + eu @ p["L_Hp"] @ eu
            if Ewt != 0.0:
                Ue, Ye, De = extended(p, U0, Y0, d, D_hat, yk)
                J = J + Ewt * JE(Ue, Ye, De, getp(p), eps)
            return J

        f_hat_c, h_hat_c = estim.f_hat, estim.h_hat

        def constraint_data(p, Zt, x0_hat, lastu0, Df, Dh, d, D_hat, yk):
            """Values+Jacobians of the nonlinear pieces at the iterate."""
            Z, eps = split(Zt)

            def yx(Zt_):
                Z_, _ = split(Zt_)
                Y0, xend, S, U0 = rollout(p, Z_, x0_hat, lastu0, Df, Dh)
                return Y0, xend, S

            Y0, xend, S = yx(Zt)
            if use_struct:
                # plain-MS Jacobians assembled from PER-STAGE jacfwd
                # (nx̂+nu forward tangents per stage instead of nZt=47
                # through the whole transcription): Y/xend/S depend on Z
                # only through the stage-local maps —
                # S_j = f̂(x̂_{j-1}, u_j) + c − x̂_j, Y_j = ĥ(x̂_j)
                X = Z[nDU:nDU + nx_hat * Hp].reshape(Hp, nx_hat)
                X_prev = jnp.vstack([x0_hat[None, :], X[:-1]])
                U0m = (p["Pu"] @ Z + p["Tu"] @ lastu0).reshape(Hp, nu)
                fx = jax.vmap(lambda x, u, df: jax.jacfwd(
                    lambda xx: jnp.asarray(f_hat_c(xx, u, df)))(x))(
                        X_prev, U0m, Df)                 # (Hp, nx̂, nx̂)
                fu = jax.vmap(lambda x, u, df: jax.jacfwd(
                    lambda uu: jnp.asarray(f_hat_c(x, uu, df)))(u))(
                        X_prev, U0m, Df)                 # (Hp, nx̂, nu)
                hx = jax.vmap(lambda x, dh: jax.jacfwd(
                    lambda xx: jnp.asarray(h_hat_c(xx, dh)))(x))(
                        X, Dh)                           # (Hp, ny, nx̂)
                rr = jnp.arange(Hp)
                Jy4 = jnp.zeros((Hp, ny, Hp, nx_hat), Zt.dtype)
                Jy4 = Jy4.at[rr, :, rr, :].set(hx)
                Jy = jnp.zeros((ny * Hp, nZt), Zt.dtype).at[
                    :, nDU:nDU + nx_hat * Hp].set(
                        Jy4.reshape(ny * Hp, nx_hat * Hp))
                JsX4 = jnp.zeros((Hp, nx_hat, Hp, nx_hat), Zt.dtype)
                JsX4 = JsX4.at[rr, :, rr, :].set(
                    -jnp.eye(nx_hat, dtype=Zt.dtype)[None])
                JsX4 = JsX4.at[rr[1:], :, rr[:-1], :].set(fx[1:])
                # ΔU columns: ∂S_j/∂ΔU = fu_j @ ∂u_j/∂ΔU (Pu rows)
                Pu_du = p["Pu"][:, :nDU].reshape(Hp, nu, nDU)
                Js_du = jnp.einsum("jxu,jud->jxd", fu,
                                   Pu_du).reshape(neq, nDU)
                Js = jnp.zeros((neq, nZt), Zt.dtype)
                Js = Js.at[:, :nDU].set(Js_du)
                Js = Js.at[:, nDU:nDU + nx_hat * Hp].set(
                    JsX4.reshape(neq, nx_hat * Hp))
                Jx = jnp.zeros((nx_hat, nZt), Zt.dtype).at[
                    :, nDU + (Hp - 1) * nx_hat:nDU + Hp * nx_hat].set(
                        jnp.eye(nx_hat, dtype=Zt.dtype))
            else:
                Jall = jax.jacfwd(yx)(Zt)
                Jy, Jx, Js = Jall
            gcv = jnp.zeros(0)
            Jgc = jnp.zeros((0, nZt))
            if nc:
                def gfun(Zt_):
                    Z_, eps_ = split(Zt_)
                    Y0_, _, _, U0_ = rollout(p, Z_, x0_hat, lastu0, Df, Dh)
                    Ue, Ye, De = extended(p, U0_, Y0_, d, D_hat, yk)
                    return jnp.asarray(gc(Ue, Ye, De, getp(p), eps_))
                gcv = gfun(Zt)
                Jgc = jax.jacfwd(gfun)(Zt)
            return Y0, xend, S, Jy, Jx, Js, gcv, Jgc

        @jit32
        def step(p, x0_hat, lastu0, d0, D_hat_0, R_y, R_u, yk, ry, Z_prev,
                 y_prev):
            dt = x0_hat.dtype
            d = d0 + p["dop"]
            D_hat = D_hat_0 + jnp.tile(p["dop"], Hp) if nd else D_hat_0
            # disturbance sequences for f (k..k+Hp-1) and h (k+1..k+Hp)
            if nd:
                Dall = jnp.concatenate([d0, D_hat_0]).reshape(Hp + 1, nd)
                Df, Dh = Dall[:-1], Dall[1:]
            else:
                Df = Dh = jnp.zeros((Hp, 0), dt)
            # warm start: shift previous solution
            Zs = jnp.zeros_like(Z_prev)
            Zs = Zs.at[:nDU - nu].set(Z_prev[nu:nDU])
            if is_ms:
                nX = nx_hat * Hp
                Zs = Zs.at[nDU:nDU + nX - nx_hat].set(Z_prev[nDU + nx_hat:nDU + nX])
                Zs = Zs.at[nDU + nX - nx_hat:nDU + nX].set(
                    Z_prev[nDU + nX - nx_hat:nDU + nX])
                if nK:  # shift the collocation-point block (transcription.jl:1056-1058)
                    nk_st = nK // Hp
                    o = nDU + nX
                    Zs = Zs.at[o:o + nK - nk_st].set(Z_prev[o + nk_st:o + nK])
                    Zs = Zs.at[o + nK - nk_st:o + nK].set(
                        Z_prev[o + nK - nk_st:o + nK])
            if n_eps:
                Zs = Zs.at[-1].set(Z_prev[-1])

            obj = lambda Zt: objective(p, Zt, x0_hat, lastu0, Df, Dh, R_y, R_u,
                                       d, D_hat, yk)
            grad_f = jax.grad(obj)

            def je_only(Zt):
                Z_, eps_ = split(Zt)
                Y0_, _, _, U0_ = rollout(p, Z_, x0_hat, lastu0, Df, Dh)
                Ue, Ye, De = extended(p, U0_, Y0_, d, D_hat, yk)
                return Ewt * JE(Ue, Ye, De, getp(p), eps_)

            Tu_lastu0 = p["Tu"] @ lastu0

            # custom linear constraint value W (absolute units; the w(k+Hp)
            # slot reuses the held input via Wu_fold — construct.jl:665-695)
            De_t = jnp.concatenate([d, D_hat])
            Re_t = jnp.concatenate([ry, R_y])

            def W_of(U0_, Y0_):
                return (p["Wy_now"] @ yk + p["Wy_pred"] @ (Y0_ + p["Yop"])
                        + p["Wu_fold"] @ (U0_ + p["Uop"])
                        + p["Wd_bar"] @ De_t + p["Wr_bar"] @ Re_t)

            def viol_terms(Zt):
                """Concatenated per-row constraint violations (≥ 0)."""
                Z_, eps_ = split(Zt)
                Y0, xend, S, U0 = rollout(p, Z_, x0_hat, lastu0, Df, Dh)
                DU = Z_[:nDU]
                parts = []
                parts.append(jnp.maximum(p["U0min"] - p["C_umin"] * eps_ - U0, 0)
                             + jnp.maximum(U0 - p["U0max"] - p["C_umax"] * eps_, 0))
                parts.append(jnp.maximum(p["DUmin"] - p["C_dumin"] * eps_ - DU, 0)
                             + jnp.maximum(DU - p["DUmax"] - p["C_dumax"] * eps_, 0))
                parts.append(jnp.maximum(p["Y0min"] - p["C_ymin"] * eps_ - Y0, 0)
                             + jnp.maximum(Y0 - p["Y0max"] - p["C_ymax"] * eps_, 0))
                parts.append(jnp.maximum(p["x0min"] - p["c_xmin"] * eps_ - xend, 0)
                             + jnp.maximum(xend - p["x0max"] - p["c_xmax"] * eps_, 0))
                if nw:
                    Wv = W_of(U0, Y0)
                    parts.append(
                        jnp.maximum(p["Wmin_b"] - p["C_wmin"] * eps_ - Wv, 0)
                        + jnp.maximum(Wv - p["Wmax_b"] - p["C_wmax"] * eps_, 0))
                parts.append(jnp.abs(S))
                if nc:
                    Ue, Ye, De = extended(p, U0, Y0, d, D_hat, yk)
                    parts.append(jnp.maximum(
                        jnp.asarray(gc(Ue, Ye, De, getp(p), eps_)), 0))
                if n_eps:
                    parts.append(jnp.maximum(-eps_, 0)[None])
                return jnp.concatenate(parts)

            def viol(Zt):
                """ℓ1 total violation — the exact-penalty merit term."""
                return jnp.sum(viol_terms(Zt))

            def viol_inf(Zt):
                """Worst single-row violation — the user-facing diagnostic."""
                return jnp.max(viol_terms(Zt))

            def merit(Zt, mu):
                return obj(Zt) + mu * viol(Zt)

            def sqp_body(carry):
                Zt, y_d, it, step_norm, mu, tr, _, lam_c, _, _ = carry
                Z, eps = split(Zt)
                (Y0, xend, S, Jy, Jx, Js, gcv, Jgc) = constraint_data(
                    p, Zt, x0_hat, lastu0, Df, Dh, d, D_hat, yk)
                g = grad_f(Zt)
                # --- KKT residual at the CURRENT iterate with the carried
                # multiplier estimates (the per-lane honesty signal: the
                # old fleet "converged" was feasibility-only) — reuses the
                # constraint values/Jacobians already computed above, no
                # extra rollouts.  Worst single-row violation:
                U0v = p["Pu"] @ Z + Tu_lastu0
                DUv = Z[:nDU]
                vparts = [
                    jnp.max(jnp.maximum(p["U0min"] - p["C_umin"] * eps - U0v,
                                        0.0), initial=0.0),
                    jnp.max(jnp.maximum(U0v - p["U0max"] - p["C_umax"] * eps,
                                        0.0), initial=0.0),
                    jnp.max(jnp.maximum(p["DUmin"] - p["C_dumin"] * eps - DUv,
                                        0.0), initial=0.0),
                    jnp.max(jnp.maximum(DUv - p["DUmax"] - p["C_dumax"] * eps,
                                        0.0), initial=0.0),
                    jnp.max(jnp.maximum(p["Y0min"] - p["C_ymin"] * eps - Y0,
                                        0.0), initial=0.0),
                    jnp.max(jnp.maximum(Y0 - p["Y0max"] - p["C_ymax"] * eps,
                                        0.0), initial=0.0),
                    jnp.max(jnp.maximum(p["x0min"] - p["c_xmin"] * eps - xend,
                                        0.0), initial=0.0),
                    jnp.max(jnp.maximum(xend - p["x0max"] - p["c_xmax"] * eps,
                                        0.0), initial=0.0),
                ]
                if neq:
                    vparts.append(jnp.max(jnp.abs(S), initial=0.0))
                if nw:
                    Wv_now = W_of(U0v, Y0)
                    vparts.append(jnp.max(jnp.maximum(
                        p["Wmin_b"] - p["C_wmin"] * eps - Wv_now, 0.0),
                        initial=0.0))
                    vparts.append(jnp.max(jnp.maximum(
                        Wv_now - p["Wmax_b"] - p["C_wmax"] * eps, 0.0),
                        initial=0.0))
                if nc:
                    vparts.append(jnp.max(jnp.maximum(gcv, 0.0),
                                          initial=0.0))
                if n_eps:
                    vparts.append(jnp.maximum(-eps, 0.0))
                viol_now = jnp.max(jnp.stack(vparts))
                if use_exact_h:
                    # Exact Lagrangian Hessian ∇²J + Σᵢ yᵢ∇²cᵢ with the
                    # PREVIOUS iteration's multipliers (the reference's ±
                    # exact-Hessian axis, nonlinmpc.jl:27-29).  Only the
                    # nonlinear row families contribute curvature: Ŷ rows
                    # (∓Y0), W rows (∓Wy_pred·Y0), terminal rows (∓xend),
                    # gc rows (+gc) and the defect equalities (+S, via the
                    # nullspace multipliers λ carried from the last solve);
                    # U/ΔU/ϵ/trust rows are linear in Z̃.
                    m_u, m_y = nu * Hp, ny * Hp
                    o = 2 * m_u + 2 * nDU
                    w_yrow = y_d[o + m_y:o + 2 * m_y] - y_d[o:o + m_y]
                    o += 2 * m_y
                    if nw:
                        w_yrow = w_yrow + p["Wy_pred"].T @ (
                            y_d[o + nW:o + 2 * nW] - y_d[o:o + nW])
                        o += 2 * nW
                    w_xrow = (y_d[o + nx_hat:o + 2 * nx_hat]
                              - y_d[o:o + nx_hat])
                    o += 2 * nx_hat
                    y_gc = y_d[o:o + nc] if nc else None

                    def lag_nl(Zt_):
                        Z_, eps_ = split(Zt_)
                        Y0_, xend_, S_, U0_ = rollout(p, Z_, x0_hat, lastu0,
                                                      Df, Dh)
                        t = w_yrow @ Y0_ + w_xrow @ xend_
                        if neq:
                            t = t + lam_c @ S_
                        if nc:
                            Ue_, Ye_, De_ = extended(p, U0_, Y0_, d, D_hat,
                                                     yk)
                            t = t + y_gc @ jnp.asarray(
                                gc(Ue_, Ye_, De_, getp(p), eps_))
                        return t

                    Hraw = jax.hessian(obj)(Zt) + jax.hessian(lag_nl)(Zt)
                    # PSD projection = indefiniteness guard: the trust-region
                    # box bounds the step, the projection keeps the QP convex
                    w_e, V_e = jnp.linalg.eigh(0.5 * (Hraw + Hraw.T))
                    H = (V_e * jnp.maximum(w_e, 0.0)) @ V_e.T
                else:
                    # Gauss-Newton Hessian of tracking terms
                    PDu_t = jnp.zeros((nDU + n_eps, nZt), dt)
                    PDu_t = PDu_t.at[:nDU, :nDU].set(jnp.eye(nDU, dtype=dt))
                    if n_eps:
                        PDu_t = PDu_t.at[-1, -1].set(1.0)
                    Pu_t = jnp.hstack([p["Pu"],
                                       jnp.zeros((nu * Hp, n_eps), dt)])
                    H = 2.0 * (Jy.T @ p["M_Hp"] @ Jy
                               + PDu_t.T @ p["Nt_Hc"] @ PDu_t
                               + Pu_t.T @ p["L_Hp"] @ Pu_t)
                    if Ewt != 0.0:
                        # exact Hessian of the economic term for EMPC
                        # curvature, projected to its PSD part
                        He = jax.hessian(je_only)(Zt)
                        w_e, V_e = jnp.linalg.eigh(0.5 * (He + He.T))
                        H = H + (V_e * jnp.maximum(w_e, 0.0)) @ V_e.T
                H = H + 1e-8 * jnp.eye(nZt, dtype=dt)
                # QP over step dz: ½dᵀHd + gᵀd  s.t. linearized constraints
                U0 = p["Pu"] @ Z + Tu_lastu0
                DU = Z[:nDU]
                A_u = jnp.hstack([p["Pu"], jnp.zeros((nu * Hp, n_eps), dt)])
                rows = []
                lo, up = [], []

                def add(Arow, lower, upper):
                    rows.append(Arow)
                    lo.append(lower)
                    up.append(upper)

                ceps_u_min = p["C_umin"][:, None] if n_eps else jnp.zeros((nu * Hp, 0), dt)
                ceps_u_max = p["C_umax"][:, None] if n_eps else jnp.zeros((nu * Hp, 0), dt)
                # U rows (two one-sided soft rows)
                add(-jnp.hstack([p["Pu"], ceps_u_min]),
                    jnp.full(nu * Hp, -2e18, dt),
                    -(p["U0min"] - p["C_umin"] * eps - U0))
                add(jnp.hstack([p["Pu"], -ceps_u_max]),
                    jnp.full(nu * Hp, -2e18, dt),
                    p["U0max"] + p["C_umax"] * eps - U0)
                # ΔU rows
                ceps_du_min = p["C_dumin"][:, None] if n_eps else jnp.zeros((nDU, 0), dt)
                ceps_du_max = p["C_dumax"][:, None] if n_eps else jnp.zeros((nDU, 0), dt)
                PDuZ = jnp.hstack([jnp.eye(nDU, nZ, dtype=dt), jnp.zeros((nDU, n_eps), dt)])
                add(-jnp.hstack([PDuZ[:, :nZ], ceps_du_min]),
                    jnp.full(nDU, -2e18, dt),
                    -(p["DUmin"] - p["C_dumin"] * eps - DU))
                add(jnp.hstack([PDuZ[:, :nZ], -ceps_du_max]),
                    jnp.full(nDU, -2e18, dt),
                    p["DUmax"] + p["C_dumax"] * eps - DU)
                # Ŷ rows (linearized; Jy already includes the ϵ column = 0)
                Jy_eps_min = Jy.at[:, -1].add(p["C_ymin"]) if n_eps else Jy
                Jy_eps_max = Jy.at[:, -1].add(-p["C_ymax"]) if n_eps else Jy
                add(-Jy_eps_min, jnp.full(ny * Hp, -2e18, dt),
                    -(p["Y0min"] - p["C_ymin"] * eps - Y0))
                add(Jy_eps_max, jnp.full(ny * Hp, -2e18, dt),
                    p["Y0max"] + p["C_ymax"] * eps - Y0)
                # custom linear constraint W rows (linearized Wy term via Jy)
                if nw:
                    W0 = W_of(U0, Y0)
                    Jw = p["Wy_pred"] @ Jy + p["Wu_fold"] @ A_u
                    Jw_min = Jw.at[:, -1].add(p["C_wmin"]) if n_eps else Jw
                    Jw_max = Jw.at[:, -1].add(-p["C_wmax"]) if n_eps else Jw
                    add(-Jw_min, jnp.full(nW, -2e18, dt),
                        -(p["Wmin_b"] - p["C_wmin"] * eps - W0))
                    add(Jw_max, jnp.full(nW, -2e18, dt),
                        p["Wmax_b"] + p["C_wmax"] * eps - W0)
                # terminal rows
                Jx_min = Jx.at[:, -1].add(p["c_xmin"]) if n_eps else Jx
                Jx_max = Jx.at[:, -1].add(-p["c_xmax"]) if n_eps else Jx
                add(-Jx_min, jnp.full(nx_hat, -2e18, dt),
                    -(p["x0min"] - p["c_xmin"] * eps - xend))
                add(Jx_max, jnp.full(nx_hat, -2e18, dt),
                    p["x0max"] + p["c_xmax"] * eps - xend)
                # custom nonlinear constraints gc ≤ 0
                if nc:
                    add(Jgc, jnp.full(nc, -2e18, dt), -gcv)
                # ϵ ≥ 0 step bound
                if n_eps:
                    e_row = jnp.zeros((1, nZt), dt).at[0, -1].set(1.0)
                    add(e_row, jnp.atleast_1d(-eps), jnp.full(1, 2e18, dt))
                A = jnp.vstack(rows)
                l = jnp.concatenate(lo)
                u_b = jnp.concatenate(up)
                # relative stationarity ‖∇f + Aᵀy + Jsᵀλ‖∞/(1+‖∇f‖∞) with
                # the CARRIED multiplier estimates (dual warm start makes
                # them consistent with this iterate near convergence);
                # trust-row duals are excluded — an active trust box means
                # not-converged, which the step-norm test already catches
                grad_L = g + A.T @ y_d[:A.shape[0]]
                if neq:
                    grad_L = grad_L + Js.T @ lam_c
                stat_now = (jnp.linalg.norm(grad_L, jnp.inf)
                            / (1.0 + jnp.linalg.norm(g, jnp.inf)))
                # dual warm start: the QP multipliers stabilize across SQP
                # iterations, and ADMM converges in far fewer sweeps from the
                # previous iteration's y (the primal step dz → 0 near the
                # optimum, so x0=0 is already the right primal start)
                if neq:
                    # Linearized defect equalities Js·dz = −S handled EXACTLY
                    # by nullspace elimination (dz = dp + N v): ADMM left with
                    # a tiny inequality-only reduced QP it solves accurately.
                    # (Stacking the neq≈nx̂·Hp equality rows into ADMM gave
                    # inexact steps that stalled the OC swing-up at |S|≈6.)
                    nv = nZt - neq
                    if use_struct:
                        # STRUCTURED nullspace for plain MultipleShooting
                        # (round-5): the generic complete QR of the
                        # (nZt, neq) defect Jacobian is a serial Householder
                        # chain — 131 ms/SQP-iteration at the pendulum fleet
                        # shape (B=4096, 47×45), THE per-iteration cost on
                        # TPU (CLAUDE.md: serial linalg in jitted loops).
                        # The MS defect rows are block-bidiagonal with
                        # ∂S_j/∂x̂_j = −I exactly (outputs_ms: S =
                        # F(x̂_{j-1}, u) − x̂_j), so:
                        # * null basis by sensitivity propagation:
                        #   N_raw = [[I_nv]; [T]], Jx·T = −J_du — an
                        #   Hp-step forward scan of (nx̂, nx̂) matvecs;
                        # * thin QR of (nZt, nv≈nu·Hc) orthonormalizes it
                        #   (~6 ms).  Orthonormality is LOAD-BEARING in
                        #   f32: the raw condensing basis carries the
                        #   e^{λ·Hp·Ts} sensitivity chains that broke
                        #   SingleShooting;
                        # * minimal-norm equality solves project a
                        #   particular solution: x − Nn(Nnᵀx);
                        # * equality multipliers from the X̂-block rows:
                        #   Jxᵀλ = −r_x (backward scan).
                        JsX = Js[:, nDU:nDU + neq]
                        Jdu_c = jnp.concatenate(
                            [Js[:, :nDU], Js[:, nDU + neq:]], axis=1)
                        sub = JsX.reshape(Hp, nx_hat, Hp, nx_hat)
                        jj = jnp.arange(1, Hp)
                        Ablk = sub[jj, :, jj - 1, :]     # (Hp-1, nx̂, nx̂)

                        def jx_solve(Bmat):
                            """Jx·T = B by forward substitution
                            (row j: A_j t_{j-1} − t_j = b_j)."""
                            Bs = Bmat.reshape(Hp, nx_hat, -1)
                            t0_ = -Bs[0]

                            def fwd(tp, inp):
                                Aj, bj = inp
                                tj = Aj @ tp - bj
                                return tj, tj

                            _, trest = jax.lax.scan(fwd, t0_,
                                                    (Ablk, Bs[1:]))
                            return jnp.concatenate(
                                [t0_[None], trest], 0).reshape(neq, -1)

                        T_sens = jx_solve(-Jdu_c)
                        N_raw = jnp.zeros((nZt, nv), dt)
                        N_raw = N_raw.at[:nDU, :nDU].set(
                            jnp.eye(nDU, dtype=dt))
                        N_raw = N_raw.at[nDU:nDU + neq, :].set(T_sens)
                        if n_eps:
                            N_raw = N_raw.at[-1, -1].set(1.0)
                        # statically-unrolled modified Gram–Schmidt (two
                        # passes — "twice is enough"): nv ≈ nu·Hc is tiny
                        # and even a thin batched jnp QR costs ~6 ms per
                        # SQP iteration at fleet shape; the identity block
                        # guarantees independence (‖col‖ ≥ 1), so no
                        # pivoting/guarding is needed
                        cols = []
                        for ci in range(nv):
                            v_c = N_raw[:, ci]
                            for _ in range(2):
                                for q_c in cols:
                                    v_c = v_c - (q_c @ v_c) * q_c
                            v_c = v_c / jnp.linalg.norm(v_c)
                            cols.append(v_c)
                        Nn = jnp.stack(cols, axis=1)     # thin (nZt, nv)

                        def eq_min_norm(rhs):
                            """Minimal-norm x with Js·x = rhs."""
                            x_any = jnp.zeros(nZt, dt).at[
                                nDU:nDU + neq].set(jx_solve(
                                    rhs[:, None])[:, 0])
                            return x_any - Nn @ (Nn.T @ x_any)

                        def eq_mult(resid_):
                            """λ with Jsᵀλ = −resid (X̂-block rows):
                            λ_j = r_j + A_{j+1}ᵀ λ_{j+1}, backward."""
                            rs = resid_[nDU:nDU + neq].reshape(Hp, nx_hat)
                            lam_last = rs[Hp - 1]

                            def bwd(ln, inp):
                                Aj1, rj = inp
                                lj = rj + Aj1.T @ ln
                                return lj, lj

                            _, lrest = jax.lax.scan(
                                bwd, lam_last, (Ablk, rs[:-1]),
                                reverse=True)
                            return jnp.concatenate(
                                [lrest, lam_last[None]], 0).reshape(neq)
                    else:
                        Qf, Rf = jnp.linalg.qr(Js.T, mode="complete")
                        Q1, Nn = Qf[:, :neq], Qf[:, neq:]
                        Rsq = Rf[:neq, :]

                        def eq_min_norm(rhs):
                            return Q1 @ jax.scipy.linalg.solve_triangular(
                                Rsq.T, rhs, lower=True)

                        def eq_mult(resid_):
                            return jax.scipy.linalg.solve_triangular(
                                Rsq, -(Q1.T @ resid_), lower=False)

                    dp = eq_min_norm(-S)
                    Hr = Nn.T @ H @ Nn
                    gr = Nn.T @ (g + H @ dp)
                    # trust-region box on the tangential step ‖v‖∞ ≤ Δ: a
                    # bounded step re-optimized inside the box beats damping an
                    # over-long Newton direction (the swing-up crawled at
                    # α=0.01 along |dz|≈4 steps far outside the linearization's
                    # validity; the normal step dp stays full — restoration)
                    A_r = jnp.vstack([A @ Nn, jnp.eye(nv, dtype=dt)])
                    l_r = jnp.concatenate([l - A @ dp, jnp.full(nv, -1.0, dt) * tr])
                    u_r = jnp.concatenate([u_b - A @ dp, jnp.full(nv, 1.0, dt) * tr])
                    if use_as:
                        # exact GI pivots on the tiny reduced QP (nv ≈ nu·Hc),
                        # active set warm-started across SQP iterations
                        sol = solve_qp_active(Hr, gr, A_r, l_r, u_r, y0=y_d)
                    else:
                        sol = solve_qp(Hr, gr, A_r, l_r, u_r,
                                       y0=y_d, max_iter=500)
                    dz = dp + Nn @ sol.x
                    # equality multipliers from stationarity (for the μ rule);
                    # the trust rows act on v = Nnᵀdz, so their duals enter
                    # through Nn
                    m_in = A.shape[0]
                    resid = (H @ dz + g + A.T @ sol.y[:m_in]
                             + Nn @ sol.y[m_in:])
                    lam = eq_mult(resid)
                    lam_new = lam
                    dual_inf = jnp.maximum(jnp.linalg.norm(sol.y[:m_in], jnp.inf),
                                           jnp.linalg.norm(lam, jnp.inf))
                    # Second-order correction: the ℓ1 merit rejects the full
                    # step when defect curvature reintroduces |S| at Zt+dz
                    # (Maratos-type crawl: swing-up steps accepted only at
                    # α=0.01).  Re-evaluate the defects at the trial point and
                    # take the minimal-norm restoration c = −Js⁺S(Zt+dz)
                    # (Nocedal & Wright §15.6, reusing the factorization
                    # above); the line search tries Zt + α·dz + α²·c so SOC
                    # vanishes as α→0.
                    def S_of(Zt_):
                        Z_, _ = split(Zt_)
                        _, _, S_, _ = rollout(p, Z_, x0_hat, lastu0, Df, Dh)
                        return S_

                    c_soc = eq_min_norm(-S_of(Zt + dz))
                else:
                    A_r = jnp.vstack([A, jnp.eye(nZt, dtype=dt)])
                    l_r = jnp.concatenate([l, jnp.full(nZt, -1.0, dt) * tr])
                    u_r = jnp.concatenate([u_b, jnp.full(nZt, 1.0, dt) * tr])
                    if use_as:
                        sol = solve_qp_active(H, g, A_r, l_r, u_r, y0=y_d)
                    else:
                        sol = solve_qp(H, g, A_r, l_r, u_r, y0=y_d,
                                       max_iter=500)
                    dz = sol.x
                    lam_new = lam_c
                    dual_inf = jnp.linalg.norm(sol.y[:A.shape[0]], jnp.inf)
                    c_soc = jnp.zeros_like(dz)
                # ℓ1 exact-penalty parameter: must dominate the constraint
                # multipliers (Nocedal & Wright Thm 17.3) or the line search
                # accepts objective-reducing steps that never restore
                # feasibility (observed: OC swing-up stuck at |S|≈6 while J
                # kept falling with a fixed μ=1e4 ≪ J-scale duals)
                # (bounded decrease allowed — a μ ratcheted up by early large
                # duals makes the merit reject good late steps whose tiny viol
                # increase it overweights)
                mu = jnp.clip(mu, 2.0 * dual_inf, 20.0 * dual_inf + 1e3)
                # parallel ℓ1-merit line search (dtype follows the iterate —
                # a float64 alphas constant silently upcasts the whole loop)
                alphas = jnp.asarray(alphas_f, Zt.dtype)
                merits = jax.vmap(
                    lambda a: merit(Zt + a * dz + (a * a) * c_soc, mu))(alphas)
                merits = jnp.where(jnp.isnan(merits), jnp.inf, merits)
                best = jnp.argmin(merits)
                improve = merits[best] <= merit(Zt, mu)
                a = jnp.where(improve, alphas[best], 0.0)
                dz_soc = a * dz + (a * a) * c_soc
                Zt_new = Zt + dz_soc
                sn = jnp.linalg.norm(dz_soc, jnp.inf)
                # radius update from the accepted step fraction: a full step
                # means the model is trusted (grow); a damped/rejected step
                # means the box is still too large (shrink — the NEXT direction
                # is then re-optimized at the shorter length)
                tr = jnp.where(a >= 0.99, jnp.minimum(tr * 2.0, 1e5),
                     jnp.where(a == 0.0, tr * 0.25,
                     jnp.where(a <= 0.11, tr * 0.5, tr)))
                tr = jnp.maximum(tr, 1e-3)
                return (Zt_new, sol.y, it + 1, sn, mu, tr, a, lam_new,
                        stat_now, viol_now)

            def sqp_cond(carry):
                _, _, it, step_norm, _, tr, a, _, stat, viol_c = carry
                retry = (a == 0.0) & (tr > 1.1e-3)  # rejected, can still shrink
                kkt_ok = ((kkt_tol > 0.0) & (stat < kkt_tol)
                          & (viol_c < kkt_feas_tol))
                return (it < sqp_iters) & ((it < 2)
                                           | ((step_norm > sqp_tol)
                                              & ~kkt_ok) | retry)

            Zt0 = Zs
            n_in = (2 * nu * Hp + 2 * nDU + 2 * ny * Hp + 2 * nW
                    + 2 * nx_hat + nc + n_eps)
            n_dual = n_in + (nZt - neq if neq else nZt)
            # cross-solve dual warm start (the receding-horizon active set is
            # nearly stationary; linmpc.py persists y_dual the same way)
            y0 = (jnp.zeros(n_dual, dt) if y_prev is None
                  else jnp.asarray(y_prev, dt))
            Zt, y_d, iters, sn, _, _, _, _, stat_f, _ = jax.lax.while_loop(
                sqp_cond, sqp_body,
                (Zt0, y0, jnp.array(0), jnp.asarray(jnp.inf, dt),
                 jnp.asarray(1e4, dt), jnp.asarray(tr0, dt),
                 jnp.asarray(1.0, dt), jnp.zeros(max(neq, 0), dt),
                 jnp.asarray(jnp.inf, dt), jnp.asarray(jnp.inf, dt)))
            J_final = obj(Zt)
            viol_final = viol_inf(Zt)
            # final rollout for getinfo diagnostics
            Zf, eps_f = split(Zt)
            Y0f, xendf, _, U0f = rollout(p, Zf, x0_hat, lastu0, Df, Dh)
            # receding input, clamped to the (soft-relaxed) actuator box: the
            # SQP's linearized subproblem may be locally infeasible mid-
            # transient, and the applied u must always respect hard u bounds
            u0 = Zt[:nu] + lastu0
            u0 = jnp.clip(u0,
                          p["U0min"][:nu] - p["C_umin"][:nu] * eps_f,
                          p["U0max"][:nu] + p["C_umax"][:nu] * eps_f)
            u = u0 + p["uop"]
            # stat_f: the KKT stationarity residual of the LAST iteration's
            # exit check (the value that gated convergence); per-lane honest
            # convergence = (stat_f < kkt_tol) & (viol_final < feas tol)
            return (u, Zt, Zs, y_d, J_final, viol_final, stat_f, iters,
                    Y0f, xendf, U0f)

        @jit32
        def diag(p, x0_hat, lastu0, d0, D_hat_0, R_y, R_u, yk, ry, Zt):
            """Derivative/constraint dumps at the optimum for getinfo —
            the reference's addinfo! diagnostics (nonlinmpc.jl:565-660):
            ∇J, the nonlinear inequality values g (Ŷ/terminal/custom rows,
            con_nonlinprog! layout), and the defect equalities geq."""
            d = d0 + p["dop"]
            D_hat = D_hat_0 + jnp.tile(p["dop"], Hp) if nd else D_hat_0
            if nd:
                Dall = jnp.concatenate([d0, D_hat_0]).reshape(Hp + 1, nd)
                Df, Dh = Dall[:-1], Dall[1:]
            else:
                Df = Dh = jnp.zeros((Hp, 0), x0_hat.dtype)
            obj = lambda Zt_: objective(p, Zt_, x0_hat, lastu0, Df, Dh,
                                        R_y, R_u, d, D_hat, yk)
            gJ = jax.grad(obj)(Zt)
            Z_, eps_ = split(Zt)
            Y0, xend, S, U0 = rollout(p, Z_, x0_hat, lastu0, Df, Dh)
            g_rows = [p["Y0min"] - p["C_ymin"] * eps_ - Y0,
                      Y0 - p["Y0max"] - p["C_ymax"] * eps_,
                      p["x0min"] - p["c_xmin"] * eps_ - xend,
                      xend - p["x0max"] - p["c_xmax"] * eps_]
            if nc:
                Ue, Ye, De = extended(p, U0, Y0, d, D_hat, yk)
                g_rows.append(jnp.asarray(gc(Ue, Ye, De, getp(p), eps_)))
            return obj(Zt), gJ, jnp.concatenate(g_rows), S

        return step, diag

    # ------------------------------------------------------------------
    def setmodel(self, model=None, Mwt=None, Nwt=None, Lwt=None,
                 Qhat=None, Rhat=None):
        """Hot-swap a LinModel-backed NonLinMPC's plant/weights at runtime
        (setmodel!, controller/execute.jl:621-699).  Constraint bounds are
        preserved across the rebuild (re-expressed in the new operating
        point); ``lastu0`` is rebased."""
        model_old = self.estim.model
        bound_keys = ("U0min", "U0max", "DUmin", "DUmax", "Y0min", "Y0max",
                      "x0min", "x0max", "C_umin", "C_umax", "C_dumin",
                      "C_dumax", "C_ymin", "C_ymax", "c_xmin", "c_xmax",
                      "Wmin_b", "Wmax_b", "C_wmin", "C_wmax")
        saved = {k: getattr(self, k).copy() for k in bound_keys}
        if model is not None:
            Umin = saved["U0min"] + self.Uop
            Umax = saved["U0max"] + self.Uop
            Ymin = saved["Y0min"] + self.Yop
            Ymax = saved["Y0max"] + self.Yop
            xmin = saved["x0min"] + self.estim.xop_hat
            xmax = saved["x0max"] + self.estim.xop_hat
            lastu_abs = self.lastu0 + model_old.uop
            self.estim.setmodel(model, Qhat=Qhat, Rhat=Rhat)
            self.Uop = np.tile(model.uop, self.Hp)
            self.Yop = np.tile(model.yop, self.Hp)
            self.Dop = np.tile(model.dop, self.Hp)
            saved["U0min"] = _clipinf(Umin - self.Uop)
            saved["U0max"] = _clipinf(Umax - self.Uop)
            saved["Y0min"] = _clipinf(Ymin - self.Yop)
            saved["Y0max"] = _clipinf(Ymax - self.Yop)
            saved["x0min"] = _clipinf(xmin - self.estim.xop_hat)
            saved["x0max"] = _clipinf(xmax - self.estim.xop_hat)
            self.lastu0 = lastu_abs - model.uop
        elif Qhat is not None or Rhat is not None:
            self.estim.setmodel(Qhat=Qhat, Rhat=Rhat)
        if Mwt is not None or Nwt is not None or Lwt is not None:
            w = self.weights
            model_ = self.estim.model
            # unchanged weights keep their FULL matrices (a custom M_Hp must
            # not collapse to its first diagonal block)
            self.weights = ControllerWeights(
                model_.nu, model_.ny, self.Hp, self.Hc,
                Mwt, Nwt, Lwt,
                M_Hp=None if Mwt is not None else w.M_Hp,
                N_Hc=None if Nwt is not None else w.N_Hc,
                L_Hp=None if Lwt is not None else w.L_Hp,
                Cwt=w.Cwt, Ewt=w.Ewt)
        self._build(rebuild_step=model is not None)
        for k, v in saved.items():
            getattr(self, k)[:] = v
        return self

    def setparam(self, p):
        """Swap the user parameter ``p`` of JE/gc at runtime (the reference
        mutates ``mpc.p`` in place, test :930).  Numeric pytrees swap as
        params data (same structure → no retrace); anything else rebuilds
        the jitted step."""
        self.p = p
        p_num = _numeric_p(p)
        if self._p_traced and p_num is not None and \
                jax.tree.structure(p_num) == jax.tree.structure(
                    self.params["p_user"]):
            self.params["p_user"] = p_num
            self._params_version += 1
        else:
            self._build(rebuild_step=True)
        return self

    def initstate(self, u, ym, d=None):
        x = super().initstate(u, ym, d)
        self._solved_once = False   # re-enable the MS/collocation cold start
        self.y_dual = None          # fresh episode: drop stale QP duals
        return x

    # ------------------------------------------------------------------
    def moveinput(self, ry=None, d=None, D_hat=None, R_hat_y=None,
                  R_hat_u=None, lastu=None, **alias):
        model, estim = self.estim.model, self.estim
        if estim.direct and not estim.prepared:
            import warnings
            warnings.warn("preparestate should be called before moveinput")
        D_hat = D_hat if D_hat is not None else alias.pop("Dhat", None)
        R_hat_y = R_hat_y if R_hat_y is not None else alias.pop("Rhaty", None)
        R_hat_u = R_hat_u if R_hat_u is not None else alias.pop("Rhatu", None)
        alias.pop("Dhat", None); alias.pop("Rhaty", None)
        alias.pop("Rhatu", None)
        if alias:
            raise TypeError(f"unknown moveinput arguments: {sorted(alias)}")
        ry, d, D_hat, R_hat_y, R_hat_u, lastu = self._prepare_args(
            ry, d, D_hat, R_hat_y, R_hat_u, lastu)
        self.lastu0 = lastu - model.uop
        d0 = d - model.dop
        D0 = D_hat - self.Dop
        yk = np.asarray(estim.evaloutput(d if model.nd else None), float)
        # InternalModel: stochastic output predictions enter the rollout
        if isinstance(estim, InternalModel):
            self.params["Ys_now"] = (self.params["Ks"] @ estim.xs_hat
                                     + self.params["Ps"] @ estim.ys_hat)
            self._params_version += 1
        if getattr(self, "_p_ver", None) != self._params_version:
            # one device_put per params version, not ~40 eager uploads/step
            self._p_cache = jax.device_put(
                jax.tree.map(np.asarray, self.params))  # p_user may be a tree
            self._p_ver = self._params_version
        p = self._p_cache
        if self.is_ms and not self._solved_once:
            if self._coldstart_fn is None:
                self._coldstart_fn = self._make_coldstart()
            self.Z_tilde = np.asarray(self._coldstart_fn(
                p, jnp.asarray(estim.x0_hat), jnp.asarray(self.lastu0),
                jnp.asarray(d0), jnp.asarray(D0)))
        y_prev = getattr(self, "y_dual", None)
        out = self._step(p, jnp.asarray(estim.x0_hat), jnp.asarray(self.lastu0),
                         jnp.asarray(d0), jnp.asarray(D0), jnp.asarray(R_hat_y),
                         jnp.asarray(R_hat_u), jnp.asarray(yk),
                         jnp.asarray(ry), jnp.asarray(self.Z_tilde),
                         None if y_prev is None else jnp.asarray(y_prev))
        u, Zt, Zs, y_d, J, viol, stat, iters, Y0f, xendf, U0f = out
        self.y_dual = np.asarray(y_d)
        self._solved_once = True
        self.lastu0_at_solve = self.lastu0.copy()
        self.Z_tilde = np.asarray(Zt)
        self.R_hat_y, self.R_hat_u = R_hat_y, R_hat_u
        self._last = dict(J=float(J), viol=float(viol), stat=float(stat),
                          iters=int(iters),
                          d=d, D_hat=D_hat, Y0=np.asarray(Y0f),
                          xend=np.asarray(xendf), U0=np.asarray(U0f),
                          yk=yk.copy(), failed=False,
                          # solve-point args for getinfo's derivative dumps
                          x0_hat=np.asarray(estim.x0_hat, float).copy(),
                          d0=d0.copy(), D0=D0.copy(), ry=ry.copy())
        u = np.asarray(u)
        if not np.isfinite(float(J)) or float(viol) > 1e-2:
            # reference failure policy (controller/execute.jl:499-504): warn
            # and apply the SHIFTED WARM START as the plan (graceful open-loop
            # degradation), never the violated solution
            import warnings
            warnings.warn(f"NonLinMPC solution is poor (J={float(J):.3g}, "
                          f"max violation={float(viol):.3g}); applying the "
                          f"shifted warm start instead — inspect getinfo()")
            Zs = np.asarray(Zs)
            self.Z_tilde = Zs
            u0 = Zs[:model.nu] + self.lastu0
            u0 = np.clip(u0, self.U0min[:model.nu], self.U0max[:model.nu])
            u = u0 + model.uop
            self._last["failed"] = True
            import logging
            from .base import info2debugstr
            logging.getLogger("mpc_tpu").debug(info2debugstr(self.getinfo()))
        self.lastu0 = u - model.uop
        return u

    def getinfo(self):
        model = self.estim.model
        nu = model.nu
        info = {}
        Z = self.Z_tilde[:self.nZ]
        info["DeltaU"] = info["ΔU"] = Z[:nu * self.Hc]
        info["epsilon"] = info["ϵ"] = float(self.Z_tilde[-1]) if self.n_eps else 0.0
        info["J"] = self._last.get("J")
        info["viol"] = self._last.get("viol")
        # relative KKT stationarity residual at the exit check (see
        # _make_step; the reference exposes the solver's termination status
        # per solve, src/general.jl:44-61)
        info["kkt_stat"] = self._last.get("stat")
        info["iters"] = self._last.get("iters")
        U0 = self._last.get("U0")
        if U0 is None:
            U0 = self.params["Pu"] @ Z + self.params["Tu"] @ getattr(
                self, "lastu0_at_solve", self.lastu0)
        info["U"] = U0 + self.Uop
        info["u"] = info["U"][:nu]
        info["lastu"] = getattr(self, "lastu0_at_solve", self.lastu0) + model.uop
        info["d"] = self._last.get("d")
        info["Dhat"] = info["D̂"] = self._last.get("D_hat")
        if self._last.get("Y0") is not None:
            info["Yhat"] = info["Ŷ"] = self._last["Y0"] + self.Yop
        if self._last.get("xend") is not None:
            info["xhatend"] = info["x̂end"] = (self._last["xend"]
                                              + self.estim.xop_hat)
        info["Rhaty"] = info["R̂y"] = getattr(self, "R_hat_y", None)
        info["Rhatu"] = info["R̂u"] = getattr(self, "R_hat_u", None)
        info["xhat"] = info["x̂"] = self.estim.x0_hat + self.estim.xop_hat
        estim = self.estim
        yk = self._last.get("yk")
        if yk is not None:
            info["yhat"] = info["ŷ"] = np.asarray(yk, float)
        else:   # pre-solve: current estimator output (needs d when nd > 0)
            d_now = self._last.get("d", model.dop)
            info["yhat"] = info["ŷ"] = np.asarray(
                estim.evaloutput(d_now if model.nd else None), float)
        if isinstance(estim, InternalModel):
            info["Yhats"] = info["Ŷs"] = np.asarray(self.params["Ys_now"])
        else:
            info["Yhats"] = info["Ŷs"] = np.zeros(model.ny * self.Hp)
        # economic cost and custom constraints at the optimum
        # (addinfo!, nonlinmpc.jl:565-580)
        if info.get("Ŷ") is not None and info.get("d") is not None:
            Ue = np.concatenate([info["U"], info["U"][-nu:]])
            Ye = np.concatenate([info["ŷ"], info["Ŷ"]])
            De = np.concatenate([np.asarray(info["d"], float),
                                 np.asarray(info["D̂"], float)])
            eps = info["ϵ"]
            info["JE"] = float(np.asarray(self.JE(Ue, Ye, De, self.p, eps)))
            if self.gc is not None and self.nc:
                info["gc"] = np.asarray(self.gc(Ue, Ye, De, self.p, eps))
            else:
                info["gc"] = np.zeros(0)
        # derivative dumps + solution summary at the optimum (the reference's
        # addinfo! diagnostics, nonlinmpc.jl:565-660 / execute.jl:145-198)
        if self._last.get("x0_hat") is not None:
            L = self._last
            Ja, gJ, g_vals, geq = self._diag(
                self._p_cache,
                jnp.asarray(L["x0_hat"]),
                jnp.asarray(getattr(self, "lastu0_at_solve", self.lastu0)),
                jnp.asarray(L["d0"]), jnp.asarray(L["D0"]),
                jnp.asarray(self.R_hat_y), jnp.asarray(self.R_hat_u),
                jnp.asarray(L["yk"]), jnp.asarray(L["ry"]),
                jnp.asarray(self.Z_tilde))
            info["gradJ"] = info["∇J"] = np.asarray(gJ)
            info["g"] = np.asarray(g_vals)
            info["geq"] = np.asarray(geq)
            info["sol"] = dict(
                solver="SQP (GN Hessian + "
                       f"{'active-set' if self.qp_solver == 'active_set' else 'ADMM'} QP)",
                iterations=self._last.get("iters"),
                objective=self._last.get("J"),
                max_violation=self._last.get("viol"),
                defect_norm=float(np.max(np.abs(np.asarray(geq))))
                if np.asarray(geq).size else 0.0,
                failed=self._last.get("failed", False),
                nZt=self.nZt)
        return info

    def __repr__(self):
        model = self.estim.model
        return (f"NonLinMPC controller with a sample time Ts = {model.Ts} s:\n"
                f"├ estimator: {type(self.estim).__name__}\n"
                f"├ model: {type(model).__name__}\n"
                f"├ optimizer: SQP (jax, GN Hessian + ADMM QP)\n"
                f"├ transcription: {type(self.transcription).__name__}\n"
                f"└ dimensions: Hp={self.Hp}, Hc={self.Hc}, nu={model.nu}, "
                f"nx̂={self.estim.nx_hat}, nZ̃={self.nZt}")
