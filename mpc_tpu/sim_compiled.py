"""Compiled closed-loop simulation: the whole N-step loop as ONE device
program.

``mpc_tpu.sim`` mirrors the reference's ``sim!`` (plot_sim.jl:253-319) as a
host loop — one jitted solve per step, with host<->device round trips for
every sample.  On TPU the round trips dominate (a tunneled chip costs
~175 ms per eager op), and even on CPU the per-step dispatch is ~10x the
math.  ``CompiledClosedLoop`` removes the loop from the host entirely:
plant output, estimator correction, condensed-QP solve, receding-horizon
input extraction, plant update, and estimator prediction are one
``lax.scan`` body, so an N-step closed loop is a single XLA call whose
per-step cost is pure device compute.

Supported today: ``LinMPC`` with a SteadyKalmanFilter, Luenberger, or
time-varying KalmanFilter (P̂ carried through the scan), ``direct=True``,
against a ``LinModel`` plant — the reference's README/CSTR configuration.  Disturbance-injection
kwargs mirror ``sim`` (u_step/u_noise/y_step/y_noise/d_step/d_noise/
x_noise) with identical RNG draw order, so traces match the host loop
exactly, noise included.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .utils.config import jit32

from .controllers.linmpc import LinMPC
from .controllers.slmpc import SLMPC
from .estimators.kalman import KalmanFilter, SteadyKalmanFilter
from .estimators.luenberger import Luenberger
from .models import LinModel, NonLinModel
from .sim import SimResult, _copy_model


def _cast_tree(tree, dtc):
    """Cast every floating leaf to ``dtc`` host-side (f32 TPU mode) — one
    pass before the single device_put.

    The GI cross-period operator state is EXEMPT: the solver carries
    ``gis_Ginv`` in its internal hi precision (f64 whenever x64 is
    enabled, the mixed-precision slot space) and a downcast here would
    make the lax.scan carry dtypes mismatch the solver's output."""
    if dtc is None:
        return tree
    np_dt = np.dtype(dtc)

    def cast(path, a):
        if any(getattr(k, "key", None) == "gis_Ginv" for k in path):
            return a
        a = np.asarray(a)
        return a.astype(np_dt) if np.issubdtype(a.dtype, np.floating) else a

    return jax.tree_util.tree_map_with_path(cast, tree)


def _qp_state0(ctrl, B=None):
    """Initial GI cross-period operator state for a controller's compiled
    loop (None when the controller uses the ADMM backend)."""
    if getattr(ctrl, "qp_solver", "admm") != "active_set":
        return None
    from .ops.qp_active import gi_state_init
    dtc = getattr(ctrl, "_dt", None)
    like = np.float32 if (dtc is not None and
                          np.dtype(dtc) == np.float32) else np.float64
    return gi_state_init(ctrl.gi_slots, like=like, batch=B)


class CompiledClosedLoop:
    """One-`lax.scan` closed loop for a LinMPC + constant-gain estimator.

    >>> loop = CompiledClosedLoop(ctrl)            # plant = copy of model
    >>> res = loop.run(40, ry=[5.0, 0.0])          # one device call
    """

    def __init__(self, ctrl: LinMPC, plant: LinModel | None = None):
        estim = ctrl.estim
        if not isinstance(estim, (SteadyKalmanFilter, Luenberger,
                                  KalmanFilter)):
            raise TypeError(
                "CompiledClosedLoop needs a constant-gain estimator "
                "(SteadyKalmanFilter or Luenberger) or a KalmanFilter; got "
                f"{type(estim).__name__}")
        self._kf = isinstance(estim, KalmanFilter)
        if not estim.direct:
            raise ValueError("CompiledClosedLoop requires direct=True "
                             "(filter form) estimators")
        if plant is None:
            plant = _copy_model(estim.model)
        if not isinstance(plant, LinModel):
            raise TypeError("plant must be a LinModel")
        self.ctrl, self.estim, self.plant = ctrl, estim, plant
        model = estim.model
        self.nu, self.ny, self.nd = plant.nu, plant.ny, plant.nd
        self.i_ym = np.asarray(estim.i_ym, int)
        # controller params (host numpy; ONE device_put in run())
        self._p = jax.tree.map(np.asarray, ctrl.params)
        e = estim
        self._ep = dict(
            A_hat=np.asarray(e.A_hat),
            Bu_hat=np.asarray(e.Bu_hat), Cm_hat=np.asarray(e.Cm_hat),
            Ddm_hat=np.asarray(e.Ddm_hat), Bd_hat=np.asarray(e.Bd_hat),
            C_hat=np.asarray(e.C_hat), Dd_hat=np.asarray(e.Dd_hat),
            fop_m_xop=np.asarray(e.fop_hat - e.xop_hat),
            xop_hat=np.asarray(e.xop_hat),
            yop=np.asarray(model.yop), uop=np.asarray(model.uop),
            dop=np.asarray(model.dop),
            yop_m=np.asarray(model.yop)[self.i_ym])
        if self._kf:
            self._ep["Q_hat"] = np.asarray(e.Q_hat)
            self._ep["R_hat"] = np.asarray(e.R_hat)
        else:
            self._ep["K_hat"] = np.asarray(e.K_hat)
        pl = plant
        self._pp = dict(A=np.asarray(pl.A), Bu=np.asarray(pl.Bu),
                        Bd=np.asarray(pl.Bd), C=np.asarray(pl.C),
                        Dd=np.asarray(pl.Dd),
                        fop_m_xop=np.asarray(pl.fop - pl.xop),
                        xop=np.asarray(pl.xop), uop=np.asarray(pl.uop),
                        yop=np.asarray(pl.yop), dop=np.asarray(pl.dop))
        self._scan = jit32(self._make_scan(), static_argnames=("N",))

    def _make_scan(self):
        ctrl, estim = self.ctrl, self.estim
        step_raw = ctrl._step_raw
        nd, Hp = self.nd, ctrl.Hp
        i_ym = self.i_ym
        nyu = estim.nyu
        is_kf = self._kf
        if is_kf:
            from .estimators.kalman import kf_correct, kf_predict

        def body(carry, xs):
            p, ep, pp, st = carry
            ry, dk, steps, eps = xs
            u_step, y_step = steps
            eps_y, eps_u, eps_x = eps
            d0p = dk - pp["dop"] if nd else dk
            # plant output + sensor injection
            y = pp["C"] @ st["x0_p"] + pp["yop"] + y_step + eps_y
            if nd:
                y = y + pp["Dd"] @ d0p
            ym = y[i_ym]
            # estimator correction (direct form)
            d0 = dk - ep["dop"] if nd else dk
            y0m = ym - ep["yop_m"]
            x0 = st["x0_hat"]
            y0m_pred = ep["Cm_hat"] @ x0 + (ep["Ddm_hat"] @ d0 if nd else 0.0)
            if is_kf:
                x0c, Pc = kf_correct(x0, st["P_hat"], y0m_pred, y0m,
                                     ep["Cm_hat"], ep["R_hat"])
            else:
                x0c = x0 + ep["K_hat"] @ (y0m - y0m_pred)
            y_est = ep["C_hat"] @ x0c + ep["yop"] + \
                (ep["Dd_hat"] @ d0 if nd else 0.0)
            # MPC solve
            D_hat_0 = jnp.tile(d0, Hp)
            R_hat_y = jnp.tile(ry, Hp)
            R_hat_u = p["Uop"]
            nxs = p["Ks"].shape[1]
            u, Z_t, y_dual, conv, _, obj, _it, rung, qps = step_raw(
                p, x0c, st["lastu0"], d0, D_hat_0, R_hat_y, R_hat_u,
                jnp.zeros(nxs, x0.dtype),
                jnp.zeros(ep["yop_m"].shape[0] + nyu, x0.dtype),
                st["Z_tilde"], st["y_dual"], rung_prev=st["rho_rung"],
                qp_state=st["qp_state"])
            lastu0 = u - ep["uop"]
            # plant update with actuator injection + state noise
            u0p = (u + u_step + eps_u) - pp["uop"]
            x0p_n = pp["A"] @ st["x0_p"] + pp["Bu"] @ u0p + pp["fop_m_xop"]
            if nd:
                x0p_n = x0p_n + pp["Bd"] @ d0p
            x0p_n = x0p_n + eps_x
            # estimator prediction (with the *commanded* u, like sim)
            x0n = ep["A_hat"] @ x0c + ep["Bu_hat"] @ lastu0
            if nd:
                x0n = x0n + ep["Bd_hat"] @ d0
            out = dict(y=y, u=u, y_est=y_est, x_p=st["x0_p"] + pp["xop"],
                       x_hat=x0c + ep["xop_hat"], conv=conv, obj=obj)
            new_st = dict(x0_p=x0p_n, lastu0=lastu0,
                          Z_tilde=Z_t, y_dual=y_dual, rho_rung=rung,
                          qp_state=qps)
            if is_kf:
                x0n, Pn = kf_predict(x0n, Pc, ep["A_hat"], ep["Q_hat"],
                                     ep["fop_m_xop"])
                new_st["P_hat"] = Pn
            else:
                x0n = x0n + ep["fop_m_xop"]
            new_st["x0_hat"] = x0n
            return (p, ep, pp, new_st), out

        def scan(p, ep, pp, st0, ry, dks, steps, eps, N):
            (_, _, _, stN), outs = jax.lax.scan(
                body, (p, ep, pp, st0), (ry, dks, steps, eps), length=N)
            return stN, outs

        return scan

    # -- Monte-Carlo fleet: B independent closed loops in ONE device call --
    def run_fleet(self, B, N, ry=None, *, x_0=None, x_hat_0=None,
                  u_noise=None, y_noise=None, x_noise=None, d=None,
                  seed=0, mesh=None):
        """Simulate ``B`` independent N-step closed loops in one XLA call.

        Per-lane variation: noise realizations (independent draws per lane,
        lane i uses ``default_rng(seed + i)`` — identical to ``run(...,
        seed=seed+i)``), setpoints ``ry`` of shape (ny,), (B, ny) or
        (B, N, ny), initial plant states ``x_0`` (B, nx) and estimator
        states ``x_hat_0`` (B, nx̂).  Stateless: controller/plant objects
        are not advanced.  Returns a dict of stacked trajectories
        (Y (B,N,ny), U, Y_est, X, X_hat, conv).
        """
        estim, plant, model = self.estim, self.plant, self.estim.model
        nu, ny, nd, nx = self.nu, self.ny, self.nd, plant.nx
        B, N = int(B), int(N)
        ry = np.asarray(ry, float) if ry is not None else model.yop.copy()
        if ry.ndim == 1:
            Ry = np.tile(ry, (B, N, 1))
        elif ry.ndim == 2:
            Ry = np.tile(ry[:, None, :], (1, N, 1))
        else:
            Ry = ry
        d = np.asarray(d, float).ravel() if d is not None else \
            model.dop.copy()
        z = lambda v, n: np.zeros(n) if v is None else \
            np.asarray(v, float).ravel()
        u_noise, y_noise, x_noise = z(u_noise, nu), z(y_noise, ny), \
            z(x_noise, nx)
        eps_y, eps_u, eps_x = _fleet_noise(B, N, nd, ny, nu, nx, y_noise,
                                           u_noise, x_noise, seed)
        dks = np.tile(d, (B, N, 1)) if nd else np.zeros((B, N, 0))
        if x_0 is None:
            x0p = np.tile(np.asarray(plant.x0, float), (B, 1))
        else:
            x0p = np.asarray(x_0, float) - plant.xop
        if x_hat_0 is None:
            xh0 = np.tile(np.asarray(estim.x0_hat, float), (B, 1))
        else:
            xh0 = np.asarray(x_hat_0, float) - estim.xop_hat
        st0 = dict(x0_p=x0p, x0_hat=xh0, lastu0=np.zeros((B, nu)),
                   Z_tilde=np.zeros((B, self.ctrl.nZt)),
                   y_dual=np.zeros((B, self.ctrl.A_stack.shape[0])),
                   rho_rung=np.full(B, 4, np.int32),
                   qp_state=_qp_state0(self.ctrl, B))
        if self._kf:
            st0["P_hat"] = np.tile(np.asarray(estim.P_hat, float), (B, 1, 1))
        steps = (np.zeros((B, N, nu)), np.zeros((B, N, ny)))
        if getattr(self, "_vscan_N", None) != N:
            scan = self._make_scan()
            self._vscan = jit32(jax.vmap(
                lambda p, ep, pp, st0, ry, dks, steps, eps:
                scan(p, ep, pp, st0, ry, dks, steps, eps, N),
                in_axes=(None, None, None, 0, 0, 0, 0, 0)))
            self._vscan_N = N
        tree = (self._p, self._ep, self._pp, st0, Ry, dks, steps,
                (eps_y, eps_u, eps_x))
        tree = _cast_tree(tree, getattr(self.ctrl, "_dt", None))
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(mesh, P("batch"))
            rep = NamedSharding(mesh, P())
            p, ep, pp, st0, Ry, dks, steps, eps = tree
            tree = (jax.device_put((p, ep, pp), rep)
                    + jax.device_put((st0, Ry, dks, steps, eps), sh))
        else:
            tree = jax.device_put(tree)
        stN, outs = self._vscan(*tree)
        return {k: np.asarray(v) for k, v in
                dict(Y=outs["y"], U=outs["u"], Y_est=outs["y_est"],
                     X=outs["x_p"], X_hat=outs["x_hat"],
                     conv=outs["conv"]).items()}

    def run(self, N, ry=None, d=None, *, u_step=None, u_noise=None,
            y_step=None, y_noise=None, d_step=None, d_noise=None,
            x_noise=None, x_0=None, x_hat_0=None, lastu=None, seed=0):
        """Run the compiled loop; kwargs and RNG order mirror ``mpc_tpu.sim``."""
        estim, plant, model = self.estim, self.plant, self.estim.model
        nu, ny, nd, nx = self.nu, self.ny, self.nd, plant.nx
        N = int(N)
        rng = np.random.default_rng(seed)
        ry = np.asarray(ry, float) if ry is not None else model.yop.copy()
        Ry = np.tile(ry, (N, 1)) if ry.ndim == 1 else ry
        d = np.asarray(d, float).ravel() if d is not None else model.dop.copy()
        z = lambda v, n: np.zeros(n) if v is None else \
            np.asarray(v, float).ravel()
        u_step, u_noise = z(u_step, nu), z(u_noise, nu)
        y_step, y_noise = z(y_step, ny), z(y_noise, ny)
        d_step, d_noise = z(d_step, nd), z(d_noise, nd)
        x_noise = z(x_noise, nx)
        # pregenerate noise with the same per-step draw order as sim()
        eps_d = np.zeros((N, nd)); eps_y = np.zeros((N, ny))
        eps_u = np.zeros((N, nu)); eps_x = np.zeros((N, nx))
        for k in range(N):
            if nd:
                eps_d[k] = d_noise * rng.normal(size=nd)
            eps_y[k] = y_noise * rng.normal(size=ny)
            eps_u[k] = u_noise * rng.normal(size=nu)
            eps_x[k] = x_noise * rng.normal(size=nx)
        dks = np.tile(d + d_step, (N, 1)) + eps_d if nd else \
            np.zeros((N, 0))
        # initial states: same host-side protocol as sim()
        if x_0 is not None:
            plant.setstate(np.asarray(x_0, float))
        lastu = model.uop.copy() if lastu is None else \
            np.asarray(lastu, float).ravel()
        if x_hat_0 is not None:
            self.ctrl.setstate(np.asarray(x_hat_0, float))
        else:
            d00 = d if nd else None  # sim() inits with the nominal d
            y00 = plant.evaloutput(d00)
            self.ctrl.initstate(lastu, y00[self.i_ym], d00)
        st0 = dict(x0_p=np.asarray(plant.x0, float),
                   x0_hat=np.asarray(estim.x0_hat, float),
                   lastu0=lastu - model.uop,
                   Z_tilde=np.zeros(self.ctrl.nZt),
                   y_dual=np.zeros(self.ctrl.A_stack.shape[0]),
                   rho_rung=np.int32(4),
                   qp_state=_qp_state0(self.ctrl))
        if self._kf:
            st0["P_hat"] = np.asarray(estim.P_hat, float)
        steps = (np.tile(u_step, (N, 1)), np.tile(y_step, (N, 1)))
        tree = (self._p, self._ep, self._pp, st0, Ry, dks,
                steps, (eps_y, eps_u, eps_x))
        tree = _cast_tree(tree, getattr(self.ctrl, "_dt", None))
        tree = jax.device_put(tree)
        stN, outs = self._scan(*tree, N=N)
        outs = jax.tree.map(np.asarray, outs)
        T = np.arange(N) * plant.Ts
        D = dks if nd else np.zeros((N, 1))
        return SimResult(T, outs["y"], outs["u"], Ry_data=Ry, D_data=D,
                         X_data=outs["x_p"], Y_est_data=outs["y_est"],
                         X_est_data=outs["x_hat"], obj=self.ctrl)


class CompiledSLLoop:
    """One-`lax.scan` closed loop for successive-linearization MPC.

    The per-period SLMPC step (jacfwd linearization → condensed matrices →
    QP → EKF) is already one fused pure function; this embeds it with a
    nonlinear plant rollout so an N-step adaptive-MPC simulation is a single
    XLA call — the compiled form of the reference's fastest nonlinear
    pattern (docs/src/manual/nonlinmpc.md successive linearization).
    """

    def __init__(self, ctrl: SLMPC, plant: NonLinModel | None = None):
        if not isinstance(ctrl, SLMPC):
            raise TypeError("CompiledSLLoop drives an SLMPC controller")
        if plant is None:
            plant = _copy_model(ctrl.model)
        if not isinstance(plant, NonLinModel):
            raise TypeError("plant must be a NonLinModel")
        self.ctrl, self.plant = ctrl, plant
        self.nu, self.ny, self.nd = plant.nu, plant.ny, plant.nd
        self.i_ym = np.asarray(ctrl.i_ym, int)
        self._scan = jit32(self._make_scan(), static_argnames=("N",))

    def _make_scan(self):
        ctrl, plant = self.ctrl, self.plant
        step = ctrl._make_step()          # pure (st, ym, ry, d, bounds) fn
        fd, hh, p_pl = plant._fd, plant._h_user, plant.p
        nd = self.nd
        i_ym = self.i_ym
        ctrl_xop_hat = np.concatenate([np.asarray(ctrl.model.xop, float),
                                       np.zeros(ctrl.nxs)])
        pop = dict(uop=np.asarray(plant.uop), dop=np.asarray(plant.dop),
                   yop=np.asarray(plant.yop), xop=np.asarray(plant.xop),
                   fop_m_xop=np.asarray(plant.fop - plant.xop),
                   xop_hat=ctrl_xop_hat)

        def body(carry, xs):
            st, x0p, bounds, po = carry
            ry, dk, u_step, eps_y, eps_u, eps_x = xs
            d0p = dk - po["dop"] if nd else dk
            y = jnp.asarray(hh(x0p, d0p, p_pl)) + po["yop"] + eps_y
            ym = y[i_ym]
            u, conv, st = step(st, ym, ry, dk, bounds)
            u0p = (u + u_step + eps_u) - po["uop"]
            x0p_n = jnp.asarray(fd(x0p, u0p, d0p, p_pl)) + po["fop_m_xop"] \
                + eps_x
            out = dict(y=y, u=u, conv=conv, x_p=x0p + po["xop"],
                       x_hat=st["x_hat"] + po["xop_hat"])
            return (st, x0p_n, bounds, po), out

        def scan(st0, x0p, bounds, po, ry, dks, u_steps, eps, N):
            eps_y, eps_u, eps_x = eps
            (stN, x0pN, _, _), outs = jax.lax.scan(
                body, (st0, x0p, bounds, po),
                (ry, dks, u_steps, eps_y, eps_u, eps_x), length=N)
            return stN, x0pN, outs

        return scan

    def run(self, N, ry=None, d=None, *, u_step=None, u_noise=None,
            y_noise=None, d_step=None, d_noise=None, x_noise=None,
            x_0=None, seed=0):
        """Run the compiled SL-MPC loop; controller state carries over (the
        controller's ``state`` is updated in place, like stepping it)."""
        ctrl, plant = self.ctrl, self.plant
        nu, ny, nd, nx = self.nu, self.ny, self.nd, plant.nx
        N = int(N)
        rng = np.random.default_rng(seed)
        ry = np.asarray(ry, float) if ry is not None else plant.yop.copy()
        Ry = np.tile(ry, (N, 1)) if ry.ndim == 1 else ry
        d = np.asarray(d, float).ravel() if d is not None else \
            plant.dop.copy()
        z = lambda v, n: np.zeros(n) if v is None else \
            np.asarray(v, float).ravel()
        u_step, u_noise = z(u_step, nu), z(u_noise, nu)
        y_noise = z(y_noise, ny)
        d_step, d_noise = z(d_step, nd), z(d_noise, nd)
        x_noise = z(x_noise, nx)
        eps_d = np.zeros((N, nd)); eps_y = np.zeros((N, ny))
        eps_u = np.zeros((N, nu)); eps_x = np.zeros((N, nx))
        for k in range(N):
            if nd:
                eps_d[k] = d_noise * rng.normal(size=nd)
            eps_y[k] = y_noise * rng.normal(size=ny)
            eps_u[k] = u_noise * rng.normal(size=nu)
            eps_x[k] = x_noise * rng.normal(size=nx)
        dks = np.tile(d + d_step, (N, 1)) + eps_d if nd else np.zeros((N, 0))
        if x_0 is not None:
            plant.setstate(np.asarray(x_0, float))
        x0p = np.asarray(plant.x0, float)
        pop = dict(uop=np.asarray(plant.uop), dop=np.asarray(plant.dop),
                   yop=np.asarray(plant.yop), xop=np.asarray(plant.xop),
                   fop_m_xop=np.asarray(plant.fop - plant.xop),
                   xop_hat=np.concatenate([np.asarray(ctrl.model.xop, float),
                                           np.zeros(ctrl.nxs)]))
        tree = (ctrl.state, x0p, ctrl.bounds(), pop, Ry, dks,
                np.tile(u_step, (N, 1)), (eps_y, eps_u, eps_x))
        tree = _cast_tree(tree, getattr(ctrl, "_dt", None))
        tree = jax.device_put(tree)
        stN, x0pN, outs = self._scan(*tree, N=N)
        ctrl.state = stN                      # controller stepped N times
        plant.x0 = np.array(x0pN)
        outs = jax.tree.map(np.asarray, outs)
        T = np.arange(N) * plant.Ts
        D = dks if nd else np.zeros((N, 1))
        return SimResult(T, outs["y"], outs["u"], Ry_data=Ry, D_data=D,
                         X_data=outs["x_p"], X_est_data=outs["x_hat"])

    def run_fleet(self, B, N, ry=None, *, x_0=None, u_noise=None,
                  y_noise=None, x_noise=None, d=None, seed=0, mesh=None):
        """B independent nonlinear closed loops in one XLA call.

        Lane i reproduces ``run(..., seed=seed+i)`` (same RNG draw order).
        ``ry``: (ny,), (B, ny) or (B, N, ny); ``x_0``: (B, nx) absolute
        initial plant states.  All lanes start from the controller's current
        state.  Stateless (does not advance ``ctrl``/``plant``).  Returns a
        dict of stacked trajectories (Y, U, X, X_hat, conv).
        """
        ctrl, plant = self.ctrl, self.plant
        nu, ny, nd, nx = self.nu, self.ny, self.nd, plant.nx
        B, N = int(B), int(N)
        ry = np.asarray(ry, float) if ry is not None else plant.yop.copy()
        if ry.ndim == 1:
            Ry = np.tile(ry, (B, N, 1))
        elif ry.ndim == 2:
            Ry = np.tile(ry[:, None, :], (1, N, 1))
        else:
            Ry = ry
        d = np.asarray(d, float).ravel() if d is not None else \
            plant.dop.copy()
        z = lambda v, n: np.zeros(n) if v is None else \
            np.asarray(v, float).ravel()
        u_noise, y_noise, x_noise = z(u_noise, nu), z(y_noise, ny), \
            z(x_noise, nx)
        eps_y, eps_u, eps_x = _fleet_noise(B, N, nd, ny, nu, nx, y_noise,
                                           u_noise, x_noise, seed)
        dks = np.tile(d, (B, N, 1)) if nd else np.zeros((B, N, 0))
        if x_0 is None:
            x0p = np.tile(np.asarray(plant.x0, float), (B, 1))
        else:
            x0p = np.asarray(x_0, float) - plant.xop
        st0 = jax.tree.map(lambda a: np.tile(np.asarray(a, float)[None],
                                             (B,) + (1,) * np.ndim(a)),
                           ctrl.state)
        pop = dict(uop=np.asarray(plant.uop), dop=np.asarray(plant.dop),
                   yop=np.asarray(plant.yop), xop=np.asarray(plant.xop),
                   fop_m_xop=np.asarray(plant.fop - plant.xop),
                   xop_hat=np.concatenate([np.asarray(ctrl.model.xop, float),
                                           np.zeros(ctrl.nxs)]))
        if getattr(self, "_vscan_N", None) != N:
            scan = self._make_scan()
            self._vscan = jit32(jax.vmap(
                lambda st0, x0p, bounds, po, ry, dks, u_steps, eps:
                scan(st0, x0p, bounds, po, ry, dks, u_steps, eps, N),
                in_axes=(0, 0, None, None, 0, 0, 0, 0)))
            self._vscan_N = N
        tree = (st0, x0p, ctrl.bounds(), pop, Ry, dks,
                np.zeros((B, N, nu)), (eps_y, eps_u, eps_x))
        tree = _cast_tree(tree, getattr(ctrl, "_dt", None))
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(mesh, P("batch"))
            rep = NamedSharding(mesh, P())
            st0, x0p, bounds, po, Ry, dks, us, eps = tree
            tree = ((jax.device_put(st0, sh), jax.device_put(x0p, sh),
                     jax.device_put(bounds, rep), jax.device_put(po, rep))
                    + jax.device_put((Ry, dks, us, eps), sh))
        else:
            tree = jax.device_put(tree)
        stN, x0pN, outs = self._vscan(*tree)
        return {k: np.asarray(v) for k, v in
                dict(Y=outs["y"], U=outs["u"], X=outs["x_p"],
                     X_hat=outs["x_hat"], conv=outs["conv"]).items()}


class CompiledMHELoop:
    """Process an entire measurement record through a MovingHorizonEstimator
    as ONE ``lax.scan`` device call.

    The host MHE solves one window per ``preparestate`` with a fresh window
    upload each step (mhe/execute.jl protocol); here the windows, warm
    start, and arrival covariance all live in the scan carry, so estimating
    an N-step record is a single XLA call — the offline/batch-estimation
    form of the estimator.  Semantics mirrored in-graph: growing window via
    the Nk mask, slot shifting when full, warm-start block shifts
    (mhe/transcription.jl:936-1075), arrival covariance correct/predict on
    the oldest slot with finite/PD acceptance (mhe/execute.jl:729-797), NaN
    measurements masked per sample.

    Supported: ``direct=True`` MHE on a LinModel (or NonLinModel whose f/h
    trace) with a KalmanFilter covestim.  Per-slot (capital-form) bounds are
    applied with full-window alignment — if the scan starts before the
    window has filled AND time-varying bounds are set, the transient
    alignment differs from the host path's end-aligned form.  Call ``initstate`` (or step the
    MHE) on the host first; the loop starts from the estimator's current
    state and does not advance it.
    """

    def __init__(self, mhe):
        from .estimators.mhe import MovingHorizonEstimator
        from .estimators.kalman import KalmanFilter
        if not isinstance(mhe, MovingHorizonEstimator):
            raise TypeError("CompiledMHELoop drives a MovingHorizonEstimator")
        if not mhe.direct:
            raise ValueError("CompiledMHELoop supports direct=True MHE")
        if not isinstance(mhe.covestim, KalmanFilter):
            raise TypeError("CompiledMHELoop needs a KalmanFilter covestim "
                            "(the LinModel default)")
        self.mhe = mhe
        self.i_ym = np.asarray(mhe.i_ym, int)
        self._scan = jit32(self._make_scan(), static_argnames=("N",))

    def _make_scan(self):
        mhe_step = _make_mhe_step(self.mhe)

        def body(st, xs):
            ym, dk, u_next = xs
            new_st, x_new, J, ok = mhe_step(st, ym, dk)
            new_st["pending_u0"] = u_next
            return new_st, dict(x0_hat=x_new, J=J, ok=ok)

        def scan(st0, Ym, Dk, U, N):
            stN, outs = jax.lax.scan(body, st0, (Ym, Dk, U), length=N)
            return stN, outs

        return scan

    def run(self, Ym, U, D=None):
        """Estimate a recorded sequence: Ym (N, nym) measurements, U (N, nu)
        the inputs applied AFTER each measurement, D (N, nd) measured
        disturbances.  Returns dict(X_hat (N, nx̂ absolute), J, ok)."""
        mhe = self.mhe
        model = mhe.model
        Ym = np.asarray(Ym, float)
        U = np.asarray(U, float)
        N = Ym.shape[0]
        nd = model.nd
        D = np.asarray(D, float) if D is not None else \
            np.tile(model.dop, (N, 1))
        yopm = model.yop[self.i_ym]
        Y0m = Ym - yopm
        U0 = U - model.uop
        D0 = D - model.dop if nd else np.zeros((N, 0))
        st0 = dict(Y0m=np.asarray(mhe.Y0m_win, float),
                   U0=np.asarray(mhe.U0_win, float),
                   D0=np.asarray(mhe.D0_win, float),
                   X0_old=np.asarray(mhe.X0_old_win, float),
                   Nk=np.int32(mhe.Nk),
                   Z=np.asarray(mhe.Z_tilde, float),
                   x0_hat=np.asarray(mhe.x0_hat, float),
                   P_arr=np.asarray(mhe.P_arr, float),
                   invP=np.asarray(mhe.invP_arr, float),
                   pending_u0=np.asarray(
                       getattr(mhe, "_pending_u0", np.zeros(model.nu)),
                       float))
        tree = jax.device_put((st0, Y0m, D0, U0))
        stN, outs = self._scan(*tree, N=N)
        xh = np.asarray(outs["x0_hat"]) + np.asarray(mhe.xop_hat)
        return dict(X_hat=xh, J=np.asarray(outs["J"]),
                    ok=np.asarray(outs["ok"]))


def _make_mhe_step(mhe):
    """One in-graph MHE period: add-data shift/append, arrival-covariance
    correct/predict with finite/PD acceptance, window solve.  Returns
    ``step(st, y0m, d0) -> (new_st, x_new, J, ok)``; the caller stores the
    next applied input in ``new_st["pending_u0"]`` (it is needed by the
    NEXT period's add-data, mhe/execute.jl:44-84 protocol)."""
    from .estimators.kalman import kf_correct, kf_predict
    He, nx, ne = mhe.He, mhe.nx_hat, mhe.n_eps
    wo, is_ms = mhe._w_off, mhe.is_ms
    nd = mhe.model.nd
    solve = mhe._solve_jit                # pure (p, Zt0) fn (jit collapses)
    ce = mhe.covestim
    cep = dict(A=np.asarray(ce.A_hat), Bu=np.asarray(ce.Bu_hat),
               Bd=np.asarray(ce.Bd_hat), Cm=np.asarray(ce.Cm_hat),
               Ddm=np.asarray(ce.Ddm_hat), Q=np.asarray(ce.Q_hat),
               R=np.asarray(ce.R_hat),
               fop_m_xop=np.asarray(ce.fop_hat - ce.xop_hat))
    statics = {k: np.asarray(v) for k, v in mhe._windows_params().items()
               if k in ("invQ", "invR", "fop_m_xop", "Xmin", "Xmax",
                        "Wmin", "Wmax", "Vmin", "Vmax", "C_xmin",
                        "C_xmax", "C_wmin", "C_wmax", "C_vmin",
                        "C_vmax", "A_hat", "Bu_hat", "Bd_hat", "Cm_hat",
                        "Ddm_hat")}

    def accept_cov(P_new, P_old, invP_old):
        Ps = 0.5 * (P_new + P_new.T)
        from .utils.small_linalg import chol_small, inv_spd_small
        L = chol_small(Ps)          # PD probe: non-PD → NaN in L
        ok = jnp.all(jnp.isfinite(Ps)) & jnp.all(jnp.isfinite(L))
        eye = jnp.eye(Ps.shape[0], dtype=Ps.dtype)
        # unrolled SPD inverse (no serial triangular-solve custom call)
        invP = inv_spd_small(jnp.where(ok, Ps, eye))
        return (jnp.where(ok, Ps, P_old), jnp.where(ok, invP, invP_old))

    def shift_Z(Z):
        Zs = Z
        if is_ms:
            Zs = Zs.at[ne + nx:ne + nx + (He - 1) * nx].set(
                Zs[ne + 2 * nx:ne + nx + He * nx])
        Zs = Zs.at[wo:wo + (He - 1) * nx].set(Zs[wo + nx:wo + He * nx])
        Zs = Zs.at[wo + (He - 1) * nx:].set(0.0)
        return Zs

    def step(st, y0m, d0):
        moving = (st["Nk"] + 1) > He
        # --- add_data_windows!: shift when full, then append ---
        sh = lambda W: jnp.where(moving, jnp.roll(W, -1, axis=0), W)
        Y0m_w = sh(st["Y0m"]); U0_w = sh(st["U0"])
        X0_old_w = sh(st["X0_old"])
        D0_w = jnp.where(moving, jnp.roll(st["D0"], -1, axis=0), st["D0"])
        Nk2 = jnp.where(moving, He - 1, st["Nk"])
        Z = jnp.where(moving, shift_Z(st["Z"]), st["Z"])
        Y0m_w = Y0m_w.at[Nk2].set(y0m)
        U0_w = U0_w.at[Nk2].set(st["pending_u0"])
        X0_old_w = X0_old_w.at[Nk2].set(st["x0_hat"])
        D0_w = D0_w.at[Nk2 + 1].set(d0)
        Nk3 = Nk2 + 1
        x_arr_prior = X0_old_w[0]
        Z = jnp.where(moving, Z.at[ne:ne + nx].set(x_arr_prior), Z)
        # --- correct_cov! on the arrival slot (only when moving) ---
        y0m_arr, d0_arr = Y0m_w[0], D0_w[0]
        y_pred_arr = cep["Cm"] @ x_arr_prior + \
            (cep["Ddm"] @ d0_arr if nd else 0.0)
        _, Pc = kf_correct(x_arr_prior, st["P_arr"], y_pred_arr,
                           y0m_arr, cep["Cm"], cep["R"])
        Pc, invPc = accept_cov(Pc, st["P_arr"], st["invP"])
        P_arr = jnp.where(moving, Pc, st["P_arr"])
        invP = jnp.where(moving, invPc, st["invP"])
        # --- window solve ---
        mask_w = (jnp.arange(He) < Nk3).astype(P_arr.dtype)
        mask_v = (mask_w[:, None] > 0) & jnp.isfinite(Y0m_w)
        p = dict(U=U0_w, D=D0_w, Y0m=jnp.nan_to_num(Y0m_w),
                 mask_w=mask_w, mask_v=mask_v, invP=invP,
                 x_arr_prior=x_arr_prior, Nk=Nk3.astype(jnp.int32),
                 **statics)
        Zt, x_new, X, Ym_roll, J, ok = solve(p, Z)
        # --- update_cov! (predict) once the window is full ---
        full = Nk3 == He
        xr = cep["A"] @ x_arr_prior + cep["Bu"] @ U0_w[0] + \
            (cep["Bd"] @ D0_w[0] if nd else 0.0)
        _, Pn = kf_predict(xr, P_arr, cep["A"], cep["Q"], cep["fop_m_xop"])
        Pn, invPn = accept_cov(Pn, P_arr, invP)
        P_arr = jnp.where(full, Pn, P_arr)
        invP = jnp.where(full, invPn, invP)
        new_st = dict(Y0m=Y0m_w, U0=U0_w, D0=D0_w, X0_old=X0_old_w,
                      Nk=Nk3, Z=Zt, x0_hat=x_new, P_arr=P_arr,
                      invP=invP, pending_u0=st["pending_u0"])
        return new_st, x_new, J, ok

    return step


class CompiledMHEMPCLoop:
    """MHE -> LinMPC -> plant, fused: the reference's ManualEstimator
    composition (manual.jl:99-128 docstring pattern: an MHE feeding a linear
    MPC through setstate) as ONE ``lax.scan`` device program.

    ``ctrl`` must be a LinMPC whose estimator has the same augmented-state
    layout as ``mhe`` (e.g. ``LinMPC(ManualEstimator(model))`` with matching
    integrator defaults) — the MHE's deviation estimate is fed straight into
    the condensed-QP solve each period.
    """

    def __init__(self, mhe, ctrl: LinMPC, plant: LinModel | None = None):
        from .estimators.mhe import MovingHorizonEstimator
        if not isinstance(mhe, MovingHorizonEstimator):
            raise TypeError("mhe must be a MovingHorizonEstimator")
        if not isinstance(ctrl, LinMPC):
            raise TypeError("ctrl must be a LinMPC")
        if ctrl.estim.nx_hat != mhe.nx_hat:
            raise ValueError(
                f"augmented-state mismatch: MHE nx̂={mhe.nx_hat}, controller "
                f"estimator nx̂={ctrl.estim.nx_hat} — construct both with the "
                "same integrator configuration")
        if plant is None:
            plant = _copy_model(mhe.model)
        if not isinstance(plant, LinModel):
            raise TypeError("plant must be a LinModel")
        self.mhe, self.ctrl, self.plant = mhe, ctrl, plant
        self.nu, self.ny, self.nd = plant.nu, plant.ny, plant.nd
        self.i_ym = np.asarray(mhe.i_ym, int)
        self._p = jax.tree.map(np.asarray, ctrl.params)
        model = mhe.model
        self._mp = dict(uop=np.asarray(model.uop), dop=np.asarray(model.dop),
                        yop_m=np.asarray(model.yop)[self.i_ym])
        pl = plant
        self._pp = dict(A=np.asarray(pl.A), Bu=np.asarray(pl.Bu),
                        Bd=np.asarray(pl.Bd), C=np.asarray(pl.C),
                        Dd=np.asarray(pl.Dd),
                        fop_m_xop=np.asarray(pl.fop - pl.xop),
                        xop=np.asarray(pl.xop), uop=np.asarray(pl.uop),
                        yop=np.asarray(pl.yop), dop=np.asarray(pl.dop))
        self._scan = jit32(self._make_scan(), static_argnames=("N",))

    def _make_scan(self):
        mhe, ctrl = self.mhe, self.ctrl
        mhe_step = _make_mhe_step(mhe)
        step_raw = ctrl._step_raw
        Hp = ctrl.Hp
        nyu = ctrl.estim.nyu
        nd = self.nd
        i_ym = self.i_ym
        xop_hat = np.asarray(mhe.xop_hat)

        def body(carry, xs):
            p, mp, pp, st = carry
            ry, dk, eps_y = xs
            d0p = dk - pp["dop"] if nd else dk
            y = pp["C"] @ st["x0_p"] + pp["yop"] + eps_y
            if nd:
                y = y + pp["Dd"] @ d0p
            ym = y[i_ym]
            y0m = ym - mp["yop_m"]
            d0 = dk - mp["dop"] if nd else dk
            # --- MHE window step ---
            est, x_new, J_mhe, ok = mhe_step(st["est"], y0m, d0)
            # --- LinMPC solve from the MHE estimate ---
            D_hat_0 = jnp.tile(d0, Hp)
            R_hat_y = jnp.tile(ry, Hp)
            u, Z_t, y_dual, conv, _, obj, _it, rung, qps = step_raw(
                p, x_new, st["lastu0"], d0, D_hat_0, R_hat_y, p["Uop"],
                jnp.zeros(p["Ks"].shape[1], x_new.dtype),
                jnp.zeros(y0m.shape[0] + nyu, x_new.dtype),
                st["Z_tilde"], st["y_dual"], rung_prev=st["rho_rung"],
                qp_state=st["qp_state"])
            lastu0 = u - mp["uop"]
            est["pending_u0"] = lastu0
            # --- plant update ---
            x0p_n = pp["A"] @ st["x0_p"] + pp["Bu"] @ (u - pp["uop"]) \
                + pp["fop_m_xop"]
            if nd:
                x0p_n = x0p_n + pp["Bd"] @ d0p
            out = dict(y=y, u=u, x_hat=x_new + xop_hat, J_mhe=J_mhe,
                       ok=ok, conv=conv)
            new_st = dict(est=est, x0_p=x0p_n, lastu0=lastu0,
                          Z_tilde=Z_t, y_dual=y_dual, rho_rung=rung,
                          qp_state=qps)
            return (p, mp, pp, new_st), out

        def scan(p, mp, pp, st0, ry, dks, eps_y, N):
            (_, _, _, stN), outs = jax.lax.scan(
                body, (p, mp, pp, st0), (ry, dks, eps_y), length=N)
            return stN, outs

        return scan

    def run(self, N, ry=None, d=None, *, y_noise=None, seed=0, lastu=None):
        """Run the fused MHE->MPC->plant loop for N steps (one device call).

        Starts from the MHE's and plant's current host state; call
        ``mhe.initstate(...)`` first.  Stateless (host objects not advanced).
        """
        mhe, plant, model = self.mhe, self.plant, self.mhe.model
        ny, nd, nu = self.ny, self.nd, self.nu
        N = int(N)
        rng = np.random.default_rng(seed)
        ry = np.asarray(ry, float) if ry is not None else model.yop.copy()
        Ry = np.tile(ry, (N, 1)) if ry.ndim == 1 else ry
        d = np.asarray(d, float).ravel() if d is not None else \
            model.dop.copy()
        y_noise = np.zeros(ny) if y_noise is None else \
            np.asarray(y_noise, float).ravel()
        eps_y = y_noise * rng.normal(size=(N, ny))
        dks = np.tile(d, (N, 1)) if nd else np.zeros((N, 0))
        lastu = model.uop.copy() if lastu is None else \
            np.asarray(lastu, float).ravel()
        est0 = dict(Y0m=np.asarray(mhe.Y0m_win, float),
                    U0=np.asarray(mhe.U0_win, float),
                    D0=np.asarray(mhe.D0_win, float),
                    X0_old=np.asarray(mhe.X0_old_win, float),
                    Nk=np.int32(mhe.Nk),
                    Z=np.asarray(mhe.Z_tilde, float),
                    x0_hat=np.asarray(mhe.x0_hat, float),
                    P_arr=np.asarray(mhe.P_arr, float),
                    invP=np.asarray(mhe.invP_arr, float),
                    pending_u0=np.asarray(
                        getattr(mhe, "_pending_u0", np.zeros(nu)), float))
        st0 = dict(est=est0, x0_p=np.asarray(plant.x0, float),
                   lastu0=lastu - model.uop,
                   Z_tilde=np.zeros(self.ctrl.nZt),
                   y_dual=np.zeros(self.ctrl.A_stack.shape[0]),
                   rho_rung=np.int32(4),
                   qp_state=_qp_state0(self.ctrl))
        tree = _cast_tree((self._p, self._mp, self._pp, st0, Ry, dks,
                           eps_y), getattr(self.ctrl, "_dt", None))
        tree = jax.device_put(tree)
        stN, outs = self._scan(*tree, N=N)
        outs = jax.tree.map(np.asarray, outs)
        T = np.arange(N) * plant.Ts
        return SimResult(T, outs["y"], outs["u"], Ry_data=Ry,
                         D_data=dks if nd else np.zeros((N, 1)),
                         X_est_data=outs["x_hat"])


class CompiledNonLinLoop:
    """One-`lax.scan` closed loop for full NonLinMPC (in-graph SQP) with a
    UKF and a nonlinear plant — the compiled form of the reference's
    pendulum case (UKF feedback + Ipopt NLP each period, here the SQP
    kernel).  Mirrors ``parallel.BatchedNonLinMPC``'s per-step body with the
    plant rollout added, so an N-step nonlinear closed loop is one XLA call.
    """

    def __init__(self, ctrl, plant: NonLinModel | None = None):
        from .controllers.nonlinmpc import NonLinMPC
        from .estimators.kalman import UnscentedKalmanFilter
        if not isinstance(ctrl, NonLinMPC):
            raise TypeError("CompiledNonLinLoop drives a NonLinMPC")
        if not isinstance(ctrl.estim, UnscentedKalmanFilter):
            raise TypeError("CompiledNonLinLoop needs an "
                            "UnscentedKalmanFilter estimator (the NonLinModel "
                            "default)")
        if plant is None:
            plant = _copy_model(ctrl.estim.model)
        if not isinstance(plant, NonLinModel):
            raise TypeError("plant must be a NonLinModel")
        self.ctrl, self.plant = ctrl, plant
        self.nu, self.ny, self.nd = plant.nu, plant.ny, plant.nd
        self.i_ym = np.asarray(ctrl.estim.i_ym, int)
        self._scan = jit32(self._make_scan(), static_argnames=("N",))

    def _make_scan(self):
        ctrl, plant = self.ctrl, self.plant
        estim = ctrl.estim
        model = estim.model
        nd, Hp = model.nd, ctrl.Hp
        step_fn = ctrl._step
        corr, pred = estim._kernels()
        i_ym = self.i_ym
        ep = dict(m_hat=np.asarray(estim.m_hat),
                  S_hat=np.asarray(estim.S_hat),
                  R_hat=np.asarray(estim.R_hat),
                  Q_hat=np.asarray(estim.Q_hat),
                  fop_m_xop=np.asarray(estim.fop_hat - estim.xop_hat),
                  xop_hat=np.asarray(estim.xop_hat),
                  yopm=np.asarray(model.yop)[i_ym],
                  uop=np.asarray(model.uop), dop=np.asarray(model.dop),
                  yop=np.asarray(model.yop))
        fd, hh, p_pl = plant._fd, plant._h_user, plant.p
        pop = dict(uop=np.asarray(plant.uop), dop=np.asarray(plant.dop),
                   yop=np.asarray(plant.yop), xop=np.asarray(plant.xop),
                   fop_m_xop=np.asarray(plant.fop - plant.xop))
        h_hat = estim.h_hat

        def body(carry, xs):
            p, e, po, st = carry
            ry, dk, eps_y = xs
            d0p = dk - po["dop"] if nd else dk
            y = jnp.asarray(hh(st["x0_p"], d0p, p_pl)) + po["yop"] + eps_y
            ym = y[i_ym]
            d0 = dk - e["dop"] if nd else dk
            y0m = ym - e["yopm"]
            # UKF correction
            x0c, Pc = corr(st["x0_hat"], st["P_hat"], y0m, d0, e["m_hat"],
                           e["S_hat"], e["R_hat"])
            yk = jnp.asarray(h_hat(x0c, d0)) + e["yop"]
            # SQP solve
            D0 = jnp.tile(d0, Hp)
            Ry = jnp.tile(ry, Hp)
            Ru = p["Uop"]
            u, Zt, _Zs, y_d, J, viol, _stat, iters, _, _, _ = step_fn(
                p, x0c, st["lastu0"], d0, D0, Ry, Ru, yk, ry,
                st["Z_tilde"], None)
            lastu0 = u - e["uop"]
            # plant update
            x0p_n = jnp.asarray(fd(st["x0_p"], u - po["uop"], d0p, p_pl)) \
                + po["fop_m_xop"]
            # UKF prediction
            x0n, Pn = pred(x0c, Pc, lastu0, d0, e["m_hat"], e["S_hat"],
                           e["Q_hat"], e["fop_m_xop"])
            out = dict(y=y, u=u, J=J, x_hat=x0c + e["xop_hat"],
                       x_p=st["x0_p"] + po["xop"], iters=iters)
            new_st = dict(x0_p=x0p_n, x0_hat=x0n, P_hat=Pn, lastu0=lastu0,
                          Z_tilde=Zt)
            return (p, e, po, new_st), out

        def scan(p, e, po, st0, ry, dks, eps_y, N):
            (_, _, _, stN), outs = jax.lax.scan(
                body, (p, e, po, st0), (ry, dks, eps_y), length=N)
            return stN, outs

        self._ep_host, self._pop_host = ep, pop
        return scan

    def run(self, N, ry=None, d=None, *, y_noise=None, x_0=None, seed=0):
        """One device call for the N-step nonlinear closed loop (stateless
        w.r.t. the host controller/plant objects)."""
        ctrl, plant = self.ctrl, self.plant
        estim = ctrl.estim
        model = estim.model
        ny, nd = self.ny, self.nd
        N = int(N)
        rng = np.random.default_rng(seed)
        ry = np.asarray(ry, float) if ry is not None else plant.yop.copy()
        Ry = np.tile(ry, (N, 1)) if ry.ndim == 1 else ry
        d = np.asarray(d, float).ravel() if d is not None else \
            model.dop.copy()
        y_noise = np.zeros(ny) if y_noise is None else \
            np.asarray(y_noise, float).ravel()
        eps_y = y_noise * rng.normal(size=(N, ny))
        dks = np.tile(d, (N, 1)) if nd else np.zeros((N, 0))
        if x_0 is not None:
            plant.setstate(np.asarray(x_0, float))
        p = jax.tree.map(np.asarray, ctrl.params)
        st0 = dict(x0_p=np.asarray(plant.x0, float),
                   x0_hat=np.asarray(estim.x0_hat, float),
                   P_hat=np.asarray(estim.P_hat, float),
                   lastu0=np.asarray(ctrl.lastu0, float),
                   Z_tilde=np.asarray(ctrl.Z_tilde, float))
        tree = _cast_tree((p, self._ep_host, self._pop_host, st0, Ry,
                           dks, eps_y), getattr(ctrl, "_dt", None))
        tree = jax.device_put(tree)
        stN, outs = self._scan(*tree, N=N)
        outs = jax.tree.map(np.asarray, outs)
        T = np.arange(N) * plant.Ts
        return SimResult(T, outs["y"], outs["u"], Ry_data=Ry,
                         D_data=dks if nd else np.zeros((N, 1)),
                         X_data=outs["x_p"], X_est_data=outs["x_hat"])


def _fleet_noise(B, N, nd, ny, nu, nx, y_noise, u_noise=None, x_noise=None,
                 seed=0):
    """Per-lane (y, u, x) noise draws; lane i reproduces the single-loop
    ``run(seed=seed+i)`` RNG order, including the per-step d draw that
    ``sim()``/``run()`` consume whenever nd > 0 (even with zero d_noise)."""
    u_noise = np.zeros(nu) if u_noise is None else u_noise
    x_noise = np.zeros(nx) if x_noise is None else x_noise
    eps_y = np.zeros((B, N, ny)); eps_u = np.zeros((B, N, nu))
    eps_x = np.zeros((B, N, nx))
    for i in range(B):
        rng = np.random.default_rng(seed + i)
        for k in range(N):
            if nd:
                rng.normal(size=nd)     # consumed by run() when nd > 0
            eps_y[i, k] = y_noise * rng.normal(size=ny)
            eps_u[i, k] = u_noise * rng.normal(size=nu)
            eps_x[i, k] = x_noise * rng.normal(size=nx)
    return eps_y, eps_u, eps_x


def _nonlin_run_fleet(self, B, N, ry=None, *, x_0=None, y_noise=None,
                      d=None, seed=0):
    """B independent nonlinear NonLinMPC closed loops in one XLA call
    (stateless; lane i ≡ run(seed=seed+i))."""
    ctrl, plant = self.ctrl, self.plant
    estim = ctrl.estim
    model = estim.model
    ny, nd = self.ny, self.nd
    B, N = int(B), int(N)
    ry = np.asarray(ry, float) if ry is not None else plant.yop.copy()
    if ry.ndim == 1:
        Ry = np.tile(ry, (B, N, 1))
    elif ry.ndim == 2:
        Ry = np.tile(ry[:, None, :], (1, N, 1))
    else:
        Ry = ry
    d = np.asarray(d, float).ravel() if d is not None else model.dop.copy()
    y_noise = np.zeros(ny) if y_noise is None else \
        np.asarray(y_noise, float).ravel()
    # mirror run()'s vectorized draw: rng(seed+i).normal(size=(N, ny))
    eps_y = np.stack([y_noise * np.random.default_rng(seed + i).normal(
        size=(N, ny)) for i in range(B)])
    dks = np.tile(d, (B, N, 1)) if nd else np.zeros((B, N, 0))
    if x_0 is None:
        x0p = np.tile(np.asarray(plant.x0, float), (B, 1))
    else:
        x0p = np.asarray(x_0, float) - plant.xop
    p = jax.tree.map(np.asarray, ctrl.params)
    st0 = dict(x0_p=x0p,
               x0_hat=np.tile(np.asarray(estim.x0_hat, float), (B, 1)),
               P_hat=np.tile(np.asarray(estim.P_hat, float), (B, 1, 1)),
               lastu0=np.tile(np.asarray(ctrl.lastu0, float), (B, 1)),
               Z_tilde=np.tile(np.asarray(ctrl.Z_tilde, float), (B, 1)))
    if getattr(self, "_vscan_N", None) != N:
        scan = self._make_scan()
        self._vscan = jit32(jax.vmap(
            lambda p, e, po, st0, ry, dks, eps_y:
            scan(p, e, po, st0, ry, dks, eps_y, N),
            in_axes=(None, None, None, 0, 0, 0, 0)))
        self._vscan_N = N
    tree = _cast_tree((p, self._ep_host, self._pop_host, st0, Ry, dks,
                       eps_y), getattr(ctrl, "_dt", None))
    tree = jax.device_put(tree)
    stN, outs = self._vscan(*tree)
    return {k: np.asarray(v) for k, v in
            dict(Y=outs["y"], U=outs["u"], X=outs["x_p"],
                 X_hat=outs["x_hat"], J=outs["J"]).items()}


CompiledNonLinLoop.run_fleet = _nonlin_run_fleet


class CompiledClosedLoopFleet:
    """Heterogeneous compiled closed loops: B different (controller, plant)
    pairs, each an independent N-step loop, in ONE device call.

    Unlike ``CompiledClosedLoop.run_fleet`` (one controller, many noise
    realizations), every lane here has its own plant/controller matrices —
    for model-mismatch and tuning sweeps (e.g. controller designed on the
    nominal model, lanes simulate perturbed plants).  Constant-gain
    estimators only (the ``BatchedLinMPC`` feedback path).
    """

    def __init__(self, controllers, plants=None):
        from .parallel.batch import stack_params, estimator_params
        c0 = controllers[0]
        i_ym0 = list(c0.estim.i_ym)
        for c in controllers:
            if not isinstance(c.estim, (SteadyKalmanFilter, Luenberger)):
                raise TypeError(
                    "CompiledClosedLoopFleet needs constant-gain estimators "
                    f"(SteadyKalmanFilter/Luenberger); got "
                    f"{type(c.estim).__name__}")
            if not c.estim.direct:
                raise ValueError("CompiledClosedLoopFleet requires "
                                 "direct=True estimators")
            if list(c.estim.i_ym) != i_ym0:
                raise ValueError("all lanes must share the same i_ym "
                                 "measurement selection")
        if plants is None:
            plants = [_copy_model(c.estim.model) for c in controllers]
        if len(plants) != len(controllers):
            raise ValueError("need one plant per controller")
        self.ctrls, self.plants = controllers, plants
        self.B = len(controllers)
        self.nu, self.ny = plants[0].nu, plants[0].ny
        self.nd = plants[0].nd
        self.i_ym = np.asarray(c0.estim.i_ym, int)
        self._p = stack_params(controllers)
        ep = estimator_params(controllers)
        ep["C_hat"] = np.stack([np.asarray(c.estim.C_hat)
                                for c in controllers])
        ep["Dd_hat"] = np.stack([np.asarray(c.estim.Dd_hat)
                                 for c in controllers])
        ep["xop_hat"] = np.stack([np.asarray(c.estim.xop_hat)
                                  for c in controllers])
        ep["yop"] = np.stack([np.asarray(c.estim.model.yop)
                              for c in controllers])
        self._ep = ep
        g = lambda a: np.stack([np.asarray(getattr(p, a), float)
                                for p in plants])
        self._pp = dict(A=g("A"), Bu=g("Bu"), Bd=g("Bd"), C=g("C"),
                        Dd=g("Dd"),
                        fop_m_xop=np.stack([p.fop - p.xop for p in plants]),
                        xop=g("xop"), uop=g("uop"), yop=g("yop"),
                        dop=g("dop"))
        # reuse the homogeneous scan body; vmap over ALL the param trees
        proto = CompiledClosedLoop.__new__(CompiledClosedLoop)
        proto.ctrl, proto.estim, proto.plant = c0, c0.estim, plants[0]
        proto.nd, proto.i_ym = self.nd, self.i_ym
        proto._kf = False
        scan = CompiledClosedLoop._make_scan(proto)
        self._vscan_builder = lambda N: jit32(jax.vmap(
            lambda p, ep, pp, st0, ry, dks, steps, eps:
            scan(p, ep, pp, st0, ry, dks, steps, eps, N),
            in_axes=(0, 0, 0, 0, 0, 0, 0, 0)))
        self._vscan, self._vscan_N = None, None

    def run(self, N, ry=None, *, y_noise=None, x_0=None, d=None, seed=0):
        """Run all B loops for N steps.  ``ry``: (ny,), (B, ny) or
        (B, N, ny) — default: each lane's own model yop; ``d``: absolute
        measured disturbance, (nd,) or (B, nd) — default: each lane's dop;
        per-lane noise seeds ``seed + i``."""
        B, nu, ny, nd = self.B, self.nu, self.ny, self.nd
        N = int(N)
        c0 = self.ctrls[0]
        if ry is None:
            Ry = np.tile(self._pp["yop"][:, None, :], (1, N, 1))
        else:
            ry = np.asarray(ry, float)
            if ry.ndim == 1:
                Ry = np.tile(ry, (B, N, 1))
            elif ry.ndim == 2:
                Ry = np.tile(ry[:, None, :], (1, N, 1))
            else:
                Ry = ry
        y_noise = np.zeros(ny) if y_noise is None else \
            np.asarray(y_noise, float).ravel()
        nx_p = self.plants[0].nx
        eps_y, _, _ = _fleet_noise(B, N, nd, ny, nu, nx_p, y_noise,
                                   seed=seed)
        if nd:
            if d is None:
                dlanes = self._pp["dop"]                  # (B, nd)
            else:
                d = np.asarray(d, float)
                dlanes = np.tile(d, (B, 1)) if d.ndim == 1 else d
            dks = np.tile(dlanes[:, None, :], (1, N, 1))
        else:
            dks = np.zeros((B, N, 0))
        zeros = lambda n: np.zeros((B, N, n))
        if x_0 is None:
            x0p = np.stack([np.asarray(p.x0, float) for p in self.plants])
        else:
            x0p = np.asarray(x_0, float) - self._pp["xop"]
        st0 = dict(x0_p=x0p,
                   x0_hat=np.stack([np.asarray(c.estim.x0_hat, float)
                                    for c in self.ctrls]),
                   lastu0=np.zeros((B, nu)),
                   Z_tilde=np.zeros((B, c0.nZt)),
                   y_dual=np.zeros((B, c0.A_stack.shape[0])),
                   rho_rung=np.full(B, 4, np.int32),
                   qp_state=_qp_state0(c0, B))
        if self._vscan_N != N:
            self._vscan = self._vscan_builder(N)
            self._vscan_N = N
        tree = jax.device_put(
            (self._p, self._ep, self._pp, st0, Ry, dks,
             (zeros(nu), zeros(ny)),
             (eps_y, zeros(nu), np.zeros((B, N, nx_p)))))
        stN, outs = self._vscan(*tree)
        return {k: np.asarray(v) for k, v in
                dict(Y=outs["y"], U=outs["u"], Y_est=outs["y_est"],
                     X=outs["x_p"], X_hat=outs["x_hat"],
                     conv=outs["conv"]).items()}
