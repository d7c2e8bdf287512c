"""Batched NonLinMPC: a fleet of nonlinear MPC problems solved in lockstep.

The NonLinMPC SQP step is a pure function of (params, state, inputs); since
all scenarios share the plant structure (the jax-traceable f/h), a fleet over
different states/setpoints/parameters is ONE vmapped jitted computation —
every SQP iteration's rollouts, Jacobians and QP subproblems batch onto the
MXU/VPU together.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.config import jit32

from ..controllers.nonlinmpc import NonLinMPC


class BatchedNonLinMPC:
    """Lockstep batch of one NonLinMPC problem over many scenario states.

    The template controller supplies the structure (model, horizons, weights,
    bounds); the batch axis carries (x̂0, lastu0, Z̃ warm starts, setpoints).
    UKF feedback is vmapped alongside.
    """

    def __init__(self, template: NonLinMPC, batch: int, dtype=None,
                 mesh=None, chunk: int | None = None):
        """``dtype=jnp.float32`` runs the fleet in TPU-native f32 (f64
        LuDecomposition is unimplemented on TPU).  ``mesh``: a
        ``jax.sharding.Mesh`` with a ``batch`` axis — the scenario batch is
        sharded over it (params replicated; no cross-shard collectives in
        the solve).  ``chunk``: split the fleet into ``chunk``-lane groups
        under ``lax.map`` so each group's lockstep SQP/GI while-loops exit
        at the GROUP's slowest lane instead of the whole fleet's (the
        SLMPC-fleet chunking win); single-device only.  Measured on the
        bench's pendulum fleet (B=1024, sqp_iters=15) chunking LOSES —
        80k solves/s full-width vs 63k at chunk=256 — because the slowest
        lane of every chunk hits the 15-iteration cap (no tail spread to
        exploit, only added serialization); default is full-width.  Use it
        when lanes' SQP iteration counts genuinely vary."""
        self.t = template
        self.B = int(batch)
        # f32-UKF envelope guard: the classic UKF alpha=1e-3 puts
        # ~1/α² ≈ 1e6-scale sigma weights into the mean/cov sums, and in
        # an f32 fleet the cancellation error reaches O(degrees) of state
        # error per correction (measured: 2.3° from a ZERO innovation on
        # the pendulum; the closed loop silently mis-tracked by ~15°).
        # alpha ≥ 0.1 keeps the f32 UKF within ~1e-5 of f64.
        import jax.numpy as _jnp
        if dtype == _jnp.float32:
            from ..estimators import UnscentedKalmanFilter
            est = template.estim
            if (isinstance(est, UnscentedKalmanFilter)
                    and getattr(est, "alpha", 1.0) < 0.1):
                import warnings
                warnings.warn(
                    f"UnscentedKalmanFilter(alpha={est.alpha:g}) in a "
                    f"float32 fleet: sigma weights ~1/alpha^2 amplify f32 "
                    f"rounding to O(degrees) of state error per step — "
                    f"construct the estimator with alpha >= 0.1 for f32 "
                    f"fleets (the mean/cov are exact in alpha for linear "
                    f"measurement maps).")
        self.chunk = None
        if chunk is not None and mesh is None:
            chunk = min(int(chunk), self.B)
            if self.B % chunk:
                raise ValueError(f"batch ({batch}) must be a multiple of "
                                 f"chunk ({chunk})")
            if chunk < self.B:
                self.chunk = chunk
        self._dt = dtype
        self._mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            self._shard_b = NamedSharding(mesh, PartitionSpec("batch"))
            self._shard_r = NamedSharding(mesh, PartitionSpec())
        else:
            self._shard_b = self._shard_r = None
        estim = template.estim
        self.nu = template.estim.model.nu
        dt = dtype if dtype is not None else (
            jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
        self.state = dict(
            x0_hat=jnp.zeros((batch, estim.nx_hat), dt),
            P_hat=jnp.tile(jnp.asarray(getattr(estim, "P0_hat",
                                               np.eye(estim.nx_hat)),
                                       dt)[None],
                           (batch, 1, 1)),
            lastu0=jnp.zeros((batch, self.nu), dt),
            Z_tilde=jnp.zeros((batch, template.nZt), dt),
        )
        if self._shard_b is not None:
            self.state = jax.device_put(self.state, self._shard_b)
        self._solve = jit32(self._make())

    def _make(self):
        t = self.t
        estim = t.estim
        model = estim.model
        nd, Hp = model.nd, t.Hp
        step_fn = t._step  # jitted; vmap of jit is fine
        corr, pred = estim._kernels() if hasattr(estim, "_kernels") else (None, None)
        dt = self._dt
        ja = (lambda a: jnp.asarray(a, dt)) if dt is not None else jnp.asarray
        m_hat = ja(getattr(estim, "m_hat", 0.0))
        S_hat = ja(getattr(estim, "S_hat", 0.0))
        R_hat = ja(getattr(estim, "R_hat", 0.0))
        Q_hat = ja(getattr(estim, "Q_hat", 0.0))
        fop_m_xop = ja(estim.fop_hat - estim.xop_hat)
        yopm = ja(model.yop[np.asarray(estim.i_ym, int)])
        uop = ja(model.uop)
        dop = ja(model.dop)
        yop = ja(model.yop)

        def one(p, st, ym, ry, d):
            d0 = d - dop if nd else d
            y0m = ym - yopm
            # UKF correction
            x0c, Pc = corr(st["x0_hat"], st["P_hat"], y0m, d0, m_hat, S_hat,
                           R_hat)
            yk = jnp.asarray(estim.h_hat(x0c, d0)) + yop
            D0 = jnp.tile(d0, Hp)
            Ry = jnp.tile(ry, Hp)
            Ru = jnp.tile(uop, Hp)
            u, Zt, _Zs, y_d, J, viol, stat, iters, Y0f, xendf, U0f = step_fn(
                p, x0c, st["lastu0"], d0, D0, Ry, Ru, yk, ry, st["Z_tilde"],
                None)
            lastu0 = u - uop
            # UKF prediction
            x0n, Pn = pred(x0c, Pc, lastu0, d0, m_hat, S_hat, Q_hat, fop_m_xop)
            return u, J, iters, viol, stat, dict(x0_hat=x0n, P_hat=Pn,
                                                 lastu0=lastu0, Z_tilde=Zt)

        vone = jax.vmap(one, in_axes=(None, 0, 0, 0, 0))

        if self.chunk:
            ch, B = self.chunk, self.B
            n = B // ch
            resh = lambda a: a.reshape((n, ch) + a.shape[1:])
            unr = lambda a: a.reshape((B,) + a.shape[2:])

            def solve_chunked(p, st, ym, ry, d):
                stc = jax.tree.map(resh, st)

                def body(args):
                    s, y, r, dd = args
                    return vone(p, s, y, r, dd)

                u, J, iters, viol, stat, new_c = jax.lax.map(
                    body, (stc, resh(ym), resh(ry), resh(d)))
                it_stats = jnp.stack([jnp.max(iters), jnp.sum(iters) // B])
                kkt = jnp.stack([unr(viol), unr(stat)], axis=1)
                return (unr(u), unr(J), it_stats, jnp.max(viol), kkt,
                        jax.tree.map(unr, new_c))

            return solve_chunked

        def solve(p, st, ym, ry, d):
            u, J, iters, viol, stat, new_st = vone(p, st, ym, ry, d)
            # fleet diagnostics (benchmark parity with the reference's
            # per-solver status/iteration stats, general.jl:44-61): [max,
            # mean] SQP iterations, the worst constraint/defect violation
            # across lanes, and the PER-LANE (viol, kkt stationarity) pair
            # — the honest per-lane convergence signal
            it_stats = jnp.stack([jnp.max(iters),
                                  jnp.sum(iters) // iters.shape[0]])
            viol_max = jnp.max(viol)
            kkt = jnp.stack([viol, stat], axis=1)      # (B, 2)
            return u, J, it_stats, viol_max, kkt, new_st

        return solve

    def multistep(self, ym_seq, ry_seq, d_seq=None):
        """K control periods in ONE device dispatch (serving mode).

        ``ym_seq``/``ry_seq``: (K, B, nym)/(K, B, ny); ``d_seq`` optional
        (K, B, nd).  Returns ``(U, J)`` stacked (K, B, ·) DEVICE arrays;
        ``last_iters``/``last_viol`` hold the FINAL period's stats.
        Equivalent to K successive ``step`` calls (tested); amortizes the
        per-dispatch tunnel overhead that is 2-4× of the wall step on
        big-shape fleets (see BatchedLinMPC._make_multistep).
        """
        self._ensure_params()
        np_dt = (np.dtype(self._dt) if self._dt is not None
                 else np.dtype(np.float64 if jax.config.jax_enable_x64
                               else np.float32))
        ym_np = np.asarray(ym_seq, np_dt)
        K = ym_np.shape[0]
        # ONE device_put per dispatch; stacked (K, B, ·) inputs shard on
        # the LANE axis (dim 1) for mesh fleets — PartitionSpec("batch")
        # on dim 0 would partition the TIME axis (advisor-found)
        tree = dict(ym=ym_np, ry=np.asarray(ry_seq, np_dt),
                    d=(np.asarray(d_seq, np_dt) if d_seq is not None
                       else np.zeros((K, self.B, self.t.estim.model.nd),
                                     np_dt)))
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            sh_t = NamedSharding(self._mesh, PartitionSpec(None, "batch"))
            tree = jax.device_put(tree, sh_t)
        else:
            tree = jax.device_put(tree)
        ym_seq, ry_seq, d_seq = tree["ym"], tree["ry"], tree["d"]
        if getattr(self, "_mstep", None) is None:
            solve = self._solve

            def scan_fn(p, state, ym_s, ry_s, d_s):
                def body(st, inp):
                    u, J, it, viol, kkt, st2 = solve(p, st, *inp)
                    return st2, (u, J, it, viol, kkt)

                st2, (U, J, IT, VIOL, KKT) = jax.lax.scan(
                    body, state, (ym_s, ry_s, d_s))
                return U, J, IT, VIOL, KKT, st2

            self._mstep = jit32(scan_fn)
        U, J, IT, VIOL, KKT, self.state = self._mstep(
            self._p_cache, self.state, ym_seq, ry_seq, d_seq)
        self.last_iters = IT[-1]
        self.last_viol = VIOL[-1]
        self.last_kkt = KKT[-1]     # final period's per-lane (viol, stat)
        return U, J

    def _ensure_params(self):
        # upload the template's ~40 numpy params once per version, not per
        # step (on a tunneled TPU each eager transfer costs a full RTT)
        ver = getattr(self.t, "_params_version", None)
        if getattr(self, "_p_ver", object()) != ver or ver is None:
            np_dt = np.dtype(self._dt) if self._dt is not None else None
            cast = (lambda a: a.astype(np_dt) if np_dt is not None and
                    np.issubdtype(a.dtype, np.floating) else a)
            tree = jax.tree.map(lambda v: cast(np.asarray(v)),
                                self.t.params)  # p_user may be a sub-tree
            self._p_cache = (jax.device_put(tree, self._shard_r)
                             if self._shard_r is not None
                             else jax.device_put(tree))
            self._p_ver = ver

    def step(self, ym, ry, d=None):
        if d is None:
            if getattr(self, "_dzero", None) is None:
                self._dzero = jnp.zeros((self.B, self.t.estim.model.nd),
                                        self._dt)
                jax.block_until_ready(self._dzero)
            d = self._dzero
        self._ensure_params()
        ja = ((lambda a: jnp.asarray(a, self._dt)) if self._dt is not None
              else jnp.asarray)
        ym, ry, d = ja(ym), ja(ry), ja(d)
        if self._shard_b is not None:
            ym, ry, d = jax.device_put((ym, ry, d), self._shard_b)
        u, J, it_stats, viol_max, kkt, self.state = self._solve(
            self._p_cache, self.state, ym, ry, d)
        self.last_iters = it_stats   # [max, mean] SQP iterations (device)
        self.last_viol = viol_max    # worst lane violation (device)
        self.last_kkt = kkt          # per-lane (viol, kkt_stat) — device
        return u, J
