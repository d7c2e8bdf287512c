"""f32 accuracy envelope: which configs hold which parity bars on-device.

The 1e-5 golden-parity bar is an f64 property.  TPU-native execution is f32
(with f32-pinned matmul precision via jit32 and an f64-residual polish), and
round-1 left the f32 envelope uncharacterized.  This matrix pins the measured
f32-vs-f64 agreement per config class; the bars below are ~3× the observed
worst case, so a regression in the f32 path trips them.

Envelope summary (CPU f32 emulation of the TPU dtype policy):
- well-conditioned LinMPC (all outputs weighted): u agrees to ~1e-4
- weakly-weighted flat directions (Mwt contains 0): u may drift O(1) along
  the QP's flat valley — only the WEIGHTED outputs hold a bar (~1e-3)
- Kalman estimators: x̂ agrees to ~1e-5 over 50 steps
- MHE window estimates: ~1e-4
"""
import numpy as np
import pytest
import jax.numpy as jnp

import mpc_tpu as mpc


def _cstr_model():
    G = np.array([[mpc.tf(1.90, [18, 1]), mpc.tf(1.90, [18, 1])],
                  [mpc.tf(-0.74, [8, 1]), mpc.tf(0.74, [8, 1])]], dtype=object)
    m = mpc.LinModel(G, 2.0)
    m.setop(uop=[20, 20], yop=[50, 30])
    return m


def _closed_loop_u(ctrl, model, N=25, ry=(54.0, 30.0)):
    plant = _cstr_model()
    us = []
    for _ in range(N):
        y = plant.evaloutput()
        ctrl.preparestate(y)
        u = ctrl.moveinput(list(ry))
        us.append(np.asarray(u, float))
        plant.updatestate(u)
        ctrl.updatestate(u, y)
    return np.asarray(us)


def test_linmpc_f32_envelope_well_conditioned():
    """All-outputs-weighted condensed QP: f32 u within 3e-4 of f64."""
    m64, m32 = _cstr_model(), _cstr_model()
    c64 = mpc.LinMPC(m64, Hp=10, Hc=2, Mwt=[1, 1], Nwt=[0.1, 0.1])
    c32 = mpc.LinMPC(m32, Hp=10, Hc=2, Mwt=[1, 1], Nwt=[0.1, 0.1],
                     dtype=jnp.float32)
    for c in (c64, c32):
        c.setconstraint(umin=[5, 5], umax=[35, 35], dumin=[-4, -4],
                        dumax=[4, 4])
    U64 = _closed_loop_u(c64, m64)
    U32 = _closed_loop_u(c32, m32)
    assert np.max(np.abs(U64 - U32)) < 3e-4


def test_linmpc_f32_envelope_flat_direction():
    """Mwt=[1,0]: the unweighted output leaves a near-flat QP valley — u is
    NOT reproducible in f32 (documented), but the weighted output's closed
    loop is (within 1e-3)."""
    G = mpc.tf_matrix([[mpc.tf(2, [10, 1])], [mpc.tf(10, [4, 1])]])

    def run(dtype):
        model = mpc.LinModel(G, 1.0)
        plant = mpc.LinModel(G, 1.0)
        ctrl = mpc.LinMPC(model, Mwt=[1, 0], Nwt=[0.1], dtype=dtype)
        ctrl.setconstraint(ymax=[np.inf, 35])
        ys = []
        for _ in range(30):
            y = plant.evaloutput()
            ctrl.preparestate(y)
            u = ctrl.moveinput([5.0, 0.0])
            ys.append(y.copy())
            plant.updatestate(u)
            ctrl.updatestate(u, y)
        return np.asarray(ys)

    Y64, Y32 = run(None), run(jnp.float32)
    assert np.max(np.abs(Y64[:, 0] - Y32[:, 0])) < 1e-3   # weighted output
    assert np.max(Y32[:, 1]) <= 35.0 + 1e-2               # bound still held


def test_kalman_f32_envelope():
    """SKF/KF state estimates: f32 within 3e-5 of f64 over 50 steps."""
    m = _cstr_model()
    rng = np.random.default_rng(0)
    ys = rng.normal(size=(50, 2)) * 0.5 + m.yop
    for cls in (mpc.SteadyKalmanFilter, mpc.KalmanFilter):
        e64, e32 = cls(_cstr_model()), cls(_cstr_model())
        xs = []
        for est, dt in ((e64, np.float64), (e32, np.float32)):
            x_tr = []
            for y in ys.astype(dt):
                est.preparestate(y)
                x_tr.append(est.updatestate(np.zeros(2, dt) + 20.0, y))
            xs.append(np.asarray(x_tr))
        assert np.max(np.abs(xs[0] - xs[1])) < 3e-5, cls.__name__


def test_slmpc_f32_envelope():
    """Fused SL-MPC (jacfwd → condensed QP → EKF): f32 u within 2e-3 of f64
    on a mildly nonlinear plant (the pendulum swing-up case additionally
    validates f32 qualitatively on real TPU in test_sim_compiled)."""
    f = lambda x, u, d, p: x + 0.1 * (-jnp.sin(x) + u)
    h = lambda x, d, p: x

    def run(dtype):
        plant = mpc.NonLinModel(f, h, 0.1, 1, 1, 1, solver=None)
        ctrl = mpc.SLMPC(mpc.NonLinModel(f, h, 0.1, 1, 1, 1, solver=None),
                         Hp=10, Hc=2, Mwt=[1.0], Nwt=[0.1], dtype=dtype)
        us = []
        for _ in range(20):
            y = plant.evaloutput()
            u, conv = ctrl.moveinput_closed(y, [0.8])
            us.append(np.asarray(u, float))
            plant.updatestate(u)
        return np.asarray(us)

    U64, U32 = run(None), run(jnp.float32)
    assert np.max(np.abs(U64 - U32)) < 2e-3


def test_batched_mhe_f32_slot_space_subprocess():
    """The bench's MHE fleet configuration class — pure-f32 GI slot space
    (x64 DISABLED, unlike this suite's conftest) — must converge and track
    the f64 estimates.  Runs in a subprocess to control the x64 flag."""
    import subprocess
    import sys
    code = r"""
import numpy as np, jax
jax.config.update('jax_platforms', 'cpu')   # no x64 here on purpose
import jax.numpy as jnp
import mpc_tpu as mpc
from mpc_tpu.parallel import BatchedMHE
m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
t = mpc.MovingHorizonEstimator(m, He=5)
t.setconstraint(xhatmin=[-0.3, -np.inf], xhatmax=[0.3, np.inf])
B = 8
fleet = BatchedMHE(t, B, dtype=jnp.float32, gi_max_active=6)
ref = [mpc.MovingHorizonEstimator(m, He=5) for _ in range(B)]
for r in ref:
    r.setconstraint(xhatmin=[-0.3, -np.inf], xhatmax=[0.3, np.inf])
rng = np.random.default_rng(4)
u = np.zeros((B, 1))
for k in range(10):
    ym = rng.normal(size=(B, 1)) * 0.5
    xb = np.asarray(fleet.step(ym, u))
    xs = np.array([ref[i].preparestate(ym[i]) for i in range(B)])
    assert int(np.asarray(fleet.last_ok).sum()) == B, k
    # f32 data + f32 slot space vs f64 single-stream: 1e-3 envelope
    assert np.allclose(xb, xs, atol=1e-3), (k, np.abs(xb - xs).max())
    u = rng.normal(size=(B, 1)) * 0.2
    for i in range(B):
        ref[i].updatestate(u[i], ym[i])
print('F32-SLOT-OK')
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=420)
    assert "F32-SLOT-OK" in r.stdout, r.stdout[-800:] + r.stderr[-800:]


def test_batched_linmpc_f32_slot_space_closed_loop_subprocess():
    """The bench's large/shared fleet lanes run the GI solver with a PURE
    f32 slot space (x64 disabled) in the closed-loop serving regime; this
    pins the safety claim — every lane converges at every step over a
    long horizon and tracks the mixed-precision (x64) answer.  Runs in a
    subprocess to control the x64 flag."""
    import subprocess
    import sys
    code = r"""
import numpy as np, jax
jax.config.update('jax_platforms', 'cpu')   # no x64 here on purpose
import jax.numpy as jnp
import mpc_tpu as mpc
from mpc_tpu.parallel import BatchedLinMPC
from mpc_tpu.utils.config import jit32

rng0 = np.random.default_rng(0)
ctrls, plants = [], []
for i in range(4):
    A = np.diag(rng0.uniform(0.45, 0.8, 4))
    A += rng0.normal(size=(4, 4)) * 0.02
    A *= min(1.0, 0.85 / np.max(np.abs(np.linalg.eigvals(A))))
    Bu = rng0.normal(size=(4, 4)) * 0.5 + np.eye(4)
    md = mpc.LinModel(mpc.ss(A, Bu, np.eye(4), np.zeros((4, 4)), 2.0), 2.0)
    c = mpc.LinMPC(md, Hp=10, Hc=3, Mwt=np.ones(4), Nwt=np.ones(4),
                   Cwt=1e3, qp_solver='active_set', gi_max_active=8)
    c.setconstraint(umin=np.full(4, -10.0), umax=np.full(4, 10.0),
                    dumin=np.full(4, -4.0), dumax=np.full(4, 4.0),
                    ymin=np.full(4, -60.0), ymax=np.full(4, 60.0))
    ctrls.append(c)
    plants.append((A, Bu))
B = 32
reps = B // 4
bat = BatchedLinMPC(ctrls, dtype=jnp.float32, reps=reps, grouped_chunks=2)
A_t = jnp.asarray(np.tile(np.stack([p[0] for p in plants]),
                          (reps, 1, 1)), jnp.float32)
B_t = jnp.asarray(np.tile(np.stack([p[1] for p in plants]),
                          (reps, 1, 1)), jnp.float32)
raw = bat._step
d0 = jnp.zeros((B, 0), jnp.float32)
bud = jnp.asarray(2**30, jnp.int32)

@jit32
def closed(params, eparams, state, xt, noise, ry, d_, budget):
    ym = xt + noise                       # C = I
    u, nc, it, new_state = raw(params, eparams, state, ym, ry, d_, budget)
    xt2 = (jnp.einsum('bij,bj->bi', A_t, xt)
           + jnp.einsum('bij,bj->bi', B_t, u))
    return u, nc, new_state, xt2

rng = np.random.default_rng(1)
ry0 = rng.normal(size=(B, 4)) * 2.0
seq = [(jnp.asarray(rng.normal(size=(B, 4)) * 0.1, jnp.float32),
        jnp.asarray(ry0 + rng.normal(size=(B, 4)) * 0.2, jnp.float32))
       for _ in range(4)]
xt = jnp.zeros((B, 4), jnp.float32)
for k in range(60):
    u, nc, bat.state, xt = closed(bat.params, bat.eparams, bat.state, xt,
                                  *seq[k % 4], d0, bud)
    assert int(np.asarray(nc)) == B, (k, int(np.asarray(nc)))
assert np.all(np.isfinite(np.asarray(xt)))
print('F32-LINMPC-CL-OK')
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=420)
    assert "F32-LINMPC-CL-OK" in r.stdout, r.stdout[-800:] + r.stderr[-800:]


def test_ukf_alpha_f32_envelope():
    """UKF sigma weights scale ~1/α²: at the classic α=1e-3 the f32
    weighted-mean sums cancel 1e8-scale products and leave O(degrees) of
    state error from a ZERO innovation (round-5 finding — this silently
    mis-tracked the round-4 nonlinear fleet by ~15°); α ≥ 0.1 keeps f32
    within ~1e-4 of f64.  Pins both sides of the envelope, plus the
    fleet-construction warning."""
    import warnings
    import jax
    import jax.numpy as jnp
    import mpc_tpu as mpc
    from mpc_tpu.parallel import BatchedNonLinMPC

    def f(x, u, d, par):
        g, L, K_, m_ = par
        return jnp.array([x[1], -g / L * jnp.sin(x[0]) - K_ / m_ * x[1]
                          + u[0] / (m_ * L ** 2)])

    h = lambda x, d, par: jnp.array([x[0] * 180 / jnp.pi])
    x0 = np.array([np.pi * 0.98, 0.05, 0.0])
    ym0 = np.array([0.98 * 180.0])        # = ĥ(x̂): zero innovation
    d0 = np.zeros(0)
    errs = {}
    for alpha in (1e-3, 0.5):
        pend = mpc.NonLinModel(f, h, 0.1, 1, 2, 1,
                               p=(9.8, 0.4, 1.2, 0.3),
                               solver=mpc.RungeKutta(4))
        est = mpc.UnscentedKalmanFilter(pend, sigmaQ=[0.1, 1.0],
                                        sigmaR=[5.0], nint_ym=[1],
                                        sigmaQint_ym=[0.1], alpha=alpha)
        corr, _ = est._kernels()
        out = {}
        for dt in (jnp.float64, jnp.float32):
            x0c, _ = corr(jnp.asarray(x0, dt),
                          jnp.asarray(est.P0_hat, dt),
                          jnp.asarray(ym0, dt), jnp.asarray(d0, dt),
                          jnp.asarray(est.m_hat, dt),
                          jnp.asarray(est.S_hat, dt),
                          jnp.asarray(est.R_hat, dt))
            out[dt] = np.asarray(x0c, float)
        errs[alpha] = np.abs(out[jnp.float32] - out[jnp.float64]).max()
    assert errs[0.5] < 1e-4, errs          # safe side of the envelope
    assert errs[1e-3] > 1e-3, errs         # the hazard is real (pinned)
    # fleet guard: f32 + small alpha warns
    pend = mpc.NonLinModel(f, h, 0.1, 1, 2, 1, p=(9.8, 0.4, 1.2, 0.3),
                           solver=mpc.RungeKutta(4))
    t = mpc.NonLinMPC(pend, Hp=4, Hc=2, sqp_iters=3, sigmaQ=[0.1, 1.0],
                      sigmaR=[5.0], nint_ym=[1], sigmaQint_ym=[0.1])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        BatchedNonLinMPC(t, 2, dtype=jnp.float32)
    assert any("alpha" in str(x.message) for x in w)
