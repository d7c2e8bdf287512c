#!/usr/bin/env python
"""Reference-style case-study benchmarks (benchmark/3_bench_predictive_control.jl).

Measures per-step closed-loop latency for the reference's three headline
case studies, re-expressed in this framework:

1. CSTR LinMPC            (reference :166-215 — OSQP/DAQP CSTR study)
2. Pendulum NonLinMPC     (reference :370-435 — Ipopt pendulum swing-up)
3. Pendulum SL-MPC        (reference :652-710 — successive linearization,
                           the manual's 210×-per-step / 75×-closed-loop
                           headline, docs/src/manual/nonlinmpc.md:417-502)

The reference's published numbers are author-machine CPU timings
(0.015 s/step NonLinMPC vs 71 µs/step SL-MPC).  For comparability this
script times the same closed loops on the host CPU backend by default;
pass --tpu to run on the tunneled TPU chip instead (per-step latency there
is dominated by the tunnel round trip, so throughput-style benchmarks live
in bench.py).

Run: python bench_case_studies.py [--tpu] [--steps N]
"""
import argparse
import json
import time

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--tpu", action="store_true", help="run on the TPU backend")
p.add_argument("--steps", type=int, default=60)
args = p.parse_args()

import jax  # noqa: E402

if not args.tpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import mpc_tpu as mpc  # noqa: E402

N = args.steps


def timed_loop(fn, n):
    """Run fn(k) n times; return (total_s, median_step_s, p99_step_s)."""
    ts = []
    for k in range(n):
        t0 = time.perf_counter()
        fn(k)
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts)
    return float(ts.sum()), float(np.median(ts)), float(np.percentile(ts, 99))


def report(name, total, med, p99, extra=""):
    line = {"case": name, "total_s": round(total, 4),
            "median_step_ms": round(med * 1e3, 4),
            "p99_step_ms": round(p99 * 1e3, 4)}
    print(json.dumps(line), extra)


# ----------------------------------------------------------------- CSTR LinMPC
# (reference CSTR: 2×2 first-order TITO plant, soft y bounds, feedforward d)
G = mpc.tf_matrix([
    [mpc.tf(1.90, [18, 1]), mpc.tf(1.90, [18, 1]), mpc.tf(1.90, [18, 1])],
    [mpc.tf(-0.74, [8, 1]), mpc.tf(0.74, [8, 1]), mpc.tf(0.74, [8, 1])],
])
model = mpc.LinModel(G, 2.0, i_d=[2])
model.setop(uop=[20, 20], yop=[50, 30], dop=[20])
ctrl = mpc.LinMPC(model, Hp=10, Hc=2, Mwt=[1, 1], Nwt=[0.1, 0.1],
                  dtype=jnp.float32 if args.tpu else None)
ctrl.setconstraint(umin=[5, 5], umax=[35, 35], ymin=[45, 25], ymax=[55, 35])
plant = mpc.LinModel(G, 2.0, i_d=[2])
plant.setop(uop=[20, 20], yop=[50, 30], dop=[20])
ry, d = np.array([54.0, 28.0]), np.array([25.0])

# warm-up (jit compile)
y = plant.evaloutput(d)
ctrl.preparestate(y, d)
u = ctrl.moveinput(ry, d)
ctrl.updatestate(u, y, d)
plant.updatestate(u, d)


def cstr_step(k):
    y = plant.evaloutput(d)
    ctrl.preparestate(y, d)
    u = ctrl.moveinput(ry, d)
    ctrl.updatestate(u, y, d)
    plant.updatestate(u, d)


report("CSTR LinMPC (Hp=10,Hc=2, soft y + hard u)", *timed_loop(cstr_step, N))

# same case on the GI dual active-set QP (the reference benches OSQP *and*
# DAQP on this plant, 3_bench_predictive_control.jl:166-215)
ctrl_as = mpc.LinMPC(model, Hp=10, Hc=2, Mwt=[1, 1], Nwt=[0.1, 0.1],
                     qp_solver="active_set",
                     dtype=jnp.float32 if args.tpu else None)
ctrl_as.setconstraint(umin=[5, 5], umax=[35, 35], ymin=[45, 25], ymax=[55, 35])
plant_as = mpc.LinModel(G, 2.0, i_d=[2])
plant_as.setop(uop=[20, 20], yop=[50, 30], dop=[20])


def cstr_step_as(k):
    y = plant_as.evaloutput(d)
    ctrl_as.preparestate(y, d)
    u = ctrl_as.moveinput(ry, d)
    ctrl_as.updatestate(u, y, d)
    plant_as.updatestate(u, d)


cstr_step_as(0)  # warm-up
report("CSTR LinMPC (active-set QP, DAQP role)", *timed_loop(cstr_step_as, N))


if args.tpu:
    # Per-step latency through the tunneled chip is round-trip-bound
    # (~150 ms/step vs 2-10 ms of compute); the nonlinear single-controller
    # cases measure nothing useful there. Fleet throughput on TPU is the
    # meaningful metric — see bench.py (11-13M solves/s/chip).
    print(json.dumps({"note": "tpu per-step latency is tunnel-RTT-bound; "
                              "nonlinear cases skipped (see bench.py)"}))
    raise SystemExit(0)


# ------------------------------------------------------- pendulum NonLinMPC
def f(x, u, d, par):
    g, L, K, m = par
    return jnp.array([x[1], -g / L * jnp.sin(x[0]) - K / m * x[1]
                      + u[0] / (m * L ** 2)])


h = lambda x, d, par: jnp.array([x[0] * 180 / jnp.pi])
par = (9.8, 0.4, 1.2, 0.3)


def make_pendulum():
    return mpc.NonLinModel(f, h, 0.1, 1, 2, 1, p=par, solver=mpc.RungeKutta(4))


pend = make_pendulum()
estim = mpc.UnscentedKalmanFilter(pend, sigmaQ=[0.1, 1.0], sigmaR=[5.0],
                                  nint_ym=[1], sigmaQint_ym=[0.1])
nmpc = mpc.NonLinMPC(estim, Hp=20, Hc=2, Mwt=[0.5], Nwt=[2.5], Cwt=np.inf)
nmpc.setconstraint(umin=[-1.5], umax=[1.5])
plant2 = make_pendulum()
u = np.zeros(1)

# warm-up
y = plant2.evaloutput()
nmpc.preparestate(y)
u = nmpc.moveinput([180.0])
nmpc.updatestate(u, y)
plant2.updatestate(u)
theta = []


def nmpc_step(k):
    global u
    y = plant2.evaloutput()
    nmpc.preparestate(y)
    u = nmpc.moveinput([180.0])
    theta.append(float(y[0]))
    nmpc.updatestate(u, y)
    plant2.updatestate(u)


tot_nmpc, med_nmpc, p99_nmpc = timed_loop(nmpc_step, N)
report("pendulum NonLinMPC (UKF, Hp=20, Hc=2, SQP)", tot_nmpc, med_nmpc,
       p99_nmpc, f"# θ_end={theta[-1]:.1f}°")


# ---------------------------------------------------------- pendulum SL-MPC
pend3 = make_pendulum()
sl = mpc.SLMPC(pend3, Hp=20, Hc=2, Mwt=[0.5], Nwt=[2.5],
               sigmaQ=[0.1, 1.0], sigmaR=[5.0], nint_ym=[1],
               sigmaQint_ym=[0.1], qp_solver="active_set")
sl.setconstraint(umin=[-1.5], umax=[1.5])
plant3 = make_pendulum()
ry = np.array([180.0])

# warm-up
y = plant3.evaloutput()
u, _ = sl.moveinput_closed(jnp.asarray(y), jnp.asarray(ry))
plant3.updatestate(u)
theta_sl = []


def sl_step(k):
    y = plant3.evaloutput()
    u, _ = sl.moveinput_closed(jnp.asarray(y), jnp.asarray(ry))
    theta_sl.append(float(y[0]))
    plant3.updatestate(u)


tot_sl, med_sl, p99_sl = timed_loop(sl_step, N)
report("pendulum SL-MPC (fused linearize→QP→EKF)", tot_sl, med_sl, p99_sl,
       f"# θ_end={theta_sl[-1]:.1f}°")

print(json.dumps({
    "case": "SL-MPC vs NonLinMPC per-step speedup",
    "speedup_median": round(med_nmpc / med_sl, 1),
    "speedup_closed_loop": round(tot_nmpc / tot_sl, 1),
    "reference_headline": "210x per-step / 75x closed-loop (author CPU)",
}))
