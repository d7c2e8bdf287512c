"""Host<->device transfer regression tests.

The reference's performance bar for steady-state hot paths is "0 allocations"
(docstrings kalman.jl:91,381,629,998, explicitmpc.jl:106-111, benchmark tag
`benchmark/benchmarks.jl:7`).  The TPU-native analogue of that discipline is
"0 host<->device transfers": on a tunneled TPU every eager upload costs a full
round trip, so fleet steps must be pure device computation and single
controllers must never re-ship their params tree once cached.

Two enforcement mechanisms:
  * ``jax.transfer_guard("disallow")`` around steady-state fleet steps with
    device-resident inputs — any implicit transfer raises.
  * counting ``jax.device_put`` calls across steady-state single-controller
    steps — the params cache must hit (0 uploads after warm-up).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mpc_tpu as mpc
from mpc_tpu.parallel import BatchedLinMPC, BatchedKalman, random_cstr_controllers


def test_batched_linmpc_step_is_transfer_free():
    """Steady-state fleet step = pure device compute (no implicit transfers)."""
    ctrls = random_cstr_controllers(4, Hp=8, Hc=2, seed=3)
    bat = BatchedLinMPC(ctrls)
    B = bat.B
    ym = jax.device_put(np.zeros((B, 2)))
    ry = jax.device_put(np.ones((B, 2)))
    u, n_conv = bat.step(ym, ry)  # warm-up: compile + any lazy uploads
    jax.block_until_ready(u)
    with jax.transfer_guard("disallow"):
        u, n_conv = bat.step(ym, ry)
        jax.block_until_ready(u)
    assert int(n_conv) == B


def test_batched_kalman_step_is_transfer_free():
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    bat = BatchedKalman([mpc.KalmanFilter(m) for _ in range(8)])
    ym = jax.device_put(np.zeros((8, 1)))
    u = jax.device_put(np.zeros((8, 1)))
    x = bat.step(ym, u)
    jax.block_until_ready(x)
    with jax.transfer_guard("disallow"):
        x = bat.step(ym, u)
        jax.block_until_ready(x)
    assert np.asarray(x).shape[0] == 8


@pytest.fixture
def device_put_counter(monkeypatch):
    calls = dict(n=0)
    real = jax.device_put

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(jax, "device_put", counting)
    return calls


def _siso_mpc(cls, **kw):
    m = mpc.LinModel(mpc.tf(2, [5, 1]) * mpc.delay(1), 1.0)
    return cls(m, Hp=10, Hc=2, **kw)


@pytest.mark.parametrize("cls", [mpc.LinMPC, mpc.ExplicitMPC])
def test_single_controller_params_cached(cls, device_put_counter):
    """The ~40-array params tree ships once per version, never per step."""
    c = _siso_mpc(cls)
    ym = np.zeros(1)
    for _ in range(2):  # warm-up: first step uploads the params cache
        c.preparestate(ym)
        c.moveinput(np.ones(1))
        c.updatestate(np.zeros(1), ym)
    device_put_counter["n"] = 0
    for _ in range(3):
        c.preparestate(ym)
        u = c.moveinput(np.ones(1))
        c.updatestate(u, ym)
    assert device_put_counter["n"] == 0


def test_setconstraint_invalidates_then_recaches(device_put_counter):
    """One re-upload after a data swap, then cached again."""
    c = _siso_mpc(mpc.LinMPC)
    ym = np.zeros(1)
    c.preparestate(ym)
    c.moveinput(np.ones(1))
    c.updatestate(np.zeros(1), ym)
    c.setconstraint(umin=[-5.0], umax=[5.0])
    device_put_counter["n"] = 0
    c.preparestate(ym)
    c.moveinput(np.ones(1))
    c.updatestate(np.zeros(1), ym)
    n_after_swap = device_put_counter["n"]
    assert n_after_swap >= 1  # the swap re-shipped the tree once
    device_put_counter["n"] = 0
    c.preparestate(ym)
    c.moveinput(np.ones(1))
    assert device_put_counter["n"] == 0
