"""CompiledMHELoop: whole-record MHE estimation in one scan ≡ host protocol."""
import numpy as np
import pytest

import mpc_tpu as mpc
from mpc_tpu.sim_compiled import CompiledMHELoop


def _data(N, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(N, 1)) * 0.5, rng.normal(size=(N, 1)) * 0.2


def _host_trace(mhe, Ym, U):
    N = Ym.shape[0]
    X = np.zeros((N, mhe.nx_hat))
    for k in range(N):
        X[k] = mhe.preparestate(Ym[k])
        mhe.updatestate(U[k], Ym[k])
    return X


def test_compiled_mhe_matches_host():
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    Ym, U = _data(18)
    Xh = _host_trace(mpc.MovingHorizonEstimator(m, He=5), Ym, U)
    out = CompiledMHELoop(mpc.MovingHorizonEstimator(m, He=5)).run(Ym, U)
    assert out["ok"].all()
    assert np.abs(out["X_hat"] - Xh).max() < 1e-9


def test_compiled_mhe_nan_dropout():
    """NaN samples masked per-sample like the host (sensor dropout)."""
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    Ym, U = _data(16, seed=3)
    Ym[5] = np.nan
    Ym[11] = np.nan
    Xh = _host_trace(mpc.MovingHorizonEstimator(m, He=4), Ym, U)
    out = CompiledMHELoop(mpc.MovingHorizonEstimator(m, He=4)).run(Ym, U)
    assert np.abs(out["X_hat"] - Xh).max() < 1e-9


def test_compiled_mhe_with_bounds():
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    Ym, U = _data(15, seed=7)
    Ym *= 3.0

    def mk():
        e = mpc.MovingHorizonEstimator(m, He=4)
        e.setconstraint(xhatmin=[-0.4, -0.4], xhatmax=[0.4, 0.4])
        return e
    Xh = _host_trace(mk(), Ym, U)
    out = CompiledMHELoop(mk()).run(Ym, U)
    assert np.abs(out["X_hat"] - Xh).max() < 1e-7
    assert out["X_hat"].max() <= 0.4 + mpc.LinModel(
        mpc.tf(3, [10, 1]), 1.0).xop.max() + 1e-6


def test_compiled_mhe_multiple_shooting():
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    Ym, U = _data(14, seed=1)

    def mk():
        return mpc.MovingHorizonEstimator(
            m, He=4, transcription=mpc.MultipleShooting())
    Xh = _host_trace(mk(), Ym, U)
    out = CompiledMHELoop(mk()).run(Ym, U)
    assert np.abs(out["X_hat"] - Xh).max() < 1e-7


def test_compiled_mhe_continues_host_state():
    """Host-step half the record, compiled-scan the rest."""
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    Ym, U = _data(16, seed=9)
    full = _host_trace(mpc.MovingHorizonEstimator(m, He=5), Ym, U)
    h = mpc.MovingHorizonEstimator(m, He=5)
    _ = _host_trace(h, Ym[:8], U[:8])
    out = CompiledMHELoop(h).run(Ym[8:], U[8:])
    assert np.abs(out["X_hat"] - full[8:]).max() < 1e-9
