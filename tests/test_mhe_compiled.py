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


def test_fused_mhe_mpc_pipeline_matches_host_composition():
    """CompiledMHEMPCLoop ≡ the reference's ManualEstimator pattern
    (manual.jl:99-128): MHE feeding a LinMPC through setstate."""
    from mpc_tpu.sim_compiled import CompiledMHEMPCLoop

    def _m():
        return mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    N = 20
    rng = np.random.default_rng(3)
    eps_y = 0.1 * rng.normal(size=(N, 1))
    ry = np.array([4.0])

    mhe = mpc.MovingHorizonEstimator(_m(), He=5)
    ctrl = mpc.LinMPC(mpc.ManualEstimator(_m()), Hp=10, Hc=2)
    plant = _m()
    mhe.initstate(np.zeros(1), np.zeros(1))
    Y = np.zeros((N, 1)); U = np.zeros((N, 1))
    for k in range(N):
        y = plant.evaloutput() + eps_y[k]
        xh = mhe.preparestate(y)
        ctrl.setstate(xh)
        ctrl.preparestate(y)
        u = ctrl.moveinput(ry)
        Y[k] = y; U[k] = u
        plant.updatestate(u)
        mhe.updatestate(u, y)

    mhe2 = mpc.MovingHorizonEstimator(_m(), He=5)
    ctrl2 = mpc.LinMPC(mpc.ManualEstimator(_m()), Hp=10, Hc=2)
    mhe2.initstate(np.zeros(1), np.zeros(1))
    res = CompiledMHEMPCLoop(mhe2, ctrl2).run(N, ry=ry, y_noise=[0.1],
                                              seed=3)
    assert np.abs(U - res.u_data).max() < 1e-9
    assert np.abs(Y - res.y_data).max() < 1e-9


def test_fused_pipeline_rejects_mismatched_augmentation():
    from mpc_tpu.sim_compiled import CompiledMHEMPCLoop
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    mhe = mpc.MovingHorizonEstimator(m, He=4, nint_ym=[2])
    ctrl = mpc.LinMPC(mpc.ManualEstimator(m), Hp=10, Hc=2)
    with pytest.raises(ValueError, match="mismatch"):
        CompiledMHEMPCLoop(mhe, ctrl)
