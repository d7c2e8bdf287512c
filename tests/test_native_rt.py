"""Native real-time executor tests (C++ rt_executor + generated C controller)."""
import ctypes
import shutil

import numpy as np
import pytest

import mpc_tpu as mpc
from mpc_tpu.codegen import export_c, compile_and_load

gcc = shutil.which("gcc")
gxx = shutil.which("g++")


@pytest.mark.skipif(gcc is None or gxx is None, reason="no C/C++ compiler")
def test_rt_executor_runs_exported_controller():
    from mpc_tpu.native import rt_run_exported

    m = mpc.LinModel(mpc.tf(3, [10, 1]), 0.01)  # Ts = 10 ms
    ctrl = mpc.LinMPC(m, Hp=10, Hc=2, Cwt=1e5)
    ctrl.setconstraint(umax=[5.0], umin=[-5.0])
    src = export_c(ctrl, name="rt")
    lib = compile_and_load(src, name="rt")

    class State(ctypes.Structure):
        _fields_ = [("xhat", ctypes.c_double * ctrl.estim.nx_hat),
                    ("lastu0", ctypes.c_double * 1),
                    ("z", ctypes.c_double * ctrl.nZt),
                    ("zd", ctypes.c_double * ctrl.A_stack.shape[0]),
                    ("yd", ctypes.c_double * ctrl.A_stack.shape[0])]

    st = State()
    lib.rt_init(ctypes.byref(st))
    steps = 60
    ym = np.zeros((steps, 1))
    ry = np.full((steps, 1), 2.0)
    # 2 ms period: generous vs the µs-scale C controller
    u, stats = rt_run_exported(lib, "rt", st, ym, ry, None, 0.002, 1, 1, 0, 1)
    s = stats.asdict()
    assert s["steps_done"] == steps
    # soft real-time: allow scheduler jitter, especially under CI load
    assert s["deadline_misses"] <= steps // 2
    assert s["mean_exec_ns"] < 2e6            # controller well under 2 ms
    assert np.all(np.isfinite(u))
    assert np.all(u <= 5.0 + 1e-9)
    # controller actually drives toward the setpoint (u > 0 throughout)
    assert u[0, 0] > 0.5


@pytest.mark.skipif(gxx is None, reason="no C++ compiler")
def test_rt_executor_paces_the_loop():
    """Wall-clock duration ≈ steps × period (absolute-deadline pacing)."""
    import time
    from mpc_tpu.native import rt_run_exported
    m = mpc.LinModel(mpc.tf(1, [1, 1]), 0.01)
    ctrl = mpc.LinMPC(m, Hp=5, Hc=1, Cwt=1e5)
    src = export_c(ctrl, name="rp")
    lib = compile_and_load(src, name="rp")

    class State(ctypes.Structure):
        _fields_ = [("xhat", ctypes.c_double * ctrl.estim.nx_hat),
                    ("lastu0", ctypes.c_double * 1),
                    ("z", ctypes.c_double * ctrl.nZt),
                    ("zd", ctypes.c_double * ctrl.A_stack.shape[0]),
                    ("yd", ctypes.c_double * ctrl.A_stack.shape[0])]

    st = State()
    lib.rp_init(ctypes.byref(st))
    steps, period = 50, 0.004
    t0 = time.time()
    u, stats = rt_run_exported(lib, "rp", st, np.zeros((steps, 1)),
                               np.ones((steps, 1)), None, period, 1, 1, 0, 1)
    wall = time.time() - t0
    assert abs(wall - steps * period) < 0.1 * steps * period + 0.05


@pytest.mark.skipif(gcc is None or gxx is None, reason="no C/C++ compiler")
def test_rt_executor_budget_overruns():
    """Solve-budget accounting (limit_solve_time analogue,
    general.jl:109-121): a microscopic budget flags every step as a budget
    overrun even when the absolute deadlines are all met."""
    from mpc_tpu.native import rt_run_exported

    m = mpc.LinModel(mpc.tf(3, [10, 1]), 0.01)
    ctrl = mpc.LinMPC(m, Hp=10, Hc=2, Cwt=1e5)
    ctrl.setconstraint(umax=[5.0], umin=[-5.0])
    src = export_c(ctrl, name="rtb")
    lib = compile_and_load(src, name="rtb")

    class State(ctypes.Structure):
        _fields_ = [("xhat", ctypes.c_double * ctrl.estim.nx_hat),
                    ("lastu0", ctypes.c_double * 1),
                    ("z", ctypes.c_double * ctrl.nZt),
                    ("zd", ctypes.c_double * ctrl.A_stack.shape[0]),
                    ("yd", ctypes.c_double * ctrl.A_stack.shape[0])]

    st = State()
    lib.rtb_init(ctypes.byref(st))
    steps = 20
    ym = np.zeros((steps, 1))
    ry = np.full((steps, 1), 2.0)
    # 1 ns solve budget: every step overruns it; 5 ms period: deadlines OK
    u, stats = rt_run_exported(lib, "rtb", st, ym, ry, None, 0.005,
                               1, 1, 0, 1, budget_s=1e-9)
    s = stats.asdict()
    assert s["steps_done"] == steps
    assert s["budget_overruns"] == steps
    # generous budget: no overruns
    st2 = State()
    lib.rtb_init(ctypes.byref(st2))
    u, stats = rt_run_exported(lib, "rtb", st2, ym, ry, None, 0.005,
                               1, 1, 0, 1, budget_s=1.0)
    assert stats.asdict()["budget_overruns"] == 0
