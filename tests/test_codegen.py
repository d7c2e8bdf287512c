"""Embedded C codegen tests (mirrors reference test/5_test_extensions.jl:
the generated controller must reproduce the Julia-side control actions)."""
import ctypes
import shutil

import numpy as np
import pytest

import mpc_tpu as mpc
from mpc_tpu.codegen import export_c, compile_and_load

gcc = shutil.which("gcc")


@pytest.mark.skipif(gcc is None, reason="no C compiler")
def test_c_export_matches_python():
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    m.setop(uop=[2.0], yop=[5.0])
    ctrl = mpc.LinMPC(m, Hp=10, Hc=2, Cwt=1e5)
    ctrl.setconstraint(umin=[-10], umax=[10], dumax=[3], dumin=[-3],
                       ymax=[9.0], ymin=[0.0])
    src = export_c(ctrl, name="mpc")
    lib = compile_and_load(src, name="mpc")

    class State(ctypes.Structure):
        nx, nu = ctrl.estim.nx_hat, 1
        nz, mr = ctrl.nZt, ctrl.A_stack.shape[0]
        _fields_ = [("xhat", ctypes.c_double * nx),
                    ("lastu0", ctypes.c_double * nu),
                    ("z", ctypes.c_double * nz),
                    ("zd", ctypes.c_double * mr),
                    ("yd", ctypes.c_double * mr)]

    st = State()
    lib.mpc_init(ctypes.byref(st))
    u_c = (ctypes.c_double * 1)()
    d_dummy = (ctypes.c_double * 1)()

    rng = np.random.default_rng(3)
    for k in range(15):
        y = 5.0 + rng.normal() * 0.3
        ry = 7.0
        # python side
        ctrl.preparestate([y])
        u_py = ctrl.moveinput([ry])
        ctrl.updatestate(u_py, [y])
        # C side
        ym = (ctypes.c_double * 1)(y)
        ryv = (ctypes.c_double * 1)(ry)
        lib.mpc_step(ctypes.byref(st), ym, ryv, d_dummy, u_c)
        assert abs(u_c[0] - u_py[0]) < 2e-4, (k, u_c[0], u_py[0])


@pytest.mark.skipif(gcc is None, reason="no C compiler")
def test_c_export_mimo_with_disturbance():
    G = np.array([[mpc.tf(1.9, [18, 1]), mpc.tf(1.9, [18, 1]),
                   mpc.tf(1.9, [18, 1])],
                  [mpc.tf(-0.74, [8, 1]), mpc.tf(0.74, [8, 1]),
                   mpc.tf(-0.74, [8, 1])]], dtype=object)
    m = mpc.LinModel(G, 2.0, i_d=[2])
    ctrl = mpc.LinMPC(m, Hp=8, Hc=2, Cwt=1e5)
    ctrl.setconstraint(umax=[4.0, 4.0], umin=[-4.0, -4.0])
    src = export_c(ctrl, name="mpc2")
    lib = compile_and_load(src, name="mpc2")

    class State(ctypes.Structure):
        _fields_ = [("xhat", ctypes.c_double * ctrl.estim.nx_hat),
                    ("lastu0", ctypes.c_double * 2),
                    ("z", ctypes.c_double * ctrl.nZt),
                    ("zd", ctypes.c_double * ctrl.A_stack.shape[0]),
                    ("yd", ctypes.c_double * ctrl.A_stack.shape[0])]

    st = State()
    lib.mpc2_init(ctypes.byref(st))
    u_c = (ctypes.c_double * 2)()
    rng = np.random.default_rng(4)
    for k in range(10):
        y = rng.normal(size=2) * 0.5
        d = [0.3]
        ry = [1.0, -0.5]
        ctrl.preparestate(y, d)
        u_py = ctrl.moveinput(ry, d)
        ctrl.updatestate(u_py, y, d)
        ym = (ctypes.c_double * 2)(*y)
        ryv = (ctypes.c_double * 2)(*ry)
        dv = (ctypes.c_double * 1)(*d)
        lib.mpc2_step(ctypes.byref(st), ym, ryv, dv, u_c)
        assert np.allclose([u_c[0], u_c[1]], u_py, atol=5e-4), (k, u_c[:], u_py)


def test_c_export_guards():
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    ctrl = mpc.LinMPC(m, Hp=5, Hc=2, transcription=mpc.MultipleShooting())
    with pytest.raises(ValueError):
        export_c(ctrl)


@pytest.mark.skipif(gcc is None, reason="no C compiler")
def test_c_export_luenberger():
    """Luenberger shares the constant-gain observer form: the generated C
    tracks the JAX pipeline exactly."""
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    lo = mpc.Luenberger(m, nint_ym=[1], poles=[0.4, 0.45])
    ctrl = mpc.LinMPC(lo, Hp=10, Hc=2)
    ctrl.setconstraint(umax=[2.0])
    src = export_c(ctrl, name="luen")
    lib = compile_and_load(src, name="luen")

    class State(ctypes.Structure):
        nx, nu = ctrl.estim.nx_hat, 1
        nz, mr = ctrl.nZt, ctrl.A_stack.shape[0]
        _fields_ = [("xhat", ctypes.c_double * nx),
                    ("lastu0", ctypes.c_double * nu),
                    ("z", ctypes.c_double * nz),
                    ("zd", ctypes.c_double * mr),
                    ("yd", ctypes.c_double * mr)]

    st = State()
    lib.luen_init(ctypes.byref(st))
    u_c = (ctypes.c_double * 1)()
    d_dummy = (ctypes.c_double * 1)()
    plant = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    for k in range(20):
        y = float(plant.evaloutput()[0])
        ctrl.preparestate([y])
        u_py = ctrl.moveinput([2.5])
        ctrl.updatestate(u_py, [y])
        ym = (ctypes.c_double * 1)(y)
        ryv = (ctypes.c_double * 1)(2.5)
        lib.luen_step(ctypes.byref(st), ym, ryv, d_dummy, u_c)
        assert abs(u_c[0] - u_py[0]) < 2e-4, (k, u_c[0], u_py[0])
        assert u_py[0] <= 2.0 + 1e-8
        plant.updatestate(u_py)


@pytest.mark.skipif(gcc is None, reason="no C compiler")
def test_c_export_active_set_exact():
    """solver='active_set' emits the GI dual active set (the DAQP role of
    LinearMPC.jl's codegen): the C step matches the Python pipeline to
    machine precision because both are exact."""
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    m.setop(uop=[2.0], yop=[5.0])
    ctrl = mpc.LinMPC(m, Hp=10, Hc=2, Cwt=1e5)
    ctrl.setconstraint(umin=[-10], umax=[10], dumax=[3], dumin=[-3],
                       ymax=[9.0], ymin=[0.0])
    src = export_c(ctrl, name="gimpc", solver="active_set")
    lib = compile_and_load(src, name="gimpc")

    class State(ctypes.Structure):
        # the GI struct has no ADMM zd field
        _fields_ = [("xhat", ctypes.c_double * ctrl.estim.nx_hat),
                    ("lastu0", ctypes.c_double * 1),
                    ("z", ctypes.c_double * ctrl.nZt),
                    ("yd", ctypes.c_double * ctrl.A_stack.shape[0])]

    st = State()
    lib.gimpc_init(ctypes.byref(st))
    u_c = (ctypes.c_double * 1)()
    d_dummy = (ctypes.c_double * 1)()
    rng = np.random.default_rng(3)
    for k in range(15):
        y = 5.0 + rng.normal() * 0.3
        ry = 7.0  # drives y toward ymax=9 → output rows go active
        ctrl.preparestate([y])
        u_py = ctrl.moveinput([ry])
        ctrl.updatestate(u_py, [y])
        ym = (ctypes.c_double * 1)(y)
        ryv = (ctypes.c_double * 1)(ry)
        lib.gimpc_step(ctypes.byref(st), ym, ryv, d_dummy, u_c)
        assert abs(u_c[0] - u_py[0]) < 1e-9, (k, u_c[0], u_py[0])


@pytest.mark.skipif(gcc is None, reason="no C compiler")
def test_c_export_soft_input_bound_parity():
    """When input bounds are SOFT and the slack is active, the C receding
    clamp must use the eps-relaxed box like linmpc.py getinput — the hard
    box silently diverged the loops (review finding)."""
    m = mpc.LinModel(mpc.tf(3, [10, 1]), 1.0)
    ctrl = mpc.LinMPC(m, Hp=8, Hc=2, Cwt=1e2)
    ctrl.setconstraint(umin=[-0.5], umax=[0.5], c_umin=[1.0], c_umax=[1.0],
                       ymin=[2.0])     # hard ymin forces the u slack active
    src = export_c(ctrl, name="softmpc")
    lib = compile_and_load(src, name="softmpc")

    class State(ctypes.Structure):
        _fields_ = [("xhat", ctypes.c_double * ctrl.estim.nx_hat),
                    ("lastu0", ctypes.c_double * 1),
                    ("z", ctypes.c_double * ctrl.nZt),
                    ("zd", ctypes.c_double * ctrl.A_stack.shape[0]),
                    ("yd", ctypes.c_double * ctrl.A_stack.shape[0])]

    st = State()
    lib.softmpc_init(ctypes.byref(st))
    u_c = (ctypes.c_double * 1)()
    d_dummy = (ctypes.c_double * 1)()
    rng = np.random.default_rng(0)
    for k in range(10):
        y = rng.normal() * 0.1
        ctrl.preparestate([y])
        u_py = ctrl.moveinput([3.0])
        ctrl.updatestate(u_py, [y])
        ym = (ctypes.c_double * 1)(y)
        ryv = (ctypes.c_double * 1)(3.0)
        lib.softmpc_step(ctypes.byref(st), ym, ryv, d_dummy, u_c)
        assert abs(u_c[0] - u_py[0]) < 5e-3, (k, u_c[0], u_py[0])
        assert u_py[0] > 0.5 or k == 0   # the soft bound really is exceeded
