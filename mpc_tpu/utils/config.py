"""Global numeric configuration for mpc_tpu.

The reference (ModelPredictiveControl.jl) works in Float64 throughout
(``src/model/linmodel.jl:253`` defaults ``NT=Float64``).  On TPU, f64 is
emulated and slow, so the policy here is:

* **construct-time** math (discretization, DARE, prediction matrices) always
  runs in NumPy float64 on host — it is the "compile" phase and gates parity;
* **runtime** (jitted hot path) dtype is selectable: float64 for parity
  testing on CPU, float32/bfloat16 for TPU throughput.

``set_dtype``/``default_dtype`` control the runtime dtype used when model /
controller parameter pytrees are materialized as jax arrays.
"""
from __future__ import annotations

import os

import numpy as np

# Large-but-finite stand-in for ±Inf bounds inside jitted kernels.  XLA needs
# static shapes, so infinite bounds are kept as rows with ±BIG instead of being
# dropped (the reference drops non-finite rows at construct time with the i_b
# mask, src/controller/construct.jl:936-941).
BIG = 1e20

_DTYPE = np.float64 if os.environ.get("MPC_TPU_X64", "1") == "1" else np.float32


def set_dtype(dtype) -> None:
    """Set the runtime dtype for jax parameter pytrees (f64 needs jax x64)."""
    global _DTYPE
    _DTYPE = np.dtype(dtype).type


def default_dtype():
    """Runtime dtype used when materializing parameter pytrees."""
    return _DTYPE


def enable_x64() -> None:
    """Enable float64 in jax (call before any tracing)."""
    import jax

    jax.config.update("jax_enable_x64", True)
    set_dtype(np.float64)


def precision32(fn):
    """Trace ``fn`` under float32 matmul precision.

    On TPU the MXU's default matmul precision is bf16-ish passes; for f32
    control math (Â-power stacks, KKT solves, covariance updates) that
    silently destroys convergence (ops/qp.py learned this first).  Wrapping
    the trace — not the call — costs nothing on CPU and pins every dot
    inside to full f32 on TPU.
    """
    import functools
    import jax

    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("float32"):
            return fn(*a, **k)
    return wrapped


def jit32(fn, **jit_kwargs):
    """``jax.jit`` with the f32-matmul-precision trace context applied."""
    import jax
    return jax.jit(precision32(fn), **jit_kwargs)
