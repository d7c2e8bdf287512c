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


def _setup_compilation_cache() -> None:
    """Persistent XLA compilation cache — the analogue of the reference's
    precompile workload (src/precompile.jl:33-122): the first process pays the
    compile, later processes reload compiled executables from disk.  Opt out
    with MPC_TPU_NO_COMPILE_CACHE=1; relocate with MPC_TPU_COMPILE_CACHE."""
    if os.environ.get("MPC_TPU_NO_COMPILE_CACHE", "") == "1":
        return
    import jax
    # Namespace the cache by a host-CPU fingerprint: XLA:CPU AOT entries bake
    # in the compile machine's feature set (avx512 variants, scatter/gather
    # preferences) and loading them on a different host logs errors and can
    # SIGILL — a moved home directory must get a fresh cache, not a stale one.
    try:
        import hashlib
        with open("/proc/cpuinfo") as fh:
            flags = next((ln for ln in fh if ln.startswith("flags")), "")
        fp = hashlib.sha1(flags.encode()).hexdigest()[:12]
    except OSError:
        fp = "default"
    cache_dir = os.environ.get(
        "MPC_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "mpc_tpu_jax", fp))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache even fast compiles: fleet/loop graphs are built from many
        # small jits and the tunneled-TPU compiler round trips dominate
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except (OSError, AttributeError):  # read-only FS / older jax: best-effort
        pass


_setup_compilation_cache()


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
