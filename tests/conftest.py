import os

# Run the test suite on a virtual 8-device CPU mesh so multi-chip sharding is
# exercised without TPU hardware; float64 for numeric parity with the Julia
# reference.  NOTE: on this machine the axon TPU plugin ignores the
# JAX_PLATFORMS env var — use jax.config instead.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the suite compiles hundreds of small
# programs (every controller/estimator construction jits); caching them on
# disk is shared across xdist workers AND across runs (first run pays,
# reruns start ~warm).  Keyed by HLO hash — safe across code edits.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache_mpc_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
