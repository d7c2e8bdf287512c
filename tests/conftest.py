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
