"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding tests work without TPU hardware; Pallas kernels run in
interpret mode (selected inside the ops when not on TPU)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The hosting environment may pre-register a TPU platform and override
# jax_platforms after import; force CPU for the test suite.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
