"""Test configuration: run on CPU with an 8-device virtual mesh.

Must set platform env vars before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin overrides the JAX_PLATFORMS env var; force the
# CPU backend through the config (must happen before backend init).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
