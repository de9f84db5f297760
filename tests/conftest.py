"""Test env: force CPU with 8 virtual devices so sharding paths run anywhere.

The outer environment may pin JAX_PLATFORMS to a TPU transport (e.g. axon);
jax.config.update wins over the env var, and must run before the backend
initializes — pytest imports conftest before any test module.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
