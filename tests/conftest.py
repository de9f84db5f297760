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

# Persistent XLA compile cache: the suite is dominated by one-time CPU
# compiles of interpret-mode kernels (measured: a 54 s test re-runs in 14 s
# warm).  The cache lives inside the repo (gitignored) so it survives across
# sessions on this machine; it is machine-specific, never committed.  The two
# "Loading XLA:CPU AOT result ... prefer-no-scatter" E-lines on warm runs are
# a cosmetic feature-string mismatch, not an error.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA:CPU compile time degrades as a single process accumulates live
    executables (measured: the same test compiles 11 s in a fresh process vs
    32 s late in the suite).  Compiled programs are rarely shared across test
    modules (different shapes), so dropping them at each module boundary
    keeps every file near its fresh-process compile speed; the persistent
    .jax_cache still serves repeat compiles across modules and runs."""
    yield
    import jax as _jax

    _jax.clear_caches()
