"""Test configuration: force CPU with 8 virtual devices so sharding
tests run anywhere.

NOTE: setting JAX_PLATFORMS in the environment is NOT sufficient on
machines where a PJRT plugin registers itself via sitecustomize (it can
override env-based platform selection). `jax.config.update` before the
first backend initialisation is authoritative, so we do both.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: most suite wall-time is XLA:CPU compiles of
# the adaptation programs; re-runs hit the cache (same dir as bench.py)
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
