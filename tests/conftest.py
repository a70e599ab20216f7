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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent compile cache: most suite wall-time is XLA:CPU compiles of
# the adaptation programs; re-runs hit the cache (same dir as bench.py).
# Partitioned per host fingerprint — XLA:CPU AOT blobs from a different
# machine load with SIGILL warnings and different fp32 summation orders
# (observed when the round-5 harness moved hosts).
from real_time_self_adaptive_deep_stereo_tpu.utils.compile_cache import (  # noqa: E402
    enable as _enable_compile_cache,
)

_enable_compile_cache()
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass
