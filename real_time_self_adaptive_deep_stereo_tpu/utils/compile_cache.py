"""Persistent XLA compile cache for the CLIs.

The fused adaptation step is a large program (minutes of XLA compile on
a small host, tens of seconds on TPU); without a persistent cache every
CLI process pays it again. The reference has no analogue (TF1 sessions
rebuild graphs per process too) — this is a TPU-native quality-of-life
layer: one cache directory at the repo root, shared by the CLIs,
``bench.py``, the tests and the driver entry points.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    """Point JAX's persistent compilation cache at ``cache_dir``
    (default: ``.jax_cache`` next to the installed package's repo root,
    overridable via ``JAX_COMPILATION_CACHE_DIR``). Safe to call before
    or after backend init; silently no-ops on runtimes without the
    config knobs."""
    if cache_dir is None:
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
            os.path.dirname(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            ),
            ".jax_cache",
        )
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
