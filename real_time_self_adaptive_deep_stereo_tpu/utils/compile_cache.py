"""Persistent XLA compile cache for the CLIs.

The fused adaptation step is a large program (minutes of XLA compile on
a small host, tens of seconds on TPU); without a persistent cache every
CLI process pays it again. The reference has no analogue (TF1 sessions
rebuild graphs per process too) — this is a TPU-native quality-of-life
layer: one cache directory at the repo root, shared by the CLIs,
``bench.py``, the tests and the driver entry points.

The cache is partitioned per HOST fingerprint (CPU flags + machine
arch): XLA:CPU persists AOT-compiled machine code, and a blob compiled
on a host with different ISA features loads with a loud
``cpu_aot_loader`` warning ("could lead to execution errors such as
SIGILL") and — observed in round 5 when the harness moved machines —
*different summation orders*, silently shifting fp32 numerics under the
golden-parity tolerances. Keying the directory by host features makes a
machine swap a cache miss instead of a hazard. TPU programs recompile
once per host too — acceptable (~30 s, amortized by the same cache).
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_fingerprint() -> str:
    """Short stable id of this host's ISA surface (machine arch + CPU
    feature flags). Everything XLA:CPU's AOT pipeline specializes on."""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    # flag ORDER is stable per kernel; sort anyway so an
                    # enumeration-order change can't split the cache
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{platform.machine()}|{flags}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def cache_dir_for_host(base_dir: str | None = None) -> str:
    """Resolve the per-host cache directory (see module docstring)."""
    if base_dir is None:
        base_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
            os.path.dirname(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            ),
            ".jax_cache",
        )
    leaf = f"host-{host_fingerprint()}"
    # idempotent: a resolved dir re-entering via JAX_COMPILATION_CACHE_DIR
    # (e.g. a re-exec'ed child process) must not nest host-X/host-X
    if os.path.basename(os.path.normpath(base_dir)) == leaf:
        return base_dir
    return os.path.join(base_dir, leaf)


def enable(cache_dir: str | None = None) -> None:
    """Point JAX's persistent compilation cache at the per-host subdir
    of ``cache_dir`` (default: ``.jax_cache`` next to the repo root,
    overridable via ``JAX_COMPILATION_CACHE_DIR``). Safe to call before
    or after backend init; silently no-ops on runtimes without the
    config knobs."""
    resolved = cache_dir_for_host(cache_dir)
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", resolved)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
