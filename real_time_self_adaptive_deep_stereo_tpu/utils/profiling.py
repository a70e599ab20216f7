"""Profiling / tracing utilities.

The reference's only introspection is wall-clock per-100-frames timing
(Stereo_Online_Adaptation.py:230-239). Here:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace directory.
* :func:`summarize_trace` — parse the trace protobuf back into an
  op-family time table (what we use on headless machines).
* :class:`StepTimer` — rolling per-frame wall-clock stats with the
  reference's every-N logging cadence.
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
import re
import time
from collections import deque
from typing import Dict, List, Optional, Tuple

__all__ = ["trace", "summarize_trace", "StepTimer"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with trace('/tmp/tr'): run_steps()``."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def summarize_trace(
    logdir: str, top: int = 30, track: str = "XLA Ops"
) -> List[Tuple[str, int, float]]:
    """Aggregate DEVICE-track trace events by op family.

    Only events on a ``/device:*`` process's ``track`` thread (default
    the per-op "XLA Ops" track) are counted — host python spans and the
    per-program "XLA Modules" spans would double-count every device op
    (host launch + module + op all overlap in wall time). Pass
    ``track="XLA Modules"`` for whole-program device times instead.

    Returns [(name, count, total_ms)] sorted by total time — the tool
    used to find that warps/reduce-windows dominated the adaptation step.
    """
    agg: Dict[str, List[float]] = {}
    for f in glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True):
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        events = data.get("traceEvents", [])
        dev_pids = set()
        track_tids = set()
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                if str(e.get("args", {}).get("name", "")).startswith("/device:"):
                    dev_pids.add(e.get("pid"))
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "thread_name":
                if e.get("pid") in dev_pids and e.get("args", {}).get("name") == track:
                    track_tids.add((e.get("pid"), e.get("tid")))
        for e in events:
            if (
                e.get("ph") == "X"
                and "dur" in e
                and (e.get("pid"), e.get("tid")) in track_tids
            ):
                name = e.get("name", "?")
                if name.startswith("$") or "Pjit" in name:
                    continue
                base = re.sub(r"[.\d]+$", "", name)
                a = agg.setdefault(base, [0, 0.0])
                a[0] += 1
                a[1] += e["dur"]
    out = sorted(
        ((k, int(v[0]), v[1] / 1000.0) for k, v in agg.items()),
        key=lambda kv: -kv[2],
    )
    return out[:top]


class StepTimer:
    """Rolling wall-clock stats for the frame loop."""

    def __init__(self, window: int = 100):
        self.window = window
        self._times: deque = deque(maxlen=window)
        self._last: Optional[float] = None
        self.total = 0.0
        self.steps = 0

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            self.total += dt
            self.steps += 1
        self._last = now

    @property
    def avg_ms(self) -> float:
        return 1000.0 * sum(self._times) / len(self._times) if self._times else 0.0

    @property
    def fps(self) -> float:
        return self.steps / self.total if self.total > 0 else 0.0
