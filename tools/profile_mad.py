"""Profile the fused MAD adaptation step at the bench configuration.

Builds the exact bench.py session (384x1280, MAD, PROBABILITY sampler),
warms up, captures a jax.profiler device trace over N steps, and prints
the op-family time table (utils/profiling.summarize_trace) plus the
per-step wall clock. This is the tool that drives the "where do the
non-conv milliseconds go" work (docs/ROADMAP.md item 1).

Usage: python tools/profile_mad.py [--steps 25] [--shared] [--logdir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 384, 1280


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--shared", action="store_true")
    ap.add_argument("--no-arena", action="store_true")
    ap.add_argument("--mode", default="MAD", choices=["NONE", "FULL", "MAD"])
    ap.add_argument("--logdir", default="/tmp/mad_trace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument(
        "--streams", type=int, default=0,
        help="profile the num_streams=N lax.map serving composition "
        "(the 150-vs-186 FPS gap diagnosis)",
    )
    ap.add_argument(
        "--no-metrics", action="store_true",
        help="profile the GT-free serving step (compute_metrics=False)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from real_time_self_adaptive_deep_stereo_tpu.adapt import (
        AdaptationEngine,
        load_block_config,
        make_blocks,
    )
    from real_time_self_adaptive_deep_stereo_tpu.adapt.fused import FusedOnlineSession
    from real_time_self_adaptive_deep_stereo_tpu.models import get_stereo_net
    from real_time_self_adaptive_deep_stereo_tpu.ops.conv import set_conv_precision
    from real_time_self_adaptive_deep_stereo_tpu.utils.profiling import (
        summarize_trace,
        trace,
    )

    from real_time_self_adaptive_deep_stereo_tpu.utils.compile_cache import enable

    enable()  # per-host-fingerprint persistent compile cache
    set_conv_precision(os.environ.get("BENCH_PRECISION", "default"))

    model = get_stereo_net("MADNet", bulkhead=True)
    params = model.init(jax.random.PRNGKey(0))
    blocks = make_blocks(
        load_block_config(
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "block_config", "MadNet_full.json")
        ),
        model.layer_to_path,
    )
    engine = AdaptationEngine(model, blocks, lr=1e-4)
    session = FusedOnlineSession(
        engine, params, mode=args.mode, sample_mode="PROBABILITY",
        ssim_th=1e9, max_steps=args.steps + 40, seed=0,
        shared_forward=args.shared, arena=not args.no_arena,
        num_streams=args.streams, compute_metrics=not args.no_metrics,
    )

    rng = np.random.default_rng(0)
    base = rng.random((H, W, 3)).astype(np.float32) * 255
    frames = []
    for i in range(4):
        shift = 4 + i
        frames.append({
            "left": jnp.asarray(base[None]),
            "right": jnp.asarray(np.roll(base, -shift, axis=1)[None]),
            "target": jnp.asarray(np.full((1, H, W, 1), shift, np.float32)),
        })
    if args.no_metrics:
        frames = [{k: v for k, v in f.items() if k != "target"} for f in frames]
    if args.streams:
        frames = [
            {k: jnp.broadcast_to(v, (args.streams,) + v.shape) for k, v in f.items()}
            for f in frames
        ]

    for i in range(10):
        session.step(frames[i % 4])
    session.block_until_ready()

    # stale traces from prior runs would mix their modules into the
    # summary: remove exactly the profiler artifacts, never the
    # directory itself (--logdir may point at a dir with user data)
    import glob as _glob

    for f in _glob.glob(
        os.path.join(args.logdir, "**", "*.trace.json.gz"), recursive=True
    ):
        os.remove(f)
    t0 = time.perf_counter()
    with trace(args.logdir):
        for i in range(args.steps):
            session.step(frames[i % 4])
        session.block_until_ready()
    dt = time.perf_counter() - t0

    print(f"\n{args.steps} steps in {dt*1e3:.1f} ms -> {dt/args.steps*1e3:.2f} ms/step "
          f"({args.steps/dt:.1f} FPS)  mode={args.mode} shared={args.shared} "
          f"arena={not args.no_arena}")
    mods = summarize_trace(args.logdir, top=5, track="XLA Modules")
    for name, count, ms in mods:
        print(f"device program {name}: {count} execs, {ms/max(count,1):.3f} ms each")
    print(f"{'op family (device XLA Ops track)':<48}{'count':>8}{'total ms':>12}{'ms/step':>10}")
    for name, count, ms in summarize_trace(args.logdir, top=args.top):
        print(f"{name:<48}{count:>8}{ms:>12.2f}{ms/args.steps:>10.3f}")


if __name__ == "__main__":
    main()
