"""Benchmark: MAD online-adaptation throughput on one chip.

Measures the headline number of the reference system — frames/second of
MADNet online adaptation in MAD mode (forward + sampled-block backward
+ update + reward/reset controller + metrics, all fused in ONE XLA
program per frame) at 384x1280 — and compares against the reference
baseline (~25 FPS on a GTX 1080 Ti, BASELINE.md).

Uses the device-resident FusedOnlineSession: the frame loop performs
async dispatches only; a single sync closes the measurement.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_FPS = 25.0  # MADNet + MAD on GTX 1080 Ti (BASELINE.md)
H, W = 384, 1280
WARMUP = 10
ITERS = 100


def main() -> None:
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from real_time_self_adaptive_deep_stereo_tpu.adapt import (
        AdaptationEngine,
        load_block_config,
        make_blocks,
    )
    from real_time_self_adaptive_deep_stereo_tpu.adapt.fused import FusedOnlineSession
    from real_time_self_adaptive_deep_stereo_tpu.models import get_stereo_net
    from real_time_self_adaptive_deep_stereo_tpu.ops.conv import set_conv_precision

    # standard TPU conv precision (bf16 multiplies, fp32 accumulation);
    # set BENCH_PRECISION=highest for the fp32-exact parity mode
    set_conv_precision(os.environ.get("BENCH_PRECISION", "default"))

    model = get_stereo_net("MADNet", bulkhead=True)
    params = model.init(jax.random.PRNGKey(0))
    blocks = make_blocks(
        load_block_config("block_config/MadNet_full.json"), model.layer_to_path
    )
    engine = AdaptationEngine(model, blocks, lr=1e-4)
    session = FusedOnlineSession(
        engine,
        params,
        mode="MAD",
        sample_mode="PROBABILITY",
        ssim_th=1e9,  # never reset during the bench
        max_steps=WARMUP + ITERS + 8,
        seed=0,
    )

    rng = np.random.default_rng(0)
    base = rng.random((H, W, 3)).astype(np.float32) * 255
    frames = []
    for i in range(4):
        shift = 4 + i
        frames.append(
            {
                "left": jnp.asarray(base[None]),
                "right": jnp.asarray(np.roll(base, -shift, axis=1)[None]),
                "target": jnp.asarray(np.full((1, H, W, 1), shift, np.float32)),
            }
        )

    for i in range(WARMUP):
        session.step(frames[i % len(frames)])
    session.block_until_ready()

    t0 = time.perf_counter()
    for i in range(ITERS):
        session.step(frames[i % len(frames)])
        if (i + 1) % 25 == 0:
            session.block_until_ready()  # bound the in-flight queue
    session.block_until_ready()
    dt = time.perf_counter() - t0
    fps = ITERS / dt

    print(
        json.dumps(
            {
                "metric": "madnet_mad_adaptation_fps_384x1280",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
