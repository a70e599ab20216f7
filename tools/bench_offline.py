"""Batched OFFLINE inference bench: amortize the batch-1 HBM-bound cost.

The serving benches (bench.py) run batch 1 because online adaptation is
per-frame by contract. Offline workloads are not: the reference itself
trains at batch 4 (Train.py:24-51) and evaluates folders of frames
(Test.py), so batching is in-protocol whenever no adaptation feedback
loop forces frame-at-a-time execution. Round-4 profiling attributed the
MAD step's 20% MFU floor to intrinsic batch-1 feeding costs (C=3 input
convs, HBM-bound elementwise tails — docs/ROADMAP.md); batch>1 is the
lever that amortizes them.

Measures MADNet and DispNet forward-only FPS/MFU at 384x1280 over a
batch sweep, GT-free (full_res_disp only), bf16_act precision (the
serving default, gated by PARITY_RESULTS.md drift rows). Async dispatch
with one drain per pass, median-of-passes (same methodology as
bench.py).

Usage:
    python tools/bench_offline.py [--models MADNet,Dispnet]
        [--batches 1,2,4,8] [--iters 32] [--passes 3]
        [--trace /tmp/offline_trace]  # per-op attribution of the last
                                      # (model, batch) combination
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 384, 1280
V5E_BF16_PEAK_TFLOPS = 197.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="MADNet,Dispnet")
    ap.add_argument("--batches", default="1,2,4,8")
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--height", type=int, default=H)
    ap.add_argument("--width", type=int, default=W)
    ap.add_argument("--precision", default=os.environ.get("BENCH_PRECISION", "bf16_act"))
    ap.add_argument("--trace", default="", help="profiler logdir for the last combo")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from real_time_self_adaptive_deep_stereo_tpu.models import get_stereo_net
    from real_time_self_adaptive_deep_stereo_tpu.ops.conv import set_conv_precision
    from real_time_self_adaptive_deep_stereo_tpu.utils.compile_cache import enable

    enable()
    set_conv_precision(args.precision)
    h, w = args.height, args.width

    combos = [
        (m, int(b))
        for m in args.models.split(",")
        for b in args.batches.split(",")
    ]
    rng = np.random.default_rng(0)
    base = (rng.random((h, w, 3)) * 255).astype(np.float32)

    for ci, (model_name, batch) in enumerate(combos):
        model = get_stereo_net(model_name)
        params = model.init(jax.random.PRNGKey(0))

        # Measurement integrity on the tunneled runtime (docs/ROADMAP.md
        # round-4 notes): (1) repeated executions of the SAME program on
        # the SAME inputs are memoized behind the tunnel (a naive loop
        # reported 13,000 "FPS"), so every dispatch must depend on the
        # previous output — `eps` threads a O(1e-10) perturbation of the
        # left image through the chain; (2) block_until_ready does not
        # fence actual completion — only a host scalar fetch does, so
        # each pass drains with float(eps).
        def _fwd(p, l, r, eps):
            return model.forward(p, l + eps, r)["full_res_disp"]

        fwd = jax.jit(_fwd)
        chain = jax.jit(lambda o: o[0, 0, 0, 0] * 1e-12)
        left = jnp.asarray(np.broadcast_to(base, (batch, h, w, 3)).copy())
        right = jnp.asarray(
            np.broadcast_to(np.roll(base, -6, axis=1), (batch, h, w, 3)).copy()
        )
        eps0 = jnp.zeros((), jnp.float32)

        # compiled-HLO flops of the whole batch program
        try:
            cost = fwd.lower(params, left, right, eps0).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            tflop = float(cost.get("flops", 0.0)) / 1e12
        except Exception:
            tflop = 0.0

        eps = eps0
        for _ in range(6):  # warmup
            out = fwd(params, left, right, eps)
            eps = chain(out)
        float(eps)  # true fence (device_get)

        per_pass = []
        tracing = args.trace and ci == len(combos) - 1
        ctx = None
        if tracing:
            from real_time_self_adaptive_deep_stereo_tpu.utils.profiling import trace

            ctx = trace(args.trace)
            ctx.__enter__()
        for _ in range(args.passes):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fwd(params, left, right, eps)
                eps = chain(out)
            float(eps)  # drain
            dt = time.perf_counter() - t0
            per_pass.append(args.iters * batch / dt)
        if ctx is not None:
            ctx.__exit__(None, None, None)

        fps = float(np.median(per_pass))
        sustained = tflop / batch * fps  # TFLOP/frame * frames/s
        print(
            json.dumps(
                {
                    "metric": f"{model_name.lower()}_offline_inference_fps_{h}x{w}",
                    "batch": batch,
                    "value": round(fps, 2),
                    "unit": "frames/s",
                    "precision": args.precision,
                    "tflop_per_frame": round(tflop / batch, 4),
                    "sustained_tflops": round(sustained, 2),
                    "mfu_vs_v5e_bf16_peak": round(sustained / V5E_BF16_PEAK_TFLOPS, 4),
                    "pass_fps": [round(f, 2) for f in per_pass],
                    "aggregation": "median",
                }
            ),
            flush=True,
        )

    if args.trace:
        from real_time_self_adaptive_deep_stereo_tpu.utils.profiling import (
            summarize_trace,
        )

        print(f"\nper-op attribution of last combo ({combos[-1]}):")
        print(f"{'op family':<48}{'count':>8}{'total ms':>12}")
        for name, count, ms in summarize_trace(args.trace, top=25):
            print(f"{name:<48}{count:>8}{ms:>12.2f}")


if __name__ == "__main__":
    main()
