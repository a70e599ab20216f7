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
import sys
import time

import numpy as np

BASELINE_FPS = 25.0  # MADNet + MAD on GTX 1080 Ti (BASELINE.md)
H, W = 384, 1280
WARMUP = 10
ITERS = 100
PASSES = 5


def selftest(verbose: bool = False) -> None:
    """Value-check the compiled TPU kernels against their jnp oracles at
    bench-relevant shapes (forward AND custom-VJP gradients). The round-1
    gap this closes: Pallas kernels were only ever validated in interpret
    mode on CPU; a mis-compiled Mosaic kernel would silently corrupt
    adaptation. Runs on whatever the default JAX device is — the real
    chip when the driver executes bench.py.

    Raises AssertionError on any mismatch.
    """
    import jax
    import jax.numpy as jnp

    from real_time_self_adaptive_deep_stereo_tpu.ops.correlation import (
        correlation_jnp,
        correlation_pallas,
    )
    from real_time_self_adaptive_deep_stereo_tpu.ops.warp import (
        warp_features_horizontal,
        warp_features_onehot,
        warp_image,
        warp_image_onehot,
    )
    from real_time_self_adaptive_deep_stereo_tpu.ops.warp_pallas import (
        warp_features_mxu,
        warp_features_pallas,
        warp_image_mxu,
        warp_image_pallas,
    )

    rng = np.random.default_rng(42)
    results = {}

    def check(name, got, want, tol=2e-5):
        got, want = np.asarray(got), np.asarray(want)
        scale = max(float(np.abs(want).max()), 1.0)
        err = float(np.abs(got - want).max()) / scale
        results[name] = err
        assert err < tol, f"kernel selftest {name}: rel err {err:.2e} >= {tol:.0e}"

    # 1-D correlation (MADNet scale-2 feature shape), fwd + vjp
    x = jnp.asarray(rng.normal(size=(1, 96, 320, 32)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(1, 96, 320, 32)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(1, 96, 320, 5)).astype(np.float32))
    f_pal = jax.jit(lambda a, b: correlation_pallas(a, b, 2))
    f_jnp = jax.jit(lambda a, b: correlation_jnp(a, b, 2))
    check("corr_fwd", f_pal(x, y), f_jnp(x, y))
    g_pal = jax.jit(jax.grad(lambda a, b: jnp.vdot(correlation_pallas(a, b, 2), ct), (0, 1)))
    g_jnp = jax.jit(jax.grad(lambda a, b: jnp.vdot(correlation_jnp(a, b, 2), ct), (0, 1)))
    for i, n in enumerate(("corr_dx", "corr_dy")):
        check(n, g_pal(x, y)[i], g_jnp(x, y)[i])

    # feature warp (scale-2 shape, dx within the static bounds)
    feats = jnp.asarray(rng.normal(size=(1, 96, 320, 32)).astype(np.float32))
    dx = jnp.asarray((rng.random((1, 96, 320, 1)) * 50 - 46).astype(np.float32))
    fct = jnp.asarray(rng.normal(size=feats.shape).astype(np.float32))
    want = jax.jit(warp_features_horizontal)(feats, dx)
    check("warp_feat_onehot", jax.jit(lambda f, d: warp_features_onehot(f, d, 48, 4))(feats, dx), want)
    check("warp_feat_pallas", jax.jit(lambda f, d: warp_features_pallas(f, d, 48, 4))(feats, dx), want)
    check("warp_feat_mxu", jax.jit(lambda f, d: warp_features_mxu(f, d, 48, 4))(feats, dx), want)
    gw = jax.jit(jax.grad(lambda f, d: jnp.vdot(warp_features_horizontal(f, d), fct), (0, 1)))(feats, dx)
    go = jax.jit(jax.grad(lambda f, d: jnp.vdot(warp_features_onehot(f, d, 48, 4), fct), (0, 1)))(feats, dx)
    gp = jax.jit(jax.grad(lambda f, d: jnp.vdot(warp_features_pallas(f, d, 48, 4), fct), (0, 1)))(feats, dx)
    gm = jax.jit(jax.grad(lambda f, d: jnp.vdot(warp_features_mxu(f, d, 48, 4), fct), (0, 1)))(feats, dx)
    for i, n in enumerate(("warp_feat_dfeats", "warp_feat_ddx")):
        check(f"{n}_onehot", go[i], gw[i], tol=1e-4)
        check(f"{n}_pallas", gp[i], gw[i], tol=1e-4)
        check(f"{n}_mxu", gm[i], gw[i], tol=1e-4)

    # image warp at the bench resolution (the loss-path warp)
    img = jnp.asarray((rng.random((1, H, W, 3)) * 255).astype(np.float32))
    disp = jnp.asarray((rng.random((1, H, W, 1)) * 180).astype(np.float32))
    want = jax.jit(warp_image)(img, disp)
    check("warp_img_onehot", jax.jit(lambda a, d: warp_image_onehot(a, d, 192))(img, disp), want)
    check("warp_img_pallas", jax.jit(lambda a, d: warp_image_pallas(a, d, 192))(img, disp), want)
    check("warp_img_mxu", jax.jit(lambda a, d: warp_image_mxu(a, d, 192))(img, disp), want)
    ict = jnp.asarray(rng.normal(size=img.shape).astype(np.float32))
    giw = jax.jit(jax.grad(lambda a, d: jnp.vdot(warp_image(a, d), ict), (0, 1)))(img, disp)
    gim = jax.jit(jax.grad(lambda a, d: jnp.vdot(warp_image_mxu(a, d, 192), ict), (0, 1)))(img, disp)
    for i, n in enumerate(("warp_img_dimg_mxu", "warp_img_ddisp_mxu")):
        check(n, gim[i], giw[i], tol=1e-4)

    if verbose:
        for k, v in results.items():
            print(json.dumps({"selftest": k, "rel_err": v}))
        platform = jax.devices()[0].platform
        print(f"kernel selftest ok on {platform}: {len(results)} checks", flush=True)


def main() -> None:
    import jax

    from real_time_self_adaptive_deep_stereo_tpu.utils.compile_cache import enable

    enable()  # per-host-fingerprint persistent compile cache

    import jax.numpy as jnp

    from real_time_self_adaptive_deep_stereo_tpu.adapt import (
        AdaptationEngine,
        load_block_config,
        make_blocks,
    )
    from real_time_self_adaptive_deep_stereo_tpu.adapt.fused import FusedOnlineSession
    from real_time_self_adaptive_deep_stereo_tpu.models import get_stereo_net
    from real_time_self_adaptive_deep_stereo_tpu.ops.conv import set_conv_precision

    # serving default since r04: bf16_act (bf16 MXU passes AND bf16
    # activations between convs; fp32 disparity heads). Promoted after
    # the end-to-end adaptation drift protocol measured <=0.079% D1 vs
    # fp32-exact in every mode (PARITY_RESULTS.md "Precision drift").
    # BENCH_PRECISION=highest for fp32-exact, =default for fp32-act.
    precision = os.environ.get("BENCH_PRECISION", "bf16_act")
    set_conv_precision(precision)

    # value-check the compiled kernels on this chip before timing
    # (skippable for quick FPS iterations via BENCH_SKIP_SELFTEST=1).
    # Runs in a SUBPROCESS: this runtime degrades permanently after
    # np.asarray-style device->host transfers (docs/ROADMAP.md), and the
    # selftest's value checks halved the parent's measured FPS.
    if not os.environ.get("BENCH_SKIP_SELFTEST"):
        import subprocess

        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--selftest"],
            check=True,
            stdout=sys.stderr,
        )

    model = get_stereo_net("MADNet", bulkhead=True)
    params = model.init(jax.random.PRNGKey(0))
    blocks = make_blocks(
        load_block_config("block_config/MadNet_full.json"), model.layer_to_path
    )
    engine = AdaptationEngine(model, blocks, lr=1e-4)
    # BENCH_STREAMS=N benches the multi-stream serving mode (N cameras
    # adapting independently per dispatch, vmap-ed shared-forward step);
    # the headline metric stays the single-stream lax.switch step.
    streams = int(os.environ.get("BENCH_STREAMS", "0"))
    # BENCH_MODE=NONE|FULL|MAD: which adaptation mode to time (README
    # perf table); the driver metric stays the MAD default.
    bench_mode = os.environ.get("BENCH_MODE", "MAD")
    # BENCH_NO_METRICS=1: the GT-free production-serving contract
    # (no EPE/D1/metrics buffer; NONE also drops the loss pipeline)
    no_metrics = os.environ.get("BENCH_NO_METRICS", "0") != "0"
    # BENCH_CHUNK=K: dispatch K frames per program via step_chunk
    # (lax.scan) — amortizes the ~0.3 ms/dispatch host cost; identical
    # adaptation trajectory, K-1 frames extra latency. Default 25 since
    # r04 (the measured throughput winner: 204 best / 189 median FPS
    # with bf16_act, docs/perf_matrix_r04.log); BENCH_CHUNK=0 restores
    # per-frame dispatch. Non-headline modes keep per-frame dispatch.
    chunk_default = "25" if (bench_mode == "MAD" and not streams) else "0"
    chunk = int(os.environ.get("BENCH_CHUNK", chunk_default))
    # parsed ONCE and reused by both time_session and step_tflops so the
    # flop scale always matches the unroll actually dispatched (ADVICE r3)
    chunk_unroll = int(os.environ.get("BENCH_CHUNK_UNROLL", "1"))

    def planned_steps(iters: int, passes: int) -> int:
        """Exact step budget for a time_session run: warmup rounds UP to
        one whole chunk, each pass dispatches max(1, iters//chunk) chunks
        (ADVICE r4: sessions must not outrun their metrics buffer)."""
        if chunk:
            warm = chunk * max(1, WARMUP // chunk)
            per_pass = chunk * max(1, iters // chunk)
        else:
            warm, per_pass = WARMUP, iters
        return warm + passes * per_pass + 8

    session = FusedOnlineSession(
        engine,
        params,
        mode=bench_mode,
        sample_mode="PROBABILITY",
        ssim_th=1e9,  # never reset during the bench
        max_steps=planned_steps(ITERS, PASSES),
        seed=0,
        shared_forward=os.environ.get("BENCH_SHARED", "0") != "0",
        num_streams=streams,
        stream_impl=os.environ.get("BENCH_STREAM_IMPL", "auto"),
        compute_metrics=not no_metrics,
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
    if no_metrics:
        frames = [{k: v for k, v in f.items() if k != "target"} for f in frames]
    if streams:
        frames = [
            {k: jnp.broadcast_to(v, (streams,) + v.shape) for k, v in f.items()}
            for f in frames
        ]

    # 1-min load average at the end of each timed pass — makes host CPU
    # contention (the known cause of pass-to-pass FPS spread on this
    # tunneled runtime) visible in the artifact (VERDICT r3 weak #2)
    pass_loads: list = []

    def time_session(sess, fr, iters, passes):
        """Warm up then time `passes` full passes; returns per-pass FPS.

        Async dispatch loop + ONE final drain (counted in the wall time).
        NOTE 1: an intermediate block_until_ready every N steps halved
        the measured FPS on this runtime (each device->host sync into a
        busy queue costs far more than its nominal ~27 ms); dispatches
        are ~0.25 ms so the in-flight queue never starves the host.
        NOTE 2: the tunneled chip's effective throughput varies
        run-to-run (host CPU contention starving the dispatch thread);
        the headline takes the MEDIAN pass (r5 — the defensible number;
        best_fps is still reported as the steady-state capability) and
        the JSON carries every pass + the aggregation rule so readers
        see the methodology. Device traces (tools/profile_mad.py)
        corroborate the per-step device time.
        """
        if chunk:
            stacked = {
                k: jnp.stack([fr[i % len(fr)][k] for i in range(chunk)])
                for k in fr[0]
            }
            dispatch = lambda i: sess.step_chunk(stacked, unroll=chunk_unroll)  # noqa: E731
            n_calls = max(1, iters // chunk)
            frames_per_pass = n_calls * chunk
        else:
            dispatch = lambda i: sess.step(fr[i % len(fr)])  # noqa: E731
            n_calls = iters
            frames_per_pass = iters
        for i in range(max(1, WARMUP // max(chunk, 1))):
            dispatch(i)
        sess.block_until_ready()
        per_pass = []
        for _ in range(passes):
            t0 = time.perf_counter()
            for i in range(n_calls):
                dispatch(i)
            sess.block_until_ready()
            dt = time.perf_counter() - t0
            load1 = os.getloadavg()[0]
            per_pass.append(frames_per_pass / dt)
            pass_loads.append(round(load1, 2))
            print(
                f"# pass: {frames_per_pass / dt:.2f} FPS (load1={load1:.2f})",
                file=sys.stderr,
                flush=True,
            )
        return per_pass

    def step_tflops(sess, fr) -> float:
        """Compiled-HLO flop count of ONE fused step (XLA cost analysis),
        in TFLOP. Used for the MFU line — makes regressions in the
        compute fraction visible (VERDICT r2 'what's weak' #1).

        In chunk mode the per-frame program was never compiled; use the
        already-compiled chunk program's flops instead of paying an
        extra compile between timed passes. XLA cost analysis counts a
        lax.scan body ONCE (not x trip count), so the chunk program's
        flop count covers `unroll` frames, not `chunk` frames — divide
        by the unroll factor (measured: chunk=8/unroll=1 reports the
        same raw flops as one frame)."""
        try:
            if chunk and sess._chunk_fn is not None:
                stacked = {
                    k: jnp.stack([fr[i % len(fr)][k] for i in range(chunk)])
                    for k in fr[0]
                }
                cost = sess._chunk_fn.lower(sess.state, stacked).compile().cost_analysis()
                # the scan body is counted ONCE by cost analysis and holds
                # min(unroll, chunk) frames; a non-dividing unroll adds a
                # chunk%unroll remainder epilogue also counted once
                cu_eff = min(chunk_unroll, chunk)
                scale = cu_eff + chunk % cu_eff
            else:
                cost = sess._step_fn.lower(sess.state, fr[0]).compile().cost_analysis()
                scale = 1
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            return float(cost.get("flops", 0.0)) / 1e12 / scale
        except Exception as e:  # cost analysis is best-effort on new runtimes
            print(f"# cost_analysis unavailable: {e}", file=sys.stderr)
            return 0.0

    per_pass = time_session(session, frames, ITERS, PASSES)
    headline_loads = list(pass_loads)
    best_fps = max(per_pass)
    fps = float(np.median(per_pass))  # headline = median pass (r5)
    if streams:
        # total camera-frames adapted per second
        fps = fps * streams
        best_fps = best_fps * streams

    tf_per_step = step_tflops(session, frames)
    # v5e bf16 peak: 197 TFLOPS/chip. cost_analysis counts HLO flops
    # (precision-agnostic); convs run bf16xbf16->fp32 on the MXU under
    # the default precision mode, so bf16 peak is the right denominator.
    # MFU quoted at the median pass, consistent with the headline.
    device_tflops = tf_per_step * float(np.median(per_pass))
    mfu = device_tflops / 197.0 if tf_per_step else 0.0
    print(
        json.dumps(
            {
                "metric": "madnet_step_compute",
                "tflop_per_step": round(tf_per_step, 4),
                "sustained_tflops": round(device_tflops, 2),
                "mfu_vs_v5e_bf16_peak": round(mfu, 4),
            }
        ),
        file=sys.stderr,
        flush=True,
    )

    # realism pass: default reset threshold + a drifting sequence so the
    # reward/reset controller path (params0 select, score credit) is
    # inside the timed program with realistic control flow — a perf
    # regression there cannot hide behind the reset-free headline.
    if bench_mode == "MAD" and not streams and not os.environ.get("BENCH_SKIP_REALISM"):
        drift_frames = []
        for i in range(8):
            noisy = np.clip(
                base + rng.normal(scale=6.0 + 3.0 * i, size=base.shape), 0, 255
            ).astype(np.float32)
            shift = 4 + (i % 4)
            drift_frames.append(
                {
                    "left": jnp.asarray(noisy[None]),
                    "right": jnp.asarray(np.roll(noisy, -shift, axis=1)[None]),
                    "target": jnp.asarray(np.full((1, H, W, 1), shift, np.float32)),
                }
            )
        real_sess = FusedOnlineSession(
            engine,
            params,
            mode="MAD",
            sample_mode="PROBABILITY",
            ssim_th=0.5,  # the reference default --SSIMTh
            max_steps=planned_steps(ITERS, 2),
            seed=0,
        )
        real_pass = time_session(real_sess, drift_frames, ITERS, 2)
        rstats = real_sess.finalize()
        print(
            json.dumps(
                {
                    "metric": "madnet_mad_adaptation_fps_384x1280_realistic",
                    "value": round(float(np.median(real_pass)), 2),
                    "unit": "frames/s",
                    "aggregation": "median",
                    "best_fps": round(max(real_pass), 2),
                    "chunk": chunk,
                    "resets": int(rstats["reset_count"]),
                    "pass_fps": [round(f, 2) for f in real_pass],
                    "note": "default ssim_th=0.5, drifting noisy sequence"
                    + (f", chunked dispatch (chunk={chunk})" if chunk else ""),
                }
            ),
            file=sys.stderr,
            flush=True,
        )

    # latency pass (LAST: per-frame syncs degrade this tunneled runtime,
    # docs/ROADMAP.md — nothing timed may run after it). Latency mode =
    # dispatch one frame, wait for its disparity; p50/p99 are what a
    # robot consumer of per-frame disparities actually experiences.
    if bench_mode == "MAD" and not streams and not os.environ.get("BENCH_SKIP_LATENCY"):
        # Pipelined serving mode FIRST: the shipped lowest-latency API
        # (FusedOnlineSession.step_pipelined — depth-1 overlap + f16
        # output, the cli/demo.py default). Measured before the blocking
        # loop because this runtime degrades after D2H syncs; the
        # blocking number below is the worst-case consumer by design.
        serve_sess = FusedOnlineSession(
            engine,
            params,
            mode="MAD",
            sample_mode="PROBABILITY",
            ssim_th=1e9,
            max_steps=WARMUP + 128 + 8,
            seed=0,
            compute_metrics=not no_metrics,
            disp_dtype=jnp.float16,
        )
        for i in range(WARMUP):
            serve_sess.step(frames[i % 4])
        serve_sess.block_until_ready()
        serve_sess.step_pipelined(frames[0])
        plats = []
        for i in range(1, 65):
            t0 = time.perf_counter()
            serve_sess.step_pipelined(frames[i % 4])
            plats.append((time.perf_counter() - t0) * 1e3)
        serve_sess.flush_disp()
        plats = np.sort(np.asarray(plats))
        print(
            json.dumps(
                {
                    "metric": "madnet_mad_pipelined_serve_latency_384x1280",
                    "p50_ms": round(float(plats[len(plats) // 2]), 2),
                    "p99_ms": round(float(plats[int(len(plats) * 0.99)]), 2),
                    "min_ms": round(float(plats[0]), 2),
                    "unit": "ms (steady-state disparity interval on host)",
                    "staleness_frames": 1,
                    "api": "FusedOnlineSession.step_pipelined, f16 output"
                    " (cli/demo.py default serving mode)",
                }
            ),
            file=sys.stderr,
            flush=True,
        )

        lat_sess = FusedOnlineSession(
            engine,
            params,
            mode="MAD",
            sample_mode="PROBABILITY",
            ssim_th=1e9,
            max_steps=WARMUP + 128 + 8,  # sync-free loop + latency loop
            seed=0,
            compute_metrics=not no_metrics,  # frames may lack "target"
        )
        for i in range(WARMUP):
            lat_sess.step(frames[i % 4])
        lat_sess.block_until_ready()
        # the framework's own per-frame cost (device step + host dispatch,
        # no per-frame sync): 64 steps, one drain
        t0 = time.perf_counter()
        for i in range(64):
            lat_sess.step(frames[i % 4])
        lat_sess.block_until_ready()
        step_ms = (time.perf_counter() - t0) * 1e3 / 64
        lats = []
        for i in range(64):
            t0 = time.perf_counter()
            lat_sess.step(frames[i % 4])
            jax.device_get(lat_sess.last_disp)  # the consumer's wait
            lats.append((time.perf_counter() - t0) * 1e3)
        lats = np.sort(np.asarray(lats))
        p50 = float(lats[len(lats) // 2])

        # Wire floor LAST (ADVICE r4): its ~36 blocking syncs would bias
        # the latency samples above on this runtime, which degrades after
        # device->host transfers. The axon tunnel adds a ~30 ms sync RTT
        # and a ~27 MiB/s D2H path no framework code can remove (sweep:
        # tools/probe_latency.py; healthy TPU hosts do both over PCIe in
        # <1 ms). Wire and latency samples therefore come from separate
        # queue states — wire is an idle-queue floor, the decomposition
        # below is approximate by construction. A FRESH result is
        # produced per iteration — device_get of the same array twice is
        # free (cached value).
        dev = jax.devices()[0]
        inc = jax.jit(lambda x: x + 1.0)
        tiny = jax.device_put(jnp.zeros((), jnp.float32), dev)
        rtts = []
        for _ in range(24):
            y = inc(tiny)
            y.block_until_ready()
            t0 = time.perf_counter()
            jax.device_get(y)
            rtts.append((time.perf_counter() - t0) * 1e3)
        wire_rtt = float(np.median(rtts))
        buf = jax.device_put(jnp.zeros((H * W,), jnp.float32), dev)  # disparity bytes
        d2hs = []
        for _ in range(12):
            y = inc(buf)
            y.block_until_ready()
            t0 = time.perf_counter()
            jax.device_get(y)
            d2hs.append((time.perf_counter() - t0) * 1e3)
        wire_disp = float(np.median(d2hs))  # one RTT + disparity-size transfer

        print(
            json.dumps(
                {
                    "metric": "madnet_mad_frame_latency_384x1280",
                    "p50_ms": round(p50, 2),
                    "p99_ms": round(float(lats[int(len(lats) * 0.99)]), 2),
                    "mean_ms": round(float(lats.mean()), 2),
                    "unit": "ms (dispatch->disparity on host)",
                    # decomposition. framework_step_ms = device step +
                    # host dispatch, measured sync-free (64 steps, one
                    # drain). wire_* = measured tunnel RTT / idle-queue
                    # fetch of disparity-size bytes, sampled AFTER the
                    # latency loop (separate queue state). The residual
                    # beyond framework+wire is tunnel sync overhead (an
                    # extra RTT-scale wait inside a busy-queue
                    # device_get). Healthy-host projection:
                    # framework_step_ms + <1 ms PCIe wire.
                    "framework_step_ms": round(step_ms, 2),
                    "wire_rtt_p50_ms": round(wire_rtt, 2),
                    "wire_disp_fetch_p50_ms": round(wire_disp, 2),
                    "tunnel_sync_residual_p50_ms": round(
                        max(p50 - step_ms - wire_disp, 0.0), 2
                    ),
                }
            ),
            file=sys.stderr,
            flush=True,
        )

    # metric name intentionally carries NO chunk suffix (ADVICE r4):
    # round-over-round consumers compare by exact name; chunk is a field.
    print(
        json.dumps(
            {
                "metric": f"madnet_{bench_mode.lower()}_adaptation_fps_384x1280"
                + (f"_x{streams}streams" if streams else "")
                + ("_nometrics" if no_metrics else ""),
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
                "precision": precision,
                "chunk": chunk,
                "passes": PASSES,
                "aggregation": "median" + ("*streams" if streams else ""),
                "best_fps": round(best_fps, 2),
                "pass_fps": [round(f, 2) for f in per_pass],
                "pass_load1": headline_loads,
                "mfu_vs_v5e_bf16_peak": round(mfu, 4),
            }
        )
    )


if __name__ == "__main__":
    if "--selftest" in sys.argv:
        selftest(verbose=True)
    else:
        main()
