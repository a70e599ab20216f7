"""Batched offline evaluation CLI — inference-only evaluation over a
frame list, the workload the reference serves by running
``Stereo_Online_Adaptation.py --mode NONE`` (inference + metrics, no
training; reference `Stereo_Online_Adaptation.py:176-199,262-288`).

Redesigned for offline TPU throughput rather than translated: frames
are *batched* (default 4), which amortizes the batch-1 HBM-bound
feeding cost that caps online serving (measured +47% MADNet / +133%
DispNet FPS at batch 8 — docs/ROADMAP.md round-5 item 7), and dispatch
is asynchronous so host decode I/O overlaps device compute. Online
adaptation is per-frame by contract, so batching only exists here, on
the no-feedback path, where it is semantically free: each frame's
disparity and metrics are identical to the batch-1 result.

Emits the same artifacts as ``adapt --mode NONE``: ``stats.csv`` /
``series.csv`` / ``params.sh`` (reference format,
`Stereo_Online_Adaptation.py:262-288`), optional 16-bit disparity PNGs.

Run:  python -m real_time_self_adaptive_deep_stereo_tpu.cli.evaluate \
        -l list.csv -o out/ --weights w.npz --modelName MADNet --batch 4
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

MAX_DISP = 256  # clip for serialized disparities (reference static param)


def build_argparser() -> argparse.ArgumentParser:
    from real_time_self_adaptive_deep_stereo_tpu.models import STEREO_FACTORY

    p = argparse.ArgumentParser(
        description="Batched offline evaluation of a deep stereo network (TPU)"
    )
    p.add_argument("-l", "--list", required=True, help="frame list file")
    p.add_argument("-o", "--output", required=True, help="output folder")
    p.add_argument("--weights", required=True, help="weights (.npz or TF1 ckpt)")
    p.add_argument("--modelName", default="MADNet", choices=list(STEREO_FACTORY))
    p.add_argument("--imageShape", type=int, nargs="+", default=[320, 1216])
    p.add_argument(
        "--batch",
        type=int,
        default=4,
        help="frames per device program; >1 amortizes the batch-1 "
        "HBM-bound feeding cost (see docs/ROADMAP.md). Per-frame "
        "results are batch-size independent.",
    )
    p.add_argument("--corrMode", default="auto", choices=["auto", "jnp", "pallas"])
    p.add_argument(
        "--precision",
        default="bf16_act",
        choices=["default", "bf16", "bf16_act", "highest"],
        help="conv precision policy; bf16_act is the serving default "
        "(drift-gated in PARITY_RESULTS.md), 'default' for exact-parity runs",
    )
    p.add_argument(
        "--logDispStep",
        type=int,
        default=-1,
        help="dump a 16-bit disparity PNG every N frames (-1 = never)",
    )
    return p


def main(args) -> dict:
    import jax
    import jax.numpy as jnp

    from real_time_self_adaptive_deep_stereo_tpu.utils.compile_cache import enable

    enable()

    from real_time_self_adaptive_deep_stereo_tpu.adapt.engine import (
        d1_metric,
        disparity_metrics,
    )
    from real_time_self_adaptive_deep_stereo_tpu.data import (
        StereoDataset,
        prefetch_to_device,
    )
    from real_time_self_adaptive_deep_stereo_tpu.models import get_stereo_net
    from real_time_self_adaptive_deep_stereo_tpu.ops.conv import set_conv_precision
    from real_time_self_adaptive_deep_stereo_tpu.utils.checkpoint import (
        restore_or_init,
    )
    from real_time_self_adaptive_deep_stereo_tpu.utils.visual import (
        save_disparity_png,
    )

    set_conv_precision(args.precision)
    os.makedirs(args.output, exist_ok=True)
    if args.logDispStep != -1:
        os.makedirs(os.path.join(args.output, "disparities"), exist_ok=True)

    dataset = StereoDataset(
        args.list,
        batch_size=args.batch,
        crop_shape=args.imageShape,
        num_epochs=1,
        augment=False,
        is_training=False,
        shuffle=False,
    )
    n_frames = len(dataset)

    model = get_stereo_net(args.modelName, corr_mode=args.corrMode)
    params = model.init(jax.random.PRNGKey(0))
    params, restored, _ = restore_or_init(args.output, params, args.weights, model)
    if not restored:
        raise SystemExit(f"could not restore weights from {args.weights}")
    print(f"Restored weights from {args.weights}")

    @jax.jit
    def step(p, left, right, gt):
        disp = model.forward(p, left, right)["full_res_disp"]
        epe, bad3 = jax.vmap(disparity_metrics)(disp, gt)
        _, d1 = jax.vmap(d1_metric)(disp, gt)
        return disp, epe, bad3, d1

    def batches():
        """Pad the eval remainder up to --batch on host so the program
        compiles once; the padded frames' metrics are dropped below."""
        for b in dataset:
            n = b["left"].shape[0]
            if n < args.batch:
                reps = args.batch - n
                b = {
                    k: np.concatenate([v] + [v[-1:]] * reps, axis=0)
                    for k, v in b.items()
                }
            yield b

    pending = []  # (epe_dev, bad3_dev, d1_dev) — fetched after the loop
    frame_idx = 0
    t0 = time.perf_counter()
    for batch in prefetch_to_device(batches(), size=2):
        disp, epe, bad3, d1 = step(
            params, batch["left"], batch["right"], batch["target"]
        )
        pending.append((epe, bad3, d1))
        if args.logDispStep != -1:
            # fetching disparities syncs; only pay it at the dump stride
            for j in range(args.batch):
                fi = frame_idx + j
                if fi < n_frames and fi % args.logDispStep == 0:
                    save_disparity_png(
                        os.path.join(
                            args.output, "disparities", f"disparity_{fi}.png"
                        ),
                        np.asarray(disp[j]),
                        MAX_DISP,
                    )
        frame_idx += args.batch
    # drain: a host fetch of the last batch's metrics fences everything
    fetched = [
        tuple(np.asarray(x, np.float64) for x in triple) for triple in pending
    ]
    exec_time = time.perf_counter() - t0

    epe = np.concatenate([f[0] for f in fetched])[:n_frames]
    bad3 = np.concatenate([f[1] for f in fetched])[:n_frames]
    d1 = np.concatenate([f[2] for f in fetched])[:n_frames]

    from real_time_self_adaptive_deep_stereo_tpu.adapt.runner import SessionStats
    from real_time_self_adaptive_deep_stereo_tpu.cli.adapt import write_stats

    stats = SessionStats(
        epe=list(epe),
        bad3=list(bad3),
        d1=list(d1),
        steps=n_frames,
        exec_time=exec_time,
    )
    write_stats(args.output, stats)
    print(
        f"{n_frames} frames in {exec_time:.2f}s -> {stats.fps:.4g} FPS "
        f"(batch {args.batch}, {args.precision})  "
        f"avg EPE {epe.mean():.3f}  bad3 {bad3.mean():.3f}  D1 {d1.mean():.2f}"
    )
    print(f"Result saved in {args.output}")
    return {
        "fps": stats.fps,
        "avg_epe": float(epe.mean()),
        "avg_bad3": float(bad3.mean()),
        "avg_d1": float(d1.mean()),
    }


def cli() -> None:
    args = build_argparser().parse_args()
    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "params.sh"), "w") as f:
        argv = list(sys.argv)
        argv[0] = os.path.join(os.getcwd(), argv[0])
        f.write("#!/bin/bash\npython3 " + " ".join(argv) + "\n")
    main(args)


if __name__ == "__main__":
    cli()
