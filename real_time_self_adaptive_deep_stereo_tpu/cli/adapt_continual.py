"""Continual adaptation CLI — counterpart of reference
``Stereo_Continual_Adaptation.py`` (TPAMI 2021): adaptation against
precomputed *proxy* disparity labels instead of the photometric loss,
KITTI D1 metric, ``--dilation`` training stride, tunable reward
``--decay``/``--uf``, and the overall.csv / series.csv / histogram.csv
outputs.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

import numpy as np

MAX_DISP = 256


def build_argparser() -> argparse.ArgumentParser:
    from real_time_self_adaptive_deep_stereo_tpu.adapt.samplers import AVAILABLE_SAMPLER
    from real_time_self_adaptive_deep_stereo_tpu.models import STEREO_FACTORY

    p = argparse.ArgumentParser(
        description="Continual adaptation of a deep stereo network (TPU)"
    )
    p.add_argument("-l", "--list", required=True)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--weights", required=True)
    p.add_argument("--modelName", default="MADNet", choices=list(STEREO_FACTORY))
    p.add_argument("--numBlocks", type=int, default=1)
    p.add_argument("--lr", type=float, default=0.0001)
    p.add_argument("--blockConfig", required=True)
    p.add_argument("--sampleMode", default="PROBABILITY", choices=AVAILABLE_SAMPLER)
    p.add_argument("--fixedID", type=int, nargs="+", default=[0])
    p.add_argument("--reprojectionScale", type=int, default=1)
    p.add_argument("--summary", action="store_true")
    p.add_argument("--imageShape", type=int, nargs="+", default=[320, 1216])
    p.add_argument("--SSIMTh", type=float, default=0.5)
    p.add_argument("--sampleFrequency", type=int, default=1)
    p.add_argument("--mode", default="MAD", choices=["NONE", "FULL", "MAD"])
    p.add_argument("--logDispStep", type=int, default=-1)
    p.add_argument("--saveWeights", action="store_true")
    p.add_argument("--dilation", type=int, default=1)
    p.add_argument("--decay", type=float, default=0.99)
    p.add_argument("--uf", type=float, default=0.01)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--corrMode", default="auto", choices=["auto", "jnp", "pallas"])
    p.add_argument(
        "--sessionMode", default="auto", choices=["auto", "fused", "host"]
    )
    return p


def main(args) -> dict:
    import jax

    from real_time_self_adaptive_deep_stereo_tpu.utils.compile_cache import enable

    enable()  # persistent XLA cache: CLIs must not cold-compile per process

    from real_time_self_adaptive_deep_stereo_tpu.adapt import (
        AdaptationEngine,
        OnlineAdaptationSession,
        load_block_config,
        make_blocks,
    )
    from real_time_self_adaptive_deep_stereo_tpu.data import (
        StereoDataset,
        prefetch_to_device,
    )
    from real_time_self_adaptive_deep_stereo_tpu.models import get_stereo_net
    from real_time_self_adaptive_deep_stereo_tpu.utils.checkpoint import (
        restore_or_init,
        save_step_checkpoint,
    )
    from real_time_self_adaptive_deep_stereo_tpu.utils.visual import save_disparity_png

    os.makedirs(args.output, exist_ok=True)
    if args.logDispStep != -1:
        os.makedirs(os.path.join(args.output, "disparities"), exist_ok=True)

    dataset = StereoDataset(
        args.list,
        batch_size=1,
        crop_shape=args.imageShape,
        num_epochs=1,
        augment=False,
        is_training=False,
        shuffle=False,
        load_proxy=True,
    )

    model_kwargs = {"corr_mode": args.corrMode}
    if args.modelName == "MADNet":
        model_kwargs["bulkhead"] = args.mode == "MAD"
    model = get_stereo_net(args.modelName, **model_kwargs)

    params = model.init(jax.random.PRNGKey(args.seed or 0))
    params, restored, _ = restore_or_init(args.output, params, args.weights, model)
    if not restored:
        raise SystemExit(f"could not restore weights from {args.weights}")

    blocks = make_blocks(load_block_config(args.blockConfig), model.layer_to_path)
    engine = AdaptationEngine(
        model,
        blocks,
        lr=args.lr,
        optimizer="momentum",
        adaptation="proxy",
        reprojection_scale=args.reprojectionScale,
    )
    session_mode = args.sessionMode
    if session_mode == "auto":
        session_mode = "host" if (args.summary or args.logDispStep != -1) else "fused"

    hist_path = os.path.join(args.output, "histogram.csv")
    with open(hist_path, "w") as f:
        f.write("Histogram\n")

    if session_mode == "fused":
        import time as _time

        from real_time_self_adaptive_deep_stereo_tpu.adapt.fused import (
            FusedOnlineSession,
        )
        from real_time_self_adaptive_deep_stereo_tpu.adapt.runner import SessionStats

        # FIXED trains exactly the listed blocks (host/reference semantics,
        # Sampler/sampler_factory.py:23-37 — the sampler ignores its nominal
        # count); the fused step's static shapes require
        # num_blocks == len(fixedID), so derive it here (same as cli/adapt.py).
        fixed_ids = list(np.atleast_1d(args.fixedID))
        num_blocks = args.numBlocks
        if args.sampleMode == "FIXED" and args.mode == "MAD":
            if num_blocks != len(fixed_ids):
                print(
                    f"# FIXED: training the {len(fixed_ids)} listed block(s) "
                    f"{fixed_ids}; --numBlocks {num_blocks} ignored",
                    flush=True,
                )
            num_blocks = len(fixed_ids)
        fsession = FusedOnlineSession(
            engine,
            params,
            mode=args.mode,
            sample_mode=args.sampleMode,
            num_blocks=num_blocks,
            fixed_id=fixed_ids if len(fixed_ids) > 1 else fixed_ids[0],
            sample_frequency=args.sampleFrequency,
            ssim_th=args.SSIMTh,
            decay=args.decay,
            uf=args.uf,
            dilation=args.dilation,
            max_steps=dataset.get_max_steps() + 8,
            seed=args.seed or 0,
        )
        t0 = _time.perf_counter()
        for frame in prefetch_to_device(iter(dataset), size=2):
            fsession.step(frame)
        fsession.block_until_ready()
        host = fsession.finalize()
        stats = SessionStats(
            epe=list(host["epe"]),
            bad3=list(host["bad3"]),
            d1=list(host["d1"]),
            loss=list(host["loss"]),
            fetch_counter=[int(c) for c in host["fetch_counter"]],
            sample_distribution=np.asarray(host["scores"], np.float64),
            reset_counter=int(host["reset_count"]),
            steps=host["steps"],
            exec_time=_time.perf_counter() - t0,
        )
        with open(hist_path, "a") as f:
            f.write(f"{stats.fetch_counter}\n")
        session = fsession  # for saveWeights below
        session.params = fsession.current_params()
    else:
        session = OnlineAdaptationSession(
            engine,
            params,
            mode=args.mode,
            sample_mode=args.sampleMode,
            num_blocks=args.numBlocks,
            fixed_id=args.fixedID if len(args.fixedID) > 1 else args.fixedID[0],
            sample_frequency=args.sampleFrequency,
            ssim_th=args.SSIMTh,
            decay=args.decay,
            uf=args.uf,
            dilation=args.dilation,
            seed=args.seed,
        )

        for step, frame in enumerate(prefetch_to_device(iter(dataset), size=2)):
            out = session.step(frame)
            if step % 100 == 0:
                with open(hist_path, "a") as f:
                    f.write(f"{session.stats.fetch_counter}\n")
                print(f"Step: {step:04d} \tEPE:{out['epe']:.3f}\tD1:{out['d1']:.3f}")
            if args.logDispStep != -1 and step % args.logDispStep == 0:
                save_disparity_png(
                    os.path.join(args.output, "disparities", f"disparity_{step}.png"),
                    np.asarray(out["disp"])[0],
                    MAX_DISP,
                )

        stats = session.stats
    with open(os.path.join(args.output, "overall.csv"), "w") as f:
        f.write("EPE\tD1\n")
        f.write(f"{np.mean(stats.epe):.3f}\t{np.mean(stats.d1):.3f}\n")
    with open(os.path.join(args.output, "series.csv"), "w") as f:
        f.write("step\tEPE\tD1\n")
        for i, (a, b) in enumerate(zip(stats.epe, stats.d1)):
            f.write(f"{i} & {a:.3f} & {b:.3f}\n")
    if args.saveWeights:
        path = save_step_checkpoint(
            os.path.join(args.output, "weights"), session.params, stats.steps
        )
        print(f"Checkpoint saved in {path}")
    print(f"Result saved in {args.output}")
    return {
        "avg_epe": float(np.mean(stats.epe)) if stats.epe else float("nan"),
        "avg_d1": float(np.mean(stats.d1)) if stats.d1 else float("nan"),
        "fps": stats.fps,
        "resets": stats.reset_counter,
    }


def cli() -> None:
    args = build_argparser().parse_args()
    os.makedirs(args.output, exist_ok=True)
    shutil.copy(args.blockConfig, os.path.join(args.output, "config.json"))
    with open(os.path.join(args.output, "params.sh"), "w") as f:
        argv = list(sys.argv)
        argv[0] = os.path.join(os.getcwd(), argv[0])
        f.write("#!/bin/bash\npython3 " + " ".join(argv) + "\n")
    main(args)


if __name__ == "__main__":
    cli()
