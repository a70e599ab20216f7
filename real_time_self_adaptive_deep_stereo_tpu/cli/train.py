"""Offline supervised training CLI — counterpart of reference
``Train.py``: multi-scale supervised loss (max_disp 192), Adam,
checkpoints every 10k steps (keep 2), resume-from-logdir, optional
validation set with EPE/bad3.

TPU-first: one jitted train step; with >1 device the batch is sharded
over a ``data`` mesh axis and XLA all-reduces the gradients over ICI
(``--dataParallel``) — capability the reference lacks entirely.
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys
import time

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    from real_time_self_adaptive_deep_stereo_tpu.losses import SUPERVISED_LOSS
    from real_time_self_adaptive_deep_stereo_tpu.models import STEREO_FACTORY

    p = argparse.ArgumentParser(description="Offline training of a deep stereo network (TPU)")
    p.add_argument("--trainingSet", required=True)
    p.add_argument("--validationSet", default=None)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--weights", default=None, help="optional initial weights")
    p.add_argument("--modelName", default="MADNet", choices=list(STEREO_FACTORY))
    p.add_argument("--lr", type=float, default=0.0001)
    p.add_argument("--imageShape", type=int, nargs="+", default=[320, 1216])
    p.add_argument("--batchSize", type=int, default=4)
    p.add_argument("--numEpochs", type=int, default=50)
    p.add_argument("--augment", action="store_true")
    p.add_argument("--lossWeights", type=float, nargs="+", default=None)
    p.add_argument("--lossType", default="mean_l1", choices=list(SUPERVISED_LOSS))
    p.add_argument(
        "--decayStep",
        type=int,
        default=500000,
        help="reference-compat NO-OP: the reference computes a decayed lr "
        "from this but feeds Adam the raw --lr anyway (Train.py:94-95); "
        "kept so reference command lines parse, warns when set",
    )
    p.add_argument("--ckptEvery", type=int, default=10000)
    p.add_argument("--dataParallel", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--corrMode", default="auto", choices=["auto", "jnp", "pallas"])
    p.add_argument("--maxSteps", type=int, default=None, help="early stop (for smoke runs)")
    return p


MAX_DISP = 192  # supervised clip (reference static param, Train.py:20)


def main(args) -> dict:
    import jax

    from real_time_self_adaptive_deep_stereo_tpu.utils.compile_cache import enable

    enable()  # persistent XLA cache: CLIs must not cold-compile per process
    import jax.numpy as jnp

    if getattr(args, "decayStep", 500000) != 500000:
        print(
            "WARNING: --decayStep has no effect — matching the reference, "
            "which computes the decayed lr but passes the raw --lr to Adam "
            "(Train.py:94-95)."
        )

    from real_time_self_adaptive_deep_stereo_tpu.adapt.engine import disparity_metrics
    from real_time_self_adaptive_deep_stereo_tpu.data import (
        StereoDataset,
        prefetch_to_device,
    )
    from real_time_self_adaptive_deep_stereo_tpu.losses import get_supervised_loss
    from real_time_self_adaptive_deep_stereo_tpu.models import get_stereo_net
    from real_time_self_adaptive_deep_stereo_tpu.utils import optim
    from real_time_self_adaptive_deep_stereo_tpu.utils.checkpoint import (
        restore_or_init,
        save_step_checkpoint,
    )

    os.makedirs(args.output, exist_ok=True)

    train_set = StereoDataset(
        args.trainingSet,
        batch_size=args.batchSize,
        crop_shape=args.imageShape,
        num_epochs=args.numEpochs,
        augment=args.augment,
        is_training=True,
        shuffle=True,
        seed=args.seed,
    )
    val_set = (
        StereoDataset(
            args.validationSet,
            batch_size=args.batchSize,
            crop_shape=args.imageShape,
            num_epochs=None,
            augment=False,
            is_training=False,
            shuffle=True,
            seed=args.seed,
        )
        if args.validationSet
        else None
    )

    model = get_stereo_net(args.modelName, corr_mode=args.corrMode)
    params = model.init(jax.random.PRNGKey(args.seed))
    params, restored, start_step = restore_or_init(
        args.output, params, args.weights, model
    )
    print(f"Restored?: {restored} from step {start_step}")

    loss_fn = get_supervised_loss(
        args.lossType, multiScale=True, weights=args.lossWeights, max_disp=MAX_DISP
    )

    if args.dataParallel and len(jax.devices()) > 1:
        from real_time_self_adaptive_deep_stereo_tpu.parallel import (
            make_dp_train_step,
            make_mesh,
        )

        mesh = make_mesh()
        train_step = make_dp_train_step(
            model,
            mesh,
            lr=args.lr,
            loss_name=args.lossType,
            max_disp=MAX_DISP,
            loss_weights=args.lossWeights,
        )
        print(f"Data-parallel over {mesh.devices.size} devices")
    else:

        def _step(p, opt, batch):
            def compute(p_):
                out = model.forward(p_, batch["left"], batch["right"])
                return loss_fn(out["disparities"], batch)

            loss, grads = jax.value_and_grad(compute)(p)
            p2, opt2 = optim.adam_update(p, opt, grads, args.lr)
            return p2, opt2, loss

        train_step = jax.jit(_step, donate_argnums=(0, 1))

    @jax.jit
    def val_step(p, batch):
        out = model.forward(p, batch["left"], batch["right"])
        return disparity_metrics(out["full_res_disp"], batch["target"])

    opt = optim.adam_init(params)
    max_steps = train_set.get_max_steps()
    step = start_step
    start = time.perf_counter()
    exec_time = 0.0
    last_loss = float("nan")
    val_iter = iter(prefetch_to_device(iter(val_set), 1)) if val_set else None

    for batch in prefetch_to_device(iter(train_set), size=2):
        params, opt, loss = train_step(params, opt, batch)
        if step % 100 == 0:
            last_loss = float(loss)
            dt = time.perf_counter() - start
            exec_time += dt
            eta = datetime.timedelta(seconds=int((max_steps - step) * dt / 100))
            msg = f"Step:{step:6d}\tLoss:{last_loss:.3f}\tf/b time:{dt / 100:.3f}\tMissing time:{eta}"
            if val_iter is not None:
                try:
                    vb = next(val_iter)
                    epe, bad3 = val_step(params, vb)
                    msg += f"\tval EPE:{float(epe):.2f} bad3:{float(bad3):.3f}"
                except StopIteration:
                    val_iter = None
            print(msg)
            start = time.perf_counter()
        if step % args.ckptEvery == 0 and step > start_step:
            save_step_checkpoint(args.output, params, step)
        step += 1
        if args.maxSteps is not None and step - start_step >= args.maxSteps:
            break

    save_step_checkpoint(args.output, params, step)
    print("All Done")
    return {"final_loss": last_loss, "steps": step}


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
