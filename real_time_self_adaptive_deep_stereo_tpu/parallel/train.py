"""Sharded training / adaptation step builders.

``make_dp_train_step`` is the scale-out path for offline supervised
training (the reference's ``Train.py`` workload, single-GPU there):
params replicated, batch sharded over the ``data`` mesh axis, Adam
update on-device. The loss is a global mean so GSPMD inserts the
gradient all-reduce (psum over ICI) automatically — no hand-written
collectives (SURVEY.md §5 "distributed communication backend").

``make_spatial_adapt_step`` shards a *single frame* across chips along
image width for the online-adaptation workload; GSPMD partitions every
conv with halo exchange.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from real_time_self_adaptive_deep_stereo_tpu.losses import get_supervised_loss
from real_time_self_adaptive_deep_stereo_tpu.utils import optim

__all__ = ["make_dp_train_step", "make_spatial_adapt_step"]


def make_dp_train_step(
    model,
    mesh: Mesh,
    lr: float = 1e-4,
    loss_name: str = "mean_l1",
    max_disp: float = 192.0,
    loss_weights=None,
    axis: str = "data",
) -> Callable:
    """Jitted data-parallel supervised train step.

    step(params, opt: AdamState, batch{left,right,target}) ->
        (params', opt', loss)
    """
    loss_fn = get_supervised_loss(
        loss_name, multiScale=True, weights=loss_weights, max_disp=max_disp
    )
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(axis))

    def step(params, opt, batch):
        def compute(p):
            out = model.forward(p, batch["left"], batch["right"])
            return loss_fn(out["disparities"], batch)

        loss, grads = jax.value_and_grad(compute)(params)
        params2, opt2 = optim.adam_update(params, opt, grads, lr)
        return params2, opt2, loss

    batch_sh = {"left": bsh, "right": bsh, "target": bsh}
    return jax.jit(
        step,
        in_shardings=(repl, repl, batch_sh),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )


def make_spatial_adapt_step(
    model,
    mesh: Mesh,
    lr: float = 1e-4,
    axis: str = "data",
) -> Callable:
    """Jitted FULL-adaptation step with the frame sharded along W.

    step(params, acc, frame) -> (params', acc', loss)

    Demonstrates spatial partitioning of the conv pipeline (the
    framework's analogue of sequence parallelism); useful when a single
    camera stream should use a whole pod slice.
    """
    from real_time_self_adaptive_deep_stereo_tpu.losses import get_reprojection_loss

    loss_fn = get_reprojection_loss("mean_SSIM_l1", reduced=True)
    repl = NamedSharding(mesh, P())
    wsh = NamedSharding(mesh, P(None, None, axis))

    def step(params, acc, frame):
        def compute(p):
            out = model.forward(p, frame["left"], frame["right"])
            return loss_fn(out["disparities"], frame)

        loss, grads = jax.value_and_grad(compute)(params)
        params2, acc2 = optim.momentum_update(params, acc, grads, lr)
        return params2, acc2, loss

    frame_sh = {"left": wsh, "right": wsh, "target": wsh}
    return jax.jit(
        step,
        in_shardings=(repl, repl, frame_sh),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )
