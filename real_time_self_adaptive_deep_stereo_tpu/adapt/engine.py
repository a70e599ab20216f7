"""Online-adaptation engine: jitted per-frame step functions.

The reference drives adaptation by building N TF train ops (one per MAD
block, Stereo_Online_Adaptation.py:85-118) plus metric ops, and running
one ``sess.run`` per video frame. The TPU-native equivalent here is a
family of jitted step functions:

* ``infer``        — forward + metrics only (mode NONE)
* ``adapt_full``   — forward + full backward + optimizer update (FULL)
* ``adapt_block(k)`` — forward + backward *of block k's param subtree
  only* + subtree optimizer update (MAD)

Each is a single XLA program: forward, (partial) backward, update,
full-resolution loss and EPE/bad3 metrics all fused on-device; exactly
one scalar sync per frame is needed on the host (the adaptation loss
that feeds the reward update / reset check — mirroring the reference's
single sess.run round-trip, SURVEY.md §3.1).

MAD gradients are computed with ``jax.grad`` w.r.t. the *extracted
block subtree* — parameters outside the block get no gradient work at
all, which is what makes MAD cheaper than FULL (the reference gets this
from ``var_list=`` + bulkhead stop-gradients; we additionally keep the
bulkhead stop-gradients inside the model so backward is truncated at
scale boundaries).

Per-block step functions are compiled lazily on first use and cached.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from real_time_self_adaptive_deep_stereo_tpu.adapt.blocks import Block
from real_time_self_adaptive_deep_stereo_tpu.losses import (
    get_proxy_loss,
    get_reprojection_loss,
)
from real_time_self_adaptive_deep_stereo_tpu.ops.resize import resize_bilinear, resize_to
from real_time_self_adaptive_deep_stereo_tpu.utils import optim

__all__ = ["AdaptationEngine", "PIXEL_TH"]

PIXEL_TH = 3.0  # bad-pixel threshold (Stereo_Online_Adaptation.py:20)


def _squeeze_c1(x: jnp.ndarray) -> jnp.ndarray:
    """Drop a trailing singleton channel: metric math on [B,H,W] keeps W
    in the TPU lane dim (a [B,H,W,1] layout wastes 127/128 lanes)."""
    return x[..., 0] if x.ndim == 4 and x.shape[-1] == 1 else x


def disparity_metrics(full_disp: jnp.ndarray, gt: jnp.ndarray):
    """EPE and bad3 with the reference masks (Stereo_Online_Adaptation.py:74-82):
    valid where gt != 0; bad3 = fraction of valid pixels with error > 3."""
    full_disp, gt = _squeeze_c1(full_disp), _squeeze_c1(gt)
    valid = jnp.where(gt == 0, 0.0, 1.0)
    err = jnp.abs(full_disp - gt) * valid
    denom = jnp.sum(valid)
    epe = jnp.sum(err) / denom
    bad3 = jnp.sum(jnp.where(err > PIXEL_TH, 1.0, 0.0)) / denom
    return epe, bad3


def d1_metric(full_disp: jnp.ndarray, gt: jnp.ndarray):
    """KITTI D1: % of valid pixels with error > 3px AND > 5% of gt
    (Stereo_Continual_Adaptation.py:244-249)."""
    full_disp, gt = _squeeze_c1(full_disp), _squeeze_c1(gt)
    valid = gt > 0
    err = jnp.abs(full_disp - gt)
    out = valid & (err > 3.0) & (err / jnp.maximum(gt, 1e-9) >= 0.05)
    d1 = 100.0 * jnp.sum(out) / jnp.maximum(jnp.sum(valid), 1)
    epe = jnp.sum(jnp.where(valid, err, 0.0)) / jnp.maximum(jnp.sum(valid), 1)
    return epe, d1


def _scale_tensor(t: jnp.ndarray, scale: int) -> jnp.ndarray:
    """rescale_image(t, shape//scale) (Stereo_Online_Adaptation.py:22-23)."""
    if scale == 1:
        return t
    return resize_bilinear(t, t.shape[1] // scale, t.shape[2] // scale)


class AdaptationEngine:
    """Builds and caches the jitted per-frame step functions.

    Args:
      model: a model object with ``forward(params, left, right)``.
      blocks: MAD Blocks (None unless mode needs them).
      lr: learning rate.
      optimizer: 'momentum' (reference online default) or 'adam' (demo).
      adaptation: 'reprojection' (CVPR photometric) or 'proxy' (TPAMI).
      reprojection_scale: compute block losses at 1/scale resolution
        (--reprojectionScale, Stereo_Online_Adaptation.py:91-95,305).
    """

    def __init__(
        self,
        model,
        blocks: Optional[Sequence[Block]] = None,
        lr: float = 1e-4,
        optimizer: str = "momentum",
        adaptation: str = "reprojection",
        reprojection_scale: int = 1,
        momentum: float = 0.9,
        warp_mode: str = "auto",
    ):
        self.model = model
        self.blocks = list(blocks) if blocks else []
        self.lr = lr
        self.optimizer = optimizer
        self.adaptation = adaptation
        self.reprojection_scale = int(reprojection_scale)
        self.momentum = momentum
        self.warp_mode = warp_mode

        if adaptation == "reprojection":
            self._full_loss_fn = get_reprojection_loss(
                "mean_SSIM_l1", reduced=True, warp_mode=warp_mode
            )
            self._block_base_loss = get_reprojection_loss(
                "mean_SSIM_l1", reduced=True, warp_mode=warp_mode
            )
        elif adaptation == "proxy":
            # full loss weights 0.01, block loss weights 0.1
            # (Stereo_Continual_Adaptation.py:75,112)
            self._full_loss_fn = get_proxy_loss(
                "mean_l1", max_disp=192, weights=[0.01] * 10, reduced=True
            )
            self._block_base_loss = get_proxy_loss(
                "mean_l1", max_disp=192, weights=[0.1] * 10, reduced=True
            )
        else:
            raise ValueError(f"unknown adaptation kind {adaptation!r}")

        self._infer_fn = None
        self._full_fn = None
        self._block_fns: Dict[int, Callable] = {}
        self._multi_fns: Dict[tuple, Callable] = {}

    # ------------------------------------------------------------- opt state
    def init_opt(self, params) -> Dict:
        if self.optimizer == "momentum":
            return {"acc": optim.momentum_init(params)}
        if self.optimizer == "adam":
            # ONE scalar step count shared by every block: the reference
            # demo builds all per-block train ops from a single
            # tf.train.AdamOptimizer (Demo/demo_model.py:163-170), whose
            # beta1_power/beta2_power bias-correction variables are
            # per-OPTIMIZER and advance once per executed train op — so
            # the correction follows the global number of adaptation
            # steps, not per-block counts.
            return {
                "m": optim.momentum_init(params),
                "v": optim.momentum_init(params),
                "t": jnp.zeros((), jnp.int32),
            }
        raise ValueError(self.optimizer)

    def _apply_update(self, bp, opt_sub, grads, block_index: int):
        """Update an extracted subtree; returns (new_bp, new_opt_sub)."""
        if self.optimizer == "momentum":
            new_bp, new_acc = optim.momentum_update(
                bp, opt_sub["acc"], grads, self.lr, self.momentum
            )
            return new_bp, {"acc": new_acc}
        # adam with the optimizer-global step count (see init_opt); m/v
        # slots are per-variable, so the extracted block's slices are the
        # only ones touched — exactly tf.train.AdamOptimizer's behaviour
        # when minimize(var_list=block) runs
        t = opt_sub["t"] + 1
        m = jax.tree_util.tree_map(
            lambda m_, g: 0.9 * m_ + 0.1 * g, opt_sub["m"], grads
        )
        v = jax.tree_util.tree_map(
            lambda v_, g: 0.999 * v_ + 0.001 * g * g, opt_sub["v"], grads
        )
        tf_ = t.astype(jnp.float32)
        lr_t = self.lr * jnp.sqrt(1.0 - 0.999**tf_) / (1.0 - 0.9**tf_)
        new_bp = jax.tree_util.tree_map(
            lambda p, m_, v_: p - lr_t * m_ / (jnp.sqrt(v_) + 1e-8), bp, m, v
        )
        return new_bp, {"m": m, "v": v, "t": t}

    # ---------------------------------------------------------------- losses
    def _full_loss(self, disparities: List[jnp.ndarray], frame: Dict) -> jnp.ndarray:
        return self._full_loss_fn(disparities, frame)

    def block_loss_inputs(self, frame: Dict):
        """Scaled loss inputs + per-prediction prep for MAD block losses
        (the --reprojectionScale protocol, Stereo_Online_Adaptation.py
        :91-107). The SINGLE definition shared by :meth:`_block_loss`
        (switch-path branches) and the fused shared-forward step, so the
        two MAD implementations cannot de-synchronize."""
        s = self.reprojection_scale
        left = _scale_tensor(frame["left"], s)
        inputs = {
            "left": left,
            "right": _scale_tensor(frame["right"], s),
        }
        if "target" in frame:  # absent in GT-free production serving
            inputs["target"] = _scale_tensor(frame["target"], s) / s
        if "proxy" in frame:
            inputs["proxy"] = _scale_tensor(frame["proxy"], s) / s

        def prep(p):
            multiplier = float(frame["left"].shape[1] // p.shape[1])
            return resize_to(p, left) * multiplier

        return inputs, prep

    def _block_loss(self, disparities, k: int, frame: Dict) -> jnp.ndarray:
        """Loss for MAD block k: its scale's prediction, rescaled to the
        (optionally downscaled) inputs (Stereo_Online_Adaptation.py:91-107)."""
        inputs, prep = self.block_loss_inputs(frame)
        return self._block_base_loss([prep(disparities[k])], inputs)

    def _outputs(self, out: Dict, frame: Dict, loss: jnp.ndarray) -> Dict:
        epe, bad3 = disparity_metrics(out["full_res_disp"], frame["target"])
        epe_d1, d1 = d1_metric(out["full_res_disp"], frame["target"])
        return {
            "disp": out["full_res_disp"],
            "loss": loss,
            "epe": epe,
            "bad3": bad3,
            "d1": d1,
        }

    # ------------------------------------------------------------- step fns
    @property
    def infer(self):
        if self._infer_fn is None:

            def _infer(params, frame):
                out = self.model.forward(params, frame["left"], frame["right"])
                loss = self._full_loss(out["disparities"], frame)
                return self._outputs(out, frame, loss)

            self._infer_fn = jax.jit(_infer)
        return self._infer_fn

    @property
    def adapt_full(self):
        if self._full_fn is None:

            def _step(params, opt, frame):
                def loss_fn(p):
                    out = self.model.forward(p, frame["left"], frame["right"])
                    return self._full_loss(out["disparities"], frame), out

                (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
                new_params, new_opt = self._apply_update(params, opt, grads, 0)
                return new_params, new_opt, self._outputs(out, frame, loss)

            self._full_fn = jax.jit(_step, donate_argnums=(0, 1))
        return self._full_fn

    def adapt_block(self, k: int):
        """Jitted step training only block k (lazily compiled)."""
        if k not in self._block_fns:
            block = self.blocks[k]

            def _step(params, opt, frame):
                bp = block.extract(params)

                def loss_fn(bp_):
                    p = block.merge(params, bp_)
                    out = self.model.forward(p, frame["left"], frame["right"])
                    return self._block_loss(out["disparities"], k, frame), out

                (block_loss, out), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(bp)
                opt_sub = self._extract_opt(opt, block)
                new_bp, new_opt_sub = self._apply_update(bp, opt_sub, grads, k)
                new_params = block.merge(params, new_bp)
                new_opt = self._merge_opt(opt, new_opt_sub, block)
                loss = self._full_loss(out["disparities"], frame)
                res = self._outputs(out, frame, loss)
                res["block_loss"] = block_loss
                return new_params, new_opt, res

            self._block_fns[k] = jax.jit(_step, donate_argnums=(0, 1))
        return self._block_fns[k]

    def adapt_blocks(self, ks: Sequence[int]):
        """Jitted one-shot step training several blocks TOGETHER.

        Reference semantics for ``--numBlocks > 1``: all selected
        per-block train ops run in a SINGLE ``sess.run``
        (Stereo_Online_Adaptation.py:185,201-208), so every block's
        gradient is evaluated at the same pre-step parameters and the
        disjoint updates land together. Applying the blocks
        sequentially (block j's gradient seeing block i's update) is a
        silent semantic divergence — this step computes all gradients
        first, then merges all updates.

        Duplicate ids collapse (TF dedupes identical fetches in one
        run). Cached per sorted id set; order cannot matter because the
        losses are independent and the updates disjoint.
        """
        key = tuple(sorted(dict.fromkeys(int(k) for k in ks)))
        if key not in self._multi_fns:
            sel = [(k, self.blocks[k]) for k in key]

            def _step(params, opt, frame):
                grads_list, block_losses, out0 = [], [], None
                for k, block in sel:
                    bp = block.extract(params)

                    def loss_fn(bp_, block=block, k=k):
                        p = block.merge(params, bp_)
                        out = self.model.forward(p, frame["left"], frame["right"])
                        return self._block_loss(out["disparities"], k, frame), out

                    (bl, out), g = jax.value_and_grad(loss_fn, has_aux=True)(bp)
                    out0 = out0 if out0 is not None else out
                    block_losses.append(bl)
                    grads_list.append(g)

                # apply phase: blocks are disjoint, so extracting from the
                # accumulated trees still reads pre-step values for this
                # block's leaves. Every update reads the PRE-step Adam
                # step count (all applies see the same beta powers within
                # one run); the count then advances once per executed op.
                new_params, new_opt = params, opt
                for (k, block), g in zip(sel, grads_list):
                    bp = block.extract(new_params)
                    opt_sub = self._extract_opt(new_opt, block)
                    if "t" in opt_sub:
                        opt_sub["t"] = opt["t"]
                    new_bp, new_opt_sub = self._apply_update(bp, opt_sub, g, k)
                    new_params = block.merge(new_params, new_bp)
                    new_opt = self._merge_opt(new_opt, new_opt_sub, block)
                if "t" in new_opt:
                    new_opt["t"] = opt["t"] + len(sel)

                # fetched loss/metrics come from the shared pre-step
                # forward, like the reference's one round-trip
                loss = self._full_loss(out0["disparities"], frame)
                res = self._outputs(out0, frame, loss)
                res["block_loss"] = jnp.stack(block_losses)
                return new_params, new_opt, res

            self._multi_fns[key] = jax.jit(_step, donate_argnums=(0, 1))
        return self._multi_fns[key]

    def _extract_opt(self, opt: Dict, block: Block) -> Dict:
        sub = {}
        for key, tree in opt.items():
            sub[key] = tree if key == "t" else block.extract(tree)
        return sub

    def _merge_opt(self, opt: Dict, new_sub: Dict, block: Block) -> Dict:
        out = {}
        for key, tree in opt.items():
            out[key] = new_sub[key] if key == "t" else block.merge(tree, new_sub[key])
        return out
