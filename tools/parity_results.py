"""Measure the accuracy half of the north star: end-to-end EPE/bad3/D1
of OUR online-adaptation loop vs the TF1 reference's, frame by frame,
from identical weights on an identical synthetic KITTI-like sequence.

Two measurement modes:

* default (CPU): runs the reference's Stereo_Online_Adaptation loop
  (graph + MomentumOptimizer train ops + host reward/reset controller,
  imported from /root/reference — never copied) and our host session,
  NONE/MAD/FULL, and reports per-mode EPE/bad3/D1 deltas. Target
  (BASELINE.json): D1-all within 0.5%.
* --drift (TPU): runs OUR fused session twice — fp32-exact
  (gather warps + Precision.HIGHEST convs) vs the fast TPU mode
  (mxu/onehot warps + default bf16-multiply convs) — and reports the
  precision drift of the fast path.

Writes/updates PARITY_RESULTS.md. Reference protocol:
Stereo_Online_Adaptation.py:74-82 (EPE/bad3),
Stereo_Continual_Adaptation.py:244-249 (D1).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.validate_adaptation import make_sequence, pretrain  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BLOCK_CONFIG = os.path.join(REPO, "block_config", "MadNet_full.json")


def _metrics(disp, gt):
    valid = gt > 0
    err = np.abs(disp - gt)
    epe = float(err[valid].mean())
    bad3 = float((err[valid] > 3.0).mean())
    d1 = float(
        100.0
        * ((err > 3.0) & (err / np.maximum(gt, 1e-9) >= 0.05) & valid).sum()
        / max(valid.sum(), 1)
    )
    return epe, bad3, d1


def run_reference_loop(mode, seq, params_np, name_map, lr=1e-4, ssim_th=0.5):
    """The reference's online-adaptation session (SEQUENTIAL sampler so
    both frameworks train identical block sequences)."""
    from tests import _tf1_ref as ref

    tf1 = ref.load_tf1()
    tf1.reset_default_graph()
    import json

    with open(BLOCK_CONFIG) as f:
        block_config = json.load(f)
    h, w = seq[0][0].shape[:2]
    ph, full_loss, block_losses, train_ops, net = ref.build_adaptation_graph(
        tf1, "MADNet", (h, w), lr, mode, block_config, "reprojection"
    )
    gvars, assigns = ref.assign_params_ops(tf1, params_np, name_map)
    full_res = net.get_disparities()[-1]

    n_blocks = len(train_ops) if mode == "MAD" else 0
    scores = np.zeros(n_blocks)
    loss_t1 = loss_t2 = 0.0
    last_trained = []
    rows = []
    resets = 0
    with tf1.Session() as sess:
        sess.run(tf1.global_variables_initializer())
        sess.run(assigns)
        for step, (left, right, gt) in enumerate(seq):
            feed = {
                ph["left"]: left[None],
                ph["right"]: right[None],
                ph["target"]: gt[None, ..., None],
            }
            if mode == "MAD":
                k = step % n_blocks  # SEQUENTIAL sampler
                fetches = sess.run([full_loss, full_res, train_ops[k]], feed)
                new_loss, disp = fetches[0], fetches[1]
                if step == 0:
                    loss_t1 = loss_t2 = new_loss
                gain = (2 * loss_t1 - loss_t2) - new_loss
                scores *= 0.99
                for i in last_trained:
                    scores[i] += 0.01 * gain
                last_trained = [k]
                loss_t2, loss_t1 = loss_t1, new_loss
            elif mode == "FULL":
                new_loss, disp, _ = sess.run([full_loss, full_res, train_ops[0]], feed)
            else:
                new_loss, disp = sess.run([full_loss, full_res], feed)
            rows.append(_metrics(disp[0, ..., 0], gt))
            if mode != "NONE" and new_loss > ssim_th:
                sess.run(assigns)
                resets += 1
    return np.asarray(rows), resets


def run_our_loop(mode, seq, params_np, lr=1e-4, ssim_th=0.5, fast=False,
                 precision="default"):
    """Our session on the same frames. fast=False reproduces the exact
    numerics (gather warps, HIGHEST conv precision); fast=True uses the
    TPU production path (auto warps, ``precision`` conv mode — 'default'
    for bf16 multiplies / fp32 operands, 'bf16' for bf16 operands)."""
    import jax
    import jax.numpy as jnp

    from real_time_self_adaptive_deep_stereo_tpu.adapt import (
        AdaptationEngine,
        OnlineAdaptationSession,
        load_block_config,
        make_blocks,
    )
    from real_time_self_adaptive_deep_stereo_tpu.models import get_stereo_net
    from real_time_self_adaptive_deep_stereo_tpu.ops.conv import set_conv_precision

    wm = "auto" if fast else "gather"
    set_conv_precision(precision if fast else "highest")
    try:
        model = get_stereo_net(
            "MADNet", bulkhead=(mode == "MAD"), warp_mode=wm,
            corr_mode="auto" if fast else "jnp",
        )
        params = jax.tree_util.tree_map(jnp.asarray, params_np)
        blocks = make_blocks(load_block_config(BLOCK_CONFIG), model.layer_to_path)
        engine = AdaptationEngine(model, blocks, lr=lr, warp_mode=wm)
        sess = OnlineAdaptationSession(
            engine, params, mode=mode, sample_mode="SEQUENTIAL", ssim_th=ssim_th,
            seed=0,
        )
        rows = []
        for left, right, gt in seq:
            frame = {
                "left": jnp.asarray(left[None]),
                "right": jnp.asarray(right[None]),
                "target": jnp.asarray(gt[None, ..., None]),
            }
            out = sess.step(frame)
            rows.append(_metrics(np.asarray(out["disp"])[0, ..., 0], gt))
        return np.asarray(rows), sess.stats.reset_counter
    finally:
        set_conv_precision("highest")


def fmt_row(name, rows, resets):
    epe, bad3, d1 = rows.mean(axis=0)
    return f"| {name} | {epe:.3f} | {100*bad3:.2f}% | {d1:.2f}% | {resets} |"


def main_cpu(args):
    import jax

    from real_time_self_adaptive_deep_stereo_tpu.models import get_stereo_net

    print("pretraining initial weights on scene A ...", flush=True)
    params = pretrain(args.height, args.width, steps=args.pretrainSteps)
    params_np = jax.tree_util.tree_map(np.asarray, params)
    model = get_stereo_net("MADNet")
    name_map = model.tf_name_map()
    seq = make_sequence(args.height, args.width, args.frames, seed=7, d_bg=8.0, d_fg=20.0)

    lines = [
        "## End-to-end adaptation parity vs the TF1 reference (CPU, fp32)",
        "",
        f"Synthetic domain-shift sequence, {args.frames} frames @ "
        f"{args.height}x{args.width}, identical pretrained weights, "
        "SEQUENTIAL block sampling (deterministic in both frameworks), "
        "lr=1e-4, SSIMTh=0.5.",
        "",
        "| run | EPE | bad3 | D1-all | resets |",
        "|---|---|---|---|---|",
    ]
    deltas = []
    for mode in ("NONE", "MAD", "FULL"):
        print(f"reference loop, mode={mode} ...", flush=True)
        ref_rows, ref_resets = run_reference_loop(mode, seq, params_np, name_map)
        print(f"our loop, mode={mode} ...", flush=True)
        our_rows, our_resets = run_our_loop(mode, seq, params_np)
        lines.append(fmt_row(f"reference {mode}", ref_rows, ref_resets))
        lines.append(fmt_row(f"ours {mode}", our_rows, our_resets))
        d1_delta = abs(our_rows.mean(axis=0)[2] - ref_rows.mean(axis=0)[2])
        deltas.append((mode, d1_delta))
        print(f"mode={mode}: D1 delta = {d1_delta:.3f}%", flush=True)
    lines.append("")
    for mode, d in deltas:
        status = "PASS" if d < 0.5 else "FAIL"
        lines.append(f"- D1-all delta ({mode}): **{d:.3f}%** (north-star < 0.5%: {status})")
    return "\n".join(lines)


def main_drift(args):
    import jax

    print("pretraining initial weights on scene A ...", flush=True)
    params = pretrain(args.height, args.width, steps=args.pretrainSteps)
    params_np = jax.tree_util.tree_map(np.asarray, params)
    seq = make_sequence(args.height, args.width, args.frames, seed=7, d_bg=8.0, d_fg=20.0)

    lines = [
        "## Precision drift of the fast TPU mode (one chip)"
        # keep the original 96x320 section header stable; qualify others
        # so multiple resolutions coexist in PARITY_RESULTS.md
        + ("" if (args.height, args.width) == (96, 320) else f" @ {args.height}x{args.width}"),
        "",
        f"Same sequence/protocol as above, {args.frames} frames @ "
        f"{args.height}x{args.width}. exact = gather warps + fp32 "
        "HIGHEST convs/matmuls; fast = one-hot MXU matmul warps "
        "(warp_mode='auto') + the given conv/matmul precision mode — "
        "'default' is the bench.py serving mode.",
        "",
        "| run | EPE | bad3 | D1-all | resets |",
        "|---|---|---|---|---|",
    ]
    for mode in ("NONE", "MAD", "FULL"):
        exact, r1 = run_our_loop(mode, seq, params_np, fast=False)
        lines.append(fmt_row(f"exact {mode}", exact, r1))
        for prec in ("default", "bf16", "bf16_act"):
            fast, r2 = run_our_loop(mode, seq, params_np, fast=True, precision=prec)
            lines.append(fmt_row(f"fast/{prec} {mode}", fast, r2))
            d = fast.mean(axis=0) - exact.mean(axis=0)
            lines.append(
                f"| drift/{prec} {mode} | {d[0]:+.4f} | {100*d[1]:+.3f}% | {d[2]:+.3f}% | |"
            )
            print(f"mode={mode} prec={prec}: EPE drift {d[0]:+.4f}, D1 drift {d[2]:+.3f}%",
                  flush=True)
    return "\n".join(lines)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--pretrainSteps", type=int, default=200)
    ap.add_argument("--drift", action="store_true", help="TPU precision-drift mode")
    ap.add_argument("--out", default=os.path.join(REPO, "PARITY_RESULTS.md"))
    args = ap.parse_args()

    section = main_drift(args) if args.drift else main_cpu(args)
    header = "# PARITY_RESULTS — accuracy parity & precision drift\n"
    existing = ""
    if os.path.exists(args.out):
        existing = open(args.out).read()
    if not existing.startswith("# PARITY_RESULTS"):
        existing = header + "\n"
    marker = section.splitlines()[0]
    if marker in existing:  # replace the section
        head = existing.split(marker)[0]
        existing = head
    with open(args.out, "w") as f:
        f.write(existing.rstrip("\n") + "\n\n" + section + "\n")
    print(f"wrote {args.out}")
