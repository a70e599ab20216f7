"""Golden parity of the *adaptation step* vs the TF1 reference.

The forward parity tests prove the graphs agree; these prove the
product agrees: gradients through warp/correlation/resize and the
MomentumOptimizer(lr, 0.9) update produce the same adapted weights and
loss trajectories as the reference's per-block / FULL train ops
(Stereo_Online_Adaptation.py:85-118, Stereo_Continual_Adaptation.py:89-128).

Each test runs N steps of the reference session and N steps of our
jitted engine from identical initial weights on identical frames, and
asserts per-step losses and final parameter *deltas* agree.

NOTE: the filename must sort AFTER test_ops.py — loading the reference
applies global TF1 shims (disable_v2_tensorshape) that break the TF2
oracles used by earlier test modules in the same process.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests import _tf1_ref as ref

pytestmark = pytest.mark.skipif(
    not ref.reference_available(), reason="reference checkout not present"
)

H, W = 96, 160
LR = 1e-4
N_STEPS = 5
BLOCK_SEQ = [0, 3, 1, 4, 2]  # one step on each MAD block


def _make_frames(n, with_proxy=False):
    """Deterministic stereo-like frames: right is a horizontally shifted
    left, so reprojection gradients are non-trivial."""
    rng = np.random.default_rng(7)
    frames = []
    for i in range(n):
        base = (rng.random((1, H, W, 3)) * 255).astype(np.float32)
        shift = 3 + (i % 3)
        right = np.roll(base, -shift, axis=2)
        gt = np.full((1, H, W, 1), float(shift), np.float32)
        gt[:, : H // 8] = 0.0  # some invalid pixels
        f = {"left": base, "right": right, "target": gt}
        if with_proxy:
            proxy = gt + rng.normal(0, 0.25, gt.shape).astype(np.float32)
            f["proxy"] = np.clip(proxy, 1.0, 191.0)
        frames.append(f)
    return frames


def _run_reference(mode, adaptation, frames, block_seq, params, name_map):
    tf1 = ref.load_tf1()
    tf1.reset_default_graph()
    import json

    block_config = None
    if mode == "MAD":
        with open("block_config/MadNet_full.json") as f:
            block_config = json.load(f)

    ph, full_loss, block_losses, train_ops, net = ref.build_adaptation_graph(
        tf1, "MADNet", (H, W), LR, mode, block_config, adaptation
    )
    gvars, assigns = ref.assign_params_ops(tf1, params, name_map)

    losses, block_loss_vals = [], []
    step1_vars = None
    with tf1.Session() as sess:
        sess.run(tf1.global_variables_initializer())
        sess.run(assigns)
        for i, frame in enumerate(frames):
            feed = {ph[k]: frame[k] for k in ph}
            if mode == "MAD":
                k = block_seq[i]
                fl, bl, _ = sess.run(
                    [full_loss, block_losses[k], train_ops[k]], feed_dict=feed
                )
                block_loss_vals.append(bl)
            else:
                fl, _ = sess.run([full_loss, train_ops[0]], feed_dict=feed)
            losses.append(fl)
            if i == 0:
                step1_vars = dict(
                    zip([v.name[:-2] for v in gvars], sess.run(gvars))
                )
        final_vars = dict(zip([v.name[:-2] for v in gvars], sess.run(gvars)))
    return np.asarray(losses), np.asarray(block_loss_vals), final_vars, step1_vars


def _run_ours(mode, adaptation, frames, block_seq, params):
    from real_time_self_adaptive_deep_stereo_tpu.adapt import (
        AdaptationEngine,
        load_block_config,
        make_blocks,
    )
    from real_time_self_adaptive_deep_stereo_tpu.models import get_stereo_net

    model = get_stereo_net(
        "MADNet", bulkhead=(mode == "MAD"), corr_mode="jnp", warp_mode="gather"
    )
    blocks = make_blocks(
        load_block_config("block_config/MadNet_full.json"), model.layer_to_path
    )
    engine = AdaptationEngine(
        model, blocks, lr=LR, optimizer="momentum", adaptation=adaptation,
        warp_mode="gather",
    )
    p = jax.tree_util.tree_map(jnp.asarray, params)
    opt = engine.init_opt(p)
    losses, block_loss_vals = [], []
    p_step1 = None
    for i, frame in enumerate(frames):
        jf = {k: jnp.asarray(v) for k, v in frame.items()}
        if mode == "MAD":
            k = block_seq[i]
            p, opt, res = engine.adapt_block(k)(p, opt, jf)
            block_loss_vals.append(float(res["block_loss"]))
        else:
            p, opt, res = engine.adapt_full(p, opt, jf)
        losses.append(float(res["loss"]))
        if i == 0:
            p_step1 = jax.tree_util.tree_map(np.asarray, p)
    return np.asarray(losses), np.asarray(block_loss_vals), p, p_step1


def _assert_param_deltas_match(final_tf, params0, params_ours, name_map, tol):
    """Compare per-variable weight *deltas* (final - initial): the actual
    product of adaptation. Variables outside the trained blocks must be
    bit-identical (delta exactly 0 in both frameworks)."""
    checked = 0
    for tf_name, path in name_map.items():
        p0 = np.asarray(ref.get_leaf(params0, path))
        ours = np.asarray(ref.get_leaf(params_ours, path))
        theirs = final_tf[tf_name]
        d_ours = ours - p0
        d_tf = theirs - p0
        scale = np.abs(d_tf).max()
        if scale == 0.0:
            assert np.abs(d_ours).max() == 0.0, f"{tf_name}: ours moved, tf did not"
        else:
            # absolute floor 1e-8: deltas are O(lr * grad) and fp32
            # noise between frameworks sits at ~1e-9 per element
            np.testing.assert_allclose(
                d_ours, d_tf, rtol=0, atol=tol * scale + 1e-8,
                err_msg=f"weight delta mismatch for {tf_name}",
            )
        checked += 1
    assert checked > 40


def _run_parity(mode, adaptation):
    from real_time_self_adaptive_deep_stereo_tpu.models import get_stereo_net

    model = get_stereo_net("MADNet", bulkhead=(mode == "MAD"), corr_mode="jnp")
    params = model.init(jax.random.PRNGKey(0))
    params_np = jax.tree_util.tree_map(np.asarray, params)
    name_map = model.tf_name_map()

    frames = _make_frames(N_STEPS, with_proxy=(adaptation == "proxy"))
    tf_losses, tf_block_losses, tf_final, tf_step1 = _run_reference(
        mode, adaptation, frames, BLOCK_SEQ, params_np, name_map
    )
    our_losses, our_block_losses, our_params, our_step1 = _run_ours(
        mode, adaptation, frames, BLOCK_SEQ, params_np
    )

    # Steps 0-1 prove the gradient + momentum update are exact: step 0
    # is the shared forward, step 1 evaluates the weights produced by
    # our first update vs TF's. Later steps are chaos-bounded: at fp32 a
    # 1e-7 relative param perturbation alone drives the FULL trajectory
    # apart by up to ~3e-3 by step 3 (relu(-20 V) kinks amplify), so
    # framework-level summation-order noise cannot stay at 1e-4.
    np.testing.assert_allclose(
        our_losses[:2], tf_losses[:2], rtol=2e-4, atol=1e-6,
        err_msg="first-step loss/update diverged (gradient bug)",
    )
    np.testing.assert_allclose(
        our_losses, tf_losses, rtol=2e-2, atol=1e-5,
        err_msg="full loss trajectory diverged beyond the chaos bound",
    )
    if mode == "MAD":
        np.testing.assert_allclose(
            our_block_losses[:2], tf_block_losses[:2], rtol=2e-4, atol=1e-6,
            err_msg="first-step block loss diverged (gradient bug)",
        )
        np.testing.assert_allclose(
            our_block_losses, tf_block_losses, rtol=2e-2, atol=1e-5,
            err_msg="block loss trajectory diverged beyond the chaos bound",
        )
    # Step-1 weight deltas: the exact gradient + momentum update through
    # the whole graph, before chaos can compound (tight for both modes).
    _assert_param_deltas_match(tf_step1, params_np, our_step1, name_map, tol=5e-3)
    if mode == "MAD":
        # 5-step deltas stay comparable for MAD (bulkhead-isolated
        # per-block updates); for FULL they are chaos-decorrelated at
        # fp32 — a 1e-7 initial perturbation fully decorrelates our own
        # loop's conv1 delta by step 5 — so only step-1 is asserted.
        _assert_param_deltas_match(
            tf_final, params_np, our_params, name_map, tol=5e-3
        )


def test_mad_adaptation_step_matches_reference():
    """5 MAD steps, one per block, reprojection loss (CVPR pipeline)."""
    _run_parity("MAD", "reprojection")


def test_full_adaptation_step_matches_reference():
    """5 FULL steps, reprojection loss."""
    _run_parity("FULL", "reprojection")


def test_mad_proxy_adaptation_step_matches_reference():
    """5 MAD steps against proxy labels (TPAMI continual pipeline)."""
    _run_parity("MAD", "proxy")
