"""Golden parity tests: run the upstream TF1 graphs (imported from
/root/reference, never copied) with OUR parameter values and compare
against our JAX forward passes. Skipped when the reference checkout or
tensorflow is unavailable.

These pin down the subtle conventions: -20x disparity scaling, legacy
bilinear resize, REFLECT padding, SAME conv padding, warping semantics,
and the TF variable-name map used by the checkpoint converter.
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


def _run_parity(model_name, jax_model, tol):
    tf1 = ref.load_tf1()
    tf1.reset_default_graph()
    left_ph = tf1.placeholder(tf1.float32, [1, H, W, 3])
    right_ph = tf1.placeholder(tf1.float32, [1, H, W, 3])
    snet = ref.build_reference_net(tf1, model_name, left_ph, right_ph)
    preds = snet.get_disparities()

    params = jax_model.init(jax.random.PRNGKey(0))
    name_map = jax_model.tf_name_map()
    gvars = tf1.get_collection(tf1.GraphKeys.GLOBAL_VARIABLES)
    missing = [v.name for v in gvars if v.name[:-2] not in name_map]
    assert not missing, f"tf vars not covered by tf_name_map: {missing}"
    assigns = [
        tf1.assign(v, np.asarray(ref.get_leaf(params, name_map[v.name[:-2]])))
        for v in gvars
    ]

    rng = np.random.default_rng(3)
    l = (rng.random((1, H, W, 3)) * 255).astype(np.float32)
    r = (rng.random((1, H, W, 3)) * 255).astype(np.float32)
    with tf1.Session() as sess:
        sess.run(tf1.global_variables_initializer())
        sess.run(assigns)
        tf_out = sess.run(preds, feed_dict={left_ph: l, right_ph: r})

    ours = jax.jit(jax_model.forward)(params, jnp.asarray(l), jnp.asarray(r))[
        "disparities"
    ]
    assert len(tf_out) == len(ours)
    for i, (a, b) in enumerate(zip(tf_out, ours)):
        b = np.asarray(b)
        assert a.shape == b.shape
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(
            a, b, atol=tol * scale, rtol=0, err_msg=f"disparity {i} mismatch"
        )


def test_madnet_forward_matches_reference():
    from real_time_self_adaptive_deep_stereo_tpu.models import get_stereo_net

    _run_parity("MADNet", get_stereo_net("MADNet", corr_mode="jnp"), tol=2e-4)


def test_dispnet_forward_matches_reference():
    from real_time_self_adaptive_deep_stereo_tpu.models import get_stereo_net

    _run_parity("Dispnet", get_stereo_net("Dispnet", corr_mode="jnp"), tol=2e-4)


@pytest.mark.parametrize("model_name", ["MADNet", "Dispnet"])
def test_tf1_converter_closure_on_reference_checkpoint(model_name, tmp_path):
    """Converter closure WITHOUT the synthetic-name circularity: the
    checkpoint is written by tf1.train.Saver from the *reference-built*
    graph (its own variable scopes and TF-side Xavier init values — we
    construct none of the names), imported via tf1_checkpoint_to_params,
    and the imported weights must reproduce the reference forward. This
    is the exact pipeline a user of the published Google-Drive
    checkpoints exercises (README.MD:46-47, weights_utils.py:4-38),
    minus only the download."""
    from real_time_self_adaptive_deep_stereo_tpu.models import get_stereo_net
    from real_time_self_adaptive_deep_stereo_tpu.utils.checkpoint import (
        tf1_checkpoint_to_params,
    )

    tf1 = ref.load_tf1()
    tf1.reset_default_graph()
    left_ph = tf1.placeholder(tf1.float32, [1, H, W, 3])
    right_ph = tf1.placeholder(tf1.float32, [1, H, W, 3])
    snet = ref.build_reference_net(tf1, model_name, left_ph, right_ph)
    preds = snet.get_disparities()

    rng = np.random.default_rng(11)
    l = (rng.random((1, H, W, 3)) * 255).astype(np.float32)
    r = (rng.random((1, H, W, 3)) * 255).astype(np.float32)
    saver = tf1.train.Saver()
    with tf1.Session() as sess:
        sess.run(tf1.global_variables_initializer())  # TF's own init values
        tf_out = sess.run(preds, feed_dict={left_ph: l, right_ph: r})
        ckpt = saver.save(sess, str(tmp_path / "ref_model.ckpt"))

    jax_model = get_stereo_net(model_name, corr_mode="jnp")
    base = jax_model.init(jax.random.PRNGKey(0))
    imported, n = tf1_checkpoint_to_params(ckpt, jax_model, base)
    assert n == len(jax_model.tf_name_map()), "importer missed variables"

    ours = jax.jit(jax_model.forward)(
        imported, jnp.asarray(l), jnp.asarray(r)
    )["disparities"]
    assert len(tf_out) == len(ours)
    for i, (a, b) in enumerate(zip(tf_out, ours)):
        b = np.asarray(b)
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(
            a, b, atol=2e-4 * scale, rtol=0,
            err_msg=f"disparity {i} mismatch with imported reference weights",
        )


def test_correlation_matches_reference_tf():
    tf1 = ref.load_tf1()
    tf1.reset_default_graph()
    import Nets.sharedLayers as sl

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 8, 24, 16)).astype(np.float32)
    y = rng.normal(size=(1, 8, 24, 16)).astype(np.float32)
    xc = tf1.constant(x)
    yc = tf1.constant(y)
    out = sl.correlation_tf(xc, yc, max_disp=2)
    with tf1.Session() as sess:
        want = sess.run(out)

    from real_time_self_adaptive_deep_stereo_tpu.ops import correlation_jnp

    got = np.asarray(correlation_jnp(jnp.asarray(x), jnp.asarray(y), 2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_reprojection_loss_matches_reference():
    tf1 = ref.load_tf1()
    tf1.reset_default_graph()
    from Losses import loss_factory as ref_lf

    rng = np.random.default_rng(2)
    l = (rng.random((1, 32, 48, 3)) * 255).astype(np.float32)
    r = (rng.random((1, 32, 48, 3)) * 255).astype(np.float32)
    d = (rng.random((1, 32, 48, 1)) * 10).astype(np.float32)

    inputs = {"left": tf1.constant(l), "right": tf1.constant(r), "target": tf1.constant(d)}
    loss_op = ref_lf.get_reprojection_loss("mean_SSIM_l1", reduced=True)(
        [tf1.constant(d)], inputs
    )
    with tf1.Session() as sess:
        want = sess.run(loss_op)

    from real_time_self_adaptive_deep_stereo_tpu.losses import get_reprojection_loss

    got = get_reprojection_loss("mean_SSIM_l1", reduced=True)(
        [jnp.asarray(d)], {"left": jnp.asarray(l), "right": jnp.asarray(r)}
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-5, atol=1e-6)


def test_supervised_loss_matches_reference():
    tf1 = ref.load_tf1()
    tf1.reset_default_graph()
    from Losses import loss_factory as ref_lf

    rng = np.random.default_rng(4)
    gt = (rng.random((1, 32, 48, 1)) * 250).astype(np.float32)
    gt[0, :5] = 0.0
    pred = (rng.random((1, 32, 48, 1)) * 200).astype(np.float32)
    l = (rng.random((1, 32, 48, 3)) * 255).astype(np.float32)

    inputs = {"left": tf1.constant(l), "right": tf1.constant(l), "target": tf1.constant(gt)}
    loss_op = ref_lf.get_supervised_loss("mean_l1", multiScale=True, max_disp=192)(
        [tf1.constant(pred)], inputs
    )
    with tf1.Session() as sess:
        want = sess.run(loss_op)

    from real_time_self_adaptive_deep_stereo_tpu.losses import get_supervised_loss

    got = get_supervised_loss("mean_l1", multiScale=True, max_disp=192)(
        [jnp.asarray(pred)],
        {"left": jnp.asarray(l), "target": jnp.asarray(gt)},
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-5, atol=1e-6)


def test_reprojection_loss_flat_onehot_path_matches_gather():
    """The TPU fast path (flat-layout warp + flat SSIM/l1, activated for
    warp_mode='onehot') must agree with the exact gather-warp path that
    the TF1 golden test above validates."""
    from real_time_self_adaptive_deep_stereo_tpu.losses import get_reprojection_loss

    r = np.random.default_rng(3)
    H, W = 48, 96
    inputs = {
        "left": jnp.asarray(r.random((1, H, W, 3)) * 255, jnp.float32),
        "right": jnp.asarray(r.random((1, H, W, 3)) * 255, jnp.float32),
    }
    disp = jnp.asarray(r.random((1, H, W, 1)) * 20, jnp.float32)
    exact = get_reprojection_loss("mean_SSIM_l1", reduced=True, warp_mode="gather")(
        [disp], inputs
    )
    flat = get_reprojection_loss("mean_SSIM_l1", reduced=True, warp_mode="onehot")(
        [disp], inputs
    )
    np.testing.assert_allclose(float(flat), float(exact), rtol=2e-5, atol=1e-6)
