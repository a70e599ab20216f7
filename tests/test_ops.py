"""Unit tests for the ops core against tiny numpy oracles and, where the
semantics come straight from TF1, against TF (CPU) itself."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from real_time_self_adaptive_deep_stereo_tpu.ops import (
    correlation_jnp,
    correlation_pallas,
    crop_or_pad,
    pad_image,
    resize_bilinear,
    warp_features_horizontal,
    warp_image,
)

rng = np.random.default_rng(0)


def _tf():
    tf = pytest.importorskip("tensorflow")
    return tf


# ---------------------------------------------------------------- correlation


def corr_oracle(x, y, max_disp, stride=1):
    b, h, w, c = x.shape
    ypad = np.pad(y, ((0, 0), (0, 0), (max_disp, max_disp), (0, 0)))
    outs = []
    for d in range(-max_disp, max_disp + 1, stride):
        shifted = ypad[:, :, d + max_disp : d + max_disp + w, :]
        outs.append((shifted * x).mean(-1, keepdims=True))
    return np.concatenate(outs, -1)


@pytest.mark.parametrize("max_disp,stride", [(2, 1), (3, 2), (5, 1)])
@pytest.mark.quick
def test_correlation_jnp_matches_oracle(max_disp, stride):
    x = rng.normal(size=(2, 4, 16, 8)).astype(np.float32)
    y = rng.normal(size=(2, 4, 16, 8)).astype(np.float32)
    got = np.asarray(correlation_jnp(jnp.asarray(x), jnp.asarray(y), max_disp, stride))
    np.testing.assert_allclose(got, corr_oracle(x, y, max_disp, stride), rtol=1e-6, atol=1e-6)


@pytest.mark.quick
def test_correlation_pallas_interpret_matches_jnp():
    # interpret-mode execution of the pallas kernel on CPU
    x = rng.normal(size=(1, 8, 32, 16)).astype(np.float32)
    y = rng.normal(size=(1, 8, 32, 16)).astype(np.float32)
    got = np.asarray(correlation_pallas(jnp.asarray(x), jnp.asarray(y), 2, True))
    np.testing.assert_allclose(got, corr_oracle(x, y, 2), rtol=1e-5, atol=1e-5)


def test_correlation_pallas_grads_match_jnp():
    x = jnp.asarray(rng.normal(size=(1, 4, 16, 8)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(1, 4, 16, 8)).astype(np.float32))

    def loss_ref(x, y):
        return jnp.sum(jnp.sin(correlation_jnp(x, y, 2)))

    gx_ref, gy_ref = jax.grad(loss_ref, argnums=(0, 1))(x, y)

    def loss_pl(x, y):
        return jnp.sum(jnp.sin(correlation_pallas(x, y, 2, True)))

    gx, gy = jax.grad(loss_pl, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_ref), rtol=1e-5, atol=1e-5)


# --------------------------------------------------------------------- resize


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((6, 10), (384, 1280)), ((64, 64), (32, 32)), ((5, 7), (10, 14)), ((8, 8), (8, 8))],
)
def test_resize_matches_tf1_legacy_bilinear(in_hw, out_hw):
    tf = _tf()
    x = rng.normal(size=(2, *in_hw, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), *out_hw))
    want = tf.compat.v1.image.resize_images(
        tf.constant(x), out_hw, method=tf.image.ResizeMethod.BILINEAR
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("target", [(4, 6), (12, 20), (4, 20), (12, 6)])
def test_crop_or_pad_matches_tf(target):
    tf = _tf()
    x = rng.normal(size=(2, 8, 10, 1)).astype(np.float32)
    got = np.asarray(crop_or_pad(jnp.asarray(x), *target))
    want = tf.image.resize_with_crop_or_pad(tf.constant(x), *target).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_pad_image_matches_tf_reflect():
    tf = _tf()
    x = rng.normal(size=(1, 100, 250, 3)).astype(np.float32)
    got = np.asarray(pad_image(jnp.asarray(x), 64))
    assert got.shape == (1, 128, 256, 3)
    ph, pw = 128 - 100, 256 - 250
    want = tf.pad(
        tf.constant(x),
        [[0, 0], [ph // 2, ph - ph // 2], [pw // 2, pw - pw // 2], [0, 0]],
        mode="REFLECT",
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


# ----------------------------------------------------------------------- warp


@pytest.mark.quick
def test_warp_image_zero_disp_identity():
    img = rng.normal(size=(1, 6, 12, 3)).astype(np.float32)
    disp = np.zeros((1, 6, 12, 1), np.float32)
    out = np.asarray(warp_image(jnp.asarray(img), jnp.asarray(disp)))
    np.testing.assert_allclose(out, img, rtol=1e-6)


@pytest.mark.quick
def test_warp_image_integer_shift():
    img = rng.normal(size=(1, 4, 12, 2)).astype(np.float32)
    disp = np.full((1, 4, 12, 1), 3.0, np.float32)
    out = np.asarray(warp_image(jnp.asarray(img), jnp.asarray(disp)))
    # x' = x - 3, clamped at the left edge
    want = img[:, :, np.clip(np.arange(12) - 3, 0, 11), :]
    np.testing.assert_allclose(out, want, rtol=1e-6)


@pytest.mark.quick
def test_warp_image_fractional_shift():
    img = np.arange(8, dtype=np.float32).reshape(1, 1, 8, 1)
    disp = np.full((1, 1, 8, 1), 0.5, np.float32)
    out = np.asarray(warp_image(jnp.asarray(img), jnp.asarray(disp)))[0, 0, :, 0]
    want = np.array([0.0, 0.5, 1.5, 2.5, 3.5, 4.5, 5.5, 6.5], np.float32)
    # x'=x-0.5 -> lerp between floor/ceil; left edge clamps to 0 -> 0*0.5+0*0.5
    np.testing.assert_allclose(out[1:], want[1:], rtol=1e-6)
    assert out[0] == 0.0  # both corners clamp to index 0 -> value 0


@pytest.mark.quick
def test_warp_features_oob_weights_zeroed():
    feats = np.ones((1, 2, 6, 4), np.float32)
    dx = np.full((1, 2, 6, 1), -10.0, np.float32)  # everything out of range
    out = np.asarray(warp_features_horizontal(jnp.asarray(feats), jnp.asarray(dx)))
    np.testing.assert_allclose(out, np.zeros_like(out))


@pytest.mark.quick
def test_warp_features_matches_linear_warping_semantics():
    # numpy oracle of MadNet._linear_warping (horizontal, OOB-weight zeroing)
    feats = rng.normal(size=(2, 3, 10, 5)).astype(np.float32)
    dx = rng.normal(size=(2, 3, 10, 1)).astype(np.float32) * 4
    b, h, w, c = feats.shape
    xs = np.arange(w, dtype=np.float32)[None, None, :]
    cx = xs + dx[..., 0]
    x0 = np.floor(cx)
    x1 = x0 + 1
    w0 = (x1 - cx) * ((x0 >= 0) & (x0 <= w - 1))
    w1 = (cx - x0) * ((x1 >= 0) & (x1 <= w - 1))
    x0i = np.clip(x0, 0, w - 1).astype(int)
    x1i = np.clip(x1, 0, w - 1).astype(int)
    want = np.zeros_like(feats)
    for bi in range(b):
        for hi in range(h):
            want[bi, hi] = (
                w0[bi, hi, :, None] * feats[bi, hi, x0i[bi, hi]]
                + w1[bi, hi, :, None] * feats[bi, hi, x1i[bi, hi]]
            )
    got = np.asarray(warp_features_horizontal(jnp.asarray(feats), jnp.asarray(dx)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------- shift-warp fast path


def test_warp_image_shift_matches_gather():
    from real_time_self_adaptive_deep_stereo_tpu.ops import (
        warp_image_shift,
    )

    img = jnp.asarray(rng.normal(size=(2, 5, 40, 3)).astype(np.float32))
    disp = jnp.asarray((rng.random((2, 5, 40, 1)) * 20).astype(np.float32))
    a = np.asarray(warp_image(img, disp))
    b = np.asarray(warp_image_shift(img, disp, max_disp=24))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_warp_image_shift_grads_match_gather():
    from real_time_self_adaptive_deep_stereo_tpu.ops import warp_image_shift

    img = jnp.asarray(rng.normal(size=(1, 4, 24, 2)).astype(np.float32))
    disp = jnp.asarray((rng.random((1, 4, 24, 1)) * 8 + 0.3).astype(np.float32))

    g1 = jax.grad(lambda d: jnp.sum(jnp.sin(warp_image(img, d))))(disp)
    g2 = jax.grad(lambda d: jnp.sum(jnp.sin(warp_image_shift(img, d, 12))))(disp)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)

    gi1 = jax.grad(lambda im: jnp.sum(jnp.cos(warp_image(im, disp))))(img)
    gi2 = jax.grad(lambda im: jnp.sum(jnp.cos(warp_image_shift(im, disp, 12))))(img)
    np.testing.assert_allclose(np.asarray(gi1), np.asarray(gi2), rtol=1e-4, atol=1e-5)


def test_warp_features_shift_matches_gather():
    from real_time_self_adaptive_deep_stereo_tpu.ops import (
        warp_features_horizontal_shift,
    )

    feats = jnp.asarray(rng.normal(size=(2, 4, 32, 6)).astype(np.float32))
    dx = jnp.asarray((rng.random((2, 4, 32, 1)) * -12 + 2).astype(np.float32))
    a = np.asarray(warp_features_horizontal(feats, dx))
    b = np.asarray(warp_features_horizontal_shift(feats, dx, max_neg=12, max_pos=4))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_warp_features_shift_grads_match_gather():
    from real_time_self_adaptive_deep_stereo_tpu.ops import (
        warp_features_horizontal_shift,
    )

    feats = jnp.asarray(rng.normal(size=(1, 3, 20, 4)).astype(np.float32))
    dx = jnp.asarray((rng.random((1, 3, 20, 1)) * -6 + 1).astype(np.float32))
    g1 = jax.grad(lambda d: jnp.sum(jnp.sin(warp_features_horizontal(feats, d))))(dx)
    g2 = jax.grad(
        lambda d: jnp.sum(jnp.sin(warp_features_horizontal_shift(feats, d, 8, 4)))
    )(dx)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


@pytest.mark.quick
def test_warp_onehot_matches_gather():
    from real_time_self_adaptive_deep_stereo_tpu.ops.warp import (
        warp_features_onehot,
        warp_image_onehot,
    )

    img = jnp.asarray(rng.normal(size=(2, 5, 40, 3)).astype(np.float32))
    disp = jnp.asarray((rng.random((2, 5, 40, 1)) * 20).astype(np.float32))
    a = np.asarray(warp_image(img, disp))
    b = np.asarray(warp_image_onehot(img, disp, max_disp=24, chunk=16))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    feats = jnp.asarray(rng.normal(size=(2, 4, 32, 6)).astype(np.float32))
    dx = jnp.asarray((rng.random((2, 4, 32, 1)) * -12 + 2).astype(np.float32))
    a = np.asarray(warp_features_horizontal(feats, dx))
    b = np.asarray(warp_features_onehot(feats, dx, max_neg=12, max_pos=4, chunk=16))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_warp_onehot_grads_match_gather():
    from real_time_self_adaptive_deep_stereo_tpu.ops.warp import (
        warp_features_onehot,
        warp_image_onehot,
    )

    img = jnp.asarray(rng.normal(size=(1, 4, 24, 2)).astype(np.float32))
    disp = jnp.asarray((rng.random((1, 4, 24, 1)) * 8 + 0.3).astype(np.float32))
    g1 = jax.grad(lambda d: jnp.sum(jnp.sin(warp_image(img, d))))(disp)
    g2 = jax.grad(lambda d: jnp.sum(jnp.sin(warp_image_onehot(img, d, 12, 8))))(disp)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)

    feats = jnp.asarray(rng.normal(size=(1, 3, 20, 4)).astype(np.float32))
    dx = jnp.asarray((rng.random((1, 3, 20, 1)) * -6 + 1).astype(np.float32))
    g1 = jax.grad(lambda d: jnp.sum(jnp.sin(warp_features_horizontal(feats, d))))(dx)
    g2 = jax.grad(
        lambda d: jnp.sum(jnp.sin(warp_features_onehot(feats, d, 8, 4, 8)))
    )(dx)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_warp_mxu_interpret_matches_gather():
    """MXU one-hot-matmul Pallas kernels (interpret mode): forward parity
    with the gather oracles, including the W-padding path (W % 128 != 0)."""
    from real_time_self_adaptive_deep_stereo_tpu.ops.warp_pallas import (
        warp_features_mxu,
        warp_image_mxu,
    )

    img = jnp.asarray(rng.normal(size=(2, 8, 200, 3)).astype(np.float32))
    disp = jnp.asarray((rng.random((2, 8, 200, 1)) * 30).astype(np.float32))
    a = np.asarray(warp_image(img, disp))
    b = np.asarray(warp_image_mxu(img, disp, 32, True))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    feats = jnp.asarray(rng.normal(size=(1, 8, 140, 6)).astype(np.float32))
    dx = jnp.asarray((rng.random((1, 8, 140, 1)) * -20 + 3).astype(np.float32))
    a = np.asarray(warp_features_horizontal(feats, dx))
    b = np.asarray(warp_features_mxu(feats, dx, 20, 4, True))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_warp_mxu_interpret_grads_match_gather():
    """Custom-VJP of the MXU kernels vs autodiff of the gather oracles,
    for both the source and the disparity inputs."""
    from real_time_self_adaptive_deep_stereo_tpu.ops.warp_pallas import (
        warp_features_mxu,
        warp_image_mxu,
    )

    img = jnp.asarray(rng.normal(size=(1, 8, 136, 2)).astype(np.float32))
    disp = jnp.asarray((rng.random((1, 8, 136, 1)) * 10 + 0.3).astype(np.float32))
    g1 = jax.grad(lambda i, d: jnp.sum(jnp.sin(warp_image(i, d))), (0, 1))(img, disp)
    g2 = jax.grad(
        lambda i, d: jnp.sum(jnp.sin(warp_image_mxu(i, d, 12, True))), (0, 1)
    )(img, disp)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    feats = jnp.asarray(rng.normal(size=(1, 8, 132, 4)).astype(np.float32))
    dx = jnp.asarray((rng.random((1, 8, 132, 1)) * -6 + 1).astype(np.float32))
    g1 = jax.grad(
        lambda f, d: jnp.sum(jnp.sin(warp_features_horizontal(f, d))), (0, 1)
    )(feats, dx)
    g2 = jax.grad(
        lambda f, d: jnp.sum(jnp.sin(warp_features_mxu(f, d, 8, 4, True))), (0, 1)
    )(feats, dx)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------ conv precision


@pytest.mark.quick
def test_conv_bf16_mode_close_to_f32_and_restores():
    """set_conv_precision('bf16') stores conv operands in bfloat16 with
    fp32 accumulation: outputs must stay fp32 and track the fp32 conv to
    bf16 mantissa precision (the fast serving mode on TPU; accuracy
    drift is quantified end-to-end in PARITY_RESULTS.md)."""
    from real_time_self_adaptive_deep_stereo_tpu.ops.conv import (
        conv2d,
        init_conv,
        set_conv_precision,
    )

    params = init_conv(jax.random.PRNGKey(0), (3, 3, 8, 16))
    x = jnp.asarray(rng.standard_normal((1, 16, 24, 8)), jnp.float32)
    want = conv2d(params, x)
    try:
        set_conv_precision("bf16")
        got = conv2d(params, x)
    finally:
        set_conv_precision("highest")
    assert got.dtype == jnp.float32
    denom = np.maximum(np.abs(np.asarray(want)), 1.0)
    assert float((np.abs(np.asarray(got - want)) / denom).max()) < 0.03
    # and the global must be restored for the rest of the suite
    again = conv2d(params, x)
    np.testing.assert_allclose(np.asarray(again), np.asarray(want), rtol=0, atol=0)


@pytest.mark.quick
def test_warp_image_onehot_flat_matches_nhwc():
    """warp_image_onehot_flat must equal the NHWC one-hot warp reshaped
    to the merged [B,H,W*C] layout (it exists purely to avoid ever
    materializing the lane-hostile NHWC buffer on TPU)."""
    from real_time_self_adaptive_deep_stereo_tpu.ops.warp import (
        warp_image_onehot,
        warp_image_onehot_flat,
    )

    img = jnp.asarray(rng.random((1, 24, 300, 3)) * 255, jnp.float32)
    disp = jnp.asarray(rng.random((1, 24, 300, 1)) * 40, jnp.float32)
    want = warp_image_onehot(img, disp, 48)
    got = warp_image_onehot_flat(img, disp, 48)
    b, h, w, c = want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want).reshape(b, h, w * c), rtol=1e-6, atol=1e-6
    )
    # gradients agree too (the loss path differentiates through it)
    g1 = jax.grad(lambda d: jnp.sum(warp_image_onehot(img, d, 48) ** 2))(disp)
    g2 = jax.grad(lambda d: jnp.sum(warp_image_onehot_flat(img, d, 48) ** 2))(disp)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-5, atol=1e-5)
