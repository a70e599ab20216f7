"""Pallas TPU kernels for horizontal disparity warping (fwd + custom VJP).

The hot op of the whole system: every adaptation step warps the right
image by the predicted disparity (loss path) and right feature maps by
the upsampled coarse disparity (network path). Expressed in XLA, the
shift-accumulate formulation becomes hundreds of slice/copy/fusion ops
(~30% of step time in profiles); here the whole accumulation runs over
VMEM-resident rows in one kernel, reading the source exactly once from
HBM.

Kernel scheme: tensors are processed as [TH, C, W] tiles (W on lanes).
The source row is placed in a padded VMEM buffer whose data region
starts at a 128-aligned offset; each shift ``s`` of the accumulation

    out[x] = sum_s coeff_s[x] * src[x - s]

is realised as a hardware lane rotation (``pltpu.roll`` with a dynamic
shift) followed by a static aligned slice — Mosaic cannot prove
alignment of arbitrary dynamic lane slices, but rotations are native.
The backward pass scatters gradient contributions with the inverse
rotation and computes d_disp via the analytic bilinear derivative (the
difference of the two sampled corners).

Semantics are exactly the reference's two samplers (clamp-to-edge image
warp, Data_utils/preprocessing.py:121-230; OOB-weight-zeroing feature
warp, Nets/MadNet.py:400-436) for offsets within the static bound,
matching the jnp shift implementations in :mod:`ops.warp`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["warp_image_pallas", "warp_features_pallas"]


def _pick_th(h: int) -> int:
    """Rows per grid step (sublane dim must be a multiple of 8 or == h)."""
    if h <= 16:
        return h
    for th in (16, 8):
        if h % th == 0:
            return th
    return h


def _align128(n: int) -> int:
    return ((n + 127) // 128) * 128


def _rolled_window(buf, s, lpad, w, length):
    """buf rolled right by s (s may be negative), sliced at the aligned
    data offset: returns buf[..., lpad - s : lpad - s + w]."""
    s_pos = jnp.where(s < 0, s + length, s)
    rolled = pltpu.roll(buf, s_pos, 2)
    return jax.lax.slice_in_dim(rolled, lpad, lpad + w, axis=2)


# ---------------------------------------------------------------------------
# image warp: x' = x - disp, clamp-to-edge, disp in [0, S]
# ---------------------------------------------------------------------------


def _img_fwd_kernel(img_ref, disp_ref, out_ref, pad_ref, *, smax: int, lpad: int, width: int):
    img = img_ref[0]  # [TH, C, W]
    th, c, w = img.shape
    length = _align128(lpad + w)  # dynamic_rotate needs aligned lanes
    d = jnp.clip(disp_ref[0], 0.0, float(smax))
    xs = jax.lax.broadcasted_iota(jnp.int32, (th, w), 1).astype(jnp.float32)
    cx = xs - d
    x0 = jnp.floor(cx)
    w1 = cx - x0
    w0 = 1.0 - w1
    s0 = xs - jnp.clip(x0, 0.0, float(w - 1))
    s1 = xs - jnp.clip(x0 + 1.0, 0.0, float(w - 1))

    # left region <- edge value (only the last smax entries are ever read)
    pad_ref[:, :, :lpad] = jnp.broadcast_to(img[:, :, :1], (th, c, lpad))
    pad_ref[:, :, lpad : lpad + w] = img
    if length > lpad + w:
        pad_ref[:, :, lpad + w :] = jnp.zeros((th, c, length - lpad - w), img.dtype)

    nshift = min(smax, width - 1) + 1

    def body(s, acc):
        sf = s.astype(jnp.float32)
        coeff = w0 * (s0 == sf) + w1 * (s1 == sf)
        win = _rolled_window(pad_ref[...], s, lpad, w, length)
        return acc + coeff[:, None, :] * win

    out_ref[0] = jax.lax.fori_loop(0, nshift, body, jnp.zeros_like(img))


def _img_bwd_kernel(
    img_ref, disp_ref, g_ref, dimg_ref, ddisp_ref, pad_ref,
    *, smax: int, lpad: int, width: int
):
    img = img_ref[0]
    th, c, w = img.shape
    length = _align128(lpad + w)
    d = disp_ref[0]
    dc = jnp.clip(d, 0.0, float(smax))
    g = g_ref[0]
    xs = jax.lax.broadcasted_iota(jnp.int32, (th, w), 1).astype(jnp.float32)
    cx = xs - dc
    x0 = jnp.floor(cx)
    w1 = cx - x0
    w0 = 1.0 - w1
    s0 = xs - jnp.clip(x0, 0.0, float(w - 1))
    s1 = xs - jnp.clip(x0 + 1.0, 0.0, float(w - 1))

    pad_ref[:, :, :lpad] = jnp.broadcast_to(img[:, :, :1], (th, c, lpad))
    pad_ref[:, :, lpad : lpad + w] = img
    if length > lpad + w:
        pad_ref[:, :, lpad + w :] = jnp.zeros((th, c, length - lpad - w), img.dtype)

    nshift = min(smax, width - 1) + 1
    zl = jnp.zeros((th, c, lpad), img.dtype)
    zr_n = length - lpad - w

    def body(s, carry):
        v0, v1, dpad = carry
        sf = s.astype(jnp.float32)
        m0 = (s0 == sf).astype(img.dtype)
        m1 = (s1 == sf).astype(img.dtype)
        win = _rolled_window(pad_ref[...], s, lpad, w, length)
        contrib = (w0 * m0 + w1 * m1)[:, None, :] * g
        parts = [zl, contrib]
        if zr_n > 0:
            parts.append(jnp.zeros((th, c, zr_n), img.dtype))
        cpad = jnp.concatenate(parts, axis=2)
        # scatter transpose: place contrib at columns (lpad + x) - s
        # (roll left by s == roll right by length - s; keep shift in [0, len))
        dpad = dpad + pltpu.roll(cpad, jnp.where(s > 0, length - s, 0), 2)
        return (v0 + m0[:, None, :] * win, v1 + m1[:, None, :] * win, dpad)

    v0, v1, dpad = jax.lax.fori_loop(
        0,
        nshift,
        body,
        (
            jnp.zeros_like(img),
            jnp.zeros_like(img),
            jnp.zeros((th, c, length), img.dtype),
        ),
    )
    inrange = ((d >= 0.0) & (d <= float(smax))).astype(img.dtype)
    ddisp_ref[0] = jnp.sum(g * (v0 - v1), axis=1) * inrange
    interior = jax.lax.slice_in_dim(dpad, lpad, length, axis=2)
    # contributions to the edge-replicated pad all belong to column 0
    left = jnp.sum(
        jax.lax.slice_in_dim(dpad, lpad - smax, lpad, axis=2), axis=2, keepdims=True
    )
    first = jax.lax.slice_in_dim(interior, 0, 1, axis=2) + left
    dimg_ref[0] = jnp.concatenate(
        [first, jax.lax.slice_in_dim(interior, 1, w, axis=2)], axis=2
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def warp_image_pallas(
    img: jnp.ndarray, disp: jnp.ndarray, max_disp: int = 256, interpret: bool = False
):
    """Pallas ``warp_image`` (NHWC img, NHW1 disp). See module docstring."""
    return _warp_image_fwd_impl(img, disp, max_disp, interpret)


def _warp_image_fwd_impl(img, disp, max_disp, interpret=False):
    b, h, w, c = img.shape
    lpad = _align128(max_disp)
    th = _pick_th(h)
    out = pl.pallas_call(
        functools.partial(_img_fwd_kernel, smax=max_disp, lpad=lpad, width=w),
        out_shape=jax.ShapeDtypeStruct((b, h, c, w), img.dtype),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, th, c, w), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, th, w), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, c, w), lambda i, j: (i, j, 0, 0)),
        scratch_shapes=[pltpu.VMEM((th, c, _align128(lpad + w)), img.dtype)],
        interpret=interpret,
    )(img.transpose(0, 1, 3, 2), disp[..., 0])
    return out.transpose(0, 1, 3, 2)


def _warp_image_fwd(img, disp, max_disp, interpret):
    return _warp_image_fwd_impl(img, disp, max_disp, interpret), (img, disp)


def _warp_image_bwd(max_disp, interpret, res, g):
    img, disp = res
    b, h, w, c = img.shape
    lpad = _align128(max_disp)
    th = _pick_th(h)
    dimg_t, ddisp = pl.pallas_call(
        functools.partial(_img_bwd_kernel, smax=max_disp, lpad=lpad, width=w),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, c, w), img.dtype),
            jax.ShapeDtypeStruct((b, h, w), disp.dtype),
        ),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, th, c, w), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, th, w), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, th, c, w), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, th, c, w), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, th, w), lambda i, j: (i, j, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((th, c, _align128(lpad + w)), img.dtype)],
        interpret=interpret,
    )(img.transpose(0, 1, 3, 2), disp[..., 0], g.transpose(0, 1, 3, 2))
    return dimg_t.transpose(0, 1, 3, 2), ddisp[..., None]


warp_image_pallas.defvjp(_warp_image_fwd, _warp_image_bwd)


# ---------------------------------------------------------------------------
# feature warp: x' = x + dx, OOB corner weights zeroed, dx in [-neg, pos]
# ---------------------------------------------------------------------------


def _feat_weights(dx, w, max_neg, max_pos):
    th = dx.shape[0]
    xs = jax.lax.broadcasted_iota(jnp.int32, (th, dx.shape[1]), 1).astype(jnp.float32)
    d = jnp.clip(dx, -float(max_neg), float(max_pos))
    cx = xs + d
    x0 = jnp.floor(cx)
    x1 = x0 + 1.0
    in0 = ((x0 >= 0) & (x0 <= w - 1)).astype(jnp.float32)
    in1 = ((x1 >= 0) & (x1 <= w - 1)).astype(jnp.float32)
    w0 = (x1 - cx) * in0
    w1 = (cx - x0) * in1
    s0 = xs - jnp.clip(x0, 0.0, float(w - 1))
    s1 = xs - jnp.clip(x1, 0.0, float(w - 1))
    return w0, w1, s0, s1, in0, in1


def _feat_fwd_kernel(
    f_ref, dx_ref, out_ref, pad_ref,
    *, max_neg: int, max_pos: int, lpad: int, width: int
):
    f = f_ref[0]
    th, c, w = f.shape
    npad = min(max_neg, w - 1)
    ppad = min(max_pos + 1, w - 1)
    length = _align128(lpad + w + ppad)
    w0, w1, s0, s1, _, _ = _feat_weights(dx_ref[0], w, max_neg, max_pos)
    pad_ref[:, :, :lpad] = jnp.zeros((th, c, lpad), f.dtype)
    pad_ref[:, :, lpad : lpad + w] = f
    pad_ref[:, :, lpad + w :] = jnp.zeros((th, c, length - lpad - w), f.dtype)

    def body(i, acc):
        s = i - ppad  # shift in [-ppad, npad]
        sf = s.astype(jnp.float32)
        coeff = w0 * (s0 == sf) + w1 * (s1 == sf)
        win = _rolled_window(pad_ref[...], s, lpad, w, length)
        return acc + coeff[:, None, :] * win

    out_ref[0] = jax.lax.fori_loop(0, npad + ppad + 1, body, jnp.zeros_like(f))


def _feat_bwd_kernel(
    f_ref, dx_ref, g_ref, df_ref, ddx_ref, pad_ref,
    *, max_neg: int, max_pos: int, lpad: int, width: int
):
    f = f_ref[0]
    g = g_ref[0]
    th, c, w = f.shape
    npad = min(max_neg, w - 1)
    ppad = min(max_pos + 1, w - 1)
    length = _align128(lpad + w + ppad)
    dx = dx_ref[0]
    w0, w1, s0, s1, in0, in1 = _feat_weights(dx, w, max_neg, max_pos)
    pad_ref[:, :, :lpad] = jnp.zeros((th, c, lpad), f.dtype)
    pad_ref[:, :, lpad : lpad + w] = f
    pad_ref[:, :, lpad + w :] = jnp.zeros((th, c, length - lpad - w), f.dtype)

    zl = jnp.zeros((th, c, lpad), f.dtype)
    zr = jnp.zeros((th, c, length - lpad - w), f.dtype)

    def body(i, carry):
        v0, v1, dpad = carry
        s = i - ppad
        sf = s.astype(jnp.float32)
        m0 = (s0 == sf).astype(f.dtype)
        m1 = (s1 == sf).astype(f.dtype)
        win = _rolled_window(pad_ref[...], s, lpad, w, length)
        contrib = (w0 * m0 + w1 * m1)[:, None, :] * g
        cpad = jnp.concatenate([zl, contrib, zr], axis=2)
        s_inv = jnp.where(s > 0, length - s, -s)
        dpad = dpad + pltpu.roll(cpad, s_inv, 2)
        return (v0 + m0[:, None, :] * win, v1 + m1[:, None, :] * win, dpad)

    v0, v1, dpad = jax.lax.fori_loop(
        0,
        npad + ppad + 1,
        body,
        (
            jnp.zeros_like(f),
            jnp.zeros_like(f),
            jnp.zeros((th, c, length), f.dtype),
        ),
    )
    inrange = ((dx >= -float(max_neg)) & (dx <= float(max_pos))).astype(f.dtype)
    ddx_ref[0] = (
        jnp.sum(g * (in1[:, None, :] * v1 - in0[:, None, :] * v0), axis=1) * inrange
    )
    df_ref[0] = jax.lax.slice_in_dim(dpad, lpad, lpad + w, axis=2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def warp_features_pallas(
    feats: jnp.ndarray,
    dx: jnp.ndarray,
    max_neg: int = 64,
    max_pos: int = 4,
    interpret: bool = False,
):
    """Pallas ``warp_features_horizontal`` (NHWC feats, NHW1 dx)."""
    return _warp_feat_fwd_impl(feats, dx, max_neg, max_pos, interpret)


def _feat_call_shapes(h, w, max_neg, max_pos):
    th = _pick_th(h)
    npad = min(max_neg, w - 1)
    ppad = min(max_pos + 1, w - 1)
    lpad = _align128(npad)
    return th, npad, ppad, lpad


def _warp_feat_fwd_impl(feats, dx, max_neg, max_pos, interpret=False):
    b, h, w, c = feats.shape
    th, npad, ppad, lpad = _feat_call_shapes(h, w, max_neg, max_pos)
    out = pl.pallas_call(
        functools.partial(
            _feat_fwd_kernel, max_neg=max_neg, max_pos=max_pos, lpad=lpad, width=w
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, c, w), feats.dtype),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, th, c, w), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, th, w), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, c, w), lambda i, j: (i, j, 0, 0)),
        scratch_shapes=[pltpu.VMEM((th, c, _align128(lpad + w + ppad)), feats.dtype)],
        interpret=interpret,
    )(feats.transpose(0, 1, 3, 2), dx[..., 0])
    return out.transpose(0, 1, 3, 2)


def _warp_feat_fwd(feats, dx, max_neg, max_pos, interpret):
    return _warp_feat_fwd_impl(feats, dx, max_neg, max_pos, interpret), (feats, dx)


def _warp_feat_bwd(max_neg, max_pos, interpret, res, g):
    feats, dx = res
    b, h, w, c = feats.shape
    th, npad, ppad, lpad = _feat_call_shapes(h, w, max_neg, max_pos)
    df_t, ddx = pl.pallas_call(
        functools.partial(
            _feat_bwd_kernel, max_neg=max_neg, max_pos=max_pos, lpad=lpad, width=w
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, c, w), feats.dtype),
            jax.ShapeDtypeStruct((b, h, w), dx.dtype),
        ),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, th, c, w), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, th, w), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, th, c, w), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, th, c, w), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, th, w), lambda i, j: (i, j, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((th, c, _align128(lpad + w + ppad)), feats.dtype)],
        interpret=interpret,
    )(feats.transpose(0, 1, 3, 2), dx[..., 0], g.transpose(0, 1, 3, 2))
    return df_t.transpose(0, 1, 3, 2), ddx[..., None]


warp_features_pallas.defvjp(_warp_feat_fwd, _warp_feat_bwd)


# ---------------------------------------------------------------------------
# MXU-formulated warps: per-tile one-hot matmul built in VMEM.
#
# The jnp one-hot formulation (ops/warp.py warp_*_onehot) is the fastest
# XLA path but materialises the sampling matrix M and its two selector
# tensors through HBM — several hundred MB of traffic per full-res warp.
# Here M is built tile-by-tile in VMEM from two iota compares and
# contracted on the MXU immediately; HBM traffic collapses to the source
# row + output (+ gradient) only. One kernel scheme serves both
# reference samplers (clamp-to-edge image warp, preprocessing.py:121-230;
# OOB-weight-zeroing feature warp, MadNet.py:400-436):
#
#   out[t, c, x] = sum_v win[t, c, v] * M[t, x, v]
#   M[t, x, v]   = w0[t,x] * [v == rel0[t,x]] + w1[t,x] * [v == rel1[t,x]]
#
# with rel* the clamped sample positions relative to the (zero-padded)
# row buffer. Backward reuses the same tiles: dwin = g·M (scatter-free —
# the transpose matmul lands gradients in the padded row buffer), and
# d_disp comes from resampling the two corners (v0, v1) with the
# selector matrices. W is processed in 128-column tiles by a fori_loop
# over lane-aligned dynamic slices; wrappers pad W up to a multiple of
# 128. All matmuls run in f32 on the MXU (precision=highest).
# ---------------------------------------------------------------------------

_TX = 128  # output columns per tile (lane-aligned)


def _mxu_weights(d, xs, w, kind, lo, hi):
    """Bilinear weights + buffer-relative sample positions for one tile.

    kind='image': cx = x - d, clamp-to-edge (weights unmasked);
    kind='feat' : cx = x + d, out-of-range corner weights zeroed.
    Returns (w0, w1, r0, r1, inrange) with r* relative to an origin at
    -lpad (caller adds lpad - tile start).
    """
    dc = jnp.clip(d, lo, hi)
    cx = xs - dc if kind == "image" else xs + dc
    x0 = jnp.floor(cx)
    x1 = x0 + 1.0
    w1_ = cx - x0
    w0_ = 1.0 - w1_
    if kind == "feat":
        in0 = ((x0 >= 0) & (x0 <= w - 1)).astype(jnp.float32)
        in1 = ((x1 >= 0) & (x1 <= w - 1)).astype(jnp.float32)
        w0_ = w0_ * in0
        w1_ = w1_ * in1
    else:
        in0 = in1 = None
    r0 = jnp.clip(x0, 0.0, float(w - 1))
    r1 = jnp.clip(x1, 0.0, float(w - 1))
    inrange = ((d >= lo) & (d <= hi)).astype(jnp.float32)
    return w0_, w1_, r0, r1, in0, in1, inrange


def _dot_bt(a, b):
    """Batched A·Bᵀ: [T,M,V] x [T,N,V] -> [T,M,N] in f32 on the MXU."""
    return jax.lax.dot_general(
        a,
        b,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _mxu_fwd_kernel(
    img_ref, disp_ref, out_ref, buf_ref,
    *, kind: str, lo: float, hi: float, lpad: int, width: int, vlen: int
):
    img = img_ref[0]  # [TH, C, W]
    th, c, w = img.shape
    buf_ref[:, :, :lpad] = jnp.zeros((th, c, lpad), img.dtype)
    buf_ref[:, :, lpad : lpad + w] = img
    buf_ref[:, :, lpad + w :] = jnp.zeros(
        (th, c, buf_ref.shape[2] - lpad - w), img.dtype
    )
    viota = jax.lax.broadcasted_iota(jnp.int32, (th, _TX, vlen), 2).astype(
        jnp.float32
    )  # Mosaic only lowers integer iota

    def tile(k, _):
        x0c = k * _TX
        xs = (
            jax.lax.broadcasted_iota(jnp.int32, (th, _TX), 1) + x0c
        ).astype(jnp.float32)
        d = disp_ref[0, :, pl.ds(pl.multiple_of(x0c, _TX), _TX)]
        w0, w1, r0, r1, _, _, _ = _mxu_weights(d, xs, width, kind, lo, hi)
        # sample positions relative to the window start (buffer col x0c)
        rel0 = r0 + float(lpad) - x0c.astype(jnp.float32)
        rel1 = r1 + float(lpad) - x0c.astype(jnp.float32)
        m = w0[:, :, None] * (viota == rel0[:, :, None]) + w1[:, :, None] * (
            viota == rel1[:, :, None]
        )
        win = buf_ref[:, :, pl.ds(pl.multiple_of(x0c, _TX), vlen)]
        out_ref[0, :, :, pl.ds(pl.multiple_of(x0c, _TX), _TX)] = _dot_bt(win, m)
        return 0

    jax.lax.fori_loop(0, w // _TX, tile, 0)


def _mxu_bwd_kernel(
    img_ref, disp_ref, g_ref, dimg_ref, ddisp_ref, buf_ref, dbuf_ref,
    *, kind: str, lo: float, hi: float, lpad: int, width: int, vlen: int
):
    img = img_ref[0]
    th, c, w = img.shape
    length = buf_ref.shape[2]
    buf_ref[:, :, :lpad] = jnp.zeros((th, c, lpad), img.dtype)
    buf_ref[:, :, lpad : lpad + w] = img
    buf_ref[:, :, lpad + w :] = jnp.zeros((th, c, length - lpad - w), img.dtype)
    dbuf_ref[...] = jnp.zeros((th, c, length), jnp.float32)
    viota = jax.lax.broadcasted_iota(jnp.int32, (th, _TX, vlen), 2).astype(
        jnp.float32
    )  # Mosaic only lowers integer iota

    def tile(k, _):
        x0c = k * _TX
        xs = (
            jax.lax.broadcasted_iota(jnp.int32, (th, _TX), 1) + x0c
        ).astype(jnp.float32)
        d = disp_ref[0, :, pl.ds(pl.multiple_of(x0c, _TX), _TX)]
        w0, w1, r0, r1, in0, in1, inrange = _mxu_weights(d, xs, width, kind, lo, hi)
        rel0 = r0 + float(lpad) - x0c.astype(jnp.float32)
        rel1 = r1 + float(lpad) - x0c.astype(jnp.float32)
        sel0 = (viota == rel0[:, :, None]).astype(jnp.float32)
        sel1 = (viota == rel1[:, :, None]).astype(jnp.float32)
        m = w0[:, :, None] * sel0 + w1[:, :, None] * sel1
        g_tile = g_ref[0, :, :, pl.ds(pl.multiple_of(x0c, _TX), _TX)]  # [TH, C, TX]
        # dwin[t, v, c-major]: contract over output columns x
        dwin = jax.lax.dot_general(
            g_tile,
            m,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [TH, C, V]
        # accumulate into the scratch ref (overlapping windows add up)
        vsl = pl.ds(pl.multiple_of(x0c, _TX), vlen)
        dbuf_ref[:, :, vsl] = dbuf_ref[:, :, vsl] + dwin
        win = buf_ref[:, :, pl.ds(pl.multiple_of(x0c, _TX), vlen)]
        v0 = _dot_bt(win, sel0)  # [TH, C, TX] sampled corner 0
        v1 = _dot_bt(win, sel1)
        if kind == "image":
            dd = jnp.sum(g_tile * (v0 - v1), axis=1) * inrange
        else:
            dd = (
                jnp.sum(
                    g_tile * (in1[:, None, :] * v1 - in0[:, None, :] * v0), axis=1
                )
                * inrange
            )
        ddisp_ref[0, :, pl.ds(pl.multiple_of(x0c, _TX), _TX)] = dd
        return 0

    jax.lax.fori_loop(0, w // _TX, tile, 0)
    dimg_ref[0] = dbuf_ref[:, :, lpad : lpad + w]


def _mxu_call(img, disp, kind, lo, hi, lookback, interpret, grad=None):
    """Shared pallas_call wrapper. img NHWC, disp NHW1. Pads W to /128."""
    b, h, w, c = img.shape
    wpad = (-w) % _TX
    if wpad:
        img = jnp.pad(img, ((0, 0), (0, 0), (0, wpad), (0, 0)))
        disp = jnp.pad(disp, ((0, 0), (0, 0), (0, wpad), (0, 0)))
        if grad is not None:
            grad = jnp.pad(grad, ((0, 0), (0, 0), (0, wpad), (0, 0)))
    wp = w + wpad
    lpad = _align128(lookback + 1)
    vlen = lpad + 2 * _TX  # window: [x0-lpad, x0+TX+128) — covers i1 <= x+129
    th = _pick_th(h)
    length = _align128(lpad + wp + _TX)
    imgt = img.transpose(0, 1, 3, 2)
    dispt = disp[..., 0]
    kw = dict(kind=kind, lo=lo, hi=hi, lpad=lpad, width=wp, vlen=vlen)
    if grad is None:
        out = pl.pallas_call(
            functools.partial(_mxu_fwd_kernel, **kw),
            out_shape=jax.ShapeDtypeStruct((b, h, c, wp), jnp.float32),
            grid=(b, h // th),
            in_specs=[
                pl.BlockSpec((1, th, c, wp), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, th, wp), lambda i, j: (i, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, th, c, wp), lambda i, j: (i, j, 0, 0)),
            scratch_shapes=[pltpu.VMEM((th, c, length), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * b * h * wp * c * vlen,
                bytes_accessed=(2 * b * h * wp * c + b * h * wp) * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(imgt, dispt)
        out = out.transpose(0, 1, 3, 2)
        return out[:, :, :w, :] if wpad else out
    gt = grad.transpose(0, 1, 3, 2)
    dimg_t, ddisp = pl.pallas_call(
        functools.partial(_mxu_bwd_kernel, **kw),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, c, wp), jnp.float32),
            jax.ShapeDtypeStruct((b, h, wp), jnp.float32),
        ),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, th, c, wp), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, th, wp), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, th, c, wp), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, th, c, wp), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, th, wp), lambda i, j: (i, j, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((th, c, length), jnp.float32),
            pltpu.VMEM((th, c, length), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * wp * c * vlen,
            bytes_accessed=(4 * b * h * wp * c + 2 * b * h * wp) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(imgt, dispt, gt)
    dimg = dimg_t.transpose(0, 1, 3, 2)
    if wpad:
        dimg = dimg[:, :, :w, :]
        ddisp = ddisp[:, :, :w]
    return dimg, ddisp[..., None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def warp_image_mxu(
    img: jnp.ndarray, disp: jnp.ndarray, max_disp: int = 192, interpret: bool = False
):
    """MXU-tiled ``warp_image`` (clamp-to-edge, x' = x - disp): exact
    match of ops.warp.warp_image for 0 <= disp <= max_disp."""
    return _mxu_call(img, disp, "image", 0.0, float(max_disp), max_disp, interpret)


def _warp_image_mxu_fwd(img, disp, max_disp, interpret):
    return _mxu_call(
        img, disp, "image", 0.0, float(max_disp), max_disp, interpret
    ), (img, disp)


def _warp_image_mxu_bwd(max_disp, interpret, res, g):
    img, disp = res
    return _mxu_call(
        img, disp, "image", 0.0, float(max_disp), max_disp, interpret, grad=g
    )


warp_image_mxu.defvjp(_warp_image_mxu_fwd, _warp_image_mxu_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def warp_features_mxu(
    feats: jnp.ndarray,
    dx: jnp.ndarray,
    max_neg: int = 64,
    max_pos: int = 4,
    interpret: bool = False,
):
    """MXU-tiled ``warp_features_horizontal`` (OOB-zeroing, x' = x + dx):
    exact match of ops.warp.warp_features_horizontal for
    -max_neg <= dx <= max_pos."""
    return _mxu_call(
        feats, dx, "feat", -float(max_neg), float(max_pos), max_neg, interpret
    )


def _warp_feat_mxu_fwd(feats, dx, max_neg, max_pos, interpret):
    return _mxu_call(
        feats, dx, "feat", -float(max_neg), float(max_pos), max_neg, interpret
    ), (feats, dx)


def _warp_feat_mxu_bwd(max_neg, max_pos, interpret, res, g):
    feats, dx = res
    return _mxu_call(
        feats, dx, "feat", -float(max_neg), float(max_pos), max_neg, interpret,
        grad=g,
    )


warp_features_mxu.defvjp(_warp_feat_mxu_fwd, _warp_feat_mxu_bwd)
