"""Disparity warping / bilinear sampling ops.

The reference has two distinct sampling semantics that must NOT be
conflated:

1. ``warp_image`` (loss path, ``Data_utils/preprocessing.py:201-230``):
   samples the right image at ``x' = x - disp`` with bilinear weights
   built from *unclamped* coordinates and gathers at *clamped* indices —
   i.e. clamp-to-edge behaviour (the 4-corner weights always sum to 1).
   The flow has a zero vertical component so it degenerates to
   horizontal interpolation.

2. ``MadNet._linear_warping`` (feature warping inside the network,
   ``Nets/MadNet.py:400-436``): horizontal-only interpolation where the
   weight of an out-of-range corner is zeroed
   (``wt = frac * (x == clamp(x))``), so samples fully outside the image
   fade to zero at the left border and lose the fractional corner at the
   right border.

Both are pure gathers along W; implemented with
``jnp.take_along_axis`` which XLA lowers to efficient TPU dynamic
gathers. All shapes static; fully differentiable (gradients flow to
both the disparity and the source image, as in the reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "warp_image",
    "warp_features_horizontal",
    "bilinear_sampler",
    "warp_image_shift",
    "warp_features_horizontal_shift",
    "warp_image_onehot",
    "warp_image_onehot_flat",
    "warp_features_onehot",
    "resolve_warp_mode",
]


def _matmul_precision():
    """Warp one-hot matmuls follow the global conv precision policy:
    HIGHEST for fp32-exact parity runs, DEFAULT (one bf16 MXU pass) in
    the fast serving mode — an fp32-HIGHEST dot on TPU is a multi-pass
    emulation ~6x slower, and it dominated the remaining loss-path time.
    End-to-end accuracy drift of the fast mode is tracked in
    PARITY_RESULTS.md."""
    from real_time_self_adaptive_deep_stereo_tpu.ops import conv as _conv

    return _conv._CONV_PRECISION


def resolve_warp_mode(mode: str) -> str:
    """'auto' -> 'onehot' on TPU, 'gather' elsewhere (exact parity path,
    fast on CPU).

    Measured on one v5e chip (MAD fused step, 384x1280): onehot 23.0
    ms/step, mxu Pallas 30.7, shift ~27, gather 139.7. The Pallas
    kernels win isolated micro-benchmarks but lose in-model: each
    pallas_call is a fusion barrier plus NHWC<->NHCW transposes, while
    XLA fuses the onehot compare/select chain straight into the einsum.
    'mxu' stays available for standalone warping workloads.

    Out-of-range semantics differ between modes: 'gather' extrapolates
    via clamped bilinear sampling (the TF parity behaviour), while
    'onehot'/'shift'/'mxu'/'pallas' clamp the sample coordinate to the
    static [lo, hi] disparity window — e.g. negative disparities early
    in adaptation resolve to the window edge, not the gather value. The
    in-range results agree to float tolerance (selftests in bench.py).

    Uses the platform of the default device rather than
    ``jax.default_backend()`` (which can report an inactive plugin
    backend when JAX_PLATFORMS restricts to cpu)."""
    if mode == "auto":
        import jax

        return "onehot" if jax.devices()[0].platform == "tpu" else "gather"
    return mode


def _gather_w(img: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """Gather img[b, h, ix[b,h,w], c] for integer ix of shape [B,H,W]."""
    b, h, w, c = img.shape
    idx = jnp.broadcast_to(ix[..., None], (b, h, w, c))
    return jnp.take_along_axis(img, idx, axis=2)


def warp_image(img: jnp.ndarray, disp: jnp.ndarray) -> jnp.ndarray:
    """Warp ``img`` (right view, NHWC) by ``disp`` (NHW1, left-aligned).

    Reproduces reference ``preprocessing.warp_image`` +
    ``bilinear_sampler``: sample at ``x' = x - disp`` with
    clamp-to-edge horizontal interpolation (weights from unclamped
    coords, indices clamped; vertical component is exactly zero).
    """
    b, h, w, c = img.shape
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]  # [1,1,W]
    cx = xs - disp[..., 0]  # [B,H,W]
    x0 = jnp.floor(cx)
    wt1 = cx - x0  # weight of x0+1
    wt0 = 1.0 - wt1
    x0i = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
    x1i = jnp.clip(x0 + 1, 0, w - 1).astype(jnp.int32)
    im0 = _gather_w(img, x0i)
    im1 = _gather_w(img, x1i)
    return wt0[..., None] * im0 + wt1[..., None] * im1


def warp_features_horizontal(feats: jnp.ndarray, dx: jnp.ndarray) -> jnp.ndarray:
    """Warp feature maps horizontally by per-pixel offset ``dx`` (NHW1).

    Samples ``feats`` at ``x' = x + dx`` reproducing
    ``MadNet._linear_warping`` + ``_build_indeces``: corners whose
    unclamped index falls outside [0, W-1] contribute zero weight.
    """
    b, h, w, c = feats.shape
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    cx = xs + dx[..., 0]
    x0 = jnp.floor(cx)
    x1 = x0 + 1
    in0 = (x0 >= 0) & (x0 <= w - 1)
    in1 = (x1 >= 0) & (x1 <= w - 1)
    wt0 = (x1 - cx) * in0.astype(jnp.float32)
    wt1 = (cx - x0) * in1.astype(jnp.float32)
    x0i = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
    x1i = jnp.clip(x1, 0, w - 1).astype(jnp.int32)
    im0 = _gather_w(feats, x0i)
    im1 = _gather_w(feats, x1i)
    return wt0[..., None] * im0 + wt1[..., None] * im1


def bilinear_sampler(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Full 2-D bilinear sampling at ``coords`` [B,H,W,2] = (x, y).

    Clamp-to-edge semantics matching reference
    ``preprocessing.bilinear_sampler`` (weights from unclamped coords,
    indices clamped). Provided for parity / generic flows; the stereo
    hot paths use the specialised horizontal warps above.
    """
    b, h, w, c = img.shape
    cx = coords[..., 0]
    cy = coords[..., 1]
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    wx1 = cx - x0
    wx0 = 1.0 - wx1
    wy1 = cy - y0
    wy0 = 1.0 - wy1
    x0i = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
    x1i = jnp.clip(x0 + 1, 0, w - 1).astype(jnp.int32)
    y0i = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
    y1i = jnp.clip(y0 + 1, 0, h - 1).astype(jnp.int32)

    def gather(yi, xi):
        flat = img.reshape(b, h * w, c)
        idx = (yi * w + xi).reshape(b, -1, 1)
        out = jnp.take_along_axis(flat, jnp.broadcast_to(idx, (b, h * w, c)), axis=1)
        return out.reshape(b, h, w, c)

    im00 = gather(y0i, x0i)
    im01 = gather(y1i, x0i)
    im10 = gather(y0i, x1i)
    im11 = gather(y1i, x1i)
    return (
        (wx0 * wy0)[..., None] * im00
        + (wx0 * wy1)[..., None] * im01
        + (wx1 * wy0)[..., None] * im10
        + (wx1 * wy1)[..., None] * im11
    )


# ---------------------------------------------------------------------------
# Shift-accumulate warps: the TPU fast path.
#
# A horizontal warp is a per-pixel dynamic gather along W, which lowers
# to scalar-ish gather code on TPU and dominates the whole network's
# runtime (it measured ~40ms at 384x1280 vs ~2ms for the entire conv
# stack). Because stereo disparities are bounded, the same sampling can
# be written as a sum over a STATIC range of shifts with data-dependent
# bilinear coefficient masks:
#
#   out[x] = sum_s coeff_s[x] * img[x - s],   s in [-neg .. pos]
#   coeff_s[x] = w0[x]*[s == s0[x]] + w1[x]*[s == s0[x]-1]
#
# which is pure vectorized select/multiply/add (VPU), fuses with
# neighbours, and autodiffs into the same-shaped transpose. Semantics
# match the gather versions exactly whenever |offset| <= the static
# bound (offsets are clamped to the bound first; the reference's own
# sampling clamps to the image border anyway).
# ---------------------------------------------------------------------------


def warp_image_shift(
    img: jnp.ndarray, disp: jnp.ndarray, max_disp: int = 256
) -> jnp.ndarray:
    """Shift-based ``warp_image`` (clamp-to-edge, x' = x - disp).

    Equivalent to :func:`warp_image` for 0 <= disp <= max_disp; larger
    disparities are clamped to ``max_disp``.
    """
    b, h, w, c = img.shape
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    d = jnp.clip(disp[..., 0], 0.0, float(max_disp))
    cx = xs - d
    x0 = jnp.floor(cx)
    w1 = cx - x0  # weight of x0+1
    w0 = 1.0 - w1
    # clamped sample indices expressed as shifts s = x - idx
    s0 = (xs - jnp.clip(x0, 0.0, float(w - 1))).astype(jnp.int32)
    s1 = (xs - jnp.clip(x0 + 1.0, 0.0, float(w - 1))).astype(jnp.int32)

    acc = jnp.zeros_like(img)
    left_edge = img[:, :, :1, :]
    # shifts >= w are unreachable: the clamped index s = x - idx with
    # idx in [0, w-1] satisfies s <= x <= w-1
    for s in range(0, min(max_disp, w - 1) + 1):
        if s == 0:
            shifted = img
        else:
            shifted = jnp.concatenate(
                [jnp.broadcast_to(left_edge, (b, h, s, c)), img[:, :, : w - s, :]],
                axis=2,
            )
        coeff = w0 * (s0 == s) + w1 * (s1 == s)
        acc = acc + coeff[..., None] * shifted
    return acc


def warp_features_horizontal_shift(
    feats: jnp.ndarray,
    dx: jnp.ndarray,
    max_neg: int = 64,
    max_pos: int = 4,
) -> jnp.ndarray:
    """Shift-based ``warp_features_horizontal`` (x' = x + dx, OOB-zero).

    Equivalent to the gather version for -max_neg <= dx <= max_pos
    (dx is clamped to that range; MADNet's ``dx`` is the negated
    upsampled disparity so it is almost surely in [-max_disp/scale, 0]).
    """
    b, h, w, c = feats.shape
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    d = jnp.clip(dx[..., 0], -float(max_neg), float(max_pos))
    cx = xs + d
    x0 = jnp.floor(cx)
    x1 = x0 + 1
    in0 = (x0 >= 0) & (x0 <= w - 1)
    in1 = (x1 >= 0) & (x1 <= w - 1)
    w0 = (x1 - cx) * in0.astype(jnp.float32)
    w1 = (cx - x0) * in1.astype(jnp.float32)
    # shifts s = x - idx for the two (clamped) sample indices
    s0 = (xs - jnp.clip(x0, 0.0, float(w - 1))).astype(jnp.int32)
    s1 = (xs - jnp.clip(x1, 0.0, float(w - 1))).astype(jnp.int32)

    acc = jnp.zeros_like(feats)
    zero_col = jnp.zeros((b, h, 1, c), feats.dtype)
    # |s| >= w is unreachable for clamped indices (see warp_image_shift)
    for s in range(max(-max_pos - 1, -(w - 1)), min(max_neg, w - 1) + 1):
        if s == 0:
            shifted = feats
        elif s > 0:
            shifted = jnp.concatenate(
                [jnp.broadcast_to(zero_col, (b, h, s, c)), feats[:, :, : w - s, :]],
                axis=2,
            )
        else:
            shifted = jnp.concatenate(
                [feats[:, :, -s:, :], jnp.broadcast_to(zero_col, (b, h, -s, c))],
                axis=2,
            )
        coeff = w0 * (s0 == s) + w1 * (s1 == s)
        acc = acc + coeff[..., None] * shifted
    return acc


def warp_image_onehot(
    img: jnp.ndarray, disp: jnp.ndarray, max_disp: int = 192, chunk: int = 256
) -> jnp.ndarray:
    """Matmul-formulated ``warp_image`` — the fastest TPU path.

    For each output chunk the bilinear sampling matrix (two non-zeros
    per row, built with vectorized compares) is contracted against the
    corresponding source window on the MXU:

        out[x] = sum_v M[x, v] * imgpad[v],
        M[x, v] = w0[x]*[v == i0[x]] + w1[x]*[v == i1[x]]

    Exactly equivalent to :func:`warp_image` for 0 <= disp <= max_disp
    (disp clamped). Unlike the shift-accumulate form this costs one
    batched matmul + one compare pass per chunk instead of ~max_disp
    shifted copies.
    """
    b, h, w, c = img.shape
    s = max_disp
    imgpad = jnp.concatenate(
        [jnp.broadcast_to(img[:, :, :1, :], (b, h, s, c)), img], axis=2
    )
    d = jnp.clip(disp[..., 0], 0.0, float(s))
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    cx = xs - d
    x0 = jnp.floor(cx)
    w1 = cx - x0
    w0 = 1.0 - w1
    i0 = jnp.clip(x0, 0.0, float(w - 1)) + s  # absolute index in imgpad
    i1 = jnp.clip(x0 + 1.0, 0.0, float(w - 1)) + s

    outs = []
    for x_start in range(0, w, chunk):
        cw = min(chunk, w - x_start)
        win = jax.lax.slice_in_dim(imgpad, x_start, x_start + cw + s, axis=2)
        vidx = (
            jnp.arange(cw + s, dtype=jnp.float32) + x_start
        )[None, None, None, :]
        sel0 = (vidx == i0[:, :, x_start : x_start + cw, None]).astype(img.dtype)
        sel1 = (vidx == i1[:, :, x_start : x_start + cw, None]).astype(img.dtype)
        m = (
            w0[:, :, x_start : x_start + cw, None] * sel0
            + w1[:, :, x_start : x_start + cw, None] * sel1
        )
        outs.append(
            jnp.einsum("bhxv,bhvc->bhxc", m, win, precision=_matmul_precision())
        )
    return jnp.concatenate(outs, axis=2)


def warp_image_onehot_flat(
    img: jnp.ndarray, disp: jnp.ndarray, max_disp: int = 192, chunk: int = 256
) -> jnp.ndarray:
    """:func:`warp_image_onehot` emitting the merged ``[B,H,W*C]`` layout.

    Materializing the warped image as NHWC costs ~0.16 ms per write at
    384x1280x3 (C=3 in the lane dim -> ~4% effective HBM bandwidth), and
    the flat-layout loss (losses/factory.py ``_flat``) immediately
    relayouts it again. Here each chunk's matmul output reshapes to
    ``[B,H,cw*C]`` straight out of the dot epilogue and the concatenation
    happens lane-aligned, so the bad layout never exists."""
    b, h, w, c = img.shape
    s = max_disp
    imgpad = jnp.concatenate(
        [jnp.broadcast_to(img[:, :, :1, :], (b, h, s, c)), img], axis=2
    )
    d = jnp.clip(disp[..., 0], 0.0, float(s))
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    cx = xs - d
    x0 = jnp.floor(cx)
    w1 = cx - x0
    w0 = 1.0 - w1
    i0 = jnp.clip(x0, 0.0, float(w - 1)) + s
    i1 = jnp.clip(x0 + 1.0, 0.0, float(w - 1)) + s

    outs = []
    for x_start in range(0, w, chunk):
        cw = min(chunk, w - x_start)
        win = jax.lax.slice_in_dim(imgpad, x_start, x_start + cw + s, axis=2)
        vidx = (
            jnp.arange(cw + s, dtype=jnp.float32) + x_start
        )[None, None, None, :]
        sel0 = (vidx == i0[:, :, x_start : x_start + cw, None]).astype(img.dtype)
        sel1 = (vidx == i1[:, :, x_start : x_start + cw, None]).astype(img.dtype)
        m = (
            w0[:, :, x_start : x_start + cw, None] * sel0
            + w1[:, :, x_start : x_start + cw, None] * sel1
        )
        o = jnp.einsum("bhxv,bhvc->bhxc", m, win, precision=_matmul_precision())
        outs.append(o.reshape(b, h, cw * c))
    return jnp.concatenate(outs, axis=2)


def warp_features_onehot(
    feats: jnp.ndarray,
    dx: jnp.ndarray,
    max_neg: int = 64,
    max_pos: int = 4,
    chunk: int = 128,
) -> jnp.ndarray:
    """Matmul-formulated ``warp_features_horizontal`` (OOB weights zeroed).

    Same scheme as :func:`warp_image_onehot`; equivalent to
    :func:`warp_features_horizontal` for -max_neg <= dx <= max_pos.
    """
    b, h, w, c = feats.shape
    npad = min(max_neg, w)
    ppad = min(max_pos + 1, w)
    fpad = jnp.pad(feats, ((0, 0), (0, 0), (npad, ppad), (0, 0)))
    d = jnp.clip(dx[..., 0], -float(max_neg), float(max_pos))
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    cx = xs + d
    x0 = jnp.floor(cx)
    x1 = x0 + 1.0
    in0 = ((x0 >= 0) & (x0 <= w - 1)).astype(jnp.float32)
    in1 = ((x1 >= 0) & (x1 <= w - 1)).astype(jnp.float32)
    w0 = (x1 - cx) * in0
    w1 = (cx - x0) * in1
    i0 = jnp.clip(x0, 0.0, float(w - 1)) + npad
    i1 = jnp.clip(x1, 0.0, float(w - 1)) + npad

    outs = []
    for x_start in range(0, w, chunk):
        cw = min(chunk, w - x_start)
        win = jax.lax.slice_in_dim(fpad, x_start, x_start + cw + npad + ppad, axis=2)
        vidx = (
            jnp.arange(cw + npad + ppad, dtype=jnp.float32) + x_start
        )[None, None, None, :]
        sel0 = (vidx == i0[:, :, x_start : x_start + cw, None]).astype(feats.dtype)
        sel1 = (vidx == i1[:, :, x_start : x_start + cw, None]).astype(feats.dtype)
        m = (
            w0[:, :, x_start : x_start + cw, None] * sel0
            + w1[:, :, x_start : x_start + cw, None] * sel1
        )
        outs.append(
            jnp.einsum("bhxv,bhvc->bhxc", m, win, precision=_matmul_precision())
        )
    return jnp.concatenate(outs, axis=2)
