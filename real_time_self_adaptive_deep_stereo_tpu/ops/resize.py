"""Bilinear resize / pad / crop ops with TF1-legacy numerics, TPU-first.

The reference relies on ``tf.image.resize_images`` (TF 1.12, i.e. the
*legacy* bilinear kernel: ``src = dst_idx * (in/out)``, no half-pixel
offset, clamp at the top edge) and on ``tf.image.resize_image_with_crop_or_pad``
(centered zero pad / crop).  See reference ``Nets/MadNet.py:69-70`` and
``Data_utils/preprocessing.py:269-277``.

TPU design: for static shapes the bilinear resize is expressed as two
dense interpolation-matrix contractions (one along H, one along W).
Each matrix has exactly two non-zeros per row, but expressing the
resize as matmuls lets XLA run it on the MXU and fuse neighbouring
elementwise work, instead of emitting gathers.  The matrices are
computed with numpy at trace time and baked into the program as
constants (shapes are static under jit per framework policy).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = [
    "resize_bilinear",
    "resize_to",
    "crop_or_pad",
    "pad_image",
    "padded_shape",
]


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int, dtype=np.float32) -> np.ndarray:
    """Dense [out_size, in_size] TF1-legacy bilinear interpolation matrix.

    Row o holds the lerp weights for output index o: source coordinate
    ``s = o * in/out`` (align_corners=False, half_pixel_centers=False —
    the TF<=1.12 default used throughout the reference).
    """
    m = np.zeros((out_size, in_size), dtype=dtype)
    if in_size == out_size:
        np.fill_diagonal(m, 1.0)
        return m
    scale = in_size / out_size
    for o in range(out_size):
        s = o * scale
        lo = int(np.floor(s))
        lo = min(lo, in_size - 1)
        hi = min(lo + 1, in_size - 1)
        frac = np.float32(s - lo)
        m[o, lo] += 1.0 - frac
        m[o, hi] += frac
    return m


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize of NHWC ``img`` to (out_h, out_w), TF1-legacy semantics.

    Matches ``tf.image.resize_images(..., BILINEAR)`` at TF 1.12
    (align_corners=False, no half-pixel centers) to float32 rounding.
    """
    b, h, w, c = img.shape
    if (h, w) == (out_h, out_w):
        return img
    dt = img.dtype
    x = img.astype(jnp.float32)
    if h != out_h:
        mh = jnp.asarray(_interp_matrix(h, out_h))
        # [out_h, h] x [b, h, w, c] -> [b, out_h, w, c]
        x = jnp.einsum("oh,bhwc->bowc", mh, x, precision="highest")
    if w != out_w:
        mw = jnp.asarray(_interp_matrix(w, out_w))
        if c == 1:
            # contract as [b*h, w] @ [w, out_w] (N = out_w on the MXU);
            # the einsum below would make N = c = 1 — a matvec per row.
            # [b,h,1,out_w] -> [b,h,out_w,1] is a free reshape at c == 1.
            x = jnp.einsum("bhwc,wo->bhco", x, mw.T, precision="highest")
            x = x.reshape(b, x.shape[1], out_w, 1)
        else:
            x = jnp.einsum("ow,bhwc->bhoc", mw, x, precision="highest")
    return x.astype(dt)


def resize_to(img: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Resize ``img`` to the spatial shape of ``like`` (reference
    ``preprocessing.resize_to_prediction``, preprocessing.py:276)."""
    return resize_bilinear(img, like.shape[1], like.shape[2])


def crop_or_pad(img: jnp.ndarray, target_h: int, target_w: int) -> jnp.ndarray:
    """Centered crop and/or zero pad to (target_h, target_w).

    Matches ``tf.image.resize_image_with_crop_or_pad``: crop offsets are
    ``(excess)//2`` from the top/left, pad splits ``diff//2`` before and
    the remainder after.
    """
    b, h, w, c = img.shape
    x = img
    if h > target_h:
        off = (h - target_h) // 2
        x = x[:, off : off + target_h]
    if w > target_w:
        off = (w - target_w) // 2
        x = x[:, :, off : off + target_w]
    h2, w2 = x.shape[1], x.shape[2]
    if h2 < target_h or w2 < target_w:
        ph, pw = target_h - h2, target_w - w2
        x = jnp.pad(
            x,
            ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)),
        )
    return x


def padded_shape(h: int, w: int, factor: int = 64) -> tuple[int, int]:
    """Next multiple of ``factor`` >= (h, w) (equal stays equal)."""
    nh = h if h % factor == 0 else (h // factor + 1) * factor
    nw = w if w % factor == 0 else (w // factor + 1) * factor
    return nh, nw


def pad_image(img: jnp.ndarray, factor: int = 64) -> jnp.ndarray:
    """Centered REFLECT pad of NHWC ``img`` so H and W divide ``factor``.

    Mirrors reference ``Data_utils/preprocessing.py:7-29`` (pad split is
    ``diff//2`` before, ``(diff+1)//2`` after, mode REFLECT).
    """
    b, h, w, c = img.shape
    nh, nw = padded_shape(h, w, factor)
    if (nh, nw) == (h, w):
        return img
    ph_l = (nh - h) // 2
    ph_r = (nh - h + 1) // 2
    pw_l = (nw - w) // 2
    pw_r = (nw - w + 1) // 2
    return jnp.pad(img, ((0, 0), (ph_l, ph_r), (pw_l, pw_r), (0, 0)), mode="reflect")
