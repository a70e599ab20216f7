"""1-D stereo correlation (cost-volume) op.

Semantics (reference ``Nets/sharedLayers.py:41-51`` pure-TF path and
``Nets/Native/shift_corr.cu.cc`` CUDA kernel):

    corr[b, h, w, k] = mean_c( x[b, h, w, c] * y[b, h, w + d, c] )
    for d = -max_disp .. +max_disp (step ``stride``), k indexing the
    shifts in order; ``y`` is zero-padded along W.

This is the reference's single *native* (C++/CUDA) component; the
TPU-native equivalent is a Pallas kernel (``correlation_pallas``) with a
custom VJP, plus a pure-jnp implementation (``correlation_jnp``) that is
the CPU/test fallback and the autodiff oracle. The public
``correlation`` entry point picks the implementation; both produce
bit-identical results on the same backend modulo float summation order.

Layout notes (TPU): inputs are NHWC so the channel reduction runs over
the lane dimension; the shifted windows are consecutive W slices of a
single padded VMEM block, so the kernel reads ``y`` once from HBM for
all 2*max_disp+1 shifts instead of re-streaming it per shift.
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["correlation", "correlation_jnp", "correlation_pallas"]


def correlation_jnp(
    x: jnp.ndarray, y: jnp.ndarray, max_disp: int, stride: int = 1
) -> jnp.ndarray:
    """Reference (unrolled jnp) implementation, differentiable by autodiff."""
    b, h, w, c = x.shape
    ypad = jnp.pad(y, ((0, 0), (0, 0), (max_disp, max_disp), (0, 0)))
    outs = []
    for d in range(-max_disp, max_disp + 1, stride):
        shifted = jax.lax.slice_in_dim(ypad, d + max_disp, d + max_disp + w, axis=2)
        outs.append(jnp.mean(shifted * x, axis=-1, keepdims=True))
    return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


def _corr_fwd_kernel(x_ref, ypad_ref, out_ref, *, max_disp: int, width: int):
    # accumulate the C-reduction in fp32 even for bf16 activations
    # (bf16_act conv mode); the store casts back to the output dtype
    x = x_ref[...].astype(jnp.float32)  # [1, TH, W, C]
    inv_c = 1.0 / x.shape[-1]
    for k in range(2 * max_disp + 1):
        win = ypad_ref[:, :, k : k + width, :].astype(jnp.float32)
        out_ref[:, :, :, k] = (jnp.sum(win * x, axis=-1) * inv_c).astype(
            out_ref.dtype
        )


def _pick_row_tile(h: int, w: int, c: int, max_disp: int) -> int:
    """Rows per grid step, sized so blocks fit comfortably in VMEM.

    Budget is deliberately small (~1.5MB of block inputs): under
    ``jax.vmap`` (multi-stream sessions) the pallas batching rule maps
    the new axis into the BLOCK, multiplying its VMEM footprint by the
    stream count — an 8MB block OOMs scoped VMEM at 4 streams. Extra
    grid steps cost almost nothing (total HBM traffic is unchanged)."""
    vmem_budget = 1536 * 1024
    bytes_per_row = (2 * w + 2 * max_disp) * c * 4
    th = max(1, vmem_budget // max(1, bytes_per_row))
    th = min(th, h)
    while h % th:
        th -= 1
    return th


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def correlation_pallas(
    x: jnp.ndarray, y: jnp.ndarray, max_disp: int, interpret: bool = False
) -> jnp.ndarray:
    return _corr_pallas_fwd_impl(x, y, max_disp, interpret)


def _corr_pallas_fwd_impl(x, y, max_disp, interpret=False):
    b, h, w, c = x.shape
    d = 2 * max_disp + 1
    ypad = jnp.pad(y, ((0, 0), (0, 0), (max_disp, max_disp), (0, 0)))
    th = _pick_row_tile(h, w, c, max_disp)
    grid = (b, h // th)
    return pl.pallas_call(
        functools.partial(_corr_fwd_kernel, max_disp=max_disp, width=w),
        out_shape=jax.ShapeDtypeStruct((b, h, w, d), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, th, w + 2 * max_disp, c), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, w, d), lambda i, j: (i, j, 0, 0)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * d,
            bytes_accessed=(2 * b * h * w * c + b * h * w * d) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, ypad)


def _corr_pallas_fwd(x, y, max_disp, interpret):
    return _corr_pallas_fwd_impl(x, y, max_disp, interpret), (x, y)


def _corr_pallas_bwd(max_disp, interpret, res, g):
    """VJP matching the CUDA grad semantics (shift_corr.cu.cc:73-191).

    dx[w, c] = sum_d g[w, d] * ypad[w + d, c] / C
    dy[v, c] = sum_d g[v + max_disp - d, d] * x[v + max_disp - d, c] / C
    """
    x, y = res
    b, h, w, c = x.shape
    # a downstream promotion (e.g. a concat with fp32) can hand back a
    # wider cotangent than the bf16 primals; custom_vjp requires exact
    # dtype agreement, so mirror the primal dtype
    g = g.astype(x.dtype)
    inv_c = 1.0 / c
    ypad = jnp.pad(y, ((0, 0), (0, 0), (max_disp, max_disp), (0, 0)))
    gpad = jnp.pad(g, ((0, 0), (0, 0), (max_disp, max_disp), (0, 0)))
    xpad = jnp.pad(x, ((0, 0), (0, 0), (max_disp, max_disp), (0, 0)))
    dx = jnp.zeros_like(x)
    dy = jnp.zeros_like(y)
    for k in range(2 * max_disp + 1):
        ywin = jax.lax.slice_in_dim(ypad, k, k + w, axis=2)
        dx = dx + g[..., k : k + 1] * ywin * inv_c
        # reverse shift: contribution of output column w to y column w+k-max_disp
        off = 2 * max_disp - k
        gwin = jax.lax.slice_in_dim(gpad[..., k : k + 1], off, off + w, axis=2)
        xwin = jax.lax.slice_in_dim(xpad, off, off + w, axis=2)
        dy = dy + gwin * xwin * inv_c
    return dx, dy


correlation_pallas.defvjp(_corr_pallas_fwd, _corr_pallas_bwd)


def correlation(
    x: jnp.ndarray,
    y: jnp.ndarray,
    max_disp: int,
    stride: int = 1,
    mode: Literal["auto", "jnp", "pallas"] = "auto",
) -> jnp.ndarray:
    """1-D correlation cost volume between left ``x`` and right ``y`` (NHWC).

    ``mode='auto'`` uses the Pallas kernel on TPU backends (stride 1
    only, like the reference CUDA path, sharedLayers.py:27-28) and the
    jnp implementation elsewhere.
    """
    if mode == "auto":
        on_tpu = jax.default_backend() == "tpu"
        mode = "pallas" if (on_tpu and stride == 1) else "jnp"
    if mode == "pallas":
        if stride != 1:
            raise ValueError("Pallas correlation requires stride == 1")
        return correlation_pallas(x, y, max_disp)
    return correlation_jnp(x, y, max_disp, stride)
