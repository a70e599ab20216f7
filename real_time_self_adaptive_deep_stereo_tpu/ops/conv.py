"""Functional convolution layer library (NHWC / HWIO), TPU-first.

Covers the reference layer library ``Nets/sharedLayers.py``: conv2d,
dilated conv, transposed conv, depthwise / separable / grouped conv and
channel shuffle — re-designed as pure functions over ``{'w': ..., 'b': ...}``
param dicts instead of TF variable scopes. All convs lower to
``lax.conv_general_dilated`` which XLA tiles onto the MXU; activations
fuse into the conv epilogue.

Initialisation matches the reference's defaults: Xavier/Glorot uniform
for weights (``sharedLayers.py:4``), zeros for biases
(``sharedLayers.py:5``). Default activation is leaky-relu(0.1)
(``sharedLayers.py:54``).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "leaky_relu",
    "init_conv",
    "conv2d",
    "dilated_conv2d",
    "conv2d_transpose",
    "depthwise_conv",
    "separable_conv2d",
    "grouped_conv2d",
    "channel_shuffle_inside_group",
]

Params = dict


def leaky_relu(alpha: float = 0.1) -> Callable[[jnp.ndarray], jnp.ndarray]:
    return lambda x: jnp.maximum(alpha * x, x)


def identity(x: jnp.ndarray) -> jnp.ndarray:
    return x


def init_conv(
    key: jax.Array,
    kernel_shape: Sequence[int],
    transpose: bool = False,
    dtype=jnp.float32,
) -> Params:
    """Xavier-uniform weight + zero bias for an HWIO kernel.

    For a transposed conv the kernel layout is HWOI-style
    ``[kh, kw, out, in]`` (TF's conv2d_transpose convention,
    sharedLayers.py:80-87) and the bias size is ``kernel_shape[2]``.
    """
    kh, kw, c0, c1 = kernel_shape
    fan_in = kh * kw * (c1 if transpose else c0)
    fan_out = kh * kw * (c0 if transpose else c1)
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    w = jax.random.uniform(key, tuple(kernel_shape), dtype, -limit, limit)
    b = jnp.zeros((c0 if transpose else c1,), dtype)
    return {"w": w, "b": b}


_DN = ("NHWC", "HWIO", "NHWC")

# Global conv precision. HIGHEST gives fp32-exact results (needed for
# bit-parity with the TF1 reference); on TPU, set to DEFAULT to run the
# MXU in fast bf16x3/bf16 mode via set_conv_precision(). 'bf16'
# additionally stores/loads the conv OPERANDS in bfloat16 (halved HBM
# traffic — batch-1 convs here are bandwidth-bound, not MXU-bound); the
# MXU still accumulates in fp32 internally, only the conv output rounds
# through bf16 before the fp32 bias+activation epilogue. (The output
# cast — rather than preferred_element_type=f32 — keeps the conv VJP
# dtypes consistent: an f32 cotangent against bf16 weights is rejected
# by lax.) 'bf16_act' goes one step further: the bias+activation
# epilogue ALSO computes and stores in bfloat16, so the activation
# tensors flowing BETWEEN convs (the dominant remaining HBM traffic at
# batch 1, docs/ROADMAP.md round-3 item 1) are half-width end-to-end;
# model outputs cast back to fp32 at the disparity heads.
_CONV_PRECISION = jax.lax.Precision.HIGHEST
_CONV_BF16 = False
_CONV_ACT_BF16 = False


def set_conv_precision(p) -> None:
    """Set global conv precision
    ('highest' | 'default' | 'bf16' | 'bf16_act' | Precision)."""
    global _CONV_PRECISION, _CONV_BF16, _CONV_ACT_BF16
    _CONV_BF16 = False
    _CONV_ACT_BF16 = False
    if isinstance(p, str):
        if p in ("bf16", "bf16_act"):
            _CONV_BF16 = True
            _CONV_ACT_BF16 = p == "bf16_act"
            _CONV_PRECISION = jax.lax.Precision.DEFAULT
            return
        p = {"highest": jax.lax.Precision.HIGHEST, "default": jax.lax.Precision.DEFAULT}[p]
    _CONV_PRECISION = p


def _operands(x: jnp.ndarray, w: jnp.ndarray):
    """Conv operand dtype policy (bf16 fast mode vs dtype-following)."""
    if _CONV_BF16:
        return x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
    return x, w.astype(x.dtype)


def _epilogue_dtype(x: jnp.ndarray):
    """dtype of the bias+activation epilogue (and thus the conv output)."""
    return jnp.bfloat16 if _CONV_ACT_BF16 else x.dtype


def conv2d(
    params: Params,
    x: jnp.ndarray,
    strides: int = 1,
    activation: Callable = leaky_relu(0.1),
    padding: str = "SAME",
) -> jnp.ndarray:
    xx, ww = _operands(x, params["w"])
    y = jax.lax.conv_general_dilated(
        xx,
        ww,
        window_strides=(strides, strides),
        padding=padding,
        dimension_numbers=_DN,
        precision=_CONV_PRECISION,
    )
    dt = _epilogue_dtype(x)
    return activation(y.astype(dt) + params["b"].astype(dt))


def dilated_conv2d(
    params: Params,
    x: jnp.ndarray,
    rate: int = 1,
    activation: Callable = leaky_relu(0.1),
    padding: str = "SAME",
) -> jnp.ndarray:
    xx, ww = _operands(x, params["w"])
    y = jax.lax.conv_general_dilated(
        xx,
        ww,
        window_strides=(1, 1),
        padding=padding,
        rhs_dilation=(rate, rate),
        dimension_numbers=_DN,
        precision=_CONV_PRECISION,
    )
    dt = _epilogue_dtype(x)
    return activation(y.astype(dt) + params["b"].astype(dt))


def conv2d_transpose(
    params: Params,
    x: jnp.ndarray,
    strides: int = 2,
    activation: Callable = leaky_relu(0.1),
) -> jnp.ndarray:
    """Transposed conv with TF SAME semantics (output = input * stride).

    Kernel layout ``[kh, kw, out_c, in_c]`` as in TF. Expressed as the
    gradient of a forward conv (what TF's conv2d_transpose is), via
    ``conv_general_dilated`` with lhs dilation.
    """
    kh, kw, c_out, c_in = params["w"].shape
    # TF SAME deconv: out = in*s; equivalent fwd conv pads (k-1)/2 each side.
    pad = ((kh - 1) // 2, kh - 1 - (kh - 1) // 2)
    padw = ((kw - 1) // 2, kw - 1 - (kw - 1) // 2)
    # transpose conv = conv with lhs_dilation, spatially-flipped kernel, IO swap
    w = params["w"].transpose(0, 1, 3, 2)[::-1, ::-1]  # -> HWIO with flip
    xx, w = _operands(x, w)
    y = jax.lax.conv_general_dilated(
        xx,
        w,
        window_strides=(1, 1),
        padding=(
            (kh - 1 - pad[0], kh - 1 - pad[1] + (strides - 1)),
            (kw - 1 - padw[0], kw - 1 - padw[1] + (strides - 1)),
        ),
        lhs_dilation=(strides, strides),
        dimension_numbers=_DN,
        precision=_CONV_PRECISION,
    )
    dt = _epilogue_dtype(x)
    return activation(y.astype(dt) + params["b"].astype(dt))


def depthwise_conv(
    params: Params,
    x: jnp.ndarray,
    strides: int = 1,
    activation: Callable = leaky_relu(0.1),
    padding: str = "SAME",
) -> jnp.ndarray:
    """Depthwise conv; kernel ``[kh, kw, in_c, mult]`` (TF layout)."""
    kh, kw, c_in, mult = params["w"].shape
    w = params["w"].reshape(kh, kw, 1, c_in * mult)
    xx, w = _operands(x, w)
    y = jax.lax.conv_general_dilated(
        xx,
        w,
        window_strides=(strides, strides),
        padding=padding,
        dimension_numbers=_DN,
        feature_group_count=c_in,
        precision=_CONV_PRECISION,
    )
    dt = _epilogue_dtype(x)
    return activation(y.astype(dt) + params["b"].astype(dt))


def separable_conv2d(
    params: Params,
    x: jnp.ndarray,
    strides: int = 1,
    activation: Callable = leaky_relu(0.1),
    padding: str = "SAME",
) -> jnp.ndarray:
    """Depthwise + pointwise, mirroring sharedLayers.py:105-115.

    ``params`` = {'depthwise': {...}, 'pointwise': {...}}. NOTE: the
    reference applies ``strides`` to BOTH convs (a quirk kept for
    parity when strides != 1).
    """
    x = depthwise_conv(
        params["depthwise"], x, strides=strides, activation=leaky_relu(0.1), padding=padding
    )
    return conv2d(
        params["pointwise"], x, strides=strides, activation=activation, padding=padding
    )


def grouped_conv2d(
    params: Params,
    x: jnp.ndarray,
    num_groups: int = 1,
    strides: int = 1,
    activation: Callable = leaky_relu(0.1),
    padding: str = "SAME",
) -> jnp.ndarray:
    """Grouped conv; kernel ``[kh, kw, in_c/groups, out_c]`` (TF layout)."""
    xx, ww = _operands(x, params["w"])
    y = jax.lax.conv_general_dilated(
        xx,
        ww,
        window_strides=(strides, strides),
        padding=padding,
        dimension_numbers=_DN,
        feature_group_count=num_groups,
        precision=_CONV_PRECISION,
    )
    dt = _epilogue_dtype(x)
    return activation(y.astype(dt) + params["b"].astype(dt))


def channel_shuffle_inside_group(x: jnp.ndarray, num_groups: int) -> jnp.ndarray:
    """Channel shuffle (sharedLayers.py:133-139)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, num_groups, c // num_groups)
    x = x.transpose(0, 1, 2, 4, 3)
    return x.reshape(b, h, w, c)
