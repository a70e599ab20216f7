"""MADNet — Modularly ADaptable stereo network, TPU-native.

Re-design of reference ``Nets/MadNet.py`` (CVPR 2019). Architecture
reproduced exactly:

* 6-scale siamese pyramid encoder conv1..conv12 (stride 2 on odd convs,
  widths 16,16,32,32,64,64,96,96,128,128,192,192 — MadNet.py:173-249),
  leaky-relu(0.2) activations (MadNet.py:366-367).
* Per scale k=6..2: 1-D correlation cost volume over ±radius_d
  (MadNet.py:370-375), concat with left features, a 6-conv disparity
  estimator 128-128-96-64-32-1 (MadNet.py:73-120), horizontal warping of
  right features by the upsampled coarser disparity (MadNet.py:400-436),
  and the upsample chain ``u_{k-1} = resize(V_k) * 20 / scale_{k-1}``
  (MadNet.py:274).
* Optional dilated context network (rates 1,2,4,8,16,1,1; residual —
  MadNet.py:122-171).
* Disparity convention: internal predictions are negative; full-res
  outputs are ``relu(-20 * V)`` resized to the padded input and centre
  cropped back (MadNet.py:68-71,362-364). Inputs are REFLECT-padded to
  a multiple of 64 (MadNet.py:60-66).
* ``bulkhead=True`` stops gradients between scales (MadNet.py:275-276),
  making the MAD blocks gradient-isolated.

TPU-first departures from the reference: the network is a pure function
over a nested param pytree whose top-level keys *are* the MAD module
boundaries (pyramid / estimator_k / context), so per-block adaptation
falls out of ``jax.grad`` on a subtree instead of TF variable-scope
bookkeeping. All shapes are static; the whole forward jits into one XLA
program.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from real_time_self_adaptive_deep_stereo_tpu.ops import (
    conv2d,
    correlation,
    crop_or_pad,
    dilated_conv2d,
    init_conv,
    pad_image,
    padded_shape,
    resize_bilinear,
    warp_features_horizontal,
)
from real_time_self_adaptive_deep_stereo_tpu.ops.warp import (
    resolve_warp_mode,
    warp_features_horizontal_shift,
    warp_features_onehot,
)
from real_time_self_adaptive_deep_stereo_tpu.ops.conv import leaky_relu

__all__ = ["MADNet"]

_act = leaky_relu(0.2)
_linear = lambda x: x  # noqa: E731

# (stride, in_c, out_c) for pyramid conv1..conv12 (MadNet.py:179-249)
_PYRAMID_SPEC = [
    (2, 3, 16),
    (1, 16, 16),
    (2, 16, 32),
    (1, 32, 32),
    (2, 32, 64),
    (1, 64, 64),
    (2, 64, 96),
    (1, 96, 96),
    (2, 96, 128),
    (1, 128, 128),
    (2, 128, 192),
    (1, 192, 192),
]

# scale k -> (pyramid level index [1..6], feature channels, downscale factor)
_SCALE_FEATS = {6: (6, 192, 64), 5: (5, 128, 32), 4: (4, 96, 16), 3: (3, 64, 8), 2: (2, 32, 4)}

_EST_WIDTHS = [128, 128, 96, 64, 32, 1]
_CTX_RATES = [1, 2, 4, 8, 16, 1, 1]
_CTX_WIDTHS = [128, 128, 128, 96, 64, 32, 1]


class MADNet:
    """Functional MADNet. Hyper-params are static; weights live in a pytree."""

    name = "MADNet"

    def __init__(
        self,
        warping: bool = True,
        context_net: bool = True,
        radius_d: int = 2,
        stride: int = 1,
        bulkhead: bool = False,
        corr_mode: str = "auto",
        warp_mode: str = "auto",
        warp_max_disp: int = 192,
    ):
        self.warping = warping
        self.context_net = context_net
        self.radius_d = radius_d
        self.stride = stride
        self.bulkhead = bulkhead
        self.corr_mode = corr_mode
        # 'gather' = exact reference sampling; 'shift' = TPU fast path
        # (identical for |offset| <= warp_max_disp/scale, see ops/warp.py)
        self.warp_mode = warp_mode
        self.warp_max_disp = warp_max_disp

    # ------------------------------------------------------------------ init
    def init(self, key: jax.Array, dtype=jnp.float32) -> Dict:
        """Initialise the parameter pytree (Xavier weights, zero biases)."""
        n_corr = len(range(-self.radius_d, self.radius_d + 1, self.stride))
        # NOTE: per-layer keys come from fold_in on a host-side counter.
        # Never iterate/index a split-key device array here: materialising
        # device rows on host triggers a device->host sync, and on some
        # runtimes (axon tunnel) the first sync permanently degrades
        # dispatch latency for the whole process.
        counter = iter(range(1 << 20))
        keys = (jax.random.fold_in(key, i) for i in counter)
        params: Dict = {"pyramid": {}}
        for i, (s, cin, cout) in enumerate(_PYRAMID_SPEC, start=1):
            params["pyramid"][f"conv{i}"] = init_conv(next(keys), (3, 3, cin, cout), dtype=dtype)
        for k in (6, 5, 4, 3, 2):
            _, feat_c, _ = _SCALE_FEATS[k]
            cin = feat_c + n_corr + (0 if k == 6 else 1)
            est = {}
            prev = cin
            for j, width in enumerate(_EST_WIDTHS, start=1):
                est[f"disp{j}"] = init_conv(next(keys), (3, 3, prev, width), dtype=dtype)
                prev = width
            params[f"estimator_{k}"] = est
        if self.context_net:
            ctx = {}
            prev = _SCALE_FEATS[2][1] + 1  # left feats at scale 2 + disparity
            for j, width in enumerate(_CTX_WIDTHS, start=1):
                ctx[f"context{j}"] = init_conv(next(keys), (3, 3, prev, width), dtype=dtype)
                prev = width
            params["context"] = ctx
        return params

    # --------------------------------------------------------------- forward
    def _pyramid(self, params: Dict, img: jnp.ndarray) -> List[jnp.ndarray]:
        """Returns features after conv2, conv4, ..., conv12 (levels 1..6)."""
        x = img
        feats = []
        for i, (s, _, _) in enumerate(_PYRAMID_SPEC, start=1):
            x = conv2d(params[f"conv{i}"], x, strides=s, activation=_act)
            if i % 2 == 0:
                feats.append(x)
        return feats

    def _estimator(self, params: Dict, volume: jnp.ndarray) -> jnp.ndarray:
        x = volume
        for j in range(1, 7):
            act = _linear if j == 6 else _act
            x = conv2d(params[f"disp{j}"], x, activation=act)
        return x

    def _context(self, params: Dict, feats: jnp.ndarray, disp: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([feats, disp], axis=-1)
        for j, rate in enumerate(_CTX_RATES, start=1):
            act = _linear if j == 7 else _act
            x = dilated_conv2d(params[f"context{j}"], x, rate=rate, activation=act)
        return disp + x

    def _make_disp(self, v: jnp.ndarray, hp: int, wp: int, h: int, w: int) -> jnp.ndarray:
        """relu(-20*V) upsampled to padded res, cropped back (MadNet.py:68-71).

        Always emits fp32: under the 'bf16_act' conv mode the internal
        activations are bfloat16, but the disparity heads (loss/metric
        inputs) stay full precision."""
        d = resize_bilinear(jax.nn.relu(v.astype(jnp.float32) * -20.0), hp, wp)
        return crop_or_pad(d, h, w)

    def extract_features(
        self, params: Dict, left: jnp.ndarray, right: jnp.ndarray
    ) -> Dict:
        """Stage 1 of the split forward: siamese pyramid features.

        The TPU-native equivalent of the reference's split/placeholder
        machinery (Stereo_net.py:81-97, unused split_layers support):
        lets a serving pipeline run feature extraction and disparity
        estimation as separate programs (e.g. on different devices)."""
        li = pad_image(left.astype(jnp.float32), 64)
        ri = pad_image(right.astype(jnp.float32), 64)
        # siamese pyramid as ONE batched conv stack (B=2B): halves the
        # conv dispatch count; mathematically identical per sample
        b = li.shape[0]
        feats = self._pyramid(params["pyramid"], jnp.concatenate([li, ri], axis=0))
        return {
            "lfeats": [f[:b] for f in feats],
            "rfeats": [f[b:] for f in feats],
            "orig_hw": (left.shape[1], left.shape[2]),
        }

    def estimate_from_features(self, params: Dict, feats: Dict) -> Dict:
        """Stage 2 of the split forward: cost volumes + estimators +
        context net, producing the disparity pyramid."""
        h, w = feats["orig_hw"]
        hp, wp = padded_shape(h, w, 64)
        lfeats, rfeats = feats["lfeats"], feats["rfeats"]

        disparities: List[jnp.ndarray] = []
        v_prev: Optional[jnp.ndarray] = None
        u: Optional[jnp.ndarray] = None
        last_left = None
        v = None
        for k in (6, 5, 4, 3, 2):
            lvl, _, factor = _SCALE_FEATS[k]
            lf = lfeats[lvl - 1]
            rf = rfeats[lvl - 1]
            if k < 6:
                # upsample chain: u_k = resize(V_{k+1}) * 20 / scale_k
                u = resize_bilinear(v_prev, hp // factor, wp // factor) * (20.0 / factor)
                if self.bulkhead:
                    u = jax.lax.stop_gradient(u)
                if self.warping:
                    wmode = resolve_warp_mode(self.warp_mode)
                    bound = -(-self.warp_max_disp // factor)  # ceil
                    if wmode == "onehot":
                        rf = warp_features_onehot(rf, u, bound, 4)
                    elif wmode == "mxu":
                        from real_time_self_adaptive_deep_stereo_tpu.ops.warp_pallas import (
                            warp_features_mxu,
                        )

                        rf = warp_features_mxu(rf, u, bound, 4)
                    elif wmode == "pallas":
                        from real_time_self_adaptive_deep_stereo_tpu.ops.warp_pallas import (
                            warp_features_pallas,
                        )

                        rf = warp_features_pallas(rf, u, bound, 4)
                    elif wmode == "shift":
                        rf = warp_features_horizontal_shift(
                            rf, u, max_neg=bound, max_pos=4
                        )
                    else:
                        rf = warp_features_horizontal(rf, u)
                    # warping computes sub-pixel weights from the fp32
                    # disparity chain and may promote; the cost volume
                    # stays in the feature dtype (bf16 under 'bf16_act'
                    # — the DEFAULT-precision convs would cast their
                    # operands to bf16 anyway, so this loses nothing)
                    rf = rf.astype(lf.dtype)
            corr = correlation(lf, rf, self.radius_d, self.stride, mode=self.corr_mode)
            volume = jnp.concatenate([lf, corr.astype(lf.dtype)], axis=-1)
            if u is not None:
                volume = jnp.concatenate([volume, u.astype(lf.dtype)], axis=-1)
            v = self._estimator(params[f"estimator_{k}"], volume)
            if k > 2:
                disparities.append(self._make_disp(v, hp, wp, h, w))
            v_prev = v
            last_left = lf

        if self.context_net:
            v = self._context(params["context"], last_left, v)
        disparities.append(self._make_disp(v, hp, wp, h, w))

        rescaled = jax.nn.relu(resize_bilinear(v.astype(jnp.float32), hp, wp) * -20.0)
        full_res = crop_or_pad(rescaled, h, w)
        disparities.append(full_res)
        return {"disparities": disparities, "full_res_disp": full_res}

    def forward(
        self, params: Dict, left: jnp.ndarray, right: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        """Run MADNet on raw uint8-range images (NHWC, 0..255 floats).

        Returns dict with ``disparities`` (list, coarse->fine, all at
        input resolution, positive) and ``full_res_disp``.
        """
        feats = self.extract_features(params, left, right)
        return self.estimate_from_features(params, feats)

    # --------------------------------------------------------------- mapping
    @staticmethod
    def layer_to_path(layer_name: str) -> Optional[Tuple[str, str]]:
        """Map a reference layer name (as used in block_config JSONs) to a
        param-pytree path. Names follow ``Nets/MadNet.py`` layer registry:
        'left/convN' / 'right/convN' (shared pyramid),
        'fgc-volume-filtering-K/dispJ', 'contextJ'.
        Returns None for layers that own no parameters.
        """
        if layer_name.startswith(("left/conv", "right/conv")):
            return ("pyramid", layer_name.split("/")[1])
        if layer_name.startswith("fgc-volume-filtering-"):
            scope, disp = layer_name.split("/")
            k = scope.rsplit("-", 1)[1]
            return (f"estimator_{k}", disp)
        if layer_name.startswith("context"):
            return ("context", layer_name)
        return None

    # TF1 checkpoint variable name for each param leaf (for the converter).
    def tf_name_map(self) -> Dict[str, Tuple]:
        """Returns {tf_variable_name: (pytree path tuple)} for MADNet as
        built by the reference scripts under scope 'model'
        (MadNet.py variable scopes; conv biases are named 'biases')."""
        m: Dict[str, Tuple] = {}
        for i in range(1, 13):
            base = f"model/gc-read-pyramid/conv{i}"
            m[f"{base}/weights"] = ("pyramid", f"conv{i}", "w")
            m[f"{base}/biases"] = ("pyramid", f"conv{i}", "b")
        for k in (6, 5, 4, 3, 2):
            for j in range(1, 7):
                base = f"model/G{k}/fgc-volume-filtering-{k}/disp-{j}"
                m[f"{base}/weights"] = (f"estimator_{k}", f"disp{j}", "w")
                m[f"{base}/biases"] = (f"estimator_{k}", f"disp{j}", "b")
        if self.context_net:
            for j in range(1, 8):
                m[f"model/context-{j}/weights"] = ("context", f"context{j}", "w")
                m[f"model/context-{j}/biases"] = ("context", f"context{j}", "b")
        return m

    @property
    def num_adaptable_predictions(self) -> int:
        """Number of scale predictions usable as MAD blocks (excludes the
        final full-res duplicate), = len(disparities) - 1."""
        return 5
