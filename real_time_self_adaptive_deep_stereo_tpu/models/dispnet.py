"""DispNet-Corr1D — classic encoder/decoder stereo network, TPU-native.

Re-design of reference ``Nets/DispNet.py``. Architecture reproduced
exactly:

* Input normalisation ``x/255 - 100/255`` and REFLECT pad to /64
  (DispNet.py:59-73).
* Corr variant: siamese conv1 (7x7 s2, 64) / conv2 (5x5 s2, 128),
  ``conv_redir`` 1x1->64, 1-D correlation with max_disp=40 (81
  channels), conv3 (5x5 s2, 256) on [corr, redir] (DispNet.py:75-93).
  No-corr variant: concatenated images through conv1..conv3.
* Encoder conv3/1..conv6/1 up to 1024 channels (DispNet.py:104-117).
* Decoder: five upsampling blocks (deconv 4x4 s2 + 3x3 linear
  ``predict`` + 4x4 s2 linear ``up_predict`` + linear 3x3 ``concat``
  merge with the skip — DispNet.py:45-57), each emitting an
  intermediate disparity; final 3x3 ``prediction`` and a full-res
  rescale x2 (DispNet.py:142-152).
* Intermediate disparities are ``relu(pred * width_ratio)`` resized to
  the padded input then centre-cropped (DispNet.py:39-43); activations
  are the library default leaky-relu(0.1) except the linear
  predict/up_predict/concat/prediction layers.

Weights default to leaky-relu(0.1) convs with Xavier init, as the
reference uses ``sharedLayers`` defaults throughout.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from real_time_self_adaptive_deep_stereo_tpu.ops import (
    conv2d,
    conv2d_transpose,
    correlation,
    crop_or_pad,
    init_conv,
    pad_image,
    padded_shape,
    resize_bilinear,
)

__all__ = ["DispNet"]

MAX_DISP = 40

_linear = lambda x: x  # noqa: E731

# upsampling blocks: (name, in_c, out_c, skip_c)
_UP_BLOCKS = [
    ("up5", 1024, 512, 512),
    ("up4", 512, 256, 512),
    ("up3", 256, 128, 256),
    ("up2", 128, 64, 128),
    ("up1", 64, 32, 64),
]


class DispNet:
    name = "Dispnet"

    def __init__(self, correlation: bool = True, corr_mode: str = "auto"):
        self.correlation = correlation
        self.corr_mode = corr_mode

    # ------------------------------------------------------------------ init
    def init(self, key: jax.Array, dtype=jnp.float32) -> Dict:
        # fold_in-derived keys (see MADNet.init for why we never iterate
        # a split-key device array)
        keys = (jax.random.fold_in(key, i) for i in range(1 << 20)).__iter__()
        p: Dict = {}
        if self.correlation:
            p["conv1"] = init_conv(next(keys), (7, 7, 3, 64), dtype=dtype)
            p["conv2"] = init_conv(next(keys), (5, 5, 64, 128), dtype=dtype)
            p["conv_redir"] = init_conv(next(keys), (1, 1, 128, 64), dtype=dtype)
            p["conv3"] = init_conv(next(keys), (5, 5, 2 * MAX_DISP + 1 + 64, 256), dtype=dtype)
        else:
            p["conv1"] = init_conv(next(keys), (7, 7, 6, 64), dtype=dtype)
            p["conv2"] = init_conv(next(keys), (5, 5, 64, 128), dtype=dtype)
            p["conv3"] = init_conv(next(keys), (5, 5, 128, 256), dtype=dtype)
        p["conv3_1"] = init_conv(next(keys), (3, 3, 256, 256), dtype=dtype)
        p["conv4"] = init_conv(next(keys), (3, 3, 256, 512), dtype=dtype)
        p["conv4_1"] = init_conv(next(keys), (3, 3, 512, 512), dtype=dtype)
        p["conv5"] = init_conv(next(keys), (3, 3, 512, 512), dtype=dtype)
        p["conv5_1"] = init_conv(next(keys), (3, 3, 512, 512), dtype=dtype)
        p["conv6"] = init_conv(next(keys), (3, 3, 512, 1024), dtype=dtype)
        p["conv6_1"] = init_conv(next(keys), (3, 3, 1024, 1024), dtype=dtype)
        for name, cin, cout, skip in _UP_BLOCKS:
            p[name] = {
                "deconv": init_conv(next(keys), (4, 4, cout, cin), transpose=True, dtype=dtype),
                "predict": init_conv(next(keys), (3, 3, cin, 1), dtype=dtype),
                "up_predict": init_conv(next(keys), (4, 4, 1, 1), transpose=True, dtype=dtype),
                "concat": init_conv(next(keys), (3, 3, cout + skip + 1, cout), dtype=dtype),
            }
        p["prediction"] = init_conv(next(keys), (3, 3, 32, 1), dtype=dtype)
        return p

    # --------------------------------------------------------------- forward
    def _make_disp(self, op: jnp.ndarray, hp: int, wp: int, h: int, w: int) -> jnp.ndarray:
        scale = wp / op.shape[2]
        d = resize_bilinear(jax.nn.relu(op * scale), hp, wp)
        return crop_or_pad(d, h, w)

    def _up_block(self, p: Dict, bottom: jnp.ndarray, skip: jnp.ndarray):
        deconv = conv2d_transpose(p["deconv"], bottom, strides=2)
        predict = conv2d(p["predict"], bottom, activation=_linear)
        up_predict = conv2d_transpose(p["up_predict"], predict, strides=2, activation=_linear)
        merged = jnp.concatenate([skip, deconv, up_predict], axis=-1)
        out = conv2d(p["concat"], merged, activation=_linear)
        return out, predict

    def extract_features(
        self, params: Dict, left: jnp.ndarray, right: jnp.ndarray
    ) -> Dict:
        """Stage 1 of the split forward: siamese feature extraction up to
        the correlation inputs. TPU equivalent of the reference's
        split/placeholder machinery (Stereo_net.py:81-97) — lets a
        serving pipeline cut the graph after the shared encoders."""
        b, h, w, _ = left.shape
        li = pad_image(left.astype(jnp.float32) / 255.0 - 100.0 / 255.0, 64)
        ri = pad_image(right.astype(jnp.float32) / 255.0 - 100.0 / 255.0, 64)
        feats: Dict = {"orig_hw": (h, w)}
        if self.correlation:
            # siamese conv1/conv2 as ONE batched stack (B=2B), same as
            # MADNet's pyramid: halves the dispatch count of the most
            # HBM-bound convs (7x7/5x5 on the largest activations);
            # mathematically identical per sample
            c1 = conv2d(params["conv1"], jnp.concatenate([li, ri], axis=0), strides=2)
            c2 = conv2d(params["conv2"], c1, strides=2)
            feats.update({"c1a": c1[:b], "c2a": c2[:b], "c2b": c2[b:]})
        else:
            c1 = conv2d(params["conv1"], jnp.concatenate([li, ri], axis=-1), strides=2)
            c2 = conv2d(params["conv2"], c1, strides=2)
            feats.update({"c1": c1, "c2": c2})
        return feats

    def estimate_from_features(self, params: Dict, feats: Dict) -> Dict:
        """Stage 2 of the split forward: correlation + encoder tail +
        decoder, producing the disparity pyramid."""
        h, w = feats["orig_hw"]
        hp, wp = padded_shape(h, w, 64)

        disparities: List[jnp.ndarray] = []
        if self.correlation:
            c1a, c2a, c2b = feats["c1a"], feats["c2a"], feats["c2b"]
            redir = conv2d(params["conv_redir"], c2a)
            corr = correlation(c2a, c2b, MAX_DISP, mode=self.corr_mode)
            c3 = conv2d(params["conv3"], jnp.concatenate([corr, redir], axis=-1), strides=2)
            skip2, skip1 = c2a, c1a
        else:
            c1, c2 = feats["c1"], feats["c2"]
            c3 = conv2d(params["conv3"], c2, strides=2)
            skip2, skip1 = c2, c1

        c3_1 = conv2d(params["conv3_1"], c3)
        c4 = conv2d(params["conv4"], c3_1, strides=2)
        c4_1 = conv2d(params["conv4_1"], c4)
        c5 = conv2d(params["conv5"], c4_1, strides=2)
        c5_1 = conv2d(params["conv5_1"], c5)
        c6 = conv2d(params["conv6"], c5_1, strides=2)
        c6_1 = conv2d(params["conv6_1"], c6)

        x = c6_1
        skips = [c5_1, c4_1, c3_1, skip2, skip1]
        for (name, *_), skip in zip(_UP_BLOCKS, skips):
            x, predict = self._up_block(params[name], x, skip)
            disparities.append(self._make_disp(predict, hp, wp, h, w))

        prediction = conv2d(params["prediction"], x, activation=_linear)
        disparities.append(self._make_disp(prediction, hp, wp, h, w))

        rescaled = resize_bilinear(prediction, hp, wp) * 2.0
        full_res = crop_or_pad(rescaled, h, w)
        disparities.append(full_res)
        return {"disparities": disparities, "full_res_disp": full_res}

    def forward(self, params: Dict, left: jnp.ndarray, right: jnp.ndarray) -> Dict:
        feats = self.extract_features(params, left, right)
        return self.estimate_from_features(params, feats)

    # --------------------------------------------------------------- mapping
    @staticmethod
    def layer_to_path(layer_name: str) -> Optional[Tuple[str, ...]]:
        """Map reference layer names (block_config/dispnet_full.json) to
        param paths. 'conv1a'/'conv1b' share 'conv1'; 'convN/1' maps to
        'convN_1'; 'upK/<part>' maps into the block dict."""
        if layer_name in ("conv1a", "conv1b"):
            return ("conv1",)
        if layer_name in ("conv2a", "conv2b"):
            return ("conv2",)
        if "/" in layer_name:
            head, tail = layer_name.split("/", 1)
            if head.startswith("up"):
                return (head, tail)
            if tail == "1":
                return (f"{head}_1",)
        if layer_name in ("conv_redir", "prediction", "corr"):
            return None if layer_name == "corr" else (layer_name,)
        return (layer_name,)

    def tf_name_map(self) -> Dict[str, Tuple]:
        """{tf_variable_name: pytree path} for DispNet under scope 'model'
        (sharedLayers default bias name 'bias', DispNet.py layer names)."""
        m: Dict[str, Tuple] = {}

        def add(scope: str, *path: str):
            m[f"model/{scope}/weights"] = (*path, "w")
            m[f"model/{scope}/bias"] = (*path, "b")

        add("conv1", "conv1")
        add("conv2", "conv2")
        if self.correlation:
            add("conv_redir", "conv_redir")
        add("conv3", "conv3")
        for n in ("3", "4", "5", "6"):
            add(f"conv{n}/1", f"conv{n}_1")
            if n != "3":
                add(f"conv{n}", f"conv{n}")
        for name, *_ in _UP_BLOCKS:
            for part in ("deconv", "predict", "up_predict", "concat"):
                add(f"{name}/{part}", name, part)
        add("prediction", "prediction")
        return m

    @property
    def num_adaptable_predictions(self) -> int:
        return 6
