"""Helpers to load the upstream TF1 reference (if present on this
machine) under TF2's compat shims, used only for golden parity tests.

The reference lives at /root/reference and is imported as-is — nothing
is copied. Tests using this module skip automatically when the
reference or tensorflow is unavailable.
"""

import os
import sys
import types

REFERENCE_DIR = os.environ.get("STEREO_REFERENCE_DIR", "/root/reference")

_tf1 = None


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


def load_tf1():
    """Return tf.compat.v1 in graph mode with the shims the reference
    code needs (contrib.layers.xavier_initializer, Dimension.value)."""
    global _tf1
    if _tf1 is not None:
        return _tf1
    # oneDNN picks kernel strategies at runtime (thread/cache state), so
    # its summation order — and therefore the reference goldens — can
    # shift between runs under host load; the stereo refinement cascade
    # amplifies that round-off ~10x per scale, which once pushed the
    # converter-closure test past its 2e-4 tolerance in a loaded full
    # suite (passed solo). Pin the oracle to the deterministic kernels.
    os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
    import tensorflow as tf2

    tf1 = tf2.compat.v1
    tf1.disable_eager_execution()
    tf1.disable_v2_tensorshape()
    if not hasattr(tf1, "contrib"):
        contrib = types.ModuleType("contrib")
        layers = types.ModuleType("layers")
        layers.xavier_initializer = lambda: tf1.glorot_uniform_initializer()
        contrib.layers = layers
        tf1.contrib = contrib
    sys.modules["tensorflow"] = tf1
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    _tf1 = tf1
    return tf1


def get_leaf(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def build_reference_net(tf1, model_name, left_ph, right_ph, **extra):
    import Nets  # the reference package

    args = {
        "left_img": left_ph,
        "right_img": right_ph,
        "split_layers": [None],
        "sequence": True,
        "train_portion": "BEGIN",
        "bulkhead": False,
    }
    args.update(extra)
    with tf1.variable_scope("model"):
        return Nets.get_stereo_net(model_name, args)


def build_adaptation_graph(
    tf1,
    model_name,
    shape,
    lr,
    mode,
    block_config=None,
    adaptation="reprojection",
    optimizer="momentum",
):
    """Rebuild the reference's online-adaptation *training step* exactly
    as Stereo_Online_Adaptation.py:54-128 (reprojection) /
    Stereo_Continual_Adaptation.py:54-128 (proxy) do: net (bulkhead iff
    MAD) + full-res loss + train ops (one per MAD block restricted to
    that block's variables, or one FULL op). ``optimizer`` picks
    MomentumOptimizer(lr, 0.9) (online scripts) or AdamOptimizer(lr)
    (the live demo, Demo/demo_model.py:163 — note ONE shared optimizer
    across all block ops, so the beta powers are global).

    Returns (placeholders dict, full_loss, block_losses, train_ops, net).
    """
    from Losses import loss_factory as ref_lf
    from Data_utils import preprocessing as ref_pp

    h, w = shape
    ph = {
        "left": tf1.placeholder(tf1.float32, [1, h, w, 3]),
        "right": tf1.placeholder(tf1.float32, [1, h, w, 3]),
        "target": tf1.placeholder(tf1.float32, [1, h, w, 1]),
    }
    if adaptation == "proxy":
        ph["proxy"] = tf1.placeholder(tf1.float32, [1, h, w, 1])

    net = build_reference_net(
        tf1, model_name, ph["left"], ph["right"], bulkhead=(mode == "MAD")
    )
    predictions = net.get_disparities()

    if adaptation == "reprojection":
        full_loss = ref_lf.get_reprojection_loss("mean_SSIM_l1", reduced=True)(
            predictions, ph
        )
        block_loss_factory = lambda p, inp: ref_lf.get_reprojection_loss(  # noqa: E731
            "mean_SSIM_l1", reduced=True
        )([p], inp)
    else:
        full_loss = ref_lf.get_proxy_loss(
            "mean_l1", max_disp=192, weights=[0.01] * 10, reduced=True
        )(predictions, ph)
        block_loss_factory = lambda p, inp: ref_lf.get_proxy_loss(  # noqa: E731
            "mean_l1", max_disp=192, weights=[0.1] * 10, reduced=True
        )([p], inp)

    if optimizer == "adam":
        trainer = tf1.train.AdamOptimizer(lr)
    else:
        trainer = tf1.train.MomentumOptimizer(lr, 0.9)
    block_losses, train_ops = [], []
    if mode == "MAD":
        scale_preds = predictions[:-1]
        assert len(scale_preds) == len(block_config)
        for counter, p in enumerate(scale_preds):
            multiplier = tf1.cast(
                tf1.shape(ph["left"])[1] // tf1.shape(p)[1], tf1.float32
            )
            p = ref_pp.resize_to_prediction(p, ph["left"]) * multiplier
            loss_k = block_loss_factory(p, ph)
            var_acc = []
            for name in block_config[counter]:
                var_acc += net.get_variables(name)
            block_losses.append(loss_k)
            train_ops.append(trainer.minimize(loss_k, var_list=var_acc))
    else:
        train_ops.append(trainer.minimize(full_loss))
    return ph, full_loss, block_losses, train_ops, net


def build_supervised_train_graph(tf1, model_name, shape, lr, loss_type="mean_l1"):
    """Rebuild Train.py's supervised training step (Train.py:54-102):
    net + multi-scale supervised loss (max_disp=192) + AdamOptimizer on
    the RAW lr (the decayed-lr tensor is computed but unused,
    Train.py:94-95). Returns (placeholders, loss, train_op, net)."""
    from Losses import loss_factory as ref_lf

    h, w = shape
    ph = {
        "left": tf1.placeholder(tf1.float32, [1, h, w, 3]),
        "right": tf1.placeholder(tf1.float32, [1, h, w, 3]),
        "target": tf1.placeholder(tf1.float32, [1, h, w, 1]),
    }
    net = build_reference_net(tf1, model_name, ph["left"], ph["right"])
    predictions = net.get_disparities()
    loss = ref_lf.get_supervised_loss(
        loss_type, multiScale=True, logs=False, weights=None, max_disp=192
    )(predictions, ph)
    train_op = tf1.train.AdamOptimizer(lr).minimize(loss)
    return ph, loss, train_op, net


def assign_params_ops(tf1, net_params, name_map):
    """Assignment ops setting every reference model variable from our
    param pytree (asserting full coverage, as the forward parity test)."""
    import numpy as np

    gvars = [
        v
        for v in tf1.get_collection(tf1.GraphKeys.TRAINABLE_VARIABLES)
        if v.name[:-2] in name_map
    ]
    all_model = [
        v
        for v in tf1.get_collection(tf1.GraphKeys.TRAINABLE_VARIABLES)
        if v.name.startswith("model/")
    ]
    assert len(gvars) == len(all_model), "name map does not cover all model vars"
    return gvars, [
        tf1.assign(v, np.asarray(get_leaf(net_params, name_map[v.name[:-2]])))
        for v in gvars
    ]
