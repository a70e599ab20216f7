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
