"""TPU-native real-time self-adaptive deep stereo framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
CVLAB-Unibo/Real-time-self-adaptive-deep-stereo (CVPR 2019 "Real-time
self-adaptive deep stereo" + TPAMI 2021 "Continual adaptation for deep
stereo"): MADNet / DispNet disparity networks, unsupervised online
adaptation (NONE / FULL / MAD modes), proxy-supervised continual
adaptation, offline supervised training, and a live demo runtime.

The compute path is pure JAX (jit / pallas / shard_map over a device
mesh); everything is built around functional pytrees instead of the
reference's TF1 graph+variable-scope machinery.
"""

__version__ = "0.1.0"

from real_time_self_adaptive_deep_stereo_tpu.models import get_stereo_net  # noqa: F401
