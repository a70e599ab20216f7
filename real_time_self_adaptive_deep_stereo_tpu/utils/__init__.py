from real_time_self_adaptive_deep_stereo_tpu.utils import checkpoint, optim  # noqa: F401
