"""Model factory (reference ``Nets/__init__.py:4-13``)."""

from real_time_self_adaptive_deep_stereo_tpu.models.dispnet import DispNet
from real_time_self_adaptive_deep_stereo_tpu.models.madnet import MADNet

STEREO_FACTORY = {
    "MADNet": MADNet,
    "Dispnet": DispNet,
}


def get_stereo_net(name: str, **kwargs):
    """Instantiate a stereo model by name ('MADNet' or 'Dispnet')."""
    if name not in STEREO_FACTORY:
        raise KeyError(f"Unrecognized network name {name!r}; choose from {list(STEREO_FACTORY)}")
    return STEREO_FACTORY[name](**kwargs)


__all__ = ["STEREO_FACTORY", "get_stereo_net", "MADNet", "DispNet"]
