"""Visualisation / serialisation helpers.

``colorize_disparity`` maps a disparity map through a matplotlib
colormap (reference ``preprocessing.colorize_img``,
Data_utils/preprocessing.py:91-117) for logging; ``save_disparity_png``
writes the 16-bit ``disparity * 256`` PNGs the reference emits
(Stereo_Online_Adaptation.py:246-251).
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["colorize_disparity", "save_disparity_png"]


def colorize_disparity(
    disp: np.ndarray, vmin=None, vmax=None, cmap: str = "jet"
) -> np.ndarray:
    """[H,W] or [H,W,1] disparity -> [H,W,3] float RGB in 0..1."""
    from matplotlib import cm

    d = np.asarray(disp, np.float32)
    if d.ndim == 3:
        d = d[..., 0]
    d = np.nan_to_num(d)  # early-adaptation frames can carry inf/NaN
    vmin = d.min() if vmin is None else vmin
    vmax = d.max() if vmax is None else vmax
    norm = np.clip((d - vmin) / max(vmax - vmin, 1e-12), 0, 1)
    colors = cm.get_cmap(cmap)(np.arange(256))[:, :3]
    idx = np.round(norm * 255).astype(np.int32)
    return colors[idx]


def save_disparity_png(path: str, disp: np.ndarray, max_disp: float = 256.0) -> None:
    """Save 16-bit PNG of clip(disp, 0, max_disp) * 256."""
    d = np.asarray(disp, np.float32)
    if d.ndim == 3:
        d = d[..., 0]
    # 16-bit KITTI encoding has no NaN; encode non-finite pixels as 0
    # (the KITTI "invalid" value) rather than tripping the uint16 cast
    d = np.nan_to_num(d, nan=0.0, posinf=max_disp, neginf=0.0)
    to_save = (np.clip(d, 0, max_disp) * 256.0).astype(np.uint16)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    try:
        import cv2

        cv2.imwrite(path, to_save)
    except ImportError:  # pragma: no cover
        import imageio.v2 as imageio

        imageio.imwrite(path, to_save)
