"""Build the real-imagery parity fixture: rectified stereo pairs at the
reference's KITTI operating resolution (320x1216, README.MD:46-63 /
Stereo_Online_Adaptation.py:307) from REAL photographs bundled with
permissive licenses on this machine (zero-egress environment):

* matplotlib ``grace_hopper.jpg``  — U.S. public domain portrait
* sklearn ``china.jpg``/``flower.jpg`` — CC-BY sample photos

Each 320x1216 left view is a mosaic of photo crops (photographic
texture/edge/noise statistics — the thing the synthetic gradient scenes
lack, VERDICT r3 missing #2). The right view is synthesized by
occlusion-aware inverse warping against a KITTI-like disparity layout
(ground plane + mid-range objects, 3..90 px), and the left-view ground
truth comes from forward-splatting that field with a z-buffer (nearest
surface wins), leaving genuinely occluded pixels INVALID (0) — the same
sparse-GT semantics KITTI evaluation masks on (gt > 0).

Artifacts (checked in, ~1 MB total):
    tests/fixtures/realworld/{name}_left.png   8-bit RGB
    tests/fixtures/realworld/{name}_right.png  8-bit RGB
    tests/fixtures/realworld/{name}_gt.png     16-bit PNG, disparity*256
                                               (KITTI format — exercises
                                               the /256 reader path,
                                               data/readers.py)

v2 (round-5): each scene{i} also gets an ``asym{i}`` sibling — SAME left
view and ground truth, but the right view carries per-camera photometric
nuisance (independent gain/white-balance/gamma, vignette mismatch,
independent sensor noise, and a sub-pixel vertical rectification error).
A warped-left right view is photometrically perfect by construction,
which silently flatters the unsupervised reprojection loss
(Data_utils/preprocessing.py:201-230 in the reference) — the asym scenes
are what make the loss face the realities of a stereo rig: the left
pixel a disparity points at no longer has the same intensity as the
right pixel, and a fraction of epipolar lines are slightly wrong.

Deterministic (seeded); regenerate with `python tools/realworld_fixture.py`.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 320, 1216
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "realworld",
)

PHOTOS = [
    os.path.join(
        os.path.dirname(__import__("matplotlib").__file__),
        "mpl-data",
        "sample_data",
        "grace_hopper.jpg",
    ),
    os.path.join(
        os.path.dirname(__import__("sklearn").__file__),
        "datasets",
        "images",
        "china.jpg",
    ),
    os.path.join(
        os.path.dirname(__import__("sklearn").__file__),
        "datasets",
        "images",
        "flower.jpg",
    ),
]


def load_photos():
    from PIL import Image

    return [np.asarray(Image.open(p).convert("RGB"), dtype=np.float32) for p in PHOTOS]


def mosaic_left(photos, rng) -> np.ndarray:
    """Tile random crops of the real photos into one 320x1216 canvas."""
    out = np.zeros((H, W, 3), np.float32)
    x = 0
    i = 0
    while x < W:
        img = photos[i % len(photos)]
        ph, pw = img.shape[:2]
        tw = int(rng.integers(220, 420))
        tw = min(tw, W - x)
        sy = int(rng.integers(0, max(1, ph - H))) if ph > H else 0
        sx = int(rng.integers(0, max(1, pw - tw))) if pw > tw else 0
        crop = img[sy : sy + H, sx : sx + tw]
        if crop.shape[0] < H or crop.shape[1] < tw:  # photo smaller than tile
            crop = np.tile(crop, (int(np.ceil(H / crop.shape[0])), int(np.ceil(tw / crop.shape[1])), 1))[:H, :tw]
        out[:, x : x + tw] = crop
        x += tw
        i += 1
    return out


def kitti_like_disparity(rng) -> np.ndarray:
    """Right-view disparity field: ground plane rising toward the bottom,
    a far band on top, and 3-5 frontal rectangles at mid disparities."""
    y = np.linspace(0.0, 1.0, H)[:, None]
    d = 4.0 + 66.0 * np.maximum(0.0, (y - 0.35) / 0.65) ** 1.2  # ground plane
    d = np.broadcast_to(d, (H, W)).copy()
    d[: int(0.35 * H)] = 3.0 + 3.0 * rng.random()  # far band / sky
    for _ in range(int(rng.integers(3, 6))):  # mid-range objects
        oh = int(rng.integers(60, 180))
        ow = int(rng.integers(90, 260))
        oy = int(rng.integers(20, H - oh - 10))
        ox = int(rng.integers(10, W - ow - 10))
        od = float(rng.uniform(25.0, 90.0))
        slant = np.linspace(-2.0, 2.0, ow)[None, :]
        region = d[oy : oy + oh, ox : ox + ow]
        d[oy : oy + oh, ox : ox + ow] = np.maximum(region, od + slant)
    return d.astype(np.float32)


def synthesize_pair(left_tex, d_right):
    """right[y,xr] = left[y, xr + d_right] (bilinear); left-view GT by
    forward splat of d_right with a z-buffer; occluded -> invalid (0)."""
    xs = np.arange(W, dtype=np.float32)[None, :] + d_right
    x0 = np.floor(xs).astype(np.int64)
    frac = (xs - x0)[..., None]
    x0c = np.clip(x0, 0, W - 1)
    x1c = np.clip(x0 + 1, 0, W - 1)
    rows = np.arange(H)[:, None]
    right = left_tex[rows, x0c] * (1 - frac) + left_tex[rows, x1c] * frac
    oob = (xs < 0) | (xs > W - 1)
    right[oob] = 0.0

    gt = np.zeros((H, W), np.float32)  # left-view disparity, 0 = invalid
    xl = np.rint(xs).astype(np.int64)
    valid = ~oob
    for yy in range(H):
        cols = xl[yy][valid[yy]]
        vals = d_right[yy][valid[yy]]
        # z-buffer: nearest surface (max disparity) wins where several
        # right pixels splat onto one left pixel
        np.maximum.at(gt[yy], cols, vals)
    return right, gt


def apply_photometric_asymmetry(right: np.ndarray, rng) -> tuple:
    """Per-camera nuisance for the right view, modelled on what breaks
    the photometric-consistency assumption on a real rig (exposure/gain
    differences, lens vignetting mismatch, sensor noise, imperfect
    rectification). All magnitudes are in the range calibration surveys
    report for consumer stereo rigs — strong enough to move the
    reprojection loss, weak enough that adaptation must still work.

    Returns (nuisanced right uint8-range float array, description str).
    """
    h, w = right.shape[:2]
    x = right.astype(np.float64) / 255.0

    # exposure/gain difference + per-channel white balance mismatch
    gain = float(rng.uniform(0.90, 1.10))
    wb = rng.uniform(0.97, 1.03, size=3)
    # radiometric response (gamma) difference between the two sensors
    gamma = float(rng.uniform(0.92, 1.08))
    x = np.clip(x, 0.0, 1.0) ** gamma
    x = x * gain * wb[None, None, :]

    # vignetting mismatch: radial falloff present only in one camera
    k = float(rng.uniform(0.06, 0.16))
    yy = (np.arange(h) - h / 2.0) / (h / 2.0)
    xx = (np.arange(w) - w / 2.0) / (w / 2.0)
    r2 = (yy[:, None] ** 2 + xx[None, :] ** 2) / 2.0
    x = x * (1.0 - k * r2)[..., None]

    # sub-pixel vertical rectification error: shift rows by dy via
    # linear interpolation (breaks the 1-D epipolar assumption slightly)
    dy = float(rng.uniform(0.3, 0.8)) * (1 if rng.random() < 0.5 else -1)
    k0 = int(np.floor(dy))
    a = dy - k0
    x0 = np.roll(x, -k0, axis=0)
    x1 = np.roll(x, -(k0 + 1), axis=0)
    x = (1.0 - a) * x0 + a * x1

    # independent sensor noise (Gaussian read noise, 8-bit DN units)
    sigma = float(rng.uniform(1.0, 2.5))
    x = x * 255.0 + rng.normal(0.0, sigma, size=x.shape)
    desc = (
        f"gain={gain:.3f} wb=[{wb[0]:.3f},{wb[1]:.3f},{wb[2]:.3f}] "
        f"gamma={gamma:.3f} vignette_k={k:.3f} dy={dy:+.2f}px noise={sigma:.2f}DN"
    )
    return np.clip(x, 0, 255).astype(np.float32), desc


def main():
    from PIL import Image

    os.makedirs(OUT, exist_ok=True)
    photos = load_photos()
    manifest = []
    for i in range(4):
        rng = np.random.default_rng(100 + i)
        name = f"scene{i}"
        left = mosaic_left(photos, rng)
        d_right = kitti_like_disparity(rng)
        right, gt = synthesize_pair(left, d_right)
        Image.fromarray(left.astype(np.uint8)).save(
            os.path.join(OUT, f"{name}_left.png"), optimize=True
        )
        Image.fromarray(right.astype(np.uint8)).save(
            os.path.join(OUT, f"{name}_right.png"), optimize=True
        )
        gt16 = np.clip(gt * 256.0, 0, 65535).astype(np.uint16)
        Image.fromarray(gt16, mode="I;16").save(os.path.join(OUT, f"{name}_gt.png"))
        cover = float((gt > 0).mean())
        manifest.append(f"{name}: valid_gt={cover:.3f} d[{gt[gt>0].min():.1f},{gt.max():.1f}]")
        print(manifest[-1], flush=True)

        # v2 sibling: same geometry (left+GT), photometrically asymmetric
        # right camera. Separate seed stream so adding it never perturbs
        # the original scenes (committed weights/tests pin those).
        arng = np.random.default_rng(200 + i)
        right_asym, desc = apply_photometric_asymmetry(right, arng)
        aname = f"asym{i}"
        Image.fromarray(left.astype(np.uint8)).save(
            os.path.join(OUT, f"{aname}_left.png"), optimize=True
        )
        Image.fromarray(right_asym.astype(np.uint8)).save(
            os.path.join(OUT, f"{aname}_right.png"), optimize=True
        )
        Image.fromarray(gt16, mode="I;16").save(os.path.join(OUT, f"{aname}_gt.png"))
        manifest.append(f"{aname}: {desc}")
        print(manifest[-1], flush=True)
    with open(os.path.join(OUT, "MANIFEST.txt"), "w") as f:
        f.write(
            "Real-imagery stereo fixture @320x1216 (KITTI operating "
            "resolution).\nSources: matplotlib grace_hopper.jpg (US public "
            "domain), sklearn china.jpg/flower.jpg (CC-BY).\nGT: 16-bit "
            "PNG, disparity*256 (KITTI format), 0 = invalid/occluded.\n"
            "asym{i}: same left/GT as scene{i}, right view with per-camera "
            "photometric nuisance (gain/WB/gamma/vignette/noise/sub-px "
            "vertical rectification error).\n\n"
            + "\n".join(manifest)
            + "\n"
        )
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
