"""Data pipeline tests: list parsing, PFM decode, 16-bit GT scaling,
crops, augmentation ranges, dataset iteration and device prefetch."""

import time
import os

import numpy as np
import pytest

pytestmark = pytest.mark.quick  # IO-only module: no XLA compiles of full nets

from real_time_self_adaptive_deep_stereo_tpu.data import (
    StereoDataset,
    center_crop_or_pad,
    load_gt,
    prefetch_to_device,
    random_crop,
    read_list_file,
    read_pfm,
)

rng = np.random.default_rng(0)


def _write_pfm(path, data, little_endian=True):
    h, w = data.shape[:2]
    with open(path, "wb") as f:
        f.write(b"Pf\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n" if little_endian else b"1.0\n")
        d = np.flipud(data[..., 0]).astype("<f4" if little_endian else ">f4")
        f.write(d.tobytes())


@pytest.fixture()
def synthetic_dataset(tmp_path):
    """Four stereo pairs: PNG images, 16-bit PNG GT, PFM proxy."""
    import cv2

    lines = []
    for i in range(4):
        left = (rng.random((40, 60, 3)) * 255).astype(np.uint8)
        right = (rng.random((40, 60, 3)) * 255).astype(np.uint8)
        gt = (rng.random((40, 60)) * 50).astype(np.float32)
        lp, rp_, gp, pp = (
            str(tmp_path / f"l{i}.png"),
            str(tmp_path / f"r{i}.png"),
            str(tmp_path / f"g{i}.png"),
            str(tmp_path / f"p{i}.pfm"),
        )
        cv2.imwrite(lp, left[..., ::-1])
        cv2.imwrite(rp_, right[..., ::-1])
        cv2.imwrite(gp, (gt * 256).astype(np.uint16))
        _write_pfm(pp, gt[..., None] + 1.0)
        lines.append(f"{lp},{rp_},{gp},{pp}")
    list_file = tmp_path / "list.csv"
    list_file.write_text("# comment line\n" + "\n".join(lines) + "\n")
    return str(list_file)


def test_read_list_file(synthetic_dataset):
    l, r, g, e = read_list_file(synthetic_dataset)
    assert len(l) == len(r) == len(g) == len(e) == 4


def test_pfm_roundtrip(tmp_path):
    data = rng.normal(size=(8, 12, 1)).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    _write_pfm(p, data)
    got = read_pfm(p)
    np.testing.assert_allclose(got, data, rtol=1e-6)


def test_gt_16bit_scaling(synthetic_dataset):
    _, _, gts, _ = read_list_file(synthetic_dataset)
    d = load_gt(gts[0])
    assert d.shape == (40, 60, 1)
    assert d.max() <= 51.0  # decoded /256 back to disparity units


def test_center_crop_or_pad():
    x = rng.random((10, 20, 3)).astype(np.float32)
    assert center_crop_or_pad(x, 6, 10).shape == (6, 10, 3)
    assert center_crop_or_pad(x, 16, 32).shape == (16, 32, 3)
    y = center_crop_or_pad(x, 16, 32)
    np.testing.assert_allclose(y[3:13, 6:26], x)


def test_random_crop_aligned():
    a = rng.random((30, 40, 3)).astype(np.float32)
    b = a + 1
    ca, cb = random_crop((8, 8), [a, b], np.random.default_rng(0))
    np.testing.assert_allclose(cb - ca, 1.0)
    assert ca.shape == (8, 8, 3)


def test_dataset_eval_iteration(synthetic_dataset):
    ds = StereoDataset(
        synthetic_dataset,
        batch_size=1,
        crop_shape=(32, 48),
        num_epochs=1,
        is_training=False,
        shuffle=False,
        load_proxy=True,
    )
    batches = list(ds)
    assert len(batches) == 4
    b = batches[0]
    assert b["left"].shape == (1, 32, 48, 3)
    assert b["target"].shape == (1, 32, 48, 1)
    assert b["proxy"].shape == (1, 32, 48, 1)
    assert int(b["real_width"][0]) == 60
    assert ds.get_max_steps() == 4


def test_dataset_training_batches_drop_remainder(synthetic_dataset):
    ds = StereoDataset(
        synthetic_dataset,
        batch_size=3,
        crop_shape=(16, 24),
        num_epochs=2,
        is_training=True,
        shuffle=True,
        seed=0,
    )
    batches = list(ds)
    # 8 samples over 2 epochs, batch 3, drop remainder -> 2 full batches
    assert all(b["left"].shape == (3, 16, 24, 3) for b in batches)
    assert len(batches) == 2


def test_prefetch_to_device(synthetic_dataset):
    ds = StereoDataset(
        synthetic_dataset,
        batch_size=2,
        crop_shape=(16, 24),
        num_epochs=1,
        is_training=True,
        shuffle=False,
    )
    out = list(prefetch_to_device(iter(ds), size=2))
    assert len(out) == 2
    import jax

    assert isinstance(out[0]["left"], jax.Array)


def test_augment_preserves_range(synthetic_dataset):
    from real_time_self_adaptive_deep_stereo_tpu.data import augment

    l = rng.random((16, 16, 3)).astype(np.float32) * 255
    r = rng.random((16, 16, 3)).astype(np.float32) * 255
    al, ar = augment(l, r, np.random.default_rng(0))
    assert al.shape == l.shape and ar.shape == r.shape
    assert al.min() >= 0 and al.max() <= 255


# ------------------------------------------------------------ native loader


def test_native_loader_matches_python(synthetic_dataset):
    from real_time_self_adaptive_deep_stereo_tpu.runtime import native

    if not native.available():
        pytest.skip(f"native loader unavailable: {native.build_error()}")
    ds_py = StereoDataset(
        synthetic_dataset, batch_size=1, crop_shape=(32, 48), num_epochs=1,
        is_training=False, shuffle=False, load_proxy=True, backend="python",
    )
    ds_nat = StereoDataset(
        synthetic_dataset, batch_size=1, crop_shape=(32, 48), num_epochs=1,
        is_training=False, shuffle=False, load_proxy=True, backend="native",
    )
    assert ds_nat.backend == "native"
    for a, b in zip(ds_py, ds_nat):
        for k in ("left", "right", "target", "proxy"):
            np.testing.assert_allclose(a[k], b[k], rtol=1e-6, atol=1e-6, err_msg=k)
        assert int(a["real_width"][0]) == int(b["real_width"][0])


def test_native_loader_training_batches(synthetic_dataset):
    from real_time_self_adaptive_deep_stereo_tpu.runtime import native

    if not native.available():
        pytest.skip("native loader unavailable")
    ds = StereoDataset(
        synthetic_dataset, batch_size=2, crop_shape=(16, 24), num_epochs=2,
        is_training=True, shuffle=True, seed=1, backend="native",
    )
    batches = list(ds)
    assert len(batches) == 4  # 8 samples / batch 2, drop remainder n/a
    assert all(b["left"].shape == (2, 16, 24, 3) for b in batches)
    assert all(np.isfinite(b["target"]).all() for b in batches)


# -------------------------------------------------- real-imagery fixture

REALWORLD = os.path.join(os.path.dirname(__file__), "fixtures", "realworld")


@pytest.fixture()
def realworld_list(tmp_path):
    """CSV list over the checked-in real-photograph fixture
    (tests/fixtures/realworld, built by tools/realworld_fixture.py):
    rectified 320x1216 pairs with KITTI-format 16-bit sparse GT."""
    import glob as _glob

    lefts = sorted(_glob.glob(os.path.join(REALWORLD, "*_left.png")))
    if not lefts:
        pytest.skip("realworld fixture absent — run tools/realworld_fixture.py")
    lines = []
    for lp in lefts:
        base = lp[: -len("_left.png")]
        lines.append(f"{lp},{base}_right.png,{base}_gt.png")
    f = tmp_path / "realworld.csv"
    f.write_text("\n".join(lines) + "\n")
    return str(f)


def test_realworld_fixture_through_reader(realworld_list):
    """Real PNG files through the full eval pipeline: KITTI /256 GT
    decode, sparse-GT semantics (0 = occluded/invalid), full-res crop."""
    ds = StereoDataset(
        realworld_list,
        batch_size=1,
        crop_shape=(320, 1216),
        num_epochs=1,
        is_training=False,
        shuffle=False,
    )
    batches = list(ds)
    assert len(batches) == 8  # scene{0-3} + photometric-asym asym{0-3}
    for b in batches:
        assert b["left"].shape == (1, 320, 1216, 3)
        assert b["left"].max() > 150 and b["left"].min() >= 0  # real photos
        gt = b["target"][0, ..., 0]
        valid = gt > 0
        assert 0.85 < valid.mean() <= 1.0  # occlusions left invalid
        assert 3.0 <= gt[valid].min() and gt.max() < 192.0  # KITTI range


@pytest.mark.quick
def test_realworld_asym_fixture_properties():
    """The asym{i} scenes (fixture v2) must share scene{i}'s geometry —
    byte-identical left view and ground truth — while the right view
    carries real photometric asymmetry (per-camera gain/gamma/vignette/
    noise/sub-px rectification error): mean intensity shifted and
    per-pixel differences well beyond quantization."""
    from PIL import Image

    checked = 0
    for i in range(4):
        sl = os.path.join(REALWORLD, f"scene{i}_left.png")
        al = os.path.join(REALWORLD, f"asym{i}_left.png")
        if not (os.path.exists(sl) and os.path.exists(al)):
            continue
        with open(sl, "rb") as f1, open(al, "rb") as f2:
            assert f1.read() == f2.read(), f"asym{i} left differs from scene{i}"
        with open(os.path.join(REALWORLD, f"scene{i}_gt.png"), "rb") as f1, open(
            os.path.join(REALWORLD, f"asym{i}_gt.png"), "rb"
        ) as f2:
            assert f1.read() == f2.read(), f"asym{i} gt differs from scene{i}"
        r0 = np.asarray(
            Image.open(os.path.join(REALWORLD, f"scene{i}_right.png")), np.float32
        )
        r1 = np.asarray(
            Image.open(os.path.join(REALWORLD, f"asym{i}_right.png")), np.float32
        )
        d = np.abs(r0 - r1)
        assert d.mean() > 1.0, f"asym{i} right barely differs (mean {d.mean():.3f})"
        assert d.max() > 10.0
        checked += 1
    assert checked == 4, "asym fixture incomplete — run tools/realworld_fixture.py"


def test_realworld_fixture_native_loader_parity(realworld_list):
    """The C++ loader decodes the real 8-bit/16-bit PNGs bit-identically
    to the python path."""
    from real_time_self_adaptive_deep_stereo_tpu.runtime import native

    if not native.available():
        pytest.skip(f"native loader unavailable: {native.build_error()}")
    kw = dict(batch_size=1, crop_shape=(320, 1216), num_epochs=1,
              is_training=False, shuffle=False)
    for a, b in zip(
        StereoDataset(realworld_list, backend="python", **kw),
        StereoDataset(realworld_list, backend="native", **kw),
    ):
        for k in ("left", "right", "target"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


@pytest.mark.quick
def test_folder_grabber_backpressure(tmp_path):
    """File replay must deliver EVERY frame in order even when the
    consumer lags (e.g. minutes of first-step compile) — a folder is
    not a real-time source, so FolderGrabber blocks on the bounded
    queue instead of dropping like a live camera; with an fps_cap it
    reverts to live drop semantics."""
    import queue as _queue

    from PIL import Image

    from real_time_self_adaptive_deep_stereo_tpu.data.grabber import get_camera

    rng = np.random.default_rng(0)
    lines = []
    for i in range(6):
        l = tmp_path / f"l{i}.png"
        r = tmp_path / f"r{i}.png"
        arr = (rng.random((8, 12, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(l)
        Image.fromarray((arr + i) % 255).save(r)
        lines.append(f"{l},{r}")
    lst = tmp_path / "pairs.csv"
    lst.write_text("\n".join(lines) + "\n")

    q = _queue.Queue(maxsize=1)
    g = get_camera("folder", q, list_file=str(lst))
    assert g.drop_when_full is False
    g.start()
    got = 0
    while True:
        time.sleep(0.05)  # slow consumer: queue(1) stays full
        item = q.get(timeout=10.0)
        if item is None:
            break
        got += 1
    g.join(timeout=10.0)
    assert got == 6, f"frames dropped in file replay: {got}/6"

    # fps_cap -> real-time emulation keeps live drop semantics
    q2 = _queue.Queue(maxsize=1)
    g2 = get_camera("folder", q2, list_file=str(lst), fps_cap=30.0)
    assert g2.drop_when_full is True
