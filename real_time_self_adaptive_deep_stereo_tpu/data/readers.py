"""Host-side data pipeline: dataset lists, image/PFM decoding, crops,
augmentation, batching and double-buffered device prefetch.

Capability-parity with reference ``Data_utils/data_reader.py`` /
``continual_data_reader.py``:

* CSV lists ``left,right[,gt[,proxy]]`` with ``,``/``;`` separators and
  ``#`` comments (data_reader.py:55-78).
* PFM ground truth (data_reader.py:11-53) and 8/16-bit PNG ground truth
  with automatic ``/256`` scaling for 16-bit (data_reader.py:138-143).
* GT width-cropped to the image width (data_reader.py:145).
* Training: aligned random crop; eval: centered crop-or-pad to the
  requested shape (data_reader.py:147-150).
* Optional photometric augmentation (preprocessing.py:61-89).
* Epoch repeat, shuffling, fixed-size batches with drop-remainder for
  training (data_reader.py:166-175).
* Continual variant: 4th CSV column of proxy disparities plus the real
  (pre-pad) image width (continual_data_reader.py:149-155).

TPU-first design: decoding runs in a background thread; a device
prefetcher keeps N batches in flight (``jax.device_put`` ahead of use)
so the accelerator never waits on the host — the analogue of the
reference's ``tf.data`` prefetch(30). All emitted batches have static
shapes.
"""

from __future__ import annotations

import os
import queue
import re
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "read_pfm",
    "read_list_file",
    "load_image",
    "load_gt",
    "random_crop",
    "center_crop_or_pad",
    "resize_image_np",
    "augment",
    "StereoDataset",
    "prefetch_to_device",
]


# ----------------------------------------------------------------- decoding


def read_pfm(path: str) -> np.ndarray:
    """Decode a PFM file to a float32 array [H, W, C] (C = 1 or 3)."""
    with open(path, "rb") as f:
        header = f.readline().strip()
        if header == b"PF":
            channels = 3
        elif header == b"Pf":
            channels = 1
        else:
            raise ValueError(f"{path}: not a PFM file")
        dims = f.readline().split()
        width, height = int(dims[0]), int(dims[1])
        scale = float(f.readline().strip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f4")
    img = data.reshape(height, width, channels)
    return np.flipud(img).astype(np.float32)


def read_list_file(path_file: str) -> Tuple[List[str], List[str], List[str], List[str]]:
    """Parse a dataset list: one sample per line, fields separated by
    ',' or ';', '#' starts a comment line. Returns (left, right, gt, extra)."""
    with open(path_file) as f:
        lines = [l.strip() for l in f.readlines()]
    lines = [l for l in lines if l and not l.startswith("#")]
    cols: List[List[str]] = [[], [], [], []]
    for line in lines:
        fields = re.split("[,;]", line)
        for i in range(4):
            if i < len(fields):
                cols[i].append(fields[i].strip())
    return cols[0], cols[1], cols[2], cols[3]


def _imread(path: str, flags=None) -> np.ndarray:
    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_UNCHANGED if flags is None else flags)
        if img is None:
            raise IOError(f"cannot read image {path}")
        if img.ndim == 3 and img.shape[2] >= 3:
            img = img[..., 2::-1]  # BGR(A) -> RGB
        return img
    except ImportError:  # pragma: no cover - cv2 is present in CI images
        import imageio.v2 as imageio

        return np.asarray(imageio.imread(path))


def load_image(path: str) -> np.ndarray:
    """RGB image as float32 [H, W, 3] in 0..255."""
    img = _imread(path)
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    return img[..., :3].astype(np.float32)


def load_gt(path: str) -> np.ndarray:
    """Ground-truth / proxy disparity as float32 [H, W, 1].

    PFM read natively; 16-bit PNGs are divided by 256 (KITTI encoding),
    8-bit used raw — the reference's auto-detection
    (data_reader.py:138-143, continual_data_reader.py:149-153)."""
    if path.lower().endswith(".pfm"):
        d = read_pfm(path)[..., :1]
    else:
        raw = _imread(path)
        if raw.ndim == 3:
            raw = raw[..., 0]
        d = raw.astype(np.float32)[..., None]
        if raw.dtype == np.uint16:
            d = d / 256.0
    return d


# ------------------------------------------------------------ crops/augment


def random_crop(
    crop_shape: Sequence[int], tensors: List[np.ndarray], rng: np.random.Generator
) -> List[np.ndarray]:
    """Aligned random crop (preprocessing.py:31-56)."""
    h, w = tensors[0].shape[:2]
    ch, cw = crop_shape
    max_row = max(h - ch - 1, 1)
    max_col = max(w - cw - 1, 1)
    r0 = int(rng.integers(0, max_row))
    c0 = int(rng.integers(0, max_col))
    return [t[r0 : r0 + ch, c0 : c0 + cw] for t in tensors]


def center_crop_or_pad(img: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Centered crop/zero-pad to (th, tw), numpy version of
    tf.image.resize_image_with_crop_or_pad."""
    h, w = img.shape[:2]
    if h > th:
        off = (h - th) // 2
        img = img[off : off + th]
    if w > tw:
        off = (w - tw) // 2
        img = img[:, off : off + tw]
    h, w = img.shape[:2]
    if h < th or w < tw:
        ph, pw = th - h, tw - w
        img = np.pad(
            img, ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0))
        )
    return img


def resize_image_np(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Host-side bilinear resize with TF1-legacy semantics ([H,W,C]).

    Numpy twin of ``ops.resize.resize_bilinear`` (same interpolation
    matrices), used by the live demo's input rescale stage
    (Demo/demo_model.py:80-82 via preprocessing.rescale_image)."""
    from real_time_self_adaptive_deep_stereo_tpu.ops.resize import _interp_matrix

    h, w = img.shape[:2]
    if (h, w) == (out_h, out_w):
        return img
    x = img.astype(np.float32)
    if h != out_h:
        x = np.einsum("oh,hwc->owc", _interp_matrix(h, out_h), x)
    if w != out_w:
        x = np.einsum("ow,hwc->hoc", _interp_matrix(w, out_w), x)
    if np.issubdtype(img.dtype, np.integer):
        # the reference feeds tf.image.resize's FLOAT output straight to
        # the network (demo_model.py:80-86); truncating back to the
        # integer input dtype would bias every pixel downward
        return x
    return x.astype(img.dtype)


def augment(
    left: np.ndarray, right: np.ndarray, rng: np.random.Generator
) -> Tuple[np.ndarray, np.ndarray]:
    """Photometric augmentation with the reference's exact distributions
    and gating (preprocessing.py:61-89: each op applies when its uniform
    'active' draw is <= 0.5; brightness delta +-0.05, contrast 0.8..1.2,
    hue 0.8..1.2)."""
    active = rng.random(4)
    left = left.astype(np.float32)
    right = right.astype(np.float32)

    if active[1] <= 0.5:
        delta = rng.uniform(-0.05, 0.05)
        left = left + delta
        right = right + delta
    if active[2] <= 0.5:
        factor = rng.uniform(0.8, 1.2)

        def contrast(x):
            mean = x.mean(axis=(0, 1), keepdims=True)
            return (x - mean) * factor + mean

        left, right = contrast(left), contrast(right)
    if active[3] <= 0.5:
        delta = rng.uniform(0.8, 1.2)

        def hue(x):
            import matplotlib.colors as mc

            hsv = mc.rgb_to_hsv(np.clip(x / 255.0, 0, 1))
            hsv[..., 0] = (hsv[..., 0] + delta) % 1.0
            return mc.hsv_to_rgb(hsv) * 255.0

        left, right = hue(left), hue(right)

    return np.clip(left, 0, 255), np.clip(right, 0, 255)


# ------------------------------------------------------------------ dataset


class StereoDataset:
    """Iterable stereo dataset with the reference's epoch/shuffle/batch
    semantics. Yields dict batches of float32 numpy arrays:
    ``left``/``right`` [B,H,W,3], ``target`` [B,H,W,1] and, when a 4th
    CSV column exists and ``load_proxy``, ``proxy`` [B,H,W,1] plus
    ``real_width`` [B]."""

    def __init__(
        self,
        path_file: str,
        batch_size: int = 4,
        crop_shape: Sequence[int] = (320, 1216),
        num_epochs: Optional[int] = None,
        augment: bool = False,
        is_training: bool = True,
        shuffle: bool = True,
        load_proxy: bool = False,
        seed: Optional[int] = None,
        num_workers: int = 2,
        backend: str = "auto",
    ):
        if not os.path.exists(path_file):
            raise FileNotFoundError(f"dataset list not found: {path_file}")
        left, right, gt, extra = read_list_file(path_file)
        self.samples = list(zip(left, right, gt))
        self.proxies = extra if (load_proxy and extra) else None
        self.batch_size = batch_size
        self.crop_shape = tuple(crop_shape)
        self.num_epochs = num_epochs
        self.augment_enabled = augment
        self.is_training = is_training
        self.shuffle = shuffle
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.num_workers = max(1, num_workers)
        # 'native' = C++ threaded decode pipeline (runtime/stereo_loader.cc);
        # augmentation stays host-python, so augment forces the python path
        self.backend = backend
        if backend == "auto":
            try:
                from real_time_self_adaptive_deep_stereo_tpu.runtime import native

                self.backend = (
                    "native" if (native.available() and not augment) else "python"
                )
            except Exception:
                self.backend = "python"

    def __len__(self) -> int:
        return len(self.samples)

    def get_max_steps(self) -> int:
        epochs = self.num_epochs if self.num_epochs else 1
        return (len(self) * epochs) // self.batch_size

    def get_couples(self):
        return [list(s) for s in self.samples]

    # ---------------------------------------------------------- item loading
    def _load_one(self, idx: int) -> Dict[str, np.ndarray]:
        lp, rp, gp = self.samples[idx]
        left = load_image(lp)
        right = load_image(rp)
        gt = load_gt(gp) if gp else np.zeros((*left.shape[:2], 1), np.float32)
        gt = gt[:, : left.shape[1]]  # width-align (data_reader.py:145)
        tensors = [left, right, gt]
        real_width = left.shape[1]
        if self.proxies is not None:
            tensors.append(load_gt(self.proxies[idx]))
        if self.is_training:
            tensors = random_crop(self.crop_shape, tensors, self.rng)
        else:
            tensors = [center_crop_or_pad(t, *self.crop_shape) for t in tensors]
        if self.augment_enabled:
            tensors[0], tensors[1] = augment(tensors[0], tensors[1], self.rng)
        out = {"left": tensors[0], "right": tensors[1], "target": tensors[2]}
        if self.proxies is not None:
            out["proxy"] = tensors[3]
            out["real_width"] = np.int32(real_width)
        return out

    # ------------------------------------------------------------- iteration
    def _index_stream(self) -> Iterator[int]:
        epoch = 0
        while self.num_epochs is None or epoch < self.num_epochs:
            order = np.arange(len(self.samples))
            if self.shuffle:
                self.rng.shuffle(order)
            yield from order
            epoch += 1

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        """Yield batches, decoding via the native C++ pipeline when
        available, else in a Python background thread."""
        if self.backend == "native":
            yield from self._iter_native()
            return
        q: queue.Queue = queue.Queue(maxsize=8)
        stop = threading.Event()

        def producer():
            batch: List[Dict[str, np.ndarray]] = []
            try:
                for idx in self._index_stream():
                    if stop.is_set():
                        return
                    batch.append(self._load_one(int(idx)))
                    if len(batch) == self.batch_size:
                        q.put(self._stack(batch))
                        batch = []
                if batch and not self.is_training:
                    # eval keeps the remainder (continual_data_reader.py:189)
                    q.put(self._stack(batch))
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()

    def _iter_native(self) -> Iterator[Dict[str, np.ndarray]]:
        from real_time_self_adaptive_deep_stereo_tpu.runtime.native import (
            NativeStereoLoader,
        )

        loader = NativeStereoLoader(
            workers=max(2, self.num_workers), crop_shape=self.crop_shape
        )
        base_seed = self.seed if self.seed is not None else 0
        try:
            indices = list(self._index_stream())
            submitted = 0
            delivered = 0
            batch: List[Dict[str, np.ndarray]] = []
            ahead = 8
            while delivered < len(indices):
                while submitted < len(indices) and submitted - delivered < ahead:
                    idx = int(indices[submitted])
                    lp, rp, gp = self.samples[idx]
                    pp = self.proxies[idx] if self.proxies is not None else ""
                    loader.submit(
                        lp, rp, gp or "", pp,
                        train=self.is_training,
                        seed=(base_seed << 20) + submitted,
                    )
                    submitted += 1
                sample = loader.next()
                delivered += 1
                if self.proxies is None:
                    sample.pop("proxy", None)
                    sample.pop("real_width", None)
                batch.append(sample)
                if len(batch) == self.batch_size:
                    yield self._stack(batch)
                    batch = []
            if batch and not self.is_training:
                yield self._stack(batch)
        finally:
            loader.close()

    @staticmethod
    def _stack(batch: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
        keys = batch[0].keys()
        return {k: np.stack([b[k] for b in batch]) for k in keys}


def prefetch_to_device(
    iterator: Iterator[Dict[str, np.ndarray]], size: int = 2
) -> Iterator[Dict]:
    """Keep ``size`` batches resident on the accelerator ahead of use
    (double buffering; the analogue of the reference's prefetch(30))."""
    import collections

    import jax

    buf = collections.deque()
    it = iter(iterator)

    def put(batch):
        return jax.tree_util.tree_map(jax.device_put, batch)

    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
