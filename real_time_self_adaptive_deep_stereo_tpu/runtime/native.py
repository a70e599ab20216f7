"""ctypes bindings + lazy build of the native C++ stereo loader.

The shared library is compiled on first use with the system toolchain
(g++ + libpng/libjpeg/zlib) and cached next to the source. If the
toolchain or headers are unavailable the import degrades gracefully —
``available()`` returns False and the Python decode path is used.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "stereo_loader.cc")
_SO = os.path.join(_HERE, "libstereo_loader.so")

_lib = None
_lib_lock = threading.Lock()
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", "-std=c++17",
        _SRC, "-o", _SO, "-lpng", "-ljpeg", "-lz", "-lpthread",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=240)
    except (OSError, subprocess.TimeoutExpired) as e:  # pragma: no cover
        return str(e)
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def _load():
    global _lib, _build_error
    with _lib_lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            err = _build()
            if err:
                _build_error = err
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:  # pragma: no cover
            _build_error = str(e)
            return None
        lib.sl_create.restype = ctypes.c_void_p
        lib.sl_create.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.sl_destroy.argtypes = [ctypes.c_void_p]
        lib.sl_submit.restype = ctypes.c_long
        lib.sl_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64,
        ]
        lib.sl_next.restype = ctypes.c_int
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.sl_next.argtypes = [
            ctypes.c_void_p, f32p, f32p, f32p, f32p,
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    """True if the native loader built (or builds) successfully."""
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


class NativeStereoLoader:
    """Threaded native decode pipeline with in-order delivery.

    Usage::

        nl = NativeStereoLoader(workers=4, crop_shape=(320, 1216))
        for paths in samples:
            nl.submit(left, right, gt, proxy, train=False, seed=i)
        for _ in samples:
            sample = nl.next()   # dict of float32 arrays
    """

    def __init__(self, workers: int = 4, crop_shape=(320, 1216), capacity: int = 16):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_build_error}")
        self._lib = lib
        self._h, self._w = int(crop_shape[0]), int(crop_shape[1])
        self._ptr = lib.sl_create(workers, capacity)
        self._lock = threading.Lock()

    def submit(
        self,
        left: str,
        right: str,
        gt: str = "",
        proxy: str = "",
        train: bool = False,
        seed: int = 0,
    ) -> int:
        return self._lib.sl_submit(
            self._ptr,
            left.encode(), right.encode(), gt.encode(), proxy.encode(),
            self._h, self._w, 1 if train else 0, seed,
        )

    def next(self) -> dict:
        h, w = self._h, self._w
        left = np.empty((h, w, 3), np.float32)
        right = np.empty((h, w, 3), np.float32)
        gt = np.empty((h, w, 1), np.float32)
        proxy = np.empty((h, w, 1), np.float32)
        has_proxy = ctypes.c_int(0)
        rw = self._lib.sl_next(
            self._ptr,
            left, right, gt.reshape(h, w), proxy.reshape(h, w),
            ctypes.byref(has_proxy),
        )
        if rw == -2:
            raise RuntimeError("loader shut down")
        if rw == -1:
            raise IOError("native loader failed to decode a sample")
        out = {
            "left": left,
            "right": right,
            "target": gt,
            "real_width": np.int32(rw),
        }
        if has_proxy.value:
            out["proxy"] = proxy
        return out

    def close(self) -> None:
        with self._lock:
            if self._ptr:
                self._lib.sl_destroy(self._ptr)
                self._ptr = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
