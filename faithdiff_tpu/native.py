"""ctypes bindings for the native host runtime (native/faithdiff_io.cc).

Provides the C++ threaded image loader and host-side Gaussian tile merge,
with automatic build on first use and numpy/PIL fallbacks when the
toolchain or shared library is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfaithdiff_io.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.fd_decode_resize.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int]
        lib.fd_decode_resize.restype = ctypes.c_int
        lib.fd_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.fd_decode_batch.restype = ctypes.c_int
        lib.fd_tile_merge.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int]
        lib.fd_tile_merge.restype = None
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def decode_resize(path: str, width: int, height: int) -> np.ndarray:
    """Decode a JPEG/PNG and bilinear-resize to (height, width); float32
    RGB in [0, 1]. Native fast path, PIL fallback."""
    lib = _load()
    if lib is not None:
        out = np.empty((height, width, 3), np.float32)
        rc = lib.fd_decode_resize(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            width, height)
        if rc == 0:
            return out
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((width, height),
                                                 Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


def decode_batch(paths: Sequence[str], width: int, height: int,
                 num_threads: int = 8) -> np.ndarray:
    """Threaded batched decode+resize -> [N, H, W, 3] float32 in [0, 1]."""
    lib = _load()
    n = len(paths)
    if lib is not None and n:
        out = np.empty((n, height, width, 3), np.float32)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        failures = lib.fd_decode_batch(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            width, height, num_threads)
        if failures == 0:
            return out
    return np.stack([decode_resize(p, width, height) for p in paths]) \
        if n else np.zeros((0, height, width, 3), np.float32)


def tile_merge_host(tiles: np.ndarray, offsets: np.ndarray, canvas_hw,
                    ) -> np.ndarray:
    """Host-side Gaussian blend-merge: tiles [T, k1, k2, C] + offsets [T, 2]
    -> [H, W, C]. Native path; numpy fallback mirrors
    `pipelines.tiling.merge_tiles`."""
    H, W = canvas_hw
    t, k1, k2, c = tiles.shape
    lib = _load()
    if lib is not None:
        tiles_f = np.ascontiguousarray(tiles, np.float32)
        offs = np.ascontiguousarray(offsets, np.int32)
        canvas = np.empty((H, W, c), np.float32)
        weight = np.empty((H, W), np.float32)
        lib.fd_tile_merge(
            tiles_f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            t, k1, k2, c,
            canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            weight.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            H, W)
        return canvas
    # numpy fallback
    from .pipelines.tiling import gaussian_tile_weights

    mask = gaussian_tile_weights(k1, k2)[:, :, None]
    canvas = np.zeros((H, W, c), np.float32)
    weight = np.zeros((H, W, 1), np.float32)
    for i in range(t):
        oi, oj = offsets[i]
        canvas[oi:oi + k1, oj:oj + k2] += tiles[i] * mask
        weight[oi:oi + k1, oj:oj + k2] += mask[:, :, :1]
    return canvas / np.maximum(weight, 1e-12)
