"""ctypes bindings for the native host data kernels (native/basd_host.cpp).

Builds `libbasd_host.so` on demand with the repo Makefile (one `g++ -O3`
translation unit, no external deps) and falls back to pure numpy/PIL when a
compiler is unavailable. The exported surface:

  * `resize_batch_u8`   — batched uint8 HWC bilinear resize
  * `WelfordStats`      — streaming channel mean/std accumulator

matching the numerics of the reference's host pipeline
(`src/data/datasets.py:46-68` for the Welford merge).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libbasd_host.so"

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.resize_bilinear_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
        ]
        lib.channel_stats_update.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
    except OSError:
        _lib = False
    return _lib


def native_available() -> bool:
    return bool(_load())


def resize_batch_u8(images: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """(N, H, W, C) uint8 -> (N, oh, ow, C) uint8, half-pixel bilinear."""
    assert images.dtype == np.uint8 and images.ndim == 4
    n, h, w, c = images.shape
    if h == oh and w == ow:
        return images
    lib = _load()
    if lib:
        src = np.ascontiguousarray(images)
        dst = np.empty((n, oh, ow, c), np.uint8)
        lib.resize_bilinear_u8(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, h, w, c,
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            oh, ow,
        )
        return dst
    # numpy fallback (same half-pixel rule)
    sy = (np.arange(oh) + 0.5) * (h / oh) - 0.5
    sx = (np.arange(ow) + 0.5) * (w / ow) - 0.5
    sy = np.clip(sy, 0, h - 1)
    sx = np.clip(sx, 0, w - 1)
    y0 = sy.astype(np.int32)
    x0 = sx.astype(np.int32)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (sy - y0)[None, :, None, None].astype(np.float32)
    fx = (sx - x0)[None, None, :, None].astype(np.float32)
    img = images.astype(np.float32)
    top = img[:, y0][:, :, x0] * (1 - fx) + img[:, y0][:, :, x1] * fx
    bot = img[:, y1][:, :, x0] * (1 - fx) + img[:, y1][:, :, x1] * fx
    out = top * (1 - fy) + bot * fy
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)


class WelfordStats:
    """Streaming per-channel mean/std (parallel-merge Welford)."""

    def __init__(self, channels: int = 3):
        self.c = channels
        self.mean = np.zeros(channels, np.float64)
        self.m2 = np.zeros(channels, np.float64)
        self.count = np.zeros(1, np.int64)

    def update(self, image_u8: np.ndarray) -> None:
        flat = np.ascontiguousarray(image_u8.reshape(-1, self.c))
        lib = _load()
        if lib:
            lib.channel_stats_update(
                flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                flat.shape[0], self.c,
                self.mean.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                self.m2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                self.count.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            )
            return
        x = flat.astype(np.float64) / 255.0
        n = x.shape[0]
        batch_mean = x.mean(0)
        batch_var = x.var(0)
        delta = batch_mean - self.mean
        new_count = int(self.count[0]) + n
        self.mean += delta * n / new_count
        self.m2 += batch_var * n + delta**2 * int(self.count[0]) * n / new_count
        self.count[0] = new_count

    def result(self) -> tuple[tuple[float, ...], tuple[float, ...]]:
        std = np.sqrt(self.m2 / self.count[0])
        return tuple(self.mean.tolist()), tuple(std.tolist())
