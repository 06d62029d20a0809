"""ctypes bindings for the native host-side data-path library.

Loads ``native/libtmar_host.so`` (built by ``make -C native``; auto-built on
first import if the toolchain is present).  Every function has a pure-numpy
fallback so the framework works without the native library — the bindings
are a throughput optimisation for keeping TPU chips fed, mirroring how the
reference rides on torch's C++ DataLoader workers.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libtmar_host.so"))

_lib: Optional[ctypes.CDLL] = None


def _try_build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load_library(build: bool = True) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build:
        _try_build()
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64 = ctypes.c_int64

    lib.tmar_normalize01_pm1.argtypes = [f32p, f32p, i64]
    lib.tmar_hu_window.argtypes = [f32p, f32p, i64, ctypes.c_float, ctypes.c_float]
    lib.tmar_assemble_batch.argtypes = [
        f32p, f32p, i64, i64, i64, i64, i64, i64, i32p, i32p, u8p, u8p,
    ]
    lib.tmar_metal_mask_dilate.argtypes = [f32p, f32p, i64, i64, ctypes.c_float, ctypes.c_int]
    lib.tmar_li_rowwise.argtypes = [f32p, u8p, f32p, i64, i64]
    lib.tmar_li_rowwise.restype = i64
    lib.tmar_li_colwise.argtypes = [f32p, u8p, f32p, i64, i64]
    lib.tmar_li_colwise.restype = i64
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


def _f32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def normalize01_pm1(x: np.ndarray) -> np.ndarray:
    lib = load_library()
    x = np.ascontiguousarray(x, np.float32)
    if lib is None:
        return (np.clip(x, 0, 1) * 2 - 1).astype(np.float32)
    out = np.empty_like(x)
    lib.tmar_normalize01_pm1(_f32(x), _f32(out), x.size)
    return out


def hu_window(x: np.ndarray, hu_min: float = -1000.0, hu_max: float = 2000.0) -> np.ndarray:
    lib = load_library()
    x = np.ascontiguousarray(x, np.float32)
    if lib is None:
        v = np.clip(x, hu_min, hu_max)
        return (((v - hu_min) / (hu_max - hu_min)) * 2 - 1).astype(np.float32)
    out = np.empty_like(x)
    lib.tmar_hu_window(_f32(x), _f32(out), x.size, hu_min, hu_max)
    return out


def assemble_batch(
    samples: np.ndarray,
    patch: int,
    rows: Sequence[int],
    cols: Sequence[int],
    hflip: Sequence[bool],
    vflip: Sequence[bool],
) -> np.ndarray:
    """samples [B, K, H, W] float32 -> cropped/flipped [B, K, patch, patch]."""
    samples = np.ascontiguousarray(samples, np.float32)
    B, K, H, W = samples.shape
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    hf = np.ascontiguousarray(hflip, np.uint8)
    vf = np.ascontiguousarray(vflip, np.uint8)
    lib = load_library()
    if lib is None:
        out = np.empty((B, K, patch, patch), np.float32)
        for b in range(B):
            sl = samples[b, :, rows[b] : rows[b] + patch, cols[b] : cols[b] + patch]
            if hf[b]:
                sl = sl[:, :, ::-1]
            if vf[b]:
                sl = sl[:, ::-1, :]
            out[b] = sl
        return out
    out = np.empty((B, K, patch, patch), np.float32)
    lib.tmar_assemble_batch(
        _f32(samples), _f32(out), B, K, H, W, patch, patch,
        _i32(rows), _i32(cols), _u8(hf), _u8(vf),
    )
    return out


def metal_mask_dilate(img: np.ndarray, threshold: float = 0.6, radius: int = 5) -> np.ndarray:
    img = np.ascontiguousarray(img, np.float32)
    H, W = img.shape
    lib = load_library()
    if lib is None:
        from scipy.ndimage import maximum_filter

        m = (img > threshold).astype(np.float32)
        return maximum_filter(m, size=2 * radius + 1, mode="constant") if radius else m
    out = np.empty_like(img)
    lib.tmar_metal_mask_dilate(_f32(img), _f32(out), H, W, threshold, radius)
    return out


def li_interpolate(img: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Pseudo-clean LI: row-wise then column-wise masked linear interpolation
    (reference prepare_spineweb_data.py:119-131)."""
    img = np.ascontiguousarray(img, np.float32)
    mask_u8 = np.ascontiguousarray(mask > 0, np.uint8)
    H, W = img.shape
    lib = load_library()
    if lib is None:
        out = img.copy()
        xs = np.arange(W)
        for r in range(H):
            m = mask_u8[r].astype(bool)
            if m.any() and (~m).sum() >= 2:
                out[r, m] = np.interp(xs[m], xs[~m], out[r, ~m])
        ys = np.arange(H)
        for c in range(W):
            m = mask_u8[:, c].astype(bool) & (out[:, c] == img[:, c]) & mask_u8[:, c].astype(bool)
            if m.any() and (~m).sum() >= 2:
                out[m, c] = np.interp(ys[m], ys[~m], out[~m, c])
        return out
    tmp = np.empty_like(img)
    lib.tmar_li_rowwise(_f32(img), _u8(mask_u8), _f32(tmp), H, W)
    # column pass over rows the row pass could not fix (fully-masked rows)
    remaining = (mask_u8 > 0) & (tmp == img)
    if remaining.any():
        out = np.empty_like(img)
        lib.tmar_li_colwise(_f32(tmp), _u8(np.ascontiguousarray(remaining, np.uint8)), _f32(out), H, W)
        return out
    return tmp
