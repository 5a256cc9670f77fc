"""ctypes bindings for the native event frontend.

Builds devo_tpu/native/voxelizer.cpp into a shared library on first import
(cached next to the source) and exposes numpy-friendly wrappers. Falls back
transparently to the NumPy implementations in devo_tpu.data.event_utils when
no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "voxelizer.cpp")
_LIB = os.path.join(_HERE, "_voxelizer.so")

_lib = None


def _build() -> Optional[str]:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB
    except Exception as e:  # pragma: no cover
        sys.stderr.write(f"devo_tpu.native: build failed ({e}); using NumPy fallback\n")
        return None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.voxelize.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int8),
        ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.ms_to_idx.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]
    lib.window_offsets.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64)]
    lib.remove_hot_pixels.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float]
    lib.quantize_i8.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int8)]
    lib.quantize_i8.restype = ctypes.c_float
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _cptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def to_voxel_grid(x, y, t, p, H: int, W: int, bins: int = 5,
                  rectify_map=None) -> np.ndarray:
    """Native trilinear event splat; same contract as
    devo_tpu.data.event_utils.to_voxel_grid."""
    lib = _load()
    if lib is None:
        from devo_tpu.data.event_utils import to_voxel_grid as np_voxelize
        return np_voxelize(x, y, t, p, H, W, bins, rectify_map)

    x = np.ascontiguousarray(x, np.float32)
    y = np.ascontiguousarray(y, np.float32)
    t = np.ascontiguousarray(t, np.int64)
    p = np.ascontiguousarray(p, np.int8)
    out = np.empty((bins, H, W), np.float32)
    rm = None
    if rectify_map is not None:
        rm = np.ascontiguousarray(rectify_map, np.float32)
    lib.voxelize(_cptr(x, ctypes.c_float), _cptr(y, ctypes.c_float),
                 _cptr(t, ctypes.c_int64), _cptr(p, ctypes.c_int8),
                 len(x), bins, H, W,
                 rm.ctypes.data_as(ctypes.c_void_p) if rm is not None else None,
                 _cptr(out, ctypes.c_float))
    return out


def compute_ms_to_idx(t_us: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        from devo_tpu.data.event_utils import compute_ms_to_idx as np_msidx
        return np_msidx(t_us)
    t_us = np.ascontiguousarray(t_us, np.int64)
    import math
    n_ms = math.ceil(int(t_us[-1]) / 1000) + 1 if t_us.size else 1
    out = np.empty((n_ms,), np.int64)
    lib.ms_to_idx(_cptr(t_us, ctypes.c_int64), len(t_us), n_ms,
                  _cptr(out, ctypes.c_int64))
    return out


def quantize_i8(v: np.ndarray):
    """(int8 array, float scale) such that v ~= out * scale; fused two-pass
    C++ vs NumPy's 4+ allocating passes (engine.upload i8 wire hot path)."""
    lib = _load()
    if lib is None:
        v = np.asarray(v, np.float32)
        m = float(np.max(np.abs(v))) if v.size else 0.0
        scale = m / 127.0 if m > 0 else 1.0
        return np.clip(np.rint(v / scale), -127, 127).astype(np.int8), scale
    v = np.ascontiguousarray(v, np.float32)
    out = np.empty(v.shape, np.int8)
    scale = lib.quantize_i8(_cptr(v, ctypes.c_float), v.size,
                            _cptr(out, ctypes.c_int8))
    return out, float(scale)


def remove_hot_pixels(vox: np.ndarray, num_stds: float = 10.0) -> np.ndarray:
    lib = _load()
    if lib is None:
        from devo_tpu.data.event_utils import remove_hot_pixels_voxel
        return remove_hot_pixels_voxel(vox, num_stds)
    # always copy: the C++ filters in place, and for an already-contiguous
    # f32 input ascontiguousarray would alias the CALLER's array — the
    # NumPy fallback never mutates its input, and the two must agree
    vox = np.array(vox, np.float32, order="C", copy=True)
    lib.remove_hot_pixels(_cptr(vox, ctypes.c_float), vox.shape[0],
                          vox.shape[1], vox.shape[2], num_stds)
    return vox
