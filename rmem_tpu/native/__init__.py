"""Native host data-plane: C++ PNG-8 encoder + fused normalize (ctypes).

Compiled on demand with g++ (-O3, zlib); every consumer falls back to the
PIL/numpy path when the toolchain is unavailable, so the framework works
without native code — just slower on the host side.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "rmem_native.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_dir() -> str:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    d = os.path.join("/tmp", f"rmem_native_{tag}")
    os.makedirs(d, exist_ok=True)
    return d


def load_native() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native library; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            so = os.path.join(_build_dir(), "rmem_native.so")
            if not os.path.exists(so):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", so, _SRC, "-lz"],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(so)
            lib.encode_png_pal8.restype = ctypes.c_long
            lib.encode_png_pal8.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long]
            lib.normalize_u8.restype = None
            lib.normalize_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
                ctypes.c_void_p, ctypes.c_void_p]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def encode_png_pal8(mask: np.ndarray, palette: np.ndarray) -> Optional[bytes]:
    """mask uint8 [H, W], palette uint8 [256, 3] -> PNG bytes, or None if the
    native library is unavailable."""
    lib = load_native()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, np.uint8)
    pal = np.ascontiguousarray(palette, np.uint8).reshape(-1)
    assert pal.size == 768
    h, w = mask.shape
    cap = h * w + 8192
    out = np.empty(cap, np.uint8)
    n = lib.encode_png_pal8(mask.ctypes.data, h, w, pal.ctypes.data,
                            out.ctypes.data, cap)
    if n < 0:
        return None
    return out[:n].tobytes()


def normalize_u8(img: np.ndarray, mean: np.ndarray,
                 std: np.ndarray) -> Optional[np.ndarray]:
    """uint8 [H, W, 3] -> float32 normalized, or None if unavailable."""
    lib = load_native()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty(img.shape, np.float32)
    m = np.ascontiguousarray(mean, np.float32)
    s = np.ascontiguousarray(std, np.float32)
    lib.normalize_u8(img.ctypes.data, out.ctypes.data,
                     img.shape[0] * img.shape[1], m.ctypes.data,
                     s.ctypes.data)
    return out
