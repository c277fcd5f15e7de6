"""Monotonic alignment search: C++ core (ctypes) with a numpy fallback.

Mirrors the reference's vendored Cython kernel (Matcha-TTS
``monotonic_align/core.pyx`` — the reference repo's ONLY native source file),
used by TTS duration modeling in the CosyVoice vocoder path of S2S. The C++
library builds on first use (g++ -O3 -fopenmp) and is cached next to the
source; environments without a toolchain fall back to numpy transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_SRC = _NATIVE_DIR / "monotonic_align.cpp"
_LIB = _NATIVE_DIR / "libmonotonic_align.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", str(_SRC), "-o", str(_LIB)]
            r = subprocess.run(cmd, capture_output=True)
            if r.returncode != 0:  # retry without OpenMP
                cmd.remove("-fopenmp")
                r = subprocess.run(cmd, capture_output=True, check=True)
        lib = ctypes.CDLL(str(_LIB))
        lib.maximum_path.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ]
        lib.maximum_path.restype = None
        return lib
    except Exception:
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if not _tried:
            _lib = _build()
            _tried = True
    return _lib


def _maximum_path_numpy(paths, values, t_xs, t_ys, max_neg_val):
    b = values.shape[0]
    for i in range(b):
        t_x, t_y = int(t_xs[i]), int(t_ys[i])
        v = values[i]
        for y in range(t_y):
            for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
                v_cur = max_neg_val if x == y else v[x, y - 1]
                if x == 0:
                    v_prev = 0.0 if y == 0 else max_neg_val
                else:
                    v_prev = v[x - 1, y - 1]
                v[x, y] += max(v_cur, v_prev)
        index = t_x - 1
        for y in range(t_y - 1, -1, -1):
            paths[i, index, y] = 1
            if index != 0 and (index == y or v[index, y - 1] < v[index - 1, y - 1]):
                index -= 1


def maximum_path(
    values: np.ndarray,  # (B, Tx, Ty) float — log-likelihoods
    t_xs: Optional[np.ndarray] = None,
    t_ys: Optional[np.ndarray] = None,
    max_neg_val: float = -1e9,
) -> np.ndarray:
    """Best monotonic alignment per batch item; returns int32 (B, Tx, Ty)."""
    values = np.ascontiguousarray(values, np.float32).copy()
    b, tx, ty = values.shape
    t_xs = np.ascontiguousarray(
        t_xs if t_xs is not None else np.full(b, tx), np.int32
    )
    t_ys = np.ascontiguousarray(
        t_ys if t_ys is not None else np.full(b, ty), np.int32
    )
    paths = np.zeros((b, tx, ty), np.int32)
    lib = _get_lib()
    if lib is not None:
        lib.maximum_path(
            paths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            b, tx, ty, max_neg_val,
        )
    else:
        _maximum_path_numpy(paths, values, t_xs, t_ys, max_neg_val)
    return paths
