"""ctypes loader for the native (C) runtime components.

The shared library is compiled lazily from ``native/*.c`` with the system C
compiler and cached next to the sources.  Python fallbacks exist for every
native entry point so the engine still works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libopenpano_native.so")
_SOURCES = ["crop_largest_rect.c"]

_lock = threading.Lock()
_lib = None
_load_failed = False


def _build() -> bool:
    srcs = [os.path.join(_NATIVE_DIR, s) for s in _SOURCES]
    if not all(os.path.exists(s) for s in srcs):
        return False
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= newest_src:
        return True
    for cc in ("cc", "gcc", "g++"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", _LIB_PATH] + srcs,
                check=True, capture_output=True,
            )
            return True
        except (OSError, subprocess.CalledProcessError):
            continue
    return False


def get_lib():
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            if _build():
                lib = ctypes.CDLL(_LIB_PATH)
                lib.largest_valid_rect.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int64),
                ]
                lib.largest_valid_rect.restype = None
                _lib = lib
            else:
                _load_failed = True
        except OSError:
            _load_failed = True
        return _lib


def largest_valid_rect(valid: np.ndarray) -> tuple[int, int, int, int]:
    """(y0, x0, h, w) of the largest all-True rectangle in a 2-D bool mask."""
    valid = np.ascontiguousarray(valid, dtype=np.uint8)
    h, w = valid.shape
    lib = get_lib()
    if lib is not None:
        out = (ctypes.c_int64 * 4)()
        lib.largest_valid_rect(
            valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, out
        )
        return int(out[0]), int(out[1]), int(out[2]), int(out[3])
    return _largest_valid_rect_py(valid)


def _largest_valid_rect_py(valid: np.ndarray) -> tuple[int, int, int, int]:
    """Pure-python fallback (same DP, slow; used only without a C compiler)."""
    h, w = valid.shape
    height = np.zeros(w, dtype=np.int64)
    best = (0, 0, 0, 0)
    maxarea = 0
    for line in range(h):
        height = np.where(valid[line] > 0, height + 1, 0)
        left = np.arange(w)
        for k in range(w):
            while left[k] > 0 and height[k] <= height[left[k] - 1]:
                left[k] = left[left[k] - 1]
        right = np.arange(w)
        for k in range(w - 1, -1, -1):
            while right[k] < w - 1 and height[k] <= height[right[k] + 1]:
                right[k] = right[right[k] + 1]
        area = (right - left + 1) * height
        k = int(np.argmax(area))
        if area[k] > maxarea:
            maxarea = int(area[k])
            best = (line - int(height[k]) + 1, int(left[k]), int(height[k]), int(right[k] - left[k] + 1))
    return best
