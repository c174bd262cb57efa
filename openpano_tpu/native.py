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
_SOURCES = ["crop_largest_rect.c", "delta_code.c", "png_codec.c", "wire_codec.c"]
_LIBS = ["-lz", "-lpthread"]

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
                [cc, "-O3", "-shared", "-fPIC", "-o", _LIB_PATH] + srcs + _LIBS,
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
                for fn in (lib.delta_encode_rows, lib.delta_decode_rows):
                    fn.argtypes = [
                        ctypes.POINTER(ctypes.c_uint8),
                        ctypes.POINTER(ctypes.c_uint8),
                        ctypes.c_int64,
                        ctypes.c_int64,
                        ctypes.c_int,
                    ]
                    fn.restype = None
                lib.png_decode_rgb8.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_int64),
                ]
                lib.png_decode_rgb8.restype = ctypes.c_void_p
                lib.png_encode_rgb8.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int64),
                ]
                lib.png_encode_rgb8.restype = ctypes.c_void_p
                lib.pano_free.argtypes = [ctypes.c_void_p]
                lib.pano_free.restype = None
                lib.wire_pack4.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int64,
                    ctypes.c_int,
                ]
                lib.wire_pack4.restype = ctypes.c_int64
                lib.wire_pack2.argtypes = lib.wire_pack4.argtypes
                lib.wire_pack2.restype = ctypes.c_int64
                lib.wire_grey_u8.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int64,
                    ctypes.c_int,
                ]
                lib.wire_grey_u8.restype = None
                lib.wire_grey_res_u8.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int64,
                    ctypes.c_int,
                ]
                lib.wire_grey_res_u8.restype = None
                lib.wire_unpack.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int,
                    ctypes.c_int,
                ]
                lib.wire_unpack.restype = None
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


def _nthreads() -> int:
    try:
        return min(16, os.cpu_count() or 1)
    except Exception:
        return 1


def delta_encode_rows(src: np.ndarray) -> np.ndarray:
    """Row-wise horizontal delta (mod 256) of a 2-D uint8 plane.  Threaded
    native pass; numpy fallback."""
    src = np.ascontiguousarray(src, dtype=np.uint8)
    rows, cols = src.shape
    lib = get_lib()
    if lib is not None:
        dst = np.empty_like(src)
        lib.delta_encode_rows(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            rows, cols, _nthreads(),
        )
        return dst
    x = src.astype(np.int16)
    return np.concatenate(
        [x[:, :1], (x[:, 1:] - x[:, :-1]) & 0xFF], axis=1
    ).astype(np.uint8)


def delta_decode_rows(src: np.ndarray) -> np.ndarray:
    """Inverse of delta_encode_rows (prefix sum mod 256 along rows)."""
    src = np.ascontiguousarray(src, dtype=np.uint8)
    rows, cols = src.shape
    lib = get_lib()
    if lib is not None:
        dst = np.empty_like(src)
        lib.delta_decode_rows(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            rows, cols, _nthreads(),
        )
        return dst
    return np.cumsum(src.astype(np.int64), axis=1).astype(np.uint8)


def png_decode_rgb8(data: bytes) -> np.ndarray | None:
    """Decode a PNG byte buffer to uint8 RGB [H, W, 3].  None when the
    native codec is unavailable or the file needs a fallback decoder
    (16-bit / interlaced)."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    w = ctypes.c_int64(0)
    h = ctypes.c_int64(0)
    ptr = lib.png_decode_rgb8(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size,
        ctypes.byref(w), ctypes.byref(h),
    )
    if not ptr:
        return None
    try:
        out = np.ctypeslib.as_array(
            ctypes.cast(ptr, ctypes.POINTER(ctypes.c_uint8)),
            shape=(h.value, w.value, 3),
        ).copy()
    finally:
        lib.pano_free(ptr)
    return out


def png_encode_rgb8(rgb: np.ndarray) -> bytes | None:
    """Encode uint8 RGB [H, W, 3] to PNG bytes (Sub filter + deflate).
    None when the native codec is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w = rgb.shape[:2]
    out_len = ctypes.c_int64(0)
    ptr = lib.png_encode_rgb8(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h,
        ctypes.byref(out_len),
    )
    if not ptr:
        return None
    try:
        return ctypes.string_at(ptr, out_len.value)
    finally:
        lib.pano_free(ptr)


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


def wire_pack4(plane: np.ndarray, exc_frac: float = 0.12):
    """4-bit nibble-delta pack of a [rows, cols] u8 plane (wire_codec.c).

    Returns (packed [ceil(rows/2), cols] u8, exc_idx int64 [K] sorted,
    exc_val u8 [K]) or None when exceptions exceed ``exc_frac`` of elements
    (caller should upload raw) or the native library is unavailable."""
    return _wire_pack(plane, exc_frac, bits=4)


def wire_pack2(plane: np.ndarray, exc_frac: float = 0.12):
    """2-bit variant of wire_pack4 (deltas clip to [-2, 1], four per
    byte, quarter-row pairing) — for planes whose deltas are tiny, e.g.
    chroma-vs-grey differences (98%+ within [-1, 1] on photos)."""
    return _wire_pack(plane, exc_frac, bits=2)


def _wire_pack(plane: np.ndarray, exc_frac: float, bits: int):
    plane = np.ascontiguousarray(plane, dtype=np.uint8)
    rows, cols = plane.shape
    lib = get_lib()
    if lib is None:
        out = _wire_pack4_py(plane) if bits == 4 else _wire_pack2_py(plane)
        # same overflow contract as the native path: content too noisy for
        # the bit budget tells the caller to upload raw (without this the
        # fallback emitted ~2 B/px of exceptions — larger than raw)
        if out is not None and out[1].size > plane.size * exc_frac:
            return None
        return out
    group = 2 if bits == 4 else 4
    out_rows = (rows + group - 1) // group
    packed = np.empty((out_rows, cols), np.uint8)
    cap = max(1024, int(plane.size * exc_frac))
    idx = np.empty(cap, np.int64)
    val = np.empty(cap, np.uint8)
    fn = lib.wire_pack4 if bits == 4 else lib.wire_pack2
    n = fn(
        plane.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rows, cols,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        val.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap, _nthreads(),
    )
    if n < 0:
        return None
    idx, val = idx[:n], val[:n]
    order = np.argsort(idx, kind="stable")
    return packed, idx[order], val[order]


def _wire_pack2_py(plane: np.ndarray):
    """Numpy fallback for wire_pack2 (same format, slower)."""
    rows, cols = plane.shape
    x = plane.astype(np.int16)
    d = x.copy()
    d[:, 1:] = x[:, 1:] - x[:, :-1]
    d8 = (d & 0xFF).astype(np.uint8)
    s = ((d8.astype(np.int16) + 2) & 0xFF)
    ok = s < 4
    nib = np.where(ok, s, 2).astype(np.uint8)
    quart = (rows + 3) // 4
    if quart * 4 != rows:
        nib = np.concatenate(
            [nib, np.full((quart * 4 - rows, cols), 2, np.uint8)], axis=0)
    packed = (nib[:quart] | (nib[quart:2*quart] << 2)
              | (nib[2*quart:3*quart] << 4) | (nib[3*quart:] << 6))
    idx = np.flatnonzero(~ok.reshape(-1)).astype(np.int64)
    val = d8.reshape(-1)[idx]
    return packed.astype(np.uint8), idx, val


def _wire_pack4_py(plane: np.ndarray):
    """Numpy fallback for wire_pack4 (same format, slower)."""
    rows, cols = plane.shape
    x = plane.astype(np.int16)
    d = x.copy()
    d[:, 1:] = x[:, 1:] - x[:, :-1]
    d8 = (d & 0xFF).astype(np.uint8)
    s = ((d8.astype(np.int16) + 8) & 0xFF)
    ok = s < 16
    nib = np.where(ok, s, 8).astype(np.uint8)
    half = (rows + 1) // 2
    if rows % 2:
        nib = np.concatenate([nib, np.full((1, cols), 8, np.uint8)], axis=0)
    packed = (nib[:half] | (nib[half:] << 4)).astype(np.uint8)
    idx = np.flatnonzero(~ok.reshape(-1)).astype(np.int64)
    val = d8.reshape(-1)[idx]
    return packed, idx, val


def wire_grey_u8(rgb: np.ndarray) -> np.ndarray:
    """Rounded channel-mean grey of a u8 RGB array [..., 3] -> [...] u8
    (reference semantics: lib/imgproc.cc:237-249)."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    shape = rgb.shape[:-1]
    n = int(np.prod(shape))
    lib = get_lib()
    if lib is not None:
        grey = np.empty(n, np.uint8)
        lib.wire_grey_u8(
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            grey.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, _nthreads(),
        )
        return grey.reshape(shape)
    s = rgb.reshape(-1, 3).astype(np.uint32).sum(axis=1)
    return ((2 * s + 3) // 6).astype(np.uint8).reshape(shape)


def wire_grey_res_u8(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Grey (rounded channel mean) PLUS the channel-sum residual biased to
    {0,1,2}: r+g+b == 3*grey + res - 1 exactly.  Lets the device rebuild
    the exact integer channel sum from one u8 plane + one 2-bit plane."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    shape = rgb.shape[:-1]
    n = int(np.prod(shape))
    lib = get_lib()
    if lib is not None:
        grey = np.empty(n, np.uint8)
        res = np.empty(n, np.uint8)
        lib.wire_grey_res_u8(
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            grey.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            res.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, _nthreads(),
        )
        return grey.reshape(shape), res.reshape(shape)
    s = rgb.reshape(-1, 3).astype(np.int32).sum(axis=1)
    grey = ((2 * s + 3) // 6).astype(np.int32)
    res = (s - 3 * grey + 1).astype(np.uint8)
    return grey.astype(np.uint8).reshape(shape), res.reshape(shape)


def wire_unpack(packed: np.ndarray, rows: int, cols: int,
                exc_idx: np.ndarray, exc_val: np.ndarray,
                bits: int = 4) -> np.ndarray:
    """Decode a device-packed delta plane (download direction of the wire
    codec — see io/wirecodec.py encode_plane_device) back to [rows, cols]
    u8 pixels: unpack nibbles, apply exceptions, prefix-sum rows mod 256.
    Threaded C when available; numpy fallback."""
    packed = np.ascontiguousarray(packed, dtype=np.uint8)
    exc_idx = np.ascontiguousarray(exc_idx, dtype=np.int64)
    exc_val = np.ascontiguousarray(exc_val, dtype=np.uint8)
    lib = get_lib()
    if lib is not None:
        out = np.empty((rows, cols), np.uint8)
        lib.wire_unpack(
            packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            rows, cols,
            exc_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            exc_val.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            exc_idx.size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            bits, _nthreads(),
        )
        return out
    group = 2 if bits == 4 else 4
    bias = 8 if bits == 4 else 2
    if bits == 4:
        nib = np.concatenate([packed & 0xF, packed >> 4], axis=0)
    else:
        nib = np.concatenate(
            [(packed >> s) & 3 for s in (0, 2, 4, 6)], axis=0)
    delta = (nib[:rows].astype(np.int64) - bias) & 0xFF
    flat = delta.reshape(-1)
    flat[exc_idx] = exc_val
    return (np.cumsum(flat.reshape(rows, cols), axis=1) & 0xFF).astype(
        np.uint8)
