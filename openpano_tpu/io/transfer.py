"""Fast device->host transfers.

On the tunneled TPU transport the device->host copy cost scales with
*element count* (~14M elements/s single-stream) rather than bytes, so a
large uint8 buffer (the stitched panorama) downloads ~4x faster when
bitcast to int32 first, and another ~15% when fetched as several
concurrent slices.  Measured on a 34MB canvas: plain np.asarray 2.26s,
bitcast+16-chunk fetch 0.55s (~60 MB/s, the transport's byte floor).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_DEFAULT_CHUNKS = 16
# below this many bytes a single plain fetch wins (per-chunk overhead)
_MIN_CHUNK_BYTES = 1 << 20


@jax.jit
def _delta_rows(u8_2d):
    """Row-wise horizontal delta (mod 256) of a [R, C] uint8 plane: photo
    rows become near-zero streams that the relay's compressor shrinks."""
    x = u8_2d.astype(jnp.int32)
    d = jnp.concatenate([x[:, :1], (x[:, 1:] - x[:, :-1]) & 0xFF], axis=1)
    return d.astype(jnp.uint8)


@jax.jit
def _undelta_rows(u8_2d):
    """Inverse of _delta_rows on device (for uploads)."""
    x = u8_2d.astype(jnp.int32)
    return (jnp.cumsum(x, axis=1) & 0xFF).astype(jnp.uint8)


def _np_undelta_rows(d: np.ndarray) -> np.ndarray:
    from ..native import delta_decode_rows

    return delta_decode_rows(d)


def _delta_rows_shape(shape) -> tuple[int, int]:
    """Delta runs along image rows: [..., H, W, C] -> (.*H, W*C) planes."""
    if len(shape) >= 3:
        return int(np.prod(shape[:-2])), int(shape[-2] * shape[-1])
    if len(shape) == 2:
        return int(shape[0]), int(shape[1])
    return 1, int(np.prod(shape))


def fetch_u8_delta(arr, chunks: int = _DEFAULT_CHUNKS) -> np.ndarray:
    """Device->host copy of a uint8 array via row-delta coding.

    The tunnel transport compresses its stream; smooth image data delta-
    codes to near-zero bytes and transfers several times faster.  The
    delta plane is computed on device (one subtract) and undone on host
    with a cumsum; deltas run along image rows (last two axes)."""
    shape = arr.shape
    d = _delta_rows(arr.reshape(_delta_rows_shape(shape)))
    host = fetch(d, chunks)
    return _np_undelta_rows(host).reshape(shape)


def device_put_u8_delta(arr: np.ndarray, device=None):
    """Host->device upload of uint8 data via row-delta coding (inverse
    cumsum runs on device).  Returns a device array of the same shape."""
    from ..native import delta_encode_rows

    shape = arr.shape
    d = delta_encode_rows(arr.reshape(_delta_rows_shape(shape)))
    dev = jax.device_put(d, device)
    return _undelta_rows(dev).reshape(shape)


def fetch(arr, chunks: int = _DEFAULT_CHUNKS) -> np.ndarray:
    """Device->host copy of ``arr``, minimising transport element count.

    uint8/int8 arrays are bitcast to int32 (4 bytes/element) on device;
    every array is fetched as up to ``chunks`` concurrent slices.
    Returns a host ndarray with the original shape and dtype.
    """
    if isinstance(arr, np.ndarray):
        return arr
    shape = arr.shape
    dtype = arr.dtype
    flat = arr.reshape(-1)
    pad = 0
    if dtype.itemsize == 1:
        pad = (-flat.size) % 4
        if pad:
            flat = jnp.pad(flat, (0, pad))
        flat = jax.lax.bitcast_convert_type(
            flat.reshape(-1, 4), jnp.int32
        ).ravel()
    k = int(min(chunks, max(1, flat.nbytes // _MIN_CHUNK_BYTES)))
    if k <= 1:
        host = np.asarray(flat)
    else:
        bounds = np.linspace(0, flat.size, k + 1).astype(int)
        parts = [flat[a:b] for a, b in zip(bounds[:-1], bounds[1:])]
        host = np.concatenate(jax.device_get(parts))
    if dtype.itemsize == 1:
        host = host.view(dtype)
        if pad:
            host = host[: host.size - pad]
    return host.reshape(shape)
