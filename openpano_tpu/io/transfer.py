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
