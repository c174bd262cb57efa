"""Separable Gaussian blur with the reference's kernel construction.

Kernel window: ``kw = ceil(0.3*(sigma/2-1)+0.8)*GAUSS_WINDOW_FACTOR``,
forced odd, truncated-normalized (reference: feature/gaussian.cc:17-40);
border handling is edge replication (gaussian.hh:52-60).  Expressed as two
1-D convolutions that XLA fuses and vectorizes; the multi-scale pyramid
always blurs scale 0 (not cascaded), matching dog.cc:54-55.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import gauss_window_radius


@functools.lru_cache(maxsize=64)
def gauss_kernel(sigma: float, window_factor: int) -> np.ndarray:
    """1-D normalized Gaussian taps, length 2*center+1."""
    center = gauss_window_radius(sigma, window_factor)
    i = np.arange(-center, center + 1, dtype=np.float64)
    k = np.exp(-(i * i) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def blur(img: jnp.ndarray, sigma: float, window_factor: int = 6) -> jnp.ndarray:
    """Separable Gaussian blur of a single-channel image [..., H, W] with
    edge-replicated borders. Leading dims are batched."""
    kernel = jnp.asarray(gauss_kernel(float(sigma), int(window_factor)))
    c = kernel.shape[0] // 2

    def conv_last(x):  # convolve along the last axis
        lead = x.shape[:-1]
        n = x.shape[-1]
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(c, c)], mode="edge")
        xp = xp.reshape(-1, 1, xp.shape[-1])
        out = jax.lax.conv_general_dilated(
            xp, kernel.reshape(1, 1, -1),
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        return out.reshape(*lead, n)

    # column pass first, then row pass — edge replication makes the order
    # observable near borders (reference: gaussian.hh:52-88)
    out = jnp.swapaxes(conv_last(jnp.swapaxes(img, -1, -2)), -1, -2)
    return conv_last(out)
