"""128-D RootSIFT descriptors.

Reference behavior (feature/sift.cc:87-152):
- Window radius round(sqrt(1/2)*hist_w*(DESC_HIST_WIDTH+1)) with
  hist_w = scale_factor*DESC_HIST_SCALE_FACTOR; circular mask; offsets span
  [-radius, radius] inclusive.
- Coordinates rotated into the keypoint direction; gaussian weight
  exp(-(x_rot^2+y_rot^2)/(2*DESC_HIST_WIDTH^2)) times gradient magnitude.
- Trilinear soft-binning into 4x4 spatial x 8 circular orientation bins
  (sift.cc:48-67).
- RootSIFT normalization: L1-normalize, sqrt, * DESC_INT_FACTOR
  (sift.cc:37-45).

TPU-native design: per-keypoint [WR, 128] mag/ort slabs come from the
Pallas window DMA kernel (ops/windows.py) instead of element gathers;
trilinear soft-binning is expressed as separable triangle ("hat") kernels
per bin axis, so the whole histogram becomes one batched matmul
  hist[k,(by,bx),bo] = sum_p (W*A_y*A_x)[k,p,(by,bx)] * C_ori[k,p,bo]
that runs on the MXU, processed in keypoint chunks (a lax.map loop inside
one XLA program) to bound the materialized WAB intermediate.  No scatter
ops anywhere.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import Config
from ..ops.windows import slab_rows
from .orientation import OrientedKeypoints, _round_half_away, max_scale_factor
from .pyramid import Octave


class Features(NamedTuple):
    """Final per-image features (fixed K, mask-padded)."""
    pos: jnp.ndarray   # [K, 2] half-shifted original-image coords (x, y)
    desc: jnp.ndarray  # [K, 128]
    valid: jnp.ndarray # [K] bool


def desc_window_radius(cfg: Config) -> int:
    hist_w = max_scale_factor(cfg) * cfg.DESC_HIST_SCALE_FACTOR
    return int(round((0.5 ** 0.5) * hist_w * (cfg.DESC_HIST_WIDTH + 1)))


def compute_descriptors(kp: OrientedKeypoints, octave: Octave, cfg: Config) -> jnp.ndarray:
    """Returns [K, 128] descriptors for oriented keypoints of one octave."""
    return describe_keypoints(kp, octave.mag, octave.ort, cfg)


def describe_keypoints(kp: OrientedKeypoints, mag: jnp.ndarray,
                       ort: jnp.ndarray, cfg: Config,
                       wh: jnp.ndarray | None = None) -> jnp.ndarray:
    """[K, 128] RootSIFT descriptors over arbitrary (possibly
    octave-stacked) mag/ort planes; wh: optional [K,2] per-keypoint (w, h).

    The rotated trilinear histogram runs as one fused window-DMA +
    soft-binning kernel (ops/windows.descriptor_histogram); only the tiny
    [K, 128] RootSIFT normalization happens here."""
    W4 = cfg.DESC_HIST_WIDTH          # 4
    NB = cfg.DESC_HIST_BIN_NUM        # 8
    from ..ops.windows import DESC_NB, DESC_W4, descriptor_histogram
    assert (W4, NB) == (DESC_W4, DESC_NB), (W4, NB)
    R = desc_window_radius(cfg)
    WR = slab_rows(R)

    hist_w = kp.scale_factor * cfg.DESC_HIST_SCALE_FACTOR
    radius = _round_half_away((0.5 ** 0.5) * hist_w * (W4 + 1))
    hists = descriptor_histogram(
        mag, ort, kp.s, kp.y, kp.x, radius, hist_w, kp.dir, WR, wh=wh,
        valid=kp.valid,
    )

    # RootSIFT (sift.cc:37-45)
    ssum = jnp.sum(hists, axis=1, keepdims=True)
    desc = jnp.sqrt(hists / jnp.where(ssum > 0, ssum, 1.0)) * cfg.DESC_INT_FACTOR
    return jnp.where(ssum > 0, desc, 0.0)
