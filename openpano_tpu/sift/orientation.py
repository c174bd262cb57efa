"""Keypoint orientation assignment.

Reference behavior (feature/orientation.cc):
- 36-bin histogram of gradient orientation over a circular window of radius
  round(scale_factor*ORI_RADIUS), gaussian-weighted
  (sigma = scale_factor*ORI_WINDOW_FACTOR) times gradient magnitude
  (orientation.cc:47-66).  Window x,y offsets span [-rad, rad-1].
- Smoothed ORI_HIST_SMOOTH_COUNT times with a circular [.25 .5 .25] kernel
  (orientation.cc:70-75).
- Every strict local peak >= 0.8*max emits one orientation with parabolic
  interpolation (orientation.cc:77-98); one keypoint can yield several.

TPU-native design: per-keypoint [WR, 128] slabs of the mag/ort planes are
DMA'd by the Pallas window kernel (ops/windows.py); the 36-bin histogram is
36 fused masked reductions over the slab grid (bounded by slab HBM traffic,
no scatter and no one-hot materialization); peaks are extracted with top-k
into MAX_ORI_PER_KP slots.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops.compact import compact_indices
from ..ops.windows import (
    orientation_histogram, slab_rows, window_starts, SLAB_LANES,
)
from .extrema import RawKeypoints
from .pyramid import Octave


class OrientedKeypoints(NamedTuple):
    """[K] oriented keypoints (post-compaction over orientation slots)."""
    x: jnp.ndarray
    y: jnp.ndarray
    s: jnp.ndarray
    scale_factor: jnp.ndarray
    real_x: jnp.ndarray
    real_y: jnp.ndarray
    dir: jnp.ndarray
    valid: jnp.ndarray


def max_scale_factor(cfg: Config) -> float:
    """Upper bound on SSPoint.scale_factor: s <= NUM_SCALE-3, |offset.z| < OFFSET_THRES."""
    e = (cfg.NUM_SCALE - 3 + cfg.OFFSET_THRES) / cfg.NUM_SCALE
    return cfg.GAUSS_SIGMA * cfg.SCALE_FACTOR ** e


def ori_window_radius(cfg: Config) -> int:
    return int(round(max_scale_factor(cfg) * cfg.ORI_RADIUS))


def _round_half_away(x):
    """C round(): half away from zero (jnp.round is half-to-even)."""
    return jnp.floor(jnp.abs(x) + 0.5) * jnp.sign(x)


def slab_offsets(y, x, H: int, W: int, WR: int):
    """Per-lane (dy, dx) offsets of a [K, WR, 128] slab relative to its
    keypoint, as broadcastable [K, WR, 1] / [K, 1, 128] int32."""
    r0, c0 = window_starts(y, x, H, W, WR)
    dy = (r0[:, None] + jnp.arange(WR, dtype=jnp.int32))[:, :, None] - y[:, None, None]
    dx = (c0[:, None] + jnp.arange(SLAB_LANES, dtype=jnp.int32))[:, None, :] - x[:, None, None]
    return dy, dx


def assign_orientation(kp: RawKeypoints, octave: Octave, cfg: Config,
                       cap: int | None = None) -> OrientedKeypoints:
    cap = cfg.MAX_DESC_PER_OCTAVE if cap is None else cap
    out, _ = orient_keypoints(kp, octave.mag, octave.ort, cfg, cap)
    return out


def orient_keypoints(kp: RawKeypoints, mag: jnp.ndarray, ort: jnp.ndarray,
                     cfg: Config, cap: int, wh: jnp.ndarray | None = None):
    """Orientation assignment over arbitrary (possibly octave-stacked)
    mag/ort planes.  wh: optional [K, 2] per-keypoint (w, h) octave bounds.
    Returns (OrientedKeypoints sized cap, gathered wh or None)."""
    nbins = cfg.ORI_HIST_BIN_NUM
    from ..ops.windows import ORI_NBINS
    assert nbins == ORI_NBINS, (nbins, ORI_NBINS)
    R = ori_window_radius(cfg)
    WR = slab_rows(R)

    # circular window of per-keypoint radius (orientation.cc:47-58), fused
    # window-DMA + 36-bin histogram kernel (ops/windows.py): the [K,WR,256]
    # mag/ort slabs never leave VMEM
    rad = _round_half_away(kp.scale_factor * cfg.ORI_RADIUS)
    sigma = kp.scale_factor * cfg.ORI_WINDOW_FACTOR
    invden = 1.0 / (2.0 * sigma * sigma)
    hist = orientation_histogram(
        mag, ort, kp.s, kp.y, kp.x,
        rad.astype(jnp.float32), invden.astype(jnp.float32), WR, wh=wh,
        valid=kp.valid,
    )                                                               # [K, nbins]

    for _ in range(cfg.ORI_HIST_SMOOTH_COUNT):
        hist = hist * 0.5 + (jnp.roll(hist, 1, axis=1) + jnp.roll(hist, -1, axis=1)) * 0.25

    prev = jnp.roll(hist, 1, axis=1)
    nxt = jnp.roll(hist, -1, axis=1)
    thres = jnp.max(hist, axis=1, keepdims=True) * cfg.ORI_HIST_PEAK_RATIO
    peak = (hist > thres) & (hist > jnp.maximum(prev, nxt))

    score = jnp.where(peak, hist, -1.0)
    vals, idx = jax.lax.top_k(score, cfg.MAX_ORI_PER_KP)  # [K, M]
    take = jnp.take_along_axis
    p_prev = take(prev, idx, axis=1)
    p_next = take(nxt, idx, axis=1)
    p_cur = take(hist, idx, axis=1)
    denom = p_prev + p_next - 2.0 * p_cur  # strictly negative at a strict peak
    newbin = idx.astype(jnp.float32) - 0.5 + (p_cur - p_prev) / jnp.where(denom == 0, -1.0, denom)
    newbin = jnp.where(newbin < 0, newbin + nbins, newbin)
    newbin = jnp.where(newbin >= nbins, newbin - nbins, newbin)
    dirs = newbin / nbins * 2.0 * jnp.pi  # [K, M]
    ok = (vals > 0) & kp.valid[:, None]  # [K, M]

    # flatten orientation slots and compact to the descriptor cap
    M = cfg.MAX_ORI_PER_KP
    flat_ok = ok.reshape(-1)
    keep, n_keep = compact_indices(flat_ok, cap)
    kvalid = jnp.arange(cap) < n_keep
    kp_idx = keep // M

    out = OrientedKeypoints(
        x=kp.x[kp_idx], y=kp.y[kp_idx], s=kp.s[kp_idx],
        scale_factor=kp.scale_factor[kp_idx],
        real_x=kp.real_x[kp_idx], real_y=kp.real_y[kp_idx],
        dir=dirs.reshape(-1)[keep],
        valid=kvalid,
    )
    return out, (None if wh is None else wh[kp_idx])
