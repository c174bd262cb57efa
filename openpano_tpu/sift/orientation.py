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

TPU-native design: a static (2R)^2 window per keypoint (R bounds the maximal
dynamic radius), gathered batched; the histogram is a masked one-hot
contraction (MXU), peaks are extracted with top-k into MAX_ORI_PER_KP slots.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops.compact import compact_indices
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


def gather_windows(plane: jnp.ndarray, s, y, x, offs_y, offs_x):
    """Gather plane[s, y+dy, x+dx] for a static offset grid.

    plane: [S, H, W]; s,y,x: [K] ints; offs_y/offs_x: [P] ints.
    Returns [K, P] (coords are clipped; caller masks out-of-range lanes).
    """
    S, H, W = plane.shape
    yy = jnp.clip(y[:, None] + offs_y[None, :], 0, H - 1)
    xx = jnp.clip(x[:, None] + offs_x[None, :], 0, W - 1)
    return plane[s[:, None], yy, xx]


def assign_orientation(kp: RawKeypoints, octave: Octave, cfg: Config) -> OrientedKeypoints:
    K = kp.x.shape[0]
    nbins = cfg.ORI_HIST_BIN_NUM
    R = ori_window_radius(cfg)
    # window offsets: [-R, R-1] per axis (orientation.cc:55-58)
    d = jnp.arange(-R, R)
    offs_y = jnp.repeat(d, 2 * R)
    offs_x = jnp.tile(d, 2 * R)
    r2 = (offs_y ** 2 + offs_x ** 2).astype(jnp.float32)  # [P]

    _, H, W = octave.mag.shape
    mag = gather_windows(octave.mag, kp.s, kp.y, kp.x, offs_y, offs_x)  # [K,P]
    ort = gather_windows(octave.ort, kp.s, kp.y, kp.x, offs_y, offs_x)

    rad = _round_half_away(kp.scale_factor * cfg.ORI_RADIUS)[:, None]  # [K,1]
    newy = kp.y[:, None] + offs_y[None, :]
    newx = kp.x[:, None] + offs_x[None, :]
    inside = (
        (offs_y[None, :] >= -rad) & (offs_y[None, :] <= rad - 1)
        & (offs_x[None, :] >= -rad) & (offs_x[None, :] <= rad - 1)
        & (r2[None, :] <= rad * rad)
        & (newx >= 1) & (newx <= W - 2) & (newy >= 1) & (newy <= H - 2)
    )
    sigma = kp.scale_factor * cfg.ORI_WINDOW_FACTOR
    exp_denom = 2.0 * sigma * sigma
    wgt = jnp.exp(-r2[None, :] / exp_denom[:, None]) * mag
    wgt = jnp.where(inside, wgt, 0.0)

    # hard binning: bin = round(nbins * ort / 2pi), nbins -> 0 (orientation.cc:59-62)
    bins = _round_half_away(nbins * ort / (2.0 * jnp.pi)).astype(jnp.int32) % nbins
    onehot = (bins[:, :, None] == jnp.arange(nbins)[None, None, :]).astype(jnp.float32)
    hist = jnp.einsum("kp,kpb->kb", wgt, onehot)  # [K, nbins]

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
    keep, n_keep = compact_indices(flat_ok, cfg.MAX_DESC_PER_OCTAVE)
    kvalid = jnp.arange(cfg.MAX_DESC_PER_OCTAVE) < n_keep
    kp_idx = keep // M

    return OrientedKeypoints(
        x=kp.x[kp_idx], y=kp.y[kp_idx], s=kp.s[kp_idx],
        scale_factor=kp.scale_factor[kp_idx],
        real_x=kp.real_x[kp_idx], real_y=kp.real_y[kp_idx],
        dir=dirs.reshape(-1)[keep],
        valid=kvalid,
    )
