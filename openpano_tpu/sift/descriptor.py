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

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops.windows import gather_window_slabs, slab_rows, SLAB_LANES
from .orientation import OrientedKeypoints, _round_half_away, max_scale_factor, slab_offsets
from .pyramid import Octave

_CHUNK = 256  # keypoints per descriptor matmul chunk


class Features(NamedTuple):
    """Final per-image features (fixed K, mask-padded)."""
    pos: jnp.ndarray   # [K, 2] half-shifted original-image coords (x, y)
    desc: jnp.ndarray  # [K, 128]
    valid: jnp.ndarray # [K] bool


def desc_window_radius(cfg: Config) -> int:
    hist_w = max_scale_factor(cfg) * cfg.DESC_HIST_SCALE_FACTOR
    return int(round((0.5 ** 0.5) * hist_w * (cfg.DESC_HIST_WIDTH + 1)))


def _hat(dist):
    return jnp.maximum(0.0, 1.0 - jnp.abs(dist))


def compute_descriptors(kp: OrientedKeypoints, octave: Octave, cfg: Config) -> jnp.ndarray:
    """Returns [K, 128] descriptors for oriented keypoints."""
    K = kp.x.shape[0]
    W4 = cfg.DESC_HIST_WIDTH          # 4
    NB = cfg.DESC_HIST_BIN_NUM        # 8
    R = desc_window_radius(cfg)
    WR = slab_rows(R)
    _, H, Wimg = octave.mag.shape

    mag, ort = gather_window_slabs(octave.mag, octave.ort, kp.s, kp.y, kp.x, WR)
    dy, dx = slab_offsets(kp.y, kp.x, H, Wimg, WR)
    P = WR * SLAB_LANES

    def chunk_desc(sl):
        cmag, cort, cdy, cdx, cy, cx, csf, cdir = sl
        r2 = (cdy * cdy + cdx * cdx).astype(jnp.float32)          # [C,WR,128]
        hist_w = csf * cfg.DESC_HIST_SCALE_FACTOR                 # [C]
        radius = _round_half_away((0.5 ** 0.5) * hist_w * (W4 + 1))[:, None, None]
        newy = cy[:, None, None] + cdy
        newx = cx[:, None, None] + cdx
        inside = (
            (jnp.abs(cdy) <= radius) & (jnp.abs(cdx) <= radius)
            & (r2 <= radius * radius)
            & (newx >= 1) & (newx <= Wimg - 2)
            & (newy >= 1) & (newy <= H - 2)
        )
        cos_o = jnp.cos(cdir)[:, None, None]
        sin_o = jnp.sin(cdir)[:, None, None]
        fx = cdx.astype(jnp.float32)
        fy = cdy.astype(jnp.float32)
        hw = hist_w[:, None, None]
        x_rot = (fx * cos_o + fy * sin_o) / hw
        y_rot = (-fx * sin_o + fy * cos_o) / hw
        ybin = y_rot + W4 / 2 - 0.5
        xbin = x_rot + W4 / 2 - 0.5
        inside &= (ybin >= -1) & (ybin <= W4 - 1) & (xbin >= -1) & (xbin <= W4 - 1)

        weight = jnp.exp(-(x_rot ** 2 + y_rot ** 2) / (2.0 * W4 * W4)) * cmag
        weight = jnp.where(inside, weight, 0.0)

        now_ort = cort - cdir[:, None, None]
        now_ort = jnp.where(now_ort < 0, now_ort + 2 * jnp.pi, now_ort)
        now_ort = jnp.where(now_ort > 2 * jnp.pi, now_ort - 2 * jnp.pi, now_ort)
        hbin = now_ort * (NB / (2.0 * jnp.pi))  # [C,WR,128] in [0, NB]

        C = weight.shape[0]
        flat = lambda a: a.reshape(C, P)
        # separable triangle kernels == trilinear soft binning (sift.cc:48-67)
        by = jnp.arange(W4, dtype=jnp.float32)
        A = _hat(flat(ybin)[:, :, None] - by)                   # [C,P,4]
        B = _hat(flat(xbin)[:, :, None] - by)                   # [C,P,4]
        bo = jnp.arange(NB, dtype=jnp.float32)
        do_ = jnp.abs(flat(hbin)[:, :, None] - bo)
        C_ = _hat(jnp.minimum(do_, NB - do_))                   # [C,P,8] circular
        WAB = (flat(weight)[:, :, None, None] * A[:, :, :, None] * B[:, :, None, :]).reshape(
            C, P, W4 * W4
        )                                                       # [C,P,16]
        hist = jnp.einsum("cpq,cpo->cqo", WAB, C_)              # [C,16,8] (MXU)
        return hist.reshape(C, W4 * W4 * NB)

    nchunk = max(1, -(-K // _CHUNK))
    Kp = nchunk * _CHUNK
    def pad(a):
        padw = [(0, Kp - K)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, padw).reshape((nchunk, _CHUNK) + a.shape[1:])
    hists = jax.lax.map(
        chunk_desc,
        (pad(mag), pad(ort), pad(jnp.broadcast_to(dy, mag.shape)),
         pad(jnp.broadcast_to(dx, mag.shape)),
         pad(kp.y), pad(kp.x), pad(kp.scale_factor), pad(kp.dir)),
    ).reshape(Kp, -1)[:K]

    # RootSIFT (sift.cc:37-45)
    ssum = jnp.sum(hists, axis=1, keepdims=True)
    desc = jnp.sqrt(hists / jnp.where(ssum > 0, ssum, 1.0)) * cfg.DESC_INT_FACTOR
    return jnp.where(ssum > 0, desc, 0.0)
