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

TPU-native design: trilinear soft-binning is expressed as separable triangle
("hat") kernels per bin axis, so the whole histogram becomes one batched
matmul  hist[k,(by,bx),bo] = sum_p (W*A_y*A_x)[k,p,(by,bx)] * C_ori[k,p,bo]
that runs on the MXU, processed in keypoint chunks to bound VMEM/HBM
footprint.  No scatter ops anywhere.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import Config
from .orientation import OrientedKeypoints, _round_half_away, gather_windows, max_scale_factor
from .pyramid import Octave

_CHUNK = 128  # keypoints per descriptor matmul chunk


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
    d = jnp.arange(-R, R + 1)
    offs_y = jnp.repeat(d, 2 * R + 1)  # [P]
    offs_x = jnp.tile(d, 2 * R + 1)
    r2 = (offs_y ** 2 + offs_x ** 2).astype(jnp.float32)
    P = offs_y.shape[0]
    _, H, Wimg = octave.mag.shape

    def chunk_desc(args):
        cx, cy, cs, csf, cdir = args
        mag = gather_windows(octave.mag, cs, cy, cx, offs_y, offs_x)  # [C,P]
        ort = gather_windows(octave.ort, cs, cy, cx, offs_y, offs_x)

        hist_w = csf * cfg.DESC_HIST_SCALE_FACTOR                     # [C]
        radius = _round_half_away((0.5 ** 0.5) * hist_w * (W4 + 1))   # [C]
        newy = cy[:, None] + offs_y[None, :]
        newx = cx[:, None] + offs_x[None, :]
        inside = (
            (jnp.abs(offs_y[None, :]) <= radius[:, None])
            & (jnp.abs(offs_x[None, :]) <= radius[:, None])
            & (r2[None, :] <= (radius * radius)[:, None])
            & (newx >= 1) & (newx <= Wimg - 2)
            & (newy >= 1) & (newy <= H - 2)
        )
        cos_o = jnp.cos(cdir)[:, None]
        sin_o = jnp.sin(cdir)[:, None]
        fx = offs_x[None, :].astype(jnp.float32)
        fy = offs_y[None, :].astype(jnp.float32)
        x_rot = (fx * cos_o + fy * sin_o) / hist_w[:, None]
        y_rot = (-fx * sin_o + fy * cos_o) / hist_w[:, None]
        ybin = y_rot + W4 / 2 - 0.5
        xbin = x_rot + W4 / 2 - 0.5
        inside &= (ybin >= -1) & (ybin <= W4 - 1) & (xbin >= -1) & (xbin <= W4 - 1)

        weight = jnp.exp(-(x_rot ** 2 + y_rot ** 2) / (2.0 * W4 * W4)) * mag
        weight = jnp.where(inside, weight, 0.0)

        now_ort = ort - cdir[:, None]
        now_ort = jnp.where(now_ort < 0, now_ort + 2 * jnp.pi, now_ort)
        now_ort = jnp.where(now_ort > 2 * jnp.pi, now_ort - 2 * jnp.pi, now_ort)
        hbin = now_ort * (NB / (2.0 * jnp.pi))  # [C,P] in [0, NB]

        # separable triangle kernels == trilinear soft binning (sift.cc:48-67)
        by = jnp.arange(W4, dtype=jnp.float32)
        A = _hat(ybin[:, :, None] - by)                         # [C,P,4]
        B = _hat(xbin[:, :, None] - by)                         # [C,P,4]
        bo = jnp.arange(NB, dtype=jnp.float32)
        do_ = jnp.abs(hbin[:, :, None] - bo)
        C_ = _hat(jnp.minimum(do_, NB - do_))                   # [C,P,8] circular
        WAB = (weight[:, :, None, None] * A[:, :, :, None] * B[:, :, None, :]).reshape(
            -1, P, W4 * W4
        )                                                       # [C,P,16]
        hist = jnp.einsum("cpq,cpo->cqo", WAB, C_)              # [C,16,8] (MXU)
        return hist.reshape(-1, W4 * W4 * NB)

    nchunk = -(-K // _CHUNK)
    Kp = nchunk * _CHUNK
    pad = lambda a: jnp.pad(a, (0, Kp - K)).reshape(nchunk, _CHUNK)
    hists = jax.lax.map(
        chunk_desc,
        (pad(kp.x), pad(kp.y), pad(kp.s), pad(kp.scale_factor), pad(kp.dir)),
    ).reshape(Kp, -1)[:K]

    # RootSIFT (sift.cc:37-45)
    ssum = jnp.sum(hists, axis=1, keepdims=True)
    desc = jnp.sqrt(hists / jnp.where(ssum > 0, ssum, 1.0)) * cfg.DESC_INT_FACTOR
    return jnp.where(ssum > 0, desc, 0.0)
