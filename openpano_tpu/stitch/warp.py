"""Cylindrical pre-warp (CYLINDER mode).

Reference: stitch/warp.{hh,cc}.  The projector maps source pixel p to
``(atan((x-cx)/r), (y-cy)/hypot(x-cx, r))`` scaled by ``sizefactor``(=r),
with radius ``r = int(hypot(w,h) * FOCAL_LENGTH / 43.266)`` (35mm-diagonal;
warp.cc:70-75) and center ``(w//2, (h//2)*h_factor, r)``.  Image warping is
inverse mapping through ``proj_r`` + bilinear (warp.cc:25-44).

TPU-native: the projected bbox is computed in closed form host-side (the
reference scans every pixel, warp.cc:49-53 — the extrema provably lie on the
borders / the x=cx column, so only those are evaluated), keypoint warping is
a tiny vectorized map, and image warping is one batched inverse-map gather
per image stack.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops.imgproc import sample_bilinear, INVALID


class CylinderProjector(NamedTuple):
    """Per-image cylinder projection parameters (all Python floats; the
    projector for image k depends only on its shape and h_factor)."""

    r: float       # integer-truncated radius (reference keeps int, warp.cc:71)
    cx: float      # w // 2
    cy: float      # (h // 2) * h_factor
    sizefactor: float  # == r
    # projected-bbox offset and warped size (host-computed, static)
    offset_x: float
    offset_y: float
    out_w: int
    out_h: int


def make_projector(w: int, h: int, h_factor: float, cfg: Config) -> CylinderProjector:
    r = float(int(math.hypot(w, h) * (cfg.FOCAL_LENGTH / 43.266)))
    cx = float(w // 2)
    cy = float(h // 2) * h_factor

    # closed-form bbox of proj over the pixel grid [0,w) x [0,h)
    # (replaces the full-grid scan at warp.cc:49-53):
    # x-extremes at j=0 / j=w-1 (atan monotonic); y-extremes on the top/bottom
    # rows, at j as close to cx as possible (hypot minimal) for the larger |dy|
    # side and at the row corners for the smaller side.
    xs = np.array([0.0, w - 1.0])
    px = np.arctan((xs - cx) / r)
    min_x, max_x = px.min() * r, px.max() * r

    jcands = np.array([0.0, np.clip(cx, 0, w - 1.0), w - 1.0])
    ys = np.array([0.0, h - 1.0])
    py = (ys[:, None] - cy) / np.hypot(jcands[None, :] - cx, r)
    min_y, max_y = py.min() * r, py.max() * r

    # python floats (weakly typed in jax) so the f32 image path stays f32
    offset_x, offset_y = float(-min_x), float(-min_y)
    out_w = int(max_x - min_x)
    out_h = int(max_y - min_y)
    return CylinderProjector(
        r=r, cx=cx, cy=cy, sizefactor=r,
        offset_x=offset_x, offset_y=offset_y, out_w=out_w, out_h=out_h,
    )


def warp_keypoints(proj: CylinderProjector, pts: jnp.ndarray, w: int, h: int) -> jnp.ndarray:
    """Warp half-shifted keypoint coords [...,2] into warped-image
    half-shifted coords (reference: CylinderProject::project pts loop,
    warp.cc:57-63: f = proj(f + (w/2, h/2)) * sizefactor + offset - size/2)."""
    x = pts[..., 0] + w / 2.0
    y = pts[..., 1] + h / 2.0
    px = jnp.arctan((x - proj.cx) / proj.r)
    py = (y - proj.cy) / jnp.hypot(x - proj.cx, proj.r)
    nx = px * proj.sizefactor + proj.offset_x - proj.out_w // 2
    ny = py * proj.sizefactor + proj.offset_y - proj.out_h // 2
    return jnp.stack([nx, ny], axis=-1)


def warp_image(proj: CylinderProjector, img: jnp.ndarray, out_h: int, out_w: int,
               src_w: int, src_h: int) -> jnp.ndarray:
    """Inverse-map warp one [H,W,3] image into a [out_h,out_w,3] canvas
    (warp.cc:25-44); pixels outside the source get the INVALID sentinel.
    out_h/out_w may exceed the projector's own size (padding for batching)."""
    jj = jnp.arange(out_w, dtype=jnp.float32)
    ii = jnp.arange(out_h, dtype=jnp.float32)
    px = (jj - proj.offset_x) / proj.sizefactor
    py = (ii - proj.offset_y) / proj.sizefactor
    # proj_r (warp.cc:19-23)
    ox = proj.r * jnp.tan(px) + proj.cx                       # [W']
    oy = py[:, None] * (proj.r / jnp.cos(px))[None, :] + proj.cy  # [H',W']
    oxg = jnp.broadcast_to(ox[None, :], (out_h, out_w))
    inb = (oxg >= 0) & (oxg < src_w) & (oy >= 0) & (oy < src_h)
    color, valid = sample_bilinear(img, oy, oxg, )
    ok = inb & valid & (jnp.arange(out_w)[None, :] < proj.out_w) & (
        jnp.arange(out_h)[:, None] < proj.out_h
    )
    return jnp.where(ok[..., None], color, INVALID)
