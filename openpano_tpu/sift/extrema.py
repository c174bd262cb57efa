"""DoG extrema detection with sub-pixel/scale Newton refinement.

Reference behavior (feature/extrema.cc):
- Candidate iff center >= PRE_COLOR_THRES and strictly max/min vs its 26
  neighbors with margin JUDGE_EXTREMA_DIFF_THRES (extrema.cc:170-216),
  scanned over dog levels j in [1, NUM_SCALE-3] and interior pixels.
- Up to CALC_OFFSET_DEPTH Newton iterations on the 3x3x3 quadratic fit
  (extrema.cc:63-106): offset = H^-1 grad (the reference's sign convention),
  re-centering by round(offset) until max|offset| < OFFSET_THRES.
- Contrast gate D + offset.grad/2 >= CONTRAST_THRES (extrema.cc:91-94) and
  2x2 Hessian edge rejection tr^2/det < (EDGE_RATIO+1)^2/EDGE_RATIO
  (extrema.cc:152-168).

TPU-native design: the 26-neighbor scan is a dense elementwise pass over the
whole DoG stack; candidates are compacted to a fixed cap with masked
``nonzero``; refinement runs as a masked fixed-depth loop over the compact
candidate array using batched gathers (no per-pixel host loops).

Deviation from the reference: a singular 3x3 Hessian fails the keypoint
instead of taking the pseudo-inverse step (extrema.cc:144-146) — the case is
degenerate and vanishingly rare.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import Config
from ..ops.compact import compact_indices, compact_indices_capped
from .pyramid import Octave


class RawKeypoints(NamedTuple):
    """Refined per-octave keypoints, fixed size K (mask-padded)."""
    x: jnp.ndarray            # [K] int32, integer coords in octave pixels
    y: jnp.ndarray            # [K] int32
    s: jnp.ndarray            # [K] int32 scale id in [1, NUM_SCALE-3]
    scale_factor: jnp.ndarray # [K] f32
    real_x: jnp.ndarray       # [K] f32, sub-pixel coords in [0,1)
    real_y: jnp.ndarray       # [K] f32
    valid: jnp.ndarray        # [K] bool


def _neighbor_max(dog: jnp.ndarray) -> jnp.ndarray:
    """Max over each voxel's 26 neighbors (center EXCLUDED), separably:
    3-tap row maxima -> per-plane 9-maxima for the s+-1 planes + an
    8-neighbor in-plane max for the center plane — 8 elementwise max
    passes instead of 26 shifted ones."""
    big = jnp.float32(3.4e38)
    pm = jnp.pad(dog, 1, constant_values=-big)           # [L+2, H+2, W+2]
    row = jnp.maximum(
        jnp.maximum(pm[:, :, :-2], pm[:, :, 1:-1]), pm[:, :, 2:]
    )                                                    # [L+2, H+2, W]
    nine = jnp.maximum(
        jnp.maximum(row[:, :-2, :], row[:, 1:-1, :]), row[:, 2:, :]
    )                                                    # [L+2, H, W]
    mid_lr = jnp.maximum(pm[:, 1:-1, :-2], pm[:, 1:-1, 2:])
    eight = jnp.maximum(
        jnp.maximum(row[:, :-2, :], row[:, 2:, :]), mid_lr
    )                                                    # center plane, no center
    return jnp.maximum(jnp.maximum(nine[:-2], nine[2:]), eight[1:-1])


def _candidate_mask(dog: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """[L, H, W] bool: 26-neighbor strict extrema with margin."""
    L, h, w = dog.shape
    thres = cfg.JUDGE_EXTREMA_DIFF_THRES
    nmax = _neighbor_max(dog)
    nmin = -_neighbor_max(-dog)
    is_max = nmax < dog - thres
    is_min = nmin > dog + thres
    cand = (dog >= cfg.PRE_COLOR_THRES) & (is_max | is_min)

    mask = jnp.zeros(dog.shape, dtype=bool)
    # scanned levels j in [1, NUM_SCALE-3] (extrema.cc:41), interior pixels
    mask = mask.at[1 : cfg.NUM_SCALE - 2, 1 : h - 1, 1 : w - 1].set(True)
    return cand & mask


def _gather(dog, s, y, x):
    return dog[s, y, x]


def _stencil(dog, s, y, x):
    """Gradient and Hessian of the 3x3x3 quadratic fit at integer (s,y,x)
    (reference: extrema.cc:108-140). All inputs [K]; coords must be interior
    (caller clips; failed lanes are masked out)."""
    D = lambda ds, dy, dx: _gather(dog, s + ds, y + dy, x + dx)
    val = D(0, 0, 0)
    gx = (D(0, 0, 1) - D(0, 0, -1)) / 2.0
    gy = (D(0, 1, 0) - D(0, -1, 0)) / 2.0
    gs = (D(1, 0, 0) - D(-1, 0, 0)) / 2.0
    dxx = D(0, 0, 1) + D(0, 0, -1) - 2 * val
    dyy = D(0, 1, 0) + D(0, -1, 0) - 2 * val
    dss = D(1, 0, 0) + D(-1, 0, 0) - 2 * val
    dxy = (D(0, 1, 1) - D(0, -1, 1) - D(0, 1, -1) + D(0, -1, -1)) / 4.0
    dys = (D(1, 1, 0) - D(1, -1, 0) - D(-1, 1, 0) + D(-1, -1, 0)) / 4.0
    dsx = (D(1, 0, 1) - D(1, 0, -1) - D(-1, 0, 1) + D(-1, 0, -1)) / 4.0
    return val, (gx, gy, gs), (dxx, dyy, dss, dxy, dys, dsx)


def _solve3x3(hess, grad):
    """offset = H^-1 g via the adjugate; returns (ox, oy, os, ok)."""
    dxx, dyy, dss, dxy, dys, dsx = hess
    gx, gy, gs = grad
    # symmetric H = [[dxx, dxy, dsx], [dxy, dyy, dys], [dsx, dys, dss]]
    c00 = dyy * dss - dys * dys
    c01 = dsx * dys - dxy * dss
    c02 = dxy * dys - dsx * dyy
    c11 = dxx * dss - dsx * dsx
    c12 = dsx * dxy - dxx * dys
    c22 = dxx * dyy - dxy * dxy
    det = dxx * c00 + dxy * c01 + dsx * c02
    ok = jnp.abs(det) > 1e-18
    idet = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    ox = (c00 * gx + c01 * gy + c02 * gs) * idet
    oy = (c01 * gx + c11 * gy + c12 * gs) * idet
    os_ = (c02 * gx + c12 * gy + c22 * gs) * idet
    return ox, oy, os_, ok


def detect_extrema(octave: Octave, cfg: Config, cap_cand: int | None = None,
                   cap_kp: int | None = None) -> RawKeypoints:
    dog = octave.dog
    L, h, w = dog.shape
    ns = cfg.NUM_SCALE
    cap_cand = cfg.MAX_CAND_PER_OCTAVE if cap_cand is None else cap_cand
    cap_kp = cfg.MAX_KP_PER_OCTAVE if cap_kp is None else cap_kp

    # only levels j in [1, NUM_SCALE-3] are scanned (extrema.cc:41) — slice
    # them out BEFORE compaction so the flat mask is 1/3 smaller (the
    # never-scanned boundary levels' neighbor-max work DCEs away too)
    cand = _candidate_mask(dog, cfg)[1 : ns - 2]
    # capped compaction: strict 26-neighbor extrema are never adjacent, so
    # 32 hits per 128 lanes is a safe local bound and this avoids the exact
    # algorithm's per-slot row gather over the multi-million-lane mask
    flat_idx, n_cand = compact_indices_capped(cand.reshape(-1), cap_cand)
    lane = jnp.arange(cap_cand)
    alive = lane < n_cand

    s = (flat_idx // (h * w)).astype(jnp.int32) + 1
    y = ((flat_idx // w) % h).astype(jnp.int32)
    x = (flat_idx % w).astype(jnp.int32)

    done = jnp.zeros_like(alive)
    fail = ~alive
    ox = jnp.zeros(x.shape, jnp.float32)
    oy = jnp.zeros(x.shape, jnp.float32)
    os_ = jnp.zeros(x.shape, jnp.float32)
    gfx = jnp.zeros(x.shape, jnp.float32)
    gfy = jnp.zeros(x.shape, jnp.float32)
    gfs = jnp.zeros(x.shape, jnp.float32)

    for _ in range(cfg.CALC_OFFSET_DEPTH):
        active = (~done) & (~fail)
        inb = (
            (x >= 1) & (x <= w - 2) & (y >= 1) & (y <= h - 2)
            & (s >= 1) & (s <= ns - 3)
        )
        fail = fail | (active & ~inb)
        active = active & inb
        sc = jnp.clip(s, 1, ns - 3)
        yc = jnp.clip(y, 1, h - 2)
        xc = jnp.clip(x, 1, w - 2)
        _, grad, hess = _stencil(dog, sc, yc, xc)
        nox, noy, nos, solvable = _solve3x3(hess, grad)
        fail = fail | (active & ~solvable)
        active = active & solvable
        conv = (
            jnp.maximum(jnp.abs(nox), jnp.maximum(jnp.abs(noy), jnp.abs(nos)))
            < cfg.OFFSET_THRES
        )
        newly = active & conv
        ox = jnp.where(newly, nox, ox)
        oy = jnp.where(newly, noy, oy)
        os_ = jnp.where(newly, nos, os_)
        gfx = jnp.where(newly, grad[0], gfx)
        gfy = jnp.where(newly, grad[1], gfy)
        gfs = jnp.where(newly, grad[2], gfs)
        done = done | newly
        step = active & ~conv
        x = jnp.where(step, x + jnp.round(nox).astype(jnp.int32), x)
        y = jnp.where(step, y + jnp.round(noy).astype(jnp.int32), y)
        s = jnp.where(step, s + jnp.round(nos).astype(jnp.int32), s)

    ok = done
    sc = jnp.clip(s, 1, ns - 3)
    yc = jnp.clip(y, 1, h - 2)
    xc = jnp.clip(x, 1, w - 2)

    # contrast gate: D(x_hat) = D + offset.grad/2 (extrema.cc:89-94)
    dextr = _gather(dog, sc, yc, xc) + (ox * gfx + oy * gfy + os_ * gfs) * 0.5
    ok = ok & (dextr >= cfg.CONTRAST_THRES)

    # edge response on the 2x2 spatial Hessian (extrema.cc:152-168)
    val = _gather(dog, sc, yc, xc)
    exx = _gather(dog, sc, yc, xc + 1) + _gather(dog, sc, yc, xc - 1) - 2 * val
    eyy = _gather(dog, sc, yc + 1, xc) + _gather(dog, sc, yc - 1, xc) - 2 * val
    exy = (
        _gather(dog, sc, yc + 1, xc + 1) + _gather(dog, sc, yc - 1, xc - 1)
        - _gather(dog, sc, yc + 1, xc - 1) - _gather(dog, sc, yc - 1, xc + 1)
    ) / 4.0
    edet = exx * eyy - exy * exy
    tr2 = (exx + eyy) ** 2
    not_edge = (edet > 0) & (tr2 / jnp.where(edet > 0, edet, 1.0)
                             < (cfg.EDGE_RATIO + 1.0) ** 2 / cfg.EDGE_RATIO)
    ok = ok & not_edge

    # compact survivors to the keypoint cap
    keep, n_keep = compact_indices(ok, cap_kp)
    kvalid = jnp.arange(cap_kp) < n_keep

    scale_factor = cfg.GAUSS_SIGMA * jnp.power(
        cfg.SCALE_FACTOR, (sc.astype(jnp.float32) + os_) / ns
    )
    real_x = (xc.astype(jnp.float32) + ox) / w
    real_y = (yc.astype(jnp.float32) + oy) / h

    return RawKeypoints(
        x=xc[keep], y=yc[keep], s=sc[keep],
        scale_factor=scale_factor[keep],
        real_x=real_x[keep], real_y=real_y[keep],
        valid=kvalid,
    )
