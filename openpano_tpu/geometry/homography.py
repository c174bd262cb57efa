"""3x3 homography utilities, batched and jit-friendly.

The reference wraps a row-major double[9] with Eigen-backed compose/inverse
(stitch/homography.hh:20-165, homography.cc:25-48).  Here a homography is
just a [..., 3, 3] array; composition is `@`.  All predicates return boolean
arrays instead of branching, so they vmap over RANSAC hypothesis batches.

Coordinate convention: half-shifted image coordinates in [-w/2, w/2] x
[-h/2, h/2] (reference: Shape2D, stitch/match_info.hh:53-78), shapes are
(w, h) pairs.
"""

from __future__ import annotations

import jax.numpy as jnp

HOMO_MAX_PERSPECTIVE = 2e-3


def trans2d(H: jnp.ndarray, pts: jnp.ndarray, eps: float = 0.0):
    """Apply [...,3,3] to [...,N,2] points with projective divide.

    Returns (xy [...,N,2], z [...,N]) — callers use z to mask behind-lens
    points (reference discards z<0 at stitcher_image.cc:146-147)."""
    xyz = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    out = jnp.einsum("...ij,...nj->...ni", H, xyz)
    z = out[..., 2]
    denom = jnp.where(jnp.abs(z) > eps, z, jnp.where(z >= 0, 1e-20, -1e-20))
    return out[..., :2] / denom[..., None], z


def det3(H: jnp.ndarray) -> jnp.ndarray:
    """Closed-form [...,3,3] determinant (avoids the TPU LU custom call)."""
    return (
        H[..., 0, 0] * (H[..., 1, 1] * H[..., 2, 2] - H[..., 1, 2] * H[..., 2, 1])
        - H[..., 0, 1] * (H[..., 1, 0] * H[..., 2, 2] - H[..., 1, 2] * H[..., 2, 0])
        + H[..., 0, 2] * (H[..., 1, 0] * H[..., 2, 1] - H[..., 1, 1] * H[..., 2, 0])
    )


def homo_inverse(H: jnp.ndarray):
    """Inverse with a success flag (reference: Homography::inverse,
    homography.cc:25-39 — FullPivLU invertibility check).  Closed-form
    adjugate: batched 3x3 jnp.linalg.inv lowers to the serialized TPU
    LuDecompositionBlock custom call."""
    det = det3(H)
    ok = jnp.abs(det) > 1e-12
    dsafe = jnp.where(ok, det, 1.0)
    adj = jnp.stack([
        jnp.stack([
            H[..., 1, 1] * H[..., 2, 2] - H[..., 1, 2] * H[..., 2, 1],
            H[..., 0, 2] * H[..., 2, 1] - H[..., 0, 1] * H[..., 2, 2],
            H[..., 0, 1] * H[..., 1, 2] - H[..., 0, 2] * H[..., 1, 1]], -1),
        jnp.stack([
            H[..., 1, 2] * H[..., 2, 0] - H[..., 1, 0] * H[..., 2, 2],
            H[..., 0, 0] * H[..., 2, 2] - H[..., 0, 2] * H[..., 2, 0],
            H[..., 0, 2] * H[..., 1, 0] - H[..., 0, 0] * H[..., 1, 2]], -1),
        jnp.stack([
            H[..., 1, 0] * H[..., 2, 1] - H[..., 1, 1] * H[..., 2, 0],
            H[..., 0, 1] * H[..., 2, 0] - H[..., 0, 0] * H[..., 2, 1],
            H[..., 0, 0] * H[..., 1, 1] - H[..., 0, 1] * H[..., 1, 0]], -1),
    ], -2)
    inv = adj / dsafe[..., None, None]
    inv = jnp.where(ok[..., None, None], inv, jnp.eye(3, dtype=H.dtype))
    return inv, ok


def translation(dx, dy, dtype=jnp.float32) -> jnp.ndarray:
    """(reference: Homography::get_translation, homography.hh:133-138)."""
    H = jnp.eye(3, dtype=dtype)
    return H.at[0, 2].set(dx).at[1, 2].set(dy)


def health(H: jnp.ndarray) -> jnp.ndarray:
    """Sanity predicate on [...,3,3]: small perspective terms and no flip
    (reference: Homography::health, homography.hh:106-127).  The flip test
    compares raw homogeneous components of H(0,0), H(0,1), H(1,1) exactly as
    the reference does (no perspective divide)."""
    ok = (jnp.abs(H[..., 2, 0]) <= HOMO_MAX_PERSPECTIVE) & (
        jnp.abs(H[..., 2, 1]) <= HOMO_MAX_PERSPECTIVE
    )
    # y of H*(0,1,1) must exceed y of H*(0,0,1); x of H*(1,1,1) must exceed
    # x of H*(0,1,1)  — homography.hh:113-124
    x0y = H[..., 1, 2]
    x1y = H[..., 1, 1] + H[..., 1, 2]
    x1x = H[..., 0, 1] + H[..., 0, 2]
    x2x = H[..., 0, 0] + H[..., 0, 1] + H[..., 0, 2]
    ok &= (x1y > x0y) & (x2x > x1x)
    return ok


def shifted_in(wh, pts: jnp.ndarray) -> jnp.ndarray:
    """Half-shifted inside test (match_info.hh:70-73). wh: (2,) or [...,2];
    pts: [...,N,2]."""
    w = wh[..., None, 0]
    h = wh[..., None, 1]
    x, y = pts[..., 0], pts[..., 1]
    return (x >= -w * 0.5) & (x < w * 0.5) & (y >= -h * 0.5) & (y < h * 0.5)


def overlap_mask_in1(H21: jnp.ndarray, H12: jnp.ndarray, wh1, wh2,
                     pts_in1: jnp.ndarray) -> jnp.ndarray:
    """Exact overlap-region membership for points given in image-1 coords.

    The reference approximates the overlap of image 2 (mapped by H21 into
    image 1) with image 1 as a convex hull of 400 projected edge samples and
    does an approximate angular point-in-polygon query
    (homography.cc:50-90, lib/polygon.cc:62-83).  The TPU-native form is the
    *exact* membership test — p is in the overlap iff p is inside image 1 and
    H12 p lands inside image 2 with positive depth — which is branch-free,
    O(1) per point, and strictly more accurate than the hull superset.
    """
    p_in2, z = trans2d(H12, pts_in1)
    return shifted_in(wh1, pts_in1) & shifted_in(wh2, p_in2) & (z > 0)


def overlap_area_fraction(H12: jnp.ndarray, wh1, wh2, grid: int) -> jnp.ndarray:
    """Overlap area as a fraction of image-1 area, by testing a grid x grid
    lattice of image-1 pixel centers for membership in image 2.  Replaces the
    reference's shoelace area of the sampled hull
    (transform_estimate.cc:204-208, polygon.cc:48-60)."""
    u = (jnp.arange(grid, dtype=jnp.float32) + 0.5) / grid - 0.5
    gx = u[None, :] * wh1[..., 0, None, None]
    gy = u[:, None] * wh1[..., 1, None, None]
    pts = jnp.stack(jnp.broadcast_arrays(gx, gy), axis=-1).reshape(
        *H12.shape[:-2], grid * grid, 2
    )
    p2, z = trans2d(H12, pts)
    inside = shifted_in(wh2, p2) & (z > 0)
    return jnp.mean(inside.astype(jnp.float32), axis=-1)
