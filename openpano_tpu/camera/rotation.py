"""Rodrigues rotation <-> axis-angle conversions, batched and differentiable.

Reference: Camera::rotation_to_angle / angle_to_rotation
(stitch/camera.cc:91-144) — including the SVD re-orthogonalization on the
matrix->angle side and the first-order Taylor branch for small angles on the
angle->matrix side (same guard constant semantics: GEO_EPS = 1e-14,
lib/utils.hh).  Written with the where-both-branches trick so jax.jacfwd
through rodrigues() is finite at theta -> 0.
"""

from __future__ import annotations

import jax.numpy as jnp

GEO_EPS_SQR = 1e-14  # lib/utils.hh GEO_EPS_SQR


def cross_matrix(v):
    """[...,3] -> [...,3,3] cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1),
    ], -2)


def rodrigues(v: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [...,3] -> rotation matrix [...,3,3]
    (camera.cc:120-144)."""
    theta2 = jnp.sum(v * v, axis=-1)
    small = theta2 < GEO_EPS_SQR
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    u = v / theta[..., None]
    outer = u[..., :, None] * u[..., None, :]
    K = cross_matrix(u)
    c = jnp.cos(theta)[..., None, None]
    s = jnp.sin(theta)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), outer.shape)
    full = c * eye + (1 - c) * outer + s * K
    # first-order Taylor: I + [v]_x (camera.cc:122-126)
    taylor = eye + cross_matrix(v)
    return jnp.where(small[..., None, None], taylor, full)


def drodrigues(v: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
    """Analytic dR/dv: [...,3] axis-angle and its rotation [...,3,3] ->
    [...,3,3,3] where out[..., i] = dR/dv_i.

    The compact exponential-coordinates formula (Gallego & Yezzi,
    arXiv:1312.0788, eq. 10) the reference uses symbolically (dRdvi,
    incremental_bundle_adjuster.cc:52-81):
        dR/dv_i = (v_i [v]_x + [v x (I - R) e_i]_x) / |v|^2 . R
    with the theta -> 0 limit dR/dv_i = [e_i]_x."""
    theta2 = jnp.sum(v * v, axis=-1)                     # [...]
    small = theta2 < GEO_EPS_SQR
    t2safe = jnp.where(small, 1.0, theta2)[..., None, None, None]
    vx = cross_matrix(v)                                 # [...,3,3]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), R.shape)
    # (I - R) e_i = column i of (I - R);  w_i = v x (I-R)e_i  -> [...,3,i]
    cols = eye - R                                       # [...,3,3]
    w = jnp.cross(v[..., None, :], jnp.swapaxes(cols, -1, -2), axis=-1)
    # w: [...,3(i),3] -> cross matrices [...,i,3,3]
    wx = cross_matrix(w)                                 # [...,3(i),3,3]
    vi = v[..., :, None, None]                           # [...,3(i),1,1]
    num = vi * vx[..., None, :, :] + wx                  # [...,3(i),3,3]
    full = (num / t2safe) @ R[..., None, :, :]
    # limit: [e_i]_x
    lim = cross_matrix(jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), R.shape))
    out = jnp.where(small[..., None, None, None], lim, full)
    return jnp.moveaxis(out, -3, -1)                     # [...,3,3,3(i)]


def rotation_to_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [...,3,3] -> axis-angle [...,3] with SVD
    re-orthogonalization (camera.cc:91-117)."""
    U, _, Vt = jnp.linalg.svd(R)
    Rn = U @ Vt
    det = jnp.linalg.det(Rn)
    Rn = Rn * jnp.where(det < 0, -1.0, 1.0)[..., None, None]

    rx = Rn[..., 2, 1] - Rn[..., 1, 2]
    ry = Rn[..., 0, 2] - Rn[..., 2, 0]
    rz = Rn[..., 1, 0] - Rn[..., 0, 1]
    r = jnp.stack([rx, ry, rz], -1)
    s = jnp.linalg.norm(r, axis=-1)
    small = s < 1e-7  # GEO_EPS
    tr = Rn[..., 0, 0] + Rn[..., 1, 1] + Rn[..., 2, 2]
    cos = jnp.clip((tr - 1) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos)
    mul = jnp.where(small, 0.0, theta / jnp.where(small, 1.0, s))
    return r * mul[..., None]
