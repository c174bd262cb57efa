"""Projection models: flat / cylindrical / spherical.

Vectorized equivalents of the reference's function-pointer pairs
(stitch/projection.hh:14-72).  ``homo2proj`` maps 3-D homogeneous/ray
coordinates [..., 3] to 2-D projection-plane coordinates [..., 2];
``proj2homo`` is the inverse lift.  Gradients come from jax.grad, replacing
the hand-written gradproj (projection.hh:21-26,57-66).
"""

from __future__ import annotations

import jax.numpy as jnp


def _flat_homo2proj(h):
    z = h[..., 2]
    return h[..., :2] / z[..., None]


def _flat_proj2homo(p):
    return jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)


def _cyl_homo2proj(h):
    x, y, z = h[..., 0], h[..., 1], h[..., 2]
    return jnp.stack([jnp.arctan2(x, z), y / jnp.hypot(x, z)], axis=-1)


def _cyl_proj2homo(p):
    x, y = p[..., 0], p[..., 1]
    return jnp.stack([jnp.sin(x), y, jnp.cos(x)], axis=-1)


def _sph_homo2proj(h):
    x, y, z = h[..., 0], h[..., 1], h[..., 2]
    return jnp.stack([jnp.arctan2(x, z), jnp.arctan2(y, jnp.hypot(x, z))], axis=-1)


def _sph_proj2homo(p):
    x, y = p[..., 0], p[..., 1]
    return jnp.stack([jnp.sin(x), jnp.tan(y), jnp.cos(x)], axis=-1)


PROJECTIONS = {
    "flat": (_flat_homo2proj, _flat_proj2homo),
    "cylindrical": (_cyl_homo2proj, _cyl_proj2homo),
    "spherical": (_sph_homo2proj, _sph_proj2homo),
}
