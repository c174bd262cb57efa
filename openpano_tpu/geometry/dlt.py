"""Direct linear transforms (homography / affine fits), batched with masks.

The reference solves an inhomogeneous 2n x 8 (perspective, h22=1) or 2n x 6
(affine) least-squares system with Eigen JacobiSVD
(lib/imgproc.cc:251-317), wrapped in scale-only coordinate normalization
(mean-subtract deliberately disabled) per MVG Sec 4.4
(stitch/transform_estimate.cc:99-129).

TPU-native form: fixed-shape systems with per-row weights (0 for padded /
non-inlier rows), solved via normal equations + Cholesky-backed
`jnp.linalg.solve` — a tiny (8x8 / 6x6) solve that vmaps cleanly over
RANSAC hypothesis batches.  A small diagonal Tikhonov term keeps masked-out
hypothesis solves finite; degenerate fits are rejected downstream by the
health() gate rather than by branching here.
"""

from __future__ import annotations

import jax.numpy as jnp


def _chol_solve_small(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched Cholesky solve for tiny SPD systems, unrolled at trace time.

    A: [...,n,n] SPD, b: [...,n]; n is small and static (6/8 here).
    jnp.linalg.solve lowers to the TPU `LuDecompositionBlock` custom call,
    which serializes tiny batched systems (~230 ms for 117k 8x8 solves —
    dominating all of RANSAC); this unrolled Cholesky is ~n^3/3 fused
    elementwise ops on the batch and costs microseconds."""
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-30))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def _weighted_lstsq(A: jnp.ndarray, b: jnp.ndarray, w: jnp.ndarray, nparam: int):
    """argmin_x ||w * (Ax - b)||^2 for [...,R,nparam] systems."""
    Aw = A * w[..., None]
    AtA = jnp.einsum("...ri,...rj->...ij", Aw, A)
    Atb = jnp.einsum("...ri,...r->...i", Aw, b)
    AtA = AtA + 1e-9 * jnp.eye(nparam, dtype=A.dtype)
    return _chol_solve_small(AtA, Atb)


def perspective_dlt(p1: jnp.ndarray, p2: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Homography mapping p2 -> p1 with h22=1 (imgproc.cc:251-295).

    p1, p2: [..., N, 2]; w: [..., N] row weights.  Returns [..., 3, 3].
    """
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    # rows for the x equation: [x2 y2 1 0 0 0 -x2*x1 -y2*x1] . h = x1
    rx = jnp.stack([x2, y2, o, z, z, z, -x2 * x1, -y2 * x1], axis=-1)
    ry = jnp.stack([z, z, z, x2, y2, o, -x2 * y1, -y2 * y1], axis=-1)
    A = jnp.concatenate([rx, ry], axis=-2)
    b = jnp.concatenate([x1, y1], axis=-1)
    ww = jnp.concatenate([w, w], axis=-1)
    h = _weighted_lstsq(A, b, ww, 8)
    H = jnp.concatenate([h, jnp.ones_like(h[..., :1])], axis=-1)
    return H.reshape(*h.shape[:-1], 3, 3)


def affine_dlt(p1: jnp.ndarray, p2: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Affine transform p2 -> p1 as a 3x3 with last row (0,0,1)
    (imgproc.cc:297-317)."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    rx = jnp.stack([x2, y2, o, z, z, z], axis=-1)
    ry = jnp.stack([z, z, z, x2, y2, o], axis=-1)
    A = jnp.concatenate([rx, ry], axis=-2)
    b = jnp.concatenate([x1, y1], axis=-1)
    ww = jnp.concatenate([w, w], axis=-1)
    h = _weighted_lstsq(A, b, ww, 6)
    bot = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], dtype=h.dtype), (*h.shape[:-1], 3)
    )
    H = jnp.concatenate([h, bot], axis=-1)
    return H.reshape(*h.shape[:-1], 3, 3)


def normalized_transform(p1: jnp.ndarray, p2: jnp.ndarray, w: jnp.ndarray,
                         affine: bool) -> jnp.ndarray:
    """DLT with the reference's scale-only normalization
    (transform_estimate.cc:99-129): each point set is scaled by
    s = sqrt(2 / mean |p|^2) before the fit; the result is de-normalized as
    H = diag(1/s1, 1/s1, 1) @ Hn @ diag(s2, s2, 1).
    Weights select the participating points (mean over selected only)."""
    cnt = jnp.maximum(jnp.sum(w, axis=-1), 1.0)

    def scale(p):
        sqrsum = jnp.sum(jnp.sum(p * p, axis=-1) * w, axis=-1) / cnt
        return jnp.sqrt(2.0 / jnp.maximum(sqrsum, 1e-12))

    s1 = scale(p1)
    s2 = scale(p2)
    Hn = (affine_dlt if affine else perspective_dlt)(
        p1 * s1[..., None, None], p2 * s2[..., None, None], w
    )
    # diag(1/s1,1/s1,1) @ Hn @ diag(s2,s2,1) without materializing the diags
    col = jnp.stack([s2, s2, jnp.ones_like(s2)], axis=-1)
    row = jnp.stack([1.0 / s1, 1.0 / s1, jnp.ones_like(s1)], axis=-1)
    return Hn * col[..., None, :] * row[..., :, None]
