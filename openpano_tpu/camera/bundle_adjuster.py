"""Levenberg-Marquardt bundle adjustment over camera parameters.

Reference: stitch/incremental_bundle_adjuster.{hh,cc} — 6 params/camera
(focal, ppx, ppy, 3 Rodrigues), residual = pixel reprojection error of every
match point through H = K_f R_f R_t^T K_t^-1 (calcError, .cc:171-197), LM
loop with fixed damping lambda (rotations) / lambda/10 (intrinsics)
(.cc:240-248), identity camera's rotation frozen (.cc:144-148), accept a
step only when RMS improves by >1e-3, stop after 5 consecutive
non-improvements or 100 iterations (.cc:139-160).  One reference quirk is
preserved deliberately: the residual vector used to form J^T r is from the
most recently *evaluated* state even when that step was rejected, while J
itself comes from the best accepted state (.cc:117-160).

TPU-native design: the reference assembles a dense J (~700k x 6n, zeroing
noted as 1/3 of its runtime at .cc:280) exploiting block sparsity only in
JtJ accumulation.  Here the problem is *point-major*: all match points from
all pairs live in flat [T] arrays carrying their two camera indices and a
weight (0 = padding or pair not yet active in the incremental schedule).
J is never materialized — jax.jacfwd gives each point's [2,12] block (12 =
the only nonzero columns), and JtJ/Jtb are scatter-added from per-point
[12,12]/[12] blocks.  Every optimize() call in the schedule reuses one
compiled executable; only the weights change.  float64 throughout, matching
the reference.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .rotation import rodrigues

LM_MAX_ITER = 100       # incremental_bundle_adjuster.cc:24
NR_NON_DECREASE = 5     # .cc:159


class BAProblem(NamedTuple):
    """Point-major static-shape BA inputs.

    cam_from/cam_to: [T] camera indices per match point;
    pt_to: [T,2] coords in the 'to' image (half-shifted),
    pt_from: [T,2] coords in the 'from' image;
    w: [T] weights (1 = active, 0 = padding / inactive pair).
    """

    cam_from: jnp.ndarray
    cam_to: jnp.ndarray
    pt_to: jnp.ndarray
    pt_from: jnp.ndarray
    w: jnp.ndarray


def _K(f, ppx, ppy, dtype):
    z = jnp.zeros((), dtype)
    o = jnp.ones((), dtype)
    return jnp.stack([
        jnp.stack([f, z, ppx]), jnp.stack([z, f, ppy]), jnp.stack([z, z, o])
    ])


def _K_inv(f, ppx, ppy, dtype):
    z = jnp.zeros((), dtype)
    o = jnp.ones((), dtype)
    fi = 1.0 / f
    return jnp.stack([
        jnp.stack([fi, z, -ppx * fi]),
        jnp.stack([z, fi, -ppy * fi]),
        jnp.stack([z, z, o]),
    ])


def _point_residual(cam12: jnp.ndarray, pt_to: jnp.ndarray,
                    pt_from: jnp.ndarray) -> jnp.ndarray:
    """Residual [2] for one point given its two cameras' 12 params
    (calcError, .cc:171-197): r = from - H(to), H = K_f R_f R_t^T K_t^-1."""
    dt = cam12.dtype
    cf, ct = cam12[:6], cam12[6:]
    Hf = _K(cf[0], cf[1], cf[2], dt) @ rodrigues(cf[3:6])
    Ht = rodrigues(ct[3:6]).T @ _K_inv(ct[0], ct[1], ct[2], dt)
    H = Hf @ Ht
    xyz = jnp.concatenate([pt_to, jnp.ones_like(pt_to[..., :1])], -1)
    proj = H @ xyz
    z = proj[2]
    zsafe = jnp.where(jnp.abs(z) > 1e-20, z, 1e-20)
    return pt_from - proj[:2] / zsafe


def _gather_cam12(params, prob):
    """[T,12] stacked (from, to) camera params per point."""
    return jnp.concatenate(
        [params[prob.cam_from], params[prob.cam_to]], axis=-1
    )


def _residuals(params, prob):
    cam12 = _gather_cam12(params, prob)
    r = jax.vmap(_point_residual)(cam12, prob.pt_to, prob.pt_from)
    return r * prob.w[:, None]                          # [T,2]


def _rms(r, prob):
    """sqrt(mean of squared residuals) over active points (.cc:199-220)."""
    npts = jnp.sum(prob.w) * 2.0
    return jnp.sqrt(jnp.sum(r * r) / jnp.maximum(npts, 1.0))


def _normal_equations(params, residuals, prob, n_cam):
    """JtJ [6n,6n] and Jtb [6n] via per-point jacfwd + block scatter-add."""
    cam12 = _gather_cam12(params, prob)
    Jp = jax.vmap(jax.jacfwd(_point_residual))(
        cam12, prob.pt_to, prob.pt_from
    )                                                   # [T,2,12]
    Jp = Jp * prob.w[:, None, None]
    B = jnp.einsum("tki,tkj->tij", Jp, Jp)              # [T,12,12]
    b = jnp.einsum("tki,tk->ti", Jp, residuals)         # [T,12]

    n6 = n_cam * 6
    offs = jnp.arange(6)
    rows = jnp.concatenate(
        [prob.cam_from[:, None] * 6 + offs, prob.cam_to[:, None] * 6 + offs], 1
    )                                                   # [T,12]
    JtJ = jnp.zeros((n6, n6), params.dtype)
    JtJ = JtJ.at[rows[:, :, None], rows[:, None, :]].add(B)
    Jtb = jnp.zeros((n6,), params.dtype).at[rows].add(b)
    return JtJ, Jtb


@functools.partial(jax.jit, static_argnames=("n_cam", "lm_lambda"))
def ba_optimize(params: jnp.ndarray, prob: BAProblem, identity_idx: jnp.ndarray,
                n_cam: int, lm_lambda: float) -> jnp.ndarray:
    """Run the LM loop (optimize(), .cc:117-168).  params: [n,6] float64
    rows (focal, ppx, ppy, rx, ry, rz); returns optimized params."""
    dtype = params.dtype
    flat0 = params.reshape(-1)

    # identity camera's rotation params never update (.cc:144-148)
    upd_mask = jnp.ones((n_cam, 6), dtype)
    upd_mask = upd_mask.at[identity_idx, 3:].set(0.0)
    upd_mask = upd_mask.reshape(-1)

    damp = jnp.where(jnp.arange(n_cam * 6) % 6 >= 3, lm_lambda, lm_lambda / 10.0)

    r0 = _residuals(flat0.reshape(n_cam, 6), prob)
    err0 = _rms(r0, prob)

    def cond(carry):
        _, _, _, nr_nd, itr = carry
        return (itr < LM_MAX_ITER) & (nr_nd <= NR_NON_DECREASE)

    def body(carry):
        best_flat, resid, best_err, nr_nd, itr = carry
        JtJ, Jtb = _normal_equations(
            best_flat.reshape(n_cam, 6), resid, prob, n_cam
        )
        A = JtJ + jnp.diag(damp)
        delta = jnp.linalg.solve(A, Jtb[:, None])[:, 0]
        new_flat = best_flat - delta * upd_mask
        new_r = _residuals(new_flat.reshape(n_cam, 6), prob)
        new_err = _rms(new_r, prob)
        improved = new_err < best_err - 1e-3
        best_flat = jnp.where(improved, new_flat, best_flat)
        best_err = jnp.where(improved, new_err, best_err)
        nr_nd = jnp.where(improved, 0, nr_nd + 1)
        # residuals for the next J^T r come from the evaluated state even if
        # rejected — reference quirk (.cc:117-160)
        return best_flat, new_r, best_err, nr_nd, itr + 1

    init = (flat0, r0, err0, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    best_flat, _, _, _, _ = jax.lax.while_loop(cond, body, init)
    return best_flat.reshape(n_cam, 6)


def pairs_to_points(from_idx, to_idx, pts_to, pts_from, valid, pair_active):
    """Convert a pair-major [P,M] problem to point-major (jit-safe: no
    compaction — weights select).  Used by the sharded pipeline; the
    estimator compacts on host instead."""
    P, M = valid.shape
    rep = lambda a: jnp.repeat(a, M)
    w = (valid.reshape(-1).astype(pts_to.dtype)
         * jnp.repeat(pair_active, M).astype(pts_to.dtype))
    return BAProblem(
        cam_from=rep(from_idx),
        cam_to=rep(to_idx),
        pt_to=pts_to.reshape(P * M, 2),
        pt_from=pts_from.reshape(P * M, 2),
        w=w,
    )
