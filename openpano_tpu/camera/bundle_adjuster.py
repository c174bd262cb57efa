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
JtJ accumulation.  Here J is never materialized: jax.jacfwd computes each
pair's [M,2,12] block (12 = the only nonzero columns), vmapped over pairs,
and JtJ/Jtb are scatter-added from per-pair [12,12] / [12] blocks.  The
whole schedule runs with static shapes — inactive pairs are masked, so every
incremental optimize() call reuses one compiled executable.  float64
throughout, matching the reference (TPU f64 is software-emulated but the
per-iteration cost is a few MFLOP).
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
    """Static-shape BA inputs.

    from_idx/to_idx: [P] camera indices per match pair;
    pts_to: [P,M,2] match coords in the 'to' image (half-shifted),
    pts_from: [P,M,2] coords in the 'from' image;
    valid: [P,M] point mask; pair_active: [P] schedule mask.
    """

    from_idx: jnp.ndarray
    to_idx: jnp.ndarray
    pts_to: jnp.ndarray
    pts_from: jnp.ndarray
    valid: jnp.ndarray
    pair_active: jnp.ndarray


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


def _pair_residual(cam12: jnp.ndarray, pts_to: jnp.ndarray, pts_from: jnp.ndarray,
                   valid: jnp.ndarray) -> jnp.ndarray:
    """Residuals [M,2] for one pair given its two cameras' 12 params
    (calcError, .cc:171-197): r = from - H(to), H = K_f R_f R_t^T K_t^-1."""
    dt = cam12.dtype
    cf, ct = cam12[:6], cam12[6:]
    Hf = _K(cf[0], cf[1], cf[2], dt) @ rodrigues(cf[3:6])
    Ht = rodrigues(ct[3:6]).T @ _K_inv(ct[0], ct[1], ct[2], dt)
    H = Hf @ Ht
    xyz = jnp.concatenate([pts_to, jnp.ones_like(pts_to[..., :1])], -1)
    proj = xyz @ H.T
    z = proj[..., 2]
    zsafe = jnp.where(jnp.abs(z) > 1e-20, z, 1e-20)
    r = pts_from - proj[..., :2] / zsafe[..., None]
    return jnp.where(valid[..., None], r, 0.0)


def _gather_cam12(params, prob):
    """[P,12] stacked (from, to) camera params per pair."""
    return jnp.concatenate(
        [params[prob.from_idx].reshape(-1, 6), params[prob.to_idx].reshape(-1, 6)],
        axis=-1,
    )


def _residuals(params, prob):
    cam12 = _gather_cam12(params, prob)
    r = jax.vmap(_pair_residual)(cam12, prob.pts_to, prob.pts_from, prob.valid)
    return r * prob.pair_active[:, None, None]          # [P,M,2]


def _rms(r, prob):
    """sqrt(mean of squared residuals) over active points (.cc:199-220)."""
    npts = jnp.sum(jnp.sum(prob.valid, 1) * prob.pair_active) * 2.0
    return jnp.sqrt(jnp.sum(r * r) / jnp.maximum(npts, 1.0))


def _normal_equations(params, residuals, prob, n_cam):
    """JtJ [6n,6n] and Jtb [6n] via per-pair jacfwd + block scatter-add."""
    jac_fn = jax.vmap(
        jax.jacfwd(_pair_residual), in_axes=(0, 0, 0, 0)
    )
    cam12 = _gather_cam12(params, prob)
    Jp = jac_fn(cam12, prob.pts_to, prob.pts_from, prob.valid)   # [P,M,2,12]
    Jp = Jp * prob.pair_active[:, None, None, None]
    B = jnp.einsum("pmti,pmtj->pij", Jp, Jp)                     # [P,12,12]
    b = jnp.einsum("pmti,pmt->pi", Jp, residuals)                # [P,12]

    n6 = n_cam * 6
    JtJ = jnp.zeros((n6, n6), params.dtype)
    Jtb = jnp.zeros((n6,), params.dtype)
    offs = jnp.arange(6)
    rows = jnp.concatenate(
        [prob.from_idx[:, None] * 6 + offs, prob.to_idx[:, None] * 6 + offs], 1
    )                                                            # [P,12]
    JtJ = JtJ.at[rows[:, :, None], rows[:, None, :]].add(B)
    Jtb = Jtb.at[rows].add(b)
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
