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
JtJ accumulation.  Here the problem is *point-major with pair-contiguous
segments*: all match points of pair slot s occupy rows [starts[s],
ends[s]).  J is never materialized — jax.jacfwd gives each point's [2,12]
block (12 = the only nonzero columns), per-pair [12,12]/[12] block sums
come from a cumulative-sum difference over the contiguous segments (an
XLA-friendly reduction; a T-wide scatter-add is serialized on CPU and
banked on TPU), and only P tiny blocks are scattered into JtJ.  The
incremental schedule (camera_estimator.cc:74-99) re-dispatches one compiled
executable; only the per-pair ``swapped``/``pair_w`` vectors change between
calls, so the point data stays resident on the device.  float64
throughout, matching the reference.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .rotation import drodrigues, rodrigues

LM_MAX_ITER = 100       # incremental_bundle_adjuster.cc:24
NR_NON_DECREASE = 5     # .cc:159


class BAProblem(NamedTuple):
    """Point-major BA inputs with pair-contiguous segments.

    Per point (row t):
      pt_to/pt_from: [T,2] half-shifted coords in the stored orientation;
      pair_id: [T] pair slot of the point;
      w: [T] static weight (0 = padding / invalid match point).
    Per pair slot (s):
      starts/ends: [P] row range of the slot's points;
      cam_to/cam_from: [P] camera indices in the stored orientation;
      swapped: [P] bool — True flips the pair's direction (the incremental
        schedule orients each edge so 'to' is the newly added image,
        camera_estimator.cc:76-88);
      pair_w: [P] activation weight (0 = pair not yet in the schedule).
    """

    pt_to: jnp.ndarray
    pt_from: jnp.ndarray
    pair_id: jnp.ndarray
    w: jnp.ndarray
    starts: jnp.ndarray
    ends: jnp.ndarray
    cam_to: jnp.ndarray
    cam_from: jnp.ndarray
    swapped: jnp.ndarray
    pair_w: jnp.ndarray


class _EffProblem(NamedTuple):
    """Problem with the per-pair swap resolved to effective per-point data."""

    pt_to: jnp.ndarray      # [T,2]
    pt_from: jnp.ndarray    # [T,2]
    pair_id: jnp.ndarray    # [T]
    cam_to: jnp.ndarray     # [T]
    cam_from: jnp.ndarray   # [T]
    w: jnp.ndarray          # [T] combined weight
    starts: jnp.ndarray
    ends: jnp.ndarray
    rows_to: jnp.ndarray    # [P] effective per-pair camera, for JtJ rows
    rows_from: jnp.ndarray


def _effective(prob: BAProblem) -> _EffProblem:
    sw = prob.swapped[prob.pair_id]
    eff_cam_to = jnp.where(prob.swapped, prob.cam_from, prob.cam_to)
    eff_cam_from = jnp.where(prob.swapped, prob.cam_to, prob.cam_from)
    return _EffProblem(
        pt_to=jnp.where(sw[:, None], prob.pt_from, prob.pt_to),
        pt_from=jnp.where(sw[:, None], prob.pt_to, prob.pt_from),
        pair_id=prob.pair_id,
        cam_to=eff_cam_to[prob.pair_id],
        cam_from=eff_cam_from[prob.pair_id],
        w=prob.w * prob.pair_w[prob.pair_id],
        starts=prob.starts,
        ends=prob.ends,
        rows_to=eff_cam_to,
        rows_from=eff_cam_from,
    )


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


def _gather_cam12(params, eff: _EffProblem):
    """[T,12] stacked (from, to) camera params per point."""
    return jnp.concatenate(
        [params[eff.cam_from], params[eff.cam_to]], axis=-1
    )


def _pair_H(params, eff: _EffProblem):
    """Per-pair homography H = K_f R_f R_t^T K_t^-1, [P,3,3].

    H depends only on the two cameras — the analytic-Jacobian structure the
    reference exploits symbolically (calcJacobianSymbolic,
    incremental_bundle_adjuster.cc:276-353); computing it per *pair* rather
    than per point is the batched equivalent."""
    return _rows_H(params, eff.rows_from, eff.rows_to)


def _rows_H(params, F, Tc):
    f, px, py = params[:, 0], params[:, 1], params[:, 2]
    R = rodrigues(params[:, 3:6])                        # [n,3,3]
    z = jnp.zeros_like(f)
    o = jnp.ones_like(f)
    K = jnp.stack([
        jnp.stack([f, z, px], -1), jnp.stack([z, f, py], -1),
        jnp.stack([z, z, o], -1)], -2)                   # [n,3,3]
    fi = 1.0 / f
    Kinv = jnp.stack([
        jnp.stack([fi, z, -px * fi], -1), jnp.stack([z, fi, -py * fi], -1),
        jnp.stack([z, z, o], -1)], -2)
    A = K[F] @ R[F]                                      # [P,3,3]
    Bq = jnp.swapaxes(R[Tc], -1, -2) @ Kinv[Tc]          # [P,3,3]
    return A @ Bq


def _pair_H_dH(params, eff: _EffProblem):
    """H [P,3,3] and dH/dtheta [P,12,3,3] for the 12 params of each pair's
    (from, to) cameras, all analytic (the chain pieces at
    incremental_bundle_adjuster.cc:84-95 and dRdvi at .cc:52-81)."""
    return _rows_H_dH(params, eff.rows_from, eff.rows_to)


def _rows_H_dH(params, F, Tc):
    dt = params.dtype
    f, px, py = params[:, 0], params[:, 1], params[:, 2]
    v = params[:, 3:6]
    R = rodrigues(v)                                     # [n,3,3]
    dR = drodrigues(v, R)                                # [n,3,3,3(i)]
    z = jnp.zeros_like(f)
    o = jnp.ones_like(f)
    K = jnp.stack([
        jnp.stack([f, z, px], -1), jnp.stack([z, f, py], -1),
        jnp.stack([z, z, o], -1)], -2)
    fi = 1.0 / f
    Kinv = jnp.stack([
        jnp.stack([fi, z, -px * fi], -1), jnp.stack([z, fi, -py * fi], -1),
        jnp.stack([z, z, o], -1)], -2)
    fi2 = fi * fi
    dKinv_df = jnp.stack([
        jnp.stack([-fi2, z, px * fi2], -1),
        jnp.stack([z, -fi2, py * fi2], -1),
        jnp.stack([z, z, z], -1)], -2)                   # [n,3,3]

    KF, RF, dRF = K[F], R[F], dR[F]
    RtT = jnp.swapaxes(R[Tc], -1, -2)
    KinvT = Kinv[Tc]
    A = KF @ RF                                          # [P,3,3]
    Bq = RtT @ KinvT                                     # [P,3,3]
    H = A @ Bq
    RB = RF @ Bq                                         # [P,3,3]

    zero = jnp.zeros_like(RB)
    # dK_f/df = diag(1,1,0): keep first two rows of RB
    d_f = RB.at[..., 2, :].set(0.0)
    # dK_f/dppx = e1 e3^T, dK_f/dppy = e2 e3^T: move RB's third row
    d_px = zero.at[..., 0, :].set(RB[..., 2, :])
    d_py = zero.at[..., 1, :].set(RB[..., 2, :])
    # dR_f/dv_k
    d_vf = jnp.einsum("pij,pjlk,plm->pkim", KF, dRF, Bq)  # [P,3(k),3,3]
    # to-camera intrinsics
    ARt = A @ RtT                                        # [P,3,3]
    d_ft = ARt @ dKinv_df[Tc]
    fiT = fi[Tc]
    d_pxt = -(ARt[..., :, 0] * fiT[:, None])[..., :, None] * \
        jnp.asarray([0.0, 0.0, 1.0], dt)[None, None, :]
    d_pyt = -(ARt[..., :, 1] * fiT[:, None])[..., :, None] * \
        jnp.asarray([0.0, 0.0, 1.0], dt)[None, None, :]
    # dR_t^T/dv_k = (dR_t/dv_k)^T
    d_vt = jnp.einsum("pij,pljk,plm->pkim", A, dR[Tc], KinvT)

    dH = jnp.concatenate([
        d_f[:, None], d_px[:, None], d_py[:, None], d_vf,
        d_ft[:, None], d_pxt[:, None], d_pyt[:, None], d_vt,
    ], axis=1)                                           # [P,12,3,3]
    return H, dH


def _proj_residual(H_pt, pt_to, pt_from):
    """r [T,2] plus the projected (x, y, zsafe, valid) pieces."""
    ph = jnp.concatenate([pt_to, jnp.ones_like(pt_to[..., :1])], -1)
    u = jnp.einsum("tij,tj->ti", H_pt, ph)               # [T,3]
    zok = jnp.abs(u[..., 2]) > 1e-20
    zs = jnp.where(zok, u[..., 2], 1e-20)
    r = pt_from - u[..., :2] / zs[..., None]
    return r, ph, u, zs, zok


def _eff_residuals(params, eff: _EffProblem):
    H = _pair_H(params, eff)
    r, _, _, _, _ = _proj_residual(H[eff.pair_id], eff.pt_to, eff.pt_from)
    return r * eff.w[:, None]                           # [T,2]


def _residuals(params, prob: BAProblem):
    return _eff_residuals(params, _effective(prob))


def _rms_w(r, w):
    """sqrt(mean of squared residuals) over active points (.cc:199-220)."""
    npts = jnp.sum(w > 0) * 2.0
    return jnp.sqrt(jnp.sum(r * r) / jnp.maximum(npts, 1.0))


def _rms(r, prob: BAProblem):
    return _rms_w(r, prob.w * prob.pair_w[prob.pair_id])


def _segment_blocks(x: jnp.ndarray, starts, ends) -> jnp.ndarray:
    """Sum rows of x [T, ...] over the contiguous segments [starts, ends).

    Cumulative-sum difference: one pass over T, then two gathers of P rows —
    no T-wide scatter (XLA scatters serialize on CPU and are bank-conflict
    prone on TPU; the reference's analog is its JtJ block accumulation,
    incremental_bundle_adjuster.cc:355-380)."""
    t = x.shape[0]
    flat = x.reshape(t, -1)
    cs = jnp.concatenate([jnp.zeros_like(flat[:1]), jnp.cumsum(flat, 0)], 0)
    return (cs[ends] - cs[starts]).reshape((starts.shape[0],) + x.shape[1:])


def _eff_jacobian(params, eff: _EffProblem):
    """Analytic per-point Jacobian [T,2,12]: chain rule through the
    projective division of the per-pair dH blocks (the batched form of
    calcJacobianSymbolic, incremental_bundle_adjuster.cc:306-353)."""
    H, dH = _pair_H_dH(params, eff)
    pid = eff.pair_id
    _, ph, u, zs, zok = _proj_residual(H[pid], eff.pt_to, eff.pt_from)
    du = jnp.einsum("tkij,tj->tki", dH[pid], ph)        # [T,12,3]
    zi = 1.0 / zs
    # d(x/zsafe): the zsafe clamp freezes z when |z| <= 1e-20, matching the
    # where() in _proj_residual under differentiation
    zterm = jnp.where(zok, zi * zi, 0.0)
    Jx = -(du[..., 0] * zi[:, None] - du[..., 2] * (u[..., 0] * zterm)[:, None])
    Jy = -(du[..., 1] * zi[:, None] - du[..., 2] * (u[..., 1] * zterm)[:, None])
    return jnp.stack([Jx, Jy], axis=1)                  # [T,2,12]


def _eff_normal_equations(params, residuals, eff: _EffProblem, n_cam):
    """JtJ [6n,6n] and Jtb [6n] via analytic Jacobian + per-pair block sums."""
    Jp = _eff_jacobian(params, eff) * eff.w[:, None, None]
    B = jnp.einsum("tki,tkj->tij", Jp, Jp)              # [T,12,12]
    b = jnp.einsum("tki,tk->ti", Jp, residuals)         # [T,12]
    Bp = _segment_blocks(B, eff.starts, eff.ends)       # [P,12,12]
    bp = _segment_blocks(b, eff.starts, eff.ends)       # [P,12]

    n6 = n_cam * 6
    offs = jnp.arange(6)
    rows = jnp.concatenate(
        [eff.rows_from[:, None] * 6 + offs, eff.rows_to[:, None] * 6 + offs], 1
    )                                                   # [P,12]
    JtJ = jnp.zeros((n6, n6), params.dtype)
    JtJ = JtJ.at[rows[:, :, None], rows[:, None, :]].add(Bp)
    Jtb = jnp.zeros((n6,), params.dtype).at[rows].add(bp)
    return JtJ, Jtb


def _normal_equations(params, residuals, prob: BAProblem, n_cam):
    return _eff_normal_equations(params, residuals, _effective(prob), n_cam)


def solve_sym_scaled_chol(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """TPU-safe f64 solve of the damped normal equations.

    XLA on TPU implements LuDecomposition only for f32/c64, so a direct
    f64 `jnp.linalg.solve` cannot lower there — but CholeskyExpander and
    TriangularSolveExpander lower through basic ops at any float width.
    The damped JtJ is symmetric positive definite (fixed split damping on
    the diagonal, .cc:240-248) but badly scaled (focal^2 vs rotation
    entries, scaled cond ~5e7 — past what f32 LU + iterative refinement
    can recover), so: Jacobi-scale to unit diagonal, then f64 Cholesky +
    two triangular solves.

    PRECONDITION: A must be SPD — Cholesky without pivoting returns NaN
    silently otherwise.  The LM call sites guarantee it via lm_lambda > 0
    split damping (asserted in ba_optimize/ba_optimize_pairs)."""
    d = jnp.sqrt(jnp.maximum(jnp.abs(jnp.diagonal(A)), 1e-30))
    As = A / d[:, None] / d[None, :]
    bs = b / d
    L = jnp.linalg.cholesky(As)
    y = jax.scipy.linalg.solve_triangular(L, bs, lower=True)
    x = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    return x / d


def _lm_solve(A, rhs, device_solver: bool):
    """The damped system is SPD (split damping, .cc:240-248), so the
    Jacobi-scaled Cholesky path is used on every backend — ~2.5x faster
    than the generic f64 LU on the host CPU and the only f64 solve that
    lowers on TPU.  ``device_solver`` is kept for call-site documentation
    only; both branches now share the same math."""
    del device_solver
    return solve_sym_scaled_chol(A, rhs)


@functools.partial(
    jax.jit, static_argnames=("n_cam", "lm_lambda", "device_solver")
)
def ba_optimize(params: jnp.ndarray, prob: BAProblem, identity_idx: jnp.ndarray,
                n_cam: int, lm_lambda: float,
                device_solver: bool = False) -> jnp.ndarray:
    """Run the LM loop (optimize(), .cc:117-168).  params: [n,6] float64
    rows (focal, ppx, ppy, rx, ry, rz); returns optimized params."""
    # solve_sym_scaled_chol needs A = JtJ + diag(damp) SPD (see its doc)
    assert lm_lambda > 0, "LM damping must be positive (SPD precondition)"
    dtype = params.dtype
    flat0 = params.reshape(-1)
    eff = _effective(prob)

    # identity camera's rotation params never update (.cc:144-148)
    upd_mask = jnp.ones((n_cam, 6), dtype)
    upd_mask = upd_mask.at[identity_idx, 3:].set(0.0)
    upd_mask = upd_mask.reshape(-1)

    damp = jnp.where(jnp.arange(n_cam * 6) % 6 >= 3, lm_lambda, lm_lambda / 10.0)

    r0 = _eff_residuals(flat0.reshape(n_cam, 6), eff)
    err0 = _rms_w(r0, eff.w)

    def cond(carry):
        _, _, _, nr_nd, itr = carry
        return (itr < LM_MAX_ITER) & (nr_nd <= NR_NON_DECREASE)

    def body(carry):
        best_flat, resid, best_err, nr_nd, itr = carry
        JtJ, Jtb = _eff_normal_equations(
            best_flat.reshape(n_cam, 6), resid, eff, n_cam
        )
        A = JtJ + jnp.diag(damp)
        delta = _lm_solve(A, Jtb, device_solver)
        new_flat = best_flat - delta * upd_mask
        new_r = _eff_residuals(new_flat.reshape(n_cam, 6), eff)
        new_err = _rms_w(new_r, eff.w)
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


class BAPairProblem(NamedTuple):
    """Pair-major BA inputs: uniform [P, M] point slabs per pair.

    The incremental estimator's fast path.  Versus the point-major segment
    layout, the per-pair block sums of the normal equations become batched
    matmuls ([P,12,2M] x [P,2M,12]) with no [T,144] cumulative-sum
    intermediate — an order of magnitude less memory traffic per LM
    iteration, which dominates the f64 host solve.  Padding rows carry w=0.
    """

    pt_to: jnp.ndarray    # [P,M,2] half-shifted coords, stored orientation
    pt_from: jnp.ndarray  # [P,M,2]
    w: jnp.ndarray        # [P,M] point weight (0 = padding)
    cam_to: jnp.ndarray   # [P] stored 'to' camera index
    cam_from: jnp.ndarray # [P]
    swapped: jnp.ndarray  # [P] bool — flip the pair's direction
    pair_w: jnp.ndarray   # [P] activation weight (0 = inactive pair)


def _pairs_eff(prob: BAPairProblem):
    """(pt_to, pt_from, wm, rows_from, rows_to) with the swap resolved."""
    sw = prob.swapped[:, None, None]
    pt_to = jnp.where(sw, prob.pt_from, prob.pt_to)
    pt_from = jnp.where(sw, prob.pt_to, prob.pt_from)
    rows_to = jnp.where(prob.swapped, prob.cam_from, prob.cam_to)
    rows_from = jnp.where(prob.swapped, prob.cam_to, prob.cam_from)
    wm = prob.w * prob.pair_w[:, None]
    return pt_to, pt_from, wm, rows_from, rows_to


def _pairs_residuals(params, prob: BAPairProblem):
    """Weighted residuals [P,M,2] (calcError, .cc:171-197)."""
    pt_to, pt_from, wm, F, Tc = _pairs_eff(prob)
    H = _rows_H(params, F, Tc)                           # [P,3,3]
    ph = jnp.concatenate([pt_to, jnp.ones_like(pt_to[..., :1])], -1)
    u = jnp.einsum("pij,pmj->pmi", H, ph)
    zok = jnp.abs(u[..., 2]) > 1e-20
    zs = jnp.where(zok, u[..., 2], 1e-20)
    r = pt_from - u[..., :2] / zs[..., None]
    return r * wm[..., None], wm


# NOTE (r5): an OPENPANO_BA_NE_F32 mode (f32 normal-equation accumulation)
# existed in r4 but was DELETED after the definitive sweep: raw-pixel-coord
# JtJ entries reach ~1e10 and cancel catastrophically in f32 — the headline
# reprojection exploded from 1.09 px to 2205 px (tools/sweep_ba_r5.py).
# Anyone revisiting this must first rescale the problem (coords / focal).


def _pairs_ne_blocks(params, resid_w, prob: BAPairProblem, upd=None):
    """Per-pair normal-equation blocks: Bp [P,12,12], bp [P,12] in
    [from(6) | to(6)] row order, plus the effective camera rows (F, Tc).
    Shared by the dense scatter assembly (_pairs_normal_equations) and
    the banded chain assembly (banded.assemble_banded).

    ``upd`` ([n,6], 0 = frozen parameter) zeroes the corresponding
    Jacobian COLUMNS — the identity camera's rotation freeze belongs
    INSIDE the solve (the reference never adds those columns to J,
    incremental_bundle_adjuster.cc:144-148).  Masking the solved delta
    instead produces inconsistent coupled steps when the frozen camera
    carries gradient (measured: a Gauss-Newton step that cuts RMS 8.0 ->
    0.9 unmasked LOSES ground, 8.0 -> 10.6, when its identity-rotation
    component is zeroed after the fact)."""
    out_dtype = params.dtype
    pt_to, _, wm, F, Tc = _pairs_eff(prob)
    H, dH = _rows_H_dH(params, F, Tc)
    ph = jnp.concatenate([pt_to, jnp.ones_like(pt_to[..., :1])], -1)
    u = jnp.einsum("pij,pmj->pmi", H, ph)
    zok = jnp.abs(u[..., 2]) > 1e-20
    zs = jnp.where(zok, u[..., 2], 1e-20)
    du = jnp.einsum("pkij,pmj->pmki", dH, ph)            # [P,M,12,3]
    zi = 1.0 / zs
    zterm = jnp.where(zok, zi * zi, 0.0)
    Jx = -(du[..., 0] * zi[..., None]
           - du[..., 2] * (u[..., 0] * zterm)[..., None])
    Jy = -(du[..., 1] * zi[..., None]
           - du[..., 2] * (u[..., 1] * zterm)[..., None])
    Jp = jnp.stack([Jx, Jy], axis=-2) * wm[..., None, None]  # [P,M,2,12]

    P, M = wm.shape
    Jf = Jp.reshape(P, M * 2, 12)
    if upd is not None:
        m12 = jnp.concatenate([upd[F], upd[Tc]], axis=-1)  # [P,12]
        Jf = Jf * m12[:, None, :]
    rw = resid_w.reshape(P, M * 2)
    Bp = jnp.einsum("pti,ptj->pij", Jf, Jf).astype(out_dtype)  # [P,12,12]
    bp = jnp.einsum("pti,pt->pi", Jf, rw).astype(out_dtype)
    return Bp, bp, F, Tc


def _pairs_normal_equations(params, resid_w, prob: BAPairProblem, n_cam,
                            upd=None):
    """JtJ [6n,6n], Jtb [6n] — per-pair blocks via batched matmul."""
    Bp, bp, F, Tc = _pairs_ne_blocks(params, resid_w, prob, upd)
    n6 = n_cam * 6
    offs = jnp.arange(6)
    rows = jnp.concatenate([F[:, None] * 6 + offs, Tc[:, None] * 6 + offs], 1)
    JtJ = jnp.zeros((n6, n6), Bp.dtype)
    JtJ = JtJ.at[rows[:, :, None], rows[:, None, :]].add(Bp)
    Jtb = jnp.zeros((n6,), Bp.dtype).at[rows].add(bp)
    return JtJ, Jtb


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_cam", "lm_lambda", "device_solver", "return_iters", "adaptive",
        "max_iter", "patience", "rel_tol", "banded",
    ),
)
def ba_optimize_pairs(params: jnp.ndarray, prob: BAPairProblem,
                      identity_idx: jnp.ndarray, n_cam: int,
                      lm_lambda: float,
                      device_solver: bool = False,
                      return_iters: bool = False,
                      adaptive: bool = False,
                      max_iter: int = LM_MAX_ITER,
                      patience: int = NR_NON_DECREASE,
                      rel_tol: float = 0.0,
                      banded: bool = False) -> jnp.ndarray:
    """LM loop (optimize(), .cc:117-168) over a pair-major problem.  Same
    semantics as :func:`ba_optimize`: fixed split damping, identity-camera
    rotation freeze, >1e-3 RMS improvement acceptance, stop after
    ``patience`` consecutive non-improvements (the reference's 5,
    .cc:159; intermediate incremental passes pass a smaller value — their
    only job is keeping the next initialization healthy, so waiting out 5
    rejected steps per pass buys nothing), residuals for J^T r taken from
    the most recently *evaluated* state (reference quirk).

    ``adaptive=True`` (Config.BA_ADAPTIVE_LM) replaces the reference's
    FIXED damping with classic Marquardt scheduling — accepted step
    divides lambda by 3, rejected multiplies by 4 (clamped positive for
    the SPD solve).  Same objective and acceptance rule; measured: it
    reaches a slightly lower minimum but keeps finding >1e-3 improvements
    longer, so it takes MORE iterations (see Config.BA_ADAPTIVE_LM)."""
    # solve_sym_scaled_chol needs A = JtJ + diag(damp) SPD (see its doc)
    assert lm_lambda > 0, "LM damping must be positive (SPD precondition)"
    best_flat, itr = _lm_while(
        params.reshape(-1), prob, n_cam, identity_idx, lm_lambda,
        device_solver, adaptive, max_iter, patience, rel_tol, banded,
    )
    out = best_flat.reshape(n_cam, 6)
    if return_iters:
        return out, itr
    return out


def _lm_while(flat0, prob: BAPairProblem, n_cam: int, identity_idx,
              lm_lambda: float, device_solver: bool, adaptive: bool,
              max_iter: int, patience: int, rel_tol: float,
              banded: bool = False):
    """The traced LM loop behind ba_optimize_pairs (one dispatch per
    pass).  ``banded=True`` solves the normal equations by cyclic block
    Thomas elimination (camera/banded.py) instead of the dense Cholesky —
    O(n) per iteration, for chain/ring match graphs (ordered input),
    where the dense 6n x 6n factorization dominates past ~100 cameras.
    Returns (best_flat, iterations)."""
    dtype = flat0.dtype

    upd_mask = jnp.ones((n_cam, 6), dtype)
    upd_mask = upd_mask.at[identity_idx, 3:].set(0.0)
    upd_mask = upd_mask.reshape(-1)
    # unit split-damping profile: lambda for rotations, lambda/10 for
    # intrinsics (.cc:240-248); scaled by the (possibly adapted) lambda
    damp_unit = jnp.where(jnp.arange(n_cam * 6) % 6 >= 3, 1.0, 0.1)

    def rms(r, wm):
        npts = jnp.sum(wm > 0) * 2.0
        return jnp.sqrt(jnp.sum(r * r) / jnp.maximum(npts, 1.0))

    r0, wm0 = _pairs_residuals(flat0.reshape(n_cam, 6), prob)
    err0 = rms(r0, wm0)

    def cond(carry):
        _, _, _, nr_nd, itr, _ = carry
        return (itr < max_iter) & (nr_nd <= patience)

    upd2d = upd_mask.reshape(n_cam, 6)

    def body(carry):
        best_flat, resid, best_err, nr_nd, itr, lam = carry
        # frozen parameters (identity camera's rotation) are zeroed as
        # Jacobian COLUMNS, so the solve itself honors the constraint —
        # the damped diagonal keeps those rows invertible and their delta
        # exactly 0 (the post-solve mask below is then a no-op kept as a
        # belt-and-suspenders guard)
        if banded:
            from .banded import assemble_banded, solve_block_cyclic

            Bp, bp, F, Tc = _pairs_ne_blocks(
                best_flat.reshape(n_cam, 6), resid, prob, upd2d
            )
            D, U, C, rhs = assemble_banded(Bp, bp, F, Tc, n_cam)
            dvec = (damp_unit * lam).reshape(n_cam, 6)
            D = D + jnp.eye(6, dtype=D.dtype)[None] * dvec[:, :, None]
            delta = solve_block_cyclic(D, U, C, rhs).reshape(-1)
        else:
            JtJ, Jtb = _pairs_normal_equations(
                best_flat.reshape(n_cam, 6), resid, prob, n_cam, upd2d
            )
            A = JtJ + jnp.diag(damp_unit * lam)
            delta = _lm_solve(A, Jtb, device_solver)
        new_flat = best_flat - delta * upd_mask
        new_r, wm = _pairs_residuals(new_flat.reshape(n_cam, 6), prob)
        new_err = rms(new_r, wm)
        # acceptance: the reference's absolute 1e-3 px rule (.cc:152),
        # optionally tightened to a RELATIVE plateau for intermediate
        # passes (rel_tol > 0): a pass whose only job is keeping the next
        # initialization healthy stops once steps stop moving the error
        # by a meaningful fraction
        thresh = jnp.maximum(1e-3, rel_tol * best_err)
        improved = new_err < best_err - thresh
        best_flat = jnp.where(improved, new_flat, best_flat)
        best_err = jnp.where(improved, new_err, best_err)
        nr_nd = jnp.where(improved, 0, nr_nd + 1)
        if adaptive:
            lam = jnp.clip(
                jnp.where(improved, lam / 3.0, lam * 4.0), 1e-4, 1e8
            )
        return best_flat, new_r, best_err, nr_nd, itr + 1, lam

    lam0 = jnp.asarray(lm_lambda, dtype)
    init = (flat0, r0, err0, jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32), lam0)
    best_flat, _, _, _, itr, _ = jax.lax.while_loop(cond, body, init)
    return best_flat, itr


def pairs_to_points(from_idx, to_idx, pts_to, pts_from, valid, pair_active):
    """Convert a pair-major [P,M] problem to the segment layout (jit-safe:
    no compaction — weights select; each pair's M rows are its segment)."""
    P, M = valid.shape
    dt = pts_to.dtype
    return BAProblem(
        pt_to=pts_to.reshape(P * M, 2),
        pt_from=pts_from.reshape(P * M, 2),
        pair_id=jnp.repeat(jnp.arange(P, dtype=jnp.int32), M),
        w=valid.reshape(-1).astype(dt),
        starts=jnp.arange(P, dtype=jnp.int32) * M,
        ends=(jnp.arange(P, dtype=jnp.int32) + 1) * M,
        cam_to=jnp.asarray(to_idx, jnp.int32),
        cam_from=jnp.asarray(from_idx, jnp.int32),
        swapped=jnp.zeros(P, bool),
        pair_w=jnp.asarray(pair_active, dt),
    )
