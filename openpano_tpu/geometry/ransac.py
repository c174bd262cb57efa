"""RANSAC transform estimation with the reference's acceptance gates.

Reference: stitch/transform_estimate.cc.  The reference runs a sequential
1500-iteration loop with `mt19937` seeded from `random_device` (making runs
nondeterministic, transform_estimate.cc:64-65); each iteration samples
7 (affine) / 8 (homography) distinct matches (:53,67-77), fits a normalized
DLT, drops unhealthy fits (:79-80), and counts inliers with one n x 3
matmul (:132-148).

TPU-native design: all hypotheses are *vmapped* — sampling uses counter-based
PRNG keys (deterministic), the per-hypothesis DLT is a tiny batched 8x8
solve, and inlier counting is one [nh, M, 3] x [nh, 3, 3] batched matmul on
the MXU.  The acceptance gates (fill_inliers_to_matchinfo, :150-218) are
branch-free boolean algebra over exact overlap-region membership
(see geometry/homography.py: the convex-hull + angular point-in-polygon
approximation is replaced by the exact test).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops.compact import compact_indices
from ..match.matcher import MatchResult
from .dlt import normalized_transform
from .homography import (
    health,
    homo_inverse,
    overlap_area_fraction,
    overlap_mask_in1,
    trans2d,
)

ESTIMATE_MIN_NR_MATCH = 8  # transform_estimate.cc:21


class MatchInfo(NamedTuple):
    """Per-pair estimation result (reference: MatchInfo, match_info.hh:14-51).

    ``homo`` maps image-j (from) coordinates to image-i (to) coordinates,
    both half-shifted.  ``confidence`` is 0 when the pair is rejected and
    ``-n_inliers`` when rejected-with-debug-info, matching the reference's
    convention (transform_estimate.cc:153)."""

    homo: jnp.ndarray      # [..., 3, 3]
    confidence: jnp.ndarray  # [...]
    to_pos: jnp.ndarray    # [..., M, 2] inlier coords in image i
    from_pos: jnp.ndarray  # [..., M, 2] inlier coords in image j
    valid: jnp.ndarray     # [..., M] bool
    count: jnp.ndarray     # [...] int32


def estimate_transform(
    match: MatchResult,
    pos1: jnp.ndarray, valid1: jnp.ndarray,
    pos2: jnp.ndarray, valid2: jnp.ndarray,
    wh1: jnp.ndarray, wh2: jnp.ndarray,
    key: jnp.ndarray, cfg: Config, affine: bool,
) -> MatchInfo:
    """Estimate the homography/affine from image 2 to image 1.

    pos*: [K,2] half-shifted keypoint coords; valid*: [K] masks;
    wh*: (2,) image (width, height); key: PRNG key.
    """
    M = match.idx.shape[0]
    p1 = pos1[match.idx[:, 0]]
    p2 = pos2[match.idx[:, 1]]
    mvalid = match.valid
    n_match = match.count

    # per-resolution threshold (transform_estimate.cc:46)
    thres = (wh1[0] + wh1[1]) * 0.5 / 800.0 * cfg.RANSAC_INLIER_THRES
    inlier_dist = thres * thres

    ns = (6 if affine else 8) // 2 + 4  # transform_estimate.cc:53
    nh = cfg.RANSAC_ITERATIONS

    # uniform sampling of valid match rows per hypothesis.  Matches are
    # compacted to the front, so a draw is just an integer in [0, n_match).
    # The reference resamples until the ns draws are distinct
    # (transform_estimate.cc:67-77); here rare within-hypothesis duplicates
    # are kept — they make the DLT singular and health() rejects that
    # hypothesis, costing a negligible fraction of the 1500 iterations.
    # (A Gumbel-top-k distinct sampler costs ~100x more PRNG + ns argmax
    # passes over [nh, M] — it dominated the whole RANSAC stage.)
    u = jax.random.uniform(key, (nh, ns))
    hi = jnp.maximum(n_match, 1).astype(u.dtype)
    sel = jnp.minimum(
        (u * hi).astype(jnp.int32), jnp.maximum(n_match - 1, 0)
    )                                                 # [nh, ns]

    w_sel = jnp.ones((nh, ns), dtype=p1.dtype)
    H_hyp = normalized_transform(p1[sel], p2[sel], w_sel, affine)  # [nh,3,3]
    healthy = health(H_hyp)                            # transform_estimate.cc:79

    proj, _ = trans2d(H_hyp, p2[None, :, :])           # [nh, M, 2]
    err2 = jnp.sum((proj - p1[None, :, :]) ** 2, axis=-1)
    inl = (err2 < inlier_dist) & mvalid[None, :]       # transform_estimate.cc:132-148
    n_inl = jnp.sum(inl, axis=-1)
    score = jnp.where(healthy, n_inl, -1)
    best = jnp.argmax(score)

    inlier_mask = inl[best]                            # final inlier set: from best hypothesis
    n_inlier = n_inl[best]

    # refit on all inliers (transform_estimate.cc:85-86,179)
    H = normalized_transform(p1, p2, inlier_mask.astype(p1.dtype), affine)

    # ---- acceptance gates (fill_inliers_to_matchinfo, :150-218) ----
    Hinv, inv_ok = homo_inverse(H)

    def gates():
        in_ov1_m = overlap_mask_in1(H, Hinv, wh1, wh2, p1[None])[0] & mvalid
        in_ov2_m = overlap_mask_in1(Hinv, H, wh2, wh1, p2[None])[0] & mvalid
        in_ov1_k = overlap_mask_in1(H, Hinv, wh1, wh2, pos1[None])[0] & valid1
        in_ov2_k = overlap_mask_in1(Hinv, H, wh2, wh1, pos2[None])[0] & valid2
        fn = n_inlier.astype(jnp.float32)
        r1m = fn / jnp.maximum(jnp.sum(in_ov1_m), 1)
        r2m = fn / jnp.maximum(jnp.sum(in_ov2_m), 1)
        r1p = fn / jnp.maximum(jnp.sum(in_ov1_k), 1)
        r2p = fn / jnp.maximum(jnp.sum(in_ov2_k), 1)
        conf = (r1p + r2p) * 0.5

        ok = (r1m >= cfg.INLIER_IN_MATCH_RATIO) & (r2m >= cfg.INLIER_IN_MATCH_RATIO)
        ok &= (r1p >= 0.01) & (r1p <= 1.0) & (r2p >= 0.01) & (r2p <= 1.0)
        ok &= conf >= cfg.INLIER_IN_POINTS_RATIO

        # overlap area in image-2 coordinates vs the larger image
        # (transform_estimate.cc:204-208)
        area2 = wh2[0] * wh2[1]
        area1 = wh1[0] * wh1[1]
        area = overlap_area_fraction(H[None], wh2[None], wh1[None],
                                     cfg.OVERLAP_AREA_GRID)[0] * area2
        ok &= area / jnp.maximum(area1, area2) >= 0.15
        return ok, conf

    gate_ok, conf = gates()
    success = (
        (n_match >= ESTIMATE_MIN_NR_MATCH)
        & (n_match >= ns)
        & (n_inlier >= ESTIMATE_MIN_NR_MATCH)
        & inv_ok
        & gate_ok
    )

    # compact inliers to the front of the match buffer
    keep, _ = compact_indices(inlier_mask, M)
    out_valid = (jnp.arange(M) < n_inlier) & success
    confidence = jnp.where(success, conf, -n_inlier.astype(jnp.float32))
    return MatchInfo(
        homo=H,
        confidence=confidence,
        to_pos=jnp.where(out_valid[:, None], p1[keep], 0.0),
        from_pos=jnp.where(out_valid[:, None], p2[keep], 0.0),
        valid=out_valid,
        count=jnp.where(success, n_inlier, 0).astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "affine"))
def estimate_transform_batch(
    matches: MatchResult,
    pos: jnp.ndarray, valid: jnp.ndarray,
    whs: jnp.ndarray,
    ii: jnp.ndarray, jj: jnp.ndarray,
    key: jnp.ndarray, cfg: Config, affine: bool,
    keys: jnp.ndarray | None = None,
) -> MatchInfo:
    """vmap of estimate_transform over a flat pair axis.

    matches: MatchResult batched over P pairs; pos/valid: [N,K,2]/[N,K];
    whs: [N,2]; ii/jj: [P] image indices per pair.  ``keys`` (optional
    [P, ...] per-pair PRNG keys) overrides the internal split — pass the
    original slots' keys when running a compacted pair subset so results
    don't depend on the compaction."""
    P = ii.shape[0]
    if keys is None:
        keys = jax.random.split(key, P)

    def one(m, i, j, k):
        return estimate_transform(
            m, pos[i], valid[i], pos[j], valid[j], whs[i], whs[j], k, cfg, affine
        )

    # chunk the pair axis: each pair holds [n_hyp, M] residuals live
    from ..utils.batching import chunked_vmap

    return chunked_vmap(one, (matches, ii, jj, keys), chunk=32)


def reverse_matchinfo(info: MatchInfo) -> MatchInfo:
    """MatchInfo for the (j,i) direction given (i,j): inverse homography and
    swapped coordinate pairs (reference: Stitcher::match_image fills both
    triangle entries, stitcher.cc:88-92; MatchInfo::reverse,
    match_info.hh:21-24)."""
    Hinv, _ = homo_inverse(info.homo)
    return MatchInfo(
        homo=Hinv,
        confidence=info.confidence,
        to_pos=info.from_pos,
        from_pos=info.to_pos,
        valid=info.valid,
        count=info.count,
    )
