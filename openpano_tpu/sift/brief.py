"""BRIEF binary descriptor (alternative to SIFT, reference: feature/brief.{hh,cc}).

Pattern II of the BRIEF paper: point pairs drawn from N(0.5s, 0.2s) inside
an s x s patch (brief.cc:66-91), default s=9, n=256 pairs
(BRIEF_PATH_SIZE/BRIEF_NR_PAIR, lib/config.hh:82-83).  The reference packs
bits into floats-reinterpreted-as-ints and matches with a popcount hamming
distance (dist.cc:93-101); nothing instantiates it in the main path
(StitcherBase hardcodes SIFT, stitcherbase.hh:53) but it is part of the
feature-layer surface.

TPU-native: the pattern is drawn once with a keyed PRNG (deterministic,
unlike the reference's random_device seeding); descriptors are one batched
gather + compare + bit-pack into uint32 words; matching is XOR +
population_count on the VPU with the same ratio/mutual-best acceptance as
the SIFT matcher.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops.compact import compact_indices
from ..match.matcher import MatchResult

BRIEF_PATCH_SIZE = 9   # lib/config.hh:82
BRIEF_NR_PAIR = 256    # lib/config.hh:83


class BriefPattern(NamedTuple):
    s: int
    offsets: np.ndarray  # [n, 4] int32: dy1, dx1, dy2, dx2 relative to center


def gen_brief_pattern(seed: int = 0, s: int = BRIEF_PATCH_SIZE,
                      n: int = BRIEF_NR_PAIR) -> BriefPattern:
    """Sample the point-pair pattern (brief.cc:66-91): coordinates ~
    N(0.5s, 0.2s) redrawn until inside [0, s); identical pairs redrawn."""
    assert s % 2 == 1 and n % 32 == 0
    rng = np.random.default_rng(seed)

    def sample():
        while True:
            v = int(round(rng.normal(0.5 * s, 0.2 * s)))
            if 0 <= v < s:
                return v

    half = s // 2
    offs = np.zeros((n, 4), np.int32)
    for i in range(n):
        x1, y1 = sample(), sample()
        while True:
            x2, y2 = sample(), sample()
            if not (y1 == x1 and y2 == x2):  # quirk kept from brief.cc:82-86
                break
        offs[i] = (y1 - half, x1 - half, y2 - half, x2 - half)
    return BriefPattern(s=s, offsets=offs)


@functools.partial(jax.jit, static_argnames=("s",))
def compute_brief(grey: jnp.ndarray, pts: jnp.ndarray, valid: jnp.ndarray,
                  offsets: jnp.ndarray, s: int):
    """grey: [H,W]; pts: [K,2] (x,y) pixel coords; offsets: [n,4].
    Returns (desc [K, n//32] uint32, valid [K]) — keypoints whose patch
    leaves the image are dropped (brief.cc:22-29)."""
    H, W = grey.shape
    half = s // 2
    x = jnp.round(pts[:, 0]).astype(jnp.int32)
    y = jnp.round(pts[:, 1]).astype(jnp.int32)
    ok = valid & (x >= half) & (x + half < W) & (y >= half) & (y + half < H)
    xc = jnp.clip(x, half, W - half - 1)
    yc = jnp.clip(y, half, H - half - 1)

    y1 = yc[:, None] + offsets[None, :, 0]
    x1 = xc[:, None] + offsets[None, :, 1]
    y2 = yc[:, None] + offsets[None, :, 2]
    x2 = xc[:, None] + offsets[None, :, 3]
    bits = grey[y1, x1] > grey[y2, x2]                       # [K, n]

    n = offsets.shape[0]
    words = bits.reshape(-1, n // 32, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    desc = jnp.sum(words.astype(jnp.uint32) * weights[None, None, :], axis=-1,
                   dtype=jnp.uint32)
    return desc, ok


def hamming_dist_matrix(da: jnp.ndarray, db: jnp.ndarray) -> jnp.ndarray:
    """[Ki,W]x[Kj,W] packed-word descriptors -> [Ki,Kj] hamming distances
    (dist.cc:93-101, popcount over XOR)."""
    x = jax.lax.population_count(da[:, None, :] ^ db[None, :, :])
    return jnp.sum(x, axis=-1).astype(jnp.float32)


def match_brief(desc_i, valid_i, desc_j, valid_j, cfg: Config) -> MatchResult:
    """Hamming 2-NN with the same ratio + mutual-best acceptance as the
    float matcher (matcher.cc:51-62,108-123); the integer hamming matrix is
    exact, so no distance recompute is needed."""
    d2 = hamming_dist_matrix(desc_i, desc_j)
    Ki = d2.shape[0]
    big = jnp.float32(3.4e38)
    r2 = jnp.float32(cfg.MATCH_REJECT_NEXT_RATIO ** 2)
    d2 = jnp.where(valid_i[:, None] & valid_j[None, :], d2, big)

    from ..match.matcher import _top2_both

    fwd_d1, fwd_d2, idxf = _top2_both(d2, axis=1)
    fwd_idx = idxf[:, 0]
    _, rev_d2, idxr = _top2_both(d2, axis=0)
    rev_idx = idxr[:, 0]

    ok = fwd_d1 <= r2 * fwd_d2
    ok &= rev_idx[fwd_idx] == jnp.arange(Ki)
    ok &= fwd_d1 <= r2 * rev_d2[fwd_idx]
    ok &= valid_i & (fwd_d1 < big)

    M = cfg.MAX_MATCHES_PER_PAIR
    keep, count = compact_indices(ok, M)
    count = count.astype(jnp.int32)
    mvalid = jnp.arange(M) < count
    pairs = jnp.stack([keep, fwd_idx[keep]], axis=-1).astype(jnp.int32)
    return MatchResult(
        idx=jnp.where(mvalid[:, None], pairs, 0), valid=mvalid, count=count
    )
