"""Descriptor matching: exact 2-NN on the MXU.

The reference uses a FLANN randomized KD-forest per image with an
approximate 2-NN search plus a one-at-a-time reverse query
(feature/matcher.cc:90-135), and a brute-force O(n^2) scalar path
(matcher.cc:15-71).  Both implement the same acceptance rule:

  - Lowe ratio test on squared distances, ``d1 <= r^2 * d2`` with
    r = MATCH_REJECT_NEXT_RATIO (rejected when ``min > r^2 * next_min``,
    matcher.cc:51,108),
  - mutual-best check: the reverse 1-NN of the matched target must be the
    query itself (matcher.cc:118-120),
  - reverse ratio test against the reverse 2nd-NN (matcher.cc:56-62,121-123).

TPU-native design: at OpenPano scales (<= a few thousand descriptors per
image) an *exact* batched 2-NN is a single [Ki,128]x[128,Kj] matmul on the
MXU — faster and deterministic, unlike the FLANN forest.  The acceptance
rule is symmetric under exchange of the two images (mutual-best pairs are
shared, and the two ratio tests cover both directions), so the reference's
"query with the smaller set" swap (matcher.cc:92-94) is unnecessary:
one distance matrix serves both directions.

All shapes fixed: descriptors are [K,128] zero-padded with validity masks;
matches are emitted as index pairs padded to M_max.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops.compact import compact_indices


class MatchResult(NamedTuple):
    """Fixed-size match list for one image pair (or a batch of pairs)."""

    idx: jnp.ndarray    # [..., M, 2] int32 — (index in image i, index in image j)
    valid: jnp.ndarray  # [..., M] bool
    count: jnp.ndarray  # [...] int32 — number of valid matches


def _sq_dist_matrix(da: jnp.ndarray, db: jnp.ndarray,
                    valid_a=None, valid_b=None) -> jnp.ndarray:
    """Pairwise squared euclidean distances via ||a||^2+||b||^2-2ab (MXU).

    The reference's SSE kernel computes the same quantity serially
    (feature/dist.cc:22-57).  This matrix only drives candidate
    *selection* — the final ratio tests recompute the few selected
    distances exactly — so the matmul defaults to HIGH precision (bf16x3
    passes, 2x the HIGHEST/bf16x6 throughput); match sets were verified
    bit-identical to HIGHEST on the CMU0 headline workload.  Near-tie 2-NN
    selections on other data could in principle differ — set
    OPENPANO_MATCH_PRECISION=highest to restore exact-selection behavior.

    Invalid (padding) rows/columns are pushed to ~1e19 by folding the mask
    into the norm terms — a [K] where instead of a [K,K] one."""
    na = jnp.sum(da * da, axis=-1)
    nb = jnp.sum(db * db, axis=-1)
    if valid_a is not None:
        na = jnp.where(valid_a, na, _PAD_DIST)
    if valid_b is not None:
        nb = jnp.where(valid_b, nb, _PAD_DIST)
    prec = getattr(jax.lax.Precision,
                   os.environ.get("OPENPANO_MATCH_PRECISION", "high").upper())
    cross = jnp.matmul(da, db.T, precision=prec)
    d2 = na[:, None] + nb[None, :] - 2.0 * cross
    return jnp.maximum(d2, 0.0)


def _exact_sq_dist(da: jnp.ndarray, db: jnp.ndarray) -> jnp.ndarray:
    """Row-wise exact ||da_i - db_i||^2 for gathered candidate pairs."""
    d = da - db
    return jnp.sum(d * d, axis=-1)


_BIG = jnp.float32(3.4e38)
_PAD_DIST = jnp.float32(1e19)   # >> any real descriptor distance


def _top2_both(d2: jnp.ndarray, axis: int):
    """(d1, d2nd, idx[...,2]) along `axis` — two smallest and their indices.

    Two argmin passes instead of lax.top_k: XLA lowers top_k on TPU to a
    sort-based expansion that is ~25x slower than two reductions at these
    widths."""
    d = jnp.moveaxis(d2, axis, -1)
    i1 = jnp.argmin(d, -1)
    d1 = jnp.take_along_axis(d, i1[..., None], -1)[..., 0]
    masked = jnp.where(
        jax.nn.one_hot(i1, d.shape[-1], dtype=bool), _BIG, d
    )
    i2 = jnp.argmin(masked, -1)
    d2nd = jnp.take_along_axis(masked, i2[..., None], -1)[..., 0]
    return d1, d2nd, jnp.stack([i1, i2], -1).astype(jnp.int32)


def match_pair_from_dists(d2: jnp.ndarray, desc_i: jnp.ndarray, desc_j: jnp.ndarray,
                          valid_i: jnp.ndarray, valid_j: jnp.ndarray,
                          cfg: Config) -> MatchResult:
    """Apply ratio + mutual-best acceptance to a [Ki,Kj] distance matrix.
    Invalid rows/columns must already carry huge distances (see
    `_sq_dist_matrix`'s valid_a/valid_b)."""
    Ki = d2.shape[0]
    r2 = jnp.float32(cfg.MATCH_REJECT_NEXT_RATIO ** 2)

    _, _, fwd_top = _top2_both(d2, axis=1)   # per query in i: top-2 NN in j
    _, _, rev_top = _top2_both(d2, axis=0)   # per target in j: top-2 NN in i
    fwd_idx, fwd_idx2 = fwd_top[..., 0], fwd_top[..., 1]
    rev_idx = rev_top[..., 0]

    # exact distances for the selected candidates (no cancellation)
    fwd_d1 = _exact_sq_dist(desc_i, desc_j[fwd_idx])
    fwd_d2 = _exact_sq_dist(desc_i, desc_j[fwd_idx2])
    rev_d2 = _exact_sq_dist(desc_j, desc_i[rev_top[..., 1]])

    # forward ratio (matcher.cc:108): reject when d1 > r^2 * d2nd
    ok = fwd_d1 <= r2 * fwd_d2
    # mutual best (matcher.cc:118-120)
    qi = jnp.arange(Ki)
    ok &= rev_idx[fwd_idx] == qi
    # reverse ratio against the reverse 2nd-NN (matcher.cc:121-123)
    ok &= fwd_d1 <= r2 * rev_d2[fwd_idx]
    ok &= valid_i & valid_j[fwd_idx] & valid_j[fwd_idx2]

    M = cfg.MAX_MATCHES_PER_PAIR
    keep, count = compact_indices(ok, M)
    count = count.astype(jnp.int32)
    mvalid = jnp.arange(M) < count
    pairs = jnp.stack([keep, fwd_idx[keep]], axis=-1).astype(jnp.int32)
    pairs = jnp.where(mvalid[:, None], pairs, 0)
    return MatchResult(idx=pairs, valid=mvalid, count=count)


def match_pair(desc_i: jnp.ndarray, valid_i: jnp.ndarray,
               desc_j: jnp.ndarray, valid_j: jnp.ndarray, cfg: Config) -> MatchResult:
    """Match two descriptor sets ([K,128] each, mask-padded)."""
    return match_pair_from_dists(
        _sq_dist_matrix(desc_i, desc_j, valid_i, valid_j),
        desc_i, desc_j, valid_i, valid_j, cfg,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def match_all_pairs(desc: jnp.ndarray, valid: jnp.ndarray, cfg: Config) -> MatchResult:
    """All C(n,2) unordered pairs, batched (reference: Stitcher::pairwise_match
    loops pairs under OpenMP, stitch/stitcher.cc:96-114).

    desc: [N, K, 128], valid: [N, K].  Returns MatchResult batched over a
    flat pair axis; pairing (i<j) follows `pair_indices(N)`.
    """
    n = desc.shape[0]
    ii, jj = pair_indices(n)

    def one(i, j):
        return match_pair(desc[i], valid[i], desc[j], valid[j], cfg)

    # chunk the pair axis: each pair holds a [K,K] distance matrix live
    from ..utils.batching import chunked_vmap

    return chunked_vmap(one, (jnp.asarray(ii), jnp.asarray(jj)), chunk=32)


def match_ring_pairs(desc: jnp.ndarray, valid: jnp.ndarray, cfg: Config) -> MatchResult:
    """All (i, (i+1) mod n) pairs including the head-tail wrap — the ordered
    path of Stitcher::linear_pairwise_match (stitch/stitcher.cc:116-136),
    where the wrap pair is allowed to fail.  NOT jitted as a whole: the
    chunk loop below must stay a host loop so each chunk's distance batch
    is released before the next dispatches.

    The vmapped dispatch materializes a [pairs, K, K] f32 distance batch;
    at giga scale (n~500, K=2048) that is ~8 GB, which OOMs a 16 GB chip
    alongside the descriptor set (observed r4) — so the ring is matched in
    chunks bounded to ~1.5 GB of distance matrices (at most two compiled
    shapes: full chunk + remainder)."""
    n = desc.shape[0]
    K = desc.shape[1]
    chunk = max(1, int((1.5 * 2**30) // (K * K * 4)))
    if chunk >= n:
        return _match_ring_all(desc, valid, cfg)
    parts = []
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        parts.append(_match_ring_chunk(
            desc, valid, jnp.arange(lo, hi), cfg))
        jax.block_until_ready(parts[-1])  # bound live distance batches
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *parts)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _match_ring_all(desc, valid, cfg: Config) -> MatchResult:
    n = desc.shape[0]
    ii = jnp.arange(n)
    jj = (ii + 1) % n

    def one(i, j):
        return match_pair(desc[i], valid[i], desc[j], valid[j], cfg)

    return jax.vmap(one)(ii, jj)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _match_ring_chunk(desc, valid, ii, cfg: Config) -> MatchResult:
    n = desc.shape[0]
    jj = (ii + 1) % n

    def one(i, j):
        return match_pair(desc[i], valid[i], desc[j], valid[j], cfg)

    return jax.vmap(one)(ii, jj)


@functools.partial(jax.jit, static_argnames=("cfg",))
def match_adjacent_pairs(desc: jnp.ndarray, valid: jnp.ndarray, cfg: Config) -> MatchResult:
    """Only (i, i+1) pairs for ordered input (reference:
    Stitcher::linear_pairwise_match, stitch/stitcher.cc:116-136)."""
    n = desc.shape[0]
    idx = jnp.arange(n - 1)

    def one(i):
        return match_pair(desc[i], valid[i], desc[i + 1], valid[i + 1], cfg)

    return jax.vmap(one)(idx)


def pair_indices(n: int) -> tuple[list[int], list[int]]:
    """Host-side unordered pair enumeration (i < j), row-major like the
    reference's double loop (stitcher.cc:102-105)."""
    ii, jj = [], []
    for i in range(n):
        for j in range(i + 1, n):
            ii.append(i)
            jj.append(j)
    return ii, jj
