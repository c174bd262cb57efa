"""TPU-friendly stream compaction.

``jnp.nonzero(mask, size=K)`` lowers to a full-array scatter on TPU and
costs ~300 ms on a few-million-element mask — it dominated the whole SIFT
pipeline (the reference's analog is the OpenMP critical-section append at
extrema.cc:56, which is cheap on CPU).  ``compact_indices`` computes the
same "indices of the first K set lanes, ascending" with only dense
vector ops plus one contiguous row gather:

1. reshape the mask to [B, block] and take per-block inclusive cumsums
   (rank of each lane within its block) — pure VPU work;
2. a tiny cumsum over the B per-block counts gives each block's global
   offset;
3. for each output slot k < K, binary-search which block holds the k-th
   set bit (searchsorted over B elements), row-gather that block's rank
   vector (contiguous [block] rows — fast, unlike random element gathers),
   and argmax the matching rank.

All index math is int32 regardless of jax_enable_x64.
"""

from __future__ import annotations

import jax.numpy as jnp

_BLOCK = 512


def compact_indices(mask: jnp.ndarray, size: int, block: int = _BLOCK):
    """Indices of the first `size` True lanes of 1-D `mask`, ascending.

    Returns ``(idx, count)``: ``idx`` is [size] int32, zero-filled beyond
    ``count = sum(mask)``.  Drop-in for
    ``jnp.nonzero(mask, size=size, fill_value=0)[0]`` (plus the count).
    """
    n = mask.shape[0]
    nb = -(-n // block)
    m = jnp.pad(mask.astype(jnp.int32), (0, nb * block - n)).reshape(nb, block)
    local = jnp.cumsum(m, axis=1, dtype=jnp.int32)      # [B, block] ranks
    coffs = jnp.cumsum(local[:, -1], dtype=jnp.int32)   # [B] inclusive offsets

    k = jnp.arange(size, dtype=jnp.int32)
    b = jnp.searchsorted(coffs, k, side="right").astype(jnp.int32)
    bc = jnp.clip(b, 0, nb - 1)
    before = jnp.where(bc > 0, coffs[jnp.maximum(bc - 1, 0)], 0)
    want = k - before + 1                               # 1-based rank in block

    rows = local[bc]                                    # [size, block] row gather
    mrows = m[bc]
    hit = (rows == want[:, None]) & (mrows > 0)
    pos = jnp.argmax(hit, axis=1).astype(jnp.int32)
    idx = bc * block + pos

    count = coffs[-1]
    return jnp.where(k < count, idx, 0), count


def compact_indices_capped(mask: jnp.ndarray, size: int, block: int = 128,
                           per_block_cap: int = 32):
    """Like :func:`compact_indices` but with at most ``per_block_cap`` hits
    taken per ``block`` consecutive lanes (extras are dropped and excluded
    from the returned count).

    Rationale: the exact algorithm's [size, block] row gather costs ~1-2 us
    per row on TPU (dynamic-slice per output slot) and dominates on
    multi-million-lane masks.  Here each block's first ``cap`` hit positions
    are precomputed densely (cap argmax passes over the whole mask — pure
    VPU) into a [B, cap] table, and each output slot needs only one
    *element* gather.  Safe when hits are locally sparse — e.g. strict
    26-neighbor DoG extrema can't occupy adjacent lanes, so a 128-lane run
    holds well under 32 of them.
    """
    n = mask.shape[0]
    nb = -(-n // block)
    m = jnp.pad(mask.astype(jnp.int32), (0, nb * block - n)).reshape(nb, block)
    local = jnp.cumsum(m, axis=1, dtype=jnp.int32)      # [B, block] ranks
    cnt = jnp.minimum(local[:, -1], per_block_cap)       # capped block counts
    coffs = jnp.cumsum(cnt, dtype=jnp.int32)             # [B] inclusive offsets

    # pos_packed[b, r] = lane of the (r+1)-th set bit of block b
    hitrank = jnp.where(m > 0, local, 0)                 # 0 where unset
    pos_packed = jnp.stack(
        [jnp.argmax(hitrank == (r + 1), axis=1).astype(jnp.int32)
         for r in range(per_block_cap)], axis=1)         # [B, cap]

    k = jnp.arange(size, dtype=jnp.int32)
    b = jnp.searchsorted(coffs, k, side="right").astype(jnp.int32)
    bc = jnp.clip(b, 0, nb - 1)
    before = jnp.where(bc > 0, coffs[jnp.maximum(bc - 1, 0)], 0)
    r = jnp.clip(k - before, 0, per_block_cap - 1)       # 0-based rank
    pos = pos_packed[bc, r]                              # [size] element gather
    idx = bc * block + pos

    count = jnp.minimum(coffs[-1], size)
    return jnp.where(k < count, idx, 0), count
