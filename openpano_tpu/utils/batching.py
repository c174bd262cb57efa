"""Chunked vmap: bound the live memory of large batched maps.

``vmap`` materializes every per-element intermediate for the whole batch at
once; for the all-pairs matcher (a [K,K] distance matrix per pair) or the
vmapped RANSAC (a [n_hyp, M] residual matrix per pair) that overflows HBM
on a few hundred pairs.  ``chunked_vmap`` runs the vmapped function over
fixed-size chunks inside ``lax.map`` — one compiled executable, live
intermediates bounded by the chunk size, results concatenated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chunked_vmap(fn, args: tuple, chunk: int):
    """Apply ``jax.vmap(fn)`` over the leading axis of ``args`` in chunks.

    args: tuple of pytrees whose leaves share leading dim N.  Returns the
    same pytree ``jax.vmap(fn)(*args)`` would, computed ``chunk`` rows at a
    time.  The tail chunk is padded by repeating row 0 and trimmed after.
    """
    n = jax.tree_util.tree_leaves(args)[0].shape[0]
    if n <= chunk:
        return jax.vmap(fn)(*args)
    nc = -(-n // chunk)
    padn = nc * chunk - n

    def pad(a):
        if padn:
            rep = jnp.broadcast_to(a[:1], (padn,) + a.shape[1:])
            a = jnp.concatenate([a, rep], axis=0)
        return a.reshape((nc, chunk) + a.shape[1:])

    out = jax.lax.map(
        lambda ch: jax.vmap(fn)(*ch), jax.tree_util.tree_map(pad, args)
    )
    return jax.tree_util.tree_map(
        lambda a: a.reshape((nc * chunk,) + a.shape[2:])[:n], out
    )
