"""Batched keypoint-window extraction (the SIFT gather hot path).

Orientation assignment and descriptor computation both need, per keypoint,
a small window of the gradient magnitude/orientation planes around the
keypoint (reference: feature/orientation.cc:47-66, feature/sift.cc:99-144,
where it is a scalar loop per keypoint).  Expressed as an XLA element
gather (``plane[s, y+dy, x+dx]``) this runs at ~50M elements/s on TPU and
dominated the SIFT pipeline (~116 ms per octave).  This module extracts
windows with a Pallas kernel instead: per keypoint, one 2-D DMA copies a
``[WR, 256]`` slab from each plane in HBM straight into the output block in
VMEM — HBM-bandwidth-bound instead of gather-bound.

Mosaic requires DMA slice offsets in the two tiled (trailing) dims to be
tile-aligned — (8, 128) for f32 — so slab starts snap DOWN to tile
boundaries and slabs are 256 lanes wide; the planes are zero-padded to
tile-multiple shapes first.  Addressing convention (shared by the kernel,
the XLA fallback, and the callers):

  Hp = max(ceil8(H), WR); Wp = max(ceil128(W), 256)   # padded plane dims
  r0 = clip(align8(y - WR//2),  0, Hp - WR)           # WR slab rows
  c0 = clip(align128(x - 64),   0, Wp - 256)          # 256 slab lanes
  out[k, i, j] = padded_plane[s[k], r0[k] + i, c0[k] + j]

With ``WR >= 2*R + 16`` every offset within +-R rows / +-63 lanes of the
keypoint is inside the slab (keypoint row offset y - r0 lands in
[WR//2, WR//2 + 7], lane offset x - c0 in [64, 191], clamped at image
edges where callers mask out-of-interior lanes anyway).

``vmap`` over a leading batch axis folds the batch into the scale axis
(planes are stacked, ``s' = b*S + s``) so the whole image batch still runs
as ONE kernel launch — see the ``custom_vmap`` rule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SLAB_LANES = 256
_BK = 16  # keypoints per grid step

# test hook: run the Pallas kernel in interpreter mode on non-TPU backends
INTERPRET = False


def slab_rows(radius: int) -> int:
    """Slab row count covering +-radius around the keypoint after 8-row
    alignment of the slab start."""
    return -(-(2 * radius + 16) // 8) * 8


def _padded_dims(H: int, W: int, WR: int) -> tuple[int, int]:
    return max(-(-H // 8) * 8, WR), max(-(-W // 128) * 128, SLAB_LANES)


def _starts(s, y, x, S, H, W, WR):
    """Aligned slab starts on the PADDED plane (see module docstring)."""
    Hp, Wp = _padded_dims(H, W, WR)
    s = jnp.clip(s.astype(jnp.int32), 0, S - 1)
    r0 = jnp.clip(y.astype(jnp.int32) - WR // 2, 0, Hp - WR) & ~7
    c0 = jnp.clip(x.astype(jnp.int32) - 64, 0, Wp - SLAB_LANES) & ~127
    return s, r0, c0


def window_starts(y, x, H: int, W: int, WR: int):
    """Public row/col start rule (callers rebuild per-lane offsets from it)."""
    _, r0, c0 = _starts(jnp.zeros_like(y), y, x, 1, H, W, WR)
    return r0, c0


def _pad_plane(a: jnp.ndarray, WR: int) -> jnp.ndarray:
    S, H, W = a.shape
    Hp, Wp = _padded_dims(H, W, WR)
    if (Hp, Wp) == (H, W):
        return a.astype(jnp.float32)
    return jnp.pad(a.astype(jnp.float32), ((0, 0), (0, Hp - H), (0, Wp - W)))


def _win2_xla(ap, bp, s, r0, c0, WR: int):
    """Fallback (CPU backends): same slab semantics via element gather on
    the padded planes."""
    rows = r0[:, None] + jnp.arange(WR, dtype=jnp.int32)
    cols = c0[:, None] + jnp.arange(SLAB_LANES, dtype=jnp.int32)
    idx = (s[:, None, None], rows[:, :, None], cols[:, None, :])
    return ap[idx], bp[idx]


@functools.lru_cache(maxsize=32)
def _win2_pallas(S: int, Hp: int, Wp: int, K: int, WR: int, interpret: bool = False):
    nblk = -(-K // _BK)

    def kernel(s_ref, r0_ref, c0_ref, a_ref, b_ref, outa_ref, outb_ref, sem):
        i = pl.program_id(0)

        def dma(k, plane_ref, out_ref, slot):
            # jnp.int32 wraps keep indices i32 under jax_enable_x64
            kk = i * jnp.int32(_BK) + jnp.int32(k)
            r0 = pl.multiple_of(r0_ref[kk], 8)
            c0 = pl.multiple_of(c0_ref[kk], 128)
            return pltpu.make_async_copy(
                plane_ref.at[s_ref[kk], pl.ds(r0, WR), pl.ds(c0, SLAB_LANES)],
                out_ref.at[jnp.int32(k)],
                sem.at[jnp.int32(k), jnp.int32(slot)],
            )

        for k in range(_BK):
            dma(k, a_ref, outa_ref, 0).start()
            dma(k, b_ref, outb_ref, 1).start()
        for k in range(_BK):
            dma(k, a_ref, outa_ref, 0).wait()
            dma(k, b_ref, outb_ref, 1).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nblk,),
        in_specs=[
            # planes stay in HBM: DMA'd per keypoint at tile-aligned offsets
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((_BK, WR, SLAB_LANES), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BK, WR, SLAB_LANES), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.SemaphoreType.DMA((_BK, 2))],
    )
    out_shape = jax.ShapeDtypeStruct((nblk * _BK, WR, SLAB_LANES), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[out_shape, out_shape],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=32)
def _make_win2(WR: int):
    @jax.custom_batching.custom_vmap
    def win2(a, b, s, y, x):
        S, H, W = a.shape
        K = s.shape[0]
        sc, r0, c0 = _starts(s, y, x, S, H, W, WR)
        ap, bp = _pad_plane(a, WR), _pad_plane(b, WR)
        on_tpu = jax.default_backend() == "tpu"
        if not on_tpu and not INTERPRET:
            return _win2_xla(ap, bp, sc, r0, c0, WR)
        nblk = -(-K // _BK)
        padn = nblk * _BK - K
        if padn:
            sc, r0, c0 = (jnp.pad(v, (0, padn)) for v in (sc, r0, c0))
        # Mosaic rejects the i64 literals that jax_enable_x64 injects into
        # the kernel jaxpr; all operands are i32/f32, so trace without x64
        with jax.enable_x64(False):
            wa, wb = _win2_pallas(S, ap.shape[1], ap.shape[2], K, WR,
                                  interpret=not on_tpu)(sc, r0, c0, ap, bp)
        return wa[:K], wb[:K]

    @win2.def_vmap
    def _win2_vmap(axis_size, in_batched, a, b, s, y, x):
        ab, bb, sb, yb, xb = in_batched
        B = axis_size
        bcast = lambda v, was: v if was else jnp.broadcast_to(v[None], (B,) + v.shape)
        a, b = bcast(a, ab), bcast(b, bb)
        s, y, x = bcast(s, sb), bcast(y, yb), bcast(x, xb)
        _, S, H, W = a.shape
        K = s.shape[1]
        # fold batch into the scale axis: one kernel launch for the batch
        s_flat = (s.astype(jnp.int32) + (jnp.arange(B, dtype=jnp.int32) * S)[:, None]).reshape(-1)
        wa, wb = win2(
            a.reshape(B * S, H, W), b.reshape(B * S, H, W),
            s_flat, y.reshape(-1), x.reshape(-1),
        )
        return (
            (wa.reshape(B, K, WR, SLAB_LANES), wb.reshape(B, K, WR, SLAB_LANES)),
            (True, True),
        )

    return win2


def gather_window_slabs(a: jnp.ndarray, b: jnp.ndarray, s: jnp.ndarray,
                        y: jnp.ndarray, x: jnp.ndarray, WR: int):
    """Extract keypoint-centered [WR, 256] slabs from two [S, H, W] planes.

    Returns ``(wa, wb)`` of shape [K, WR, 256] following the module-level
    addressing convention.  ``WR`` must be a multiple of 8 (f32 sublane
    tile) and should come from :func:`slab_rows`.  Batch with ``jax.vmap``;
    the batch folds into one kernel call.
    """
    assert WR % 8 == 0, WR
    return _make_win2(WR)(a, b, s, y, x)
