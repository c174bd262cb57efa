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


# ---------------------------------------------------------------------------
# Fused orientation histogram: window DMA + circular-window gaussian weights
# + 36-bin hard-binned histogram, all inside one kernel.
#
# The slab-then-histogram formulation materializes [K, WR, 256] mag/ort
# slabs in HBM and re-reads them once per bin (36 masked reductions) — the
# dominant HBM traffic of the SIFT stage.  Here the slabs only ever live in
# VMEM scratch and the kernel writes just the [K, NBINS] histograms
# (reference: per-keypoint scalar loop at feature/orientation.cc:47-66).
# ---------------------------------------------------------------------------

ORI_NBINS = 36  # ORI_HIST_BIN_NUM (config.hh:74)


def _ori_hist_math(mag, ort, dy, dx, plane_y, plane_x, rad, invden,
                   H, W, nbins: int):
    """Shared per-element math (kernel and XLA fallback).  All inputs
    broadcast to [..., WR, LANES]; rad/invden/H/W broadcast per keypoint
    (H/W may be per-keypoint octave dims when octaves share one stacked
    plane).  Semantics mirror orientation.cc:47-66 via sift/orientation.py."""
    r2 = dy * dy + dx * dx
    inside = (
        (dy >= -rad) & (dy <= rad - 1) & (dx >= -rad) & (dx <= rad - 1)
        & (r2 <= rad * rad)
        & (plane_x >= 1) & (plane_x <= W - 2)
        & (plane_y >= 1) & (plane_y <= H - 2)
    )
    wgt = jnp.where(inside, jnp.exp(-r2 * invden) * mag, 0.0)
    # round-half-away hard binning (ort >= 0 always); nbins wraps to 0
    b = jnp.floor(ort * (nbins / (2.0 * jnp.pi)) + 0.5).astype(jnp.int32)
    b = jnp.where(b >= nbins, b - nbins, b)
    return wgt, b


@functools.lru_cache(maxsize=32)
def _ori_hist_pallas(S: int, Hp: int, Wp: int, K: int, WR: int,
                     H: int, W: int, interpret: bool = False):
    """Everything in the kernel is 2-D: the block's _BK keypoint slabs are
    stacked on the sublane axis as [_BK*WR, 256], per-row metadata rides in
    a [_BK*WR, 8] side input, and the per-keypoint reduction of row partial
    histograms is a tiny [_BK, _BK*WR] x [_BK*WR, 36] segment matmul (2-D
    layouts avoid Mosaic's rank-1/3 layout corner cases)."""
    nblk = -(-K // _BK)
    BKWR = _BK * WR

    def kernel(s_ref, r0_ref, c0_ref, blk_ref, meta_ref, a_ref, b_ref,
               out_ref, maga, orta, sem):
        i = pl.program_id(0)

        @pl.when(blk_ref[i] == 0)
        def _():
            out_ref[...] = jnp.zeros((_BK, ORI_NBINS), jnp.float32)

        @pl.when(blk_ref[i] != 0)
        def _():
            def dma(k, plane_ref, scr_ref, slot):
                kk = i * jnp.int32(_BK) + jnp.int32(k)
                r0 = pl.multiple_of(r0_ref[kk], 8)
                c0 = pl.multiple_of(c0_ref[kk], 128)
                return pltpu.make_async_copy(
                    plane_ref.at[s_ref[kk], pl.ds(r0, WR),
                                 pl.ds(c0, SLAB_LANES)],
                    scr_ref.at[pl.ds(k * WR, WR)],
                    sem.at[jnp.int32(k), jnp.int32(slot)],
                )

            for k in range(_BK):
                dma(k, a_ref, maga, 0).start()
                dma(k, b_ref, orta, 1).start()
            for k in range(_BK):
                dma(k, a_ref, maga, 0).wait()
                dma(k, b_ref, orta, 1).wait()

            m = meta_ref[...]                 # [BKWR, 8] f32
            dy = m[:, 0:1]                    # r0 - y + row, per slab row
            dxb = m[:, 1:2]                   # c0 - x
            rad, invden = m[:, 2:3], m[:, 3:4]
            py = m[:, 4:5]                    # plane row r0 + row
            c0f = m[:, 5:6]
            hb, wb = m[:, 6:7], m[:, 7:8]     # per-keypoint octave dims

            shp = (BKWR, SLAB_LANES)
            ic = jax.lax.broadcasted_iota(jnp.int32, shp, 1).astype(jnp.float32)
            wgt, bins = _ori_hist_math(
                maga[...], orta[...], dy, ic + dxb,
                py, ic + c0f, rad, invden, hb, wb, ORI_NBINS,
            )
            rows = jnp.concatenate([
                jnp.sum(jnp.where(bins == b, wgt, 0.0), axis=1, keepdims=True)
                for b in range(ORI_NBINS)
            ], axis=1)                        # [BKWR, 36] row partials
            # segment matmul: out[k, b] = sum of rows[k*WR:(k+1)*WR, b]
            kp_of_row = (jax.lax.broadcasted_iota(jnp.int32, (_BK, BKWR), 1)
                         // WR)
            kp_id = jax.lax.broadcasted_iota(jnp.int32, (_BK, BKWR), 0)
            seg = (kp_of_row == kp_id).astype(jnp.float32)
            out_ref[...] = jnp.dot(seg, rows,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((BKWR, 8), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((_BK, ORI_NBINS), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BKWR, SLAB_LANES), jnp.float32),
            pltpu.VMEM((BKWR, SLAB_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((_BK, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblk * _BK, ORI_NBINS), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )


def _ori_hist_xla(ap, bp, sc, r0, c0, y, x, rad, invden, hb, wb_, WR):
    """Fallback: identical semantics via element gather on padded planes."""
    wa, wb = _win2_xla(ap, bp, sc, r0, c0, WR)
    ir = jnp.arange(WR, dtype=jnp.float32)[None, :, None]
    ic = jnp.arange(SLAB_LANES, dtype=jnp.float32)[None, None, :]
    r0f = r0.astype(jnp.float32)[:, None, None]
    c0f = c0.astype(jnp.float32)[:, None, None]
    yf = y.astype(jnp.float32)[:, None, None]
    xf = x.astype(jnp.float32)[:, None, None]
    wgt, bins = _ori_hist_math(
        wa, wb, ir + r0f - yf, ic + c0f - xf, ir + r0f, ic + c0f,
        rad[:, None, None], invden[:, None, None],
        hb.astype(jnp.float32)[:, None, None],
        wb_.astype(jnp.float32)[:, None, None], ORI_NBINS,
    )
    cols = [
        jnp.sum(jnp.where(bins == b, wgt, 0.0), axis=(1, 2))
        for b in range(ORI_NBINS)
    ]
    return jnp.stack(cols, axis=-1)


@functools.lru_cache(maxsize=32)
def _make_ori_hist(WR: int):
    @jax.custom_batching.custom_vmap
    def ori_hist(a, b, s, y, x, rad, invden, hb, wb, active):
        S, H, W = a.shape
        K = s.shape[0]
        sc, r0, c0 = _starts(s, y, x, S, H, W, WR)
        ap, bp = _pad_plane(a, WR), _pad_plane(b, WR)
        on_tpu = jax.default_backend() == "tpu"
        amask = active.astype(jnp.float32)
        if not on_tpu and not INTERPRET:
            return _ori_hist_xla(ap, bp, sc, r0, c0, y, x, rad, invden,
                                 hb, wb, WR) * amask[:, None]
        nblk = -(-K // _BK)
        padn = nblk * _BK - K
        if padn:
            sc, r0, c0 = (jnp.pad(v, (0, padn)) for v in (sc, r0, c0))
            y, x = (jnp.pad(v, (0, padn)) for v in (y, x))
            rad, invden = (jnp.pad(v, (0, padn)) for v in (rad, invden))
            hb, wb = (jnp.pad(v, (0, padn)) for v in (hb, wb))
        blk = (jnp.pad(active, (0, padn)).reshape(nblk, _BK)
               .any(axis=1).astype(jnp.int32))
        # per-slab-row metadata [Kp*WR, 8]: cols 0=dy(row), 1=c0-x, 2=rad,
        # 3=invden, 4=plane row (r0+row), 5=c0, 6/7=per-kp octave h/w
        rws = jnp.arange(WR, dtype=jnp.float32)[None, :]        # [1, WR]
        r0f = r0.astype(jnp.float32)[:, None]
        rep = lambda v: jnp.broadcast_to(v.astype(jnp.float32)[:, None],
                                         (v.shape[0], WR))
        meta = jnp.stack([
            r0f + rws - rep(y), rep(c0.astype(jnp.float32) - x),
            rep(rad), rep(invden), r0f + rws, rep(c0),
            rep(hb), rep(wb),
        ], axis=-1).reshape(nblk * _BK * WR, 8)
        with jax.enable_x64(False):
            hist = _ori_hist_pallas(S, ap.shape[1], ap.shape[2], K, WR, H, W,
                                    interpret=not on_tpu)(sc, r0, c0, blk,
                                                          meta, ap, bp)
        return hist[:K] * amask[:, None]

    @ori_hist.def_vmap
    def _ori_hist_vmap(axis_size, in_batched, a, b, s, y, x, rad, invden,
                       hb, wb, active):
        B = axis_size
        args = [a, b, s, y, x, rad, invden, hb, wb, active]
        bcast = lambda v, was: v if was else jnp.broadcast_to(v[None], (B,) + v.shape)
        a, b, s, y, x, rad, invden, hb, wb, active = (
            bcast(v, w) for v, w in zip(args, in_batched)
        )
        _, S, H, W = a.shape
        K = s.shape[1]
        s_flat = (s.astype(jnp.int32)
                  + (jnp.arange(B, dtype=jnp.int32) * S)[:, None]).reshape(-1)
        hist = ori_hist(
            a.reshape(B * S, H, W), b.reshape(B * S, H, W),
            s_flat, y.reshape(-1), x.reshape(-1),
            rad.reshape(-1), invden.reshape(-1),
            hb.reshape(-1), wb.reshape(-1), active.reshape(-1),
        )
        return hist.reshape(B, K, ORI_NBINS), True

    return ori_hist


# ---------------------------------------------------------------------------
# Fused SIFT descriptor histogram: window DMA + rotated trilinear soft
# binning into 4x4 spatial x 8 orientation bins, fused like the orientation
# kernel above (reference: per-keypoint scalar loop at feature/sift.cc:87-152
# with trilinear_interpolate at sift.cc:48-67).  Output is the raw [K, 128]
# histogram; RootSIFT normalization stays outside (sift.cc:37-45).
# ---------------------------------------------------------------------------

DESC_W4 = 4    # DESC_HIST_WIDTH (config.hh:77)
DESC_NB = 8    # DESC_HIST_BIN_NUM (config.hh:78)


def _desc_elem_math(mag, ort, fy, fx, plane_y, plane_x, radius, hw,
                    cos_o, sin_o, dirv, H, W):
    """Per-element weight + bin coordinates (sift.cc:99-144 semantics).
    All inputs broadcast against the slab shape."""
    W4 = DESC_W4
    r2 = fy * fy + fx * fx
    inside = (
        (jnp.abs(fy) <= radius) & (jnp.abs(fx) <= radius)
        & (r2 <= radius * radius)
        & (plane_x >= 1) & (plane_x <= W - 2)
        & (plane_y >= 1) & (plane_y <= H - 2)
    )
    x_rot = (fx * cos_o + fy * sin_o) / hw
    y_rot = (-fx * sin_o + fy * cos_o) / hw
    ybin = y_rot + W4 / 2 - 0.5
    xbin = x_rot + W4 / 2 - 0.5
    inside &= (ybin >= -1) & (ybin <= W4 - 1) & (xbin >= -1) & (xbin <= W4 - 1)
    wgt = jnp.exp(-(x_rot * x_rot + y_rot * y_rot) / (2.0 * W4 * W4)) * mag
    wgt = jnp.where(inside, wgt, 0.0)
    now_ort = ort - dirv
    now_ort = jnp.where(now_ort < 0, now_ort + 2 * jnp.pi, now_ort)
    now_ort = jnp.where(now_ort > 2 * jnp.pi, now_ort - 2 * jnp.pi, now_ort)
    hbin = now_ort * (DESC_NB / (2.0 * jnp.pi))
    return wgt, ybin, xbin, hbin


_BKD = 8  # keypoints per descriptor grid step (VMEM-bounded: the live set
          # is ~6 slab-sized f32 arrays + 8 A/B hats at [_BKD*WR, 256])


@functools.lru_cache(maxsize=32)
def _desc_hist_pallas(S: int, Hp: int, Wp: int, K: int, WR: int,
                      H: int, W: int, interpret: bool = False):
    nblk = -(-K // _BKD)
    BKWR = _BKD * WR
    NB, W4 = DESC_NB, DESC_W4

    def kernel(s_ref, r0_ref, c0_ref, blk_ref, meta_ref, a_ref, b_ref,
               out_ref, maga, orta, cscr, sem):
        i = pl.program_id(0)

        # whole-block skip: keypoint slots are prefix-compacted, so blocks
        # past the valid count carry no work — write zeros and return
        # (on the headline workload ~55% of capacity slots are padding)
        @pl.when(blk_ref[i] == 0)
        def _():
            out_ref[...] = jnp.zeros((_BKD, W4 * W4 * NB), jnp.float32)

        @pl.when(blk_ref[i] != 0)
        def _():
            def dma(k, plane_ref, scr_ref, slot):
                kk = i * jnp.int32(_BKD) + jnp.int32(k)
                r0 = pl.multiple_of(r0_ref[kk], 8)
                c0 = pl.multiple_of(c0_ref[kk], 128)
                return pltpu.make_async_copy(
                    plane_ref.at[s_ref[kk], pl.ds(r0, WR),
                                 pl.ds(c0, SLAB_LANES)],
                    scr_ref.at[pl.ds(k * WR, WR)],
                    sem.at[jnp.int32(k), jnp.int32(slot)],
                )

            for k in range(_BKD):
                dma(k, a_ref, maga, 0).start()
                dma(k, b_ref, orta, 1).start()
            for k in range(_BKD):
                dma(k, a_ref, maga, 0).wait()
                dma(k, b_ref, orta, 1).wait()

            m = meta_ref[...]                     # [BKWR, 16] f32
            dy, dxb = m[:, 0:1], m[:, 1:2]
            radius, hw = m[:, 2:3], m[:, 3:4]
            py, c0f = m[:, 4:5], m[:, 5:6]
            cos_o, sin_o, dirv = m[:, 6:7], m[:, 7:8], m[:, 8:9]
            hb, wb = m[:, 9:10], m[:, 10:11]      # per-keypoint octave dims

            shp = (BKWR, SLAB_LANES)
            ic = jax.lax.broadcasted_iota(jnp.int32, shp, 1).astype(jnp.float32)
            wgt, ybin, xbin, hbin = _desc_elem_math(
                maga[...], orta[...], dy, ic + dxb, py, ic + c0f,
                radius, hw, cos_o, sin_o, dirv, hb, wb,
            )
            hat = lambda d: jnp.maximum(0.0, 1.0 - jnp.abs(d))
            div, rem = jax.lax.div, jax.lax.rem
            f32 = lambda v: jax.lax.convert_element_type(v, jnp.float32)

            # the trilinear product factorizes: hist[(q=by*4+bx), o] =
            # sum_p [wgt*hatY_q*hatX_q](p) * [hatO_o](p).  Precompute the 8
            # orientation hat planes ONCE into scratch, then per spatial
            # cell q build its weight plane once and take 8 cheap
            # product+reduce passes — ~2.5x fewer slab passes than the
            # previous 128x full-math loop.  fori_loops (not unrolled
            # python loops) so Mosaic reuses the slab-sized temporaries.
            def pre_o(o, _):
                d = jnp.abs(hbin - f32(o))
                cscr[o] = hat(jnp.minimum(d, NB - d))
                return 0

            jax.lax.fori_loop(0, NB, pre_o, 0)

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, W4 * W4 * NB), 1)

            def body_q(q, acc):
                # lax.div/rem on non-negative i32 == floor semantics;
                # jnp's // builds sign-fixup consts that trip Mosaic's
                # no-i64 rule
                by = f32(div(q, jnp.int32(W4)))
                bx = f32(rem(q, jnp.int32(W4)))
                U = wgt * hat(ybin - by) * hat(xbin - bx)

                def body_o(o, acc):
                    col = jnp.sum(U * cscr[o], axis=1, keepdims=True)
                    c = q * jnp.int32(NB) + o
                    # place into lane c via mask (dynamic-lane ref stores
                    # are not lowerable); one fused select+add
                    return acc + jnp.where(lane == c, col, 0.0)

                return jax.lax.fori_loop(0, NB, body_o, acc)

            rows = jax.lax.fori_loop(
                0, W4 * W4, body_q,
                jnp.zeros((BKWR, W4 * W4 * NB), jnp.float32),
            )
            kp_of_row = (jax.lax.broadcasted_iota(jnp.int32, (_BKD, BKWR), 1)
                         // WR)
            kp_id = jax.lax.broadcasted_iota(jnp.int32, (_BKD, BKWR), 0)
            seg = (kp_of_row == kp_id).astype(jnp.float32)
            out_ref[...] = jnp.dot(seg, rows,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((BKWR, 16), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((_BKD, W4 * W4 * NB), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BKWR, SLAB_LANES), jnp.float32),
            pltpu.VMEM((BKWR, SLAB_LANES), jnp.float32),
            pltpu.VMEM((DESC_NB, BKWR, SLAB_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((_BKD, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblk * _BKD, W4 * W4 * NB), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )


def _desc_hist_xla(ap, bp, sc, r0, c0, y, x, radius, hw, cos_o, sin_o, dirv,
                   hbb, wbb, WR):
    """Fallback with identical semantics; chunked to bound the [C,P,16]
    soft-binning intermediate (the pre-kernel implementation)."""
    NB, W4 = DESC_NB, DESC_W4
    K = sc.shape[0]
    CH = 128
    nchunk = max(1, -(-K // CH))
    Kp = nchunk * CH
    pad = lambda v: jnp.pad(v, (0, Kp - K)).reshape(nchunk, CH)

    ir = jnp.arange(WR, dtype=jnp.float32)[None, :, None]
    ic = jnp.arange(SLAB_LANES, dtype=jnp.float32)[None, None, :]

    def one(args):
        sc_, r0_, c0_, y_, x_, rad_, hw_, co_, so_, dv_, hb_, wb_ = args
        wa, wb = _win2_xla(ap, bp, sc_, r0_, c0_, WR)
        r0f = r0_.astype(jnp.float32)[:, None, None]
        c0f = c0_.astype(jnp.float32)[:, None, None]
        fy = ir + r0f - y_.astype(jnp.float32)[:, None, None]
        fx = ic + c0f - x_.astype(jnp.float32)[:, None, None]
        wgt, ybin, xbin, hbin = _desc_elem_math(
            wa, wb, fy, fx, ir + r0f, ic + c0f,
            rad_[:, None, None], hw_[:, None, None],
            co_[:, None, None], so_[:, None, None], dv_[:, None, None],
            hb_.astype(jnp.float32)[:, None, None],
            wb_.astype(jnp.float32)[:, None, None],
        )
        P = WR * SLAB_LANES
        flat = lambda a: a.reshape(CH, P)
        hat = lambda d: jnp.maximum(0.0, 1.0 - jnp.abs(d))
        by = jnp.arange(W4, dtype=jnp.float32)
        A = hat(flat(ybin)[:, :, None] - by)
        B = hat(flat(xbin)[:, :, None] - by)
        bo = jnp.arange(NB, dtype=jnp.float32)
        do_ = jnp.abs(flat(hbin)[:, :, None] - bo)
        C_ = hat(jnp.minimum(do_, NB - do_))
        WAB = (flat(wgt)[:, :, None, None] * A[:, :, :, None]
               * B[:, :, None, :]).reshape(CH, P, W4 * W4)
        return jnp.einsum(
            "cpq,cpo->cqo", WAB, C_, precision=jax.lax.Precision.HIGHEST
        ).reshape(CH, W4 * W4 * NB)

    hists = jax.lax.map(one, (
        pad(sc), pad(r0), pad(c0), pad(y), pad(x),
        pad(radius), pad(hw), pad(cos_o), pad(sin_o), pad(dirv),
        pad(hbb), pad(wbb),
    ))
    return hists.reshape(Kp, W4 * W4 * NB)[:K]


@functools.lru_cache(maxsize=32)
def _make_desc_hist(WR: int):
    @jax.custom_batching.custom_vmap
    def desc_hist(a, b, s, y, x, radius, hw, cos_o, sin_o, dirv, hb, wb,
                  active):
        S, H, W = a.shape
        K = s.shape[0]
        sc, r0, c0 = _starts(s, y, x, S, H, W, WR)
        ap, bp = _pad_plane(a, WR), _pad_plane(b, WR)
        on_tpu = jax.default_backend() == "tpu"
        amask = active.astype(jnp.float32)
        if not on_tpu and not INTERPRET:
            return _desc_hist_xla(ap, bp, sc, r0, c0, y, x, radius, hw,
                                  cos_o, sin_o, dirv, hb, wb,
                                  WR) * amask[:, None]
        nblk = -(-K // _BKD)
        padn = nblk * _BKD - K
        if padn:
            sc, r0, c0 = (jnp.pad(v, (0, padn)) for v in (sc, r0, c0))
            y, x = (jnp.pad(v, (0, padn)) for v in (y, x))
            radius, hw = (jnp.pad(v, (0, padn)) for v in (radius, hw))
            cos_o, sin_o = (jnp.pad(v, (0, padn)) for v in (cos_o, sin_o))
            dirv = jnp.pad(dirv, (0, padn))
            hb, wb = (jnp.pad(v, (0, padn)) for v in (hb, wb))
        # per-block any(active): slots are prefix-compacted, so padding
        # blocks skip their DMA + soft-binning entirely in the kernel
        blk = (jnp.pad(active, (0, padn)).reshape(nblk, _BKD)
               .any(axis=1).astype(jnp.int32))
        rws = jnp.arange(WR, dtype=jnp.float32)[None, :]
        r0f = r0.astype(jnp.float32)[:, None]
        rep = lambda v: jnp.broadcast_to(v.astype(jnp.float32)[:, None],
                                         (v.shape[0], WR))
        z = jnp.zeros_like(rep(radius))
        meta = jnp.stack([
            r0f + rws - rep(y), rep(c0.astype(jnp.float32) - x),
            rep(radius), rep(hw), r0f + rws, rep(c0),
            rep(cos_o), rep(sin_o), rep(dirv),
            rep(hb), rep(wb),
            z, z, z, z, z,
        ], axis=-1).reshape(nblk * _BKD * WR, 16)
        with jax.enable_x64(False):
            hist = _desc_hist_pallas(S, ap.shape[1], ap.shape[2], K, WR, H, W,
                                     interpret=not on_tpu)(sc, r0, c0, blk,
                                                           meta, ap, bp)
        return hist[:K] * amask[:, None]

    @desc_hist.def_vmap
    def _desc_hist_vmap(axis_size, in_batched, a, b, s, y, x, radius, hw,
                        cos_o, sin_o, dirv, hb, wb, active):
        B = axis_size
        vb = list(in_batched)
        args = [a, b, s, y, x, radius, hw, cos_o, sin_o, dirv, hb, wb, active]
        bcast = lambda v, was: v if was else jnp.broadcast_to(v[None], (B,) + v.shape)
        a, b, s, y, x, radius, hw, cos_o, sin_o, dirv, hb, wb, active = (
            bcast(v, w) for v, w in zip(args, vb)
        )
        _, S, H, W = a.shape
        K = s.shape[1]
        s_flat = (s.astype(jnp.int32)
                  + (jnp.arange(B, dtype=jnp.int32) * S)[:, None]).reshape(-1)
        hist = desc_hist(
            a.reshape(B * S, H, W), b.reshape(B * S, H, W), s_flat,
            y.reshape(-1), x.reshape(-1), radius.reshape(-1), hw.reshape(-1),
            cos_o.reshape(-1), sin_o.reshape(-1), dirv.reshape(-1),
            hb.reshape(-1), wb.reshape(-1), active.reshape(-1),
        )
        return hist.reshape(B, K, DESC_W4 * DESC_W4 * DESC_NB), True

    return desc_hist


def descriptor_histogram(mag, ort, s, y, x, radius, hw, dirv, WR: int,
                         wh=None, valid=None):
    """Per-keypoint raw SIFT histogram [K, 128] (pre-RootSIFT), fused
    window-DMA + rotated trilinear soft-binning kernel.  radius: [K] rounded
    circular window radius; hw: [K] spatial bin width (hist_w); dirv: [K]
    keypoint direction; wh: optional [K,2] per-keypoint (w, h) bounds for
    stacked-octave planes; valid: optional [K] bool — rows of INVALID slots
    come back zero, and (slots being prefix-compacted) whole blocks of
    padding skip their DMA + binning inside the kernel.  Batch with
    jax.vmap."""
    assert WR % 8 == 0, WR
    hb, wb = _kp_bounds(mag, s, wh)
    if valid is None:
        valid = jnp.ones(s.shape, bool)
    return _make_desc_hist(WR)(
        mag, ort, s, y, x,
        radius.astype(jnp.float32), hw.astype(jnp.float32),
        jnp.cos(dirv).astype(jnp.float32), jnp.sin(dirv).astype(jnp.float32),
        dirv.astype(jnp.float32), hb, wb, valid,
    )


def orientation_histogram(mag: jnp.ndarray, ort: jnp.ndarray, s: jnp.ndarray,
                          y: jnp.ndarray, x: jnp.ndarray, rad: jnp.ndarray,
                          invden: jnp.ndarray, WR: int,
                          wh: jnp.ndarray | None = None,
                          valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-keypoint 36-bin orientation histogram, fused window-DMA +
    histogram kernel.  mag/ort: [S, H, W] planes; s/y/x: [K] keypoint
    location; rad: [K] integral circular-window radius (already rounded);
    invden: [K] = 1/(2 sigma^2) gaussian weight factor.  Returns [K, 36].
    wh: optional [K,2] per-keypoint (w, h) interior bounds — pass when
    several octaves share one stacked plane (defaults to the plane dims).
    valid: optional [K] bool — INVALID slots come back zero and (slots
    being prefix-compacted) whole padding blocks skip their DMA + binning.
    Batch with jax.vmap (folds into one kernel call)."""
    assert WR % 8 == 0, WR
    hb, wb = _kp_bounds(mag, s, wh)
    if valid is None:
        valid = jnp.ones(s.shape, bool)
    return _make_ori_hist(WR)(mag, ort, s, y, x, rad, invden, hb, wb, valid)


def _kp_bounds(plane, s, wh):
    """Per-keypoint (h, w) f32 bound arrays from optional [K.., 2] wh."""
    if wh is None:
        H, W = plane.shape[-2], plane.shape[-1]
        return (jnp.full(s.shape, H, jnp.float32),
                jnp.full(s.shape, W, jnp.float32))
    return wh[..., 1].astype(jnp.float32), wh[..., 0].astype(jnp.float32)
