"""Shared stitcher plumbing: batched feature extraction over an image set.

Reference: StitcherBase (stitch/stitcherbase.{hh,cc}) — OpenMP loop over
images doing load -> SIFT detect -> optional release, erroring on images
with zero features (stitcherbase.cc:9-27).  TPU-native: one vmapped call
over the whole [N,H,W,3] stack (uniform shapes required; the batch IS the
data-parallel axis that shards over a device mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops.imgproc import resize, working_size
from ..sift.descriptor import Features
from ..sift.detector import detect_and_describe_batch


# images per device batch: the live set (scale space + window slabs) for
# one batch must fit HBM (8 working-size images use ~5 GB of a v5e's
# 16 GB); smaller batches overlap the delta-coded uploads with SIFT
# compute at finer grain — 1 won the r2 interleaved sweeps on the headline
# workload (1.86 s vs 2.19 s at 2, 2.14+ s at 4/8)
import os as _os

_FEATURE_BATCH = int(_os.environ.get("OPENPANO_FEATURE_BATCH", "1"))


@functools.partial(jax.jit, static_argnames=("cfg", "wh_", "ww_"))
def _feature_chunk(batch, whs, cfg: Config, wh_: int, ww_: int) -> Features:
    """One fused device call per chunk: resize-to-working-size + full SIFT.
    ``batch`` is [B, H, W, 3] RGB or [B, H, W] grey (the SIFT pyramid greys
    before its octave resizes either way).  A single dispatch matters:
    eager per-op execution pays a host<->device round trip per op, which
    dominates on a remote-attached TPU."""
    work = jax.vmap(lambda im: resize(im, wh_, ww_))(batch)
    return detect_and_describe_batch(work, whs, cfg)


def compute_features(imgs: jnp.ndarray, cfg: Config) -> Features:
    """imgs: [N, H, W, 3] RGB or [N, H, W] grey, float32 in [0,1] (uniform
    shape).  Returns batched Features with half-shifted original-image
    coordinates.  Large image sets stream through the device in fixed-size
    batches (the TPU analog of the reference's LAZY_READ memory strategy,
    stitcherbase.cc:16-19)."""
    n, h, w = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    wh_, ww_ = working_size(w, h, cfg.SIFT_WORKING_SIZE)
    whs = jnp.broadcast_to(jnp.asarray([w, h], jnp.float32), (n, 2))

    B = _FEATURE_BATCH
    if n <= B:
        feats = _feature_chunk(imgs, whs, cfg, wh_, ww_)
    else:
        chunks = []
        for lo in range(0, n, B):
            batch = imgs[lo : lo + B]
            if batch.shape[0] < B:  # pad to keep one compiled executable
                pad = B - batch.shape[0]
                rep = jnp.broadcast_to(batch[:1], (pad,) + batch.shape[1:])
                batch = jnp.concatenate([batch, rep], axis=0)
            chunks.append(_feature_chunk(batch, whs[:B], cfg, wh_, ww_))
        feats = jax.tree_util.tree_map(
            lambda *c: jnp.concatenate(c, axis=0)[:n], *chunks
        )
    counts = np.asarray(jnp.sum(feats.valid, axis=1))
    for i, c in enumerate(counts):
        if c == 0:  # stitcherbase.cc:20-21
            raise RuntimeError(f"Cannot find feature in image {i}!")
    return feats


@functools.partial(jax.jit)
def _u8_to_f32_sharded(x):
    """u8 -> f32 on device; output sharding follows the input's."""
    return x.astype(jnp.float32) / 255.0


def compute_features_sharded(imgs, cfg: Config, mesh):
    """Data-parallel feature extraction over a device mesh: the image batch
    axis shards over the mesh's first axis (the DP analog of the
    reference's OpenMP loop over images, stitcherbase.cc:14).  One jit —
    GSPMD partitions the vmapped SIFT with no collectives (features are
    embarrassingly parallel over images).

    ``imgs`` may be a HOST numpy array (u8 or f32): then the upload itself
    is batch-sharded — each device receives only its N/G image slice and
    the full stack never sits in any single device's memory (the
    LAZY_READ-scale entry point; u8 stays u8 on the wire).  Returns
    (imgs_f32_sharded, Features)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n, h, w = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    wh_, ww_ = working_size(w, h, cfg.SIFT_WORKING_SIZE)
    nd = int(mesh.devices.size)
    axis = mesh.axis_names[0]
    batch_sh = NamedSharding(mesh, P(axis))
    r = (-n) % nd
    if isinstance(imgs, np.ndarray):
        if r:  # pad the batch to a multiple of the mesh size (host-side)
            imgs = np.concatenate(
                [imgs, np.broadcast_to(imgs[:1], (r,) + imgs.shape[1:])], 0)
        imgs = jax.device_put(imgs, batch_sh)  # per-device shard uploads
        if imgs.dtype == jnp.uint8:
            imgs = _u8_to_f32_sharded(imgs)
    else:
        if r:
            rep = jnp.broadcast_to(imgs[:1], (r,) + imgs.shape[1:])
            imgs = jnp.concatenate([imgs, rep], axis=0)
        imgs = jax.device_put(imgs.astype(jnp.float32), batch_sh)
    whs = jax.device_put(
        jnp.broadcast_to(jnp.asarray([w, h], jnp.float32),
                         (imgs.shape[0], 2)), batch_sh)
    # chunk the sharded dispatch like the single-device path: one jit over
    # the WHOLE batch holds every image's scale-space/window intermediates
    # live at once (~2.7 GB/image on the CPU backend — n=100 OOM-killed a
    # 125 GB host in the r4 giga run).  Chunks of _FEATURE_BATCH images
    # per device each shard over the full mesh; every chunk is RESHARDED
    # to the same even batch sharding first (slicing a block-sharded
    # stack hands chunk k a different lopsided layout -> per-chunk
    # recompiles with degenerate partitions), and chunks run serialized
    # (async dispatch lets several live sets coexist).
    chunk = _FEATURE_BATCH * nd
    total = imgs.shape[0]
    if total <= chunk:
        feats = _feature_chunk(imgs, whs, cfg, wh_, ww_)
    else:
        parts = []
        for lo in range(0, total, chunk):
            batch = imgs[lo : lo + chunk]
            if batch.shape[0] < chunk:  # pad; mesh multiple guaranteed
                rep = jnp.broadcast_to(
                    batch[:1], (chunk - batch.shape[0],) + batch.shape[1:])
                batch = jnp.concatenate([batch, rep], axis=0)
            batch = jax.device_put(batch, batch_sh)
            parts.append(_feature_chunk(batch, whs[:chunk], cfg, wh_, ww_))
            jax.block_until_ready(parts[-1].valid)
        feats = jax.tree_util.tree_map(
            lambda *c: jnp.concatenate(c, axis=0)[:total], *parts)
    feats = jax.tree_util.tree_map(lambda x: x[:n], feats)
    counts = np.asarray(jnp.sum(feats.valid, axis=1))
    for i, c in enumerate(counts):
        if c == 0:  # stitcherbase.cc:20-21
            raise RuntimeError(f"Cannot find feature in image {i}!")
    return imgs[:n], feats


@jax.jit
def _u8_to_f32(x):
    return x.astype(jnp.float32) / 255.0


@functools.partial(jax.jit, static_argnames=("n", "h", "w"))
def _grey_rows_to_f32(rows_u8, n: int, h: int, w: int):
    """[N*H, W] u8 grey rows -> [N, H, W] f32 in [0, 1]."""
    return rows_u8.astype(jnp.float32).reshape(n, h, w) / 255.0


@functools.partial(jax.jit, static_argnames=("n", "h", "w"))
def _grey_sum_to_f32(grey_u8, res_u8, n: int, h: int, w: int):
    """Exact channel-sum grey: [N*H, W] u8 grey + {0,1,2} residual ->
    [N, H, W] f32 mean-of-channels.  r+g+b == 3*grey + res - 1 (integer,
    exact), so the SIFT input carries no wire quantization."""
    s = 3 * grey_u8.astype(jnp.int32) + res_u8.astype(jnp.int32) - 1
    return (s.astype(jnp.float32) / (3.0 * 255.0)).reshape(n, h, w)


@functools.partial(jax.jit, static_argnames=("n", "h", "w"))
def _planar_rows_to_f32(rows_u8, n: int, h: int, w: int):
    """[3*N*H, W] u8 channel-planar rows -> [N, H, W, 3] f32 in [0, 1]."""
    planar = rows_u8.reshape(3, n, h, w)
    return planar.transpose(1, 2, 3, 0).astype(jnp.float32) / 255.0


@functools.partial(jax.jit, static_argnames=("n", "h", "w"))
def _chroma_rows_to_f32(grey_u8, res_u8, chroma_rows, n: int, h: int, w: int):
    """Rebuild exact RGB from the grey+residual planes (already on device
    from the feature stage) plus two mod-256 chroma planes:
        r = (grey + cr) mod 256,  b = (grey + cb) mod 256,
        g = (r+g+b) - r - b      where r+g+b = 3*grey + res - 1.
    chroma_rows: [2*N*H, W] u8 (cr rows then cb rows).
    Exact integers throughout -> bit-identical to the device's raw
    u8 -> f32 conversion (_u8_to_f32) of an uncompressed upload."""
    g32 = grey_u8.astype(jnp.int32)
    s = 3 * g32 + res_u8.astype(jnp.int32) - 1
    cr = chroma_rows[: n * h].astype(jnp.int32)
    cb = chroma_rows[n * h :].astype(jnp.int32)
    r = (g32 + cr) & 0xFF
    b = (g32 + cb) & 0xFF
    g = s - r - b
    rgb = jnp.stack([r, g, b], axis=0).astype(jnp.float32) / 255.0
    return rgb.reshape(3, n, h, w).transpose(1, 2, 3, 0)


class DeferredImages:
    """f32 image stack whose wire transfer may still be in flight.

    The full-res RGB stack is needed only by the blender, ~2 s of compute
    after features — so its upload streams in a background thread (4 MB
    chunks, interleaving with the match/BA dispatch traffic) and ``get()``
    joins + decodes right before the blend.  The TPU analog of the
    reference's LAZY_READ deferred image loads (imageref.hh:22,
    stitcherbase.cc:14-19)."""

    def __init__(self, bg, n: int, h: int, w: int,
                 dev_grey=None, dev_res=None):
        self._bg = bg
        self.shape = (n, h, w, 3)
        self.dtype = jnp.float32
        self._grey = dev_grey
        self._res = dev_res
        self._imgs = None
        if bg is not None and hasattr(bg, "abandon"):
            # if this wrapper is dropped before get() (stitch raised
            # between stages, or a caller discarded it), wake the gated
            # upload thread so it exits instead of parking forever with
            # its encoded chroma stream pinned
            import weakref

            weakref.finalize(self, bg.abandon)

    def start_background(self):
        """Release the chroma stream onto the wire (called by the
        stitcher once the latency-sensitive feature fetch is done; the
        host-side encode has been running since upload time)."""
        if self._bg is not None:
            self._bg.release_wire()

    def get(self):
        if self._imgs is None:
            rows = self._bg.result()
            n, h, w, _ = self.shape
            if self._grey is not None:
                # chroma stream: rebuild RGB from the resident grey+res
                self._imgs = _chroma_rows_to_f32(
                    self._grey, self._res, rows, n=n, h=h, w=w
                )
            else:
                self._imgs = _planar_rows_to_f32(rows, n=n, h=h, w=w)
            self._bg = None
            self._grey = self._res = None
        return self._imgs


class HostImages:
    """Host-resident u8 stack marker: the beyond-one-HBM single-device
    path — NO full-stack device upload ever happens; the blender streams
    band slices from this array (render.blend_linear_host_stream)."""

    def __init__(self, host_u8: np.ndarray):
        self.host = host_u8
        self.shape = tuple(host_u8.shape)
        self.dtype = jnp.float32

    def start_background(self):  # uniform call site with DeferredImages
        pass


def upload_and_compute_features(host_u8: np.ndarray, cfg: Config,
                                rgb_stream: bool = True):
    """Wire-codec'd upload + feature extraction.

    host_u8: [N, H, W, 3] uint8 on host.  The tunneled TPU transport is
    byte-bound at ~55 MB/s (r4 measurements: dtype, chunking, threading
    all change nothing), so the raw 128 MB headline stack costs 2.1 s —
    more than the SIFT compute it feeds.  Two levers cut that:

      1. SIFT only needs GREY pixels.  A threaded C pass (wire_grey_res_u8)
         makes the rounded-mean grey plane + a 2-bit channel-sum residual
         on host (exact integer reconstruction — u8-quantized grey alone
         shifted ~1% of keypoints and collapsed the camera estimate); the
         4-bit nibble-delta wire codec packs the grey (~23 MB) and the
         residual rides at 0.25 B/px (~11 MB), ~0.62 s total, and the
         pyramid runs grey-first (pyramid.build_scale_space).
      2. The full-res RGB stack is needed only by the blender, so its
         (codec'd) upload streams in a background thread while matching
         and bundle adjustment run — DeferredImages.get() joins before
         the blend.

    ``rgb_stream=False`` skips the chroma stream entirely and returns a
    HostImages marker instead — for image sets whose paired f32 stack
    exceeds one HBM, where the blender must stream band slices from host
    RAM (render.blend_linear_host_stream) rather than join a full-stack
    device array.

    Returns (DeferredImages | HostImages, Features).
    """
    from ..io import wirecodec
    from .. import native

    n, h, w = host_u8.shape[0], host_u8.shape[1], host_u8.shape[2]
    grey8, res = native.wire_grey_res_u8(host_u8)  # [N, H, W] u8 each

    # chroma stream (r-grey, b-grey mod 256: smoother than raw channels,
    # and the third channel comes free from the exact sum) starts after
    # the grey puts are enqueued (the wire is FIFO); host-side prep +
    # encode run in the thread
    g8_rows = grey8.reshape(n * h, w)

    def _chroma():
        cr = (host_u8[..., 0].reshape(n * h, w).astype(np.int16)
              - g8_rows) & 0xFF
        cb = (host_u8[..., 2].reshape(n * h, w).astype(np.int16)
              - g8_rows) & 0xFF
        return np.concatenate([cr, cb], axis=0).astype(np.uint8)

    if rgb_stream:
        # the encode thread starts now (host cores are idle during the
        # device-bound SIFT window) but its wire chunks hold until the
        # stitcher releases them after the feature fetch
        # 2-bit codec: chroma deltas are tiny (98%+ within [-1,1]) so
        # the quarter-row variant halves the stream again (~43 -> ~25 MB
        # on the headline)
        bg = wirecodec.BackgroundUpload(_chroma, gate_wire=True, bits=2)

    # pipeline the grey wire with the SIFT compute in ~GREY_CHUNK-image
    # chunks: the async put of chunk k+1 rides the wire while the device
    # runs chunk k's SIFT (5 chunks on the headline amortize dispatch
    # overhead that 38 single-image puts paid in r2/r3, and overlap most
    # of the ~0.6 s codec transfer under the 0.75 s of SIFT)
    CH = max(int(_os.environ.get("OPENPANO_GREY_CHUNK", "8")), 1)
    wh_, ww_ = working_size(w, h, cfg.SIFT_WORKING_SIZE)
    whs1 = jnp.asarray([[w, h]], jnp.float32)
    grey_parts, feat_parts = [], []
    for lo in range(0, n, CH):
        hi = min(lo + CH, n)
        dg = wirecodec.upload_u8_rows(grey8[lo:hi].reshape(-1, w))
        dr = wirecodec.upload_2bit_rows(res[lo:hi].reshape(-1, w))
        grey_parts.append((dg, dr))
        gchunk = _grey_sum_to_f32(dg, dr, n=hi - lo, h=h, w=w)
        for i in range(hi - lo):
            feat_parts.append(
                _feature_chunk(gchunk[i : i + 1], whs1, cfg, wh_, ww_))
    feats = jax.tree_util.tree_map(
        lambda *c: jnp.concatenate(c, axis=0), *feat_parts)
    counts = np.asarray(jnp.sum(feats.valid, axis=1))
    for i, c in enumerate(counts):
        if c == 0:  # stitcherbase.cc:20-21
            raise RuntimeError(f"Cannot find feature in image {i}!")
    if not rgb_stream:
        return HostImages(host_u8), feats
    dev_grey = jnp.concatenate([g for g, _ in grey_parts], axis=0)
    dev_res = jnp.concatenate([r for _, r in grey_parts], axis=0)
    return DeferredImages(bg, n, h, w, dev_grey, dev_res), feats
