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
    A single dispatch matters: eager per-op execution pays a host<->device
    round trip per op, which dominates on a remote-attached TPU."""
    work = jax.vmap(lambda im: resize(im, wh_, ww_))(batch)
    return detect_and_describe_batch(work, whs, cfg)


def compute_features(imgs: jnp.ndarray, cfg: Config) -> Features:
    """imgs: [N, H, W, 3] float32 in [0,1] (uniform shape).  Returns batched
    Features with half-shifted original-image coordinates.  Large image sets
    stream through the device in fixed-size batches (the TPU analog of the
    reference's LAZY_READ memory strategy, stitcherbase.cc:16-19)."""
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
    feats = _feature_chunk(imgs, whs, cfg, wh_, ww_)
    feats = jax.tree_util.tree_map(lambda x: x[:n], feats)
    counts = np.asarray(jnp.sum(feats.valid, axis=1))
    for i, c in enumerate(counts):
        if c == 0:  # stitcherbase.cc:20-21
            raise RuntimeError(f"Cannot find feature in image {i}!")
    return imgs[:n], feats


@jax.jit
def _u8_to_f32(x):
    return x.astype(jnp.float32) / 255.0


def upload_and_compute_features(host_u8: np.ndarray, cfg: Config):
    """Pipelined host->device upload + feature extraction.

    host_u8: [N, H, W, 3] uint8 on host.  Uploads delta-coded batches and
    dispatches each batch's SIFT while the next batch rides the wire — the
    transfer of batch k+1 overlaps the feature compute of batch k (the TPU
    analog of the reference's IO/compute overlap via per-thread lazy image
    loads under OpenMP, stitcherbase.cc:14-19 + imageref.hh:22).

    Returns (imgs_f32_device [N,H,W,3], Features).
    """
    from ..io.transfer import device_put_u8_delta

    n, h, w = host_u8.shape[0], host_u8.shape[1], host_u8.shape[2]
    wh_, ww_ = working_size(w, h, cfg.SIFT_WORKING_SIZE)

    B = _FEATURE_BATCH
    whs = jnp.broadcast_to(jnp.asarray([w, h], jnp.float32), (B, 2))
    parts = []
    feat_parts = []
    nb = -(-n // B)
    # issue upload k+1 before dispatching features on batch k so the wire
    # transfer and the SIFT compute overlap
    parts.append(_u8_to_f32(device_put_u8_delta(host_u8[:B])))
    for k in range(nb):
        if k + 1 < nb:
            lo = (k + 1) * B
            parts.append(_u8_to_f32(device_put_u8_delta(host_u8[lo : lo + B])))
        batch = parts[k]
        if batch.shape[0] < B:  # pad to keep one compiled executable
            pad = B - batch.shape[0]
            rep = jnp.broadcast_to(batch[:1], (pad,) + batch.shape[1:])
            batch = jnp.concatenate([batch, rep], axis=0)
        feat_parts.append(_feature_chunk(batch, whs[:B], cfg, wh_, ww_))

    imgs = parts[0] if nb == 1 else jnp.concatenate(parts, axis=0)
    feats = (
        feat_parts[0]
        if nb == 1
        else jax.tree_util.tree_map(
            lambda *c: jnp.concatenate(c, axis=0), *feat_parts
        )
    )
    imgs = imgs[:n]
    feats = jax.tree_util.tree_map(lambda x: x[:n], feats)
    counts = np.asarray(jnp.sum(feats.valid, axis=1))
    for i, c in enumerate(counts):
        if c == 0:  # stitcherbase.cc:20-21
            raise RuntimeError(f"Cannot find feature in image {i}!")
    return imgs, feats
