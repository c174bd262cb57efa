"""Shared stitcher plumbing: batched feature extraction over an image set.

Reference: StitcherBase (stitch/stitcherbase.{hh,cc}) — OpenMP loop over
images doing load -> SIFT detect -> optional release, erroring on images
with zero features (stitcherbase.cc:9-27).  TPU-native: one vmapped call
over the whole [N,H,W,3] stack (uniform shapes required; the batch IS the
data-parallel axis that shards over a device mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops.imgproc import resize, working_size
from ..sift.descriptor import Features
from ..sift.detector import detect_and_describe_batch


def compute_features(imgs: jnp.ndarray, cfg: Config) -> Features:
    """imgs: [N, H, W, 3] float32 in [0,1] (uniform shape).  Returns batched
    Features with half-shifted original-image coordinates."""
    n, h, w = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    wh_, ww_ = working_size(w, h, cfg.SIFT_WORKING_SIZE)
    work = jax.vmap(lambda im: resize(im, wh_, ww_))(imgs)
    whs = jnp.broadcast_to(jnp.asarray([w, h], jnp.float32), (n, 2))
    feats = detect_and_describe_batch(work, whs, cfg)
    counts = np.asarray(jnp.sum(feats.valid, axis=1))
    for i, c in enumerate(counts):
        if c == 0:  # stitcherbase.cc:20-21
            raise RuntimeError(f"Cannot find feature in image {i}!")
    return feats
