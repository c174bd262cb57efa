"""SIFT detector facade: working image -> keypoints + RootSIFT descriptors.

Mirrors SIFTDetector::do_detect_feature (feature/feature.cc:31-46): the
caller resizes the input so (w+h)/2 == SIFT_WORKING_SIZE (imgproc.working_size),
then ScaleSpace -> DoG -> extrema -> orientation -> descriptor run per
octave; keypoint real coordinates in [0,1) are converted to half-shifted
original-image coordinates (feature.cc:20-28):  pos = (real - 0.5) * (w, h).

Everything is a single jittable function over fixed shapes; batching over
images of equal shape is jax.vmap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops.compact import compact_indices
from .descriptor import Features, compute_descriptors
from .extrema import detect_extrema
from .orientation import assign_orientation
from .pyramid import build_scale_space


def octave_caps(cfg: Config, octave_index: int) -> tuple[int, int, int]:
    """(cand, keypoint, descriptor) caps for one octave: the base per-octave
    caps halved per octave (>= 128, multiples of 16 for the window kernel)."""
    def scale(base):
        return max(base >> octave_index, 128)
    return (
        scale(cfg.MAX_CAND_PER_OCTAVE),
        scale(cfg.MAX_KP_PER_OCTAVE),
        scale(cfg.MAX_DESC_PER_OCTAVE),
    )


def detect_and_describe(working_img: jnp.ndarray, orig_wh: jnp.ndarray, cfg: Config) -> Features:
    """working_img: [H, W, 3] float32 (already at SIFT working size).
    orig_wh: [2] float (original image width, height) for coordinate output.
    Returns Features with pos in half-shifted original-image coords."""
    octaves = build_scale_space(working_img, cfg)

    real_xs, real_ys, descs, valids = [], [], [], []
    for oi, octave in enumerate(octaves):
        # octave image area halves per octave (SCALE_FACTOR = sqrt(2)), so
        # the fixed-shape caps shrink with it — keeps padded work bounded
        caps = octave_caps(cfg, oi)
        raw = detect_extrema(octave, cfg, cap_cand=caps[0], cap_kp=caps[1])
        oriented = assign_orientation(raw, octave, cfg, cap=caps[2])
        desc = compute_descriptors(oriented, octave, cfg)
        real_xs.append(oriented.real_x)
        real_ys.append(oriented.real_y)
        descs.append(desc)
        valids.append(oriented.valid)

    real_x = jnp.concatenate(real_xs)
    real_y = jnp.concatenate(real_ys)
    desc = jnp.concatenate(descs)
    valid = jnp.concatenate(valids)

    # compact across octaves to the per-image cap
    K = cfg.MAX_KP_PER_IMAGE
    keep, n = compact_indices(valid, K)
    kvalid = jnp.arange(K) < n

    pos = jnp.stack(
        [(real_x[keep] - 0.5) * orig_wh[0], (real_y[keep] - 0.5) * orig_wh[1]],
        axis=-1,
    )
    return Features(
        pos=jnp.where(kvalid[:, None], pos, 0.0),
        desc=jnp.where(kvalid[:, None], desc[keep], 0.0),
        valid=kvalid,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def detect_and_describe_batch(imgs: jnp.ndarray, orig_whs: jnp.ndarray, cfg: Config) -> Features:
    """imgs: [B, H, W, 3] working-size batch; orig_whs: [B, 2]."""
    return jax.vmap(lambda im, wh: detect_and_describe(im, wh, cfg))(imgs, orig_whs)
