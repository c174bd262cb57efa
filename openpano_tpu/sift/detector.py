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
from .descriptor import Features
from .extrema import detect_extrema
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
    Returns Features with pos in half-shifted original-image coords.

    Octave-merged execution: extrema run per octave at native shapes, then
    raw keypoints from all octaves are compacted into one
    MAX_KP_PER_IMAGE-slot set and the mag/ort planes are stacked (smaller
    octaves zero-padded) so orientation and descriptor each run as ONE
    fused kernel call over real keypoints — per-octave caps waste 2x the
    kernel slots and 4x the launches."""
    from .descriptor import describe_keypoints
    from .orientation import orient_keypoints

    octaves = build_scale_space(working_img, cfg)
    S = cfg.NUM_SCALE
    H0, W0 = octaves[0].mag.shape[-2], octaves[0].mag.shape[-1]

    raws, whs, mags, orts = [], [], [], []
    for oi, octave in enumerate(octaves):
        # octave image area halves per octave (SCALE_FACTOR = sqrt(2)), so
        # the fixed-shape caps shrink with it — keeps padded work bounded
        caps = octave_caps(cfg, oi)
        raw = detect_extrema(octave, cfg, cap_cand=caps[0], cap_kp=caps[1])
        oh, ow = octave.mag.shape[-2], octave.mag.shape[-1]
        raws.append(raw._replace(s=raw.s + oi * S))  # octave folds into scale
        whs.append(jnp.broadcast_to(
            jnp.asarray([ow, oh], jnp.float32), (raw.x.shape[0], 2)))
        mags.append(jnp.pad(octave.mag, ((0, 0), (0, H0 - oh), (0, W0 - ow))))
        orts.append(jnp.pad(octave.ort, ((0, 0), (0, H0 - oh), (0, W0 - ow))))
    mag_all = jnp.concatenate(mags, axis=0)          # [O*S, H0, W0]
    ort_all = jnp.concatenate(orts, axis=0)
    raw_all = jax.tree_util.tree_map(lambda *a: jnp.concatenate(a), *raws)
    wh_all = jnp.concatenate(whs, axis=0)

    # compact raw keypoints from all octaves into the per-image budget
    K = cfg.MAX_KP_PER_IMAGE
    keep, n = compact_indices(raw_all.valid, K)
    rvalid = jnp.arange(K) < n
    raw_c = jax.tree_util.tree_map(lambda a: a[keep], raw_all)
    raw_c = raw_c._replace(valid=rvalid)
    wh_c = wh_all[keep]

    oriented, wh_o = orient_keypoints(raw_c, mag_all, ort_all, cfg, cap=K,
                                      wh=wh_c)
    desc = describe_keypoints(oriented, mag_all, ort_all, cfg, wh=wh_o)

    kvalid = oriented.valid
    pos = jnp.stack(
        [(oriented.real_x - 0.5) * orig_wh[0],
         (oriented.real_y - 0.5) * orig_wh[1]],
        axis=-1,
    )
    return Features(
        pos=jnp.where(kvalid[:, None], pos, 0.0),
        desc=jnp.where(kvalid[:, None], desc, 0.0),
        valid=kvalid,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def detect_and_describe_batch(imgs: jnp.ndarray, orig_whs: jnp.ndarray, cfg: Config) -> Features:
    """imgs: [B, H, W, 3] working-size batch; orig_whs: [B, 2]."""
    return jax.vmap(lambda im, wh: detect_and_describe(im, wh, cfg))(imgs, orig_whs)
