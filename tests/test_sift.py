import numpy as np
import jax
import jax.numpy as jnp

from openpano_tpu.config import Config
from openpano_tpu.ops import resize
from openpano_tpu.sift import (
    build_scale_space,
    detect_extrema,
    assign_orientation,
    compute_descriptors,
    detect_and_describe,
)

import ref_sift

CFG = Config(
    NUM_OCTAVE=2,
    MAX_CAND_PER_OCTAVE=512,
    MAX_KP_PER_OCTAVE=256,
    MAX_DESC_PER_OCTAVE=256,
    MAX_KP_PER_IMAGE=512,
)


def smooth_image(rng, h, w):
    """Multi-scale noise => plenty of blob-like features."""
    img = np.zeros((h, w, 3), np.float32)
    for s in (4, 8, 16, 32):
        small = rng.random((max(2, h // s), max(2, w // s), 3)).astype(np.float32)
        img += ref_sift.resize_bilinear(small, h, w) / 4.0
    lo, hi = img.min(), img.max()
    return (img - lo) / (hi - lo)


def test_dog_matches_reference(rng):
    img = smooth_image(rng, 48, 64)
    octs = build_scale_space(jnp.asarray(img), CFG)
    grey = img.mean(-1)
    lvl1 = ref_sift.blur(grey, CFG.GAUSS_SIGMA)
    lvl2 = ref_sift.blur(grey, CFG.GAUSS_SIGMA * CFG.SCALE_FACTOR)
    np.testing.assert_allclose(np.asarray(octs[0].gauss[1]), lvl1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(octs[0].dog[1]), np.abs(lvl1 - lvl2), atol=1e-5)
    # octave 1 resized with ceil dims
    assert octs[1].gauss.shape[1] == int(np.ceil(48 / CFG.SCALE_FACTOR))
    # mag/ort
    mag, ort = ref_sift.mag_ort(lvl1)
    np.testing.assert_allclose(np.asarray(octs[0].mag[1]), mag, atol=1e-5)
    np.testing.assert_allclose(np.asarray(octs[0].ort[1]), ort, atol=1e-4)


def test_extrema_candidates_match_reference(rng):
    img = smooth_image(rng, 48, 64)
    octs = build_scale_space(jnp.asarray(img), CFG)
    dog = np.asarray(octs[0].dog)
    ref_cands = ref_sift.candidate_extrema(
        dog, CFG.PRE_COLOR_THRES, CFG.JUDGE_EXTREMA_DIFF_THRES, CFG.NUM_SCALE
    )
    from openpano_tpu.sift.extrema import _candidate_mask

    mask = np.asarray(_candidate_mask(octs[0].dog, CFG))
    got = [tuple(i) for i in np.argwhere(mask)]
    assert set(got) == set(ref_cands)


def test_refined_keypoints_sane(rng):
    img = smooth_image(rng, 96, 128)
    octs = build_scale_space(jnp.asarray(img), CFG)
    raw = detect_extrema(octs[0], CFG)
    n = int(np.sum(np.asarray(raw.valid)))
    assert n > 0
    v = np.asarray(raw.valid)
    rx = np.asarray(raw.real_x)[v]
    ry = np.asarray(raw.real_y)[v]
    assert ((rx > 0) & (rx < 1)).all() and ((ry > 0) & (ry < 1)).all()
    s = np.asarray(raw.s)[v]
    assert ((s >= 1) & (s <= CFG.NUM_SCALE - 3)).all()
    sf = np.asarray(raw.scale_factor)[v]
    assert (sf > 1.0).all() and (sf < 2.5).all()


def test_orientation_and_descriptor_sane(rng):
    img = smooth_image(rng, 96, 128)
    octs = build_scale_space(jnp.asarray(img), CFG)
    raw = detect_extrema(octs[0], CFG)
    ori = assign_orientation(raw, octs[0], CFG)
    n_ori = int(np.sum(np.asarray(ori.valid)))
    assert n_ori >= int(np.sum(np.asarray(raw.valid)))  # >=1 dir per kp typically
    d = np.asarray(ori.dir)[np.asarray(ori.valid)]
    assert ((d >= 0) & (d < 2 * np.pi + 1e-5)).all()

    desc = np.asarray(compute_descriptors(ori, octs[0], CFG))
    v = np.asarray(ori.valid)
    dd = desc[v]
    assert np.isfinite(dd).all()
    # RootSIFT: sum of squares == DESC_INT_FACTOR^2 (L1-normalized then sqrt)
    norms = (dd ** 2).sum(axis=1)
    np.testing.assert_allclose(norms, CFG.DESC_INT_FACTOR ** 2, rtol=1e-3)


def test_detector_facade_jits(rng):
    img = smooth_image(rng, 96, 128)
    f = jax.jit(detect_and_describe, static_argnames=("cfg",))
    feats = f(jnp.asarray(img), jnp.asarray([1280.0, 960.0]), CFG)
    n = int(np.sum(np.asarray(feats.valid)))
    assert n > 0
    v = np.asarray(feats.valid)
    pos = np.asarray(feats.pos)[v]
    # half-shifted original coords
    assert (np.abs(pos[:, 0]) < 640).all() and (np.abs(pos[:, 1]) < 480).all()
