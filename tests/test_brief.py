"""BRIEF descriptor tests."""

import numpy as np
import jax.numpy as jnp

from openpano_tpu.config import Config
from openpano_tpu.sift.brief import (
    compute_brief, gen_brief_pattern, hamming_dist_matrix, match_brief,
)

CFG = Config(MAX_MATCHES_PER_PAIR=64)


def test_pattern_properties():
    p = gen_brief_pattern(seed=1)
    assert p.offsets.shape == (256, 4)
    half = p.s // 2
    assert (np.abs(p.offsets) <= half).all()
    p2 = gen_brief_pattern(seed=1)
    np.testing.assert_array_equal(p.offsets, p2.offsets)  # deterministic


def test_descriptor_invariance_and_matching(rng):
    grey = rng.uniform(size=(120, 160)).astype(np.float32)
    pat = gen_brief_pattern(seed=0)
    K = 32
    pts = np.stack([
        rng.uniform(10, 150, size=K), rng.uniform(10, 110, size=K)
    ], -1).astype(np.float32)
    valid = np.ones(K, bool)
    d1, v1 = compute_brief(jnp.asarray(grey), jnp.asarray(pts), jnp.asarray(valid),
                           jnp.asarray(pat.offsets), pat.s)
    assert d1.dtype == jnp.uint32
    # identical image: self-distance zero, clean self-matching
    d2, v2 = compute_brief(jnp.asarray(grey), jnp.asarray(pts), jnp.asarray(valid),
                           jnp.asarray(pat.offsets), pat.s)
    dm = np.asarray(hamming_dist_matrix(d1, d2))
    assert (np.diag(dm) == 0).all()
    res = match_brief(d1, v1, d2, v2, CFG)
    got = np.asarray(res.idx)[np.asarray(res.valid)]
    assert (got[:, 0] == got[:, 1]).all()
    assert int(res.count) >= K - 5  # a few border/ambiguous points may drop


def test_border_points_dropped(rng):
    grey = rng.uniform(size=(40, 40)).astype(np.float32)
    pat = gen_brief_pattern(seed=0)
    pts = np.array([[1.0, 1.0], [20.0, 20.0], [39.0, 39.0]], np.float32)
    _, v = compute_brief(jnp.asarray(grey), jnp.asarray(pts),
                         jnp.ones(3, bool), jnp.asarray(pat.offsets), pat.s)
    assert list(np.asarray(v)) == [False, True, False]
