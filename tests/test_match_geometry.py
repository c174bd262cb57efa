"""Unit tests: matcher 2-NN semantics, DLT, homography predicates, RANSAC."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openpano_tpu.config import Config
from openpano_tpu.match.matcher import MatchResult, match_pair, pair_indices
from openpano_tpu.geometry.dlt import normalized_transform, perspective_dlt, affine_dlt
from openpano_tpu.geometry.homography import (
    health, homo_inverse, trans2d, overlap_area_fraction,
)
from openpano_tpu.geometry.ransac import estimate_transform

CFG = Config(MAX_MATCHES_PER_PAIR=256, RANSAC_ITERATIONS=300)


def pad_desc(d, K):
    out = np.zeros((K, d.shape[1]), np.float32)
    out[: len(d)] = d
    v = np.zeros(K, bool)
    v[: len(d)] = True
    return jnp.asarray(out), jnp.asarray(v)


class TestMatcher:
    def test_exact_correspondence(self, rng):
        base = rng.normal(size=(40, 128)).astype(np.float32) * 10
        perm = rng.permutation(40)
        d2 = base[perm] + rng.normal(size=(40, 128)).astype(np.float32) * 0.01
        da, va = pad_desc(base, 64)
        db, vb = pad_desc(d2, 64)
        res = match_pair(da, va, db, vb, CFG)
        assert int(res.count) == 40
        got = {(int(a), int(b)) for a, b in np.asarray(res.idx)[np.asarray(res.valid)]}
        want = {(int(perm[k]), int(k)) for k in range(40)}
        assert got == want

    def test_ratio_rejects_ambiguous(self, rng):
        # two near-identical targets for query 0 -> ratio test must reject it
        q = rng.normal(size=(4, 128)).astype(np.float32) * 10
        t = np.concatenate([q[0:1] + 0.001, q[0:1] + 0.0011, q[1:] + 0.001]).astype(
            np.float32
        )
        da, va = pad_desc(q, 16)
        db, vb = pad_desc(t, 16)
        res = match_pair(da, va, db, vb, CFG)
        matched_q = {int(a) for a, _ in np.asarray(res.idx)[np.asarray(res.valid)]}
        assert 0 not in matched_q
        assert {1, 2, 3} <= matched_q

    def test_padding_invisible(self, rng):
        d1 = rng.normal(size=(10, 128)).astype(np.float32) * 5
        d2 = d1 + 0.01
        for K in (16, 32):
            da, va = pad_desc(d1, K)
            db, vb = pad_desc(d2, K)
            res = match_pair(da, va, db, vb, CFG)
            assert int(res.count) == 10

    def test_pair_indices(self):
        ii, jj = pair_indices(4)
        assert list(zip(ii, jj)) == [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


class TestDLT:
    def test_perspective_exact(self, rng):
        H = np.array([[1.1, 0.05, 3.0], [-0.04, 0.95, -2.0], [1e-4, -8e-5, 1.0]])
        p2 = rng.uniform(-100, 100, size=(20, 2))
        p1, _ = trans2d(jnp.asarray(H), jnp.asarray(p2))
        w = jnp.ones(20)
        Hfit = np.array(normalized_transform(jnp.asarray(p1), jnp.asarray(p2), w, False))
        Hfit /= Hfit[2, 2]
        np.testing.assert_allclose(Hfit, H, atol=1e-3)

    def test_affine_exact(self, rng):
        A = np.array([[1.2, 0.1, 5.0], [-0.1, 0.9, 7.0], [0, 0, 1.0]])
        p2 = rng.uniform(-50, 50, size=(12, 2))
        p1 = p2 @ A[:2, :2].T + A[:2, 2]
        Afit = np.asarray(
            normalized_transform(jnp.asarray(p1), jnp.asarray(p2), jnp.ones(12), True)
        )
        np.testing.assert_allclose(Afit, A, atol=1e-4)

    def test_masked_rows_ignored(self, rng):
        A = np.array([[1.0, 0.0, 2.0], [0.0, 1.0, -3.0], [0, 0, 1.0]])
        p2 = rng.uniform(-50, 50, size=(16, 2))
        p1 = p2 + np.array([2.0, -3.0])
        p1[10:] = rng.uniform(-50, 50, size=(6, 2))  # garbage in masked rows
        w = jnp.asarray(np.r_[np.ones(10), np.zeros(6)])
        Afit = np.asarray(affine_dlt(jnp.asarray(p1), jnp.asarray(p2), w))
        np.testing.assert_allclose(Afit, A, atol=1e-5)


class TestHomographyPredicates:
    def test_health(self):
        good = jnp.eye(3)
        assert bool(health(good))
        flip = jnp.diag(jnp.asarray([-1.0, 1.0, 1.0]))
        assert not bool(health(flip))
        persp = good.at[2, 0].set(0.01)
        assert not bool(health(persp))

    def test_inverse_flag(self):
        H, ok = homo_inverse(jnp.eye(3))
        assert bool(ok)
        _, ok = homo_inverse(jnp.zeros((3, 3)))
        assert not bool(ok)

    def test_overlap_area_identity(self):
        frac = overlap_area_fraction(
            jnp.eye(3)[None], jnp.asarray([[100.0, 80.0]]), jnp.asarray([[100.0, 80.0]]), 64
        )
        assert float(frac[0]) == pytest.approx(1.0)

    def test_overlap_area_half_shift(self):
        # image2 shifted by half its width -> ~50% overlap
        H12 = jnp.eye(3).at[0, 2].set(50.0)[None]
        frac = overlap_area_fraction(
            H12, jnp.asarray([[100.0, 80.0]]), jnp.asarray([[100.0, 80.0]]), 64
        )
        assert float(frac[0]) == pytest.approx(0.5, abs=0.02)


def _make_ransac_case(rng, n_in=80, n_out=40, K=256):
    H = np.array([[1.05, 0.03, 12.0], [-0.02, 0.98, -6.0], [5e-5, -4e-5, 1.0]])
    wh = np.array([800.0, 600.0], np.float32)
    p2 = rng.uniform(-350, 350, size=(n_in, 2)) * np.array([1.0, 600 / 800])
    p1, _ = trans2d(jnp.asarray(H), jnp.asarray(p2))
    p1 = np.asarray(p1) + rng.normal(size=(n_in, 2)) * 0.3
    o1 = rng.uniform(-380, 380, size=(n_out, 2)) * np.array([1.0, 600 / 800])
    o2 = rng.uniform(-380, 380, size=(n_out, 2)) * np.array([1.0, 600 / 800])
    pos1 = np.concatenate([p1, o1]).astype(np.float32)
    pos2 = np.concatenate([p2, o2]).astype(np.float32)
    n = n_in + n_out
    pad = lambda a: np.concatenate([a, np.zeros((K - n, 2), np.float32)])
    valid = np.arange(K) < n
    idx = np.zeros((K, 2), np.int32)
    idx[:n] = np.stack([np.arange(n), np.arange(n)], -1)
    match = MatchResult(
        idx=jnp.asarray(idx), valid=jnp.asarray(valid), count=jnp.asarray(n)
    )
    return H, wh, match, jnp.asarray(pad(pos1)), jnp.asarray(pad(pos2)), jnp.asarray(valid)


class TestRansac:
    def test_recovers_homography(self, rng):
        H, wh, match, pos1, pos2, valid = _make_ransac_case(rng)
        info = estimate_transform(
            match, pos1, valid, pos2, valid, jnp.asarray(wh), jnp.asarray(wh),
            jax.random.PRNGKey(0), CFG, affine=False,
        )
        assert float(info.confidence) > 0
        assert int(info.count) >= 60
        Hf = np.array(info.homo)
        Hf /= Hf[2, 2]
        np.testing.assert_allclose(Hf, H, atol=0.05)

    def test_deterministic(self, rng):
        _, wh, match, pos1, pos2, valid = _make_ransac_case(rng)
        args = (match, pos1, valid, pos2, valid, jnp.asarray(wh), jnp.asarray(wh))
        a = estimate_transform(*args, jax.random.PRNGKey(7), CFG, affine=False)
        b = estimate_transform(*args, jax.random.PRNGKey(7), CFG, affine=False)
        np.testing.assert_array_equal(np.asarray(a.homo), np.asarray(b.homo))

    def test_rejects_pure_noise(self, rng):
        K = 256
        pos1 = jnp.asarray(rng.uniform(-400, 400, size=(K, 2)).astype(np.float32))
        pos2 = jnp.asarray(rng.uniform(-400, 400, size=(K, 2)).astype(np.float32))
        n = 100
        valid = jnp.asarray(np.arange(K) < n)
        idx = np.zeros((K, 2), np.int32)
        idx[:n] = np.stack([np.arange(n), np.arange(n)], -1)
        match = MatchResult(idx=jnp.asarray(idx), valid=valid, count=jnp.asarray(n))
        wh = jnp.asarray([800.0, 600.0])
        info = estimate_transform(
            match, pos1, valid, pos2, valid, wh, wh,
            jax.random.PRNGKey(1), CFG, affine=False,
        )
        assert float(info.confidence) <= 0
        assert int(info.count) == 0

    def test_too_few_matches(self, rng):
        _, wh, match, pos1, pos2, valid = _make_ransac_case(rng)
        small = MatchResult(
            idx=match.idx,
            valid=match.valid & (jnp.arange(match.valid.shape[0]) < 5),
            count=jnp.asarray(5),
        )
        info = estimate_transform(
            small, pos1, valid, pos2, valid, jnp.asarray(wh), jnp.asarray(wh),
            jax.random.PRNGKey(2), CFG, affine=False,
        )
        assert int(info.count) == 0


class TestRingChunking:
    def test_chunked_ring_equals_single_dispatch(self):
        """The giga-scale chunked ring match must equal the one-dispatch
        path exactly (chunking only bounds live distance batches)."""
        from openpano_tpu.match import matcher

        rng = np.random.default_rng(5)
        n, K, D = 7, 64, 128
        desc = jnp.asarray(rng.normal(size=(n, K, D)).astype(np.float32))
        valid = jnp.asarray(rng.random((n, K)) < 0.8)
        cfg = Config(MAX_MATCHES_PER_PAIR=32)
        ref = matcher._match_ring_all(desc, valid, cfg)
        parts = [matcher._match_ring_chunk(
                     desc, valid, jnp.arange(lo, min(lo + 3, n)), cfg)
                 for lo in range(0, n, 3)]
        out = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *parts)
        for a, b in zip(jax.tree_util.tree_leaves(ref),
                        jax.tree_util.tree_leaves(out)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
