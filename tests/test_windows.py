"""Pallas window-DMA kernel vs the documented slab addressing convention.

The kernel (openpano_tpu/ops/windows.py) must produce exactly the slab the
convention describes — orientation and descriptor correctness on TPU depends
on it.  On the CPU test backend the kernel runs in Pallas interpreter mode
and is compared against both the XLA fallback path and a NumPy oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import openpano_tpu.ops.windows as win
from openpano_tpu.ops.windows import (
    SLAB_LANES, gather_window_slabs, slab_rows, window_starts,
)


def _np_slab(plane, s, y, x, WR):
    """NumPy oracle implementing the module-docstring convention."""
    S, H, W = plane.shape
    Hp = max(-(-H // 8) * 8, WR)
    Wp = max(-(-W // 128) * 128, SLAB_LANES)
    padded = np.zeros((S, Hp, Wp), np.float32)
    padded[:, :H, :W] = plane
    out = np.zeros((len(s), WR, SLAB_LANES), np.float32)
    for k in range(len(s)):
        r0 = min(max(int(y[k]) - WR // 2, 0), Hp - WR) & ~7
        c0 = min(max(int(x[k]) - 64, 0), Wp - SLAB_LANES) & ~127
        out[k] = padded[int(s[k]), r0 : r0 + WR, c0 : c0 + SLAB_LANES]
    return out


@pytest.fixture
def planes(rng):
    S, H, W = 3, 100, 300
    a = jnp.asarray(rng.uniform(size=(S, H, W)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(S, H, W)), jnp.float32)
    return a, b


def _random_kp(rng, S, H, W, K):
    return (
        jnp.asarray(rng.integers(0, S, K), jnp.int32),
        jnp.asarray(rng.integers(0, H, K), jnp.int32),
        jnp.asarray(rng.integers(0, W, K), jnp.int32),
    )


class TestWindowKernel:
    def test_slab_covers_radius(self):
        for R in (4, 8, 19, 40):
            WR = slab_rows(R)
            assert WR % 8 == 0 and WR >= 2 * R + 16

    def test_starts_cover_window(self, rng):
        H, W, WR, R = 500, 700, slab_rows(19), 19
        y = jnp.asarray(rng.integers(0, H, 200), jnp.int32)
        x = jnp.asarray(rng.integers(0, W, 200), jnp.int32)
        r0, c0 = window_starts(y, x, H, W, WR)
        y_, x_, r0_, c0_ = map(np.asarray, (y, x, r0, c0))
        # every in-image lane within +-R of the keypoint lies in the slab
        lo_r = np.maximum(y_ - R, 0)
        hi_r = np.minimum(y_ + R, H - 1)
        assert (r0_ <= lo_r).all() and (hi_r <= r0_ + WR - 1).all()
        lo_c = np.maximum(x_ - 63, 0)
        hi_c = np.minimum(x_ + 63, W - 1)
        assert (c0_ <= lo_c).all() and (hi_c <= c0_ + SLAB_LANES - 1).all()

    def test_xla_fallback_matches_oracle(self, rng, planes):
        a, b = planes
        S, H, W = a.shape
        s, y, x = _random_kp(rng, S, H, W, 40)
        WR = 32
        got_a, got_b = gather_window_slabs(a, b, s, y, x, WR)
        np.testing.assert_array_equal(
            np.asarray(got_a), _np_slab(np.asarray(a), s, y, x, WR))
        np.testing.assert_array_equal(
            np.asarray(got_b), _np_slab(np.asarray(b), s, y, x, WR))

    def test_interpret_matches_oracle(self, rng, planes):
        a, b = planes
        S, H, W = a.shape
        s, y, x = _random_kp(rng, S, H, W, 40)  # includes border keypoints
        WR = 32
        win.INTERPRET = True
        try:
            got_a, got_b = jax.jit(
                lambda *v: gather_window_slabs(*v, WR=WR)
            )(a, b, s, y, x)
        finally:
            win.INTERPRET = False
        np.testing.assert_array_equal(
            np.asarray(got_a), _np_slab(np.asarray(a), s, y, x, WR))
        np.testing.assert_array_equal(
            np.asarray(got_b), _np_slab(np.asarray(b), s, y, x, WR))

    def test_vmap_folds_batch(self, rng, planes):
        a, b = planes
        S, H, W = a.shape
        B, K = 3, 32
        ab = jnp.stack([a, a * 0.5, a + 1])
        bb = jnp.stack([b, b * 2.0, b - 1])
        ss = jnp.asarray(rng.integers(0, S, (B, K)), jnp.int32)
        yy = jnp.asarray(rng.integers(0, H, (B, K)), jnp.int32)
        xx = jnp.asarray(rng.integers(0, W, (B, K)), jnp.int32)
        WR = 24
        got = jax.vmap(lambda p, q, s, y, x: gather_window_slabs(p, q, s, y, x, WR=WR))(
            ab, bb, ss, yy, xx
        )
        for i in range(B):
            np.testing.assert_array_equal(
                np.asarray(got[0][i]), _np_slab(np.asarray(ab[i]), ss[i], yy[i], xx[i], WR))
            np.testing.assert_array_equal(
                np.asarray(got[1][i]), _np_slab(np.asarray(bb[i]), ss[i], yy[i], xx[i], WR))

    def test_interpret_vmap_matches(self, rng, planes):
        a, b = planes
        S, H, W = a.shape
        B, K = 2, 32
        ab = jnp.stack([a, a + 0.25])
        bb = jnp.stack([b, b * 0.75])
        ss = jnp.asarray(rng.integers(0, S, (B, K)), jnp.int32)
        yy = jnp.asarray(rng.integers(0, H, (B, K)), jnp.int32)
        xx = jnp.asarray(rng.integers(0, W, (B, K)), jnp.int32)
        WR = 32
        win.INTERPRET = True
        try:
            got = jax.jit(
                jax.vmap(lambda p, q, s, y, x: gather_window_slabs(p, q, s, y, x, WR=WR))
            )(ab, bb, ss, yy, xx)
        finally:
            win.INTERPRET = False
        for i in range(B):
            np.testing.assert_array_equal(
                np.asarray(got[0][i]), _np_slab(np.asarray(ab[i]), ss[i], yy[i], xx[i], WR))

    def test_small_image_padded(self, rng):
        """Planes narrower than one slab get padded, not special-cased."""
        S, H, W = 2, 20, 64
        a = jnp.asarray(rng.uniform(size=(S, H, W)), jnp.float32)
        b = jnp.asarray(rng.uniform(size=(S, H, W)), jnp.float32)
        s, y, x = _random_kp(rng, S, H, W, 16)
        WR = 24
        got_a, _ = gather_window_slabs(a, b, s, y, x, WR)
        np.testing.assert_array_equal(
            np.asarray(got_a), _np_slab(np.asarray(a), s, y, x, WR))
