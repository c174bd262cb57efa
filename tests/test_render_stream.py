"""Streamed u8 blend must be bit-identical to blend_linear + u8 conversion."""

import numpy as np
import jax.numpy as jnp

from openpano_tpu.stitch.render import (
    plan_render,
    blend_linear,
    blend_linear_stream_u8,
)
from openpano_tpu.stitch.stitcher import _f32_to_u8_rgba


def _sweep_plan(rng, n, H, W, wide=False):
    imgs = jnp.asarray(rng.uniform(size=(n, H, W, 3)), jnp.float32)
    whs = np.repeat([[float(W), float(H)]], n, 0)
    f = float(W)
    Kinv = np.linalg.inv(np.diag([f, f, 1.0]))
    homos = []
    span = 2 * np.pi if wide else 1.5
    for i in range(n):
        th = (i - n / 2) * span / n
        R = np.array([
            [np.cos(th), 0, np.sin(th)],
            [0, 1, 0],
            [-np.sin(th), 0, np.cos(th)],
        ])
        homos.append(R.T @ Kinv)
    plan = plan_render(np.stack(homos), whs, n // 2, "spherical", 8000)
    return imgs, plan


def test_stream_blend_matches_reference(rng):
    imgs, plan = _sweep_plan(rng, 12, 60, 80)
    ref = np.asarray(_f32_to_u8_rgba(blend_linear(imgs, plan, ordered=False)))
    for G in (1, 2, 4):
        got = blend_linear_stream_u8(imgs, plan, ordered=False, groups=G)
        assert got.shape == ref.shape
        np.testing.assert_array_equal(got, ref)


def test_stream_blend_wraparound(rng):
    # full 360-degree sweep: wrap-straddling images split into edge strips
    imgs, plan = _sweep_plan(rng, 10, 48, 64, wide=True)
    assert len(plan.items) > 10  # at least one item was wrap-split
    ref = np.asarray(_f32_to_u8_rgba(blend_linear(imgs, plan, ordered=True)))
    got = blend_linear_stream_u8(imgs, plan, ordered=True, groups=3)
    np.testing.assert_array_equal(got, ref)


def test_packed_gather_blend_exact(rng):
    # u8-derived images: packed-i32 sampling must match to 1 u8 LSB
    import jax.numpy as jnp

    n, H, W = 10, 48, 64
    u8 = rng.integers(0, 256, (n, H, W, 3)).astype(np.uint8)
    imgs = jnp.asarray(u8).astype(jnp.float32) / 255.0
    _, plan = _sweep_plan(rng, n, H, W)
    ref = np.asarray(_f32_to_u8_rgba(blend_linear(imgs, plan, ordered=False)))
    got = np.asarray(_f32_to_u8_rgba(
        blend_linear(imgs, plan, ordered=False, packed_gather=True)))

    def close(a, b):
        # separately-compiled graphs may contract FMAs differently: allow
        # 1 u8 LSB on a vanishing fraction of pixels
        d = np.abs(a.astype(int) - b.astype(int))
        assert d.max() <= 1 and (d > 0).mean() < 1e-3

    close(got, ref)
    gs = blend_linear_stream_u8(imgs, plan, ordered=False, groups=3,
                                packed_gather=True)
    close(gs, ref)
