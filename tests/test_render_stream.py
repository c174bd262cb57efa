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
