"""Multiband blender tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from openpano_tpu.stitch.render import plan_render, blend
from openpano_tpu.stitch.multiband import blend_multiband, _first_level, _winner_take_all


def _two_image_plan(shift=48):
    img = np.random.default_rng(3).uniform(size=(64, 96, 3)).astype(np.float32)
    H = np.eye(3)
    H2 = np.eye(3)
    H2[0, 2] = shift
    homos = np.stack([H, H2])
    whs = np.array([[96.0, 64.0]] * 2)
    plan = plan_render(homos, whs, 0, "flat", 8000)
    return img, plan


class TestMultiband:
    def test_identical_images_reproduce_source(self):
        img, plan = _two_image_plan(shift=0)
        stack = jnp.asarray(np.stack([img, img]))
        out = np.asarray(blend_multiband(stack, plan, band_level=3))
        valid = out[..., 0] >= 0
        assert valid.mean() > 0.9
        src = img[: plan.out_h, : plan.out_w]
        np.testing.assert_allclose(out[valid], src[valid], atol=0.05)

    def test_translation_blend_no_ghosting(self):
        """With winner-take-all seams the overlap region comes from exactly
        one image per pixel, so a shifted copy of the same scene must
        reproduce the scene (no averaging ghost)."""
        scene = np.random.default_rng(4).uniform(size=(64, 160, 3)).astype(np.float32)
        a = scene[:, :96]
        b = scene[:, 48:144]
        H = np.eye(3)
        H2 = np.eye(3)
        H2[0, 2] = 48
        plan = plan_render(
            np.stack([H, H2]), np.array([[96.0, 64.0]] * 2), 0, "flat", 8000
        )
        out = np.asarray(blend_multiband(jnp.asarray(np.stack([a, b])), plan, 3))
        valid = out[..., 0] >= 0
        src = scene[: plan.out_h, : plan.out_w]
        assert valid.mean() > 0.9
        # a thin RoI-boundary band deviates (zero-padded blur support vs the
        # reference's in-RoI replication); bulk must reproduce the scene
        err = np.abs(out[valid] - src[valid])
        assert (err > 0.06).mean() < 0.005
        assert np.median(err) < 0.01

    def test_wrap_seam_continuity(self):
        """A 370-degree sweep forces an image across the +-pi wrap — its
        bbox is split into one render item per canvas-edge strip.  The two
        strips blur independently (documented deviation from the
        reference, which materializes the whole RoI), so quantify it: the
        blended canvas must stay CONTINUOUS across the seam columns, with
        the column-to-column jump at the canvas edges no larger than a few
        times the typical interior jump."""
        from openpano_tpu.synth import photo_scene, render_views

        n = 12
        views, truth = render_views(
            photo_scene(), n, out_w=160, out_h=120, hfov_deg=40,
            overlap=0.2, seed=2,
        )
        # cameras from ground truth: pure yaw, shared focal
        f = truth["focal_px"]
        homos = []
        for k in range(n):
            th = truth["yaws"][k]
            K = np.diag([f, f, 1.0])
            R = np.array([
                [np.cos(th), 0, np.sin(th)], [0, 1, 0],
                [-np.sin(th), 0, np.cos(th)],
            ])
            homos.append(R.T @ np.linalg.inv(K))
        whs = np.repeat([[160.0, 120.0]], n, 0)
        plan = plan_render(np.stack(homos), whs, n // 2, "spherical", 8000)
        # the sweep covers 40 + 32*11 = 392 deg > 360: wrap split must fire
        assert len(plan.items) > n, (len(plan.items), n)
        from openpano_tpu.stitch.render import blend_linear

        imgs = jnp.asarray(views, jnp.float32)
        mb = np.asarray(blend_multiband(imgs, plan, 2))
        lin = np.asarray(blend_linear(imgs, plan, ordered=False))
        both = (mb[..., 0] >= 0) & (lin[..., 0] >= 0)
        assert both[:, :3].sum() > 50 and both[:, -3:].sum() > 50
        # the linear blender treats wrap-split pixels exactly (per-pixel,
        # no blur), so |mb - lin| at the seam-edge columns measures the
        # band-pass blur-support cut at the canvas edge.  Measured ~0.08
        # mean intensity vs ~0.012 interior — the same cut the reference
        # has (its whole-canvas RoI also ends at the canvas edge, so its
        # blur support is truncated there identically); bound it so a
        # regression (e.g. strips sampling garbage across the split)
        # cannot hide
        diff = np.where(both[..., None], np.abs(mb - lin), np.nan)
        seam_dev = np.nanmean(np.concatenate([diff[:, :3], diff[:, -3:]], 1))
        interior_dev = np.nanmean(diff[:, 3:-3])
        assert seam_dev < 0.15, (seam_dev, interior_dev)
        assert interior_dev < 0.05, interior_dev

    def test_winner_take_all_unique(self):
        img, plan = _two_image_plan(shift=48)
        stack = jnp.asarray(np.stack([img, img]))
        planes = _first_level(
            stack, jnp.asarray(plan.homo_invs),
            jnp.asarray(plan.whs, jnp.float32),
            jnp.asarray(plan.items[:, 0]), jnp.asarray(plan.items[:, 1:5]),
            jnp.asarray(plan.proj_min, jnp.float32),
            jnp.asarray(plan.resolution, jnp.float32),
            plan.proj, 64, 96,
        )
        wta = np.asarray(_winner_take_all(planes, jnp.asarray(plan.ranges),
                                          plan.out_h, plan.out_w))
        w = wta[..., 3]
        assert set(np.unique(w)) <= {0.0, 1.0}
        # overlap region: exactly one winner per canvas pixel
        # image0 occupies canvas x in [0,96), image1 in [48,144)
        # exclude the last row: bilinear support exceeds the image there, so
        # both samples are invalid (the reference reads out of bounds at that
        # row — UB; its weight is ~0 there anyway)
        w0 = w[0][:-1, 48:96]  # image 0's RoI columns 48..96 = canvas 48..96
        w1 = w[1][:-1, 0:48]   # image 1's RoI columns 0..48 = canvas 48..96
        np.testing.assert_array_equal(w0 + w1, np.ones_like(w0))

    def test_blend_dispatch(self):
        img, plan = _two_image_plan(shift=0)
        stack = jnp.asarray(np.stack([img, img]))
        lin = np.asarray(blend(stack, plan, ordered=True, multiband=0))
        mb = np.asarray(blend(stack, plan, ordered=True, multiband=2))
        assert lin.shape == mb.shape
