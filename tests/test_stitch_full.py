"""End-to-end tests for the general Stitcher (ESTIMATE_CAMERA / TRANS)."""

import numpy as np
import pytest

from openpano_tpu.config import Config
from openpano_tpu.ops.imgproc import crop_to_largest_rect
from openpano_tpu.stitch.stitcher import stitch
from openpano_tpu.synth import photo_scene, render_views

SMALL = dict(
    RANSAC_ITERATIONS=400,
    MAX_CAND_PER_OCTAVE=1024, MAX_KP_PER_OCTAVE=512,
    MAX_DESC_PER_OCTAVE=512, MAX_KP_PER_IMAGE=1024,
    MAX_MATCHES_PER_PAIR=512, SIFT_WORKING_SIZE=400,
)


class TestEstimateCameraEndToEnd:
    def test_stitch_unordered(self):
        cfg = Config(ESTIMATE_CAMERA=True, ORDERED_INPUT=False, **SMALL)
        scene = photo_scene()
        views, truth = render_views(
            scene, 5, out_w=320, out_h=240, hfov_deg=32, overlap=0.5
        )
        # shuffle to exercise the unordered pairwise path
        perm = [2, 0, 4, 1, 3]
        out = stitch(views[perm], cfg)
        # spherical projection of a 5-view 32deg-fov pano: width ratio vs one
        # view ~= total span / single span = (32+16*4)/32 = 3.0
        assert out.shape[1] == pytest.approx(3.0 * 320, rel=0.25)
        assert 150 <= out.shape[0] <= 450
        cropped = crop_to_largest_rect(out)
        assert cropped.size > 0 and (cropped >= 0).all()
        assert cropped.shape[1] > 2.0 * 320

    def test_stitch_u8_pipelined_matches_f32(self):
        """uint8 host input (the pipelined delta-coded upload path, with
        n < feature-batch so the padded-chunk branch is exercised) agrees
        with the plain f32 path."""
        cfg = Config(ESTIMATE_CAMERA=True, ORDERED_INPUT=False, **SMALL)
        scene = photo_scene()
        views, _ = render_views(
            scene, 5, out_w=320, out_h=240, hfov_deg=32, overlap=0.5
        )
        u8 = np.round(np.clip(views, 0, 1) * 255).astype(np.uint8)
        out_f32 = stitch(u8.astype(np.float32) / 255.0, cfg)
        out_u8, valid = stitch(u8, cfg, output="u8")
        assert out_u8.shape[:2] == out_f32.shape[:2]
        assert valid.mean() > 0.3


class TestHeterogeneousSizes:
    def test_stitch_mixed_resolutions(self):
        """Mixed-size inputs (reference: per-image shapes via ImageRef,
        stitch/imageref.hh:13-35): every other view downscaled to 80%.
        Shape-bucketed features + sentinel-padded blend stack must still
        produce the full pano."""
        import jax.numpy as jnp

        from openpano_tpu.ops.imgproc import resize
        from openpano_tpu.stitch.stitcher import stitch_hetero

        cfg = Config(ESTIMATE_CAMERA=True, ORDERED_INPUT=False, **SMALL)
        scene = photo_scene()
        views, _ = render_views(
            scene, 5, out_w=320, out_h=240, hfov_deg=32, overlap=0.5
        )
        imgs = []
        for k in range(5):
            if k % 2 == 1:
                imgs.append(np.asarray(resize(jnp.asarray(views[k]), 192, 256)))
            else:
                imgs.append(views[k])
        out = stitch_hetero(imgs, cfg)
        # same pano span as the uniform test, anchored on a full-res center
        assert out.shape[1] == pytest.approx(3.0 * 320, rel=0.25)
        assert 150 <= out.shape[0] <= 450
        cropped = crop_to_largest_rect(out)
        assert cropped.size > 0 and (cropped >= 0).all()
        assert cropped.shape[1] > 2.0 * 320


class TestTransEndToEnd:
    def test_stitch_translation(self):
        """TRANS mode: translating camera over a flat scene (affine model)."""
        cfg = Config(
            ESTIMATE_CAMERA=False, TRANS=True, ORDERED_INPUT=True, **SMALL
        )
        scene = photo_scene()[:, :2000]
        H, W = 240, 320
        n = 4
        views = np.stack([
            scene[600 : 600 + H, 150 + k * 160 : 150 + k * 160 + W] for k in range(n)
        ])
        out = stitch(views, cfg)
        # 4 translated crops, 50% overlap: width ~ W + 3*160
        assert out.shape[1] == pytest.approx(320 + 3 * 160, rel=0.1)
        assert out.shape[0] == pytest.approx(240, rel=0.1)
        cropped = crop_to_largest_rect(out)
        assert (cropped >= 0).all() and cropped.shape[1] > 600
