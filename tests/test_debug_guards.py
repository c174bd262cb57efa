"""OPENPANO_CHECK_NUMERICS: the m_assert analog (SURVEY §5.2)."""

import numpy as np
import pytest

from openpano_tpu.utils import debug


class TestAssertFinite:
    def test_noop_when_disabled(self, monkeypatch):
        monkeypatch.delenv("OPENPANO_CHECK_NUMERICS", raising=False)
        debug.assert_finite("stage", x=np.array([np.nan]))  # no raise

    def test_raises_with_location(self, monkeypatch):
        monkeypatch.setenv("OPENPANO_CHECK_NUMERICS", "1")
        bad = np.ones((3, 4), np.float32)
        bad[1, 2] = np.inf
        with pytest.raises(debug.NumericsError) as e:
            debug.assert_finite("blend", canvas=bad)
        msg = str(e.value)
        assert "[blend]" in msg and "canvas" in msg and "(1, 2)" in msg

    def test_ignores_int_arrays(self, monkeypatch):
        monkeypatch.setenv("OPENPANO_CHECK_NUMERICS", "1")
        debug.assert_finite("stage", idx=np.array([1, 2, 3]))

    def test_skips_none(self, monkeypatch):
        monkeypatch.setenv("OPENPANO_CHECK_NUMERICS", "1")
        debug.assert_finite("stage", x=None)


class TestPipelineUnderGuards:
    def test_clean_pipeline_passes(self, monkeypatch):
        """A healthy end-to-end stitch runs green under full checks,
        including the checkify'd LM loop."""
        monkeypatch.setenv("OPENPANO_CHECK_NUMERICS", "1")
        from openpano_tpu import Config
        from openpano_tpu.stitch.stitcher import stitch
        from openpano_tpu.synth import photo_scene, render_views

        views, _ = render_views(photo_scene(), 4, out_w=200, out_h=150,
                                hfov_deg=32, overlap=0.55, seed=3)
        u8 = np.round(views * 255).astype(np.uint8)
        cfg = Config(ESTIMATE_CAMERA=True, ORDERED_INPUT=True,
                     SIFT_WORKING_SIZE=200, RANSAC_ITERATIONS=200,
                     MAX_CAND_PER_OCTAVE=512, MAX_KP_PER_OCTAVE=256,
                     MAX_DESC_PER_OCTAVE=256, MAX_KP_PER_IMAGE=512,
                     MAX_MATCHES_PER_PAIR=256)
        out, valid = stitch(u8, cfg, output="u8")
        assert valid.mean() > 0.3
