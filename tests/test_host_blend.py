"""Single-device beyond-HBM blend: host band-slice streaming (VERDICT r4).

The reference blends arbitrarily many images on one machine by
load -> accumulate -> release (blender.cc:38-76, README.md:133-136); the
TPU analog streams column-band image slices from host RAM with the spill
halo carried between bands.  These tests force the path via
OPENPANO_HOST_BLEND / a tiny OPENPANO_HBM_BUDGET_GB and require equality
with the ordinary full-stack blend.
"""

import numpy as np
import pytest

from openpano_tpu import Config
from openpano_tpu.stitch.render import (
    blend,
    blend_linear_host_stream,
    plan_render,
)
from openpano_tpu.stitch.stitcher import stitch
from openpano_tpu.synth import photo_scene, render_views


@pytest.fixture(scope="module")
def views_u8():
    views, _ = render_views(photo_scene(), 6, out_w=320, out_h=240,
                            hfov_deg=30, overlap=0.55, seed=7)
    return np.round(views * 255).astype(np.uint8)


CFG = Config(ESTIMATE_CAMERA=True, ORDERED_INPUT=True,
             MAX_CAND_PER_OCTAVE=1024, MAX_KP_PER_OCTAVE=512,
             MAX_DESC_PER_OCTAVE=512, MAX_KP_PER_IMAGE=1024,
             MAX_MATCHES_PER_PAIR=256)


class TestHostStreamFunction:
    def test_matches_full_stack_blend(self, views_u8):
        """blend_linear_host_stream == blend() on the same plan."""
        import jax.numpy as jnp

        n = views_u8.shape[0]
        # simple translated flat plan
        homos = np.stack([np.eye(3) for _ in range(n)])
        for i in range(n):
            homos[i][0, 2] = 90.0 * (i - n // 2)
        whs = np.repeat([[320.0, 240.0]], n, 0)
        plan = plan_render(homos, whs, n // 2, "flat", 8000)
        f32 = views_u8.astype(np.float32) / 255.0
        ref = np.asarray(blend(jnp.asarray(f32), plan, ordered=True,
                               multiband=0))
        for groups in (2, 4):
            got = blend_linear_host_stream(views_u8, plan, ordered=True,
                                           groups=groups)
            assert got.shape == ref.shape
            valid_ref = ref[..., 0] >= 0
            valid_got = got[..., 0] >= 0
            agree = (valid_ref == valid_got).mean()
            assert agree > 0.999, (groups, agree)
            both = valid_ref & valid_got
            diff = np.abs(ref[both] - got[both])
            assert diff.max() < 1e-5, (groups, diff.max())


class TestBeyondHbmPipeline:
    def test_forced_host_blend_equals_normal(self, views_u8, monkeypatch):
        out_n, valid_n = stitch(views_u8, CFG, output="u8")
        monkeypatch.setenv("OPENPANO_HOST_BLEND", "1")
        out_h, valid_h = stitch(views_u8, CFG, output="u8")
        assert out_h.shape == out_n.shape
        agree = (valid_h == valid_n).mean()
        assert agree > 0.999, agree
        both = valid_h & valid_n
        d = np.abs(out_h[both].astype(np.int16) - out_n[both].astype(np.int16))
        assert d.max() <= 1, d.max()  # f32 band-order rounding at u8 ties

    def test_budget_trigger(self, views_u8, monkeypatch):
        """A budget below the paired-stack size selects the host path."""
        # paired f32 stack: 6*240*320*36 B = 16.6 MB -> budget 0.001 GB
        monkeypatch.setenv("OPENPANO_HBM_BUDGET_GB", "0.001")
        out, valid = stitch(views_u8, CFG, output="u8")
        assert valid.mean() > 0.3


class TestMultibandHostStream:
    def test_matches_full_stack_multiband(self, views_u8):
        """blend_multiband_host_stream == blend_multiband on the same
        plan: the carried-halo band decomposition is exact (VERDICT r4
        missing #4 — beyond-HBM multiband)."""
        import jax.numpy as jnp

        from openpano_tpu.stitch.multiband import (
            blend_multiband,
            blend_multiband_host_stream,
        )

        n = views_u8.shape[0]
        homos = np.stack([np.eye(3) for _ in range(n)])
        for i in range(n):
            homos[i][0, 2] = 90.0 * (i - n // 2)
        whs = np.repeat([[320.0, 240.0]], n, 0)
        plan = plan_render(homos, whs, n // 2, "flat", 8000)
        f32 = views_u8.astype(np.float32) / 255.0
        ref = np.asarray(blend_multiband(jnp.asarray(f32), plan,
                                         band_level=2))
        for groups in (2, 3):
            got = blend_multiband_host_stream(views_u8, plan,
                                              band_level=2, groups=groups)
            assert got.shape == ref.shape
            valid_ref = ref[..., 0] >= 0
            valid_got = got[..., 0] >= 0
            agree = (valid_ref == valid_got).mean()
            assert agree > 0.999, (groups, agree)
            both = valid_ref & valid_got
            diff = np.abs(ref[both] - got[both])
            assert diff.max() < 1e-4, (groups, diff.max())

    def test_multiband_beyond_budget_pipeline(self, views_u8, monkeypatch):
        """A multiband stitch whose stack exceeds the HBM budget runs the
        host band stream and matches the in-memory multiband stitch."""
        cfg_mb = CFG.replace(MULTIBAND=2)
        out_n, valid_n = stitch(views_u8, cfg_mb, output="u8")
        monkeypatch.setenv("OPENPANO_HBM_BUDGET_GB", "0.001")
        out_h, valid_h = stitch(views_u8, cfg_mb, output="u8")
        assert out_h.shape == out_n.shape
        agree = (valid_h == valid_n).mean()
        assert agree > 0.999, agree
        both = valid_h & valid_n
        d = np.abs(out_h[both].astype(np.int16) - out_n[both].astype(np.int16))
        assert d.max() <= 1, d.max()
