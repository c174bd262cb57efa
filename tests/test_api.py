"""Top-level convenience API: openpano_tpu.stitch / stitch_files."""

import os

import numpy as np
import pytest

import openpano_tpu
from openpano_tpu import Config
from openpano_tpu.io import write_rgb
from openpano_tpu.synth import photo_scene, render_views

SMALL = dict(
    RANSAC_ITERATIONS=200,
    MAX_CAND_PER_OCTAVE=1024, MAX_KP_PER_OCTAVE=512,
    MAX_DESC_PER_OCTAVE=512, MAX_KP_PER_IMAGE=1024,
    MAX_MATCHES_PER_PAIR=512, SIFT_WORKING_SIZE=400,
)


def test_stitch_files_end_to_end(tmp_path):
    scene = photo_scene()
    views, _ = render_views(scene, 4, out_w=320, out_h=240, hfov_deg=30,
                            overlap=0.5)
    paths = []
    for i, v in enumerate(views):
        p = os.path.join(tmp_path, f"im{i}.png")
        write_rgb(p, v)
        paths.append(p)
    out_path = os.path.join(tmp_path, "pano.png")
    cfg = Config(ESTIMATE_CAMERA=True, ORDERED_INPUT=True, **SMALL)
    canvas = openpano_tpu.stitch_files(paths, cfg, out=out_path)
    assert canvas.dtype == np.uint8
    assert canvas.shape[1] > 1.5 * 320
    assert os.path.exists(out_path)


def test_stitch_files_mixed_shapes_routed_to_hetero(tmp_path):
    """Mixed sizes are supported (stitch_hetero bucketing) except in
    CYLINDER mode, whose warp assumes one shape."""
    a = os.path.join(tmp_path, "a.png")
    b = os.path.join(tmp_path, "b.png")
    write_rgb(a, np.zeros((10, 12, 3), np.uint8))
    write_rgb(b, np.zeros((10, 14, 3), np.uint8))
    cfg = openpano_tpu.Config(
        CYLINDER=True, ESTIMATE_CAMERA=False, ORDERED_INPUT=True
    )
    with pytest.raises(ValueError, match="uniform"):
        openpano_tpu.stitch_files([a, b], cfg)
    # non-cylinder modes accept mixed shapes; these black scraps then fail
    # at the zero-feature gate (stitcherbase.cc:20-21), not the shape check
    with pytest.raises(RuntimeError, match="feature"):
        openpano_tpu.stitch_files([a, b])
