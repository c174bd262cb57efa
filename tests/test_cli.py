"""CLI smoke tests: every mode runs end-to-end and writes its artifact
(reference: main.cc debug subcommands, main.cc:333-357)."""

import os

import numpy as np
import pytest

from openpano_tpu import cli
from openpano_tpu.io.image import write_rgb
from openpano_tpu.synth import photo_scene, render_views


@pytest.fixture(scope="module")
def img_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_imgs")
    scene = photo_scene()
    views, _ = render_views(
        scene, 2, out_w=480, out_h=360, hfov_deg=30, overlap=0.6, seed=3
    )
    paths = []
    for i, v in enumerate(views):
        p = str(d / f"{i}.jpg")
        write_rgb(p, v)
        paths.append(p)
    return paths


@pytest.fixture(scope="module")
def tiny_cfg_file(tmp_path_factory):
    # small caps keep CPU compiles fast; same key names as the reference's
    # config.cfg (init_config, main.cc:237-292)
    d = tmp_path_factory.mktemp("cli_cfg")
    p = str(d / "config.cfg")
    from openpano_tpu.config import Config

    # a config file must carry every reference knob (missing key is fatal,
    # lib/config.cc:31-35); start from the defaults and override the
    # fast-test knobs.  NUM_SCALE must stay >= default: with a short scale
    # stack the scanned |DoG| level sits next to the much-larger level 0
    # and nothing survives the 26-neighbor test (same as the reference).
    values = {k: getattr(Config, k) for k in Config.REFERENCE_KNOBS}
    values.update(
        SIFT_WORKING_SIZE=200, NUM_OCTAVE=2, NUM_SCALE=7,
        PRE_COLOR_THRES=2e-2, CONTRAST_THRES=2e-2,
        MAX_CAND_PER_OCTAVE=256, MAX_KP_PER_OCTAVE=128,
        MAX_DESC_PER_OCTAVE=128, MAX_KP_PER_IMAGE=256,
        MAX_MATCHES_PER_PAIR=128, RANSAC_ITERATIONS=64,
    )
    with open(p, "w") as f:
        for k, v in values.items():
            f.write(f"{k} {int(v) if isinstance(v, bool) else v}\n")
    return p


@pytest.mark.parametrize(
    "mode,nimg,artifact",
    [
        ("keypoint", 1, "log/keypoint.jpg"),
        ("raw_extrema", 1, "log/extrema.jpg"),
        ("orientation", 1, "log/orientation.jpg"),
        ("match", 2, "log/match.jpg"),
        ("inlier", 2, "log/inlier.jpg"),
        ("warp", 1, "log/warped.jpg"),
        ("planet", 1, "log/planet.jpg"),
    ],
)
def test_debug_mode(img_files, tiny_cfg_file, tmp_path, monkeypatch,
                    mode, nimg, artifact):
    monkeypatch.chdir(tmp_path)
    rc = cli.main(["--mode", mode, "-c", tiny_cfg_file, *img_files[:nimg]])
    assert rc == 0
    assert os.path.exists(artifact), artifact


def test_matchinfo_roundtrip_and_debug_blend(img_files, tiny_cfg_file,
                                             tmp_path, monkeypatch):
    """The reference's fixture workflow (debug.cc:19-43, 111-140): stitch
    with --dump-matchinfo, re-stitch with --load-matchinfo (skipping
    feature+match — asserted via the identical output), plus the per-image
    blender debug renders."""
    monkeypatch.chdir(tmp_path)
    mi = str(tmp_path / "matchinfo.txt")
    rc = cli.main(["-c", tiny_cfg_file, "-o", "a.jpg",
                   "--dump-matchinfo", mi, "--debug-blend", *img_files])
    assert rc == 0
    assert os.path.exists(mi)
    assert os.path.exists("log/blended-00.jpg")
    assert os.path.exists("log/blended-01.jpg")

    rc = cli.main(["-c", tiny_cfg_file, "-o", "b.jpg",
                   "--load-matchinfo", mi, *img_files])
    assert rc == 0
    from PIL import Image

    a = np.asarray(Image.open("a.jpg"), np.float32)
    b = np.asarray(Image.open("b.jpg"), np.float32)
    assert a.shape == b.shape
    # JPEG round-trips identically for identical pixel input
    assert np.abs(a - b).mean() < 1.0
