"""Artifact store roundtrip tests."""

import numpy as np
import jax.numpy as jnp

from openpano_tpu.camera.camera import CameraSet
from openpano_tpu.io.artifacts import (
    dump_matchinfo_text, load_cameras, load_features, load_match_graph,
    load_matchinfo_text, save_cameras, save_features, save_match_graph,
)
from openpano_tpu.sift.descriptor import Features
from openpano_tpu.stitch.stitcher import PairwiseGraph


def test_features_roundtrip(tmp_path, rng):
    f = Features(
        pos=jnp.asarray(rng.normal(size=(2, 8, 2)).astype(np.float32)),
        desc=jnp.asarray(rng.normal(size=(2, 8, 128)).astype(np.float32)),
        valid=jnp.asarray(rng.random((2, 8)) > 0.5),
    )
    p = str(tmp_path / "feats.npz")
    save_features(p, f)
    g = load_features(p)
    np.testing.assert_array_equal(np.asarray(f.pos), np.asarray(g.pos))
    np.testing.assert_array_equal(np.asarray(f.valid), np.asarray(g.valid))


def _graph(rng, n=3, M=16):
    g = PairwiseGraph(n, M)
    g.conf[0, 1] = g.conf[1, 0] = 0.7
    g.homo[0, 1] = np.eye(3) + rng.normal(size=(3, 3)) * 0.01
    g.homo[1, 0] = np.linalg.inv(g.homo[0, 1])
    g.to_pos[0, 1, :5] = rng.normal(size=(5, 2))
    g.from_pos[0, 1, :5] = rng.normal(size=(5, 2))
    g.valid[0, 1, :5] = True
    return g


def test_match_graph_roundtrip(tmp_path, rng):
    g = _graph(rng)
    p = str(tmp_path / "graph.npz")
    save_match_graph(p, g)
    h = load_match_graph(p)
    np.testing.assert_array_equal(g.conf, h.conf)
    np.testing.assert_array_equal(g.homo, h.homo)
    np.testing.assert_array_equal(g.valid, h.valid)


def test_matchinfo_text_roundtrip(tmp_path, rng):
    g = _graph(rng)
    p = str(tmp_path / "matchinfo.txt")
    dump_matchinfo_text(p, g)
    h = load_matchinfo_text(p, 3, 16)
    np.testing.assert_allclose(g.conf, h.conf)
    np.testing.assert_allclose(g.homo[0, 1], h.homo[0, 1])
    np.testing.assert_allclose(g.to_pos[0, 1, :5], h.to_pos[0, 1, :5])
    np.testing.assert_array_equal(g.valid, h.valid)


def test_cameras_roundtrip(tmp_path, rng):
    c = CameraSet(
        focal=rng.normal(size=4) + 700, ppx=rng.normal(size=4),
        ppy=rng.normal(size=4), R=np.tile(np.eye(3), (4, 1, 1)),
    )
    p = str(tmp_path / "cams.npz")
    save_cameras(p, c)
    d = load_cameras(p)
    np.testing.assert_array_equal(c.focal, d.focal)
    np.testing.assert_array_equal(c.R, d.R)
