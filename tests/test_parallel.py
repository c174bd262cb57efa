"""Sharded pipeline tests on the 8-virtual-device CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np

from openpano_tpu.parallel.mesh import make_mesh
from openpano_tpu.parallel.pipeline import sharded_pipeline_step


def _tiny_cfg():
    from openpano_tpu import Config

    return Config(
        SIFT_WORKING_SIZE=64, NUM_OCTAVE=2, NUM_SCALE=4,
        MAX_CAND_PER_OCTAVE=256, MAX_KP_PER_OCTAVE=128,
        MAX_DESC_PER_OCTAVE=128, MAX_KP_PER_IMAGE=256,
        MAX_MATCHES_PER_PAIR=128, RANSAC_ITERATIONS=32,
        OVERLAP_AREA_GRID=16,
    )


def _inputs(n):
    rng = np.random.default_rng(0)
    base = rng.uniform(size=(48, 48 + 8 * n, 3)).astype(np.float32)
    imgs = np.stack([base[:, 8 * k : 8 * k + 48] for k in range(n)])
    whs = jnp.asarray([[48.0, 48.0]] * n, jnp.float32)
    ii, jj = [], []
    for a in range(n):
        for b in range(a + 1, n):
            ii.append(a)
            jj.append(b)
    return jnp.asarray(imgs), whs, jnp.asarray(ii), jnp.asarray(jj)


class TestShardedPipeline:
    def test_full_mesh_step(self):
        assert len(jax.devices()) == 8
        mesh = make_mesh(8)
        imgs, whs, ii, jj = _inputs(8)
        out = sharded_pipeline_step(
            imgs, whs, ii, jj, jax.random.PRNGKey(0), _tiny_cfg(), mesh
        )
        assert out["kpt_count"].shape == (8,)
        assert out["match_count"].shape == (28,)
        assert out["canvas"].shape == (64, 128, 3)
        assert np.isfinite(float(out["ba_delta_norm"]))

    def test_matches_mesh_size_independent(self):
        """Sharding must not change results: 1-device vs 8-device mesh."""
        imgs, whs, ii, jj = _inputs(4)
        cfg = _tiny_cfg()
        out1 = sharded_pipeline_step(
            imgs, whs, ii, jj, jax.random.PRNGKey(0), cfg, make_mesh(1)
        )
        out8 = sharded_pipeline_step(
            imgs, whs, ii, jj, jax.random.PRNGKey(0), cfg, make_mesh(8)
        )
        np.testing.assert_array_equal(
            np.asarray(out1["match_count"]), np.asarray(out8["match_count"])
        )
        np.testing.assert_allclose(
            np.asarray(out1["canvas"]), np.asarray(out8["canvas"]), atol=1e-5
        )
