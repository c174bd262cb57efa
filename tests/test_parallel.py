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


def test_distributed_ba_matches_single_device(rng):
    """Pair-sharded LM over the 8-device mesh == single-device LM."""
    import jax.numpy as jnp

    from openpano_tpu.camera.bundle_adjuster import (
        BAPairProblem,
        ba_optimize_pairs,
    )
    from openpano_tpu.parallel.dist_ba import ba_optimize_pairs_sharded
    from openpano_tpu.parallel.mesh import make_mesh

    n, M = 6, 64
    f = 500.0
    def rot(th):
        return np.array([
            [np.cos(th), 0, np.sin(th)], [0, 1, 0],
            [-np.sin(th), 0, np.cos(th)],
        ])
    Rs = [rot(0.3 * (i - n / 2)) for i in range(n)]
    K = np.diag([f, f, 1.0])
    pairs = [(i, i + 1) for i in range(n - 1)] + [(i, i + 2) for i in range(n - 2)]
    P = len(pairs)
    pt_to = np.zeros((P, M, 2)); pt_from = np.zeros((P, M, 2)); w = np.zeros((P, M))
    for s, (i, j) in enumerate(pairs):
        Hij = K @ Rs[i] @ Rs[j].T @ np.linalg.inv(K)
        p_j = rng.uniform(-200, 200, size=(M, 2))
        hp = np.concatenate([p_j, np.ones((M, 1))], 1) @ Hij.T
        p_i = hp[:, :2] / hp[:, 2:3]
        pt_to[s], pt_from[s] = p_i, p_j
        w[s] = 1.0
    params = np.zeros((n, 6))
    params[:, 0] = f * 1.08          # perturbed focal; rotations at truth
    for i in range(n):
        from openpano_tpu.camera.estimator import _np_unrod
        params[i, 3:6] = _np_unrod(Rs[i])

    prob = BAPairProblem(
        pt_to=jnp.asarray(pt_to), pt_from=jnp.asarray(pt_from),
        w=jnp.asarray(w),
        cam_to=jnp.asarray([p[0] for p in pairs], jnp.int32),
        cam_from=jnp.asarray([p[1] for p in pairs], jnp.int32),
        swapped=jnp.zeros(P, bool), pair_w=jnp.ones(P),
    )
    single = np.asarray(ba_optimize_pairs(
        jnp.asarray(params), prob, jnp.asarray(0), n, 5.0))
    mesh = make_mesh(8)
    dist = np.asarray(ba_optimize_pairs_sharded(
        params, prob, 0, n, 5.0, mesh))
    # f64 all the way; psum ordering may differ at the last ulp
    np.testing.assert_allclose(dist, single, rtol=1e-9, atol=1e-9)
    # and it actually improved the focal towards truth
    assert abs(single[:, 0].mean() - f) / f < 0.01
