"""Camera layer tests: Rodrigues, focal estimation, straighten, LM BA."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openpano_tpu.config import Config
from openpano_tpu.camera.rotation import rodrigues, rotation_to_angle
from openpano_tpu.camera.camera import (
    CameraSet, estimate_focal, focal_from_homography, intrinsic, straighten,
)
from openpano_tpu.camera.bundle_adjuster import ba_optimize, pairs_to_points
from openpano_tpu.camera.estimator import estimate_cameras, traverse_spanning_tree



def rand_rotation(rng, scale=0.5):
    v = rng.normal(size=3) * scale
    return np.asarray(rodrigues(jnp.asarray(v))), v


class TestRotation:
    def test_roundtrip(self, rng):
        for _ in range(10):
            R, v = rand_rotation(rng)
            v2 = np.asarray(rotation_to_angle(jnp.asarray(R)))
            np.testing.assert_allclose(v2, v, atol=1e-8)

    def test_small_angle(self):
        v = jnp.asarray([1e-9, -2e-9, 1e-9])
        R = np.asarray(rodrigues(v))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-8)

    def test_orthogonality(self, rng):
        R, _ = rand_rotation(rng, scale=2.0)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        assert np.linalg.det(R) == pytest.approx(1.0)

    def test_differentiable_at_zero(self):
        J = jax.jacfwd(rodrigues)(jnp.zeros(3))
        assert np.isfinite(np.asarray(J)).all()


def synth_rotation_pano(rng, n=5, f=700.0, noise=0.0, M=64):
    """Cameras doing yaw rotation; matches = reprojected grid points."""
    # small pitch/roll jitter: exact pure-yaw homographies make Szeliski's
    # focal formula degenerate (d1=0, numerator=0 -> the reference's
    # get_focal_from_matrix also returns 0 there, camera.cc:19-52)
    yaws = (np.arange(n) - n // 2) * 0.15
    Rs = [
        np.asarray(rodrigues(jnp.asarray([
            rng.normal() * 0.02, y, rng.normal() * 0.02
        ])))
        for y in yaws
    ]
    K = intrinsic(f, 0, 0)
    homos = np.zeros((n, n, 3, 3))
    conf = np.zeros((n, n))
    to_pos = np.zeros((n, n, M, 2))
    from_pos = np.zeros((n, n, M, 2))
    valid = np.zeros((n, n, M), bool)
    for i in range(n):
        for j in range(n):
            if abs(i - j) != 1:
                continue
            H = K @ Rs[i].T @ Rs[j] @ np.linalg.inv(K)  # j -> i
            homos[i, j] = H / H[2, 2]
            conf[i, j] = 0.5
            pts_j = rng.uniform(-250, 250, size=(M, 2))
            p = np.concatenate([pts_j, np.ones((M, 1))], 1) @ homos[i, j].T
            pts_i = p[:, :2] / p[:, 2:3] + rng.normal(size=(M, 2)) * noise
            to_pos[i, j] = pts_i
            from_pos[i, j] = pts_j
            valid[i, j] = True
    return conf, homos, to_pos, from_pos, valid, f, Rs


class TestFocal:
    def test_focal_from_rotation_homography(self, rng):
        f = 800.0
        K = intrinsic(f, 0, 0)
        R, _ = rand_rotation(rng, 0.3)
        H = K @ R @ np.linalg.inv(K)
        H /= H[2, 2]
        est = focal_from_homography(H)
        assert est == pytest.approx(f, rel=0.05)

    def test_estimate_focal_median(self, rng):
        conf, homos, *_, f, _ = synth_rotation_pano(rng)
        est = estimate_focal(conf, homos)
        assert est == pytest.approx(f, rel=0.05)

    def test_too_few(self):
        conf = np.zeros((4, 4))
        homos = np.zeros((4, 4, 3, 3))
        assert estimate_focal(conf, homos) == -1.0

    def test_robust_focal_ignores_garbage_mode(self, rng):
        """estimate_focal_robust must land in the dense true cluster even
        when a majority of extractions are scattered garbage or zeros (the
        small-rotation failure mode that poisons the reference's plain
        median — see camera.estimate_focal_robust)."""
        from openpano_tpu.camera.camera import estimate_focal_robust

        f = 1786.0
        n = 20
        conf = np.zeros((n, n))
        homos = np.zeros((n, n, 3, 3))
        K = intrinsic(f, 0, 0)
        k = 0
        for i in range(n):
            for j in range(i + 1, n):
                if k >= 60:
                    break
                conf[i, j] = conf[j, i] = 1.0
                if k % 3 == 0:  # true cluster (1/3 of pairs)
                    R, _ = rand_rotation(rng, 0.3)
                    H = K @ R @ np.linalg.inv(K)
                else:  # garbage mode: small-rotation extraction artifacts
                    fg = rng.uniform(250, 900)
                    Kg = intrinsic(fg, 0, 0)
                    R, _ = rand_rotation(rng, 0.3)
                    H = Kg @ R @ np.linalg.inv(Kg)
                homos[i, j] = H / H[2, 2]
                k += 1
        est = estimate_focal_robust(conf, homos)
        # the garbage 250-900 spread outnumbers the true cluster 2:1, but
        # no +-15% window inside it is denser than the true mode
        assert est == pytest.approx(f, rel=0.1)
        # plain reference median lands in the garbage mode on this data
        assert estimate_focal(conf, homos) < 1000

    def test_robust_focal_matches_median_when_clean(self, rng):
        from openpano_tpu.camera.camera import estimate_focal_robust

        conf, homos, *_, f, _ = synth_rotation_pano(rng)
        assert estimate_focal_robust(conf, homos) == pytest.approx(f, rel=0.05)


class TestTraverse:
    def test_spanning_tree_order(self):
        conf = np.zeros((4, 4))
        conf[0, 1] = conf[1, 0] = 0.9
        conf[1, 2] = conf[2, 1] = 0.8
        conf[2, 3] = conf[3, 2] = 0.7
        root, edges = traverse_spanning_tree(conf)
        assert root == 0
        assert edges == [(0, 1), (1, 2), (2, 3)]

    def test_disconnected_raises(self):
        conf = np.zeros((3, 3))
        conf[0, 1] = conf[1, 0] = 0.9
        with pytest.raises(RuntimeError, match="not connected"):
            traverse_spanning_tree(conf)


class TestBundleAdjuster:
    def test_ba_reduces_error_with_bad_init(self, rng):
        conf, homos, to_pos, from_pos, valid, f, Rs = synth_rotation_pano(
            rng, n=3, noise=0.3
        )
        n = 3
        # pairs (from=i, to=i+1); stored to_pos[i,j] lives in image i = BA
        # 'from'; from_pos in j = BA 'to'
        prob = pairs_to_points(
            jnp.asarray([0, 1]), jnp.asarray([1, 2]),
            jnp.asarray(np.stack([from_pos[0, 1], from_pos[1, 2]])),
            jnp.asarray(np.stack([to_pos[0, 1], to_pos[1, 2]])),
            jnp.asarray(np.stack([valid[0, 1], valid[1, 2]])),
            jnp.ones(2),
        )
        params = np.zeros((n, 6))
        params[:, 0] = f * 1.1  # perturbed focal
        for i, y in enumerate([-0.15, 0.0, 0.15]):
            params[i, 3:6] = [0, y * 1.15, 0]  # perturbed rotations
        out = np.asarray(
            ba_optimize(jnp.asarray(params), prob, jnp.asarray(1), n, 5.0)
        )
        # focal should move toward truth
        assert abs(out[0, 0] - f) < abs(params[0, 0] - f)
        # reprojection error should be small after BA
        from openpano_tpu.camera.bundle_adjuster import _residuals, _rms
        r = _residuals(jnp.asarray(out), prob)
        assert float(_rms(r, prob)) < 2.0

    def test_identity_rotation_frozen(self, rng):
        conf, homos, to_pos, from_pos, valid, f, Rs = synth_rotation_pano(rng, n=3)
        prob = pairs_to_points(
            jnp.asarray([0, 1]), jnp.asarray([1, 2]),
            jnp.asarray(np.stack([from_pos[0, 1], from_pos[1, 2]])),
            jnp.asarray(np.stack([to_pos[0, 1], to_pos[1, 2]])),
            jnp.asarray(np.stack([valid[0, 1], valid[1, 2]])),
            jnp.ones(2),
        )
        params = np.zeros((3, 6))
        params[:, 0] = f
        params[0, 3:6] = [0, -0.14, 0]
        params[2, 3:6] = [0, 0.14, 0]
        out = np.asarray(ba_optimize(jnp.asarray(params), prob, jnp.asarray(1), 3, 5.0))
        np.testing.assert_array_equal(out[1, 3:6], params[1, 3:6])


class TestEstimator:
    def test_estimate_cameras_recovers_rotation_pano(self, rng):
        conf, homos, to_pos, from_pos, valid, f, Rs = synth_rotation_pano(
            rng, n=5, noise=0.2
        )
        whs = np.repeat([[640.0, 480.0]], 5, 0)
        cfg = Config(STRAIGHTEN=False)
        cams = estimate_cameras(conf, homos, to_pos, from_pos, valid, whs, cfg)
        assert np.allclose(cams.focal, f, rtol=0.05)
        # relative rotations should match truth; BA camera R (the reference
        # convention, camera.hh) is the transpose of the synth world rotation:
        # H(j->i) = K Ri_ba Rj_ba^T K^-1 = K Ri_world^T Rj_world K^-1
        for i in range(4):
            Rrel_est = cams.R[i] @ cams.R[i + 1].T
            Rrel_gt = Rs[i].T @ Rs[i + 1]
            np.testing.assert_allclose(Rrel_est, Rrel_gt, atol=0.02)


class TestStraighten:
    def test_straighten_fixes_roll(self, rng):
        # cameras yawing about a tilted axis -> straighten should reduce
        # the spread of Y axes
        tilt = np.asarray(rodrigues(jnp.asarray([0.2, 0.0, 0.1])))
        Rs = []
        for y in np.linspace(-0.5, 0.5, 7):
            Ry = np.asarray(rodrigues(jnp.asarray([0.0, y, 0.0])))
            Rs.append(Ry @ tilt)
        cams = CameraSet(
            focal=np.full(7, 500.0), ppx=np.zeros(7), ppy=np.zeros(7),
            R=np.stack(Rs),
        )
        out = straighten(cams)
        # after straightening, camera Y axes (second rows) should be aligned
        y_axes = out.R[:, 1, :]
        spread = np.linalg.norm(y_axes - y_axes.mean(0), axis=1).max()
        y_axes_before = cams.R[:, 1, :]
        spread_before = np.linalg.norm(
            y_axes_before - y_axes_before.mean(0), axis=1
        ).max()
        assert spread < spread_before
        # rotations stay orthonormal
        for R in out.R:
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)


class TestScaledCholSolver:
    def test_matches_direct_f64_solve(self, rng):
        """solve_sym_scaled_chol (the TPU path: Jacobi-scaled f64 Cholesky)
        must agree with jnp.linalg.solve on a realistically-scaled damped
        JtJ."""
        import jax.numpy as jnp

        from openpano_tpu.camera.bundle_adjuster import solve_sym_scaled_chol

        n = 96
        J = rng.normal(size=(400, n))
        # bad scaling like focal^2 vs rotation blocks
        scales = 10.0 ** rng.uniform(-2, 5, n)
        A = (J.T @ J) * scales[:, None] * scales[None, :]
        A += np.diag(np.full(n, 10.0))
        b = rng.normal(size=n) * scales
        x_ref = np.linalg.solve(A, b)
        x = np.asarray(solve_sym_scaled_chol(jnp.asarray(A), jnp.asarray(b)))
        np.testing.assert_allclose(x, x_ref, rtol=1e-9, atol=1e-12)
