"""Cyclic block-tridiagonal solver vs dense reference (camera/banded.py)."""

import numpy as np
import pytest

from openpano_tpu.camera import banded

import jax.numpy as jnp


def _random_chain_system(n, rng, wrap=True):
    """Random SPD-ish damped chain system in dense + banded forms."""
    D = rng.normal(size=(n, 6, 6))
    D = D @ np.swapaxes(D, 1, 2) + 20.0 * np.eye(6)  # damped diagonal
    U = rng.normal(size=(n, 6, 6)) * 0.5
    U[n - 1] = 0.0
    C = rng.normal(size=(6, 6)) * 0.5 if wrap else None
    A = np.zeros((6 * n, 6 * n))
    for i in range(n):
        A[6 * i:6 * i + 6, 6 * i:6 * i + 6] = D[i]
    for i in range(n - 1):
        A[6 * i:6 * i + 6, 6 * (i + 1):6 * (i + 1) + 6] = U[i]
        A[6 * (i + 1):6 * (i + 1) + 6, 6 * i:6 * i + 6] = U[i].T
    if wrap:
        A[0:6, 6 * (n - 1):] = C
        A[6 * (n - 1):, 0:6] = C.T
    b = rng.normal(size=(n, 6))
    return D, U, C, A, b


class TestCyclicThomas:
    @pytest.mark.parametrize("n,wrap", [(3, False), (5, False), (8, True),
                                        (40, True), (40, False)])
    def test_matches_dense(self, n, wrap):
        rng = np.random.default_rng(n * 10 + wrap)
        D, U, C, A, b = _random_chain_system(n, rng, wrap)
        x_dense = np.linalg.solve(A, b.reshape(-1)).reshape(n, 6)
        x = np.asarray(banded.solve_block_cyclic(
            jnp.asarray(D), jnp.asarray(U),
            jnp.asarray(C) if C is not None else None, jnp.asarray(b)))
        np.testing.assert_allclose(x, x_dense, rtol=1e-9, atol=1e-9)

    def test_assemble_banded_matches_dense_scatter(self):
        """assemble_banded on a ring pair set == the dense scatter-add."""
        rng = np.random.default_rng(3)
        n, P = 7, 14  # two slots per ring edge
        F = np.array([i % n for i in range(P)], np.int32)
        Tc = np.array([(i + 1) % n for i in range(P)], np.int32)
        Bp = rng.normal(size=(P, 12, 12))
        Bp = Bp + np.swapaxes(Bp, 1, 2)  # symmetric blocks
        bp = rng.normal(size=(P, 12))
        D, U, C, rhs = (np.asarray(z) for z in banded.assemble_banded(
            jnp.asarray(Bp), jnp.asarray(bp), jnp.asarray(F),
            jnp.asarray(Tc), n))
        A = np.zeros((6 * n, 6 * n))
        r = np.zeros(6 * n)
        for p in range(P):
            rows = np.concatenate([np.arange(6) + 6 * F[p],
                                   np.arange(6) + 6 * Tc[p]])
            A[np.ix_(rows, rows)] += Bp[p]
            r[rows] += bp[p]
        for i in range(n):
            np.testing.assert_allclose(D[i], A[6*i:6*i+6, 6*i:6*i+6],
                                       atol=1e-12)
        for i in range(n - 1):
            np.testing.assert_allclose(U[i], A[6*i:6*i+6, 6*(i+1):6*(i+1)+6],
                                       atol=1e-12)
        np.testing.assert_allclose(C, A[0:6, 6*(n-1):], atol=1e-12)
        np.testing.assert_allclose(rhs.reshape(-1), r, atol=1e-12)

    def test_chain_structure_check(self):
        assert banded.is_chain_structure(
            np.array([0, 1, 2, 0]), np.array([1, 2, 3, 3]), 4)
        assert not banded.is_chain_structure(
            np.array([0, 1, 0]), np.array([1, 2, 2]), 4)


class TestBandedLM:
    def test_lm_banded_equals_dense(self):
        """ba_optimize_pairs(banded=True) == banded=False on a ring
        problem, to f64 tightness (same iterations, same params)."""
        import jax.numpy as jnp
        from openpano_tpu.camera.bundle_adjuster import (
            BAPairProblem, ba_optimize_pairs,
        )

        rng = np.random.default_rng(7)
        n, M = 6, 24
        f = 400.0
        yaws = np.arange(n) * 0.08
        # ring pairs (i, i+1) + wrap (0, n-1)
        cam_to = np.array([i for i in range(n)], np.int32)
        cam_from = np.array([(i + 1) % n for i in range(n)], np.int32)
        pts3 = rng.normal(size=(n * M, 3)) + [0, 0, 5]

        def project(yaw, X):
            c, s = np.cos(yaw), np.sin(yaw)
            R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
            x = X @ R.T
            return f * x[:, :2] / x[:, 2:3]

        pt_to = np.zeros((n, M, 2))
        pt_from = np.zeros((n, M, 2))
        for p in range(n):
            X = pts3[p * M:(p + 1) * M]
            pt_to[p] = project(yaws[cam_to[p]], X)
            pt_from[p] = project(yaws[cam_from[p]], X)
        prob = BAPairProblem(
            pt_to=jnp.asarray(pt_to), pt_from=jnp.asarray(pt_from),
            w=jnp.asarray(np.ones((n, M))),
            cam_to=jnp.asarray(cam_to), cam_from=jnp.asarray(cam_from),
            swapped=jnp.asarray(np.zeros(n, bool)),
            pair_w=jnp.asarray(np.ones(n)),
        )
        params0 = np.zeros((n, 6))
        params0[:, 0] = f * 1.08
        params0[:, 3:6] = rng.normal(scale=1e-3, size=(n, 3))
        outs = {}
        for banded in (False, True):
            out, it = ba_optimize_pairs(
                jnp.asarray(params0), prob, jnp.asarray(0), n, 5.0,
                return_iters=True, max_iter=25, banded=banded)
            outs[banded] = (np.asarray(out), int(it))
        assert outs[True][1] == outs[False][1]
        np.testing.assert_allclose(outs[True][0], outs[False][0],
                                   rtol=0, atol=1e-8)
