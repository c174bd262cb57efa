#!/usr/bin/env python
"""Multi-process worker for the 2-process distributed-BA test.

Launched by tests/test_multiprocess.py (and usable standalone):

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    python tools/mp_worker.py <coordinator host:port> <nproc> <pid>

Each process owns 4 virtual CPU devices; after jax.distributed.initialize
the global mesh spans 8 devices across both processes.  Runs the REAL
pair-sharded LM bundle adjustment (parallel/dist_ba.py) on a deterministic
synthetic rotation pano — JtJ/Jtb psums cross the process boundary — and
prints the optimized camera parameters' checksum for the parent to compare
against its single-process run.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_problem(n: int | None = None):
    """Deterministic ring BA problem (shared with the parent test).
    ``n`` (or $OPENPANO_MP_N) scales the camera count — n=500 exercises
    the BASELINE.md "500-image ... distributed BA across >= 2 hosts"
    configuration: ring pairs at P=n-1 slots, psum'd JtJ, and the banded
    chain solver in place of the dense 6n^3 factorization."""
    import numpy as np

    if n is None:
        n = int(os.environ.get("OPENPANO_MP_N", "6"))
    M, f = 64, 500.0
    rng = np.random.default_rng(7)

    def rot(th):
        return np.array([
            [np.cos(th), 0, np.sin(th)], [0, 1, 0],
            [-np.sin(th), 0, np.cos(th)],
        ])

    step = min(0.3, 2 * np.pi / max(n, 12) * 0.9)
    Rs = [rot(step * (i - n / 2)) for i in range(n)]
    K = np.diag([f, f, 1.0])
    pairs = [(i, i + 1) for i in range(n - 1)]
    P = len(pairs)
    pt_to = np.zeros((P, M, 2))
    pt_from = np.zeros((P, M, 2))
    w = np.ones((P, M))
    for s, (i, j) in enumerate(pairs):
        Hij = K @ Rs[i] @ Rs[j].T @ np.linalg.inv(K)
        p_j = rng.uniform(-200, 200, size=(M, 2))
        hp = np.concatenate([p_j, np.ones((M, 1))], 1) @ Hij.T
        pt_to[s] = hp[:, :2] / hp[:, 2:3]
        pt_from[s] = p_j
    params = np.zeros((n, 6))
    params[:, 0] = f * 1.08
    from openpano_tpu.camera.estimator import _np_unrod

    for i in range(n):
        params[i, 3:6] = _np_unrod(Rs[i])
    # perturb rotations so the LM has real correction work (pure-focal
    # error at tiny ring baselines sits below the 1e-3 acceptance rule)
    params[:, 3:6] += rng.normal(scale=2e-3, size=(n, 3))
    params[0, 3:6] = _np_unrod(Rs[0])   # identity camera stays frozen
    return n, pairs, params, pt_to, pt_from, w


def solve(mesh, n: int | None = None):
    import jax.numpy as jnp

    from openpano_tpu.camera.bundle_adjuster import BAPairProblem
    from openpano_tpu.parallel.dist_ba import ba_optimize_pairs_sharded

    n, pairs, params, pt_to, pt_from, w = build_problem(n)
    prob = BAPairProblem(
        pt_to=jnp.asarray(pt_to), pt_from=jnp.asarray(pt_from),
        w=jnp.asarray(w),
        cam_to=jnp.asarray([p[0] for p in pairs], jnp.int32),
        cam_from=jnp.asarray([p[1] for p in pairs], jnp.int32),
        swapped=jnp.zeros(len(pairs), bool),
        pair_w=jnp.ones(len(pairs)),
    )
    return ba_optimize_pairs_sharded(params, prob, 0, n, 5.0, mesh,
                                     banded=n >= 100)


def main():
    coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    import jax

    jax.config.update("jax_platforms", "cpu")
    from openpano_tpu.parallel.mesh import init_distributed, make_mesh

    init_distributed(coordinator, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    ndev = len(jax.devices())
    import numpy as np

    mesh = make_mesh()
    import time

    t0 = time.perf_counter()
    out = np.asarray(solve(mesh))  # replicated -> addressable everywhere
    dt = time.perf_counter() - t0
    # initial vs final weighted RMS: evidence the distributed LM optimized
    import jax.numpy as jnp

    from openpano_tpu.camera.bundle_adjuster import (
        BAPairProblem, _pairs_residuals,
    )

    n, pairs, params0, pt_to, pt_from, w = build_problem()
    prob = BAPairProblem(
        pt_to=jnp.asarray(pt_to), pt_from=jnp.asarray(pt_from),
        w=jnp.asarray(w),
        cam_to=jnp.asarray([q[0] for q in pairs], jnp.int32),
        cam_from=jnp.asarray([q[1] for q in pairs], jnp.int32),
        swapped=jnp.zeros(len(pairs), bool),
        pair_w=jnp.ones(len(pairs)),
    )

    def rms(pp):
        r, wm = _pairs_residuals(jnp.asarray(pp), prob)
        npts = float(np.asarray((wm > 0).sum())) * 2.0
        return float(np.sqrt(np.asarray((r * r)).sum() / max(npts, 1.0)))

    print(f"MPRESULT pid={pid} ndev={ndev} "
          f"sum={out.sum():.12e} focal0={out[0, 0]:.9f} "
          f"wall={dt:.3f} focal_mean={out[:, 0].mean():.4f} "
          f"rms0={rms(params0):.4f} rms1={rms(out):.4f}", flush=True)


if __name__ == "__main__":
    main()
