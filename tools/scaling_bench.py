#!/usr/bin/env python
"""Scaling-efficiency benchmark over a device mesh.

Runs the sharded pipeline step (features -> matching -> RANSAC -> BA
normal equations -> blended canvas) on 1..N devices of the available
mesh and reports wall time + scaling efficiency per mesh size, plus the
distributed-BA LM iteration rate.  On real hardware N devices ride ICI;
offline it exercises the identical partitioning logic on virtual CPU
devices (JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8).

Usage: python tools/scaling_bench.py [--devices 1 2 4 8] [--images 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--images", type=int, default=16)
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    import jax

    # the dev environment's sitecustomize force-registers the TPU plugin
    # and overrides the JAX_PLATFORMS env var; honor it explicitly so the
    # virtual-device CPU run works as documented
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from openpano_tpu import Config
    from openpano_tpu.parallel.mesh import make_mesh
    from openpano_tpu.parallel.pipeline import sharded_pipeline_step

    navail = len(jax.devices())
    sizes = args.devices or [d for d in (1, 2, 4, 8, 16) if d <= navail]

    cfg = Config(
        SIFT_WORKING_SIZE=64, NUM_OCTAVE=2, NUM_SCALE=4,
        MAX_CAND_PER_OCTAVE=256, MAX_KP_PER_OCTAVE=128,
        MAX_DESC_PER_OCTAVE=128, MAX_KP_PER_IMAGE=256,
        MAX_MATCHES_PER_PAIR=128, RANSAC_ITERATIONS=64,
        OVERLAP_AREA_GRID=16,
    )
    n = args.images
    rng = np.random.default_rng(0)
    base = rng.uniform(size=(96, 96 + 8 * n, 3)).astype(np.float32)
    imgs = np.stack([base[:, 8 * k: 8 * k + 96] for k in range(n)])
    whs = jnp.asarray([[96.0, 96.0]] * n, jnp.float32)
    ii, jj = [], []
    for a in range(n):
        for b in range(a + 1, min(a + 3, n)):
            ii.append(a)
            jj.append(b)
    ii = jnp.asarray(ii, jnp.int32)
    jj = jnp.asarray(jj, jnp.int32)
    key = jax.random.PRNGKey(0)

    results = []
    t1 = None
    for nd in sizes:
        mesh = make_mesh(nd)
        run = lambda: sharded_pipeline_step(
            jnp.asarray(imgs), whs, ii, jj, key, cfg, mesh
        )
        out = run()
        jax.block_until_ready(out["canvas"])  # compile + warm
        ts = []
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            out = run()
            jax.block_until_ready(out["canvas"])
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        if t1 is None:
            t1 = dt
        eff = t1 / (dt * nd)
        results.append({
            "devices": nd, "step_s": round(dt, 4),
            "speedup": round(t1 / dt, 3),
            "efficiency": round(eff, 3),
        })
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"scaling": results}))


if __name__ == "__main__":
    main()
