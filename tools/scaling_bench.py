#!/usr/bin/env python
"""Scaling-efficiency benchmark over a device mesh.

Runs the REAL sharded pipeline (stitch_sharded: SIFT -> matching ->
RANSAC -> incremental LM BA -> planned sharded blend) on 1..N devices and
reports wall time + scaling efficiency per mesh size.  On real hardware N
devices ride ICI; offline it exercises the identical partitioning logic on
virtual CPU devices (JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8).

Usage: python tools/scaling_bench.py [--devices 1 2 4 8] [--images 8]
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
    ap.add_argument("--images", type=int, default=8)
    ap.add_argument("--size", type=int, nargs=2, default=(320, 240),
                    metavar=("W", "H"))
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    import jax

    # the dev environment's sitecustomize force-registers the TPU plugin
    # and overrides the JAX_PLATFORMS env var; honor it explicitly so the
    # virtual-device CPU run works as documented
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from openpano_tpu import Config
    from openpano_tpu.parallel.mesh import make_mesh
    from openpano_tpu.parallel.pipeline import stitch_sharded
    from openpano_tpu.synth import photo_scene, render_views

    navail = len(jax.devices())
    sizes = args.devices or [d for d in (1, 2, 4, 8, 16) if d <= navail]

    cfg = Config(
        ESTIMATE_CAMERA=True, ORDERED_INPUT=False,
        RANSAC_ITERATIONS=400, SIFT_WORKING_SIZE=300,
        MAX_CAND_PER_OCTAVE=1024, MAX_KP_PER_OCTAVE=512,
        MAX_DESC_PER_OCTAVE=512, MAX_KP_PER_IMAGE=1024,
        MAX_MATCHES_PER_PAIR=512,
    )
    w, h = args.size
    views, _ = render_views(
        photo_scene(), args.images, out_w=w, out_h=h, hfov_deg=30,
        overlap=0.6, seed=3,
    )
    views = np.asarray(views, np.float32)
    key = jax.random.PRNGKey(0)

    results = []
    t1 = None
    for nd in sizes:
        mesh = make_mesh(nd)
        run = lambda: stitch_sharded(views, cfg, mesh, key=key)
        canvas = run()  # compile + warm
        ts = []
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            canvas = run()
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        if t1 is None:
            t1 = dt
        eff = t1 / (dt * nd)
        results.append({
            "devices": nd, "step_s": round(dt, 4),
            "speedup": round(t1 / dt, 3),
            "efficiency": round(eff, 3),
            "canvas": list(canvas.shape[:2]),
        })
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"scaling": results}))


if __name__ == "__main__":
    main()
