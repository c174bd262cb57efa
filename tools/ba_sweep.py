#!/usr/bin/env python
"""BA schedule quality/time sweep (VERDICT r2 item 5).

Builds the headline workload's match graph ONCE (features + matching on
the default backend), then re-runs estimate_cameras under different
schedules — intermediate iteration caps, activation batching, f32 normal
equations — measuring wall time, total LM iterations, and mean
reprojection error vs the synthetic ground truth.

Usage: python tools/ba_sweep.py [--small]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import jax
    import numpy as np

    from openpano_tpu import Config
    from openpano_tpu.camera.camera import intrinsic
    from openpano_tpu.camera.estimator import estimate_cameras
    from openpano_tpu.stitch.stitcher import build_pairwise_graph
    from openpano_tpu.stitch.stitcherbase import upload_and_compute_features
    from openpano_tpu.synth import gt_pair_homography, photo_scene, render_views

    n = 13 if args.small else 38
    out_w, out_h = (640, 480) if args.small else (1300, 867)
    hfov, overlap = (30, 0.5) if args.small else (40, 0.8)
    cfg = Config(ESTIMATE_CAMERA=True, ORDERED_INPUT=False,
                 MAX_KP_PER_IMAGE=2048, MAX_MATCHES_PER_PAIR=1024)
    views, truth = render_views(
        photo_scene(), n, out_w=out_w, out_h=out_h, hfov_deg=hfov,
        overlap=overlap, jitter=0.05, seed=5,
    )
    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    truth = dict(truth, yaws=truth["yaws"][perm])
    views = np.round(views[perm] * 255.0).astype(np.uint8)

    import jax.numpy as jnp

    _, feats = upload_and_compute_features(views, cfg)
    whs_np = np.repeat([[float(out_w), float(out_h)]], n, 0)
    graph = build_pairwise_graph(
        feats, jnp.asarray(whs_np, jnp.float32), cfg,
        jax.random.PRNGKey(1), ordered=False, affine=False,
    )
    print(f"# graph ready: {int((graph.conf > 0).sum() // 2)} connected "
          f"pairs", file=sys.stderr)

    inv_perm = np.argsort(perm)
    gx, gy = np.meshgrid(
        np.linspace(-out_w * 0.45, out_w * 0.05, 9),
        np.linspace(-out_h * 0.4, out_h * 0.4, 7),
    )
    grid = np.stack([gx.ravel(), gy.ravel(), np.ones(gx.size)], 1)

    def reproj_of(cams):
        homos = np.zeros((n, 3, 3))
        for i in range(n):
            K = intrinsic(cams.focal[i], cams.ppx[i], cams.ppy[i])
            homos[i] = cams.R[i].T @ np.linalg.inv(K)
        errs = []
        for orig in range(n - 1):
            i, j = inv_perm[orig], inv_perm[orig + 1]
            H_est = np.linalg.inv(homos[i]) @ homos[j]
            H_gt = gt_pair_homography(
                {"focal_px": truth["focal_px"], "yaws": truth["yaws"]},
                i, j, out_w, out_h)
            pe = grid @ H_est.T
            pg = grid @ H_gt.T
            errs.append(np.linalg.norm(
                pe[:, :2] / pe[:, 2:3] - pg[:, :2] / pg[:, 2:3],
                axis=1).mean())
        return float(np.mean(errs))

    sweeps = [
        dict(BA_INTERMEDIATE_ITERS=8, BA_BATCH_IMAGES=1),
        dict(BA_INTERMEDIATE_ITERS=10, BA_BATCH_IMAGES=1),
        dict(BA_INTERMEDIATE_ITERS=12, BA_BATCH_IMAGES=1),
        dict(BA_INTERMEDIATE_ITERS=15, BA_BATCH_IMAGES=1),
        dict(BA_INTERMEDIATE_ITERS=8, BA_BATCH_IMAGES=2),
        dict(BA_INTERMEDIATE_ITERS=8, BA_BATCH_IMAGES=4),
        dict(BA_INTERMEDIATE_ITERS=15, BA_BATCH_IMAGES=2),
        dict(BA_INTERMEDIATE_ITERS=15, BA_BATCH_IMAGES=4),
    ]
    for over in sweeps:
        c = cfg.replace(**over)
        stats = {}
        # warm (compile) then timed
        estimate_cameras(graph.conf, graph.homo, graph.to_pos,
                         graph.from_pos, graph.valid, whs_np, c,
                         stats=stats)
        stats = {}
        t0 = time.perf_counter()
        cams = estimate_cameras(graph.conf, graph.homo, graph.to_pos,
                                graph.from_pos, graph.valid, whs_np, c,
                                stats=stats)
        dt = time.perf_counter() - t0
        print(json.dumps({
            **over,
            "wall_s": round(dt, 3),
            "lm_iters": stats.get("lm_iters", 0),
            "ba_rms_px": round(stats.get("ba_rms_px", -1), 3),
            "reproj_px": round(reproj_of(cams), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
