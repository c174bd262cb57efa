#!/usr/bin/env python
"""Large-canvas scale benchmark: UAV-style translation strip (BASELINE.md
"UAV translation/affine mode with large sharded canvas").

Renders an n-view translating survey over a wide feature-rich scene and
stitches it in TRANS mode (affine RANSAC + homography chaining + flat
projection).  The output canvas grows linearly with n — the scaling
dimension SURVEY §5.7 calls the "sequence length" analog — and the blend
runs banded (streamed single-chip, or column-band sharded over a mesh
with --mesh).

The reference guards canvases at 80000 px / 1e9 px (stitcher_image.cc:105)
— with default settings n=60 lands a ~47k x 500 px (~23 MP) canvas, ~7x
the 38-image headline's; raise --images toward the guard for more.

Usage: python tools/giga_bench.py [--images 60] [--mesh N] [--out pano.jpg]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_strip_views(n: int, w: int, h: int, overlap: float, seed: int = 0):
    """n translated crops from one wide tiled texture (+ jitter)."""
    import numpy as np

    from openpano_tpu.synth import photo_scene

    scene = photo_scene()
    step = int(w * (1 - overlap))
    need_w = w + step * (n - 1) + 32
    reps = -(-need_w // scene.shape[1])
    # crop from the photo's vertical center — the pano's top/bottom rows
    # are mostly cropped-out (black) sentinel regions with no texture
    ymid = scene.shape[0] // 2
    half = min(h // 2 + 32, ymid)
    strip = np.tile(scene[ymid - half : ymid + half], (1, reps, 1))
    rng = np.random.default_rng(seed)
    views = np.empty((n, h, w, 3), np.float32)
    y0 = (strip.shape[0] - h) // 2
    for k in range(n):
        x0 = k * step + int(rng.integers(-8, 9))
        y = y0 + int(rng.integers(-6, 7))
        views[k] = strip[y : y + h, x0 : x0 + w]
    return views


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=60)
    ap.add_argument("--size", type=int, nargs=2, default=(1300, 560),
                    metavar=("W", "H"))
    ap.add_argument("--overlap", type=float, default=0.4)
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard the pipeline over the first N devices")
    ap.add_argument("--working-size", type=int, default=800,
                    help="SIFT_WORKING_SIZE (large-n CPU runs want smaller)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import numpy as np

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from openpano_tpu import Config
    from openpano_tpu.stitch.stitcher import stitch
    from openpano_tpu.utils import timer

    n = args.images
    w, h = args.size
    cfg = Config(
        ESTIMATE_CAMERA=False, TRANS=True, ORDERED_INPUT=True,
        MAX_OUTPUT_SIZE=79000,
        # large-n capacity: ~600 kpts/img at working size 400, so the
        # 2048 cap would spend 4x the pair-distance HBM for nothing
        # (n=500's ring match OOM'd a 16 GB chip at K=2048)
        MAX_KP_PER_IMAGE=1024, MAX_MATCHES_PER_PAIR=512,
        SIFT_WORKING_SIZE=args.working_size,
    )
    views = make_strip_views(n, w, h, args.overlap)
    views8 = np.round(views * 255.0).astype(np.uint8)

    mesh = None
    if args.mesh:
        from openpano_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh)

    run = lambda: stitch(views8, cfg, key=jax.random.PRNGKey(0),
                         output="u8", mesh=mesh)
    out, valid = run()  # compile
    timer.reset()
    t0 = time.time()
    out, valid = run()
    dt = time.time() - t0

    mp = out.shape[0] * out.shape[1] / 1e6
    print(json.dumps({
        "images": n,
        "canvas": [int(out.shape[1]), int(out.shape[0])],
        "megapixels": round(mp, 1),
        "valid_frac": round(float(valid.mean()), 3),
        "wall_s": round(dt, 3),
        "img_per_s": round(n / dt, 2),
        "mpix_per_s": round(mp / dt, 1),
        "mesh": args.mesh or 1,
        "stage_s": {k: round(s, 3) for k, (_, s) in sorted(
            timer.totals().items(), key=lambda kv: -kv[1][1]) if s > 0.01},
    }))
    if args.out:
        from openpano_tpu.io import write_rgb

        write_rgb(args.out, out)
        print(f"# wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
