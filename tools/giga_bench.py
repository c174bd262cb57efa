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
    ap.add_argument("--working-size", type=int, default=640,
                    help="SIFT_WORKING_SIZE (large-n runs want smaller)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--mode", choices=("trans", "rot", "trans2d"),
                    default="trans")
    ap.add_argument("--grid", type=int, nargs=2, default=(62, 8),
                    metavar=("COLS", "ROWS"), help="rot mode: yaw x pitch")
    ap.add_argument("--focal", type=float, default=12000.0)
    ap.add_argument("--pitch-px", type=float, default=770.0,
                    help="rot mode: vertical canvas step per pitch row")
    ap.add_argument("--no-cache", action="store_true")
    ap.add_argument("--multipass", type=int, default=1,
                    help="rot mode: MULTIPASS_BA level (1 = incremental; "
                         "the banded chain solver keeps n~500 tractable)")
    args = ap.parse_args()
    if args.mode == "trans2d":
        if tuple(args.size) == (1300, 560):
            args.size = (2000, 1200)
        if tuple(args.grid) == (62, 8):
            args.grid = (25, 20)
        run_trans2d(args)
        return
    if args.mode == "rot":
        if tuple(args.size) == (1300, 560):
            args.size = (2200, 1400)   # rot default: narrow-fov tall views
        run_rot(args)
        return

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




def run_rot(args) -> None:
    """Rotational 2-D gigapixel config (BASELINE.md "500-image gigapixel
    pano with ... BA"): a yaw x pitch serpentine grid of ~500 narrow-fov
    views rendered from an equirectangular synthetic scene, stitched in
    ESTIMATE_CAMERA mode (ring matching, MULTIPASS_BA=0 global BA — the
    banded chain solver makes the n~500 LM tractable, camera/banded.py),
    blended beyond-HBM (host band stream, coded wire both directions).

    Canvas: ~2*pi*f x vertical-span px — f=12000 lands ~75k x ~6.8k
    (~510 Mpx) against the reference's 80000 px / 1e9 px guards
    (stitcher_image.cc:105-106)."""
    import jax
    import numpy as np

    from openpano_tpu import Config
    from openpano_tpu.stitch.stitcher import stitch
    from openpano_tpu.synth import (
        gt_rot_pair_homography,
        procedural_scene_large,
        render_views_sphere,
        serpentine_rotations,
    )
    from openpano_tpu.utils import timer

    cols, rows = args.grid
    n = cols * rows
    w, h = args.size
    f = args.focal
    yaw_step = 2 * np.pi / cols            # full-circle wrap
    pitch_step = args.pitch_px / f
    cache = f"/tmp/giga_rot_views_{cols}x{rows}_{w}x{h}_{f}.npy"
    if os.path.exists(cache) and not args.no_cache:
        views8 = np.load(cache, mmap_mode="r")
        views8 = np.ascontiguousarray(views8)
        Rs, _ = serpentine_rotations(cols, rows, yaw_step, pitch_step)
        print(f"# views from cache {cache}", file=sys.stderr)
    else:
        t0 = time.time()
        phi_need = (rows / 2) * pitch_step + np.arctan((h / 2) / f) + 0.03
        # scene at HALF the view angular resolution: the SIFT working
        # resize (~2.25x down) sits below even the halved Nyquist, and
        # the 625-Mpx full-res scene build alone took 47 min (measured)
        we = int(np.pi * f) // 2 * 2
        he = int(we * (2 * phi_need) / (2 * np.pi)) // 2 * 2
        print(f"# scene {he}x{we} ...", file=sys.stderr)
        scene = procedural_scene_large(he, we, seed=11)
        print(f"# scene built in {time.time()-t0:.0f}s; rendering {n} views",
              file=sys.stderr)
        Rs, _ = serpentine_rotations(cols, rows, yaw_step, pitch_step)
        views8 = render_views_sphere(scene, Rs, w, h, f)
        del scene
        if not args.no_cache:
            np.save(cache, views8)
        print(f"# views ready in {time.time()-t0:.0f}s", file=sys.stderr)

    # keypoint capacity: the corner-dense synthetic needs headroom or the
    # per-octave caps truncate candidates in scan order and every view
    # keeps only top-of-image keypoints (vertical grid pairs then cannot
    # match — measured: y_max 491 of 1400 at cap 1024, 8 raw matches)
    cfg = Config(
        ESTIMATE_CAMERA=True, ORDERED_INPUT=True,
        MULTIPASS_BA=args.multipass,
        MAX_OUTPUT_SIZE=79000,
        MAX_KP_PER_IMAGE=2048, MAX_MATCHES_PER_PAIR=512,
        MAX_CAND_PER_OCTAVE=4096, MAX_KP_PER_OCTAVE=2048,
        MAX_DESC_PER_OCTAVE=2048,
        SIFT_WORKING_SIZE=args.working_size,
    )
    mesh = None
    if args.mesh:
        from openpano_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh)

    timer.reset()
    info = {}
    t0 = time.time()
    out, valid = stitch(views8, cfg, key=jax.random.PRNGKey(0),
                        output="u8", mesh=mesh, info_out=info)
    dt = time.time() - t0

    # camera sanity vs ground truth on consecutive pairs
    homos = info.get("homos")
    errs = []
    if homos is not None:
        gx, gy = np.meshgrid(np.linspace(-w * 0.4, w * 0.4, 7),
                             np.linspace(-h * 0.4, h * 0.4, 5))
        grid = np.stack([gx.ravel(), gy.ravel(), np.ones(gx.size)], 1)
        for i in range(n - 1):
            H_est = np.linalg.inv(homos[i]) @ homos[i + 1]
            H_gt = gt_rot_pair_homography(f, Rs[i], Rs[i + 1])
            pe = grid @ H_est.T
            pg = grid @ H_gt.T
            errs.append(np.linalg.norm(
                pe[:, :2] / pe[:, 2:3] - pg[:, :2] / pg[:, 2:3],
                axis=1).mean())
    mp = out.shape[0] * out.shape[1] / 1e6
    import resource

    print(json.dumps({
        "mode": "rot-gigapixel",
        "images": n,
        "grid": [cols, rows],
        "canvas": [int(out.shape[1]), int(out.shape[0])],
        "megapixels": round(mp, 1),
        "valid_megapixels": round(mp * float(valid.mean()), 1),
        "valid_frac": round(float(valid.mean()), 3),
        "wall_s": round(dt, 3),
        "img_per_s": round(n / dt, 2),
        "mean_reproj_err_px": round(float(np.mean(errs)), 3) if errs else None,
        "lm_iters": info.get("lm_iters"),
        "mesh": args.mesh or 1,
        "peak_host_rss_gb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
        "stage_s": {k: round(s, 3) for k, (_, s) in sorted(
            timer.totals().items(), key=lambda kv: -kv[1][1]) if s > 0.01},
    }))
    if args.out:
        from openpano_tpu.io import write_rgb

        write_rgb(args.out, out[::8, ::8])
        print(f"# wrote {args.out} (1/8 scale)", file=sys.stderr)


def run_trans2d(args) -> None:
    """2-D UAV-style survey at true gigapixel-class scale: a serpentine
    COLS x ROWS grid of translated crops from one large flat texture,
    stitched in TRANS mode (affine RANSAC + homography chaining — the
    reference's UAV/translation configuration, BASELINE.md).  Unlike the
    rotational config, the canvas is not capped at 2*pi*f, so ~500 views
    of 2.4 Mpx at 35% overlap blend a >500 Mpx, >90%-valid canvas with
    band-bounded device memory (beyond-HBM host stream, coded wire)."""
    import jax
    import numpy as np

    from openpano_tpu import Config
    from openpano_tpu.stitch.stitcher import stitch
    from openpano_tpu.synth import procedural_scene_large
    from openpano_tpu.utils import timer

    cols, rows = args.grid
    n = cols * rows
    w, h = args.size
    ov = args.overlap
    sx = int(w * (1 - ov))
    sy = int(h * (1 - ov))
    rng = np.random.default_rng(3)
    cache = f"/tmp/giga_t2d_{cols}x{rows}_{w}x{h}_{ov}.npy"
    if os.path.exists(cache) and not args.no_cache:
        views8 = np.ascontiguousarray(np.load(cache, mmap_mode="r"))
    else:
        t0 = time.time()
        th = (rows - 1) * sy + h + 64
        tw = (cols - 1) * sx + w + 64
        print(f"# texture {th}x{tw} ...", file=sys.stderr)
        tex = np.round(
            procedural_scene_large(th, tw, seed=13) * 255).astype(np.uint8)
        views8 = np.empty((n, h, w, 3), np.uint8)
        k = 0
        for r in range(rows):
            cs = range(cols) if r % 2 == 0 else range(cols - 1, -1, -1)
            for c in cs:
                x0 = c * sx + int(rng.integers(0, 33))
                y0 = r * sy + int(rng.integers(0, 33))
                views8[k] = tex[y0:y0 + h, x0:x0 + w]
                k += 1
        del tex
        if not args.no_cache:
            np.save(cache, views8)
        print(f"# views ready in {time.time()-t0:.0f}s", file=sys.stderr)

    cfg = Config(
        ESTIMATE_CAMERA=False, TRANS=True, ORDERED_INPUT=True,
        MAX_OUTPUT_SIZE=79000,
        MAX_KP_PER_IMAGE=2048, MAX_MATCHES_PER_PAIR=512,
        MAX_CAND_PER_OCTAVE=4096, MAX_KP_PER_OCTAVE=2048,
        MAX_DESC_PER_OCTAVE=2048,
        SIFT_WORKING_SIZE=args.working_size,
    )
    timer.reset()
    t0 = time.time()
    out, valid = stitch(views8, cfg, key=jax.random.PRNGKey(0), output="u8")
    dt = time.time() - t0
    mp = out.shape[0] * out.shape[1] / 1e6
    import resource

    print(json.dumps({
        "mode": "trans2d-gigapixel",
        "images": n,
        "grid": [cols, rows],
        "canvas": [int(out.shape[1]), int(out.shape[0])],
        "megapixels": round(mp, 1),
        "valid_megapixels": round(mp * float(valid.mean()), 1),
        "valid_frac": round(float(valid.mean()), 3),
        "wall_s": round(dt, 3),
        "img_per_s": round(n / dt, 2),
        "peak_host_rss_gb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
        "stage_s": {k: round(s, 3) for k, (_, s) in sorted(
            timer.totals().items(), key=lambda kv: -kv[1][1]) if s > 0.01},
    }))
if __name__ == "__main__":
    main()
