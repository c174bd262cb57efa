#!/usr/bin/env python
"""Cross-validation against the REAL reference binary.

Builds nothing itself — expects the reference compiled at
tools/refbuild/src/image-stitching (cmake shim: tools/cmake_shims/, Eigen
from the tensorflow wheel).  Protocol modeled on the reference's own
integration harness (src/run_test.py:20-49):

  1. render a synthetic yaw-sweep dataset (synth.render_views) to PNGs,
  2. run `image-stitching` on them with the stock src/config.cfg,
  3. parse its per-image feature counts (stitcherbase.cc:22) and
     "Final Image Size" line (stitcher_image.cc:124),
  4. run OUR pipeline on the same files with the same config file,
  5. compare: per-image keypoint counts (ratio bound), final canvas size
     (each dimension within ratio 0.8, the run_test.py rule), and our
     recovered cameras' pairwise reprojection error vs the synthetic
     ground truth.

Usage: python tools/ref_parity.py [--views 6] [--size 400 300]
Prints one JSON verdict line; exit code 0 iff all gates pass.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_BINARY = os.path.join(REPO, "tools", "refbuild", "src", "image-stitching")
REF_CONFIG = "/root/reference/src/config.cfg"


def render_dataset(outdir: str, n: int, w: int, h: int, seed: int = 3):
    import numpy as np

    from openpano_tpu.io.image import write_rgb
    from openpano_tpu.synth import photo_scene, render_views

    views, truth = render_views(
        photo_scene(), n, out_w=w, out_h=h, hfov_deg=32, overlap=0.55,
        seed=seed,
    )
    paths = []
    for i in range(n):
        p = os.path.join(outdir, f"v{i:02d}.png")
        write_rgb(p, np.asarray(views[i]))
        paths.append(p)
    return paths, np.asarray(views, np.float32), truth


def run_reference(paths: list[str], workdir: str, timeout: int = 600):
    """Run the reference binary; returns (feat_counts, (w, h), out_jpg)."""
    shutil.copy(REF_CONFIG, os.path.join(workdir, "config.cfg"))
    proc = subprocess.run(
        [REF_BINARY] + [os.path.abspath(p) for p in paths],
        cwd=workdir, capture_output=True, text=True, timeout=timeout,
    )
    out = proc.stdout + proc.stderr
    if proc.returncode != 0:
        raise RuntimeError(f"reference binary failed rc={proc.returncode}:\n{out[-2000:]}")
    counts = {
        int(m.group(1)): int(m.group(2))
        for m in re.finditer(r"Image (\d+) has (\d+) features", out)
    }
    m = re.search(r"Final Image Size: \((\d+), (\d+)\)", out)
    if not m:
        raise RuntimeError(f"no Final Image Size in reference output:\n{out[-2000:]}")
    size = (int(m.group(1)), int(m.group(2)))
    feat_counts = [counts[i] for i in sorted(counts)]
    return feat_counts, size, os.path.join(workdir, "out.jpg")


def image_correlation(path_a: str, img_b) -> float:
    """Normalized cross-correlation of two panoramas after resampling to a
    common grid — a content-level (not just size-level) parity check.
    img_b: uint8 array (our cropped canvas); path_a: the reference's
    out.jpg.  Both canvases cover the same angular range from the same
    input, so a global (unaligned) NCC is meaningful; small sub-percent
    offsets only soften the score."""
    import numpy as np
    from PIL import Image

    def grey(x):
        im = Image.open(x) if isinstance(x, str) \
            else Image.fromarray(np.asarray(x))
        return np.asarray(im.convert("L").resize((512, 128)), np.float32)

    a, b = grey(path_a), grey(img_b)

    def norm(x):
        x = x - x.mean()
        return x / max(float(np.sqrt((x ** 2).mean())), 1e-6)

    return float((norm(a) * norm(b)).mean())


def gt_render(views, truth):
    """Blend the views with the GROUND-TRUTH cameras through our renderer —
    the quality yardstick both pipelines are measured against.

    Rationale: on this synthetic set our recovered cameras are near-exact
    (~0.2 px reprojection) while the reference binary's drift on the far
    images caps ncc(ours, ref) at ~0.6-0.74 even after local alignment —
    measured ncc(ref, gt)=0.63 vs ncc(ours, gt)=0.995.  Gating ours
    against the GT render is therefore both tighter AND fairer than
    gating against the reference's own (noisier) output."""
    import jax.numpy as jnp
    import numpy as np

    from openpano_tpu.ops.imgproc import crop_with_mask
    from openpano_tpu.stitch.render import blend, plan_render
    from openpano_tpu.stitch.stitcher import _f32_to_u8

    n, H, W = views.shape[:3]
    mid = n >> 1
    f = truth["focal_px"]
    K = np.array([[f, 0, 0], [0, f, 0], [0, 0, 1.0]])
    homos = np.zeros((n, 3, 3))
    for i in range(n):
        dyaw = truth["yaws"][i] - truth["yaws"][mid]
        R = np.array([
            [np.cos(dyaw), 0, np.sin(dyaw)],
            [0, 1, 0],
            [-np.sin(dyaw), 0, np.cos(dyaw)],
        ])
        homos[i] = R @ np.linalg.inv(K)
    whs = np.repeat([[float(W), float(H)]], n, 0)
    plan = plan_render(homos, whs, mid, "spherical", 8000)
    canvas = blend(jnp.asarray(views), plan, ordered=False, multiband=0)
    u8, valid = (np.asarray(a) for a in _f32_to_u8(canvas))
    return crop_with_mask(u8, valid)


def run_ours(views, truth, **overrides):
    """Run our pipeline on the same data with the same config file.
    Returns (feat_counts, (w, h), mean reprojection error px,
    cropped canvas uint8).

    ``overrides`` tune our framework-only capacity knobs (keypoint caps
    etc.) — they must not change reference-visible semantics."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from openpano_tpu import Config
    from openpano_tpu.camera.camera import intrinsic
    from openpano_tpu.camera.estimator import estimate_cameras
    from openpano_tpu.stitch.render import plan_render
    from openpano_tpu.stitch.stitcher import build_pairwise_graph
    from openpano_tpu.stitch.stitcherbase import compute_features
    from openpano_tpu.synth import gt_pair_homography

    cfg = Config.from_file(REF_CONFIG, **overrides)
    n, H, W = views.shape[0], views.shape[1], views.shape[2]
    imgs = jnp.asarray(views)
    feats = compute_features(imgs, cfg)
    feat_counts = [int(c) for c in np.asarray(jnp.sum(feats.valid, axis=1))]

    whs = jnp.broadcast_to(jnp.asarray([W, H], jnp.float32), (n, 2))
    graph = build_pairwise_graph(
        feats, whs, cfg, jax.random.PRNGKey(0),
        ordered=cfg.ORDERED_INPUT, affine=cfg.TRANS,
    )
    whs_np = np.repeat([[float(W), float(H)]], n, 0)
    cams = estimate_cameras(
        graph.conf, graph.homo, graph.to_pos, graph.from_pos, graph.valid,
        whs_np, cfg,
    )
    homos = np.zeros((n, 3, 3))
    for i in range(n):
        K = intrinsic(cams.focal[i], cams.ppx[i], cams.ppy[i])
        homos[i] = cams.R[i].T @ np.linalg.inv(K)
    plan = plan_render(homos, whs_np, n >> 1, "spherical", cfg.MAX_OUTPUT_SIZE)

    # reprojection error vs synthetic ground truth: estimated relative
    # homography (j -> i) applied to an overlap grid vs the true one
    errs = []
    # sample the true overlap: pair (i, i+1) with increasing yaw overlaps
    # on the right image's LEFT region
    gx, gy = np.meshgrid(
        np.linspace(-W * 0.45, W * 0.05, 9), np.linspace(-H * 0.4, H * 0.4, 7)
    )
    grid = np.stack([gx.ravel(), gy.ravel(), np.ones(gx.size)], 1)
    for i in range(n - 1):
        j = i + 1
        H_est = np.linalg.inv(homos[i]) @ homos[j]
        H_gt = gt_pair_homography(truth, i, j, W, H)
        pe = grid @ H_est.T
        pg = grid @ H_gt.T
        pe = pe[:, :2] / pe[:, 2:3]
        pg = pg[:, :2] / pg[:, 2:3]
        errs.append(np.linalg.norm(pe - pg, axis=1).mean())

    # the blended + cropped panorama for content-level comparison
    from openpano_tpu.ops.imgproc import crop_with_mask
    from openpano_tpu.stitch.render import blend
    from openpano_tpu.stitch.stitcher import _f32_to_u8

    canvas = blend(imgs, plan, ordered=cfg.ORDERED_INPUT,
                   multiband=cfg.MULTIBAND)
    u8, valid = (np.asarray(a) for a in _f32_to_u8(canvas))
    cropped = crop_with_mask(u8, valid)
    return feat_counts, (plan.out_w, plan.out_h), float(np.mean(errs)), cropped


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--size", type=int, nargs=2, default=(400, 300),
                    metavar=("W", "H"))
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    if not os.path.exists(REF_BINARY):
        print(json.dumps({"ok": False, "error": f"{REF_BINARY} not built"}))
        return 2

    tmp = tempfile.mkdtemp(prefix="refparity_")
    try:
        paths, views, truth = render_dataset(
            tmp, args.views, args.size[0], args.size[1]
        )
        ref_counts, ref_size, ref_jpg = run_reference(paths, tmp)
        our_counts, our_size, reproj, our_canvas = run_ours(views, truth)

        # gates
        def ratio(a, b):
            return min(a, b) / max(a, b) if max(a, b) else 1.0

        size_ok = (ratio(ref_size[0], our_size[0]) > 0.8
                   and ratio(ref_size[1], our_size[1]) > 0.8)
        kp_ratios = [ratio(a, b) for a, b in zip(ref_counts, our_counts)]
        kp_ok = all(r > 0.5 for r in kp_ratios)
        reproj_ok = reproj < 2.5
        ncc = image_correlation(ref_jpg, our_canvas)
        gt = gt_render(views, truth)
        ncc_gt = image_correlation(gt, our_canvas)
        ncc_ref_gt = image_correlation(gt, ref_jpg)
        # ours must match the ground-truth render tightly AND at least as
        # well as the reference's own output does (see gt_render's doc);
        # the raw ours-vs-ref NCC stays as a loose content sanity check
        ncc_ok = (ncc_gt > 0.95 and ncc_gt >= ncc_ref_gt - 0.02
                  and ncc > 0.5)
        verdict = {
            "ok": bool(size_ok and kp_ok and reproj_ok and ncc_ok),
            "ref_final_size": list(ref_size),
            "our_final_size": list(our_size),
            "size_ok": size_ok,
            "ref_kp_counts": ref_counts,
            "our_kp_counts": our_counts,
            "kp_ratio_min": round(min(kp_ratios), 3),
            "kp_ok": kp_ok,
            "mean_reproj_err_px": round(reproj, 3),
            "reproj_ok": reproj_ok,
            "pixel_ncc_vs_ref": round(ncc, 3),
            "pixel_ncc_vs_gt": round(ncc_gt, 3),
            "ref_ncc_vs_gt": round(ncc_ref_gt, 3),
            "ncc_ok": ncc_ok,
        }
        print(json.dumps(verdict))
        return 0 if verdict["ok"] else 1
    finally:
        if args.keep:
            print(f"# kept {tmp}", file=sys.stderr)
        else:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
