"""Headline benchmark: end-to-end panorama stitch throughput + the
BASELINE.md metric set.

Workload mirrors the reference's CMU0 headline (38 unordered 1300x867
images, ESTIMATE_CAMERA mode, 51 s on an i7-6700HQ — BASELINE.md).
BENCH_SMALL=1 selects a quicker 13-image 640x480 variant.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
vs_baseline = our img/s divided by the reference's 0.745 img/s headline.
"extra" carries the rest of the BASELINE metric set measured on the same
run: SIFT keypoints/s/chip, BA LM iterations/s, a camera-quality gate
(mean reprojection error vs the synthetic ground truth; the run FAILS if
it exceeds 5 px), per-stage wall times, and peak host RSS.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    from openpano_tpu import Config
    from openpano_tpu.stitch.stitcher import stitch
    from openpano_tpu.synth import gt_pair_homography, photo_scene, render_views
    from openpano_tpu.utils import timer

    full = os.environ.get("BENCH_SMALL", "0") != "1"
    n = 38 if full else 13
    out_w, out_h = (1300, 867) if full else (640, 480)
    # full: a 336-degree sweep with CMU0-like dense overlap (each view keeps
    # ~1.5x source detail; wider sweeps stretch the texture featureless)
    hfov, overlap = (40, 0.8) if full else (30, 0.5)

    cfg = Config(
        ESTIMATE_CAMERA=True, ORDERED_INPUT=False,
        MAX_KP_PER_IMAGE=2048, MAX_MATCHES_PER_PAIR=1024,
    )
    scene = photo_scene()
    views, truth = render_views(
        scene, n, out_w=out_w, out_h=out_h, hfov_deg=hfov,
        overlap=overlap, jitter=0.05, seed=5,
    )
    # shuffle: the benchmark is the unordered all-pairs path
    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    truth = dict(truth, yaws=truth["yaws"][perm])
    # uint8 input / uint8 output: the realistic IO path (JPEGs decode to
    # u8; the write path wants u8) — 4x less host<->device traffic
    views = np.round(views[perm] * 255.0).astype(np.uint8)

    # cold run (compile) then best of three timed warm runs — the tunneled
    # transport's bandwidth swings minute-to-minute; best-of damps that.
    # Each rep perturbs one input pixel: the tunneled backend can elide a
    # byte-identical repeated dispatch (see ARCHITECTURE.md timing notes)
    out, valid = stitch(views, cfg, key=jax.random.PRNGKey(1), output="u8")
    dt = 1e30
    best = None
    for rep in range(3):
        v = views.copy()
        v[0, 0, 0, 0] = rep
        timer.reset()
        info = {}
        t0 = time.time()
        out, valid = stitch(v, cfg, key=jax.random.PRNGKey(1),
                            output="u8", info_out=info)
        t = time.time() - t0
        if t < dt:
            dt = t
            best = (info, timer.totals())

    assert out.shape[0] > 100 and out.shape[1] > out_w, out.shape
    assert valid.mean() > 0.3
    info, stage_totals = best

    # ---- BASELINE metric set (BASELINE.md "Targets for this repo") ----
    # SIFT keypoints/s/chip: keypoints detected / feature-stage seconds
    total_kpts = int(info["kpt_counts"].sum())
    feat_s = sum(s for lbl, (_, s) in stage_totals.items()
                 if lbl in ("upload+calc_feature", "calc_feature"))
    kpts_per_s = total_kpts / feat_s if feat_s > 0 else 0.0
    # BA LM iterations/s across the whole incremental schedule
    lm_iters = info.get("lm_iters", 0)
    lm_s = info.get("lm_time_s", 0.0)
    lm_per_s = lm_iters / lm_s if lm_s > 0 else 0.0

    # ---- quality gate: recovered cameras vs synthetic ground truth ----
    homos = info["homos"]
    # sample the true overlap: pair (i, j) with yaw_j > yaw_i overlaps on
    # j's LEFT region (x_j such that x_i = x_j + f*dyaw stays in-frame)
    gx, gy = np.meshgrid(
        np.linspace(-out_w * 0.45, out_w * 0.05, 9),
        np.linspace(-out_h * 0.4, out_h * 0.4, 7),
    )
    grid = np.stack([gx.ravel(), gy.ravel(), np.ones(gx.size)], 1)
    inv_perm = np.argsort(perm)  # shuffled slot k holds original view perm[k]
    errs = []
    for orig in range(n - 1):  # adjacent-in-sweep pairs overlap the most
        i, j = inv_perm[orig], inv_perm[orig + 1]
        H_est = np.linalg.inv(homos[i]) @ homos[j]
        H_gt = gt_pair_homography(
            {"focal_px": truth["focal_px"],
             "yaws": truth["yaws"]}, i, j, out_w, out_h)
        pe = grid @ H_est.T
        pg = grid @ H_gt.T
        errs.append(np.linalg.norm(
            pe[:, :2] / pe[:, 2:3] - pg[:, :2] / pg[:, 2:3], axis=1).mean())
    reproj = float(np.mean(errs))
    assert reproj < 2.5, f"camera quality gate failed: {reproj:.2f} px"

    stage_s = {lbl: round(s, 3) for lbl, (_, s) in sorted(
        stage_totals.items(), key=lambda kv: -kv[1][1]) if s > 0.005}

    # on-TPU Pallas-vs-XLA-fallback kernel parity (VERDICT r1 #8): asserted
    # per round rather than assumed from the bench having run
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    import tpu_kernel_check

    kernel_parity = tpu_kernel_check.check()
    assert kernel_parity["ok"], kernel_parity

    # ---- roofline accounting (VERDICT r3 #6): which resource bounds each
    # stage — MXU FLOPs, HBM bytes, or tunnel-wire bytes ----
    import roofline

    # match_2nn runs over ALL C(n,2) candidate pairs (the connected-pair
    # compaction happens after it), so all-pairs is the intended model here
    feat_secs = stage_s.get("upload+calc_feature",
                            stage_s.get("calc_feature", 0.0))
    rl = {
        "feature": roofline.relate(
            roofline.feature_stage(n, out_w, out_h, cfg), feat_secs),
        "match_2nn": roofline.relate(
            roofline.match_stage(n * (n - 1) // 2, cfg.MAX_KP_PER_IMAGE,
                                 cfg.DESC_LEN),
            stage_s.get("match_2nn", 0.0)),
        "blend": roofline.relate(
            roofline.blend_stage(int(out.shape[1]), int(out.shape[0])),
            stage_s.get("blend", 0.0)),
    }

    # ---- multiband blender case (VERDICT r3 #7: the BASELINE.md
    # "38-image ... + multiband" config measured in the same artifact) ----
    mb_extra = None
    if os.environ.get("BENCH_SKIP_MULTIBAND", "0") != "1":
        cfg_mb = cfg.replace(MULTIBAND=2)
        stitch(views, cfg_mb, key=jax.random.PRNGKey(1), output="u8")  # compile
        timer.reset()
        t0 = time.time()
        out_mb, valid_mb = stitch(views, cfg_mb, key=jax.random.PRNGKey(1),
                                  output="u8")
        mb_wall = time.time() - t0
        mb_stage = {lbl: round(s, 3) for lbl, (_, s) in timer.totals().items()
                    if lbl.startswith("blend")}
        # content sanity vs the linear blend: same cameras, same canvas —
        # NCC well above 0.98 (seam choice + band smoothing differ)
        a = out.astype(np.float32)[valid & valid_mb]
        b = out_mb.astype(np.float32)[valid & valid_mb]
        a -= a.mean(); b -= b.mean()
        denom = float(np.sqrt((a * a).mean() * (b * b).mean())) or 1.0
        mb_extra = {
            "wall_s": round(mb_wall, 3),
            "img_per_s": round(n / mb_wall, 3),
            "blend_stage_s": mb_stage,
            "ncc_vs_linear": round(float((a * b).mean()) / denom, 4),
            "final_size": [int(out_mb.shape[1]), int(out_mb.shape[0])],
        }
        assert mb_extra["ncc_vs_linear"] > 0.97, mb_extra

    img_per_s = n / dt
    baseline = 38 / 51.0  # reference CMU0 headline (BASELINE.md)
    print(json.dumps({
        "metric": "stitch_images_per_s",
        "value": round(img_per_s, 3),
        "unit": "img/s",
        "vs_baseline": round(img_per_s / baseline, 3),
        "extra": {
            "images": n,
            "wall_s": round(dt, 3),
            "sift_kpts_per_s_per_chip": round(kpts_per_s, 1),
            "total_kpts": total_kpts,
            "ba_lm_iters_per_s": round(lm_per_s, 1),
            "ba_lm_iters": lm_iters,
            "mean_reproj_err_px": round(reproj, 3),
            "final_size": [int(out.shape[1]), int(out.shape[0])],
            "stage_s": stage_s,
            "roofline": rl,
            "multiband": mb_extra,
            "kernel_parity": kernel_parity,
            "peak_rss_mb": round(timer.peak_rss_mb(), 1),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
