"""Round-5 BA sweep: estimate_camera wall vs reprojection accuracy on the
headline workload, per knob combination, one process (warm compiles).

Usage: python tools/sweep_ba_r5.py [variant ...]
Prints one line per variant: name, estimate_camera s, ba_lm totals, reproj.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from openpano_tpu import Config
    from openpano_tpu.stitch.stitcher import stitch
    from openpano_tpu.synth import gt_pair_homography, photo_scene, render_views
    from openpano_tpu.utils import timer

    n, out_w, out_h = 38, 1300, 867
    scene = photo_scene()
    views, truth = render_views(scene, n, out_w=out_w, out_h=out_h,
                                hfov_deg=40, overlap=0.8, jitter=0.05, seed=5)
    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    truth = dict(truth, yaws=truth["yaws"][perm])
    views = np.round(views[perm] * 255.0).astype(np.uint8)
    inv_perm = np.argsort(perm)
    gx, gy = np.meshgrid(np.linspace(-out_w * 0.45, out_w * 0.05, 9),
                         np.linspace(-out_h * 0.4, out_h * 0.4, 7))
    grid = np.stack([gx.ravel(), gy.ravel(), np.ones(gx.size)], 1)

    def reproj_of(homos):
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

    variants = {
        "base_full": ({"BA_INTERMEDIATE_POINT_SLOTS": 0}, {}),
        "cap1": ({"BA_INTERMEDIATE_POINT_SLOTS": 1}, {}),
        "cap2": ({"BA_INTERMEDIATE_POINT_SLOTS": 2}, {}),
        "cap4": ({"BA_INTERMEDIATE_POINT_SLOTS": 4}, {}),
        "cap2_it25": ({"BA_INTERMEDIATE_POINT_SLOTS": 2,
                       "BA_INTERMEDIATE_ITERS": 25}, {}),
        "cap1_it25": ({"BA_INTERMEDIATE_POINT_SLOTS": 1,
                       "BA_INTERMEDIATE_ITERS": 25}, {}),
        "cap2_it15": ({"BA_INTERMEDIATE_POINT_SLOTS": 2,
                       "BA_INTERMEDIATE_ITERS": 15}, {}),
        "cap3": ({"BA_INTERMEDIATE_POINT_SLOTS": 3}, {}),
        "cap2_pat0": ({"BA_INTERMEDIATE_POINT_SLOTS": 2,
                       "BA_INTERMEDIATE_PATIENCE": 0}, {}),
        "cap2_rel01": ({"BA_INTERMEDIATE_POINT_SLOTS": 2,
                        "BA_INTERMEDIATE_REL_TOL": 0.01}, {}),
        "cap2_rel003": ({"BA_INTERMEDIATE_POINT_SLOTS": 2,
                         "BA_INTERMEDIATE_REL_TOL": 0.003}, {}),
        "cap2_it15_adapt": ({"BA_INTERMEDIATE_POINT_SLOTS": 2,
                             "BA_INTERMEDIATE_ITERS": 15,
                             "BA_ADAPTIVE_LM": True}, {}),
        "cap2_it12_adapt": ({"BA_INTERMEDIATE_POINT_SLOTS": 2,
                             "BA_INTERMEDIATE_ITERS": 12,
                             "BA_ADAPTIVE_LM": True}, {}),
        "cap2_it10_adapt": ({"BA_INTERMEDIATE_POINT_SLOTS": 2,
                             "BA_INTERMEDIATE_ITERS": 10,
                             "BA_ADAPTIVE_LM": True}, {}),
        "cap2_it8_adapt": ({"BA_INTERMEDIATE_POINT_SLOTS": 2,
                            "BA_INTERMEDIATE_ITERS": 8,
                            "BA_ADAPTIVE_LM": True}, {}),
        "cap1_it12_adapt": ({"BA_INTERMEDIATE_POINT_SLOTS": 1,
                             "BA_INTERMEDIATE_ITERS": 12,
                             "BA_ADAPTIVE_LM": True}, {}),
        "cap2_it10_adapt_f60": ({"BA_INTERMEDIATE_POINT_SLOTS": 2,
                                 "BA_INTERMEDIATE_ITERS": 10,
                                 "BA_ADAPTIVE_LM": True,
                                 "BA_FINAL_MAX_ITER": 60}, {}),
        "cap2_it8_adapt_pat0": ({"BA_INTERMEDIATE_POINT_SLOTS": 2,
                                 "BA_INTERMEDIATE_ITERS": 8,
                                 "BA_INTERMEDIATE_PATIENCE": 0,
                                 "BA_ADAPTIVE_LM": True}, {}),
        "batch2_it30": ({"BA_BATCH_IMAGES": 2, "BA_INTERMEDIATE_ITERS": 30},
                        {}),
        "batch2_it25": ({"BA_BATCH_IMAGES": 2, "BA_INTERMEDIATE_ITERS": 25},
                        {}),
        "fpat3": ({"BA_FINAL_PATIENCE": 3}, {}),
        "fmax60": ({"BA_FINAL_MAX_ITER": 60}, {}),
        "it15_fpat3": ({"BA_INTERMEDIATE_ITERS": 15, "BA_FINAL_PATIENCE": 3},
                       {}),
        "it25": ({"BA_INTERMEDIATE_ITERS": 25}, {}),
        "cap1_it10_adapt": ({"BA_INTERMEDIATE_POINT_SLOTS": 1,
                             "BA_INTERMEDIATE_ITERS": 10,
                             "BA_ADAPTIVE_LM": True}, {}),
        "cap1_it8_adapt": ({"BA_INTERMEDIATE_POINT_SLOTS": 1,
                            "BA_INTERMEDIATE_ITERS": 8,
                            "BA_ADAPTIVE_LM": True}, {}),
        "cap2_it9_adapt": ({"BA_INTERMEDIATE_POINT_SLOTS": 2,
                            "BA_INTERMEDIATE_ITERS": 9,
                            "BA_ADAPTIVE_LM": True}, {}),
        "cap1_it9_adapt": ({"BA_INTERMEDIATE_POINT_SLOTS": 1,
                            "BA_INTERMEDIATE_ITERS": 9,
                            "BA_ADAPTIVE_LM": True}, {}),
    }
    names = sys.argv[1:] or list(variants)
    for name in names:
        over, env = variants[name]
        cfg = Config(ESTIMATE_CAMERA=True, ORDERED_INPUT=False,
                     MAX_KP_PER_IMAGE=2048, MAX_MATCHES_PER_PAIR=1024,
                     **over)
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            best = None
            for rep in range(3):
                v = views.copy()
                v[0, 0, 0, 0] = rep
                timer.reset()
                info = {}
                t0 = time.time()
                stitch(v, cfg, key=jax.random.PRNGKey(1), output="u8",
                       info_out=info)
                wall = time.time() - t0
                tot = timer.totals()
                ec = tot.get("estimate_camera", (0, 0.0))[1]
                if best is None or ec < best[0]:
                    best = (ec, wall, info, {
                        k: round(s, 3) for k, (_, s) in tot.items()
                        if k.startswith("ba_lm")})
            ec, wall, info, lm = best
            print(f"{name:14s} ec={ec:.3f}s wall={wall:.3f}s "
                  f"iters={info.get('lm_iters', '?')} "
                  f"reproj={reproj_of(info['homos']):.3f}px lm={lm}",
                  flush=True)
        finally:
            for k, v0 in old.items():
                if v0 is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v0


if __name__ == "__main__":
    main()
