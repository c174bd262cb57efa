"""Headline benchmark: end-to-end panorama stitch throughput.

Workload mirrors the reference's CMU0 headline (38 unordered 1300x867
images, ESTIMATE_CAMERA mode, 51 s on an i7-6700HQ — BASELINE.md).
BENCH_SMALL=1 selects a quicker 13-image 640x480 variant.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = our img/s divided by the reference's 0.745 img/s headline.
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
    from openpano_tpu.synth import photo_scene, render_views

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
    views, _ = render_views(
        scene, n, out_w=out_w, out_h=out_h, hfov_deg=hfov,
        overlap=overlap, jitter=0.05, seed=5,
    )
    # shuffle: the benchmark is the unordered all-pairs path
    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    # uint8 input / uint8 output: the realistic IO path (JPEGs decode to
    # u8; the write path wants u8) — 4x less host<->device traffic
    views = np.round(views[perm] * 255.0).astype(np.uint8)

    # cold run (compile) then best of two timed warm runs — the tunneled
    # transport's bandwidth swings minute-to-minute; best-of damps that
    out, valid = stitch(views, cfg, key=jax.random.PRNGKey(1), output="u8")
    dt = 1e30
    for _ in range(2):
        t0 = time.time()
        out, valid = stitch(views, cfg, key=jax.random.PRNGKey(1), output="u8")
        dt = min(dt, time.time() - t0)

    assert out.shape[0] > 100 and out.shape[1] > out_w, out.shape
    assert valid.mean() > 0.3
    img_per_s = n / dt
    baseline = 38 / 51.0  # reference CMU0 headline (BASELINE.md)
    print(json.dumps({
        "metric": "stitch_images_per_s",
        "value": round(img_per_s, 3),
        "unit": "img/s",
        "vs_baseline": round(img_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
