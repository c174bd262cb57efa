"""Per-stage timing breakdown of the headline bench workload.

Runs the same workload as bench.py (cold + warm) and prints the
accumulated total_timer report for the warm run.

Usage: python tools/profile_stitch.py [n_images]
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
    from openpano_tpu.synth import photo_scene, render_views
    from openpano_tpu.utils import timer

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 38
    out_w, out_h = 1300, 867
    hfov, overlap = 40, 0.8

    cfg = Config(
        ESTIMATE_CAMERA=True, ORDERED_INPUT=False,
        MAX_KP_PER_IMAGE=2048, MAX_MATCHES_PER_PAIR=1024,
    )
    scene = photo_scene()
    views, _ = render_views(
        scene, n, out_w=out_w, out_h=out_h, hfov_deg=hfov,
        overlap=overlap, jitter=0.05, seed=5,
    )
    rng = np.random.default_rng(0)
    views = np.round(views[rng.permutation(n)] * 255.0).astype(np.uint8)

    out, valid = stitch(views, cfg, key=jax.random.PRNGKey(1), output="u8")
    timer.reset()
    t0 = time.time()
    out, valid = stitch(views, cfg, key=jax.random.PRNGKey(1), output="u8")
    dt = time.time() - t0
    print(f"warm end-to-end: {dt:.3f} s  ({n / dt:.2f} img/s)  "
          f"canvas {out.shape[1]}x{out.shape[0]}")
    print(timer.report())


if __name__ == "__main__":
    main()
