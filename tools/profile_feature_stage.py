"""Steady-state throughput of the feature stage: N back-to-back dispatches,
one sync at the end — separates device compute from per-dispatch sync
overhead (which tools/profile_sift.py's per-call timing includes)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from openpano_tpu import Config
from openpano_tpu.ops.imgproc import working_size
from openpano_tpu.stitch.stitcherbase import _feature_chunk
from openpano_tpu.synth import photo_scene, render_views


def main():
    cfg = Config(MAX_KP_PER_IMAGE=2048)
    out_w, out_h = 1300, 867
    n = 12
    views, _ = render_views(photo_scene(), n, out_w=out_w, out_h=out_h,
                            hfov_deg=40, overlap=0.8, jitter=0.05, seed=5)
    wh_, ww_ = working_size(out_w, out_h, cfg.SIFT_WORKING_SIZE)
    whs = jnp.asarray([[out_w, out_h]], jnp.float32)

    imgs = [jnp.asarray(views[i : i + 1]) for i in range(n)]
    # warm up compile + stage all inputs on device
    out = _feature_chunk(imgs[0], whs, cfg, wh_, ww_)
    np.asarray(out.valid[0, 0])
    for im in imgs:
        im.block_until_ready()
        np.asarray(im[0, 0, 0, 0])

    for trial in range(3):
        t0 = time.perf_counter()
        outs = [_feature_chunk(im, whs, cfg, wh_, ww_) for im in imgs]
        np.asarray(outs[-1].valid[0, 0])  # fetch waits for the whole queue
        dt = time.perf_counter() - t0
        print(f"trial {trial}: {dt*1000:.1f} ms total, "
              f"{dt/n*1000:.2f} ms/img  ({n/dt:.1f} img/s)")

    # batched variants for comparison
    for B in (2, 4):
        big = jnp.concatenate(imgs[:B], axis=0)
        whsB = jnp.broadcast_to(whs, (B, 2))
        out = _feature_chunk(big, whsB, cfg, wh_, ww_)
        np.asarray(out.valid[0, 0])
        reps = max(1, n // B)
        t0 = time.perf_counter()
        outs = [_feature_chunk(big, whsB, cfg, wh_, ww_) for _ in range(reps)]
        np.asarray(outs[-1].valid[0, 0])
        dt = time.perf_counter() - t0
        print(f"batch={B}: {dt/(reps*B)*1000:.2f} ms/img")


if __name__ == "__main__":
    main()
