"""Sweep OPENPANO_FEATURE_BATCH for upload_and_compute_features wall time
at headline scale (38 x 1300x867).  Run per batch size in a subprocess so
the env knob and compile caches are fresh."""

import os
import subprocess
import sys

CHILD = r"""
import sys, time
import numpy as np
sys.path.insert(0, ".")
from openpano_tpu import Config
from openpano_tpu.stitch.stitcherbase import upload_and_compute_features
from openpano_tpu.synth import photo_scene, render_views

cfg = Config(MAX_KP_PER_IMAGE=2048)
views, _ = render_views(photo_scene(), 38, out_w=1300, out_h=867,
                        hfov_deg=40, overlap=0.8, jitter=0.05, seed=5)
u8 = np.round(views * 255).astype(np.uint8)
best = 1e9
for trial in range(3):
    t0 = time.perf_counter()
    imgs, feats = upload_and_compute_features(u8, cfg)
    np.asarray(feats.valid[:, 0])
    dt = time.perf_counter() - t0
    best = min(best, dt)
    print(f"  trial {trial}: {dt:.3f} s", flush=True)
print(f"BEST {best:.3f}")
"""

for b in (sys.argv[1:] or ["1", "2", "4", "8", "19", "38"]):
    env = dict(os.environ, OPENPANO_FEATURE_BATCH=str(b))
    print(f"batch={b}:", flush=True)
    rc = subprocess.run([sys.executable, "-c", CHILD], env=env, cwd=".",
                        check=False).returncode
    if rc != 0:
        print(f"  WARNING: batch={b} child exited rc={rc} (crash/OOM?) - "
              f"no BEST line for this size", flush=True)
