#!/usr/bin/env python
"""CLI-level integration harness.

Mirrors the reference's src/run_test.py:20-49: run the real entry point on
datasets, parse "Final Image Size: (w, h)" from stdout, assert each
dimension is within ratio 0.8 of golden.  Datasets are generated
synthetically (no example-data download offline): a cylinder-texture pano
for CYLINDER mode and the same views unordered for ESTIMATE_CAMERA.

Usage: python tools/run_test.py [--jobs-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def generate_dataset(d: str, n: int = 6) -> None:
    sys.path.insert(0, REPO)
    from openpano_tpu.io import write_rgb
    from openpano_tpu.synth import photo_scene, render_views

    views, _ = render_views(
        photo_scene(), n, out_w=320, out_h=240, hfov_deg=32, overlap=0.5
    )
    for k, v in enumerate(views):
        write_rgb(os.path.join(d, f"view{k:02d}.png"), v)


def write_config(d: str, mode: str) -> str:
    """Full config file: every reference knob must be present (missing key
    is fatal, matching lib/config.cc:31-35)."""
    sys.path.insert(0, REPO)
    from openpano_tpu.config import Config

    values = {k: getattr(Config, k) for k in Config.REFERENCE_KNOBS}
    values.update({
        "cylinder": dict(CYLINDER=1, ESTIMATE_CAMERA=0, TRANS=0,
                         ORDERED_INPUT=1),
        "camera": dict(CYLINDER=0, ESTIMATE_CAMERA=1, TRANS=0,
                       ORDERED_INPUT=0),
    }[mode])
    values.update(
        SIFT_WORKING_SIZE=400, RANSAC_ITERATIONS=400,
        MAX_KP_PER_IMAGE=1024, MAX_MATCHES_PER_PAIR=512,
        MAX_CAND_PER_OCTAVE=1024, MAX_KP_PER_OCTAVE=512,
        MAX_DESC_PER_OCTAVE=512,
    )
    cfg = os.path.join(d, "config.cfg")
    with open(cfg, "w") as f:
        for k, v in values.items():
            f.write(f"{k} {int(v) if isinstance(v, bool) else v}\n")
    return cfg


def run_one(d: str, mode: str, golden_w: float, golden_h: float) -> None:
    write_config(d, mode)
    imgs = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".png")
    )
    out = subprocess.run(
        [sys.executable, "-m", "openpano_tpu.cli", *imgs,
         "-o", os.path.join(d, "out.jpg")],
        cwd=d, capture_output=True, text=True, timeout=3600,
        env={**os.environ,
             "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")},
    )
    sys.stdout.write(out.stdout)
    if out.returncode != 0:
        sys.stderr.write(out.stderr)
        raise SystemExit(f"{mode}: CLI failed")
    m = re.search(r"Final Image Size: \((\d+), (\d+)\)", out.stdout)
    if not m:
        raise SystemExit(f"{mode}: no Final Image Size in output")
    w, h = int(m.group(1)), int(m.group(2))

    def ratio(a, b):
        return min(a, b) / max(a, b)

    # run_test.py:44-48 semantics: each dim within ratio 0.8 of golden
    if ratio(w, golden_w) <= 0.8 or ratio(h, golden_h) <= 0.8:
        raise SystemExit(
            f"{mode}: size ({w},{h}) deviates from golden ({golden_w},{golden_h})"
        )
    print(f"{mode}: OK ({w}x{h})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jobs-dir", default=None)
    args = ap.parse_args()

    base = args.jobs_dir or tempfile.mkdtemp(prefix="openpano_it_")
    for mode, gw, gh in [("cylinder", 1080, 250), ("camera", 1010, 280)]:
        d = os.path.join(base, mode)
        os.makedirs(d, exist_ok=True)
        generate_dataset(d)
        run_one(d, mode, gw, gh)

    # when the reference binary is built, the golden is the reference
    # itself: cross-validate sizes/keypoints/pixels on a shared dataset
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import ref_parity

    if os.path.exists(ref_parity.REF_BINARY):
        rc = subprocess.run(
            [sys.executable, ref_parity.__file__], timeout=1200
        ).returncode
        if rc != 0:
            raise SystemExit("reference cross-validation failed")
        print("reference-parity: OK")
    print("Test passed")


if __name__ == "__main__":
    main()
