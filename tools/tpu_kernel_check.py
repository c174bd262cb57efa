#!/usr/bin/env python
"""On-TPU Pallas kernel regression check (VERDICT r1 #8).

The fused window-DMA kernels (openpano_tpu/ops/windows.py) take the
Pallas branch only on real TPU hardware; CI runs them through the XLA
fallback on CPU, so TPU-kernel correctness would otherwise rest on the
benchmark alone.  This tool runs BOTH implementations on the same device
with identical inputs — orientation + descriptor histogram kernels over
random planes and keypoints — and bounds their disagreement.

Usage: python tools/tpu_kernel_check.py   (prints one JSON line)
Importable: ``check()`` returns the result dict (bench.py embeds it).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def check(seed: int = 0) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from openpano_tpu.ops import windows as W

    rng = np.random.default_rng(seed)
    S, H, Wd, K = 3, 256, 384, 96
    WR = 48  # window radius bucket (multiple of 8)

    mag = jnp.asarray(rng.uniform(0, 2, (S, H, Wd)), jnp.float32)
    ort = jnp.asarray(rng.uniform(0, 2 * np.pi, (S, H, Wd)), jnp.float32)
    s = jnp.asarray(rng.integers(0, S, K), jnp.int32)
    y = jnp.asarray(rng.uniform(8, H - 8, K), jnp.float32)
    x = jnp.asarray(rng.uniform(8, Wd - 8, K), jnp.float32)
    rad = jnp.asarray(rng.integers(3, WR - 2, K), jnp.float32)
    invden = jnp.asarray(rng.uniform(0.005, 0.05, K), jnp.float32)
    radius = jnp.asarray(rng.integers(4, WR - 2, K), jnp.float32)
    hw = jnp.asarray(rng.uniform(2.0, 6.0, K), jnp.float32)
    dirv = jnp.asarray(rng.uniform(0, 2 * np.pi, K), jnp.float32)

    backend = jax.default_backend()

    # production path (Pallas on TPU, XLA fallback elsewhere)
    ori_main = np.asarray(W.orientation_histogram(
        mag, ort, s, y, x, rad, invden, WR))
    desc_main = np.asarray(W.descriptor_histogram(
        mag, ort, s, y, x, radius, hw, dirv, WR))

    # explicit XLA fallback on the same device
    sc, r0, c0 = W._starts(s, y, x, S, H, Wd, WR)
    ap, bp = W._pad_plane(mag, WR), W._pad_plane(ort, WR)
    hb = jnp.full((K,), H, jnp.float32)
    wb = jnp.full((K,), Wd, jnp.float32)
    ori_ref = np.asarray(jax.jit(W._ori_hist_xla, static_argnames="WR")(
        ap, bp, sc, r0, c0, y, x, rad, invden, hb, wb, WR=WR))
    desc_ref = np.asarray(jax.jit(W._desc_hist_xla, static_argnames="WR")(
        ap, bp, sc, r0, c0, y, x,
        radius, hw, jnp.cos(dirv), jnp.sin(dirv), dirv, hb, wb, WR=WR))

    def stats(a, b):
        scale = max(float(np.abs(b).max()), 1e-6)
        return float(np.abs(a - b).max() / scale)

    ori_rel = stats(ori_main, ori_ref)
    desc_rel = stats(desc_main, desc_ref)

    # resize backend fork (r4, ops/imgproc.py): the TPU path expresses the
    # bilinear lerp as two HIGHEST-precision matmuls, every other backend
    # gathers.  Gate their agreement here like the window kernels — this
    # is the newest numerical fork point on the SIFT input path.
    from openpano_tpu.ops.imgproc import _resize_gather, resize

    img = jnp.asarray(rng.uniform(0, 1, (257, 389, 3)), jnp.float32)
    r_main = np.asarray(resize(img, 181, 263))
    r_ref = np.asarray(jax.jit(
        _resize_gather, static_argnames=("out_h", "out_w"))(
            img, out_h=181, out_w=263))
    resize_rel = stats(r_main, r_ref)

    # pure f32 accumulation-order differences only: tight bound
    ok = ori_rel < 1e-4 and desc_rel < 1e-4 and resize_rel < 1e-4
    return {
        "backend": backend,
        "pallas_active": backend == "tpu",
        "ori_hist_rel_err": round(ori_rel, 8),
        "desc_hist_rel_err": round(desc_rel, 8),
        "resize_rel_err": round(resize_rel, 8),
        "ok": bool(ok),
    }


if __name__ == "__main__":
    result = check()
    print(json.dumps(result))
    sys.exit(0 if result["ok"] else 1)
