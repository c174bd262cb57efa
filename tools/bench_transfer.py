"""Microbench of host<->device transfer strategies on the tunneled TPU.

Measures blocking time of full upload->consume and produce->download chains
at headline-benchmark scale (38x867x1300x3 uint8 = 128 MB).

Usage: python tools/bench_transfer.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, n=3):
    f()
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        f()
        best = min(best, time.time() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from openpano_tpu.native import delta_encode_rows
    from openpano_tpu.synth import photo_scene, render_views

    scene = photo_scene()
    views, _ = render_views(
        scene, 38, out_w=1300, out_h=867, hfov_deg=40, overlap=0.8,
        jitter=0.05, seed=5,
    )
    u8 = np.round(views * 255).astype(np.uint8)
    print(f"payload: {u8.nbytes/1e6:.0f} MB")
    rows = (38 * 867, 1300 * 3)
    d = delta_encode_rows(u8.reshape(rows))

    sum_u8 = jax.jit(lambda x: (x.astype(jnp.int32)).sum())
    sum_i32 = jax.jit(lambda x: x.sum())

    def up_u8_delta():
        x = jax.device_put(d)
        jax.block_until_ready(sum_u8(x))

    def up_i32_delta():
        x = jax.device_put(d.reshape(-1).view(np.int32))
        jax.block_until_ready(sum_i32(x))

    def up_u8_raw():
        x = jax.device_put(u8)
        jax.block_until_ready(sum_u8(x))

    def up_i32_chunked():
        i32 = d.reshape(-1).view(np.int32)
        bounds = np.linspace(0, i32.size, 9).astype(int)
        xs = jax.device_put([i32[a:b] for a, b in zip(bounds[:-1], bounds[1:])])
        jax.block_until_ready([sum_i32(x) for x in xs])

    for name, f in [
        ("upload u8 delta      ", up_u8_delta),
        ("upload i32 delta     ", up_i32_delta),
        ("upload u8 raw        ", up_u8_raw),
        ("upload i32 delta 8-ch", up_i32_chunked),
    ]:
        t = timeit(f)
        print(f"{name}: {t:.3f} s  ({u8.nbytes/1e6/t:.0f} MB/s)")

    # ---- downloads: a smooth canvas-like RGBA u8 buffer (7626x1108x4) ----
    from openpano_tpu.io.transfer import fetch, fetch_u8_delta
    from openpano_tpu.native import delta_decode_rows

    canvas = np.zeros((4, 1108, 7626), np.uint8)
    big = np.kron(views[0].mean(-1), np.ones((3, 6)))[:1108, :7626]
    for c in range(3):
        canvas[c] = np.round(big * 255).astype(np.uint8)
    canvas[3] = 1
    dev_canvas = jax.device_put(canvas)
    jax.block_until_ready(dev_canvas)
    nb = canvas.nbytes

    @jax.jit
    def to_i64_delta(x):
        d = x.astype(jnp.int32)
        d = jnp.concatenate([d[..., :1], (d[..., 1:] - d[..., :-1]) & 0xFF], -1)
        d = d.astype(jnp.uint8).reshape(-1)
        pad = (-d.size) % 8
        d = jnp.pad(d, (0, pad))
        return jax.lax.bitcast_convert_type(d.reshape(-1, 8), jnp.int64)

    def down_fetch_i32():
        fetch(dev_canvas)

    def down_fetch_i32_delta():
        fetch_u8_delta(dev_canvas)

    def down_fetch_i64_delta():
        host = np.asarray(to_i64_delta(dev_canvas))
        flat = host.view(np.uint8)[: canvas.size]
        delta_decode_rows(flat.reshape(4 * 1108, 7626))

    for name, f in [
        ("download i32 fetch    ", down_fetch_i32),
        ("download i32 delta    ", down_fetch_i32_delta),
        ("download i64 delta    ", down_fetch_i64_delta),
    ]:
        t = timeit(f)
        print(f"{name}: {t:.3f} s  ({nb/1e6/t:.0f} MB/s)")


if __name__ == "__main__":
    main()
