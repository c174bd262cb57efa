"""Core batched image ops: resize, grey conversion, sentinel-aware bilinear
sampling, crop.

These are the TPU equivalents of the reference's scalar loops in
lib/imgproc.cc (resize_bilinear at :22-80, interpolate at :135-156, crop at
:200-235, rgb2grey at :237-249), re-expressed as vectorized XLA ops over
whole images / coordinate grids.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

INVALID = -1.0  # Color::NO sentinel


def rgb2grey(img: jnp.ndarray) -> jnp.ndarray:
    """Mean of channels (reference: imgproc.cc:237-249). [..., H, W, 3] -> [..., H, W]."""
    return jnp.mean(img, axis=-1)


def _interp_matrix(out_n: int, n: int) -> jnp.ndarray:
    """[out_n, n] bilinear interpolation weights: half-pixel centers with
    the reference's edge clamping (sx<0 -> (0,0); sx+1>=n -> (n-2,1)).

    Built in NUMPY at trace time (shapes are static) and embedded as a
    constant: a traced scatter here would make XLA constant-fold a
    [out_n, n] scatter at COMPILE time for every distinct resize shape in
    the program — slow, memory-hungry, and implicated in an XLA:CPU
    compiler segfault mid-suite (r4)."""
    r = (np.arange(out_n, dtype=np.float64) + 0.5) * (n / out_n) - 0.5
    s = np.floor(r)
    f = r - s
    f = np.where(s < 0, 0.0, np.where(s + 1 >= n, 1.0, f))
    s = np.clip(s, 0, n - 2).astype(np.int64)
    rows = np.arange(out_n)
    M = np.zeros((out_n, n), np.float32)
    np.add.at(M, (rows, s), (1.0 - f).astype(np.float32))
    np.add.at(M, (rows, s + 1), f.astype(np.float32))
    return jnp.asarray(M)


def resize(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize with half-pixel centers and edge clamping, matching
    the reference's resize_bilinear (imgproc.cc:22-80).
    img: [H, W, C] or [H, W].

    Two equivalent formulations (same two-stage lerp arithmetic,
    ~1e-7-level fp differences):

    - TPU: separable interpolation as two dense MATMULS (each weight
      matrix has 2 nonzeros/row; the MXU eats the zeros) — the gathers
      the r1-r3 version issued were the single hottest op of the SIFT
      chunk (77 -> 50 ms per 2-image dispatch) while the MXU idled.
    - CPU (and everything else): the gather lerp.  The matmul program's
      embedded weight constants segfault the XLA:CPU compiler late in
      the test suite (order-dependent, observed twice at different
      tests, r4) — and gathers are what a CPU wants anyway."""
    import jax

    if jax.default_backend() != "tpu":
        return _resize_gather(img, out_h, out_w)
    h, w = img.shape[0], img.shape[1]
    Ry = _interp_matrix(out_h, h)          # [out_h, h]
    Rx = _interp_matrix(out_w, w)          # [out_w, w]
    # HIGHEST precision: the MXU's default bf16 rounding would perturb
    # the SIFT input by ~4e-3 — far above the DoG thresholds
    P = jax.lax.Precision.HIGHEST
    if img.ndim == 3:
        # x-interp then y-interp, channels along the batch of the matmul
        tmp = jnp.einsum("hwc,ow->hoc", img, Rx, precision=P)
        return jnp.einsum("hoc,ph->poc", tmp, Ry, precision=P)
    return jnp.matmul(jnp.matmul(Ry, img, precision=P), Rx.T, precision=P)


def _resize_gather(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Gather-lerp bilinear resize (the r1-r3 formulation)."""
    h, w = img.shape[0], img.shape[1]
    ry = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (h / out_h) - 0.5
    rx = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (w / out_w) - 0.5
    sy = jnp.floor(ry)
    sx = jnp.floor(rx)
    fy = ry - sy
    fx = rx - sx
    fy = jnp.where(sy < 0, 0.0, jnp.where(sy + 1 >= h, 1.0, fy))
    fx = jnp.where(sx < 0, 0.0, jnp.where(sx + 1 >= w, 1.0, fx))
    sy = jnp.clip(sy, 0, h - 2).astype(jnp.int32)
    sx = jnp.clip(sx, 0, w - 2).astype(jnp.int32)
    row0 = jnp.take(img, sy, axis=0)
    row1 = jnp.take(img, sy + 1, axis=0)
    p00 = jnp.take(row0, sx, axis=1)
    p01 = jnp.take(row0, sx + 1, axis=1)
    p10 = jnp.take(row1, sx, axis=1)
    p11 = jnp.take(row1, sx + 1, axis=1)
    if img.ndim == 3:
        fy = fy[:, None, None]
        fx = fx[None, :, None]
    else:
        fy = fy[:, None]
        fx = fx[None, :]
    return (1 - fy) * ((1 - fx) * p00 + fx * p01) \
        + fy * ((1 - fx) * p10 + fx * p11)


def bilinear_prologue(h: int, w: int, y: jnp.ndarray, x: jnp.ndarray):
    """Shared bounds/index/fraction computation for every bilinear sampler
    (the plain, x-paired, and packed-int32 variants must agree on the
    boundary rule).  h/w are the ORIGINAL image dims.  Returns
    (inb, iy, ix, ry, rx) with ry/rx already expanded for channel
    broadcasting."""
    fy = jnp.floor(y)
    fx = jnp.floor(x)
    inb = (fy >= 0) & (fx >= 0) & (fy + 1 <= h - 1) & (fx + 1 <= w - 1)
    iy = jnp.clip(fy, 0, h - 2).astype(jnp.int32)
    ix = jnp.clip(fx, 0, w - 2).astype(jnp.int32)
    return inb, iy, ix, (y - fy)[..., None], (x - fx)[..., None]


def sample_bilinear(img: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray):
    """Sentinel-aware bilinear sampling (reference: interpolate, imgproc.cc:135-156).

    img: [H, W, C] float with INVALID(-1) marking empty pixels.
    y, x: arbitrary (broadcast-equal) shaped float sample coordinates
    (row, col in pixel units, origin at pixel corner grid like the reference).

    Returns (color [..., C], valid [...]) where valid is False when the
    sample is out of bounds or any of its 4 neighbors is INVALID; invalid
    colors are INVALID, matching Color::NO propagation.
    """
    h, w = img.shape[0], img.shape[1]
    inb, iy, ix, ry, rx = bilinear_prologue(h, w, y, x)

    p00 = img[iy, ix]
    p10 = img[iy + 1, ix]
    p01 = img[iy, ix + 1]
    p11 = img[iy + 1, ix + 1]
    # NO-propagation: reference checks first channel < 0 of each neighbor
    ok = (p00[..., 0] >= 0) & (p10[..., 0] >= 0) & (p01[..., 0] >= 0) & (p11[..., 0] >= 0)
    valid = inb & ok
    color = (
        p00 * (1 - ry) * (1 - rx)
        + p10 * ry * (1 - rx)
        + p01 * (1 - ry) * rx
        + p11 * ry * rx
    )
    color = jnp.where(valid[..., None], color, INVALID)
    return color, valid


def crop_to_largest_rect(img: np.ndarray) -> np.ndarray:
    """Crop to the largest rectangle containing no INVALID pixels
    (reference: crop, imgproc.cc:200-235).  Host-side: the DP is sequential;
    runs in native C (native/crop_largest_rect.c)."""
    from ..native import largest_valid_rect

    img = np.asarray(img)
    valid = img.max(axis=-1) >= 0
    y0, x0, h, w = largest_valid_rect(valid)
    if h == 0 or w == 0:
        return img[:0, :0]
    return img[y0 : y0 + h, x0 : x0 + w]


def crop_with_mask(img: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Crop to the largest all-valid rectangle given an explicit validity
    mask (the u8 output path computes the mask on device)."""
    from ..native import largest_valid_rect

    y0, x0, h, w = largest_valid_rect(np.asarray(valid))
    if h == 0 or w == 0:
        return img[:0, :0]
    return img[y0 : y0 + h, x0 : x0 + w]


def hconcat(mats: list[np.ndarray]) -> np.ndarray:
    """Horizontal concat with zero padding to the tallest (imgproc.cc:86-110).
    Debug/visualization helper; host-side."""
    hmax = max(m.shape[0] for m in mats)
    c = mats[0].shape[2]
    out = np.zeros((hmax, sum(m.shape[1] for m in mats), c), dtype=np.float32)
    x = 0
    for m in mats:
        out[: m.shape[0], x : x + m.shape[1]] = m
        x += m.shape[1]
    return out


def vconcat(mats: list[np.ndarray]) -> np.ndarray:
    """Vertical concat with zero padding to the widest (imgproc.cc:112-133).
    Debug/visualization helper; host-side."""
    wmax = max(m.shape[1] for m in mats)
    c = mats[0].shape[2]
    out = np.zeros((sum(m.shape[0] for m in mats), wmax, c), dtype=np.float32)
    y = 0
    for m in mats:
        out[y : y + m.shape[0], : m.shape[1]] = m
        y += m.shape[0]
    return out


def working_size(w: int, h: int, target: int) -> tuple[int, int]:
    """Resize target so (w+h)/2 == SIFT_WORKING_SIZE, preserving aspect
    (reference: feature.cc:31-36: ratio = target*2/(w+h), floor dims)."""
    ratio = target * 2.0 / (w + h)
    return int(h * ratio), int(w * ratio)
