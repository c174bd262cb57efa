"""Scale-space / DoG construction.

Reference behavior (feature/dog.cc):
- Octave i is resized from the ORIGINAL working image by SCALE_FACTOR^-i
  with ceil'd dims (dog.cc:96-114), not downsampled from the previous octave.
- Within an octave, level j (j>=1) is blur(grey, sigma*SCALE_FACTOR^(j-1)) of
  level 0 — always from scale 0, never cascaded (dog.cc:54-55).
- Gradient magnitude hypot(dx,dy) and orientation atan2(dy,dx)+pi per level
  j>=1, with zero magnitude / pi orientation on the 1-px border
  (dog.cc:60-94).  The reference uses a polynomial fast_atan for speed; on
  TPU the VPU computes atan2 directly.
- DoG level j = |level j - level j+1| — absolute difference, a deliberate
  quirk of the reference (dog.cc:116-129).

All per-octave data is stacked on a leading scale axis for fixed-shape
batched gathers downstream.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from ..config import Config
from ..ops.gaussian import blur
from ..ops.imgproc import resize, rgb2grey


class Octave(NamedTuple):
    """One octave of the scale space, all arrays [S, H, W]."""
    gauss: jnp.ndarray  # S = NUM_SCALE blurred grey levels (level 0 = grey)
    mag: jnp.ndarray    # gradient magnitude (level 0 is zeros, unused)
    ort: jnp.ndarray    # gradient orientation in [0, 2pi] (level 0 unused)
    dog: jnp.ndarray    # S-1 absolute difference-of-gaussian levels


def octave_shapes(h: int, w: int, cfg: Config) -> list[tuple[int, int]]:
    """Static per-octave image shapes: ceil(orig * SCALE_FACTOR^-i)
    (reference: dog.cc:103-106)."""
    shapes = []
    for i in range(cfg.NUM_OCTAVE):
        f = cfg.SCALE_FACTOR ** (-i)
        shapes.append((math.ceil(h * f), math.ceil(w * f)) if i else (h, w))
    return shapes


def _mag_ort(level: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference gradient magnitude/orientation with zeroed 1-px
    border (reference: dog.cc:60-94). level: [H, W]."""
    dx = jnp.zeros_like(level)
    dy = jnp.zeros_like(level)
    dx = dx.at[:, 1:-1].set(level[:, 2:] - level[:, :-2])
    dy = dy.at[1:-1, :].set(level[2:, :] - level[:-2, :])
    interior = jnp.zeros(level.shape, dtype=bool).at[1:-1, 1:-1].set(True)
    mag = jnp.where(interior, jnp.hypot(dx, dy), 0.0)
    # fast_atan returns -pi when max(|dx|,|dy|) < EPS => ort = 0 there;
    # the +pi shift maps atan2's [-pi,pi] to [0,2pi].
    eps = 1e-6
    degenerate = jnp.maximum(jnp.abs(dx), jnp.abs(dy)) < eps
    ort = jnp.where(
        interior,
        jnp.where(degenerate, 0.0, jnp.arctan2(dy, dx) + jnp.pi),
        jnp.pi,
    )
    return mag, ort


def build_octave(grey: jnp.ndarray, cfg: Config) -> Octave:
    """grey: [H, W] single-channel working image for this octave."""
    levels = [grey]
    sigma = cfg.GAUSS_SIGMA
    for j in range(1, cfg.NUM_SCALE):
        levels.append(blur(grey, sigma, cfg.GAUSS_WINDOW_FACTOR))
        sigma *= cfg.SCALE_FACTOR
    gauss = jnp.stack(levels)

    mags = [jnp.zeros_like(grey)]
    orts = [jnp.full_like(grey, jnp.pi)]
    for j in range(1, cfg.NUM_SCALE):
        m, o = _mag_ort(levels[j])
        mags.append(m)
        orts.append(o)
    dog = jnp.abs(gauss[:-1] - gauss[1:])
    return Octave(gauss=gauss, mag=jnp.stack(mags), ort=jnp.stack(orts), dog=dog)


def build_scale_space(img: jnp.ndarray, cfg: Config) -> list[Octave]:
    """img: [H, W, 3] RGB or [H, W] grey working-size image. Returns one
    Octave per NUM_OCTAVE; shapes shrink per octave_shapes (static python
    loop: each octave has a distinct static shape under jit).

    Grey conversion happens BEFORE the per-octave resizes (the reference
    greys AFTER each octave's resize, dog.cc:49): both ops are linear, so
    grey(resize(x)) == resize(grey(x)) exactly in real arithmetic (fp
    rounding differs ~1ulp), and resizing one channel instead of three
    does a third of the gather work."""
    grey = rgb2grey(img) if img.ndim == 3 else img
    h, w = grey.shape[0], grey.shape[1]
    octaves = []
    for i, (oh, ow) in enumerate(octave_shapes(h, w, cfg)):
        oct_img = grey if i == 0 else resize(grey, oh, ow)
        octaves.append(build_octave(oct_img, cfg))
    return octaves
