"""Render planning + linear blending.

Reference: stitch/stitcher_image.{hh,cc} (ConnectedImages) and
stitch/blender.cc (LinearBlender).

Host side (`plan_render`): projects 400 sampled border points of each image
through its homography into the projection plane, takes per-image and global
bboxes (stitcher_image.cc:41-77), calibrates output resolution so the
identity image keeps its native resolution (:79-114, incl. the angular
wrap-around fix, the 80000px/1e9px failure gates, and MAX_OUTPUT_SIZE
downscale).  Canvas size must be static for XLA, so this stays in numpy.

Device side (`blend_linear`): for every output pixel, inverse-map through
proj2homo -> homo_inv -> perspective divide (discarding z<0 behind-lens
points) -> half-shift to source pixels (the closure at
stitcher_image.cc:137-152), bilinear-sample with Color::NO propagation, and
accumulate with the center-distance weight w = 0.5-|c/w-0.5| (x the vertical
analog when input unordered; blender.cc:27-36).  One fori_loop iteration per
image accumulates into the full canvas — each step is a fused
gather+multiply-add over the canvas, HBM-bandwidth bound, batched over all
pixels instead of the reference's per-pixel scalar closure.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.imgproc import sample_bilinear, INVALID
from .projection import PROJECTIONS


class RenderPlan(NamedTuple):
    proj: str                # projection method name
    homos: np.ndarray        # [N,3,3] image half-shifted px -> identity frame
    homo_invs: np.ndarray    # [N,3,3]
    whs: np.ndarray          # [N,2] per-image (w,h), float
    proj_min: np.ndarray     # (2,) projection-plane bbox min
    resolution: np.ndarray   # (2,) projection units per output pixel
    out_w: int
    out_h: int
    ranges: np.ndarray       # [N,4] per-image canvas bbox (x0,y0,x1,y1), int


def _np_homo2proj(proj: str, h: np.ndarray) -> np.ndarray:
    x, y, z = h[..., 0], h[..., 1], h[..., 2]
    if proj == "flat":
        return np.stack([x / z, y / z], -1)
    if proj == "cylindrical":
        return np.stack([np.arctan2(x, z), y / np.hypot(x, z)], -1)
    return np.stack([np.arctan2(x, z), np.arctan2(y, np.hypot(x, z))], -1)


def plan_render(homos: np.ndarray, whs: np.ndarray, identity_idx: int,
                proj: str, max_output_size: int) -> RenderPlan:
    """homos: [N,3,3] mapping half-shifted pixel coords of image i into the
    identity frame; whs: [N,2] image sizes."""
    n = homos.shape[0]
    t = np.arange(100) / 100.0 - 0.5
    border = np.concatenate([
        np.stack([t, np.full(100, -0.5)], -1),
        np.stack([t, np.full(100, 0.5)], -1),
        np.stack([np.full(100, -0.5), t], -1),
        np.stack([np.full(100, 0.5), t], -1),
    ])                                                    # [400,2] normalized

    ranges = np.zeros((n, 4))
    proj_min = np.full(2, np.inf)
    proj_max = np.full(2, -np.inf)
    per_min = np.zeros((n, 2))
    per_max = np.zeros((n, 2))
    for i in range(n):
        pts = border * whs[i]                             # half-shifted px
        hpt = np.concatenate([pts, np.ones((400, 1))], -1) @ homos[i].T
        pp = _np_homo2proj(proj, hpt)
        per_min[i] = pp.min(0)
        per_max[i] = pp.max(0)
        proj_min = np.minimum(proj_min, per_min[i])
        proj_max = np.maximum(proj_max, per_max[i])

    # ---- get_final_resolution (stitcher_image.cc:79-114) ----
    refw, refh = whs[identity_idx]
    Hi = homos[identity_idx]
    c2 = Hi @ np.array([refw / 2.0, refh / 2.0, 1.0])
    c1 = Hi @ np.array([-refw / 2.0, -refh / 2.0, 1.0])
    id_range = _np_homo2proj(proj, c2) - _np_homo2proj(proj, c1)
    if proj != "flat":
        if id_range[0] < 0:
            id_range[0] += 2 * np.pi
        if id_range[1] < 0:
            id_range[1] += np.pi
    resolution = np.abs(id_range) / np.array([refw, refh])
    target = (proj_max - proj_min) / resolution
    max_edge = target.max()
    if max_edge > 80000 or target[0] * target[1] > 1e9:
        raise RuntimeError(
            "Target size too large. Looks like a stitching failure!"
        )  # stitcher_image.cc:105-106
    if max_edge > max_output_size:
        resolution = resolution * (max_edge / max_output_size)
    size = ((proj_max - proj_min) / resolution).astype(int)

    for i in range(n):
        tl = ((per_min[i] - proj_min) / resolution).astype(int)
        br = ((per_max[i] - proj_min) / resolution).astype(int)
        ranges[i] = [tl[0], tl[1], min(br[0], size[0]), min(br[1], size[1])]

    return RenderPlan(
        proj=proj,
        homos=homos.astype(np.float64),
        homo_invs=np.linalg.inv(homos).astype(np.float64),
        whs=whs.astype(np.float64),
        proj_min=proj_min,
        resolution=resolution,
        out_w=int(size[0]),
        out_h=int(size[1]),
        ranges=ranges.astype(np.int32),
    )


@functools.partial(
    jax.jit, static_argnames=("proj", "out_h", "out_w", "ordered")
)
def _blend_linear_impl(imgs, homo_invs, whs, ranges, proj_min, resolution,
                       proj: str, out_h: int, out_w: int, ordered: bool):
    _, proj2homo = PROJECTIONS[proj]
    n = imgs.shape[0]
    imgs = imgs.astype(jnp.float32)  # image path is f32 even under x64

    jj = jnp.arange(out_w, dtype=jnp.float32)
    ii = jnp.arange(out_h, dtype=jnp.float32)
    cx = jj * resolution[0] + proj_min[0]
    cy = ii * resolution[1] + proj_min[1]
    cgrid = jnp.stack(
        [jnp.broadcast_to(cx[None, :], (out_h, out_w)),
         jnp.broadcast_to(cy[:, None], (out_h, out_w))], axis=-1
    )
    hm = proj2homo(cgrid)                                  # [H,W,3]

    def body(i, acc):
        color_acc, w_acc = acc
        ret = jnp.einsum("hwc,dc->hwd", hm, homo_invs[i].astype(jnp.float32))
        z = ret[..., 2]
        zsafe = jnp.where(jnp.abs(z) > 1e-20, z, 1e-20)
        sx = ret[..., 0] / zsafe + whs[i, 0] * 0.5
        sy = ret[..., 1] / zsafe + whs[i, 1] * 0.5
        color, ok = sample_bilinear(imgs[i], sy, sx)
        w = 0.5 - jnp.abs(sx / whs[i, 0] - 0.5)
        if not ordered:  # blend both directions (blender.cc:33-35)
            w = w * (0.5 - jnp.abs(sy / whs[i, 1] - 0.5))
        x0, y0, x1, y1 = ranges[i, 0], ranges[i, 1], ranges[i, 2], ranges[i, 3]
        in_bbox = (
            (jnp.arange(out_w)[None, :] >= x0) & (jnp.arange(out_w)[None, :] < x1)
            & (jnp.arange(out_h)[:, None] >= y0) & (jnp.arange(out_h)[:, None] < y1)
        )
        m = ok & (z > 0) & in_bbox
        wm = jnp.where(m, w, 0.0)
        color_acc = color_acc + jnp.where(m[..., None], color, 0.0) * wm[..., None]
        w_acc = w_acc + wm
        return color_acc, w_acc

    color_acc = jnp.zeros((out_h, out_w, 3), jnp.float32)
    w_acc = jnp.zeros((out_h, out_w), jnp.float32)
    color_acc, w_acc = jax.lax.fori_loop(0, n, body, (color_acc, w_acc))
    has = w_acc > 0
    out = color_acc / jnp.where(has, w_acc, 1.0)[..., None]
    return jnp.where(has[..., None], out, INVALID)


def blend_linear(imgs: jnp.ndarray, plan: RenderPlan, ordered: bool) -> jnp.ndarray:
    """imgs: [N, Hp, Wp, 3] stack padded with the INVALID sentinel beyond
    each image's (whs) extent.  Returns the blended [out_h, out_w, 3] canvas
    with INVALID where nothing was rendered."""
    return _blend_linear_impl(
        imgs,
        jnp.asarray(plan.homo_invs),
        jnp.asarray(plan.whs, jnp.float32),
        jnp.asarray(plan.ranges),
        jnp.asarray(plan.proj_min, jnp.float32),
        jnp.asarray(plan.resolution, jnp.float32),
        plan.proj, plan.out_h, plan.out_w, ordered,
    )


def blend(imgs: jnp.ndarray, plan: RenderPlan, ordered: bool, multiband: int) -> jnp.ndarray:
    """Blender dispatch (ConnectedImages::blend, stitcher_image.cc:131-136):
    MultiBand when multiband > 0, else Linear."""
    if multiband > 0:
        from .multiband import blend_multiband

        return blend_multiband(imgs, plan, multiband)
    return _blend_linear_impl(
        imgs,
        jnp.asarray(plan.homo_invs),
        jnp.asarray(plan.whs, jnp.float32),
        jnp.asarray(plan.ranges),
        jnp.asarray(plan.proj_min, jnp.float32),
        jnp.asarray(plan.resolution, jnp.float32),
        plan.proj, plan.out_h, plan.out_w, ordered,
    )
