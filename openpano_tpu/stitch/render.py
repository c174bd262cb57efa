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
    items: np.ndarray        # [M,5] (img, x0,y0,x1,y1) render items — images
                             # whose angular span crosses the +-pi wrap are
                             # split into one item per canvas-edge strip


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
    per_pp = []
    for i in range(n):
        pts = border * whs[i]                             # half-shifted px
        hpt = np.concatenate([pts, np.ones((400, 1))], -1) @ homos[i].T
        pp = _np_homo2proj(proj, hpt)
        per_pp.append(pp)
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

    items = []
    for i in range(n):
        tl = ((per_min[i] - proj_min) / resolution).astype(int)
        br = ((per_max[i] - proj_min) / resolution).astype(int)
        ranges[i] = [tl[0], tl[1], min(br[0], size[0]), min(br[1], size[1])]

        # angular-wrap split: an image whose border points straddle the
        # +-pi seam gets a raw bbox spanning the whole canvas; emit one
        # item per edge strip instead so the blender renders only covered
        # columns
        pp = per_pp[i]
        if proj != "flat" and per_max[i][0] - per_min[i][0] > np.pi:
            for sel in (pp[:, 0] < 0, pp[:, 0] >= 0):
                if not sel.any():
                    continue
                smin = pp[sel].min(0)
                smax = pp[sel].max(0)
                stl = ((smin - proj_min) / resolution).astype(int)
                sbr = ((smax - proj_min) / resolution).astype(int)
                items.append([i, stl[0], stl[1],
                              min(sbr[0], size[0]), min(sbr[1], size[1])])
        else:
            items.append([i, *ranges[i].astype(int)])

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
        items=np.asarray(items, np.int32).reshape(-1, 5),
    )


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def _finalize_canvas(color_acc, w_acc, out_h: int, out_w: int):
    """Normalize accumulators to the f32 canvas with the INVALID sentinel."""
    full = color_acc[:out_h, :out_w]
    wfull = w_acc[:out_h, :out_w]
    has = wfull > 0
    out = full / jnp.where(has, wfull, 1.0)[..., None]
    return jnp.where(has[..., None], out, INVALID)


def _slab_layout(plan: RenderPlan):
    """Static slab geometry for the bbox blenders: per-item max bbox (BH,
    BW), padded canvas (Hp, Wp), and clamped per-item slab origins."""
    it = plan.items
    r = it[:, 1:5]
    BH = -(-int(max(1, (r[:, 3] - r[:, 1]).max())) // 8) * 8
    BW = -(-int(max(1, (r[:, 2] - r[:, 0]).max())) // 128) * 128
    Hp = -(-plan.out_h // 8) * 8 + BH
    Wp = -(-plan.out_w // 128) * 128 + BW
    oy = np.clip(r[:, 1], 0, -(-plan.out_h // 8) * 8)
    ox = np.clip(r[:, 0], 0, -(-plan.out_w // 128) * 128)
    return it, r, BH, BW, Hp, Wp, ox, oy


def blend_linear(imgs: jnp.ndarray, plan: RenderPlan, ordered: bool,
                 packed_gather: bool = False) -> jnp.ndarray:
    """imgs: [N, Hp, Wp, 3] stack padded with the INVALID sentinel beyond
    each image's (whs) extent.  Returns the blended [out_h, out_w, 3] canvas
    with INVALID where nothing was rendered.

    One scan step per render item (an image, or one edge strip of a
    wrap-straddling image) renders its projected bbox region (a [BH, BW]
    slab at a per-item origin) and accumulates into the canvas — work
    scales with covered area, in ~N large steps (best MXU/VPU utilization
    per dispatch)."""
    it, r, BH, BW, Hp, Wp, ox, oy = _slab_layout(plan)
    if packed_gather:
        imgs = pack_imgs_u8(imgs)
    origins = np.stack([ox, oy], axis=-1).astype(np.int32)
    color_acc = jnp.zeros((Hp, Wp, 3), jnp.float32)
    w_acc = jnp.zeros((Hp, Wp), jnp.float32)
    color_acc, w_acc = _blend_group(
        color_acc, w_acc, imgs,
        jnp.asarray(plan.homo_invs),
        jnp.asarray(plan.whs, jnp.float32),
        jnp.asarray(it[:, 0]),
        jnp.asarray(r, jnp.float32),
        jnp.asarray(origins),
        jnp.asarray(plan.proj_min, jnp.float32),
        jnp.asarray(plan.resolution, jnp.float32),
        plan.proj, ordered, BH, BW,
    )
    return _finalize_canvas(color_acc, w_acc, plan.out_h, plan.out_w)


@jax.jit
def pack_imgs_u8(imgs: jnp.ndarray) -> jnp.ndarray:
    """[N,H,W,3] f32 in [0,1] (INVALID<0 = empty) -> [N,H,W] int32 with
    R|G|B|valid bytes.  One i32 element per pixel makes each bilinear tap
    a scalar gather instead of a 3-vector gather (TPU gathers pay per
    element row, and a minor dim of 3 wastes the lane).  Exact for u8
    sources (u8 -> f32/255 -> u8 roundtrips)."""
    valid = imgs[..., 0] >= 0
    u8 = jnp.round(jnp.clip(imgs, 0.0, 1.0) * 255.0).astype(jnp.int32)
    packed = (
        u8[..., 0] | (u8[..., 1] << 8) | (u8[..., 2] << 16)
        | (valid.astype(jnp.int32) << 24)
    )
    return jnp.where(valid, packed, 0)


def _sample_bilinear_packed(img_i32, y, x):
    """sample_bilinear over an R|G|B|valid-packed int32 image."""
    h, w = img_i32.shape[0], img_i32.shape[1]
    fy = jnp.floor(y)
    fx = jnp.floor(x)
    inb = (fy >= 0) & (fx >= 0) & (fy + 1 <= h - 1) & (fx + 1 <= w - 1)
    iy = jnp.clip(fy, 0, h - 2).astype(jnp.int32)
    ix = jnp.clip(fx, 0, w - 2).astype(jnp.int32)
    ry = (y - fy)[..., None]
    rx = (x - fx)[..., None]
    p00 = img_i32[iy, ix]
    p10 = img_i32[iy + 1, ix]
    p01 = img_i32[iy, ix + 1]
    p11 = img_i32[iy + 1, ix + 1]
    ok = inb & ((p00 & p10 & p01 & p11) >> 24 > 0)

    def rgb(p):
        return jnp.stack(
            [p & 0xFF, (p >> 8) & 0xFF, (p >> 16) & 0xFF], axis=-1
        ).astype(jnp.float32) / 255.0

    color = (
        rgb(p00) * (1 - ry) * (1 - rx)
        + rgb(p10) * ry * (1 - rx)
        + rgb(p01) * (1 - ry) * rx
        + rgb(p11) * ry * rx
    )
    return color, ok


@functools.partial(
    jax.jit,
    static_argnames=("proj", "ordered", "BH", "BW"),
    donate_argnums=(0, 1),
)
def _blend_group(color_acc, w_acc, imgs, homo_invs, whs, item_idx, ranges,
                 origins, proj_min, resolution, proj: str, ordered: bool,
                 BH: int, BW: int):
    """One group of the streamed blend: scan the group's items (same math
    as _blend_linear_bbox.step) into the donated canvas accumulators.

    imgs: [N,H,W,3] f32 stack, or [N,H,W] int32 R|G|B|valid-packed
    (pack_imgs_u8) for scalar-gather sampling."""
    _, proj2homo = PROJECTIONS[proj]
    packed = imgs.ndim == 3
    if not packed:
        imgs = imgs.astype(jnp.float32)
    t_h = jnp.arange(BH, dtype=jnp.float32)
    t_w = jnp.arange(BW, dtype=jnp.float32)

    def step(acc, per_item):
        color_acc, w_acc = acc
        idx, rng4, org = per_item
        hinv = homo_invs[idx]
        wh = whs[idx]
        img = imgs[idx]
        oy = org[1]
        ox = org[0]
        cx = (ox.astype(jnp.float32) + t_w) * resolution[0] + proj_min[0]
        cy = (oy.astype(jnp.float32) + t_h) * resolution[1] + proj_min[1]
        cgrid = jnp.stack(
            [jnp.broadcast_to(cx[None, :], (BH, BW)),
             jnp.broadcast_to(cy[:, None], (BH, BW))], axis=-1
        )
        hm = proj2homo(cgrid)
        ret = jnp.einsum("hwc,dc->hwd", hm, hinv.astype(jnp.float32))
        z = ret[..., 2]
        zsafe = jnp.where(jnp.abs(z) > 1e-20, z, 1e-20)
        sx = ret[..., 0] / zsafe + wh[0] * 0.5
        sy = ret[..., 1] / zsafe + wh[1] * 0.5
        if packed:
            color, ok = _sample_bilinear_packed(img, sy, sx)
        else:
            color, ok = sample_bilinear(img, sy, sx)
        w = 0.5 - jnp.abs(sx / wh[0] - 0.5)
        if not ordered:  # blend both directions (blender.cc:33-35)
            w = w * (0.5 - jnp.abs(sy / wh[1] - 0.5))
        ax = ox.astype(jnp.float32) + t_w[None, :]
        ay = oy.astype(jnp.float32) + t_h[:, None]
        in_bbox = (
            (ax >= rng4[0]) & (ax < rng4[2]) & (ay >= rng4[1]) & (ay < rng4[3])
        )
        m = ok & (z > 0) & in_bbox
        wm = jnp.where(m, w, 0.0)
        wc = jnp.where(m[..., None], color, 0.0) * wm[..., None]
        zero = jnp.int32(0)
        cur_c = jax.lax.dynamic_slice(color_acc, (oy, ox, zero), (BH, BW, 3))
        cur_w = jax.lax.dynamic_slice(w_acc, (oy, ox), (BH, BW))
        color_acc = jax.lax.dynamic_update_slice(color_acc, cur_c + wc, (oy, ox, zero))
        w_acc = jax.lax.dynamic_update_slice(w_acc, cur_w + wm, (oy, ox))
        return (color_acc, w_acc), None

    (color_acc, w_acc), _ = jax.lax.scan(
        step, (color_acc, w_acc), (item_idx, ranges, origins)
    )
    return color_acc, w_acc


@functools.partial(jax.jit, static_argnames=("out_h", "SW"))
def _strip_u8_i32(color_acc, w_acc, start, out_h: int, SW: int):
    """Finalized column strip [start, start+SW) -> packed RGBA-as-int32
    [out_h, SW] (normalize, u8-convert per _f32_to_u8_rgba semantics,
    bitcast 4 bytes -> 1 element for the cheap tunnel download)."""
    zero = jnp.int32(0)
    c = jax.lax.dynamic_slice(color_acc, (zero, start, zero),
                              (out_h, SW, 3))
    w = jax.lax.dynamic_slice(w_acc, (zero, start), (out_h, SW))
    has = w > 0
    out = c / jnp.where(has, w, 1.0)[..., None]
    u8 = jnp.round(jnp.clip(out, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    rgb = jnp.where(has[..., None], u8, 255)
    rgba = jnp.concatenate([rgb, has[..., None].astype(jnp.uint8)], axis=-1)
    return jax.lax.bitcast_convert_type(rgba, jnp.int32)


def blend_linear_stream_u8(imgs: jnp.ndarray, plan: RenderPlan,
                           ordered: bool, groups: int = 4,
                           packed_gather: bool = False) -> np.ndarray:
    """Streamed linear blend straight to a host RGBA uint8 canvas.

    Items are sorted by bbox x-start and split into `groups` column bands;
    after band g's accumulation, columns [g*SW, (g+1)*SW) can never be
    touched again, so that strip is normalized + u8-packed on device and
    its host copy starts (copy_to_host_async) while later bands still
    compute — hiding most of the slow tunnel download behind blend work."""
    it, r, BH, BW, Hp, Wp, ox, oy = _slab_layout(plan)
    if packed_gather:
        imgs = pack_imgs_u8(imgs)

    G = groups if len(it) >= 2 * groups else 1
    SW = -(-(-(-Wp // G)) // 128) * 128  # ceil(Wp/G) rounded up to 128
    while (G - 1) * SW >= Wp:  # last strip must be non-empty
        G -= 1
    Wp = G * SW  # pad so every strip slice stays in bounds
    gid = np.minimum(ox // SW, G - 1)

    # fixed per-group item capacity; dummies have empty bboxes (no-ops)
    IC = max(int(np.bincount(gid, minlength=G).max()), 1)
    g_idx = np.zeros((G, IC), np.int32)
    g_rng = np.zeros((G, IC, 4), np.float32)
    g_org = np.zeros((G, IC, 2), np.int32)
    for g in range(G):
        sel = np.flatnonzero(gid == g)
        g_idx[g, : len(sel)] = it[sel, 0]
        g_rng[g, : len(sel)] = r[sel]
        g_org[g, : len(sel), 0] = ox[sel]
        g_org[g, : len(sel), 1] = oy[sel]

    color_acc = jnp.zeros((Hp, Wp, 3), jnp.float32)
    w_acc = jnp.zeros((Hp, Wp), jnp.float32)
    homo_invs = jnp.asarray(plan.homo_invs)
    whs = jnp.asarray(plan.whs, jnp.float32)
    proj_min = jnp.asarray(plan.proj_min, jnp.float32)
    resolution = jnp.asarray(plan.resolution, jnp.float32)

    strips = []
    for g in range(G):
        color_acc, w_acc = _blend_group(
            color_acc, w_acc, imgs, homo_invs, whs,
            jnp.asarray(g_idx[g]), jnp.asarray(g_rng[g]),
            jnp.asarray(g_org[g]), proj_min, resolution,
            plan.proj, ordered, BH, BW,
        )
        strip = _strip_u8_i32(
            color_acc, w_acc, jnp.int32(g * SW), plan.out_h, SW
        )
        strip.copy_to_host_async()
        strips.append(strip)

    parts = [np.asarray(s).view(np.uint8).reshape(plan.out_h, SW, 4)
             for s in strips]
    return np.concatenate(parts, axis=1)[:, : plan.out_w]


def blend(imgs: jnp.ndarray, plan: RenderPlan, ordered: bool, multiband: int) -> jnp.ndarray:
    """Blender dispatch (ConnectedImages::blend, stitcher_image.cc:131-136):
    MultiBand when multiband > 0, else Linear."""
    if multiband > 0:
        from .multiband import blend_multiband

        return blend_multiband(imgs, plan, multiband)
    import os

    packed = os.environ.get("OPENPANO_PACKED_GATHER", "0") == "1"
    return blend_linear(imgs, plan, ordered, packed_gather=packed)
