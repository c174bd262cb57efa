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
    hulls: tuple             # per-item convex hull of the projected border
                             # in canvas px, [K,2] float arrays — lets the
                             # blenders skip canvas tiles an item's bbox
                             # covers but its projected outline never touches


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

    from ..geometry.polygon import convex_hull

    items = []
    hulls = []
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
                hulls.append(convex_hull((pp[sel] - proj_min) / resolution))
        else:
            items.append([i, *ranges[i].astype(int)])
            hulls.append(convex_hull((pp - proj_min) / resolution))

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
        hulls=tuple(hulls),
    )


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def _finalize_canvas(color_acc, w_acc, out_h: int, out_w: int):
    """Normalize accumulators to the f32 canvas with the INVALID sentinel."""
    full = color_acc[:out_h, :out_w]
    wfull = w_acc[:out_h, :out_w]
    has = wfull > 0
    out = full / jnp.where(has, wfull, 1.0)[..., None]
    return jnp.where(has[..., None], out, INVALID)


# blender tile geometry: each render item's bbox is covered by fixed-size
# [TH, TW] tile jobs instead of one max-bbox slab — per-item bboxes vary ~2x
# on a spherical pano, so uniform slabs nearly double the gather work
import os as _os

# 256x256 won a sweep over {64..384}x{128..768} on the v5e headline
# workload (tools/profile_stitch.py; blend 2.16 s vs 2.7-2.8 s at the
# extremes) — big enough to amortize scan-step overhead, small enough to
# keep bbox-edge overdraw ~15%
_TILE_H = int(_os.environ.get("OPENPANO_TILE_H", "256"))
_TILE_W = int(_os.environ.get("OPENPANO_TILE_W", "256"))


def _poly_rect_intersects(poly: np.ndarray, x0, y0, x1, y1, margin=8.0) -> bool:
    """Convex polygon vs axis-aligned rect (SAT).  The rect is dilated by
    ``margin`` px to absorb the sagitta of the sampled-border hull."""
    x0, y0, x1, y1 = x0 - margin, y0 - margin, x1 + margin, y1 + margin
    if poly.shape[0] < 3:
        px0, py0 = poly.min(0)
        px1, py1 = poly.max(0)
        return not (px1 < x0 or px0 > x1 or py1 < y0 or py0 > y1)
    # axis-aligned separators
    if poly[:, 0].max() < x0 or poly[:, 0].min() > x1:
        return False
    if poly[:, 1].max() < y0 or poly[:, 1].min() > y1:
        return False
    # polygon-edge separators
    corners = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])
    nv = poly.shape[0]
    edges = poly[(np.arange(nv) + 1) % nv] - poly
    normals = np.stack([-edges[:, 1], edges[:, 0]], -1)       # [E,2]
    pp = normals @ poly.T                                     # [E,V]
    pc = normals @ corners.T                                  # [E,4]
    sep = (pp.max(1) < pc.min(1)) | (pp.min(1) > pc.max(1))
    return not sep.any()


def _tile_jobs(plan: RenderPlan, groups: int, TH: int = _TILE_H,
               TW: int = _TILE_W, exact: bool = False,
               item_slabs: bool = False):
    """Flat list of [TH, TW] jobs partitioned into ``groups`` column bands
    (band = job x-origin // SW; a band-g job never writes columns < g*SW,
    so strip g is final once bands <= g are done).

    Two job geometries:
      - tile jobs (default): each item's bbox covered by fixed [TH, TW]
        tiles, skipping tiles the item's projected hull never touches;
      - ``item_slabs=True``: ONE job per render item sized to the max item
        bbox (TH/TW ignored).  One big gather per item beats many small
        per-tile gathers on TPU (~0.9 s vs ~1.3 s on the 38-image
        headline: XLA gather throughput improves with op size), at the
        cost of slab padding when item bboxes vary a lot.

    ``exact=True`` keeps G == groups even when bands come out empty — the
    mesh-sharded blender needs exactly one band per device — and forces
    SW >= TW so a band-g job can spill at most ONE strip to the right
    (the sharded blender's single neighbor halo exchange relies on this;
    with SW < TW a job would spill across two strips and the far columns
    would be silently lost).

    Returns (G, SW, Hp, Wp, TH, TW, band_jobs) where band_jobs[g] is
    (idx [J] image indices, rng [J,4] f32 true bboxes, org [J,2] i32 job
    origins, sid [J] i32 global ITEM indices — one job per item in
    item_slabs mode, so sid disambiguates jobs for cross-band tie-breaks)."""
    it = plan.items
    r = it[:, 1:5]
    if item_slabs:
        TH = -(-int(np.maximum(r[:, 3] - r[:, 1], 1).max()) // 8) * 8
        TW = -(-int(np.maximum(r[:, 2] - r[:, 0], 1).max()) // 128) * 128
    oy_max = -(-plan.out_h // 8) * 8
    ox_max = -(-plan.out_w // 128) * 128
    Hp = oy_max + TH
    Wp = ox_max + TW

    G = groups if (exact or len(it) >= 2 * groups) else 1
    SW = -(-(-(-Wp // G)) // 128) * 128  # ceil(Wp/G) rounded up to 128
    if exact or item_slabs:
        # streaming/sharding correctness: one job spills <= one strip
        SW = max(SW, -(-TW // 128) * 128)
    if not exact:
        while (G - 1) * SW >= Wp:  # last strip must be non-empty
            G -= 1
    Wp = G * SW  # pad so every strip slice stays in bounds

    jobs_i: list[list[int]] = [[] for _ in range(G)]
    jobs_r: list[list[np.ndarray]] = [[] for _ in range(G)]
    jobs_o: list[list[tuple[int, int]]] = [[] for _ in range(G)]
    jobs_s: list[list[int]] = [[] for _ in range(G)]
    for s in range(len(it)):
        x0, y0, x1, y1 = r[s]
        if item_slabs:
            ox = min(max(int(x0), 0), ox_max)
            oy = min(max(int(y0), 0), oy_max)
            g = min(ox // SW, G - 1)
            jobs_i[g].append(it[s, 0])
            jobs_r[g].append(r[s])
            jobs_o[g].append((ox, oy))
            jobs_s[g].append(s)
            continue
        hull = plan.hulls[s] if plan.hulls else None
        ys = range(max(int(y0), 0), max(int(min(y1, plan.out_h)), 0), TH)
        xs = range(max(int(x0), 0), max(int(min(x1, plan.out_w)), 0), TW)
        for oy in ys:
            oy = min(oy, oy_max)
            for ox in xs:
                ox = min(ox, ox_max)
                if hull is not None and not _poly_rect_intersects(
                    hull, ox, oy, ox + TW, oy + TH
                ):
                    continue
                g = min(ox // SW, G - 1)
                jobs_i[g].append(it[s, 0])
                jobs_r[g].append(r[s])
                jobs_o[g].append((ox, oy))
                jobs_s[g].append(s)

    band_jobs = []
    for g in range(G):
        if jobs_i[g]:
            band_jobs.append((
                np.asarray(jobs_i[g], np.int32),
                np.asarray(jobs_r[g], np.float32),
                np.asarray(jobs_o[g], np.int32),
                np.asarray(jobs_s[g], np.int32),
            ))
        else:
            band_jobs.append((
                np.zeros(0, np.int32),
                np.zeros((0, 4), np.float32),
                np.zeros((0, 2), np.int32),
                np.zeros(0, np.int32),
            ))
    return G, SW, Hp, Wp, TH, TW, band_jobs


def blend_linear(imgs: jnp.ndarray, plan: RenderPlan, ordered: bool,
                 packed_gather: bool = False,
                 item_slabs: bool = True) -> jnp.ndarray:
    """imgs: [N, Hp, Wp, 3] stack padded with the INVALID sentinel beyond
    each image's (whs) extent.  Returns the blended [out_h, out_w, 3] canvas
    with INVALID where nothing was rendered.

    One scan step per job accumulates into the canvas.  Default geometry is
    ONE max-bbox slab job per render item — a single large gather per item
    is ~1.5x faster than covering the bbox with [256,256] tiles on TPU
    (gather throughput grows with op size); set item_slabs=False for the
    tile cover (less overdraw when item bboxes vary wildly)."""
    G, SW, Hp, Wp, TH, TW, band_jobs = _tile_jobs(
        plan, groups=4, item_slabs=item_slabs
    )
    imgs = pack_imgs_u8(imgs) if packed_gather else pair_imgs_x(imgs)
    idx = np.concatenate([b[0] for b in band_jobs])
    rng = np.concatenate([b[1] for b in band_jobs])
    org = np.concatenate([b[2] for b in band_jobs])
    color_acc = jnp.zeros((Hp, Wp, 3), jnp.float32)
    w_acc = jnp.zeros((Hp, Wp), jnp.float32)
    color_acc, w_acc = _blend_group(
        color_acc, w_acc, imgs,
        jnp.asarray(plan.homo_invs),
        jnp.asarray(plan.whs, jnp.float32),
        jnp.asarray(idx),
        jnp.asarray(rng),
        jnp.asarray(org),
        jnp.asarray(plan.proj_min, jnp.float32),
        jnp.asarray(plan.resolution, jnp.float32),
        plan.proj, ordered, TH, TW,
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


@jax.jit
def pair_imgs_x(imgs: jnp.ndarray) -> jnp.ndarray:
    """[N,H,W,3] -> [N,H,W-1,6] with img6[y,x] = img[y,x] | img[y,x+1].

    Halves the number of gather ops per bilinear sample (2 row taps of 6
    channels instead of 4 taps of 3): TPU gather cost has a strong
    per-op component — measured 37 ms vs 54 ms for 700k random samples
    on a 867x1300 image.  Doubles image HBM, converted on device."""
    return jnp.concatenate([imgs[:, :, :-1], imgs[:, :, 1:]], axis=-1)


def _sample_bilinear_paired(img6, y, x):
    """sample_bilinear over the x-paired 6-channel layout (pair_imgs_x).
    img6: [H, W-1, 6]; bounds follow the ORIGINAL width W = img6.shape[1]+1.
    Same sentinel semantics as ops.imgproc.sample_bilinear."""
    from ..ops.imgproc import bilinear_prologue

    h = img6.shape[0]
    w = img6.shape[1] + 1
    inb, iy, ix, ry, rx = bilinear_prologue(h, w, y, x)
    a = img6[iy, ix]          # p00 | p01
    b = img6[iy + 1, ix]      # p10 | p11
    ok = (a[..., 0] >= 0) & (a[..., 3] >= 0) \
        & (b[..., 0] >= 0) & (b[..., 3] >= 0)
    valid = inb & ok
    top = a[..., :3] * (1 - rx) + a[..., 3:] * rx
    bot = b[..., :3] * (1 - rx) + b[..., 3:] * rx
    color = top * (1 - ry) + bot * ry
    return jnp.where(valid[..., None], color, INVALID), valid


def _sample_bilinear_packed(img_i32, y, x):
    """sample_bilinear over an R|G|B|valid-packed int32 image."""
    from ..ops.imgproc import bilinear_prologue

    h, w = img_i32.shape[0], img_i32.shape[1]
    inb, iy, ix, ry, rx = bilinear_prologue(h, w, y, x)
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


# experiment: evaluate the inverse projection map exactly only on a coarse
# GSxGS grid per tile and bilinearly interpolate the source coordinates in
# between — kills the per-pixel trig/einsum/divide.  Interpolation error of
# the post-divide map is ~GS^2/(8*focal_px) (< 0.02 px for GS=16 at
# pano-typical focals); behind-lens handling interpolates z and masks z>0.
_BLEND_GRID = _os.environ.get("OPENPANO_BLEND_GRID", "0") == "1"
_GS = 16


def _inverse_map_grid(proj2homo, hinv, wh, ox, oy, resolution, proj_min,
                      BH: int, BW: int):
    """(sx, sy, z) [BH, BW]: exact map at (BH/GS+1)x(BW/GS+1) grid corners,
    bilinear in between."""
    ngy, ngx = BH // _GS + 1, BW // _GS + 1
    gx = (ox.astype(jnp.float32) + jnp.arange(ngx, dtype=jnp.float32) * _GS)
    gy = (oy.astype(jnp.float32) + jnp.arange(ngy, dtype=jnp.float32) * _GS)
    cx = gx * resolution[0] + proj_min[0]
    cy = gy * resolution[1] + proj_min[1]
    cgrid = jnp.stack(
        [jnp.broadcast_to(cx[None, :], (ngy, ngx)),
         jnp.broadcast_to(cy[:, None], (ngy, ngx))], axis=-1
    )
    hm = proj2homo(cgrid)
    ret = jnp.einsum("hwc,dc->hwd", hm, hinv.astype(jnp.float32))
    zg = ret[..., 2]
    zs = jnp.where(jnp.abs(zg) > 1e-20, zg, 1e-20)
    sxg = ret[..., 0] / zs + wh[0] * 0.5
    syg = ret[..., 1] / zs + wh[1] * 0.5

    fy = (jnp.arange(_GS, dtype=jnp.float32) / _GS)[:, None, None, None]
    fx = (jnp.arange(_GS, dtype=jnp.float32) / _GS)[None, :, None, None]

    def up(g):
        # cell corners [nty, ntx] -> dense [BH, BW]
        c00 = g[:-1, :-1]
        c01 = g[:-1, 1:]
        c10 = g[1:, :-1]
        c11 = g[1:, 1:]
        v = (c00 * (1 - fy) * (1 - fx) + c01 * (1 - fy) * fx
             + c10 * fy * (1 - fx) + c11 * fy * fx)   # [GS,GS,nty,ntx]
        return v.transpose(2, 0, 3, 1).reshape(BH, BW)

    # z is only consumed by the behind-lens z>0 test; interpolating across
    # a sign change would produce garbage coords that can land in-bounds,
    # so use the conservative cell-min (the z=0 horizon never intersects a
    # finite item bbox — projected border points there lie at infinity)
    zc = jnp.minimum(
        jnp.minimum(zg[:-1, :-1], zg[:-1, 1:]),
        jnp.minimum(zg[1:, :-1], zg[1:, 1:]),
    )
    zfull = jnp.repeat(jnp.repeat(zc, _GS, 0), _GS, 1)
    return up(sxg), up(syg), zfull


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
    return _blend_scan(color_acc, w_acc, imgs, homo_invs, whs, item_idx,
                       ranges, origins, proj_min, resolution, proj, ordered,
                       BH, BW, slice_x0=None)


def _blend_scan(color_acc, w_acc, imgs, homo_invs, whs, item_idx, ranges,
                origins, proj_min, resolution, proj: str, ordered: bool,
                BH: int, BW: int, slice_x0=None):
    """Core tile-job scan.  ``slice_x0`` (traced int32) shifts the canvas
    x-origin of the accumulator writes — the mesh-sharded blender
    accumulates into a local column strip while the projection math keeps
    global canvas coordinates."""
    _, proj2homo = PROJECTIONS[proj]
    packed = imgs.ndim == 3
    paired = (not packed) and imgs.shape[-1] == 6
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
        if _BLEND_GRID:
            sx, sy, z = _inverse_map_grid(
                proj2homo, hinv, wh, ox, oy, resolution, proj_min, BH, BW
            )
        else:
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
        elif paired:
            color, ok = _sample_bilinear_paired(img, sy, sx)
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
        oxs = ox if slice_x0 is None else ox - slice_x0
        cur_c = jax.lax.dynamic_slice(color_acc, (oy, oxs, zero), (BH, BW, 3))
        cur_w = jax.lax.dynamic_slice(w_acc, (oy, oxs), (BH, BW))
        color_acc = jax.lax.dynamic_update_slice(color_acc, cur_c + wc, (oy, oxs, zero))
        w_acc = jax.lax.dynamic_update_slice(w_acc, cur_w + wm, (oy, oxs))
        return (color_acc, w_acc), None

    (color_acc, w_acc), _ = jax.lax.scan(
        step, (color_acc, w_acc), (item_idx, ranges, origins)
    )
    return color_acc, w_acc


@functools.partial(jax.jit, static_argnames=("out_h", "SW"))
def _strip_planes_u8(color_acc, w_acc, start, out_h: int, SW: int):
    """Finalized column strip [start, start+SW) -> download-codec planes
    [4*out_h, SW] u8: (G, R-G, B-G, A) stacked along rows.  The chroma
    differences (mod 256) delta-code much tighter than raw R/B (classic
    lossless color decorrelation), the alpha plane is near-free, and row
    stacking is safe because the codec's deltas never cross rows.  Exact
    inverse: R = G + (R-G), B = G + (B-G) mod 256
    (_planes_to_rgba)."""
    zero = jnp.int32(0)
    c = jax.lax.dynamic_slice(color_acc, (zero, start, zero),
                              (out_h, SW, 3))
    w = jax.lax.dynamic_slice(w_acc, (zero, start), (out_h, SW))
    has = w > 0
    out = c / jnp.where(has, w, 1.0)[..., None]
    u8 = jnp.round(jnp.clip(out, 0.0, 1.0) * 255.0).astype(jnp.int32)
    rgb = jnp.where(has[..., None], u8, 255)
    g = rgb[..., 1]
    rg = (rgb[..., 0] - g) & 0xFF
    bg = (rgb[..., 2] - g) & 0xFF
    a = has.astype(jnp.int32)
    return jnp.concatenate([g, rg, bg, a], axis=0).astype(jnp.uint8)


def _planes_to_rgba(planes: np.ndarray, out_h: int) -> np.ndarray:
    """Inverse of _strip_planes_u8 on host: [4*out_h, SW] u8 -> RGBA u8."""
    g = planes[:out_h]
    rg = planes[out_h: 2 * out_h]
    bg = planes[2 * out_h: 3 * out_h]
    a = planes[3 * out_h:]
    rgba = np.empty((out_h, planes.shape[1], 4), np.uint8)
    rgba[..., 0] = g + rg  # u8 wraparound == mod 256
    rgba[..., 1] = g
    rgba[..., 2] = g + bg
    rgba[..., 3] = a
    return rgba


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
                           packed_gather: bool = False,
                           item_slabs: bool = True) -> np.ndarray:
    """Streamed linear blend straight to a host RGBA uint8 canvas.

    Jobs (item slabs by default — see blend_linear) are split into
    `groups` column bands by x-origin; later bands never write columns
    < their own strip start, so after band g's accumulation strip g is
    final — it is normalized + u8-packed on device and its host copy
    starts (copy_to_host_async) while later bands still compute, hiding
    most of the slow tunnel download behind blend work."""
    G, SW, Hp, Wp, TH, TW, band_jobs = _tile_jobs(
        plan, groups=groups, item_slabs=item_slabs
    )
    imgs = pack_imgs_u8(imgs) if packed_gather else pair_imgs_x(imgs)

    # fixed per-group job capacity keeps one compiled _blend_group shape;
    # dummies have empty bboxes (fully masked no-ops)
    IC = max(max(len(b[0]) for b in band_jobs), 1)
    g_idx = np.zeros((G, IC), np.int32)
    g_rng = np.zeros((G, IC, 4), np.float32)
    g_org = np.zeros((G, IC, 2), np.int32)
    for g, (bi, br, bo, _sid) in enumerate(band_jobs):
        g_idx[g, : len(bi)] = bi
        g_rng[g, : len(bi)] = br
        g_org[g, : len(bi)] = bo

    color_acc = jnp.zeros((Hp, Wp, 3), jnp.float32)
    w_acc = jnp.zeros((Hp, Wp), jnp.float32)
    homo_invs = jnp.asarray(plan.homo_invs)
    whs = jnp.asarray(plan.whs, jnp.float32)
    proj_min = jnp.asarray(plan.proj_min, jnp.float32)
    resolution = jnp.asarray(plan.resolution, jnp.float32)

    coded = _os.environ.get("OPENPANO_CODED_DOWNLOAD", "1") == "1"
    parts: list = [None] * G
    strips = []
    for g in range(G):
        color_acc, w_acc = _blend_group(
            color_acc, w_acc, imgs, homo_invs, whs,
            jnp.asarray(g_idx[g]), jnp.asarray(g_rng[g]),
            jnp.asarray(g_org[g]), proj_min, resolution,
            plan.proj, ordered, TH, TW,
        )
        if coded:
            from ..io.wirecodec import CodedFetch

            planes = _strip_planes_u8(
                color_acc, w_acc, jnp.int32(g * SW), plan.out_h, SW
            )
            strips.append(CodedFetch(planes))
        else:
            strip = _strip_u8_i32(
                color_acc, w_acc, jnp.int32(g * SW), plan.out_h, SW
            )
            strip.copy_to_host_async()
            strips.append(strip)

    if coded:
        # drain in band order AFTER the full dispatch: strip g's wire
        # (nibbles + inline exceptions + count in ONE transfer) arrives
        # while later bands compute; each C decode overlaps the next
        # strip's wire flight
        parts = [_planes_to_rgba(s.wait(), plan.out_h) for s in strips]
    else:
        parts = [np.asarray(s).view(np.uint8).reshape(plan.out_h, SW, 4)
                 for s in strips]
    return np.concatenate(parts, axis=1)[:, : plan.out_w]


def blend_linear_sharded(imgs: jnp.ndarray, plan: RenderPlan, ordered: bool,
                         mesh) -> np.ndarray:
    """Mesh-sharded linear blend: the canvas/sequence-parallel analog
    (SURVEY.md §5.7 — "shard the output canvas into tiles distributed over
    the mesh; each device blends only images whose projected bbox
    intersects its tiles").

    One column band per device: device g owns canvas columns
    [g*SW, (g+1)*SW) and runs exactly the band-g tile jobs of `_tile_jobs`
    into a local strip with a TW halo.  A band-g tile can spill at most TW
    columns into strip g+1 (SW >= TW is enforced), so a single ppermute of
    the halo over the mesh axis (ICI neighbor exchange — the system's only
    halo) completes the accumulation exactly.  Same per-pixel math as
    `blend_linear`; device count only changes f32 accumulation *order*.

    Image memory shards too: each device receives only the images its
    band's jobs reference, gathered into a [G, NI, H, W, 3] band-sliced
    stack (NI = max distinct images per band, typically ~N/G + overlap) —
    so adding devices adds both canvas AND image capacity.

    ``imgs`` may be a DEVICE array (the regroup gather runs on device —
    fine when the full stack fits one HBM) or a HOST numpy array (u8 or
    f32): then each band's slice is gathered in host memory and uploaded
    straight to its own device via a band-sharded device_put, so the full
    image stack NEVER exists in any single device's memory — the
    beyond-one-HBM scale path (reference memory model: LAZY_READ,
    README.md:133-136; canvas guards stitcher_image.cc:105-106).  uint8
    input stays uint8 on the wire (4x cheaper) and converts per band on
    device.

    Returns the blended [out_h, out_w, 3] canvas (host numpy, INVALID where
    empty)."""
    axis = mesh.axis_names[0]
    nd = int(mesh.devices.size)
    G, SW, Hp, Wp, TH, TW, band_jobs = _tile_jobs(plan, groups=nd, exact=True)
    assert G == nd

    # pad per-band job lists to one fixed capacity (dummies: empty bboxes)
    # and remap job image indices into each band's own image slice
    IC = max(max(len(b[0]) for b in band_jobs), 1)
    band_imgs = [np.unique(b[0]) if len(b[0]) else np.zeros(1, np.int64)
                 for b in band_jobs]
    NI = max(len(u) for u in band_imgs)
    g_map = np.zeros((G, NI), np.int32)       # band slot -> global image
    g_idx = np.zeros((G, IC), np.int32)       # job -> band slot
    g_rng = np.zeros((G, IC, 4), np.float32)
    g_org = np.zeros((G, IC, 2), np.int32)
    for g, (bi, br, bo, _sid) in enumerate(band_jobs):
        u = band_imgs[g]
        g_map[g, : len(u)] = u
        g_idx[g, : len(bi)] = np.searchsorted(u, bi)
        g_rng[g, : len(bi)] = br
        g_org[g, : len(bi)] = bo

    if isinstance(imgs, np.ndarray):
        # host path: band-slice in host RAM, upload each band straight to
        # its device — no device ever sees the [N, H, W, 3] full stack
        from jax.sharding import NamedSharding, PartitionSpec as P

        band_sh = NamedSharding(mesh, P(axis))
        u8 = imgs.dtype == np.uint8
        imgs_b = _device_put_banded(
            np.ascontiguousarray(imgs[g_map]), band_sh)
        hinv_b = jax.device_put(plan.homo_invs[g_map], band_sh)
        whs_b = jax.device_put(
            plan.whs[g_map].astype(np.float32), band_sh)
        run = _sharded_blend_program(mesh, axis, nd, Hp, SW, TH, TW,
                                     plan.proj, ordered,
                                     pre_sliced=True, u8=u8)
        canvas = run(
            imgs_b, jnp.asarray(g_idx), jnp.asarray(g_rng),
            jnp.asarray(g_org), hinv_b, whs_b,
            jnp.asarray(plan.proj_min, jnp.float32),
            jnp.asarray(plan.resolution, jnp.float32),
        )
    else:
        run = _sharded_blend_program(mesh, axis, nd, Hp, SW, TH, TW,
                                     plan.proj, ordered)
        canvas = run(
            imgs.astype(jnp.float32), jnp.asarray(g_map),
            jnp.asarray(g_idx), jnp.asarray(g_rng), jnp.asarray(g_org),
            jnp.asarray(plan.homo_invs), jnp.asarray(plan.whs, jnp.float32),
            jnp.asarray(plan.proj_min, jnp.float32),
            jnp.asarray(plan.resolution, jnp.float32),
        )
    return np.asarray(canvas)[: plan.out_h, : plan.out_w]


@functools.partial(
    jax.jit,
    static_argnames=("proj", "ordered", "TH", "TW", "Hp", "SW", "u8",
                     "u8_out"),
)
def _host_band_step(band_imgs, idx, rng, org, hinv, whs, proj_min,
                    resolution, halo_c, halo_w, x0,
                    proj: str, ordered: bool, TH: int, TW: int,
                    Hp: int, SW: int, u8: bool, u8_out: bool = False):
    """One column band of the single-device beyond-HBM blend: accumulate
    the band's jobs from its own (just-uploaded) image slice, fold in the
    previous band's spill halo, and emit (final strip, next halo).

    ``u8_out=True`` emits the strip as the download-codec plane layout
    (G, R-G, B-G, A stacked rows, _strip_planes_u8 semantics) instead of
    the f32 canvas — 12 B/px raw f32 would dominate a gigapixel run's
    wall clock on this wire."""
    band = band_imgs.astype(jnp.float32) / 255.0 if u8 else band_imgs
    paired = pair_imgs_x(band)
    c = jnp.zeros((Hp, SW + TW, 3), jnp.float32)
    w = jnp.zeros((Hp, SW + TW), jnp.float32)
    c, w = _blend_scan(c, w, paired, hinv, whs, idx, rng, org,
                       proj_min, resolution, proj, ordered, TH, TW,
                       slice_x0=x0)
    c = c.at[:, :TW].add(halo_c)
    w = w.at[:, :TW].add(halo_w)
    if u8_out:
        planes = _strip_planes_u8(c, w, jnp.int32(0), Hp, SW)
        return planes, c[:, SW:], w[:, SW:]
    strip_c, strip_w = c[:, :SW], w[:, :SW]
    has = strip_w > 0
    out = jnp.where(
        has[..., None],
        strip_c / jnp.where(has, strip_w, 1.0)[..., None],
        INVALID,
    )
    return out, c[:, SW:], w[:, SW:]


def _device_put_planar_coded(band: np.ndarray):
    """Upload a [NI, H, W, 3] u8 band slice via the 4-bit wire codec:
    channel-planar rows ([NI*3*H, W], deltas never cross rows) encode in
    threaded C, decode on device, reshape back.  Falls back to a raw put
    when the content defeats the nibble budget."""
    from ..io.wirecodec import upload_u8_rows

    ni, h, w, _ = band.shape
    planar = np.ascontiguousarray(np.moveaxis(band, 3, 1)).reshape(-1, w)
    dev = upload_u8_rows(planar)
    return jnp.moveaxis(dev.reshape(ni, 3, h, w), 1, 3)


def blend_linear_host_stream(imgs: np.ndarray, plan: RenderPlan,
                             ordered: bool, groups: int,
                             u8_out: bool = False,
                             coded_wire: bool | None = None) -> np.ndarray:
    """Beyond-HBM linear blend on ONE device.

    The mesh-sharded blender bounds per-device memory by giving each
    device one column band and a single neighbor halo ppermute
    (blend_linear_sharded); this is its mesh=1 degenerate run
    SEQUENTIALLY: band g's image slice uploads from HOST RAM, its strip
    blends and downloads, its spill columns carry to band g+1 as a
    host-side loop variable (the halo exchange in time instead of space).
    Peak device memory is one band's image slice + one [Hp, SW+TW]
    accumulator pair, independent of N — the reference's LAZY_READ
    load -> accumulate -> release model (blender.cc:38-76,
    README.md:133-136) for image sets larger than one HBM.

    imgs: HOST numpy [N, H, W, 3] u8 or f32.  Returns the blended
    [out_h, out_w, 3] f32 canvas (host, INVALID where empty) — or, with
    ``u8_out=True``, a [out_h, out_w, 4] u8 RGBA canvas whose strips
    cross the wire through the download codec (f32 strips are 12 B/px;
    coded u8 planes are ~2.3 B/px — the difference IS the wall clock of
    a gigapixel run).  ``coded_wire`` (default: follow u8_out) also
    routes the band-slice UPLOADS through the 4-bit codec."""
    G, SW, Hp, Wp, TH, TW, band_jobs = _tile_jobs(
        plan, groups=groups, exact=True
    )
    assert G == groups
    IC = max(max(len(b[0]) for b in band_jobs), 1)
    band_imgs = [np.unique(b[0]) if len(b[0]) else np.zeros(1, np.int64)
                 for b in band_jobs]
    NI = max(len(u) for u in band_imgs)
    u8 = imgs.dtype == np.uint8
    if coded_wire is None:
        coded_wire = u8_out and u8

    proj_min = jnp.asarray(plan.proj_min, jnp.float32)
    resolution = jnp.asarray(plan.resolution, jnp.float32)
    halo_c = jnp.zeros((Hp, TW, 3), jnp.float32)
    halo_w = jnp.zeros((Hp, TW), jnp.float32)
    strips = []
    for g, (bi, br, bo, _sid) in enumerate(band_jobs):
        u = band_imgs[g]
        slot = np.zeros(NI, np.int64)
        slot[: len(u)] = u
        idx = np.zeros(IC, np.int32)
        rng = np.zeros((IC, 4), np.float32)
        org = np.zeros((IC, 2), np.int32)
        idx[: len(bi)] = np.searchsorted(u, bi)
        rng[: len(bi)] = br
        org[: len(bi)] = bo
        band_host = np.ascontiguousarray(imgs[slot])
        if coded_wire and u8:
            band_slice = _device_put_planar_coded(band_host)
        else:
            band_slice = jax.device_put(band_host)
        strip, halo_c, halo_w = _host_band_step(
            band_slice, jnp.asarray(idx), jnp.asarray(rng),
            jnp.asarray(org), jnp.asarray(plan.homo_invs[slot]),
            jnp.asarray(plan.whs[slot], jnp.float32), proj_min, resolution,
            halo_c, halo_w, jnp.int32(g * SW),
            proj=plan.proj, ordered=ordered, TH=TH, TW=TW, Hp=Hp, SW=SW,
            u8=u8, u8_out=u8_out,
        )
        if u8_out:
            from ..io.wirecodec import CodedFetch

            strips.append(CodedFetch(strip))
            # drain with a one-band lag: wait() releases the previous
            # band's plane + wire device buffers while this band's jobs
            # execute — without it 16+ bands of retained strip planes
            # exhaust HBM on the gigapixel config
            if len(strips) >= 2 and strips[-2] is not None:
                strips[-2] = _planes_to_rgba(strips[-2].wait(), Hp)
        else:
            strip.copy_to_host_async()
            strips.append(strip)
        del band_slice
    if u8_out:
        parts = [s if isinstance(s, np.ndarray)
                 else _planes_to_rgba(s.wait(), Hp) for s in strips]
        canvas = np.concatenate(parts, axis=1)
        return canvas[: plan.out_h, : plan.out_w]
    canvas = np.concatenate([np.asarray(s) for s in strips], axis=1)
    return canvas[: plan.out_h, : plan.out_w]


def _device_put_banded(host_arr: np.ndarray, band_sharding):
    """Upload a [G, ...] host array band-sharded (shard g goes straight to
    device g; no full-stack device buffer).  A seam so tests can observe
    exactly what the beyond-HBM path puts on devices."""
    return jax.device_put(host_arr, band_sharding)


@functools.lru_cache(maxsize=32)
def _sharded_blend_program(mesh, axis: str, nd: int, Hp: int, SW: int,
                           TH: int, TW: int, proj: str, ordered: bool,
                           pre_sliced: bool = False, u8: bool = False):
    """Build (and cache) the jitted shard_map program for one band
    geometry — module-level cache so repeated calls with the same mesh
    and canvas geometry reuse the compiled executable instead of
    retracing a fresh closure every time.

    pre_sliced: the caller already provides [G, NI, ...] band-sharded
    image slices (the beyond-HBM host upload path) — skip the on-device
    regroup gather.  u8: slices arrive uint8 and convert per band."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    band_sh = NamedSharding(mesh, P(axis))

    def body(imgs, idx, rng, org, homo_invs, whs, proj_min, resolution):
        g = jax.lax.axis_index(axis)
        # mark the accumulators device-varying (each device's strip
        # holds different data) so the scan carry types line up
        color_acc = jax.lax.pcast(
            jnp.zeros((Hp, SW + TW, 3), jnp.float32), (axis,), to="varying"
        )
        w_acc = jax.lax.pcast(
            jnp.zeros((Hp, SW + TW), jnp.float32), (axis,), to="varying"
        )
        band = imgs[0]
        if u8:
            band = band.astype(jnp.float32) / 255.0
        # pair AFTER the band slice (pairing is per image, so it commutes
        # with the slice) — the 2x paired stack exists only per band
        imgs_paired = pair_imgs_x(band)
        color_acc, w_acc = _blend_scan(
            color_acc, w_acc, imgs_paired, homo_invs[0], whs[0],
            idx[0], rng[0], org[0], proj_min, resolution,
            proj, ordered, TH, TW,
            slice_x0=(g * SW).astype(jnp.int32),
        )
        # neighbor halo exchange: strip g's spill-over columns belong
        # to strip g+1 (the last strip never spills: Wp covers ox+TW)
        perm = [(i, i + 1) for i in range(nd - 1)]
        halo_c = jax.lax.ppermute(color_acc[:, SW:], axis, perm)
        halo_w = jax.lax.ppermute(w_acc[:, SW:], axis, perm)
        color_acc = color_acc.at[:, :TW].add(halo_c)
        w_acc = w_acc.at[:, :TW].add(halo_w)
        strip_c = color_acc[:, :SW]
        strip_w = w_acc[:, :SW]
        has = strip_w > 0
        out = strip_c / jnp.where(has, strip_w, 1.0)[..., None]
        return jnp.where(has[..., None], out, INVALID)

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(), P()),
        out_specs=P(None, axis),
    )

    if pre_sliced:
        # beyond-HBM path: the caller uploads [G, NI, ...] band slices
        # straight from host RAM — no full-stack device operand anywhere
        @jax.jit
        def run_presliced(imgs_b, idx, rng, org, hinv_b, whs_b, proj_min,
                          resolution):
            return sharded(imgs_b, idx, rng, org, hinv_b, whs_b,
                           proj_min, resolution)

        return run_presliced

    @jax.jit
    def run(imgs, g_map, idx, rng, org, homo_invs, whs, proj_min,
            resolution):
        # band-slice the per-image data so each device holds only the
        # images its jobs reference ([G, NI, ...], sharded over bands) —
        # steady-state image memory scales with devices (this device-side
        # gather materializes its full-stack operand once, so it's only
        # for sets that fit one HBM; pass host numpy images to
        # blend_linear_sharded for the beyond-HBM band-upload path)
        imgs_b = jax.lax.with_sharding_constraint(imgs[g_map], band_sh)
        hinv_b = jax.lax.with_sharding_constraint(homo_invs[g_map], band_sh)
        whs_b = jax.lax.with_sharding_constraint(whs[g_map], band_sh)
        return sharded(imgs_b, idx, rng, org, hinv_b, whs_b,
                       proj_min, resolution)

    return run


def blend(imgs: jnp.ndarray, plan: RenderPlan, ordered: bool, multiband: int) -> jnp.ndarray:
    """Blender dispatch (ConnectedImages::blend, stitcher_image.cc:131-136):
    MultiBand when multiband > 0, else Linear."""
    if multiband > 0:
        from .multiband import blend_multiband

        return blend_multiband(imgs, plan, multiband)
    import os

    packed = os.environ.get("OPENPANO_PACKED_GATHER", "0") == "1"
    return blend_linear(imgs, plan, ordered, packed_gather=packed)
