"""CYLINDER-mode stitcher.

Reference: stitch/cylstitcher.{hh,cc}.  Pipeline (cylstitcher.cc:20-28):
features -> adjacent-pair matching -> h-factor straightening search ->
cylindrical pre-warp of all images -> chain pairwise affine transforms from
the middle image -> flat-projection linear blend -> perspective correction.

Host/device split: homography chaining, slope metric, and the <=4-step
h-factor search (cylstitcher.cc:46-62, 89-137) are microscopic host math;
everything batched — feature extraction, adjacent matching, keypoint
warping, per-pair RANSAC (vmapped over ALL adjacent pairs at once), image
warping, blending — runs on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..geometry.dlt import perspective_dlt
from ..io.transfer import fetch
from ..geometry.ransac import MatchInfo, estimate_transform_batch
from ..match.matcher import MatchResult, match_adjacent_pairs
from ..ops.imgproc import sample_bilinear, INVALID
from .render import plan_render, blend
from .stitcherbase import compute_features, upload_and_compute_features
from .warp import make_projector, warp_keypoints, warp_image


def _tree_map(f, *trees):
    return jax.tree_util.tree_map(f, *trees)


def _slice_pairs(m: MatchResult, lo: int, hi: int) -> MatchResult:
    return _tree_map(lambda a: a[lo:hi], m)


def _reverse_matches(m: MatchResult) -> MatchResult:
    return MatchResult(idx=m.idx[..., ::-1], valid=m.valid, count=m.count)


def _estimate_chain(matches: MatchResult, pos: jnp.ndarray, valid: jnp.ndarray,
                    whs: np.ndarray, ii, jj, key, cfg: Config) -> MatchInfo:
    return estimate_transform_batch(
        matches, pos, valid, jnp.asarray(whs, jnp.float32),
        jnp.asarray(ii), jnp.asarray(jj), key, cfg, affine=True,
    )


def stitch_cylinder(imgs: np.ndarray, cfg: Config, key=None,
                    mesh=None) -> np.ndarray:
    """imgs: [n, H, W, 3] float32 in [0,1] (uniform shape).  Returns the
    stitched RGB canvas (float32, INVALID=-1 where empty, pre-crop).

    mesh: a jax.sharding.Mesh — runs the device stages sharded over its
    first axis: features data-parallel over images (batch-sharded upload,
    so no device holds the full stack), the cylindrical image warp
    data-parallel over images, and the flat-projection blend over canvas
    column bands (render.blend_linear_sharded / multiband sharded).  The
    h-factor search and homography chaining are microscopic host math
    either way (cylstitcher.cc:46-62)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    if mesh is not None:
        from .stitcherbase import compute_features_sharded

        imgs, feats = compute_features_sharded(imgs, cfg, mesh)
    elif isinstance(imgs, np.ndarray) and imgs.dtype == np.uint8:
        # wire-codec'd grey upload feeds SIFT; the full-res RGB streams in
        # the background and joins before the warp (stitcherbase docs)
        imgs, feats = upload_and_compute_features(imgs, cfg)
        imgs.start_background()  # chroma stream rides under the h-search
    else:
        imgs = jnp.asarray(imgs, jnp.float32)
        feats = compute_features(imgs, cfg)
    n, H, W = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    mid = n >> 1
    matches = match_adjacent_pairs(feats.desc, feats.valid, cfg)  # [n-1] pairs

    # ---- h-factor straightening search (cylstitcher.cc:31-62) ----
    kpos = feats.pos          # [n, K, 2] half-shifted, unwarped
    kvalid = feats.valid

    state = {"minslope": np.inf, "bestfactor": 1.0, "bestmat": None}

    def update_h_factor(factor: float, trial_key) -> float:
        """cylstitcher.cc:89-137 — returns the drift slope for this factor,
        updating the best chain if |slope| improved.  0.0 signals failure."""
        projf = make_projector(W, H, factor, cfg)
        wkpos = warp_keypoints(projf, kpos, W, H)
        wwh = np.repeat([[projf.out_w, projf.out_h]], n, 0).astype(np.float32)
        # pairs (k-1, k) for k in [mid+1, n)
        ii = np.arange(mid, n - 1)
        jj = ii + 1
        infos = _estimate_chain(
            _slice_pairs(matches, mid, n - 1), wkpos, kvalid, wwh, ii, jj,
            trial_key, cfg,
        )
        if bool(np.any(np.asarray(infos.confidence) <= 0)):
            return 0.0
        homos = np.asarray(infos.homo, np.float64)     # [len-1] k -> k-1 frame
        chain = []
        acc = np.eye(3)
        for hm in homos:
            acc = acc @ hm                              # nowmat[k] -> mid frame
            chain.append(acc.copy())
        c2 = chain[-1] @ np.array([0.0, 0.0, 1.0])
        c2 = c2[:2] / c2[2]
        slope = c2[1] / c2[0]
        if abs(slope) < state["minslope"]:
            state["minslope"] = abs(slope)
            state["bestfactor"] = factor
            state["bestmat"] = chain
        return float(slope)

    keys = jax.random.split(key, 8)
    if n - mid > 1:
        newfactor = 1.0
        slope = update_h_factor(newfactor, keys[0])
        if state["bestmat"] is None:
            raise RuntimeError("Failed to find hfactor")
        centerx2 = state["bestmat"][0] @ np.array([0.0, 0.0, 1.0])
        order = 1.0 if (centerx2[0] / centerx2[2]) > 0 else -1.0
        for k in range(3):
            if abs(slope) < cfg.SLOPE_PLAIN:
                break
            newfactor += (order if slope < 0 else -order) / (5 * 2 ** k)
            slope = update_h_factor(newfactor, keys[1 + k])

    bestfactor = state["bestfactor"]
    proj = make_projector(W, H, bestfactor, cfg)
    wW, wH = proj.out_w, proj.out_h

    # ---- warp all images + keypoints (cylstitcher.cc:64-67) ----
    # with a mesh the batch axis stays sharded (GSPMD partitions the
    # pure-vmap warp with no collectives)
    from .stitcherbase import DeferredImages

    if isinstance(imgs, DeferredImages):
        imgs = imgs.get()  # join the background RGB wire stream
    warped = jax.jit(jax.vmap(
        lambda im: warp_image(proj, im, wH, wW, W, H)
    ))(imgs)
    wkpos = warp_keypoints(proj, kpos, W, H)
    wwh = np.repeat([[wW, wH]], n, 0).astype(np.float32)

    # ---- accumulate homographies (cylstitcher.cc:69-86) ----
    homos = [np.eye(3) for _ in range(n)]
    for k in range(mid + 1, n):
        homos[k] = state["bestmat"][k - mid - 1] if state["bestmat"] else np.eye(3)

    if mid > 0:
        # estimate (i+1 <- i) for i in [0, mid) with reversed matches
        ii = np.arange(1, mid + 1)   # kp1 side: image i+1
        jj = ii - 1                  # kp2 side: image i
        infos = _estimate_chain(
            _reverse_matches(_slice_pairs(matches, 0, mid)), wkpos, kvalid,
            wwh, ii, jj, keys[4], cfg,
        )
        conf = np.asarray(infos.confidence)
        for i in range(mid):
            if conf[i] <= 0:
                raise RuntimeError(f"Failed to match between image {i} and {i + 1}.")
        step = np.asarray(infos.homo, np.float64)  # [mid]: i -> i+1 frame
        for i in range(mid - 1, -1, -1):
            homos[i] = homos[i + 1] @ step[i]

    # ---- flat-projection blend (cylstitcher.cc:24-27) ----
    plan = plan_render(
        np.stack(homos), wwh.astype(np.float64), mid, "flat", cfg.MAX_OUTPUT_SIZE
    )
    if mesh is not None:
        if cfg.MULTIBAND > 0:
            from .multiband import blend_multiband_sharded

            canvas = jnp.asarray(
                blend_multiband_sharded(warped, plan, cfg.MULTIBAND, mesh))
        else:
            from .render import blend_linear_sharded

            canvas = jnp.asarray(
                blend_linear_sharded(warped, plan, ordered=True, mesh=mesh))
    else:
        canvas = blend(warped, plan, ordered=True, multiband=cfg.MULTIBAND)

    return fetch(
        perspective_correction(canvas, plan, np.stack(homos), wwh, mid)
    )


def perspective_correction(canvas: jnp.ndarray, plan, homos: np.ndarray,
                           whs: np.ndarray, mid: int) -> jnp.ndarray:
    """Stretch the panorama's four projected end-corners back to a rectangle
    (cylstitcher.cc:139-180): corners of the first/last image are mapped into
    canvas pixels, a 4-point DLT maps the output rectangle onto them, and the
    canvas is resampled once more.  Unlike the reference we divide by the
    render resolution, so the correction stays valid when MAX_OUTPUT_SIZE
    downscaled the canvas."""
    h, w = canvas.shape[0], canvas.shape[1]

    def to_canvas(img_idx, corner):
        v = np.array([corner[0] * whs[img_idx, 0], corner[1] * whs[img_idx, 1], 1.0])
        p = homos[img_idx] @ v
        p = p[:2] / p[2]
        return (p - plan.proj_min) / plan.resolution

    corners = np.stack([
        to_canvas(0, (-0.5, -0.5)),
        to_canvas(0, (-0.5, 0.5)),
        to_canvas(len(homos) - 1, (0.5, -0.5)),
        to_canvas(len(homos) - 1, (0.5, 0.5)),
    ])
    corners_std = np.array([[0, 0], [0, h], [w, 0], [w, h]], np.float64)
    # host-side f64 DLT (TPU XLA lacks f64 LU decomposition)
    with jax.default_device(jax.devices("cpu")[0]):
        Hc = np.asarray(perspective_dlt(
            jnp.asarray(corners), jnp.asarray(corners_std), jnp.ones(4)
        ))  # output-rect px -> canvas px (raw DLT, no normalization: cylstitcher.cc:166)

    jj = jnp.arange(w, dtype=jnp.float32)
    ii = jnp.arange(h, dtype=jnp.float32)
    grid = jnp.stack(
        [jnp.broadcast_to(jj[None, :], (h, w)), jnp.broadcast_to(ii[:, None], (h, w)),
         jnp.ones((h, w), jnp.float32)], axis=-1
    )
    src = jnp.einsum("hwc,dc->hwd", grid, jnp.asarray(Hc, jnp.float32))
    z = src[..., 2]
    zsafe = jnp.where(jnp.abs(z) > 1e-20, z, 1e-20)
    color, ok = sample_bilinear(canvas, src[..., 1] / zsafe, src[..., 0] / zsafe)
    return jnp.where((ok & (z > 0))[..., None], color, INVALID)
