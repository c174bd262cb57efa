"""General stitcher: ESTIMATE_CAMERA (flagship) and TRANS/naive modes.

Reference: stitch/stitcher.{hh,cc}.  Pipeline (stitcher.cc:32-63):
features -> pairwise (or linear) matching + RANSAC -> center assignment ->
camera estimation w/ incremental BA (or simple homography chaining) ->
spherical (or flat) projection -> blend.

TPU-native: matching and RANSAC for ALL pairs run as one batched device
call each (the reference loops pairs under OpenMP, stitcher.cc:96-114);
camera estimation device-dispatches a single compiled LM kernel over the
incremental schedule; blending is the batched canvas renderer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..camera.camera import estimate_focal, estimate_focal_robust, intrinsic
from ..camera.estimator import estimate_cameras
from ..geometry.ransac import estimate_transform_batch
from ..io.transfer import fetch
from ..match.matcher import match_all_pairs, match_ring_pairs, pair_indices
from ..utils.debug import assert_finite
from ..utils.timer import total_timer
from .render import blend_linear_stream_u8, plan_render, blend
from .stitcherbase import compute_features, upload_and_compute_features


class PairwiseGraph:
    """Host-side n x n match graph (reference: Stitcher::pairwise_matches,
    stitcher.hh:38; both [i][j] and the inverted [j][i] are filled,
    stitcher.cc:88-92)."""

    def __init__(self, n: int, M: int):
        self.n = n
        self.conf = np.zeros((n, n))
        self.homo = np.zeros((n, n, 3, 3))
        self.to_pos = np.zeros((n, n, M, 2))
        self.from_pos = np.zeros((n, n, M, 2))
        self.valid = np.zeros((n, n, M), bool)

    def fill_pair(self, i: int, j: int, confidence: float, homo: np.ndarray,
                  to_pos: np.ndarray, from_pos: np.ndarray, valid: np.ndarray):
        """Per-pair match data (numpy) with homo j->i."""
        if float(confidence) <= 0:
            return False
        H = np.asarray(homo, np.float64)
        Hinv = np.linalg.inv(H)
        Hinv /= Hinv[2, 2]                       # stitcher.cc:79-80
        self.conf[i, j] = self.conf[j, i] = float(confidence)
        self.homo[i, j] = H
        self.homo[j, i] = Hinv
        self.to_pos[i, j] = to_pos
        self.from_pos[i, j] = from_pos
        self.to_pos[j, i] = from_pos
        self.from_pos[j, i] = to_pos
        self.valid[i, j] = self.valid[j, i] = valid
        return True


def build_pairwise_graph(feats, whs, cfg: Config, key, ordered: bool,
                         affine: bool, mesh=None) -> PairwiseGraph:
    """Match + RANSAC over all C(n,2) pairs (or the ordered ring) in two
    batched device calls.  With ``mesh``, the flat pair axis of BOTH
    dispatches shards over the mesh's first axis (descriptors replicated —
    SURVEY.md §5.8 "pairs -> sharded pair blocks"); the pair compaction
    between them is one shared codepath either way."""
    from ..geometry.ransac import ESTIMATE_MIN_NR_MATCH

    n = feats.desc.shape[0]
    # ---- stage 0: shrink the keypoint axis to the data ----
    # Features are prefix-packed by compact_indices (valid slots first),
    # so the [n, MAX_KP_PER_IMAGE, ...] padding can slice down to the
    # largest actual count (next pow2, floor 256).  The 2-NN distance
    # matmuls scale with K^2: the 38-image headline carries ~600 real
    # keypoints in 2048 slots — slicing saves ~16x of the MXU work and
    # most of the match download bytes.
    K_cap = feats.desc.shape[1]
    max_cnt = int(np.asarray(jnp.max(jnp.sum(feats.valid, axis=1))))
    K_eff = 256
    while K_eff < max_cnt:
        K_eff <<= 1
    K_eff = min(K_eff, K_cap)
    if K_eff < K_cap:
        feats = jax.tree_util.tree_map(
            lambda a: a[:, :K_eff]
            if a.ndim >= 2 and a.shape[1] == K_cap else a,
            feats,
        )
    if ordered:
        # (i, i+1) ring including the head-tail wrap pair, which is
        # allowed to fail (linear_pairwise_match, stitcher.cc:116-136)
        ii = list(range(n))
        jj = [(i + 1) % n for i in ii]
    else:
        ii, jj = pair_indices(n)

    # ---- stage 1: 2-NN matching over every candidate pair ----
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]
        nd = int(mesh.devices.size)
        pair_sh = NamedSharding(mesh, P(axis))
        repl = NamedSharding(mesh, P())
        desc_r = jax.device_put(feats.desc, repl)
        valid_r = jax.device_put(feats.valid, repl)
        pos_r = jax.device_put(feats.pos, repl)
        whs_r = jax.device_put(jnp.asarray(whs), repl)
        # pad the pair axis to a mesh multiple with (0, 0) self-pairs;
        # their match counts are masked to 0 so compaction drops them
        r = (-len(ii)) % nd
        ii_p = np.asarray(list(ii) + [0] * r, np.int32)
        jj_p = np.asarray(list(jj) + [0] * r, np.int32)
        with total_timer("match_2nn"):
            res = _match_pairs_jit(
                desc_r, valid_r,
                jax.device_put(jnp.asarray(ii_p), pair_sh),
                jax.device_put(jnp.asarray(jj_p), pair_sh), cfg,
            )
            jax.block_until_ready(res)
        if r:
            pmask = jnp.arange(len(ii_p)) < len(ii)
            res = res._replace(
                valid=res.valid & pmask[:, None],
                count=jnp.where(pmask, res.count, 0),
            )
    else:
        with total_timer("match_2nn"):
            if ordered:
                res = match_ring_pairs(feats.desc, feats.valid, cfg)
            else:
                res = match_all_pairs(feats.desc, feats.valid, cfg)
            jax.block_until_ready(res)

    # ---- stage 2 (shared): compact to pairs that can connect ----
    # pairs below the RANSAC minimum can never connect
    # (transform_estimate.cc:21,39 rejects < ESTIMATE_MIN_NR_MATCH);
    # on an unordered all-pairs graph most pairs share no overlap, so
    # compact the pair list before the expensive hypothesis batch.
    # The tiny count fetch costs one roundtrip; RANSAC + the packed
    # match download then scale with CONNECTED pairs, not C(n,2).
    counts = np.asarray(res.count)
    keep = np.nonzero(counts >= ESTIMATE_MIN_NR_MATCH)[0]
    keys_full = jax.random.split(key, len(ii))   # by ORIGINAL pair slot so
    pair_ii, pair_jj = ii, jj                    # compaction never moves draws
    if len(keep) < len(counts) or mesh is not None:
        # bucketed padded shapes: multiple of 64 and of the mesh size
        mult = 64 if mesh is None else 64 * nd // np.gcd(64, nd)
        pad = -len(keep) % mult if len(keep) else mult
        keep_p = np.concatenate([keep, np.zeros(pad, np.int64)])
        kd = jnp.asarray(keep_p)
        res_k = jax.tree_util.tree_map(lambda a: a[kd], res)
        # mask the padding slots empty so their RANSAC fails cheaply
        pmask = jnp.arange(len(keep_p)) < len(keep)
        res_k = res_k._replace(
            valid=res_k.valid & pmask[:, None],
            count=jnp.where(pmask, res_k.count, 0),
        )
        ii_r = [ii[k] for k in keep_p]
        jj_r = [jj[k] for k in keep_p]
        pair_ii, pair_jj = ii_r[: len(keep)], jj_r[: len(keep)]
    else:
        keep_p = np.arange(len(ii))
        res_k, ii_r, jj_r = res, ii, jj
    keys_k = keys_full[jnp.asarray(keep_p)]

    # ---- stage 3: RANSAC over the connected pairs only ----
    with total_timer("ransac"):
        if mesh is not None:
            res_k = jax.device_put(res_k, pair_sh)
            small, big = _ransac_pairs_jit(
                res_k, pos_r, valid_r, whs_r,
                jax.device_put(jnp.asarray(ii_r, dtype=jnp.int32), pair_sh),
                jax.device_put(jnp.asarray(jj_r, dtype=jnp.int32), pair_sh),
                jax.device_put(keys_k, pair_sh), cfg, affine,
            )
        else:
            infos = estimate_transform_batch(
                res_k, feats.pos, feats.valid, whs,
                jnp.asarray(ii_r), jnp.asarray(jj_r), key, cfg, affine,
                keys=keys_k,
            )
            small, big = _pack_infos(infos)
        jax.block_until_ready(big)
        M = cfg.MAX_MATCHES_PER_PAIR
    # downloads over a remote-attached device pay ~40 ms fixed + ~20 ms/MB:
    # pack the pytree into two buffers (small f64 geometry + big f32 point
    # data — coords are exactly representable in f32) instead of per-leaf
    # transfers
    with total_timer("match_fetch"):
        small = np.asarray(small)[: len(pair_ii)]
        big = fetch(big)[: len(pair_ii)]
    P = len(pair_ii)
    homo = small[:, :9].reshape(P, 3, 3)
    conf = small[:, 9]
    to_pos = big[:, : 2 * M].reshape(P, M, 2).astype(np.float64)
    from_pos = big[:, 2 * M : 4 * M].reshape(P, M, 2).astype(np.float64)
    pvalid = big[:, 4 * M :] > 0.5

    graph = PairwiseGraph(n, M)
    filled = {}
    for p, (i, j) in enumerate(zip(pair_ii, pair_jj)):
        filled[(i, j)] = graph.fill_pair(
            i, j, conf[p], homo[p], to_pos[p], from_pos[p], pvalid[p]
        )
    if ordered:
        # linear_pairwise_match: an unmatched adjacent pair is fatal except
        # the head-tail wrap (stitcher.cc:127); compacted-away pairs count
        # as unmatched
        for i, j in zip(ii, jj):
            if i != n - 1 and not filled.get((i, j), False):
                raise RuntimeError(f"Image {i} and {j} don't match")
    return graph


@jax.jit
def _pack_infos(infos):
    P, M = infos.valid.shape
    small = jnp.concatenate([
        infos.homo.reshape(P, 9),
        infos.confidence.reshape(P, 1).astype(infos.homo.dtype),
    ], axis=1)
    big = jnp.concatenate([
        infos.to_pos.reshape(P, 2 * M).astype(jnp.float32),
        infos.from_pos.reshape(P, 2 * M).astype(jnp.float32),
        infos.valid.astype(jnp.float32),
    ], axis=1)
    return small, big


@functools.partial(jax.jit, static_argnames=("cfg",))
def _match_pairs_jit(desc, valid, ii, jj, cfg):
    """Per-pair 2-NN matching vmapped over a flat (possibly sharded) pair
    axis; module-level so the executable is cached across calls."""
    from ..match.matcher import match_pair

    def one(i, j):
        return match_pair(desc[i], valid[i], desc[j], valid[j], cfg)

    return jax.vmap(one)(ii, jj)


@functools.partial(jax.jit, static_argnames=("cfg", "affine"))
def _ransac_pairs_jit(matches, pos, valid, whs, ii, jj, keys, cfg, affine):
    """Per-pair RANSAC vmapped over a flat (possibly sharded) pair axis,
    returning the packed (small, big) transfer buffers."""
    from ..geometry.ransac import estimate_transform

    def one(m, i, j, k):
        return estimate_transform(
            m, pos[i], valid[i], pos[j], valid[j],
            whs[i], whs[j], k, cfg, affine,
        )

    infos = jax.vmap(one)(matches, ii, jj, keys)
    return _pack_infos(infos)


def stitch(imgs: np.ndarray, cfg: Config, key=None, output: str = "f32",
           mesh=None, info_out: dict | None = None,
           graph: PairwiseGraph | None = None):
    """Full Stitcher::build (stitcher.cc:32-63).  imgs: [n,H,W,3] float32 in
    [0,1] or uint8 (uploaded 4x cheaper and converted on device).

    graph: preloaded match graph — skips the feature and match stages
    entirely (the reference's load_matchinfo fixture, debug.cc:127-140).

    output="f32": returns the blended canvas (float32, INVALID=-1 where
    empty, pre-crop).  output="u8": returns ``(canvas_u8, valid)`` with the
    [0,1]->[0,255] conversion done on device (reference: cvt_f2uc,
    imgproc.cc:328-337) — 4x less device->host traffic for the write path.

    mesh: a jax.sharding.Mesh — runs every device stage sharded over its
    first axis: features data-parallel over images, match+RANSAC over
    pairs, BA residual/JtJ accumulation over pairs (psum-reduced), and the
    linear blend over canvas column bands with an ICI halo exchange
    (SURVEY.md §5.7-5.8).  Host-side planning (MST, render plan) is
    unchanged — the same algorithm, partitioned."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n, H, W = imgs.shape[0], imgs.shape[1], imgs.shape[2]

    if graph is not None:
        # features exist only to build the graph — skip straight to upload
        with total_timer("upload"):
            imgs = jnp.asarray(imgs)
            imgs = _u8_to_f32(imgs) if imgs.dtype == jnp.uint8 \
                else imgs.astype(jnp.float32)
            jax.block_until_ready(imgs)
        whs_np = np.repeat([[float(W), float(H)]], n, 0)
        return _stitch_core(imgs, None, whs_np, cfg, key, output, mesh,
                            info_out, graph=graph)

    if mesh is not None:
        from .stitcherbase import compute_features_sharded

        # host u8 kept for the beyond-HBM blend path (band slices upload
        # straight to their devices; no full-stack device buffer)
        host_imgs = imgs if isinstance(imgs, np.ndarray) else None
        with total_timer("upload+calc_feature"):
            imgs, feats = compute_features_sharded(imgs, cfg, mesh)
            jax.block_until_ready(feats)
        whs_np = np.repeat([[float(W), float(H)]], n, 0)
        return _stitch_core(imgs, feats, whs_np, cfg, key, output, mesh,
                            info_out, host_imgs=host_imgs)
    elif isinstance(imgs, np.ndarray) and imgs.dtype == np.uint8:
        # wire-codec'd grey upload feeds SIFT; full-res RGB streams in the
        # background and joins at blend time (stitcherbase docs) — unless
        # the paired f32 stack would exceed one HBM, in which case NO
        # full-stack upload happens and the blender streams band slices
        # from host RAM (render.blend_linear_host_stream)
        import os as _os

        budget = float(_os.environ.get("OPENPANO_HBM_BUDGET_GB", "8"))
        paired_gb = imgs.shape[0] * imgs.shape[1] * imgs.shape[2] * 36 / 1e9
        beyond_hbm = paired_gb > budget or _os.environ.get(
            "OPENPANO_HOST_BLEND", "") == "1"
        with total_timer("upload+calc_feature"):
            imgs, feats = upload_and_compute_features(
                imgs, cfg, rgb_stream=not beyond_hbm)
            jax.block_until_ready(feats)
        imgs.start_background()  # chroma stream rides under match/BA
        assert_finite("calc_feature", pos=feats.pos, desc=feats.desc)
    else:
        with total_timer("upload"):
            imgs = jnp.asarray(imgs)
            if imgs.dtype == jnp.uint8:
                imgs = _u8_to_f32(imgs)
            else:
                imgs = imgs.astype(jnp.float32)
            jax.block_until_ready(imgs)
        with total_timer("calc_feature"):
            feats = compute_features(imgs, cfg)
            jax.block_until_ready(feats)
    whs_np = np.repeat([[float(W), float(H)]], n, 0)
    return _stitch_core(imgs, feats, whs_np, cfg, key, output, mesh, info_out)


def stitch_hetero(imgs_list, cfg: Config, key=None, output: str = "f32",
                  mesh=None, info_out: dict | None = None):
    """Stitch images of MIXED sizes (reference: per-image shapes throughout
    — ImageRef caches each file's own w/h, stitch/imageref.hh:13-35, and
    StitcherBase::calc_feature handles them independently,
    stitcherbase.cc:9-27).

    TPU-native batching with heterogeneous shapes: images are bucketed by
    (H, W) for the feature stage (one fixed-shape batched SIFT dispatch per
    bucket — each bucket gets its own working-size resize, matching the
    reference's per-image resize at feature.cc:33-36), then padded into one
    [N, Hmax, Wmax, 3] stack with the INVALID sentinel beyond each image's
    extent for the blend stage (sample_bilinear's Color::NO propagation
    masks the padding; every geometric stage already carries per-image
    ``whs``).

    imgs_list: list of [Hi, Wi, 3] float32-in-[0,1] or uint8 arrays.
    Returns like ``stitch``."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n = len(imgs_list)
    whs_np = np.asarray(
        [[float(im.shape[1]), float(im.shape[0])] for im in imgs_list]
    )

    def to_f32(im):
        im = np.asarray(im)
        return im.astype(np.float32) / 255.0 if im.dtype == np.uint8 \
            else im.astype(np.float32)

    # ---- feature stage: one batched dispatch per shape bucket ----
    buckets: dict[tuple, list[int]] = {}
    for i, im in enumerate(imgs_list):
        buckets.setdefault(im.shape[:2], []).append(i)
    order = []
    feat_parts = []
    with total_timer("calc_feature"):
        for shape, idxs in buckets.items():
            stack = jnp.asarray(np.stack([to_f32(imgs_list[i]) for i in idxs]))
            feat_parts.append(compute_features(stack, cfg))
            order.extend(idxs)
        inv = np.argsort(order)
        feats = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0)[inv], *feat_parts
        )
        jax.block_until_ready(feats)

    # ---- blend stack: pad to the max shape with the INVALID sentinel ----
    with total_timer("upload"):
        Hm = max(im.shape[0] for im in imgs_list)
        Wm = max(im.shape[1] for im in imgs_list)
        stack = np.full((n, Hm, Wm, 3), -1.0, np.float32)
        for i, im in enumerate(imgs_list):
            stack[i, : im.shape[0], : im.shape[1]] = to_f32(im)
        imgs_dev = jnp.asarray(stack)
        jax.block_until_ready(imgs_dev)

    return _stitch_core(imgs_dev, feats, whs_np, cfg, key, output, mesh,
                        info_out)


def _stitch_core(imgs, feats, whs_np: np.ndarray, cfg: Config, key,
                 output: str, mesh, info_out: dict | None = None,
                 graph: PairwiseGraph | None = None,
                 host_imgs: np.ndarray | None = None):
    """Shared tail of Stitcher::build after feature extraction: pairwise
    match graph -> camera estimation (or homography chaining) -> render
    plan -> blend (stitcher.cc:38-63).

    ``info_out`` (a dict) collects run metadata for benchmarks: per-image
    keypoint counts, the recovered cameras/homographies, the render plan,
    and BA LM iteration stats.  ``graph`` (a preloaded PairwiseGraph, e.g.
    from io.artifacts.load_matchinfo_text) skips matching — the
    reference's dump/load_matchinfo fixture workflow (debug.cc:111-140,
    hook at stitcher.cc:43-47)."""
    n = whs_np.shape[0]
    mid = n >> 1                                  # assign_center, stitcher.cc:138-141
    whs = jnp.asarray(whs_np, jnp.float32)
    if info_out is not None and feats is not None:
        info_out["kpt_counts"] = np.asarray(jnp.sum(feats.valid, axis=1))
    if graph is None:
        with total_timer("pairwise_match"):
            graph = build_pairwise_graph(
                feats, whs, cfg, key, ordered=cfg.ORDERED_INPUT,
                affine=cfg.TRANS, mesh=mesh,
            )
        assert_finite("pairwise_match", conf=graph.conf, homo=graph.homo,
                      to_pos=graph.to_pos, from_pos=graph.from_pos)
    if info_out is not None:
        info_out["graph"] = graph
    if info_out is not None:
        conn = graph.conf > 0
        info_out["connected_pairs"] = int(np.triu(conn, 1).sum())
        info_out["total_inliers"] = int(
            (graph.valid & conn[:, :, None]).sum() // 2
        )

    if cfg.ESTIMATE_CAMERA:
        with total_timer("estimate_camera"):
            cams = estimate_cameras(
                graph.conf, graph.homo, graph.to_pos, graph.from_pos, graph.valid,
                whs_np, cfg, mesh=mesh, stats=info_out,
            )
        assert_finite("estimate_camera", focal=cams.focal, R=cams.R)
        homos = np.zeros((n, 3, 3))
        for i in range(n):                        # stitcher.cc:143-154
            K = intrinsic(cams.focal[i], cams.ppx[i], cams.ppy[i])
            homos[i] = cams.R[i].T @ np.linalg.inv(K)
        proj = "spherical"
        if info_out is not None:
            info_out["cams"] = cams
    else:
        homos = _build_linear_simple(graph, n, mid, whs_np, cfg)
        proj = "flat"

    with total_timer("blend"):
        from .stitcherbase import DeferredImages, HostImages

        if isinstance(imgs, DeferredImages):
            # join the background RGB wire stream (started during the
            # feature stage; mostly hidden under match/BA)
            imgs = imgs.get()
        plan = plan_render(homos, whs_np, mid, proj, cfg.MAX_OUTPUT_SIZE)
        if info_out is not None:
            info_out["homos"] = homos
            info_out["plan"] = plan
        if mesh is not None:
            import os as _os

            from .render import blend_linear_sharded

            # beyond-one-HBM image sets: hand the blender the HOST stack —
            # band slices then upload straight to their own devices and no
            # device ever materializes [N, H, W, 3] (LAZY_READ analog,
            # reference README.md:133-136).  Chosen when the paired f32
            # working stack would exceed the HBM budget, or when forced.
            budget = float(_os.environ.get("OPENPANO_HBM_BUDGET_GB", "8"))
            n_im, H_im, W_im = whs_np.shape[0], imgs.shape[1], imgs.shape[2]
            paired_gb = n_im * H_im * W_im * 3 * 4 * 3 / 1e9
            use_host = host_imgs is not None and (
                paired_gb > budget
                or _os.environ.get("OPENPANO_SHARDED_BLEND_HOST", "") == "1"
            )
            blend_in = host_imgs if use_host else imgs
            if cfg.MULTIBAND > 0:
                from .multiband import blend_multiband_sharded

                canvas = blend_multiband_sharded(
                    blend_in, plan, cfg.MULTIBAND, mesh
                )
            else:
                canvas = blend_linear_sharded(
                    blend_in, plan, ordered=cfg.ORDERED_INPUT, mesh=mesh
                )
            if output == "u8":
                u8, valid = _f32_to_u8(canvas)
                result = (np.asarray(u8), np.asarray(valid))
            else:
                result = canvas
        elif isinstance(imgs, HostImages):
            # beyond-one-HBM single device: sequential column bands with
            # host band-slice uploads; per-band device memory independent
            # of N (LAZY_READ analog; multiband needs the mesh path)
            import os as _os

            from .render import blend_linear_host_stream

            budget = float(_os.environ.get("OPENPANO_HBM_BUDGET_GB", "8"))
            n_im, H_im, W_im = imgs.shape[:3]
            paired_gb = n_im * H_im * W_im * 36 / 1e9
            groups = max(2, int(np.ceil(paired_gb / max(budget * 0.25, 0.1))))
            if cfg.MULTIBAND > 0:
                from .multiband import blend_multiband_host_stream

                canvas = blend_multiband_host_stream(
                    imgs.host, plan, cfg.MULTIBAND, groups=groups)
            elif output == "u8":
                # strips cross the wire through the download codec
                # (~2.3 B/px vs 12 B/px f32 — the gigapixel wall clock)
                rgba = blend_linear_host_stream(
                    imgs.host, plan, ordered=cfg.ORDERED_INPUT,
                    groups=groups, u8_out=True)
                result = (rgba[..., :3], rgba[..., 3] > 0)
                canvas = None
            else:
                canvas = blend_linear_host_stream(
                    imgs.host, plan, ordered=cfg.ORDERED_INPUT, groups=groups)
            if canvas is not None:
                if output == "u8":
                    valid = canvas[..., 0] >= 0
                    u8c = np.clip(np.round(canvas * 255.0), 0,
                                  255).astype(np.uint8)
                    result = (np.where(valid[..., None], u8c, 255), valid)
                else:
                    result = canvas
        elif output == "u8" and cfg.MULTIBAND == 0 and cfg.STREAM_BLEND:
            import os as _os

            # streamed path: column-strip downloads overlap blend compute
            rgba = blend_linear_stream_u8(
                imgs, plan, ordered=cfg.ORDERED_INPUT,
                packed_gather=_os.environ.get(
                    "OPENPANO_PACKED_GATHER", "0") == "1",
            )
            result = (rgba[..., :3], rgba[..., 3] > 0)
        else:
            with total_timer("blend_compute"):
                canvas = blend(imgs, plan, ordered=cfg.ORDERED_INPUT,
                               multiband=cfg.MULTIBAND)
                jax.block_until_ready(canvas)
            with total_timer("blend_fetch"):
                if output == "u8":
                    # ONE device->host copy; the transport is byte-limited
                    # on downloads (tools/bench_transfer.py), so plain
                    # i32-bitcast chunked fetch is the fastest option
                    rgba = fetch(_f32_to_u8_rgba(canvas))
                    result = (rgba[..., :3], rgba[..., 3] > 0)
                else:
                    result = fetch(canvas)
    return result


@jax.jit
def _u8_to_f32(imgs):
    return imgs.astype(jnp.float32) / 255.0


@jax.jit
def _f32_to_u8(canvas):
    valid = canvas[..., 0] >= 0
    u8 = jnp.round(jnp.clip(canvas, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    return jnp.where(valid[..., None], u8, 255), valid


@jax.jit
def _f32_to_u8_rgba(canvas):
    """RGB + validity packed into one u8 buffer: a single device->host
    transfer for the write path (cvt_f2uc analog, imgproc.cc:328-337)."""
    valid = canvas[..., 0] >= 0
    u8 = jnp.round(jnp.clip(canvas, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    rgb = jnp.where(valid[..., None], u8, 255)
    return jnp.concatenate([rgb, valid[..., None].astype(jnp.uint8)], axis=-1)




def _build_linear_simple(graph: PairwiseGraph, n: int, mid: int,
                         whs: np.ndarray, cfg: Config) -> np.ndarray:
    """Chain pairwise homographies outward from the middle image and
    prescale by diag(1/f, 1/f, 1) (stitcher.cc:156-195)."""
    homos = np.zeros((n, 3, 3))
    homos[mid] = np.eye(3)
    for k in range(mid + 1, n):
        if graph.conf[k - 1, k] <= 0:
            raise RuntimeError(f"Image {k-1} and {k} don't match")
        homos[k] = homos[k - 1] @ graph.homo[k - 1, k]
    for k in range(mid - 1, -1, -1):
        if graph.conf[k + 1, k] <= 0:
            raise RuntimeError(f"Image {k} and {k+1} don't match")
        homos[k] = homos[k + 1] @ graph.homo[k + 1, k]

    f = -1.0
    if not cfg.TRANS:                             # stitcher.cc:180-181
        f = (estimate_focal_robust if cfg.ROBUST_FOCAL else estimate_focal)(
            graph.conf, graph.homo
        )
    if f <= 0:
        f = 0.5 * (whs[mid, 0] + whs[mid, 1])     # stitcher.cc:182-184
    M = np.diag([1.0 / f, 1.0 / f, 1.0])
    return M[None] @ homos
