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

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..camera.camera import estimate_focal, intrinsic
from ..camera.estimator import estimate_cameras
from ..geometry.ransac import estimate_transform_batch
from ..io.transfer import fetch
from ..match.matcher import match_all_pairs, match_ring_pairs, pair_indices
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
                         affine: bool) -> PairwiseGraph:
    """Match + RANSAC over all C(n,2) pairs (or the ordered ring) in two
    batched device calls."""
    n = feats.desc.shape[0]
    with total_timer("match_2nn"):
        if ordered:
            # (i, i+1) ring including the head-tail wrap pair, which is
            # allowed to fail (linear_pairwise_match, stitcher.cc:116-136)
            ii = list(range(n))
            jj = [(i + 1) % n for i in ii]
            res = match_ring_pairs(feats.desc, feats.valid, cfg)
        else:
            ii, jj = pair_indices(n)
            res = match_all_pairs(feats.desc, feats.valid, cfg)
        jax.block_until_ready(res)

    with total_timer("ransac"):
        infos = estimate_transform_batch(
            res, feats.pos, feats.valid, whs,
            jnp.asarray(ii), jnp.asarray(jj), key, cfg, affine,
        )
        small, big = _pack_infos(infos)
        jax.block_until_ready(big)
    # downloads over a remote-attached device pay ~40 ms fixed + ~20 ms/MB:
    # pack the pytree into two buffers (small f64 geometry + big f32 point
    # data — coords are exactly representable in f32) instead of per-leaf
    # transfers
    with total_timer("match_fetch"):
        small = np.asarray(small)
        big = fetch(big)
    P, M = infos.valid.shape
    homo = small[:, :9].reshape(P, 3, 3)
    conf = small[:, 9]
    to_pos = big[:, : 2 * M].reshape(P, M, 2).astype(np.float64)
    from_pos = big[:, 2 * M : 4 * M].reshape(P, M, 2).astype(np.float64)
    pvalid = big[:, 4 * M :] > 0.5

    graph = PairwiseGraph(n, M)
    for p, (i, j) in enumerate(zip(ii, jj)):
        succ = graph.fill_pair(
            i, j, conf[p], homo[p], to_pos[p], from_pos[p], pvalid[p]
        )
        if ordered and not succ and i != n - 1:
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


def stitch(imgs: np.ndarray, cfg: Config, key=None, output: str = "f32"):
    """Full Stitcher::build (stitcher.cc:32-63).  imgs: [n,H,W,3] float32 in
    [0,1] or uint8 (uploaded 4x cheaper and converted on device).

    output="f32": returns the blended canvas (float32, INVALID=-1 where
    empty, pre-crop).  output="u8": returns ``(canvas_u8, valid)`` with the
    [0,1]->[0,255] conversion done on device (reference: cvt_f2uc,
    imgproc.cc:328-337) — 4x less device->host traffic for the write path.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    n, H, W = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    mid = n >> 1                                  # assign_center, stitcher.cc:138-141

    if isinstance(imgs, np.ndarray) and imgs.dtype == np.uint8:
        # pipelined path: delta-coded batch uploads overlap the SIFT compute
        with total_timer("upload+calc_feature"):
            imgs, feats = upload_and_compute_features(imgs, cfg)
            jax.block_until_ready(feats)
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
    whs = jnp.broadcast_to(jnp.asarray([W, H], jnp.float32), (n, 2))
    with total_timer("pairwise_match"):
        graph = build_pairwise_graph(
            feats, whs, cfg, key, ordered=cfg.ORDERED_INPUT, affine=cfg.TRANS
        )

    whs_np = np.repeat([[float(W), float(H)]], n, 0)
    if cfg.ESTIMATE_CAMERA:
        with total_timer("estimate_camera"):
            cams = estimate_cameras(
                graph.conf, graph.homo, graph.to_pos, graph.from_pos, graph.valid,
                whs_np, cfg,
            )
        homos = np.zeros((n, 3, 3))
        for i in range(n):                        # stitcher.cc:143-154
            K = intrinsic(cams.focal[i], cams.ppx[i], cams.ppy[i])
            homos[i] = cams.R[i].T @ np.linalg.inv(K)
        proj = "spherical"
    else:
        homos = _build_linear_simple(graph, n, mid, whs_np, cfg)
        proj = "flat"

    with total_timer("blend"):
        plan = plan_render(homos, whs_np, mid, proj, cfg.MAX_OUTPUT_SIZE)
        if output == "u8" and cfg.MULTIBAND == 0 and cfg.STREAM_BLEND:
            # streamed path: column-strip downloads overlap blend compute
            rgba = blend_linear_stream_u8(imgs, plan, ordered=cfg.ORDERED_INPUT)
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
        f = estimate_focal(graph.conf, graph.homo)
    if f <= 0:
        f = 0.5 * (whs[mid, 0] + whs[mid, 1])     # stitcher.cc:182-184
    M = np.diag([1.0 / f, 1.0 / f, 1.0])
    return M[None] @ homos
