"""Camera estimation driver: focal init, max-spanning-tree traversal,
incremental bundle adjustment schedule.

Reference: stitch/camera_estimator.{hh,cc}.  The traversal (Prim-style walk
of the match graph by descending confidence, camera_estimator.cc:105-159)
and the MULTIPASS_BA schedule (:74-99) are inherently sequential over <= n
steps and stay on host; every optimize() call dispatches the single
compiled LM kernel (bundle_adjuster.py) with a wider pair_active mask —
static shapes, one compilation for the whole schedule.
"""

from __future__ import annotations

import contextlib
import heapq

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from .bundle_adjuster import BAProblem, ba_optimize
from .camera import CameraSet, estimate_focal, intrinsic, straighten
from .rotation import rodrigues, rotation_to_angle


def _np_rod(v: np.ndarray) -> np.ndarray:
    with jax.default_device(jax.devices("cpu")[0]):
        return np.asarray(rodrigues(jnp.asarray(v, jnp.float64)))


def _np_unrod(R: np.ndarray) -> np.ndarray:
    with jax.default_device(jax.devices("cpu")[0]):
        return np.asarray(rotation_to_angle(jnp.asarray(R, jnp.float64)))


def traverse_spanning_tree(confidence: np.ndarray):
    """Maximum-spanning-tree walk (camera_estimator.cc:105-159).

    confidence: [n,n] symmetric, 0 where unmatched.  Returns
    (root, edges) where edges is the visit-ordered list of (now, next).
    Raises on a disconnected match graph, listing stray images."""
    n = confidence.shape[0]
    best = (-1, -1, 0.0)
    for i in range(n):
        for j in range(i + 1, n):
            if confidence[i, j] > best[2]:
                best = (i, j, confidence[i, j])
    if best[0] == -1:
        raise RuntimeError("No connected images are found!")
    root = best[0]

    vst = [False] * n
    vst[root] = True
    q: list = []

    def enqueue(frm):
        for i in range(n):
            if i != frm and not vst[i] and confidence[frm, i] > 0:
                heapq.heappush(q, (-confidence[frm, i], frm, i))

    enqueue(root)
    edges = []
    cnt = 1
    while q:
        _, now, nxt = heapq.heappop(q)
        if vst[nxt]:
            continue
        vst[nxt] = True
        cnt += 1
        edges.append((now, nxt))
        enqueue(nxt)
    if cnt != n:
        stray = " ".join(str(i) for i in range(n) if not vst[i])
        raise RuntimeError(
            f"Found a tree of size {cnt}!={n}, image {stray} are not connected well!"
        )
    return root, edges


def estimate_cameras(
    confidence: np.ndarray,        # [n,n] pairwise confidence
    homos: np.ndarray,             # [n,n,3,3]; homos[i,j] maps j -> i
    to_pos: np.ndarray,            # [n,n,M,2] inlier coords in image i
    from_pos: np.ndarray,          # [n,n,M,2] inlier coords in image j
    valid: np.ndarray,             # [n,n,M]
    whs: np.ndarray,               # [n,2]
    cfg: Config,
) -> CameraSet:
    """Full CameraEstimator::estimate (camera_estimator.cc:46-103)."""
    n = confidence.shape[0]

    focal = estimate_focal(confidence, homos)
    if focal > 0:
        focals = np.full(n, focal)
    else:
        focals = (whs[:, 0] + whs[:, 1]) * 0.5    # camera_estimator.cc:39-43

    params = np.zeros((n, 6))
    params[:, 0] = focals

    root, edges = traverse_spanning_tree(confidence)

    # ---- build the static point-major BA problem over all confident
    # unordered pairs: compact every valid match point into flat [T] arrays
    # (the pair-major [P,M] layout is mostly padding; compaction makes each
    # LM iteration ~|inliers| work instead of P*M) ----
    conn = [(i, j) for i in range(n) for j in range(i + 1, n)
            if confidence[i, j] > 0 and valid[i, j].any()]
    pair_slot = {p: s for s, p in enumerate(conn)}
    P = max(len(conn), 1)
    pt_pair, cam_a, cam_b, pt_to_a, pt_from_b, counts = [], [], [], [], [], []
    for s, (a, b) in enumerate(conn):
        m = valid[a, b]
        cnt = int(m.sum())
        counts.append(cnt)
        pt_pair.append(np.full(cnt, s, np.int32))
        cam_a.append(a)
        cam_b.append(b)
        pt_to_a.append(to_pos[a, b][m])      # coords in image a (stored 'to')
        pt_from_b.append(from_pos[a, b][m])  # coords in image b (stored 'from')
    if pt_pair:
        pt_pair = np.concatenate(pt_pair)
        pt_to_a = np.concatenate(pt_to_a)
        pt_from_b = np.concatenate(pt_from_b)
    else:
        pt_pair = np.zeros(0, np.int32)
        pt_to_a = pt_from_b = np.zeros((0, 2))
        counts = [0]
        cam_a = cam_b = [0]
    while len(cam_a) < P:
        cam_a.append(0)
        cam_b.append(0)
        counts.append(0)
    ends = np.cumsum(counts).astype(np.int32)
    starts = (ends - np.asarray(counts, np.int32)).astype(np.int32)

    pair_active = np.zeros(P)
    # True when the traverse-chosen orientation has to=b (swapped vs stored)
    pair_swapped = np.zeros(P, bool)

    visited = {root}

    def activate_pair(i, nxt) -> bool:
        """add_match(i, next) (camera_estimator.cc:76-88): from=i, to=next."""
        key = (min(i, nxt), max(i, nxt))
        if key not in pair_slot:
            return False
        s = pair_slot[key]
        # stored orientation: to=a, from=b
        pair_swapped[s] = (key[1] == nxt)   # to must be nxt
        pair_active[s] = 1.0
        return True

    # BA placement: host CPU by default (tiny f64 LM; see Config.BA_ON_HOST)
    if cfg.BA_ON_HOST:
        ba_ctx = lambda: jax.default_device(jax.devices("cpu")[0])
    else:
        ba_ctx = contextlib.nullcontext

    # static point data uploaded once; per run only swapped/pair_w change
    with ba_ctx():
        static_prob = BAProblem(
            pt_to=jnp.asarray(pt_to_a),
            pt_from=jnp.asarray(pt_from_b),
            pair_id=jnp.asarray(pt_pair),
            w=jnp.ones(pt_pair.shape[0], jnp.float64),
            starts=jnp.asarray(starts),
            ends=jnp.asarray(ends),
            cam_to=jnp.asarray(cam_a, jnp.int32),    # stored: to=a, from=b
            cam_from=jnp.asarray(cam_b, jnp.int32),
            swapped=jnp.zeros(P, bool),
            pair_w=jnp.zeros(P, jnp.float64),
        )

    def run_ba():
        nonlocal params
        with ba_ctx():
            prob = static_prob._replace(
                swapped=jnp.asarray(pair_swapped),
                pair_w=jnp.asarray(pair_active),
            )
            params = np.array(
                ba_optimize(
                    jnp.asarray(params), prob, jnp.asarray(root), n, cfg.LM_LAMBDA
                )
            )

    for now, nxt in edges:
        # initialize camera[nxt] from camera[now] (camera_estimator.cc:59-69)
        K_now = intrinsic(params[now, 0], params[now, 1], params[now, 2])
        R_now = _np_rod(params[now, 3:6])
        K_next = intrinsic(params[nxt, 0], 0.0, 0.0)
        H = homos[now, nxt]                       # maps next -> now
        Mt = np.linalg.inv(K_now) @ H @ K_next
        R_next = (R_now.T @ Mt).T
        params[nxt, 1:3] = 0.0
        params[nxt, 3:6] = _np_unrod(R_next)

        visited.add(nxt)
        if cfg.MULTIPASS_BA > 0:
            for i in sorted(visited - {nxt}):
                if activate_pair(i, nxt) and cfg.MULTIPASS_BA == 2:
                    run_ba()                      # BA after each connection
            if cfg.MULTIPASS_BA == 1:
                run_ba()                          # BA after each image

    if cfg.MULTIPASS_BA == 0:                     # camera_estimator.cc:92-99
        for i, j in conn:
            activate_pair(i, j)
        run_ba()

    cams = CameraSet(
        focal=params[:, 0].copy(),
        ppx=params[:, 1].copy(),
        ppy=params[:, 2].copy(),
        R=np.stack([_np_rod(params[i, 3:6]) for i in range(n)]),
    )
    if cfg.STRAIGHTEN:
        cams = straighten(cams)                   # camera_estimator.cc:101
    return cams
