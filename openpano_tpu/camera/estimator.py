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
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..utils.timer import total_timer
from .bundle_adjuster import LM_MAX_ITER, BAPairProblem, ba_optimize_pairs
from .camera import (
    CameraSet,
    estimate_focal,
    estimate_focal_robust,
    intrinsic,
    straighten,
)
from .rotation import GEO_EPS_SQR


def _np_rod(v: np.ndarray) -> np.ndarray:
    """Pure-numpy axis-angle -> R (semantics of rotation.rodrigues /
    camera.cc:120-144); host-side to avoid per-edge device dispatches."""
    v = np.asarray(v, np.float64)
    theta2 = float(v @ v)
    K = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    if theta2 < GEO_EPS_SQR:
        return np.eye(3) + K
    theta = np.sqrt(theta2)
    u = v / theta
    Ku = K / theta
    c, s = np.cos(theta), np.sin(theta)
    return c * np.eye(3) + (1 - c) * np.outer(u, u) + s * Ku


def _np_unrod(R: np.ndarray) -> np.ndarray:
    """Pure-numpy R -> axis-angle with SVD re-orthogonalization (semantics
    of rotation.rotation_to_angle / camera.cc:91-117)."""
    U, _, Vt = np.linalg.svd(np.asarray(R, np.float64))
    Rn = U @ Vt
    if np.linalg.det(Rn) < 0:
        Rn = -Rn
    r = np.array([
        Rn[2, 1] - Rn[1, 2], Rn[0, 2] - Rn[2, 0], Rn[1, 0] - Rn[0, 1]
    ])
    s = np.linalg.norm(r)
    if s < 1e-7:  # GEO_EPS
        return np.zeros(3)
    theta = np.arccos(np.clip((np.trace(Rn) - 1) * 0.5, -1.0, 1.0))
    return r * (theta / s)


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
    mesh=None,
    stats: dict | None = None,
) -> CameraSet:
    """Full CameraEstimator::estimate (camera_estimator.cc:46-103).

    With ``mesh`` given, every LM dispatch shards its pair-major
    residual/JtJ accumulation over the mesh's first axis
    (parallel/dist_ba.py) — same compiled loop, GSPMD inserts the psum.
    ``stats`` (if a dict) accumulates 'lm_iters' and 'lm_time_s' across
    the whole incremental schedule (the BA-LM-iters/s benchmark metric)."""
    n = confidence.shape[0]

    focal = (estimate_focal_robust if cfg.ROBUST_FOCAL else estimate_focal)(
        confidence, homos
    )
    if focal > 0:
        focals = np.full(n, focal)
    else:
        focals = (whs[:, 0] + whs[:, 1]) * 0.5    # camera_estimator.cc:39-43

    params = np.zeros((n, 6))
    params[:, 0] = focals

    root, edges = traverse_spanning_tree(confidence)

    # ---- build the pair-major BA problem over all confident unordered
    # pairs, slots ordered by *activation step* of the incremental schedule
    # (camera_estimator.cc:74-99): pair (i,j) activates when its later
    # endpoint joins the tree, so the active set is always a slot prefix and
    # each run_ba dispatches only ~active work (bucketed static shapes) ----
    conn = {(i, j) for i in range(n) for j in range(i + 1, n)
            if confidence[i, j] > 0 and valid[i, j].any()}

    # a pair's points are CHUNKED into fixed SLOT-point slots (a pair with
    # 245 inliers fills 8 slots of the same camera pair) instead of one
    # max-count-sized row per pair: the LM's per-iteration work then scales
    # with sum(ceil(count/SLOT)*SLOT) ~ total points, not P * max(count) —
    # ~2.5x less residual/JtJ arithmetic on typical inlier distributions.
    # JtJ block scatter-adds handle the duplicated camera rows exactly.
    # 32 measured ~8% faster than 64 on the headline (r4); 16 is flat.
    SLOT = 32
    activation: list[tuple[tuple[int, int], bool]] = []  # (key, swapped)
    act_slots: list[int] = []                     # slots per activation entry
    visited_sim = {root}
    for _, nxt in edges:
        visited_sim.add(nxt)
        for i in sorted(visited_sim - {nxt}):
            key = (min(i, nxt), max(i, nxt))
            if key in conn:
                # stored orientation is to=key[0], from=key[1]; the schedule
                # wants to=nxt (add_match(i, next): from=i, to=next, cc:76-88)
                activation.append((key, key[1] == nxt))
                cnt = int(valid[key].sum())
                act_slots.append(max(-(-cnt // SLOT), 1))
    slots_by_key = {k: ns for (k, _), ns in zip(activation, act_slots)}

    P = max(sum(act_slots), 1)
    M = SLOT
    if os.environ.get("OPENPANO_BA_DEBUG"):
        print(f"[ba] pairs={len(activation)} slots={P} M={M}")
    pt_to_slab = np.zeros((P, M, 2))
    pt_from_slab = np.zeros((P, M, 2))
    w_slab = np.zeros((P, M))
    cam_a = np.zeros(P, np.int32)
    cam_b = np.zeros(P, np.int32)
    pair_swapped = np.zeros(P, bool)
    s = 0
    for ((a, b), sw), nslots in zip(activation, act_slots):
        m = valid[a, b]
        pt = to_pos[a, b][m]                      # coords in image a ('to')
        pf = from_pos[a, b][m]
        for c in range(nslots):
            seg = slice(c * SLOT, min((c + 1) * SLOT, len(pt)))
            k = seg.stop - seg.start
            pt_to_slab[s, :k] = pt[seg]
            pt_from_slab[s, :k] = pf[seg]
            w_slab[s, :k] = 1.0
            cam_a[s] = a                          # stored: to=a, from=b
            cam_b[s] = b
            pair_swapped[s] = sw
            s += 1

    # ---- (r5) intermediate-pass point subsample ----
    # The incremental passes exist to keep the next camera initialization
    # healthy, not to converge — so they can run on a STRIDED subset of
    # each pair's inliers (cap_k slots = up to cap_k*SLOT points/pair);
    # the final polish always sees the full point set.  Strided, not a
    # head prefix: inliers arrive in keypoint scan order, so a prefix
    # would bias toward one image region and skew the rotation estimate.
    # Measured (tools/sweep_ba_r5.py): cap 2 cuts the intermediate LM
    # stage time ~35% at unchanged final accuracy.
    cap_k = max(int(getattr(cfg, "BA_INTERMEDIATE_POINT_SLOTS", 0)), 0)
    if cap_k > 0 and cfg.MULTIPASS_BA > 0:
        act_slots_c = [min(ns, cap_k) for ns in act_slots]
        slots_c_by_key = {k: ns
                          for (k, _), ns in zip(activation, act_slots_c)}
        Pc = max(sum(act_slots_c), 1)
        pt_to_c = np.zeros((Pc, M, 2))
        pt_from_c = np.zeros((Pc, M, 2))
        w_c = np.zeros((Pc, M))
        cam_a_c = np.zeros(Pc, np.int32)
        cam_b_c = np.zeros(Pc, np.int32)
        swapped_c = np.zeros(Pc, bool)
        s = 0
        for ((a, b), sw), nsl in zip(activation, act_slots_c):
            m = valid[a, b]
            pt = to_pos[a, b][m]
            pf = from_pos[a, b][m]
            cnt = len(pt)
            take = min(cnt, nsl * SLOT)
            sel = np.arange(take) * cnt // max(take, 1)
            pt, pf = pt[sel], pf[sel]
            for c in range(nsl):
                seg = slice(c * SLOT, min((c + 1) * SLOT, take))
                k2 = seg.stop - seg.start
                pt_to_c[s, :k2] = pt[seg]
                pt_from_c[s, :k2] = pf[seg]
                w_c[s, :k2] = 1.0
                cam_a_c[s] = a
                cam_b_c[s] = b
                swapped_c[s] = sw
                s += 1
    else:
        act_slots_c = act_slots
        slots_c_by_key = slots_by_key
        Pc = P
        pt_to_c, pt_from_c, w_c = pt_to_slab, pt_from_slab, w_slab
        cam_a_c, cam_b_c, swapped_c = cam_a, cam_b, pair_swapped

    # banded LM solve for chain/ring match graphs (ordered input): the
    # dense 6n x 6n factorization dominates past ~100 cameras (n=500:
    # a 3000^3 dense solve PER LM ITERATION), while the ring's JtJ is
    # block-tridiagonal + one wrap corner — O(n) by cyclic block Thomas
    # (camera/banded.py).  Auto past 100 cameras; OPENPANO_BA_BANDED=1/0
    # forces/disables (structure permitting).
    from .banded import is_chain_structure

    _struct_ok = len(activation) > 0 and is_chain_structure(
        cam_a[:P], cam_b[:P], n)
    _benv = os.environ.get("OPENPANO_BA_BANDED", "auto")
    if _benv == "0":
        banded_ok = False
    elif _benv == "1":
        banded_ok = _struct_ok
    else:
        banded_ok = _struct_ok and n >= 100

    # BA placement: host CPU by default (tiny f64 LM; see Config.BA_ON_HOST)
    if cfg.BA_ON_HOST and mesh is None:
        ba_ctx = lambda: jax.default_device(jax.devices("cpu")[0])
    else:
        ba_ctx = contextlib.nullcontext

    n_active = 0
    n_active_c = 0

    _prob_cache: dict = {}

    def _prob_for(b: int, pw: np.ndarray, capped: bool) -> BAPairProblem:
        """Bucketed problem arrays are schedule-invariant — convert the
        slabs once per bucket and swap only the activation weights per
        call (the per-call numpy->jnp conversions were pure overhead)."""
        key = (b, capped)
        if key not in _prob_cache:
            tt, tf, ww = ((pt_to_c, pt_from_c, w_c) if capped
                          else (pt_to_slab, pt_from_slab, w_slab))
            ca, cb, sw = ((cam_a_c, cam_b_c, swapped_c) if capped
                          else (cam_a, cam_b, pair_swapped))
            _prob_cache[key] = BAPairProblem(
                pt_to=jnp.asarray(tt[:b]),
                pt_from=jnp.asarray(tf[:b]),
                w=jnp.asarray(ww[:b]),
                cam_to=jnp.asarray(ca[:b]),
                cam_from=jnp.asarray(cb[:b]),
                swapped=jnp.asarray(sw[:b]),
                pair_w=jnp.zeros(b),
            )
        return _prob_cache[key]._replace(pair_w=jnp.asarray(pw))

    def _bucket(nact: int, cap: int) -> int:
        """Prefix bucket ladder: x2 up to 64, then x1.5 steps (96, 128,
        192, 256, 384, ...) — halves the padded-slot waste of a pure
        power-of-two ladder in the 128-512 range where the headline's
        intermediate passes live, for a few extra compiled LM shapes."""
        b = 8
        while b < min(nact, cap):
            if b < 64:
                b *= 2
            elif (b & (b - 1)) == 0:
                b += b // 2
            else:
                b += b // 3
        return min(b, cap)

    def run_ba(max_iter=None, adaptive=None, patience=None, rel_tol=0.0,
               capped=False):
        nonlocal params
        if max_iter is None:
            max_iter = LM_MAX_ITER
        if adaptive is None:
            adaptive = cfg.BA_ADAPTIVE_LM
        if patience is None:
            patience = 5  # reference stop rule (.cc:159) for final polish
        capped = capped and cap_k > 0
        nact = n_active_c if capped else n_active
        cap = Pc if capped else P
        if nact == 0:
            return
        b = _bucket(nact, cap)
        pw = np.zeros(b)
        pw[:nact] = 1.0
        want_iters = stats is not None
        with ba_ctx(), total_timer(f"ba_lm[{b}]"):
            import time as _time

            t0 = _time.perf_counter()
            prob = _prob_for(b, pw, capped)
            if mesh is not None:
                from ..parallel.dist_ba import ba_optimize_pairs_sharded

                out = ba_optimize_pairs_sharded(
                    jnp.asarray(params), prob, jnp.asarray(root), n,
                    cfg.LM_LAMBDA, mesh, return_iters=want_iters,
                    adaptive=adaptive, max_iter=max_iter,
                    patience=patience, rel_tol=rel_tol, banded=banded_ok,
                )
            else:
                from ..utils.debug import numeric_checks_enabled

                ba_kwargs = dict(
                    device_solver=not cfg.BA_ON_HOST,
                    return_iters=want_iters,
                    adaptive=adaptive,
                    max_iter=max_iter,
                    patience=patience,
                    rel_tol=rel_tol,
                    banded=banded_ok,
                )
                ba_args = (jnp.asarray(params), prob, jnp.asarray(root), n,
                           cfg.LM_LAMBDA)
                if numeric_checks_enabled():
                    # in-kernel m_assert analog (SURVEY §5.2,
                    # debugutils.hh:41-52): float checks INSIDE the
                    # compiled LM loop surface the first NaN/Inf instead
                    # of a silently poisoned camera solution
                    from jax.experimental import checkify

                    err, out = checkify.checkify(
                        lambda: ba_optimize_pairs(*ba_args, **ba_kwargs),
                        errors=checkify.float_checks,
                    )()
                    err.throw()
                else:
                    out = ba_optimize_pairs(*ba_args, **ba_kwargs)
            if want_iters:
                out, iters = out
                params = np.array(out)
                stats["lm_iters"] = stats.get("lm_iters", 0) + int(iters)
                stats["lm_time_s"] = (
                    stats.get("lm_time_s", 0.0) + _time.perf_counter() - t0
                )
            else:
                params = np.array(out)

    # intermediate incremental runs only need to keep the initialization
    # healthy — the final full-depth polish below does the convergence work
    # (cfg.BA_INTERMEDIATE_ITERS; reference runs every pass to LM_MAX_ITER)
    inter_iters = cfg.BA_INTERMEDIATE_ITERS

    # activation batching (BA_BATCH_IMAGES k > 1): the per-image
    # intermediate BA of MULTIPASS_BA=1 runs once per k added images —
    # each new camera still seeds from its tree parent's current estimate,
    # so initializations stay healthy with k-fold fewer LM dispatches
    batch_k = max(int(getattr(cfg, "BA_BATCH_IMAGES", 1)), 1)
    from ..utils.debug import numeric_checks_enabled

    # (r5) the r4 OPENPANO_BA_FUSED whole-schedule scan was DELETED: it
    # measured SLOWER than this dispatch loop on the host-CPU LM (python
    # call prep overlaps async XLA execution) and its hypothetical win
    # condition (device-placed f64 BA) is software-emulated on TPU.
    if True:
        since_ba = 0
        visited = {root}
        for now, nxt in edges:
            # initialize camera[nxt] from camera[now]
            # (camera_estimator.cc:59-69)
            K_now = intrinsic(params[now, 0], params[now, 1], params[now, 2])
            R_now = _np_rod(params[now, 3:6])
            K_next = intrinsic(params[nxt, 0], 0.0, 0.0)
            H = homos[now, nxt]                   # maps next -> now
            Mt = np.linalg.inv(K_now) @ H @ K_next
            R_next = (R_now.T @ Mt).T
            params[nxt, 1:3] = 0.0
            params[nxt, 3:6] = _np_unrod(R_next)

            visited.add(nxt)
            if cfg.MULTIPASS_BA > 0:
                for i in sorted(visited - {nxt}):
                    key = (min(i, nxt), max(i, nxt))
                    if key in conn:
                        n_active += slots_by_key[key]
                        n_active_c += slots_c_by_key[key]
                        if cfg.MULTIPASS_BA == 2:
                            run_ba(inter_iters,
                                   patience=cfg.BA_INTERMEDIATE_PATIENCE,
                                   rel_tol=cfg.BA_INTERMEDIATE_REL_TOL,
                                   capped=True)
                if cfg.MULTIPASS_BA == 1:
                    since_ba += 1
                    if since_ba >= batch_k or len(visited) == n:
                        run_ba(inter_iters,
                               patience=cfg.BA_INTERMEDIATE_PATIENCE,
                               rel_tol=cfg.BA_INTERMEDIATE_REL_TOL,
                               capped=True)
                        since_ba = 0

    if cfg.MULTIPASS_BA == 0:                     # camera_estimator.cc:92-99
        # one global BA; the reference adds every pair as add_match(i, j)
        # with j < i, i.e. to = the smaller index = stored orientation
        pair_swapped[:] = False
        _prob_cache.clear()  # swapped flags changed under the cache
        n_active = P
        run_ba()
    elif inter_iters < LM_MAX_ITER:
        # final full-depth polish
        run_ba(cfg.BA_FINAL_MAX_ITER, patience=cfg.BA_FINAL_PATIENCE)

    if stats is not None and len(activation):
        # final self-consistency residual over all active pairs (the
        # structured-metrics analog of the reference's per-iteration
        # "BA: Error ..." print, incremental_bundle_adjuster.cc:150);
        # same placement as the LM solves — f64 on a TPU default device
        # would software-emulate (see Config.BA_ON_HOST)
        from .bundle_adjuster import _pairs_residuals

        with ba_ctx():
            prob_all = BAPairProblem(
                pt_to=jnp.asarray(pt_to_slab),
                pt_from=jnp.asarray(pt_from_slab),
                w=jnp.asarray(w_slab), cam_to=jnp.asarray(cam_a),
                cam_from=jnp.asarray(cam_b),
                swapped=jnp.asarray(pair_swapped),
                pair_w=jnp.ones(P),
            )
            r, wm = _pairs_residuals(jnp.asarray(params), prob_all)
        npts = float((np.asarray(wm) > 0).sum())
        stats["ba_rms_px"] = float(
            np.sqrt(np.sum(np.asarray(r) ** 2) / max(npts * 2.0, 1.0))
        )
        stats["ba_points"] = int(npts)
        stats["ba_pairs"] = len(activation)

    cams = CameraSet(
        focal=params[:, 0].copy(),
        ppx=params[:, 1].copy(),
        ppy=params[:, 2].copy(),
        R=np.stack([_np_rod(params[i, 3:6]) for i in range(n)]),
    )
    if cfg.STRAIGHTEN:
        cams = straighten(cams)                   # camera_estimator.cc:101
    return cams
