"""Multi-chip sharded pipeline step.

One jitted function running the full stitching compute path with mesh
shardings — the "training step" of this framework:

  stage                sharding (1-D mesh axis "d")         comm inserted
  -------------------  -----------------------------------  --------------
  SIFT features        images data-parallel  [N,...] P(d)   none
  pair match + RANSAC  pairs sharded         [P,...] P(d)   all-gather of
                                                            descriptors
  BA normal equations  per-pair blocks P(d) -> JtJ/Jtb      psum (via sharded
                       replicated solve                     scatter-add)
  canvas blend         canvas rows sharded   [H,W] P(d)     gather of images

The reference's analog is OpenMP loops (SURVEY.md §2.6); here XLA inserts
the collectives from sharding constraints (scaling-book recipe: pick a mesh,
annotate, let the compiler place all-gathers/psums on ICI).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..camera.bundle_adjuster import (
    _normal_equations,
    pairs_to_points,
    solve_sym_refined,
)
from ..config import Config
from ..geometry.ransac import estimate_transform
from ..match.matcher import match_pair
from ..sift.detector import detect_and_describe
from ..stitch.projection import PROJECTIONS
from ..ops.imgproc import sample_bilinear


def _constraint(mesh, x, *spec):
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def sharded_pipeline_step(imgs, whs, ii, jj, key, cfg: Config, mesh: Mesh,
                          canvas_hw=(64, 128)):
    """Run features -> matching -> RANSAC -> one BA normal-equation solve ->
    blend, all inside one jit over the mesh.

    imgs: [N,H,W,3] (sharded over images); whs: [N,2]; ii/jj: [P] pair
    indices; key: PRNG key.  Returns a dict of stage outputs.

    N and P are padded up to multiples of the mesh size (padded pairs are
    masked out of the BA accumulation).
    """
    nd = mesh.devices.size
    n_real = imgs.shape[0]
    p_real = ii.shape[0]

    def pad_to(x, mult, axis=0):
        r = (-x.shape[axis]) % mult
        if r == 0:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, r)
        return jnp.pad(x, widths, mode="edge")

    imgs = pad_to(imgs, nd)
    whs = pad_to(whs, nd)
    ii = pad_to(ii, nd)
    jj = pad_to(jj, nd)
    pair_mask = jnp.arange(ii.shape[0]) < p_real

    @functools.partial(
        jax.jit,
        static_argnames=("cfg",),
        in_shardings=(
            NamedSharding(mesh, P("d")),   # imgs
            NamedSharding(mesh, P()),      # whs
            NamedSharding(mesh, P("d")),   # ii
            NamedSharding(mesh, P("d")),   # jj
            NamedSharding(mesh, P()),      # key
            NamedSharding(mesh, P("d")),   # pair_mask
        ),
    )
    def step(imgs, whs, ii, jj, key, pair_mask, cfg):
        n = imgs.shape[0]
        nP = ii.shape[0]

        # ---- stage 1: data-parallel features over images ----
        feats = jax.vmap(lambda im, wh: detect_and_describe(im, wh, cfg))(
            imgs, whs
        )
        desc = _constraint(mesh, feats.desc, "d")
        pos = _constraint(mesh, feats.pos, "d")
        valid = _constraint(mesh, feats.valid, "d")

        # ---- stage 2: pair-sharded matching + RANSAC ----
        keys = jax.random.split(key, nP)

        def pair_step(i, j, k):
            m = match_pair(desc[i], valid[i], desc[j], valid[j], cfg)
            return m, estimate_transform(
                m, pos[i], valid[i], pos[j], valid[j], whs[i], whs[j],
                k, cfg, affine=False,
            )

        matches, infos = jax.vmap(pair_step)(ii, jj, keys)
        infos = jax.tree_util.tree_map(lambda a: _constraint(mesh, a, "d"), infos)

        # ---- stage 3: one BA normal-equation assembly + solve ----
        prob = pairs_to_points(
            ii, jj,
            infos.to_pos.astype(jnp.float64),
            infos.from_pos.astype(jnp.float64),
            infos.valid,
            ((infos.confidence > 0) & pair_mask).astype(jnp.float64),
        )
        params = jnp.zeros((n, 6), jnp.float64)
        params = params.at[:, 0].set((whs[:, 0] + whs[:, 1]) * 0.5)
        resid = jnp.zeros((prob.w.shape[0], 2), jnp.float64)
        JtJ, Jtb = _normal_equations(params, resid, prob, n)
        # f64 LU doesn't lower on TPU: Jacobi-scaled f32 LU + f64 refinement
        delta = solve_sym_refined(
            JtJ + jnp.eye(n * 6, dtype=jnp.float64), Jtb
        )

        # ---- stage 4: canvas blend, rows sharded (SP analog) ----
        out_h, out_w = canvas_hw
        _, proj2homo = PROJECTIONS["flat"]
        jjx = jnp.arange(out_w, dtype=jnp.float32) - out_w / 2
        iiy = jnp.arange(out_h, dtype=jnp.float32) - out_h / 2
        grid = jnp.stack(
            [jnp.broadcast_to(jjx[None, :], (out_h, out_w)),
             jnp.broadcast_to(iiy[:, None], (out_h, out_w))], -1,
        )
        hm = proj2homo(grid)
        hm = _constraint(mesh, hm, "d")

        def blend_body(i, acc):
            color_acc, w_acc = acc
            # inverse map: canvas -> image i, spread along x by image index
            dx = (i.astype(jnp.float32) - n_real / 2.0) * 8.0
            Hinv = jnp.eye(3, dtype=jnp.float32).at[0, 2].set(-dx)
            ret = jnp.einsum("hwc,dc->hwd", hm, Hinv)
            z = jnp.where(jnp.abs(ret[..., 2]) > 1e-20, ret[..., 2], 1e-20)
            sx = ret[..., 0] / z + whs[i, 0] * 0.5
            sy = ret[..., 1] / z + whs[i, 1] * 0.5
            color, ok = sample_bilinear(imgs[i].astype(jnp.float32), sy, sx)
            w = jnp.where(ok & (i < n_real), 1.0, 0.0)
            return (color_acc + color * w[..., None], w_acc + w)

        color0 = jnp.zeros((out_h, out_w, 3), jnp.float32)
        w0 = jnp.zeros((out_h, out_w), jnp.float32)
        color0 = _constraint(mesh, color0, "d")
        color, wsum = jax.lax.fori_loop(0, n, blend_body, (color0, w0))
        canvas = color / jnp.maximum(wsum, 1.0)[..., None]
        canvas = _constraint(mesh, canvas, "d")

        return {
            "kpt_count": jnp.sum(valid, axis=1),
            "match_count": matches.count,
            "confidence": infos.confidence,
            "ba_delta_norm": jnp.linalg.norm(delta),
            "canvas": canvas,
        }

    out = step(imgs, whs, ii, jj, key, pair_mask, cfg)
    # strip padding from per-image / per-pair outputs
    out["kpt_count"] = out["kpt_count"][:n_real]
    out["match_count"] = out["match_count"][:p_real]
    out["confidence"] = out["confidence"][:p_real]
    return out
