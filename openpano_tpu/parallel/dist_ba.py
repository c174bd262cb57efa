"""Distributed bundle adjustment over a device mesh.

The scaling analog of the reference's single-threaded LM core
(incremental_bundle_adjuster.cc): camera state (6n doubles) is tiny and
stays replicated; the expensive parts — per-point residuals and the
JtJ/Jtb normal-equation accumulation over all match points — shard over
pairs.  Annotating the pair-major slabs with a 1-D mesh sharding lets
GSPMD partition the whole LM while_loop: each device reduces its local
pair blocks and XLA inserts the psum (reduce over ICI) for the global
[6n,6n] JtJ before the replicated dense solve (SURVEY.md §5.8: "BA ->
replicated small camera state with reduce-scattered JtJ accumulation").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..camera.bundle_adjuster import BAPairProblem, ba_optimize_pairs


def _pad_pairs(prob: BAPairProblem, mult: int) -> BAPairProblem:
    """Pad the pair axis to a multiple of the mesh size; padded pairs get
    pair_w = 0 so they contribute nothing to residuals or JtJ."""
    Pn = prob.pair_w.shape[0]
    r = (-Pn) % mult
    if r == 0:
        return prob
    def pad(a):
        widths = [(0, r)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths)
    return BAPairProblem(
        pt_to=pad(prob.pt_to), pt_from=pad(prob.pt_from), w=pad(prob.w),
        cam_to=pad(prob.cam_to), cam_from=pad(prob.cam_from),
        swapped=pad(prob.swapped), pair_w=pad(prob.pair_w),
    )


def ba_optimize_pairs_sharded(params, prob: BAPairProblem, identity_idx,
                              n_cam: int, lm_lambda: float,
                              mesh: Mesh,
                              return_iters: bool = False,
                              adaptive: bool = False,
                              max_iter: int | None = None,
                              patience: int | None = None,
                              rel_tol: float = 0.0,
                              banded: bool = False) -> jnp.ndarray:
    """Run the full LM loop with pairs sharded over the mesh's first axis.

    Semantics identical to :func:`ba_optimize_pairs` (same compiled loop —
    GSPMD partitions it); returns the optimized [n_cam, 6] parameters,
    replicated."""
    axis = mesh.axis_names[0]
    nd = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    prob = _pad_pairs(prob, nd)

    pair_sh = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    prob = BAPairProblem(
        pt_to=jax.device_put(prob.pt_to, pair_sh),
        pt_from=jax.device_put(prob.pt_from, pair_sh),
        w=jax.device_put(prob.w, pair_sh),
        cam_to=jax.device_put(prob.cam_to, pair_sh),
        cam_from=jax.device_put(prob.cam_from, pair_sh),
        swapped=jax.device_put(prob.swapped, pair_sh),
        pair_w=jax.device_put(prob.pair_w, pair_sh),
    )
    params = jax.device_put(jnp.asarray(params), repl)
    identity_idx = jax.device_put(jnp.asarray(identity_idx), repl)
    # TPU: f64 LU doesn't lower — use the Jacobi-scaled f64 Cholesky solver.
    # CPU/GPU meshes solve in native f64 so the sharded result is
    # bit-comparable to the single-device path.
    on_tpu = mesh.devices.flat[0].platform == "tpu"
    from ..camera.bundle_adjuster import LM_MAX_ITER, NR_NON_DECREASE

    return ba_optimize_pairs(
        params, prob, identity_idx, n_cam, lm_lambda,
        device_solver=on_tpu, return_iters=return_iters,
        adaptive=adaptive,
        max_iter=LM_MAX_ITER if max_iter is None else max_iter,
        patience=NR_NON_DECREASE if patience is None else patience,
        rel_tol=rel_tol,
        # banded chain solve composes with the pair sharding: the block
        # accumulation psums the small [n,6,6] diag/offdiag operands and
        # the Thomas scan runs replicated
        banded=banded)
