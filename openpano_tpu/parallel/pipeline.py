"""Multi-chip sharded pipeline: the REAL stitching algorithm over a mesh.

Every device stage of ``stitch()`` runs sharded over the mesh's first axis
(the "training step" of this framework — stitch/stitcher.cc:32-63 as one
partitioned program):

  stage                sharding (1-D mesh axis "d")         comm inserted
  -------------------  -----------------------------------  --------------
  SIFT features        images data-parallel  [N,...] P(d)   none
  pair match + RANSAC  pairs sharded         [P,...] P(d)   all-gather of
                                                            descriptors
  incremental LM BA    pair-major point slabs P(d);         psum of JtJ/Jtb
                       cameras replicated, dense solve      (dist_ba.py)
                       replicated
  linear blend         canvas column bands   [H,W] P(d)     neighbor halo
                       (the CP/SP analog)                   ppermute (ICI)

Host-side planning (max-spanning-tree traversal, render planning) is the
same tiny sequential code as the single-device path — only the device work
is partitioned, so the mesh path produces the same panorama (and a test
asserts 1-device vs n-device equality, tests/test_parallel.py).

The reference's analog is OpenMP loops (SURVEY.md §2.6); here XLA inserts
the collectives from sharding annotations (scaling-book recipe: pick a
mesh, annotate, let the compiler place all-gathers/psums on ICI).
"""

from __future__ import annotations

from ..config import Config
from ..stitch.stitcher import stitch


def stitch_sharded(imgs, cfg: Config, mesh, key=None, output: str = "f32"):
    """Full Stitcher::build with all device stages sharded over ``mesh``.

    Thin alias of ``stitch(..., mesh=mesh)`` — the sharded pipeline IS the
    production pipeline, not a separate code path."""
    return stitch(imgs, cfg, key=key, output=output, mesh=mesh)


def sharded_pipeline_step(imgs, whs, ii, jj, key, cfg: Config, mesh,
                          canvas_hw=None):
    """Back-compat shim for the round-1 entry point: runs the real
    end-to-end sharded pipeline (features -> matching -> RANSAC ->
    incremental LM BA -> planned + sharded blend) and returns stage
    outputs.  ``whs``/``ii``/``jj``/``canvas_hw`` are ignored — the real
    pipeline derives pair lists and canvas geometry itself."""
    del whs, ii, jj, canvas_hw
    canvas = stitch_sharded(imgs, cfg, mesh, key=key)
    return {"canvas": canvas}
