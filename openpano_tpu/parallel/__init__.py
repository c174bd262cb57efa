"""Mesh bootstrap + sharded pipeline.

``pipeline`` is imported lazily: its import chain creates jnp constants,
which initializes the XLA backend — that must not happen before a
multi-process worker calls ``mesh.init_distributed``.
"""

from .mesh import init_distributed, make_mesh

__all__ = ["init_distributed", "make_mesh", "sharded_pipeline_step",
           "stitch_sharded"]


def __getattr__(name):
    if name in ("sharded_pipeline_step", "stitch_sharded"):
        from . import pipeline

        return getattr(pipeline, name)
    raise AttributeError(name)
