from .mesh import make_mesh
from .pipeline import sharded_pipeline_step

__all__ = ["make_mesh", "sharded_pipeline_step"]
