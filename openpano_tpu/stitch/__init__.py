from .projection import PROJECTIONS
from .render import RenderPlan, plan_render, blend_linear
from .warp import CylinderProjector
from .cylstitcher import stitch_cylinder

__all__ = [
    "PROJECTIONS",
    "RenderPlan",
    "plan_render",
    "blend_linear",
    "CylinderProjector",
    "stitch_cylinder",
]
