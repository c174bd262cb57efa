from .rotation import rodrigues, rotation_to_angle
from .camera import CameraSet, estimate_focal, straighten, intrinsic
from .bundle_adjuster import BAProblem, ba_optimize
from .estimator import estimate_cameras

__all__ = [
    "rodrigues",
    "rotation_to_angle",
    "CameraSet",
    "estimate_focal",
    "straighten",
    "intrinsic",
    "BAProblem",
    "ba_optimize",
    "estimate_cameras",
]
