from .homography import (
    health,
    homo_inverse,
    trans2d,
    translation,
    overlap_mask_in1,
    overlap_area_fraction,
)
from .dlt import perspective_dlt, affine_dlt, normalized_transform
from .ransac import MatchInfo, estimate_transform, estimate_transform_batch

__all__ = [
    "health",
    "homo_inverse",
    "trans2d",
    "translation",
    "overlap_mask_in1",
    "overlap_area_fraction",
    "perspective_dlt",
    "affine_dlt",
    "normalized_transform",
    "MatchInfo",
    "estimate_transform",
    "estimate_transform_batch",
]
