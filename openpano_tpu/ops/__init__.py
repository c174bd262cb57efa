from .gaussian import blur, gauss_kernel
from .imgproc import (
    INVALID,
    crop_to_largest_rect,
    hconcat,
    vconcat,
    resize,
    rgb2grey,
    sample_bilinear,
    working_size,
)

__all__ = [
    "blur", "gauss_kernel", "resize", "rgb2grey", "sample_bilinear",
    "crop_to_largest_rect", "hconcat", "vconcat", "working_size", "INVALID",
]
