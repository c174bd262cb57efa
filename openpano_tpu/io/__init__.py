from .image import INVALID, read_img, write_rgb

__all__ = ["read_img", "write_rgb", "INVALID"]
