"""Host-side image IO.

The reference decodes JPEG/PNG with vendored CImg/lodepng into float RGB in
[0,1] (lib/imgio.cc:25-113) with the sentinel value -1 ("Color::NO") marking
invalid pixels, written out as white (imgio.cc:98-113).  On TPU the decode
stays on host (PIL) and arrays are fed to the device as float32 RGB [0,1];
the -1 invalid-pixel sentinel convention is preserved across the pipeline.
"""

from __future__ import annotations

import numpy as np

INVALID = -1.0  # Color::NO sentinel (lib/color.hh)


def read_img(path: str) -> np.ndarray:
    """Decode an image file to float32 RGB in [0,1], shape [H, W, 3]."""
    return read_img_u8(path).astype(np.float32) / 255.0


def read_img_u8(path: str) -> np.ndarray:
    """Decode to uint8 RGB [H, W, 3] — the cheap host->device upload form
    (4x fewer bytes than float32; converted to [0,1] on device).

    PNG files go through the native zlib codec (native/png_codec.c, the
    lodepng analog — lib/imgio.cc:25-61); everything else (and PNG variants
    the native codec skips: 16-bit, interlaced) decodes via PIL."""
    if path.lower().endswith(".png"):
        from ..native import png_decode_rgb8

        with open(path, "rb") as f:
            data = f.read()
        arr = png_decode_rgb8(data)
        if arr is not None:
            return arr
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"unsupported image {path}: shape {arr.shape}")
    return arr


def write_rgb(path: str, img: np.ndarray) -> None:
    """Encode float RGB [0,1] (invalid -1 pixels become white, matching the
    reference writer imgio.cc:83-96) or ready uint8 RGB to file.  PNG
    output goes through the native codec; PIL handles other formats."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.asarray(img, dtype=np.float32)
        invalid = img.min(axis=-1, keepdims=True) < 0
        img = np.where(invalid, 1.0, img)
        img = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    if path.lower().endswith(".png"):
        from ..native import png_encode_rgb8

        data = png_encode_rgb8(img)
        if data is not None:
            with open(path, "wb") as f:
                f.write(data)
            return
    from PIL import Image

    Image.fromarray(img, mode="RGB").save(path)
