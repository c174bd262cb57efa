"""openpano_tpu: a TPU-native panorama stitching / SfM engine (JAX/XLA/Pallas).

Built from scratch with the capabilities of the OpenPano reference
(see SURVEY.md): SIFT feature pipeline, exact MXU 2-NN matching, vmapped
RANSAC, rotation+focal bundle adjustment, and projection/blending — all as
batched fixed-shape XLA programs, sharded over device meshes for scale.
"""

import os as _os

import jax as _jax

# The solver path (DLT refits, bundle adjustment, homography chains) is
# double-precision in the reference (lib/matrix.hh:9, homography.hh:22);
# without x64 their f64 arrays would silently degrade to f32.  Image
# kernels stay explicitly float32/bfloat16.
_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: TPU compiles of the batched pipeline are
# expensive (remote compile service); cache them across processes.
# OPENPANO_NO_COMPILE_CACHE=1 opts out — the test suite sets it because
# XLA:CPU's executable serialize can CHECK-abort on some programs
# (observed r4 on the heterogeneous-bucket feature executable), and a
# SIGABRT mid-suite is worse than recompiling.
if not _os.environ.get("JAX_COMPILATION_CACHE_DIR") \
        and _os.environ.get("OPENPANO_NO_COMPILE_CACHE", "") != "1":
    _cache = _os.path.join(_os.path.expanduser("~"), ".cache", "openpano_tpu_jax")
    _os.makedirs(_cache, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from .config import Config, DEFAULT  # noqa: E402

__version__ = "0.1.0"
__all__ = ["Config", "DEFAULT", "stitch_images", "stitch_files", "__version__"]


def stitch_images(imgs, cfg: Config | None = None, key=None,
                  output: str = "f32", mesh=None):
    """Stitch a [N, H, W, 3] image stack (uint8 or float32 in [0,1]).

    Dispatches on cfg mode like the reference's work() (main.cc:205-235):
    CYLINDER -> CylinderStitcher, otherwise the general Stitcher.  Returns
    the blended canvas; with output="u8" returns (canvas_u8, valid_mask).
    With ``mesh`` (a jax.sharding.Mesh), every device stage runs sharded
    over its first axis (see stitch.stitcher.stitch).

    (Renamed from ``stitch()`` in 0.1.0 — the old name was shadowed by the
    ``openpano_tpu.stitch`` subpackage after first import.)
    """
    cfg = cfg or DEFAULT
    if cfg.CYLINDER:
        from .stitch.cylstitcher import stitch_cylinder

        canvas = stitch_cylinder(imgs, cfg, key)
        if output == "u8":
            import numpy as np

            valid = np.asarray(canvas[..., 0] >= 0)
            u8 = np.round(np.clip(canvas, 0, 1) * 255).astype("uint8")
            return np.where(valid[..., None], u8, np.uint8(255)), valid
        return canvas
    from .stitch.stitcher import stitch as _stitch

    return _stitch(imgs, cfg, key, output=output, mesh=mesh)


def stitch_files(paths, cfg: Config | None = None, out: str | None = None,
                 key=None, crop: bool | None = None):
    """Stitch image files into a panorama; optionally write it to ``out``.

    The one-call API a reference CLI user expects: decodes (native PNG
    codec / PIL), stitches in the configured mode, crops to the largest
    valid rectangle (cfg.CROP unless overridden), writes ``out`` if given,
    and returns the uint8 RGB canvas.
    """
    import numpy as np

    from .io.image import read_img_u8, write_rgb

    cfg = cfg or DEFAULT
    imgs = [read_img_u8(p) for p in paths]
    shapes = {im.shape for im in imgs}
    if len(shapes) == 1:
        canvas, valid = stitch_images(np.stack(imgs), cfg, key=key, output="u8")
    else:
        # mixed sizes: per-shape feature buckets + sentinel-padded blend
        # stack (reference: per-image shapes, stitch/imageref.hh:13-35)
        if cfg.CYLINDER:
            raise ValueError("CYLINDER mode requires uniform image sizes")
        from .stitch.stitcher import stitch_hetero

        canvas, valid = stitch_hetero(imgs, cfg, key=key, output="u8")
    if crop if crop is not None else cfg.CROP:
        from .ops.imgproc import crop_with_mask

        canvas = crop_with_mask(canvas, valid)
    if out:
        write_rgb(out, canvas)
    return canvas
