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
if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    _cache = _os.path.join(_os.path.expanduser("~"), ".cache", "openpano_tpu_jax")
    _os.makedirs(_cache, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from .config import Config, DEFAULT  # noqa: E402

__version__ = "0.1.0"
__all__ = ["Config", "DEFAULT", "__version__"]
