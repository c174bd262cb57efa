"""openpano_tpu: a TPU-native panorama stitching / SfM engine (JAX/XLA/Pallas).

Built from scratch with the capabilities of the OpenPano reference
(see SURVEY.md): SIFT feature pipeline, exact MXU 2-NN matching, vmapped
RANSAC, rotation+focal bundle adjustment, and projection/blending — all as
batched fixed-shape XLA programs, sharded over device meshes for scale.
"""

from .config import Config, DEFAULT

__version__ = "0.1.0"
__all__ = ["Config", "DEFAULT", "__version__"]
