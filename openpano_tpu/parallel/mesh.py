"""Device mesh bootstrap.

The reference's only parallelism is single-process OpenMP threading
(SURVEY.md §2.6).  The TPU-native equivalents ride a 1-D jax.sharding.Mesh
with axis "d":
  - images  -> data-parallel shards (feature stage),
  - match pairs -> sharded pair blocks (matching + RANSAC),
  - BA residual/JtJ accumulation -> psum over "d",
  - output canvas rows -> sharded blend (the sequence/context-parallel
    analog for the gigapixel canvas).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, ("d",))


def shard_on(mesh: Mesh, *axis_spec) -> NamedSharding:
    return NamedSharding(mesh, P(*axis_spec))
