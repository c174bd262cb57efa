"""Device mesh bootstrap, single- and multi-process.

The reference's only parallelism is single-process OpenMP threading
(SURVEY.md §2.6).  The TPU-native equivalents ride a 1-D jax.sharding.Mesh
with axis "d":
  - images  -> data-parallel shards (feature stage),
  - match pairs -> sharded pair blocks (matching + RANSAC),
  - BA residual/JtJ accumulation -> psum over "d",
  - output canvas column bands -> sharded blend with a neighbor halo
    ppermute (the sequence/context-parallel analog for the gigapixel
    canvas).

Multi-host (SURVEY.md §5.8): ``init_distributed`` brings up the
jax.distributed runtime (coordinator + N processes; on a TPU pod slice the
arguments are auto-detected from the environment), after which
``jax.devices()`` spans every host and ``make_mesh()`` builds a global
mesh whose collectives ride ICI within a slice and DCN across hosts.  The
same sharded code (dist_ba, blend_linear_sharded, stitch_sharded) runs
unchanged — GSPMD addresses global arrays; each process feeds and reads
its addressable shards.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Bring up the multi-process JAX runtime (no-op when already up).

    On Cloud TPU pods every argument is auto-detected; for CPU/GPU
    clusters (or localhost simulation) pass coordinator ("host:port"),
    the process count, and this process's id.

    Must run before anything initializes the XLA backend (jax.devices()
    etc.) — idempotence is handled by catching the already-initialized
    RuntimeError rather than probing jax internals."""
    if getattr(jax.distributed, "is_initialized", lambda: False)():
        return
    kw = {}
    if coordinator_address is not None:
        kw = dict(coordinator_address=coordinator_address,
                  num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kw)
    except RuntimeError as e:
        if "already" not in str(e).lower():
            raise


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the first n (default: all) GLOBAL devices — spans
    every process after :func:`init_distributed`."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, ("d",))


def shard_on(mesh: Mesh, *axis_spec) -> NamedSharding:
    return NamedSharding(mesh, P(*axis_spec))
