"""Device-mesh and sharding helpers.

The reference is strictly single-device (SURVEY.md section 2: the only
parallelism is a ``--gpu <id>`` flag plus host-side data-loader processes).
This module is the TPU-native scale-out layer that replaces it: a 2-D
``jax.sharding.Mesh`` with axes

* ``data``    — batch (data parallelism; gradients reduced by XLA ``psum``
                over ICI),
* ``spatial`` — image-height (within-image spatial sharding for very large
                multi-scale inputs; XLA's SPMD partitioner inserts the
                conv halo exchanges automatically).

Everything is plain ``NamedSharding`` + ``jax.jit`` — the NCCL-equivalent is
the XLA collectives runtime, no custom transport layer (SURVEY.md section 2,
"Parallelism inventory").
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize`` passthrough.

    On a multi-host TPU pod slice, call this once per host before building
    meshes; JAX then exposes all chips of the slice in ``jax.devices()``
    and the (data, spatial) mesh spans hosts, with gradient psums riding
    ICI within the slice and DCN across slices.  No-ops cleanly in
    single-process settings (TPU pods auto-detect via the metadata
    server, so all arguments may be None).
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_mesh(n_data: Optional[int] = None, n_spatial: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, spatial) mesh over ``devices`` (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_spatial
    if n_data * n_spatial > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_spatial} needs more than the "
            f"{len(devices)} available devices")
    grid = np.asarray(devices[: n_data * n_spatial]).reshape(
        n_data, n_spatial)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) image batches: batch over data, height over spatial."""
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))


def data_only_sharding(mesh: Mesh) -> NamedSharding:
    """(B, ...) per-sample arrays sharded on the batch axis only."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, opt state, scalars)."""
    return NamedSharding(mesh, P())


# Arrays whose axis 1 is image height (sharded over 'spatial' too);
# everything else shards on the batch axis only.
_SPATIAL_KEYS = frozenset({"imgs", "ignore_mask"})


def shard_batch(batch, mesh: Mesh, spatial_keys=_SPATIAL_KEYS):
    """Place a host batch dict onto the mesh with the right shardings.

    Keys in ``spatial_keys`` are (B, H, ...) image-likes sharded
    (data, spatial); all other arrays shard on the batch axis only (e.g.
    the (B, P, 18, 3) pose tables, whose axis 1 is persons, not height).
    """
    def put(key, x):
        if key in spatial_keys and x.ndim >= 3:
            return jax.device_put(x, batch_sharding(mesh))
        return jax.device_put(x, data_only_sharding(mesh))

    return {k: put(k, v) for k, v in batch.items()}
