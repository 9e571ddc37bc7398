"""Mesh / sharding helpers (the reference is single-device; this layer is
the TPU-native scale-out design, SURVEY.md section 2)."""

from tpupose.parallel.mesh import (
    DATA_AXIS,
    SPATIAL_AXIS,
    batch_sharding,
    data_only_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
