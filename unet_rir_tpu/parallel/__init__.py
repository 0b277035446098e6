"""Parallelism layer: device meshes + SPMD shardings (replaces MirroredStrategy)."""

from unet_rir_tpu.parallel.mesh import (
    Mesh,
    NamedSharding,
    P,
    batch_sharding,
    initialize_distributed,
    make_mesh,
    put_global,
    replicate_state,
    replicated,
    shard_batch,
    shard_epoch_inputs,
)

__all__ = [
    "Mesh",
    "NamedSharding",
    "P",
    "batch_sharding",
    "initialize_distributed",
    "make_mesh",
    "put_global",
    "replicate_state",
    "replicated",
    "shard_batch",
    "shard_epoch_inputs",
]
