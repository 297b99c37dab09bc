from quber_tpu.parallel.mesh import (
    initialize_multihost,
    make_mesh,
    make_mesh_2d,
    put_batch,
    put_batch_local_shard,
    replicate,
    shard_batch,
)

__all__ = [
    "initialize_multihost",
    "make_mesh",
    "make_mesh_2d",
    "put_batch",
    "put_batch_local_shard",
    "replicate",
    "shard_batch",
]
