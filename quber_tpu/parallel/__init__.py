from quber_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    put_batch,
    replicate,
    shard_batch,
)

__all__ = ["make_mesh", "make_mesh_2d", "put_batch", "replicate", "shard_batch"]
