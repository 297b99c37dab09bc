"""Device-mesh utilities: SPMD data parallelism over ICI.

The reference's only parallelism is per-GPU-process DDP over NCCL
(/root/reference/train_net.py:204-214, SURVEY §2d). The TPU-native
equivalent is a 1-D `jax.sharding.Mesh` over the batch axis: jit with
NamedSharding(P("data")) on the batch and replicated params makes XLA insert
the gradient all-reduce over ICI — no process groups, no NCCL. Multi-host DP
over DCN is the same mesh built from `jax.devices()` after
`jax.distributed.initialize()`.

At QuBER's model scale (~82M params, 480x640 inputs) pure DP is the right
strategy (SURVEY §2d); tensor/pipeline sharding would only add collective
traffic. SyncBN == BatchNorm with axis_name="data" (models/layers.make_norm);
the shipped configs use GroupNorm, which is replica-local.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding that splits axis 0 (batch) across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params / optimizer state)."""
    return NamedSharding(mesh, P())


def put_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Device-put a pytree of host arrays with batch-axis sharding."""
    sharding = shard_batch(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
