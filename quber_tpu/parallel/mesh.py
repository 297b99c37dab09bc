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

Beyond DP, a second optional mesh axis ("space") shards the image HEIGHT
dimension of every batch tensor: XLA's SPMD partitioner then splits each
convolution spatially and inserts the halo exchanges over ICI itself. This
is the conv-net analog of sequence parallelism — it scales the *resolution*
axis instead of the batch axis, for inputs too large for one chip's HBM or
for latency-bound serving of single large frames. It is a pure sharding
annotation: the train step's program is unchanged, only `PartitionSpec`s
differ (make_mesh_2d + shard_batch on a 2-D mesh).
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


def make_mesh_2d(
    devices=None,
    space: int = 1,
    axis_names: tuple[str, str] = ("data", "space"),
) -> Mesh:
    """2-D (data × space) mesh: batch sharded over `data`, image height over
    `space`. `space` divides the device count; `data` takes the rest."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    n = devices.size
    if n % space:
        raise ValueError(f"space={space} does not divide {n} devices")
    return Mesh(devices.reshape(n // space, space), axis_names)


def shard_batch(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding for batch-major tensors: axis 0 over `data`; on a 2-D mesh
    also axis 1 (image height for [B,H,W,...] tensors) over `space`."""
    if "space" in mesh.axis_names:
        return NamedSharding(mesh, P(axis_name, "space"))
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params / optimizer state)."""
    return NamedSharding(mesh, P())


def put_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Device-put a pytree of host arrays with batch-axis sharding (and, on a
    2-D mesh, height-axis sharding for rank>=2 leaves)."""
    full = shard_batch(mesh, axis_name)
    data_only = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(
        lambda x: jax.device_put(x, full if np.ndim(x) >= 2 else data_only),
        batch,
    )
