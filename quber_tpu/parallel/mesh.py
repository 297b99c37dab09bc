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


def initialize_multihost(coordinator: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Multi-host data parallelism over DCN: one call before any JAX use.

    The reference reaches multi-node through detectron2's launch args
    (--num-machines/--machine-rank + a TCP dist_url rendezvous,
    /root/reference/train_net.py:204-214). The JAX equivalent is
    jax.distributed.initialize, after which jax.devices() spans every host
    and the SAME 1-D mesh / train step works unchanged — XLA routes the
    gradient all-reduce hierarchically (ICI within a host, DCN across).
    Arguments default to cluster-autodetect (GKE/Cloud TPU metadata) or the
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars.
    """
    import jax

    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def put_batch_local_shard(batch, mesh: Mesh, axis_name: str = "data"):
    """Multi-host twin of put_batch: each process contributes only its OWN
    slice of the global batch (local batch size = global / num_processes).

    jax.make_array_from_process_local_data assembles the global sharded
    array from per-process host shards without any cross-host copy of the
    full batch — the multi-host replacement for device_put (which would
    need the whole global array on every host). Identical to put_batch in
    a single-process run.
    """
    full = shard_batch(mesh, axis_name)
    data_only = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            full if np.ndim(x) >= 2 else data_only, np.asarray(x)
        ),
        batch,
    )
