"""Device mesh + sharding helpers: SPMD data parallelism over rays.

The reference's only multi-device strategy is Lightning DDP with implicit
NCCL allreduce (/root/reference/train.py:92). The TPU-native equivalent is
SPMD under `jax.jit`: the flat ray batch is sharded over a 1-D `data` mesh
axis, parameters are replicated, and XLA inserts the gradient psum over ICI
in the backward pass automatically. Multi-host feeding goes through
`jax.make_array_from_process_local_data`.

The model itself is a 0.6M-param MLP, so tensor/pipeline parallelism would
only add latency (SURVEY.md §2.2); the scaling axis that matters is rays —
the "sequence" dimension of this workload.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis split over the data mesh axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a host batch with its leading axis sharded over `data`.

    Works for single- and multi-process setups: under multi-host JAX, each
    process contributes its local shard.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
            tree)
    return jax.device_put(tree, sharding)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh.

    Multi-host: `device_put` cannot target non-addressable devices, so each
    process contributes the (identical) full array as its local data for a
    fully-replicated spec. Device-resident leaves pass through device_put
    (they are already global arrays in that case).
    """
    sharding = replicated_sharding(mesh)
    if jax.process_count() > 1:
        def put(x):
            if isinstance(x, jax.Array) and len(x.sharding.device_set) > 1:
                return jax.device_put(x, sharding)
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
        return jax.tree.map(put, tree)
    return jax.device_put(tree, sharding)
