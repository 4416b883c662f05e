"""Device mesh and sharding helpers.

The reference's entire distributed stack — ``mp.spawn`` one process per GPU,
NCCL process groups, DistributedDataParallel gradient all-reduce, SyncBN,
DistributedSampler (``/root/reference/dist_train.py:133-286``,
``/root/reference/lib/dataset/build.py:61-90``) — collapses on TPU to a
single SPMD jit over a ``Mesh`` with one ``data`` axis:

  * gradient all-reduce: implicit in jit's partitioning of the summed loss,
    riding ICI;
  * SyncBN: ``jnp.mean`` over a batch sharded on ``data`` IS the global
    mean — no wrapper module needed;
  * DistributedSampler: hosts feed disjoint index shards
    (``data.dataset.make_batch_iterator``);
  * multi-host: ``jax.distributed.initialize()`` once per host, then the
    same code.

These helpers only build the mesh and the shardings; everything else is
plain jit.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = -1, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices
    (-1 = all)."""
    devs = jax.devices()
    if n_devices > 0:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_batch_spec(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Batch-dim sharding for input arrays."""
    return NamedSharding(mesh, P(axis_name))


def replicate_spec(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (params, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_pytree(tree: Any, sharding: NamedSharding) -> Any:
    """Place every leaf of a pytree with the given sharding."""
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
