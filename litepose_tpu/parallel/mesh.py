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


def global_batch(local: Any, sharding: NamedSharding) -> Any:
    """Assemble a process-local batch (numpy, leading dim = local batch) into
    a global jax.Array sharded by ``sharding`` over the full (possibly
    multi-host) mesh.

    The reference reaches the same state via DistributedSampler handing each
    rank a disjoint index shard that stays rank-local under DDP
    (``/root/reference/dist_train.py:218-232``); under SPMD the shards must
    be stitched into one global array.  Single-process this is a plain
    ``device_put``; multi-process it uses
    ``jax.make_array_from_process_local_data`` (hosts contribute their local
    rows in process order — matching ``make_batch_iterator``'s
    ``order[process_index::process_count]`` sharding).
    """
    def put(x):
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(put, local)


def replicate_global(tree: Any, sharding: NamedSharding) -> Any:
    """Replicate host-identical pytree leaves over a (possibly multi-host)
    mesh.  Every process must hold the same values (e.g. params initialized
    from the same PRNG key); leaves become fully-replicated global arrays."""
    assert sharding.is_fully_replicated

    def put(x):
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        x = np.asarray(x)
        arrs = [
            jax.device_put(x[idx], d)
            for d, idx in sharding.addressable_devices_indices_map(x.shape).items()
        ]
        return jax.make_array_from_single_device_arrays(x.shape, sharding, arrs)

    return jax.tree.map(put, tree)
