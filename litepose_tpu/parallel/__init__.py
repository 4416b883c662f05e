from .mesh import (
    global_batch,
    make_mesh,
    replicate_global,
    replicate_spec,
    shard_batch_spec,
    shard_pytree,
)

__all__ = [
    "global_batch",
    "make_mesh",
    "replicate_global",
    "replicate_spec",
    "shard_batch_spec",
    "shard_pytree",
]
