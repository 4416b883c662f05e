from .mesh import make_mesh, shard_batch_spec, replicate_spec, shard_pytree

__all__ = ["make_mesh", "shard_batch_spec", "replicate_spec", "shard_pytree"]
