from .mesh import make_mesh, shard_train_arrays, replicate

__all__ = ["make_mesh", "shard_train_arrays", "replicate"]
