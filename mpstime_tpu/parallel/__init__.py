from .mesh import make_mesh, shard_train_arrays, replicate
from .farm import DeviceFarm, resolve_devices

__all__ = ["make_mesh", "shard_train_arrays", "replicate",
           "DeviceFarm", "resolve_devices"]
