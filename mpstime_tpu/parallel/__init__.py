from .mesh import (make_mesh, mesh_platform, replicate, shard_train_arrays,
                   sharded_full_sweep, sharded_full_sweep_warm,
                   sharded_full_sweeps)
from .farm import DeviceFarm, resolve_devices

__all__ = ["make_mesh", "mesh_platform", "shard_train_arrays", "replicate",
           "sharded_full_sweeps", "sharded_full_sweep",
           "sharded_full_sweep_warm", "DeviceFarm", "resolve_devices"]
