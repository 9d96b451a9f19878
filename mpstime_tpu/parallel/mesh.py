"""Device-mesh utilities for data-parallel training.

The reference has no intra-model parallelism — its loss is a sequential
per-sample mapreduce (loss_functions.jl:353-364) and its only parallelism is
Distributed.jl process farming for hyperopt folds (SURVEY §2.3).  The
TPU-native design shards the *sample axis* N across a 1-D ``dp`` mesh:

  * phis [T, N, d], y_onehot [N, C], class_weight [N]  -> sharded on N
  * cores, center                                      -> replicated

Every per-bond gradient einsum then contracts over the sharded axis, and XLA
inserts exactly one psum of the [chi*d, d*chi, C] gradient per bond update —
the collective rides ICI.  Nothing else communicates.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if len(devs) < n_devices:
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n_devices]), (axis,))


def shard_train_arrays(mesh: Mesh, phis_c, y_onehot, class_weight,
                       axis: str = "dp"):
    """Place training tensors with the sample axis sharded over the mesh."""
    s_phis = NamedSharding(mesh, P(None, axis, None))      # [T, N, d]
    s_y = NamedSharding(mesh, P(axis, None))               # [N, C]
    s_w = NamedSharding(mesh, P(axis))                     # [N]
    return (jax.device_put(phis_c, s_phis),
            jax.device_put(y_onehot, s_y),
            jax.device_put(class_weight, s_w))


def replicate(mesh: Mesh, *arrays):
    s = NamedSharding(mesh, P())
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) != 1 else out[0]
