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


def mesh_platform(mesh: Mesh) -> str:
    return next(iter(mesh.devices.flat)).platform


# ---------------------------------------------------------------------------
# shard_map-wrapped sweeps: the production multi-chip path.
#
# GSPMD partitions the XLA bond path automatically, but the fused Pallas
# bond kernels lower to custom calls the SPMD partitioner cannot split.
# Wrapping the WHOLE sweep in shard_map makes every kernel a per-shard call
# on its local batch block and reduces each bond's local gradient with one
# explicit psum — the same "one collective of the [chi*d, d*chi, C] gradient
# per bond update" contract as the GSPMD path (module docstring), now valid
# for both the XLA and the Pallas engines.  check_vma=False: pallas_call is
# opaque to the replication checker.
# ---------------------------------------------------------------------------

_SHARDED_CACHE: dict = {}


def _cached_sharded(kind: str, mesh: Mesh, axis: str, in_specs, out_specs,
                    impl, statics: dict):
    key = (kind, mesh, axis, tuple(sorted(statics.items())))
    fn = _SHARDED_CACHE.get(key)
    if fn is None:
        from functools import partial
        body = partial(impl, axis_name=axis, platform=mesh_platform(mesh),
                       **statics)
        fn = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                                   out_specs=out_specs, check_vma=False))
        _SHARDED_CACHE[key] = fn
    return fn


def sharded_full_sweeps(mesh: Mesh, cores, center, phis_c, y_onehot,
                        class_weight, eta, cutoff, *, axis: str = "dp",
                        **statics):
    """full_sweeps under shard_map over ``mesh``: cores/center replicated,
    batch tensors sharded on the sample axis (place them with
    :func:`shard_train_arrays` first).  statics = nsweeps/loss/bbopt/
    update_iters/rescale/svd_alg/refresh_every."""
    from ..training.sweep import _full_sweeps_impl
    in_specs = (P(), P(), P(None, axis), P(axis), P(axis), P(), P())
    fn = _cached_sharded("sweeps", mesh, axis, in_specs, (P(), P()),
                         _full_sweeps_impl, statics)
    return fn(cores, center, phis_c, y_onehot, class_weight, eta, cutoff)


def _sweep_warm_body(cores, center, subspaces, phis_c, y_onehot,
                     class_weight, eta, cutoff, **kw):
    from ..training.sweep import _sweep_once
    return _sweep_once(cores, center, phis_c, y_onehot, class_weight,
                       eta, cutoff, subspaces=subspaces, **kw)


def sharded_full_sweep_warm(mesh: Mesh, cores, center, subspaces, phis_c,
                            y_onehot, class_weight, eta, cutoff, *,
                            axis: str = "dp", track_cost: bool = False,
                            **statics):
    """full_sweep_warm under shard_map (per-sweep host-visibility path:
    logging / exit_early / track_cost under a mesh).  Returns
    (cores, center, subspaces[, costs])."""
    in_specs = (P(), P(), P(), P(None, axis), P(axis), P(axis), P(), P())
    out_specs = (P(), P(), P()) + ((P(),) if track_cost else ())
    fn = _cached_sharded("sweep_warm", mesh, axis, in_specs, out_specs,
                         _sweep_warm_body, dict(statics, track_cost=track_cost))
    return fn(cores, center, subspaces, phis_c, y_onehot, class_weight,
              eta, cutoff)


def _sweep_body(cores, center, phis_c, y_onehot, class_weight, eta, cutoff,
                *, track_cost: bool = False, **kw):
    from ..training.sweep import _sweep_once
    out = _sweep_once(cores, center, phis_c, y_onehot, class_weight,
                      eta, cutoff, track_cost=track_cost, **kw)
    if track_cost:
        return out[0], out[1], out[-1]
    return out[0], out[1]


def sharded_full_sweep(mesh: Mesh, cores, center, phis_c, y_onehot,
                       class_weight, eta, cutoff, *, axis: str = "dp",
                       track_cost: bool = False, **statics):
    """full_sweep under shard_map (non-warm svd algorithms).  Returns
    (cores, center[, costs])."""
    in_specs = (P(), P(), P(None, axis), P(axis), P(axis), P(), P())
    out_specs = (P(), P()) + ((P(),) if track_cost else ())
    fn = _cached_sharded("sweep", mesh, axis, in_specs, out_specs,
                         _sweep_body, dict(statics, track_cost=track_cost))
    return fn(cores, center, phis_c, y_onehot, class_weight, eta, cutoff)
