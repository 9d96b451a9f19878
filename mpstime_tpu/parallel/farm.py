"""Fold/trial farming across local devices.

The reference distributes hyperopt CV folds and outer evaluation folds to
Distributed.jl worker processes (``pmap`` + ``CachingPool``, tuning.jl:112,
evaluate.jl:281-286; worker-pool partitioning ``divide_procs``,
hyperopt_utils.jl:49-60).  The TPU-native equivalent: each fold job (an
entire ``fit_mps`` + ``eval_loss`` — shapes far too small to need more than
one chip) is pinned to one local device via the thread-local
``jax.default_device`` context, and a thread-per-device pool drains a shared
job queue.  JAX dispatch releases the GIL, so D devices genuinely overlap;
on a single-device host the farm degenerates to the sequential path.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, List, Optional, Sequence, Union

import jax


def resolve_devices(devices: Union[None, bool, str, Sequence]) -> Optional[List]:
    """Normalize a ``devices`` argument: None/False -> no farming,
    True/"all" -> every local device, a platform name (e.g. "cpu") -> that
    platform's devices, else a list of jax devices."""
    if devices is None or devices is False:
        return None
    if devices is True or (isinstance(devices, str) and devices == "all"):
        return list(jax.local_devices())
    if isinstance(devices, str):
        return list(jax.devices(devices))   # platform name, e.g. "cpu"
    devs = list(devices)
    return devs if devs else None


def resolve_process_farm(devices):
    """Recognize the process-backend spellings of the ``devices`` argument:
    a :class:`ProcessFarm` instance passes through; ``"processes"`` /
    ``"processes:N"`` builds one (N workers; default min(4, cpu_count)).
    Returns None for every device-backend spelling."""
    from .procfarm import ProcessFarm

    if isinstance(devices, ProcessFarm):
        return devices
    if isinstance(devices, str) and (devices == "processes"
                                     or devices.startswith("processes:")):
        n = int(devices.split(":", 1)[1]) if ":" in devices else 0
        return ProcessFarm(n)
    return None


def divide_devices(devices: Sequence, njobs: int) -> List[List]:
    """Partition a device list into ``njobs`` sublists (the reference's
    ``divide_procs`` worker-pool partitioning, hyperopt_utils.jl:49-60):
    with more devices than jobs each job gets a roughly-equal contiguous
    chunk (so its INNER work can farm over the chunk); with fewer, devices
    are dealt round-robin, one per job."""
    devs = list(devices)
    if njobs <= 0:
        return []
    if len(devs) <= njobs:
        return [[devs[i % len(devs)]] for i in range(njobs)]
    q, r = divmod(len(devs), njobs)
    out, start = [], 0
    for i in range(njobs):
        size = q + (1 if i < r else 0)
        out.append(devs[start:start + size])
        start += size
    return out


class DeviceFarm:
    """Run independent jobs round-robin across a set of local devices.

    ``DeviceFarm(None)`` is the sequential degenerate (one default device);
    ``DeviceFarm("all")`` farms over every local device.  Results keep the
    input order.  The first exception wins: remaining queued jobs are
    cancelled and the exception re-raised on the caller.
    """

    def __init__(self, devices: Union[None, bool, str, Sequence] = "all"):
        devs = resolve_devices(devices)
        self.devices = devs if devs else list(jax.local_devices())[:1]

    def map(self, fn: Callable[[Any], Any], items) -> List[Any]:
        items = list(items)
        if len(self.devices) <= 1 or len(items) <= 1:
            return [fn(it) for it in items]

        jobq: "queue.Queue" = queue.Queue()
        for i, it in enumerate(items):
            jobq.put((i, it))
        results: List[Any] = [None] * len(items)
        errors: List[BaseException] = []

        def worker(dev):
            while not errors:
                try:
                    i, it = jobq.get_nowait()
                except queue.Empty:
                    return
                try:
                    with jax.default_device(dev):
                        results[i] = fn(it)
                except BaseException as e:
                    errors.append(e)
                    return

        threads = [threading.Thread(target=worker, args=(d,), daemon=True)
                   for d in self.devices[:len(items)]]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errors:
            raise errors[0]
        return results
