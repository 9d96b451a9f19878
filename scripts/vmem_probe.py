"""Probe: does raising Mosaic's scoped-VMEM budget let the fused bond
kernels compile+run at chi >= 192 (round-3 task 2)?

For each (chi, vmem_limit) config: build ECG200-shaped training inputs,
run the fused full_sweeps path with the Pallas kernels forced eligible,
and report compile + steady-state s/sweep.  A config that fails (Mosaic
rejection / XLA crash) is reported and skipped.

Run:  nohup python scripts/vmem_probe.py > /tmp/vmem_probe.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _sync(x):
    import jax.numpy as jnp
    return float(jnp.linalg.norm(x))


def run(chi, vmem_mb, nsweeps_block=4, reps=3):
    import jax
    import jax.numpy as jnp

    import mpstime_tpu as mt
    from mpstime_tpu.encodings import encode_dataset
    from mpstime_tpu.models.mps import random_mps
    from mpstime_tpu.ops import pallas_bond
    from mpstime_tpu.training import sweep as sweep_mod
    from mpstime_tpu.utils.preprocessing import transform_data

    d_npz = np.load(os.path.join(_REPO, "tests", "data", "ecg200.npz"))
    X, y = d_npz["X_train"], d_npz["y_train"]
    d = 5
    opts = mt.MPSOptions(chi_max=chi, d=d, verbosity=-1, dtype="float32",
                         svd_alg="randomized_warm")
    Xs, _, _, _ = transform_data(X, np.zeros((0, X.shape[1])), opts)
    ds = encode_dataset(X, Xs, y, opts)
    T, N, C = X.shape[1], X.shape[0], ds.num_classes
    mps = random_mps(opts.init_rng, T, d, C, opts.chi_init, chi, np.float32)
    phis_c = jnp.conj(ds.X_enc).swapaxes(0, 1)
    y1h = jnp.asarray(np.eye(C, dtype=np.float32)[ds.y_idx])
    w = jnp.full((N,), 1.0 / N, jnp.float32)
    kw = dict(loss="KLD", bbopt="TSGO", update_iters=1,
              rescale=(False, True), svd_alg="randomized_warm")
    eta, cut = jnp.float32(opts.eta), jnp.float32(opts.cutoff)

    # force eligibility: bypass the 6 MB guard, set the Mosaic budget
    orig_ok = sweep_mod._pallas_vmem_ok
    sweep_mod._pallas_vmem_ok = lambda *a, **k: True
    pallas_bond.set_vmem_limit(None if vmem_mb is None
                               else vmem_mb * 2 ** 20)
    try:
        jax.clear_caches()
        t0 = time.perf_counter()
        cores, center = sweep_mod.full_sweeps(
            mps.cores, mps.center, phis_c, y1h, w, eta, cut,
            nsweeps=nsweeps_block, **kw)
        _sync(center)
        t_compile = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            cores, center = sweep_mod.full_sweeps(
                mps.cores, mps.center, phis_c, y1h, w, eta, cut,
                nsweeps=nsweeps_block, **kw)
            _sync(center)
            times.append(time.perf_counter() - t0)
        ok = bool(jnp.isfinite(center).all())
        return dict(chi=chi, vmem_mb=vmem_mb, ok=ok,
                    s_per_sweep=round(float(np.median(times)) /
                                      nsweeps_block, 5),
                    compile_s=round(t_compile, 1))
    except Exception as e:                                    # noqa: BLE001
        return dict(chi=chi, vmem_mb=vmem_mb, ok=False,
                    error=str(e)[:400])
    finally:
        sweep_mod._pallas_vmem_ok = orig_ok
        pallas_bond.set_vmem_limit(None)
        jax.clear_caches()


def main():
    import jax
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    configs = [(192, 32), (192, 64), (192, 100),
               (256, 64), (256, 100), (128, None)]
    if len(sys.argv) > 1:      # e.g. python vmem_probe.py 320:64 384:96
        configs = []
        for a in sys.argv[1:]:
            chi, _, mb = a.partition(":")
            configs.append((int(chi), int(mb) if mb else None))
    for chi, mb in configs:
        print(json.dumps(run(chi, mb)), flush=True)


if __name__ == "__main__":
    main()
