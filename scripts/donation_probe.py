"""Measure the time/memory delta of buffer donation through full_sweeps
(r5, VERDICT r4 task 6) at the shapes where the core stack is multi-MB.

At chi=256 the ECG200 core stack is [96, 256, 5, 256] f32 = 120 MB; at
chi=320 it is 188 MB.  Without donation every fused call allocates a
fresh output stack while the input stays live (2x peak) and XLA may copy;
with donate_argnums the input aliases the output.  Cells time the fused
8-sweep (4-sweep at chi>=256) block both ways and report
device memory_stats() deltas when the backend exposes them.

Run on a quiet machine:
  nohup python scripts/donation_probe.py > /tmp/donation_probe.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax                                                   # noqa: E402
import jax.numpy as jnp                                      # noqa: E402

import mpstime_tpu as mt                                     # noqa: E402
from mpstime_tpu.encodings import encode_dataset             # noqa: E402
from mpstime_tpu.models.mps import random_mps                # noqa: E402
from mpstime_tpu.training.sweep import full_sweeps           # noqa: E402
from mpstime_tpu.utils.preprocessing import transform_data   # noqa: E402


def _sync(x):
    return float(jnp.linalg.norm(x))


def _mem():
    try:
        s = jax.devices()[0].memory_stats()
        return {k: s[k] for k in ("bytes_in_use", "peak_bytes_in_use")
                if k in s}
    except Exception:                                        # noqa: BLE001
        return None


def cell(X, y, chi, nsweeps, donate, reps=5):
    opts = mt.MPSOptions(chi_max=chi, d=5, verbosity=-1, dtype="float32")
    Xs, _, _, _ = transform_data(X, np.zeros((0, X.shape[1])), opts)
    ds = encode_dataset(X, Xs, y, opts, dtype=np.float32)
    T, N, C = X.shape[1], X.shape[0], ds.num_classes
    mps = random_mps(opts.init_rng, T, 5, C, opts.chi_init, chi, np.float32)
    phis_c = jnp.conj(ds.X_enc).swapaxes(0, 1)
    y1h = jnp.asarray(np.eye(C, dtype=np.float32)[ds.y_idx])
    w = jnp.full((N,), 1.0 / N, jnp.float32)
    kw = dict(nsweeps=nsweeps, loss="KLD", bbopt="TSGO", update_iters=1,
              rescale=(False, True), svd_alg="randomized_warm",
              power_iters=1, orth=opts.resolved_orth_alg())
    eta, cut = jnp.float32(0.01), jnp.float32(1e-10)
    cores, center = full_sweeps(mps.cores, mps.center, phis_c, y1h, w,
                                eta, cut, donate=donate, **kw)
    _sync(center)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        cores, center = full_sweeps(cores, center, phis_c, y1h, w,
                                    eta, cut, donate=donate, **kw)
        _sync(center)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / nsweeps, _mem()


def main():
    d = np.load(os.path.join(_REPO, "tests/data/ecg200.npz"))
    X, y = d["X_train"], d["y_train"]
    out = {"device": str(jax.devices()[0])}
    for chi, nsw in ((64, 8), (256, 4), (320, 4)):
        for donate in (False, True):
            key = f"chi{chi}_{'don' if donate else 'nodon'}"
            try:
                t, mem = cell(X, y, chi, nsw, donate)
                out[key] = {"s_per_sweep": round(t, 5), "mem": mem}
            except Exception as e:                           # noqa: BLE001
                out[key] = {"error": str(e)[:200]}
            print(json.dumps({key: out[key]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
