"""Benchmark: DMRG training sweep wall-clock on TPU.

Workload: ECG200-shaped classification (T=96 sites, N=100 train samples,
C=2 classes, d=5 Legendre) at chi_max=64 — the BASELINE.md north-star config.
Reference anchor: the Julia implementation's published sweep wall-clock is
0.66-1.16 s/sweep (mean 0.80 s) on CPU for an IPD-sized run
(src/Training/RealRealHighDimension.jl:367-379); this is the only recoverable
wall-clock number, so vs_baseline = 0.80 / our_sweep_time (>1 means faster).
Note our workload is *harder* than the anchor's (96 sites vs 24).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mpstime_tpu.models.mps import random_mps
    from mpstime_tpu.training.sweep import full_sweep

    d_npz = np.load("tests/data/ecg200.npz")
    X, y = d_npz["X_train"], d_npz["y_train"]

    import mpstime_tpu as mt
    from mpstime_tpu.encodings import encode_dataset
    from mpstime_tpu.utils.preprocessing import transform_data

    CHI = 64
    opts = mt.MPSOptions(chi_max=CHI, d=5, verbosity=-1, dtype="float32")
    Xs, _, norms, _ = transform_data(X, np.zeros((0, X.shape[1])), opts)
    ds = encode_dataset(X, Xs, y, opts)
    T, N = X.shape[1], X.shape[0]
    C = ds.num_classes

    mps = random_mps(opts.init_rng, T, opts.d, C, opts.chi_init, CHI, np.float32)
    phis_c = jnp.conj(ds.X_enc).swapaxes(0, 1)
    y_onehot = jnp.asarray(np.eye(C, dtype=np.float32)[ds.y_idx])
    w = jnp.full((N,), 1.0 / N, jnp.float32)
    kw = dict(loss="KLD", bbopt="TSGO", update_iters=1,
              rescale=(False, True), svd_alg=opts.resolved_svd_alg())

    cores, center = mps.cores, mps.center
    eta = jnp.float32(opts.eta)
    cutoff = jnp.float32(opts.cutoff)

    def sync(x):
        # block_until_ready is a no-op on some remote platforms; a host
        # transfer of a scalar is a reliable barrier
        return float(jnp.linalg.norm(x))

    # warmup/compile + 2 real sweeps to reach steady-state bond dims
    for _ in range(3):
        cores, center = full_sweep(cores, center, phis_c, y_onehot, w,
                                   eta, cutoff, **kw)
    sync(center)

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        cores, center = full_sweep(cores, center, phis_c, y_onehot, w,
                                   eta, cutoff, **kw)
        sync(center)
        times.append(time.perf_counter() - t0)

    t_sweep = float(np.median(times))
    baseline = 0.80  # s/sweep, Julia reference anchor (see module docstring)

    # quick accuracy sanity on the training set after the bench sweeps
    from mpstime_tpu.models.mps import MPS
    from mpstime_tpu.training.stats import loss_acc_conf
    m = MPS(cores, center, T - 1)
    _, _, train_acc, _ = loss_acc_conf(m, ds.X_enc, ds.y_idx)

    print(json.dumps({
        "metric": "ecg200_sweep_time_chi64",
        "value": round(t_sweep, 5),
        "unit": "s/sweep",
        "vs_baseline": round(baseline / t_sweep, 2),
        "sweep_times": [round(t, 4) for t in times],
        "train_acc_after_8_sweeps": round(float(train_acc), 4),
        "device": str(jax.devices()[0]),
        "shapes": {"T": T, "N": N, "chi": CHI, "d": opts.d, "C": C},
    }))


if __name__ == "__main__":
    main()
