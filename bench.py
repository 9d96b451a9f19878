"""Benchmark: DMRG training sweep wall-clock on TPU.

Primary workload: ECG200 classification (T=96 sites, N=100 train samples,
C=2, d=5 Legendre) at chi_max=64 — the BASELINE.md north-star config.
Also reported: chi=32 on the same data, and an IPD-shaped synthetic workload
(T=24, N=67 — the shape of the reference's published sweep anchor; the real
IPD data is not vendorable offline).

Reference anchor: the Julia implementation's published sweep wall-clock is
0.66-1.16 s/sweep (mean 0.80 s) on CPU for the IPD-sized run
(src/Training/RealRealHighDimension.jl:367-379) — the only recoverable
wall-clock number, so vs_baseline = 0.80 / our chi=64 ECG200 sweep time
(>1 means faster, on a ~20x larger workload than the anchor's).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import time

import numpy as np


def _steady_sweep_time(X, y, chi, d, nsweeps_block=8, reps=3):
    """Median s/sweep of the production training path: all sweeps fused into
    one compiled device call (training/sweep.py full_sweeps — what fit_mps
    uses whenever per-sweep host logging is off, e.g. all of hyperopt).
    Also returns the single-sweep-per-call time (includes per-call host
    dispatch, ~10-30 ms on the remote TPU service)."""
    import jax
    import jax.numpy as jnp

    import mpstime_tpu as mt
    from mpstime_tpu.encodings import encode_dataset
    from mpstime_tpu.models.mps import random_mps
    from mpstime_tpu.training.sweep import full_sweep, full_sweeps
    from mpstime_tpu.utils.preprocessing import transform_data

    opts = mt.MPSOptions(chi_max=chi, d=d, verbosity=-1, dtype="float32")
    Xs, _, _, _ = transform_data(X, np.zeros((0, X.shape[1])), opts)
    ds = encode_dataset(X, Xs, y, opts)
    T, N = X.shape[1], X.shape[0]
    C = ds.num_classes
    mps = random_mps(opts.init_rng, T, d, C, opts.chi_init, chi, np.float32)
    phis_c = jnp.conj(ds.X_enc).swapaxes(0, 1)
    y_onehot = jnp.asarray(np.eye(C, dtype=np.float32)[ds.y_idx])
    w = jnp.full((N,), 1.0 / N, jnp.float32)
    kw = dict(loss="KLD", bbopt="TSGO", update_iters=1,
              rescale=(False, True), svd_alg=opts.resolved_svd_alg())
    eta = jnp.float32(opts.eta)
    cutoff = jnp.float32(opts.cutoff)

    def sync(x):
        # block_until_ready is a no-op on some remote platforms; transfer a
        # scalar as a reliable barrier
        return float(jnp.linalg.norm(x))

    # fused path (warm + timed)
    cores, center = full_sweeps(mps.cores, mps.center, phis_c, y_onehot, w,
                                eta, cutoff, nsweeps=nsweeps_block, **kw)
    sync(center)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        cores, center = full_sweeps(mps.cores, mps.center, phis_c, y_onehot,
                                    w, eta, cutoff, nsweeps=nsweeps_block,
                                    **kw)
        sync(center)
        times.append(time.perf_counter() - t0)
    t_fused = float(np.median(times)) / nsweeps_block

    # per-call path (one sweep per dispatch)
    cores1, center1 = full_sweep(cores, center, phis_c, y_onehot, w,
                                 eta, cutoff, **kw)
    sync(center1)
    times1 = []
    for _ in range(reps):
        t0 = time.perf_counter()
        cores1, center1 = full_sweep(cores1, center1, phis_c, y_onehot, w,
                                     eta, cutoff, **kw)
        sync(center1)
        times1.append(time.perf_counter() - t0)
    t_percall = float(np.median(times1))

    from mpstime_tpu.models.mps import MPS
    from mpstime_tpu.training.stats import loss_acc_conf
    _, _, acc, _ = loss_acc_conf(MPS(cores, center, T - 1), ds.X_enc, ds.y_idx)
    return t_fused, t_percall, float(acc)


def main():
    import jax

    d_npz = np.load("tests/data/ecg200.npz")
    X, y = d_npz["X_train"], d_npz["y_train"]

    t64, t64_percall, acc64 = _steady_sweep_time(X, y, chi=64, d=5)
    t32, _, _ = _steady_sweep_time(X, y, chi=32, d=5)

    # IPD-shaped synthetic anchor workload (T=24, N=67, 2 classes)
    rng = np.random.default_rng(0)
    T_ipd, N_ipd = 24, 67
    t_ax = np.linspace(0, 2 * np.pi, T_ipd)
    Xi = np.concatenate([
        np.sin(t_ax[None] + rng.uniform(0, 6, (34, 1))),
        np.sin(3 * t_ax[None] + rng.uniform(0, 6, (33, 1)))])
    Xi += 0.1 * rng.standard_normal(Xi.shape)
    yi = np.repeat([0, 1], [34, 33])
    t_ipd, _, _ = _steady_sweep_time(Xi, yi, chi=25, d=5)

    baseline = 0.80  # s/sweep, Julia reference anchor (module docstring)
    print(json.dumps({
        "metric": "ecg200_sweep_time_chi64",
        "value": round(t64, 5),
        "unit": "s/sweep",
        "vs_baseline": round(baseline / t64, 2),
        "ecg200_sweep_time_chi64_percall": round(t64_percall, 5),
        "ecg200_sweep_time_chi32": round(t32, 5),
        "ipd_shape_sweep_time_chi25": round(t_ipd, 5),
        "ipd_shape_vs_baseline": round(baseline / t_ipd, 2),
        "train_acc_after_8_sweeps_chi64": round(acc64, 4),
        "device": str(jax.devices()[0]),
        "shapes": {"T": 96, "N": 100, "chi": 64, "d": 5},
    }))


if __name__ == "__main__":
    main()
