"""Quality + speed comparison of split algorithms.

Usage: python scripts/lean_split_check.py [cpu|tpu]
  cpu: train ECG200 chi=64 at f32 with each alg, compare train/test accuracy
  tpu: time full_sweeps(nsweeps=20) per alg (dispatch amortized)
"""

import sys
import time

import numpy as np


def setup(platform):
    import jax
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    return jax, jnp


def make_train_state(jnp, chi=64, d=5):
    import mpstime_tpu as mt
    from mpstime_tpu.encodings import encode_dataset
    from mpstime_tpu.models.mps import random_mps
    from mpstime_tpu.utils.preprocessing import transform_data

    dnz = np.load("tests/data/ecg200.npz")
    X, y = dnz["X_train"], dnz["y_train"]
    Xte, yte = dnz["X_test"], dnz["y_test"]
    opts = mt.MPSOptions(chi_max=chi, d=d, verbosity=-1, dtype="float32")
    Xs, Xtes, norms, _ = transform_data(X, Xte, opts)
    ds = encode_dataset(X, Xs, y, opts)
    ds_te = encode_dataset(Xte, Xtes, yte, opts,
                           training_enc_args=ds.enc_args)
    T, N = X.shape[1], X.shape[0]
    C = ds.num_classes
    mps = random_mps(opts.init_rng, T, d, C, opts.chi_init, chi, np.float32)
    phis_c = jnp.conj(ds.X_enc).swapaxes(0, 1)
    y_onehot = jnp.asarray(np.eye(C, dtype=np.float32)[ds.y_idx])
    w = jnp.full((N,), 1.0 / N, jnp.float32)
    return opts, ds, ds_te, mps, phis_c, y_onehot, w, T


def main():
    platform = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    jax, jnp = setup(platform)
    from mpstime_tpu.models.mps import MPS
    from mpstime_tpu.training.stats import loss_acc_conf
    from mpstime_tpu.training.sweep import full_sweeps

    opts, ds, ds_te, mps, phis_c, y_onehot, w, T = make_train_state(jnp)
    kw = dict(loss="KLD", bbopt="TSGO", update_iters=1, rescale=(False, True))
    eta = jnp.float32(opts.eta)
    cutoff = jnp.float32(opts.cutoff)
    nsweeps = 20 if platform == "tpu" else 8

    algs = ["randomized_lean", "randomized", "gram_eigh"]
    for alg in algs:
        t0 = time.perf_counter()
        cores, center = full_sweeps(mps.cores, mps.center, phis_c, y_onehot,
                                    w, eta, cutoff, nsweeps=nsweeps,
                                    svd_alg=alg, **kw)
        float(jnp.linalg.norm(center))
        t_compile_run = time.perf_counter() - t0
        if platform == "tpu":
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                cores, center = full_sweeps(mps.cores, mps.center, phis_c,
                                            y_onehot, w, eta, cutoff,
                                            nsweeps=nsweeps, svd_alg=alg, **kw)
                float(jnp.linalg.norm(center))
                times.append(time.perf_counter() - t0)
            t_sweep = float(np.median(times)) / nsweeps
        else:
            t_sweep = float("nan")
        m = MPS(cores, center, T - 1)
        _, _, tr_acc, _ = loss_acc_conf(m, ds.X_enc, ds.y_idx)
        _, _, te_acc, _ = loss_acc_conf(m, ds_te.X_enc, ds_te.y_idx)
        print(f"{alg:16s} train_acc {tr_acc:.4f}  test_acc {te_acc:.4f}  "
              f"s/sweep {t_sweep:.5f}  (first call {t_compile_run:.1f}s)")


if __name__ == "__main__":
    main()
