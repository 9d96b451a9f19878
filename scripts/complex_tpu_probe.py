"""Measure the complex-encoding training path on TPU (round-3 task 1b).

Steady-state fused-sweeps wall-clock at ECG200 shapes (T=96, N=100, C=2,
d=5, chi=64) for:
  * legendre f32, XLA bond path (MPSTIME_TPU_NO_PALLAS=1 comparison basis
    for kernel-free real vs complex)
  * legendre f32, Pallas fused path (production anchor)
  * fourier c64, svd_alg=randomized (its auto default)
  * fourier c64, svd_alg=randomized_warm (the Pallas-comparable config)
  * sahand c64, svd_alg=randomized_warm
  * stoudenmire c64, svd_alg=randomized_warm

Prints one JSON line per config; run on the real chip with
  nohup python scripts/complex_tpu_probe.py > /tmp/cplx_probe.log 2>&1 &
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


def sweep_time(X, y, *, encoding, chi, d, svd_alg, no_pallas=False,
               nsweeps_block=8, reps=5):
    import jax.numpy as jnp

    import mpstime_tpu as mt
    from mpstime_tpu.encodings import encode_dataset
    from mpstime_tpu.models.mps import random_mps
    from mpstime_tpu.training.sweep import full_sweeps
    from mpstime_tpu.utils.preprocessing import transform_data

    if no_pallas:
        os.environ["MPSTIME_TPU_NO_PALLAS"] = "1"
    else:
        os.environ.pop("MPSTIME_TPU_NO_PALLAS", None)

    opts = mt.MPSOptions(chi_max=chi, d=d, encoding=encoding, verbosity=-1,
                         svd_alg=svd_alg)
    dt = opts.resolved_dtype()
    Xs, _, _, _ = transform_data(X, np.zeros((0, X.shape[1])), opts)
    ds = encode_dataset(X, Xs, y, opts, dtype=dt)
    T, N = X.shape[1], X.shape[0]
    C = ds.num_classes
    mps = random_mps(opts.init_rng, T, d, C, opts.chi_init, chi, dt)
    phis_c = jnp.conj(ds.X_enc).swapaxes(0, 1)
    rdt = np.zeros(0, dt).real.dtype
    y_onehot = jnp.asarray(np.eye(C)[ds.y_idx], rdt)
    w = jnp.full((N,), 1.0 / N, rdt)
    kw = dict(loss="KLD", bbopt="TSGO", update_iters=1,
              rescale=(False, True), svd_alg=svd_alg)
    eta = jnp.asarray(opts.eta, rdt)
    cutoff = jnp.asarray(opts.cutoff, rdt)

    t_c0 = time.perf_counter()
    cores, center = full_sweeps(mps.cores, mps.center, phis_c, y_onehot, w,
                                eta, cutoff, nsweeps=nsweeps_block, **kw)
    _sync(center)
    t_compile = time.perf_counter() - t_c0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        cores, center = full_sweeps(mps.cores, mps.center, phis_c, y_onehot,
                                    w, eta, cutoff, nsweeps=nsweeps_block,
                                    **kw)
        _sync(center)
        times.append(time.perf_counter() - t0)

    from mpstime_tpu.models.mps import MPS
    from mpstime_tpu.training.stats import loss_acc_conf
    _, _, acc, _ = loss_acc_conf(MPS(cores, center, T - 1), ds.X_enc,
                                 ds.y_idx)
    return (float(np.median(times)) / nsweeps_block, float(acc),
            float(t_compile))


def main():
    import jax
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    d_npz = np.load(os.path.join(_REPO, "tests", "data", "ecg200.npz"))
    X, y = d_npz["X_train"], d_npz["y_train"]

    configs = [
        ("legendre_f32_xla", dict(encoding="legendre", chi=64, d=5,
                                  svd_alg="randomized_warm", no_pallas=True)),
        ("legendre_f32_pallas", dict(encoding="legendre", chi=64, d=5,
                                     svd_alg="randomized_warm")),
        ("fourier_c64_rand", dict(encoding="fourier", chi=64, d=5,
                                  svd_alg="randomized")),
        ("fourier_c64_warm", dict(encoding="fourier", chi=64, d=5,
                                  svd_alg="randomized_warm")),
        ("sahand_c64_warm", dict(encoding="sahand", chi=64, d=5,
                                 svd_alg="randomized_warm")),
        ("stoudenmire_c64_warm", dict(encoding="stoudenmire", chi=64, d=5,
                                      svd_alg="randomized_warm")),
    ]
    for name, cfg in configs:
        try:
            t, acc, t_comp = sweep_time(X, y, **cfg)
            print(json.dumps({"config": name, "s_per_sweep": round(t, 5),
                              "train_acc_8sweeps": round(acc, 4),
                              "compile_s": round(t_comp, 1)}), flush=True)
        except Exception as e:                                # noqa: BLE001
            print(json.dumps({"config": name, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
