"""Measure the NS-orthogonalization route vs the QR route on the TPU.

The per-bond refresh QR is the one op the fused bond step could not
absorb (K1 -> XLA QR -> K2); orth="ns" replaces it with an in-kernel
Newton-Schulz subspace iteration (ops/decomp.ns_orth and kernel twins),
making the refresh bond two pallas_calls like the frozen one.  On the
complex pair path the removed op is the [2*chi*d, 2*chi] realified
Householder QR that measured ~60% of a refresh sweep.

Usage: nohup python scripts/ns_orth_tpu_probe.py > /tmp/ns_tpu.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def steady(X, y, chi, d, orth, encoding="legendre", nsweeps_block=8, reps=5,
           q=None):
    import jax.numpy as jnp

    import mpstime_tpu as mt
    from mpstime_tpu.encodings import encode_dataset
    from mpstime_tpu.models.mps import MPS, random_mps
    from mpstime_tpu.training.stats import loss_acc_conf
    from mpstime_tpu.training.sweep import full_sweeps
    from mpstime_tpu.utils.preprocessing import transform_data

    # svd_alg pinned: this probe measures the fused randomized_warm route,
    # and with "auto" the complex chi>gate cells would resolve power_iters
    # against the RITZ route (q=1) — a config mismatch that silently timed
    # the wrong program (caught late r4: the fourier chi=64 block cell ran
    # q=1 where the shipped fused knob is q=3).
    opts = mt.MPSOptions(chi_max=chi, d=d, verbosity=-1, encoding=encoding,
                         dtype="float32" if encoding == "legendre" else None,
                         orth_alg=orth, svd_alg="randomized_warm",
                         subspace_power_iters=0 if q is None else q)
    dt = opts.resolved_dtype()
    rdt = np.zeros(0, dt).real.dtype
    Xs, _, _, _ = transform_data(X, np.zeros((0, X.shape[1])), opts)
    ds = encode_dataset(X, Xs, y, opts, dtype=dt)
    T, N = X.shape[1], X.shape[0]
    C = ds.num_classes
    mps = random_mps(opts.init_rng, T, d, C, opts.chi_init, chi, dt)
    phis_c = jnp.conj(ds.X_enc).swapaxes(0, 1)
    y_onehot = jnp.asarray(np.eye(C)[ds.y_idx], rdt)
    w = jnp.full((N,), 1.0 / N, rdt)
    kw = dict(loss="KLD", bbopt="TSGO", update_iters=1,
              rescale=(False, True), svd_alg="randomized_warm",
              power_iters=opts.resolved_power_iters(), orth=orth)
    eta = jnp.asarray(opts.eta, rdt)
    cutoff = jnp.asarray(opts.cutoff, rdt)
    cores, center = full_sweeps(mps.cores, mps.center, phis_c, y_onehot, w,
                                eta, cutoff, nsweeps=nsweeps_block, **kw)
    float(jnp.linalg.norm(center))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        cores, center = full_sweeps(mps.cores, mps.center, phis_c, y_onehot,
                                    w, eta, cutoff, nsweeps=nsweeps_block,
                                    **kw)
        float(jnp.linalg.norm(center))
        times.append(time.perf_counter() - t0)
    _, _, acc, _ = loss_acc_conf(MPS(cores, center, T - 1), ds.X_enc,
                                 ds.y_idx)
    return float(np.median(times)) / nsweeps_block, float(acc)


def main():
    import jax
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    d_npz = np.load(os.path.join(_REPO, "tests/data/ecg200.npz"))
    X, y = d_npz["X_train"], d_npz["y_train"]
    for chi, enc in ((64, "legendre"), (32, "legendre"), (128, "legendre"),
                     (64, "fourier")):
        for orth in ("ns", "qr"):
            try:
                t, acc = steady(X, y, chi, 5, orth, encoding=enc)
                print(json.dumps({"enc": enc, "chi": chi, "orth": orth,
                                  "s_per_sweep": round(t, 5),
                                  "train_acc": round(acc, 4)}), flush=True)
            except Exception as e:                       # noqa: BLE001
                print(json.dumps({"enc": enc, "chi": chi, "orth": orth,
                                  "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
