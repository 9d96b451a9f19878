"""Probe: which warm-split upgrade closes the fourier accuracy gap?

The r4 exact-split oracle (docs/complex_split_oracle.md) shows the
accelerator default randomized_warm consistently BELOW the exact band on
fourier (test acc mean 0.66 vs exact 0.75 / Ritz 0.765 across chi
15/25/40/64) — fourier's +-frequency-paired degenerate bond spectra defeat
the eigh-free energy ordering.  Candidate fixes, all fused-path-viable:

  warm_q2 / warm_q3:  more power steps per refresh (orthogonal iteration
                      converges columns toward eigen-directions; zero new
                      ops in the kernel beyond repeating the power step)
  warm_ritz:          Rayleigh-Ritz rotation after the warm power step
                      (adds a [k, k] eigh per bond; would need a realified
                      real-eigh route to be TPU-fast)
  warm_ritz_q2:       both

Runs fourier ECG200 f64/CPU, nsweeps=10, chi in {15, 25, 40, 64} per
variant, via monkeypatched warm_split_* in training.sweep.  Output: one
JSON line per cell.

Usage: nohup python scripts/warm_variant_probe.py > /tmp/warm_var.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_ritz_splits():
    import jax.numpy as jnp

    from mpstime_tpu.ops.decomp import _qr_orth, _trunc_mask

    def warm_split_left_ritz(M, V0, keep, cutoff, q=1, refresh=True,
                             max_rank=None, orth="qr"):
        del orth  # the ritz variant is QR-based by construction
        C = M.shape[1]
        k = min(keep, C)
        if refresh:
            Y = V0[:, :k]
            for _ in range(q):
                Y = M.conj().T @ (M @ Y)
            Y = Y / jnp.maximum(jnp.linalg.norm(Y, axis=0, keepdims=True),
                                jnp.finfo(Y.real.dtype).tiny)
            Q = _qr_orth(Y)
        else:
            Q = V0[:, :k]
        B = M @ Q                                  # [R, k]
        S = B.conj().T @ B                         # [k, k] hermitian
        w, W = jnp.linalg.eigh(S)
        w, W = w[::-1], W[:, ::-1]
        mask = _trunc_mask(w, keep, cutoff, max_rank)
        Wm = W * mask
        US = B @ Wm
        Qt = Q @ Wm
        Vh = Qt.conj().T
        Vnext = Q @ W                              # rotated, unmasked
        if keep > k:
            US = jnp.pad(US, ((0, 0), (0, keep - k)))
            Vh = jnp.pad(Vh, ((0, keep - k), (0, 0)))
            Vnext = jnp.pad(Vnext, ((0, 0), (0, keep - k)))
        return US, Vh, Vnext

    def warm_split_right_ritz(M, U0, keep, cutoff, q=1, refresh=True,
                              max_rank=None, orth="qr"):
        del orth
        R = M.shape[0]
        k = min(keep, R)
        if refresh:
            Y = U0[:, :k]
            for _ in range(q):
                Y = M @ (M.conj().T @ Y)
            Y = Y / jnp.maximum(jnp.linalg.norm(Y, axis=0, keepdims=True),
                                jnp.finfo(Y.real.dtype).tiny)
            Q = _qr_orth(Y)
        else:
            Q = U0[:, :k]
        B = Q.conj().T @ M                         # [k, C]
        S = B @ B.conj().T                         # [k, k]
        w, W = jnp.linalg.eigh(S)
        w, W = w[::-1], W[:, ::-1]
        mask = _trunc_mask(w, keep, cutoff, max_rank)
        Wm = W * mask
        U = Q @ Wm
        SVh = Wm.conj().T @ B
        Unext = Q @ W
        if keep > k:
            U = jnp.pad(U, ((0, 0), (0, keep - k)))
            SVh = jnp.pad(SVh, ((0, keep - k), (0, 0)))
            Unext = jnp.pad(Unext, ((0, 0), (0, keep - k)))
        return U, SVh, Unext

    return warm_split_left_ritz, warm_split_right_ritz


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import mpstime_tpu as mt
    from mpstime_tpu.ops import decomp
    from mpstime_tpu.training import sweep as sweep_mod
    from mpstime_tpu.training.stats import loss_acc_conf

    dnz = np.load(os.path.join(os.path.dirname(__file__), "..",
                               "tests", "data", "ecg200.npz"))
    X, y = dnz["X_train"], dnz["y_train"]
    Xte, yte = dnz["X_test"], dnz["y_test"]

    ritz_l, ritz_r = make_ritz_splits()
    base_l, base_r = decomp.warm_split_left, decomp.warm_split_right

    def pin(fn, q):
        # the sweep now passes q=resolved_power_iters (3 on fourier) and
        # orth=resolved_orth_alg as CALL-SITE kwargs, which would silently
        # override a functools.partial default — force the variant's q and
        # the probe's historical qr route instead
        def wrapped(*a, q_caller=None, orth=None, **kw):
            kw.pop("q", None)
            return fn(*a, q=q, orth="qr", **kw)
        return wrapped

    variants = {
        "warm_q2": (pin(base_l, 2), pin(base_r, 2)),
        "warm_q3": (pin(base_l, 3), pin(base_r, 3)),
        "warm_ritz": (ritz_l, ritz_r),
        "warm_ritz_q2": (pin(ritz_l, 2), pin(ritz_r, 2)),
    }

    orig = (sweep_mod.warm_split_left, sweep_mod.warm_split_right)
    try:
        for name, (fl, fr) in variants.items():
            sweep_mod.warm_split_left = fl
            sweep_mod.warm_split_right = fr
            jax.clear_caches()            # re-trace with the patched split
            for chi in [15, 25, 40, 64]:
                opts = mt.MPSOptions(encoding="fourier", chi_max=chi, d=5,
                                     nsweeps=10, svd_alg="randomized_warm",
                                     verbosity=-1)
                t0 = time.perf_counter()
                trained, info, test_ds = mt.fit_mps(X, y, Xte, yte,
                                                    opts=opts)
                dt = time.perf_counter() - t0
                _, _, tr_acc, _ = loss_acc_conf(trained.mps,
                                                trained.train_data.X_enc,
                                                trained.train_data.y_idx)
                _, _, te_acc, _ = loss_acc_conf(trained.mps, test_ds.X_enc,
                                                test_ds.y_idx)
                print(json.dumps({"variant": name, "chi": chi,
                                  "train_acc": round(float(tr_acc), 4),
                                  "test_acc": round(float(te_acc), 4),
                                  "seconds": round(dt, 1)}), flush=True)
    finally:
        sweep_mod.warm_split_left, sweep_mod.warm_split_right = orig


if __name__ == "__main__":
    main()
