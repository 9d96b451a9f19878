"""Exact-split accuracy oracle for the complex encodings.

The reference trains complex encodings with an *exact* truncated SVD
(decomposeBT, /root/reference/src/Training/RealRealHighDimension.jl:166-187;
ComplexF64 default options.jl:117).  Our accelerator default
(randomized_warm) is accuracy-noisy on fourier's +-frequency-paired
(degenerate) bond spectra, and until now no exact baseline existed to say
whether that noise *costs model quality* or is just alg-to-alg gauge churn
around the same ceiling.

This script pins the ground truth: ECG200, CPU, float64/complex128,
encoding in {fourier, sahand, stoudenmire}, svd_alg in
{svd, gram_eigh, randomized, randomized_lean, randomized_warm,
 randomized_warm@K2}, chi in {15, 25, 40, 64}, nsweeps=10 — one JSON line
per cell to stdout and a summary table at the end.  Results are recorded
in docs/complex_split_oracle.md and pinned by
tests/test_training.py::test_complex_split_oracle_band.

Usage: python scripts/complex_split_oracle.py [--quick]
  --quick: fourier only, chi in {25, 64} (CI-sized smoke)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    quick = "--quick" in sys.argv
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import mpstime_tpu as mt
    from mpstime_tpu.training.stats import loss_acc_conf

    dnz = np.load("tests/data/ecg200.npz")
    X, y = dnz["X_train"], dnz["y_train"]
    Xte, yte = dnz["X_test"], dnz["y_test"]

    encodings = ["fourier"] if quick else ["fourier", "sahand", "stoudenmire"]
    chis = [25, 64] if quick else [15, 25, 40, 64]
    # (svd_alg, refresh_every K, power_iters q); q only affects
    # randomized_warm.  q=1 isolates the single-power-step r3 behavior;
    # q=3 is the shipped complex auto default (options.resolved_power_iters).
    algs = [("svd", 1, 1), ("gram_eigh", 1, 1), ("randomized", 1, 1),
            ("randomized_lean", 1, 1), ("randomized_warm", 1, 1),
            ("randomized_warm", 1, 3), ("randomized_warm", 2, 3)]

    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
    if only:
        encodings = only[0].split(",")
    chis_arg = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--chis=")]
    if chis_arg:
        chis = [int(c) for c in chis_arg[0].split(",")]
    algs_arg = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--algs=")]
    if algs_arg:
        keep = set(algs_arg[0].split(","))
        algs = [t for t in algs
                if f"{t[0]}@K{t[1]}q{t[2]}" in keep or t[0] in keep]

    # sahand needs even d; stoudenmire is the d=2 angle encoding
    enc_d = {"sahand": 6, "stoudenmire": 2}

    rows = []
    for enc in encodings:
        d_enc = enc_d.get(enc, 5)
        for chi in chis:
            for alg, K, q in algs:
                opts = mt.MPSOptions(encoding=enc, chi_max=chi, d=d_enc,
                                     nsweeps=10, svd_alg=alg,
                                     subspace_refresh_every=K,
                                     subspace_power_iters=q, verbosity=-1)
                t0 = time.perf_counter()
                trained, info, test_ds = mt.fit_mps(X, y, Xte, yte, opts=opts)
                dt = time.perf_counter() - t0
                _, _, tr_acc, _ = loss_acc_conf(trained.mps,
                                                trained.train_data.X_enc,
                                                trained.train_data.y_idx)
                _, _, te_acc, _ = loss_acc_conf(trained.mps, test_ds.X_enc,
                                                test_ds.y_idx)
                row = {"encoding": enc, "chi": chi, "alg": alg, "K": K,
                       "q": q,
                       "train_acc": round(float(tr_acc), 4),
                       "test_acc": round(float(te_acc), 4),
                       "seconds": round(dt, 1)}
                rows.append(row)
                print(json.dumps(row), flush=True)

    # summary: per encoding/chi, exact ceiling vs each fast alg
    print("\n== summary (test_acc, exact = max(svd, gram_eigh)) ==", flush=True)
    for enc in encodings:
        for chi in chis:
            cell = {(r["alg"], r["K"], r["q"]): r for r in rows
                    if r["encoding"] == enc and r["chi"] == chi}
            if ("svd", 1, 1) not in cell or ("gram_eigh", 1, 1) not in cell:
                continue
            exact = max(cell[("svd", 1, 1)]["test_acc"],
                        cell[("gram_eigh", 1, 1)]["test_acc"])
            line = f"{enc:12s} chi={chi:3d}  exact {exact:.3f}"
            for alg, K, q in algs[2:]:
                r = cell.get((alg, K, q))
                if r is None:
                    continue
                tag = (alg.replace("randomized", "rnd")
                       + (f"@K{K}" if K > 1 else "")
                       + (f"@q{q}" if q > 1 else ""))
                line += f"  {tag} {r['test_acc']:.3f} ({r['test_acc']-exact:+.3f})"
            print(line, flush=True)


if __name__ == "__main__":
    main()
