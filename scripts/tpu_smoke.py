"""End-to-end TPU smoke + timing of every major subsystem at realistic
shapes: train (fused sweeps), classify, imputation (median/ITS + batched),
entanglement analysis, and a small hyperopt tune. Prints one line per stage."""

import os
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def stage(name, t0):
    print(f"{name:34s} {time.perf_counter() - t0:8.2f} s", flush=True)
    return time.perf_counter()


def main():
    import jax
    import mpstime_tpu as mt

    d = np.load(os.path.join(_REPO, "tests", "data", "ecg200.npz"))
    Xtr, ytr, Xte, yte = d["X_train"], d["y_train"], d["X_test"], d["y_test"]

    t0 = time.perf_counter()
    opts = mt.MPSOptions(nsweeps=10, chi_max=32, d=5, verbosity=-1,
                         log_level=-1)
    trained, info, ts = mt.fit_mps(Xtr, ytr, Xte, yte, opts)
    t0 = stage("train chi=32 x10 sweeps (fused)", t0)

    preds = mt.classify(trained, Xte)
    acc = float(np.mean(preds == yte))
    t0 = stage(f"classify ({len(yte)} samples) acc={acc:.3f}", t0)

    imp = mt.init_imputation_problem(trained, Xte, yte, verbosity=-1)
    t0 = stage("init_imputation_problem", t0)

    missing = np.arange(20, 70)
    ts_i, err, target, stats, _ = mt.mps_impute(
        imp, class_label=0, instance=0, missing_sites=missing,
        method="median")
    t0 = stage(f"impute median (warm) MAE={stats[0]['MAE']:.3f}", t0)

    ts_i2, *_ = mt.mps_impute(imp, class_label=0, instance=1,
                              missing_sites=missing, method="median")
    t0 = stage("impute median (cached kernel)", t0)

    ts_i3, *_ = mt.mps_impute(imp, class_label=1, instance=0,
                              missing_sites=missing, method="ITS",
                              NN_baseline=False)
    t0 = stage("impute ITS", t0)

    bees = mt.bipartite_spectrum(trained)
    sees = mt.single_site_spectrum(trained)
    t0 = stage("entanglement spectra", t0)

    opts0 = mt.MPSOptions(verbosity=-5, log_level=-1, nsweeps=3,
                          sigmoid_transform=True)
    best, cache = mt.tune(Xtr, ytr, 2,
                          {"chi_max": [10, 16], "d": [3, 4]},
                          mt.MPSRandomSearch("Exhaustive"),
                          objective=mt.MisclassificationRate(),
                          opts0=opts0, maxiters=4, verbosity=-1)
    t0 = stage(f"tune 4 trials x 2 folds best={best}", t0)

    acc_floor = 0.80
    assert acc >= acc_floor, f"classification acc {acc} < {acc_floor}"
    assert np.isfinite(np.asarray(ts_i[0])).all()
    print("TPU SMOKE OK on", jax.devices()[0])


if __name__ == "__main__":
    main()
