"""Batched training: many small fits as ONE vmapped device program.

Run: python examples/batched_training.py

Two shapes of the same primitive (fit_mps_batch / training.sweep.
batched_full_sweeps — the model axis rides every per-bond op):
 1. CV folds at one config (what tune(fold_batch=True) does internally),
 2. a padded hyperopt trial population — per-trial eta and runtime chi
    rank caps under one shared compiled program.

The reference trains one sequential fit per (trial, fold)
(src/Training/hyperopt tuning.jl:158-176); here the whole set is one
device call, amortizing per-bond dispatch across models."""

import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import mpstime_tpu as mt  # noqa: E402


def main():
    d = np.load(os.path.join(_REPO, "tests/data/ecg200.npz"))
    X, y = d["X_train"], d["y_train"]
    Xte, yte = d["X_test"], d["y_test"]

    # ---- 1. three CV folds, one device call --------------------------------
    folds = [(X[i:i + 80], y[i:i + 80]) for i in (0, 10, 20)]
    opts = mt.MPSOptions(nsweeps=5, chi_max=20, d=4, verbosity=-1,
                         log_level=-1, dtype="float32")
    t0 = time.perf_counter()
    models = mt.fit_mps_batch(folds, opts=opts)
    t_batch = time.perf_counter() - t0
    accs = [float(np.mean(mt.classify(m, Xte) == yte)) for m in models]
    print(f"3 folds in one call: {t_batch:.2f}s, test accs {accs}")

    # ---- 2. a trial population: per-trial eta + runtime chi cap ------------
    trials = [opts.replace(eta=e, chi_max=c, pad_to=(30, 4))
              for e, c in ((0.02, 10), (0.05, 20), (0.1, 30))]
    t0 = time.perf_counter()
    models = mt.fit_mps_batch([(X, y)] * len(trials), opts_list=trials)
    t_batch = time.perf_counter() - t0
    for m, o in zip(models, trials):
        acc = float(np.mean(mt.classify(m, Xte) == yte))
        print(f"  trial eta={o.eta:<5} chi_cap={o.chi_max:<3} -> "
              f"max bond {int(np.max(m.mps.bond_dims()))}, test acc {acc:.3f}")
    print(f"3-trial population in one call: {t_batch:.2f}s")

    # ---- 3. the same knob inside the search loop ---------------------------
    best, _ = mt.tune(X[:60], y[:60], nfolds=3,
                      parameters={"eta": (0.01, 0.1), "chi_max": [10, 20],
                                  "d": [4]},
                      objective=mt.MisclassificationRate(),
                      opts0=mt.MPSOptions(nsweeps=3, verbosity=-5,
                                          log_level=-1, dtype="float32",
                                          sigmoid_transform=True),
                      maxiters=4, verbosity=-1, rng=7, fold_batch=True)
    print(f"tune(fold_batch=True) best: {best}")


if __name__ == "__main__":
    main()
