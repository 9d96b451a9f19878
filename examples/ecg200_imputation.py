"""ECG200 probabilistic imputation benchmark (the reference's imputation
test protocol, test/imputation.jl:37-100: mean MAE over 10 instances/class
at 20% missing for every method).

Run:  python examples/ecg200_imputation.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import mpstime_tpu as mt


def main():
    data = np.load("tests/data/ecg200.npz")
    X_train, y_train = data["X_train"], data["y_train"]
    X_test, y_test = data["X_test"], data["y_test"]

    opts = mt.MPSOptions(nsweeps=3, verbosity=-1, log_level=0)
    trained, _, _ = mt.fit_mps(X_train, y_train, X_test, y_test, opts)
    imp = mt.init_imputation_problem(trained, X_test, y_test, verbosity=0)

    rng = np.random.default_rng(1)
    ncs = [int((y_test == 0).sum()), int((y_test == 1).sum())]
    methods = ["median", "mean", "mode", "ITS", "kNearestNeighbour"]
    print(f"{'method':>20} | class 0 MAE | class 1 MAE")
    for method in methods:
        maes = []
        for ci, cls in enumerate([0, 1]):
            idxs = rng.permutation(ncs[ci])[:10]
            tot = 0.0
            for inst in idxs:
                _, sites = mt.mar(X_test[inst], 0.2, rng=rng)
                *_, stats, _ = mt.mps_impute(imp, cls, int(inst), sites,
                                             method, NN_baseline=False,
                                             plot_fits=False)
                tot += stats[0]["MAE"]
            maes.append(tot / len(idxs))
        print(f"{method:>20} | {maes[0]:11.4f} | {maes[1]:11.4f}")

    # single 80%-missing example with error bars and a plot
    _, sites = mt.mar(X_test[19], 0.8, rng=123)
    ts, errs, target, stats, figs = mt.mps_impute(
        imp, 1, 19, sites, "median", NN_baseline=True, plot_fits=True)
    print(f"\n80% missing example: MAPE {stats[0]['MAPE']:.4f} "
          f"(1-NN baseline {stats[0]['NN_MAPE']:.4f})")
    if figs:
        figs[0].savefig("imputation_example.png", dpi=120)
        print("saved imputation_example.png")


if __name__ == "__main__":
    main()
