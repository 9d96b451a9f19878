"""Cross-validated hyperparameter tuning + nested-resampling evaluation
(the reference's tune/evaluate workflow, docs/src/hyperparameters.md).

Run:  python examples/hyperopt_evaluation.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import mpstime_tpu as mt


def main():
    data = np.load("tests/data/ecg200.npz")
    X, y = data["X_train"], data["y_train"]

    # 1) classification tuning
    best, cache = mt.tune(
        X, y, nfolds=5,
        parameters={"chi_max": (15, 35), "d": [4, 5, 6],
                    "eta": (1e-3, 1e-1)},
        method=mt.MPSRandomSearch("LatinHypercube"),
        objective=mt.MisclassificationRate(),
        opts0=mt.MPSOptions(verbosity=-5, log_level=-1, nsweeps=5),
        maxiters=10, logspace_eta=True, verbosity=1, rng=1)
    print("\nbest classification hyperparameters:", best)
    print("best CV misclassification rate:",
          min(cache.values()))

    # 2) imputation-loss nested evaluation with checkpointed folds
    results = mt.evaluate(
        X, y, nfolds=3,
        tuning_parameters={"chi_max": [15, 25], "d": [4, 5]},
        objective=mt.ImputationLoss(), eval_pms=[0.2, 0.5],
        opts0=mt.MPSOptions(verbosity=-5, log_level=-1, nsweeps=3,
                            sigmoid_transform=False),
        n_cvfolds=3, tuning_maxiters=4, verbosity=1,
        write=True, writedir="evals", simname="ecg200_demo")
    for r in results:
        print(f"fold {r['fold']}: tuned opts chi={r['opts'].chi_max} "
              f"d={r['opts'].d}, test MAE per window = "
              f"{np.round(np.atleast_1d(r['loss']), 4)}")


if __name__ == "__main__":
    main()
