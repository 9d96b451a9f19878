"""ECG200 classification end-to-end (the reference's headline classification
workflow; cf. its docstring example, RealRealHighDimension.jl:272-380).

Run:  python examples/ecg200_classification.py
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

    opts = mt.MPSOptions(d=5, chi_max=25, nsweeps=10, eta=0.01,
                         encoding="Legendre", verbosity=1)
    mt.print_opts(opts)

    trained, info, test_states = mt.fit_mps(X_train, y_train, X_test, y_test,
                                            opts)

    preds = mt.classify(trained, X_test)
    print(f"\nTest accuracy: {np.mean(preds == y_test):.4f}")

    mt.sweep_summary(info)
    stats = mt.get_training_summary(trained, test_states, print_stats=True)

    # entanglement structure of the learned model
    bees = mt.bipartite_spectrum(trained)
    for ci, b in enumerate(bees):
        print(f"class {trained.labels[ci]}: max bond entropy "
              f"{b.max():.3f} at site {int(b.argmax())}")


if __name__ == "__main__":
    main()
