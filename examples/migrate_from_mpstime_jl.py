"""Migrating from MPSTime.jl: load a Julia-trained checkpoint directly.

``load_mpstime_jl`` parses the reference package's JLD2 ``TrainedMPS``
checkpoints (Float64 or ComplexF64 ITensor storage) into this package's
model type, so existing trained models classify / impute / analyse here
with no retraining.  This demo uses the reference repository's own test
fixture — an MPS the Julia package trained to 100% ECG200 train accuracy —
and reproduces its accuracy through this package's preprocessing,
encoding, and contraction stack.

Run:  python examples/migrate_from_mpstime_jl.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import mpstime_tpu as mt

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    data = np.load(os.path.join(_REPO, "tests", "data", "ecg200.npz"))
    X_train, y_train = data["X_train"], data["y_train"]
    X_test, y_test = data["X_test"], data["y_test"]

    path = os.path.join(_REPO, "tests", "data",
                        "reference_trained_ecg200.jld2")
    trained = mt.load_mpstime_jl(path)
    print(f"imported: chi_max={trained.opts.chi_max} d={trained.opts.d} "
          f"encoding={trained.opts.encoding} "
          f"dtype={np.asarray(trained.mps.center).dtype}")

    acc_tr = float(np.mean(mt.classify(trained, X_train) == y_train))
    acc_te = float(np.mean(mt.classify(trained, X_test) == y_test))
    print(f"reference-trained model through this stack: "
          f"train acc {acc_tr:.3f} (Julia trained it to 1.000), "
          f"test acc {acc_te:.3f}")

    # the imported model drives every downstream subsystem directly
    imp = mt.init_imputation_problem(trained, X_test, y_test, verbosity=-1)
    missing = np.arange(30, 60)
    ts, err, target, stats, _ = mt.mps_impute(imp, class_label=0, instance=0,
                                              missing_sites=missing,
                                              method="median")
    print(f"imputation on the imported model: MAE {stats[0]['MAE']:.4f}")

    bees = mt.bipartite_spectrum(trained)   # per-class entropy over bonds
    print(f"max bipartite entanglement entropy per class: "
          f"{[round(float(np.max(s)), 3) for s in bees]}")

    # models saved HERE round-trip through the native format
    out = os.path.join(_REPO, "examples", "_migrated.npz")
    mt.save_mps(out, trained)
    again = mt.load_mps(out)
    assert mt.trained_mps_equal(trained, again, atol=1e-12)
    os.remove(out)
    print("re-saved through the native npz format and round-tripped OK")


if __name__ == "__main__":
    main()
