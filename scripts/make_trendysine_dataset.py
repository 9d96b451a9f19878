"""Frozen generator for the second vendored dataset (TrendySine-3).

ECG200 is the only real UCR dataset vendorable offline, so classification
parity is backed up by this committed synthetic 3-class problem built from
the package's own ``trendy_sine`` generator (reference toy_data.jl:53-85)
with a frozen seed.  The files are UCR-format TSV (``label v1 ... vT`` per
row) so they exercise the native C++ loader end-to-end
(mpstime_tpu/native/ucr_loader.cpp via utils/data_loading.py).

Classes differ by period: tau in {10, 20, 40}; random phase, mild random
trend, sigma=0.2 noise.  30 train + 30 test instances per class, T=60.

Running this script regenerates byte-identical files; tests/test_golden.py
pins the trained-model constants.
"""

import os

import numpy as np

from mpstime_tpu.simulation import trendy_sine

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "data")
T = 60
N_PER = 60          # per class; first 30 train, last 30 test
PERIODS = (10.0, 20.0, 40.0)
SEED = 20260816


def generate():
    g = np.random.default_rng(SEED)
    Xtr, ytr, Xte, yte = [], [], [], []
    for c, tau in enumerate(PERIODS):
        X, _ = trendy_sine(T, N_PER, period=tau, slope=(-1.0, 1.0),
                           sigma=0.2, rng=g)
        Xtr.append(X[:N_PER // 2])
        Xte.append(X[N_PER // 2:])
        ytr.append(np.full(N_PER // 2, c))
        yte.append(np.full(N_PER // 2, c))
    return (np.concatenate(Xtr), np.concatenate(ytr),
            np.concatenate(Xte), np.concatenate(yte))


def write_ucr(path, X, y):
    with open(path, "w") as f:
        for lab, row in zip(y, X):
            f.write("\t".join([str(int(lab))] +
                              [f"{v:.12g}" for v in row]) + "\n")


if __name__ == "__main__":
    Xtr, ytr, Xte, yte = generate()
    write_ucr(os.path.join(OUT_DIR, "trendysine_TRAIN.tsv"), Xtr, ytr)
    write_ucr(os.path.join(OUT_DIR, "trendysine_TEST.tsv"), Xte, yte)
    print(f"wrote {Xtr.shape} train / {Xte.shape} test to {OUT_DIR}")
