"""Generate the pinned golden regression constants for tests/test_golden.py.

Protocol mirrors the reference's regression tests:
 * classification: default MPSOptions on ECG200 (the reference pins IPD at
   default opts, test/classification.jl:26,47; IPD is not vendorable offline
   so ECG200 is the pinned dataset).
 * imputation: train nsweeps=3 at f64 (the reference fixture protocol,
   test/imputation.jl:8-10), then the 5-method x 2-class mean-MAE table over
   10 seeded instances/class with 20% MAR blocks (test/imputation.jl:37-52).
Run on CPU with x64 (what tests/conftest.py forces).
"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import mpstime_tpu as mt

d = np.load("tests/data/ecg200.npz")
Xtr, ytr, Xte, yte = d["X_train"], d["y_train"], d["X_test"], d["y_test"]

# ---- classification golden ------------------------------------------------
opts = mt.MPSOptions(verbosity=-1, dtype="float64")
trained, info, ts = mt.fit_mps(Xtr, ytr, Xte, yte, opts)
preds = mt.classify(trained, Xte)
acc = float(np.mean(preds == yte))
from mpstime_tpu.summary import confusion_matrix
labels = list(trained.labels)
yt_idx = np.searchsorted(labels, yte)
pr_idx = np.searchsorted(labels, preds)
conf = confusion_matrix(yt_idx, pr_idx, len(labels))
print("CLS_ACC =", repr(acc))
print("CLS_CONF =", conf.tolist())
print("CLS_TRAIN_ACC =", repr(info["train_acc"][-1]))
print("CLS_KLD_FIRST =", repr(info["train_KL_div"][1]))
print("CLS_KLD_LAST =", repr(info["train_KL_div"][-1]))

# ---- imputation MAE table ---------------------------------------------------
opts3 = mt.MPSOptions(nsweeps=3, verbosity=-1, log_level=-1, dtype="float64")
tr3, _, _ = mt.fit_mps(Xtr, ytr, Xte, yte, opts3)
imp = mt.init_imputation_problem(tr3, Xte, yte, verbosity=-1)
methods = ["median", "mean", "mode", "ITS", "kNearestNeighbour"]
classes = [0, 1]
rng = np.random.default_rng(1)
maes = np.zeros((len(methods), len(classes)))
# fix instance and window selection once per class (shared across methods so
# methods are compared on identical tasks, unlike the reference's
# rng-threaded loop; selection seed documented in the test)
sel = {}
for ci, c in enumerate(classes):
    ns = int(np.sum(yte == c))
    idxs = rng.permutation(ns)[:10]
    wins = []
    for i in idxs:
        _, w = mt.mar(Xte[np.where(yte == c)[0][i]], 0.2, rng=rng)
        wins.append(w)
    sel[c] = (idxs, wins)
for mi, m in enumerate(methods):
    for ci, c in enumerate(classes):
        idxs, wins = sel[c]
        tot = 0.0
        for i, w in zip(idxs, wins):
            out = mt.mps_impute(imp, c, int(i), w, method=m,
                                NN_baseline=False, plot_fits=False)
            tot += out[3][0]["MAE"]
        maes[mi, ci] = tot / len(idxs)
        print(f"MAE[{m}][class {c}] = {maes[mi, ci]!r}", flush=True)
print("MAE_TABLE =", repr(maes.tolist()))

# ---- 80% MAR MAPE golden (reference test/imputation.jl:26-35) --------------
_, w80 = mt.mar(Xte[np.where(yte == 1)[0][19]], 0.8, rng=np.random.default_rng(123))
out80 = mt.mps_impute(imp, 1, 19, w80, method="median", NN_baseline=True,
                      plot_fits=False)
print("MAPE80 =", repr(out80[3][0]["MAPE"]))
print("NN_MAPE80 =", repr(out80[3][0]["NN_MAPE"]))
