"""Cross-check: the vectorized XLA engine vs an independent naive per-sample
numpy implementation (the reference keeps a legacy engine for the same
purpose and asserts agreement, test/classification.jl:10-24)."""

import numpy as np
import pytest

import mpstime_tpu as mt
from mpstime_tpu.encodings import encode_dataset
from mpstime_tpu.training.reference_engine import (naive_fit_mps,
                                                   naive_predict)
from mpstime_tpu.training.stats import predict_class_indices
from mpstime_tpu.utils.preprocessing import transform_data


@pytest.fixture(scope="module")
def problem(two_class_sines):
    Xtr, ytr, Xte, yte = two_class_sines
    Xtr, ytr = Xtr[:24], ytr[:24]
    Xte, yte = Xte[:24], yte[:24]
    opts = mt.MPSOptions(nsweeps=4, chi_max=8, d=3, verbosity=-1,
                         dtype="float64", svd_alg="gram_eigh")
    Xtr_s, Xte_s, norms, _ = transform_data(Xtr, Xte, opts)
    tr_ds = encode_dataset(Xtr, Xtr_s, ytr, opts)
    te_ds = encode_dataset(Xte, Xte_s, yte, opts, labels=tr_ds.labels,
                           training_enc_args=tr_ds.enc_args)
    return opts, tr_ds, te_ds


def test_engines_agree(problem):
    opts, tr_ds, te_ds = problem
    # fast engine
    trained, _, _ = mt.fit_mps(tr_ds.X_orig, tr_ds.labels[tr_ds.y_idx],
                               opts=opts)
    fast_preds = predict_class_indices(trained.mps, te_ds.X_enc)

    # naive engine on the identical encoded data
    naive = naive_fit_mps(np.asarray(tr_ds.X_enc), tr_ds.y_idx, 2,
                          nsweeps=opts.nsweeps, chi_max=opts.chi_max,
                          chi_init=opts.chi_init, eta=opts.eta,
                          cutoff=opts.cutoff, seed=opts.init_rng)
    naive_preds = naive_predict(naive, np.asarray(te_ds.X_enc))

    agreement = np.mean(fast_preds == naive_preds)
    assert agreement >= 0.95, (fast_preds.tolist(), naive_preds.tolist())


def test_naive_engine_trains(problem):
    opts, tr_ds, te_ds = problem
    naive = naive_fit_mps(np.asarray(tr_ds.X_enc), tr_ds.y_idx, 2,
                          nsweeps=3, chi_max=8, seed=1)
    preds = naive_predict(naive, np.asarray(tr_ds.X_enc))
    assert np.mean(preds == tr_ds.y_idx) >= 0.9
