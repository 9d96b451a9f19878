import numpy as np
import pytest

from mpstime_tpu import MPSOptions
from mpstime_tpu.utils.preprocessing import (invert_test_transform,
                                             transform_data,
                                             transform_test_data,
                                             transform_train_data)


@pytest.fixture
def opts():
    return MPSOptions(verbosity=-1)


def test_train_transform_range(ecg200, opts):
    Xtr, *_ = ecg200
    Xs, norms = transform_train_data(Xtr, opts)
    # legendre encoding range is [-1, 1]; train data must fill it exactly
    assert Xs.min() == pytest.approx(-1.0)
    assert Xs.max() == pytest.approx(1.0)
    assert norms.sigmoid_median is not None and norms.minmax_min is not None


def test_sigmoid_formula(opts):
    # X' = (1 + exp(-(X-med)/(iqr/1.35)))^-1  (reference options.jl docstring)
    X = np.array([[1.0, 2.0, 3.0, 4.0, 100.0]])
    o = opts.replace(minmax=False, encoding="uniform")  # range (0,1), no minmax
    Xs, norms = transform_train_data(X, o)
    med = np.median(X)
    iqr = np.quantile(X, 0.75) - np.quantile(X, 0.25)
    expect = 1 / (1 + np.exp(-(X - med) / (iqr / 1.35)))
    np.testing.assert_allclose(Xs, expect, atol=1e-12)


def test_oob_rescue_and_inverse(ecg200, opts):
    # reference utils.jl:202-334: test series outside [0,1] get per-series
    # rescues recorded, and invert_test_transform is an exact inverse
    Xtr, _, Xte, _ = ecg200
    Xtr_s, Xte_s, norms, oob = transform_data(Xtr, Xte, opts)
    a, b = -1.0, 1.0
    assert Xte_s.min() >= a - 1e-12 and Xte_s.max() <= b + 1e-12
    # ECG200's test split needs at least one rescue under train normalisation
    assert len(oob) > 0
    Xte_rec = invert_test_transform(Xte_s, oob, norms, opts)
    np.testing.assert_allclose(Xte_rec, Xte, atol=1e-8)


def test_inverse_without_oob(opts):
    rng = np.random.default_rng(0)
    Xtr = rng.standard_normal((20, 12))
    Xte = Xtr[:5] * 0.5  # well inside the train range
    Xtr_s, Xte_s, norms, oob = transform_data(Xtr, Xte, opts)
    Xte_rec = invert_test_transform(Xte_s, oob, norms, opts)
    np.testing.assert_allclose(Xte_rec, Xte, atol=1e-9)


def test_vector_roundtrip(opts):
    rng = np.random.default_rng(1)
    Xtr = rng.standard_normal((20, 12))
    _, norms = transform_train_data(Xtr, opts)
    x = rng.standard_normal(12)
    xs, oob = transform_test_data(x, norms, opts)
    assert xs.shape == (12,)
    x_rec = invert_test_transform(xs, oob, norms, opts)
    np.testing.assert_allclose(x_rec, x, atol=1e-8)


def test_no_transforms(opts):
    o = opts.replace(sigmoid_transform=False, minmax=False, encoding="uniform")
    X = np.random.default_rng(2).uniform(0, 1, (5, 4))
    Xs, norms = transform_train_data(X, o)
    np.testing.assert_allclose(Xs, X)  # uniform range is (0,1): identity map
