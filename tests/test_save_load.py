"""Serialization round-trip tests (reference test/save_load.jl)."""

import numpy as np
import pytest

import mpstime_tpu as mt


@pytest.fixture(scope="module")
def trained(two_class_sines):
    Xtr, ytr, *_ = two_class_sines
    opts = mt.MPSOptions(nsweeps=2, chi_max=10, d=4, verbosity=-1,
                         dtype="float64", log_level=0)
    tr, _, _ = mt.fit_mps(Xtr, ytr, opts=opts)
    return tr


def test_round_trip_exact(trained, tmp_path):
    p = str(tmp_path / "model.npz")
    mt.save_mps(p, trained)
    loaded = mt.load_mps(p)
    assert mt.trained_mps_equal(trained, loaded)


def test_loaded_model_classifies_identically(trained, two_class_sines, tmp_path):
    _, _, Xte, yte = two_class_sines
    p = str(tmp_path / "model.npz")
    mt.save_mps(p, trained)
    loaded = mt.load_mps(p)
    np.testing.assert_array_equal(mt.classify(trained, Xte),
                                  mt.classify(loaded, Xte))


def test_loaded_model_imputes(trained, two_class_sines, tmp_path):
    _, _, Xte, yte = two_class_sines
    p = str(tmp_path / "model.npz")
    mt.save_mps(p, trained)
    loaded = mt.load_mps(p)
    imp = mt.init_imputation_problem(loaded, Xte, yte, verbosity=-1)
    _, sites = mt.mar(Xte[0], 0.2, rng=0)
    ts, _, _, stats, _ = mt.mps_impute(imp, 0, 0, sites, "median",
                                       NN_baseline=False, plot_fits=False)
    assert np.isfinite(ts[0]).all()


def test_equality_detects_changes(trained, tmp_path):
    import dataclasses
    p = str(tmp_path / "model.npz")
    mt.save_mps(p, trained)
    loaded = mt.load_mps(p)
    tweaked = dataclasses.replace(
        loaded, mps=mt.MPS(loaded.mps.cores + 1e-3, loaded.mps.center,
                           loaded.mps.center_pos))
    assert not mt.trained_mps_equal(trained, tweaked)
    assert not mt.trained_mps_equal(
        trained, dataclasses.replace(loaded, opts=loaded.opts.replace(d=9)))


def test_complex_round_trip(two_class_sines, tmp_path):
    Xtr, ytr, *_ = two_class_sines
    opts = mt.MPSOptions(nsweeps=2, chi_max=8, d=4, encoding="Fourier",
                         verbosity=-1, dtype="complex128", log_level=0)
    tr, _, _ = mt.fit_mps(Xtr, ytr, opts=opts)
    p = str(tmp_path / "cmodel.npz")
    mt.save_mps(p, tr)
    loaded = mt.load_mps(p)
    assert mt.trained_mps_equal(tr, loaded)
    assert np.asarray(loaded.mps.cores).dtype.kind == "c"
