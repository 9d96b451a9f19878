"""Cross-implementation oracle: a model TRAINED BY THE JULIA REFERENCE,
loaded and evaluated by this package.

``tests/data/reference_trained_ecg200.jld2`` is vendored verbatim from the
reference repo (test/Data/ecg200/mps_saves/test_dataset.jld2): a TrainedMPS
fit by MPSTime.jl itself on ECG200 with default MPSOptions (nsweeps=10,
chi_max=25, d=5, legendre_no_norm, sigmoid+minmax — decoded from the file's
own stored options).  These tests run the FULL inference stack
(preprocessing -> encoding -> MPS contraction -> argmax / imputation) on
the reference's actual trained tensors, so any deviation from the
reference's conventions anywhere in that stack (sigmoid transform
constants, Legendre normalization, index ordering, scaling) collapses the
assertions — train accuracy 1.0 in particular is unreachable unless every
stage matches the implementation that produced the weights.
"""

import os

import numpy as np
import pytest

import mpstime_tpu as mt

_FIX = os.path.join(os.path.dirname(__file__), "data",
                    "reference_trained_ecg200.jld2")

# pinned cross-implementation constants (their training, our inference)
GOLDEN_TEST_ACC = 0.84
GOLDEN_IMPUTE_MAE = 0.1883971410956766


@pytest.fixture(scope="module")
def ref_model():
    return mt.load_mpstime_jl(_FIX)


@pytest.fixture(scope="module")
def ecg(ecg200):
    return ecg200


class TestReferenceTrainedModel:
    def test_options_decoded(self, ref_model):
        o = ref_model.opts
        assert o.encoding == "legendre_no_norm"
        assert (o.nsweeps, o.chi_max, o.d, o.eta) == (10, 25, 5, 0.01)
        assert o.sigmoid_transform and o.minmax
        assert o.data_bounds == (0.0, 1.0)
        assert o.init_rng == 1234 and o.chi_init == 4

    def test_structure(self, ref_model):
        m = ref_model.mps
        assert (m.T, m.d, m.num_classes) == (96, 5, 2)
        assert m.bond_dims().max() <= 25
        assert sorted(np.unique(ref_model.labels)) == [0, 1]

    def test_norm_is_one(self, ref_model):
        # the reference normalizes the trained MPS; our re-canonicalized
        # import must preserve that exactly
        assert float(ref_model.mps.norm()) == pytest.approx(1.0, abs=1e-12)

    def test_train_accuracy_is_one(self, ref_model, ecg):
        """THE cross-implementation assertion: the reference trained this
        model to 100% train accuracy; reproducing that through our
        preprocessing + encoding + contraction on their weights proves
        stage-by-stage parity."""
        Xtr, ytr, *_ = ecg
        preds = mt.classify(ref_model, Xtr)
        assert float(np.mean(preds == ytr)) == 1.0

    def test_test_accuracy_pinned(self, ref_model, ecg):
        _, _, Xte, yte = ecg
        preds = mt.classify(ref_model, Xte)
        assert float(np.mean(preds == yte)) == pytest.approx(
            GOLDEN_TEST_ACC, abs=1e-12)

    def test_imputation_on_reference_model(self, ref_model, ecg):
        _, _, Xte, yte = ecg
        imp = mt.init_imputation_problem(ref_model, Xte, yte, verbosity=-1)
        out = mt.mps_impute(imp, 0, 0, np.arange(30, 50), method="median")
        traj = np.asarray(out[0][0])
        assert np.isfinite(traj).all()
        assert out[3][0]["MAE"] == pytest.approx(GOLDEN_IMPUTE_MAE, rel=1e-8)

    def test_analysis_on_reference_model(self, ref_model):
        # entanglement spectra of the reference-trained model are healthy
        spec = mt.bipartite_spectrum(ref_model)
        assert len(spec) == 2
        for s in spec:
            assert np.all(np.asarray(s) >= -1e-10)
            assert np.isfinite(np.asarray(s)).all()


class TestComplexImport:
    """ComplexF64 ITensor storage (the reference saves complex models for
    its Fourier/Sahand/Stoudenmire encodings, Structs/options.jl:422-427).
    No real complex fixture is vendorable offline, so a synthetic file in
    the same JLD2 layout (tests/jld2_synth.py) exercises the path: a
    fourier model trained HERE, written in the reference's on-disk layout,
    must import and classify identically."""

    @pytest.fixture(scope="class")
    def fourier_roundtrip(self, two_class_sines, tmp_path_factory):
        from tests.jld2_synth import write_synthetic_jld2

        Xtr, ytr, _, _ = two_class_sines
        Xtr, ytr = Xtr[:24], ytr[:24]
        opts = mt.MPSOptions(nsweeps=3, chi_max=10, d=4, encoding="fourier",
                             verbosity=-1, log_level=-1)
        trained, _, _ = mt.fit_mps(Xtr, ytr, opts=opts)
        path = str(tmp_path_factory.mktemp("jld2") / "fourier_synth.jld2")
        write_synthetic_jld2(path, np.asarray(trained.mps.cores),
                             np.asarray(trained.mps.center),
                             trained.mps.bond_dims(), Xtr, ytr, opts)
        return trained, mt.load_mpstime_jl(path), Xtr, ytr

    def test_complex_dtype_and_options(self, fourier_roundtrip):
        trained, imported, _, _ = fourier_roundtrip
        assert np.asarray(imported.mps.center).dtype == np.complex128
        assert imported.opts.encoding == "fourier"
        assert imported.opts.resolved_dtype() == np.complex128
        assert imported.opts.chi_max == trained.opts.chi_max

    def test_classification_matches_source_model(self, fourier_roundtrip):
        trained, imported, Xtr, ytr = fourier_roundtrip
        np.testing.assert_array_equal(mt.classify(imported, Xtr),
                                      mt.classify(trained, Xtr))

    def test_imputation_runs_on_imported_complex_model(self,
                                                       fourier_roundtrip):
        _, imported, Xtr, ytr = fourier_roundtrip
        imp = mt.init_imputation_problem(imported, Xtr, ytr, verbosity=-1,
                                         test_encoding=False)
        out = mt.mps_impute(imp, 0, 0, np.arange(10, 20), method="median")
        assert np.isfinite(np.asarray(out[0][0])).all()

    def test_unmappable_storage_raises(self, tmp_path):
        import h5py
        from mpstime_tpu.models.itensor_import import _storage_to_array

        p = str(tmp_path / "bad.h5")
        with h5py.File(p, "w") as f:
            f.create_dataset("int_data", data=np.arange(4, dtype=np.int64))
            cdt = np.dtype([("foo", "<f8"), ("bar", "<f8")])
            f.create_dataset("weird", data=np.zeros(4, dtype=cdt))
        with h5py.File(p, "r") as f:
            with pytest.raises(ValueError, match="element kind"):
                _storage_to_array(f["int_data"])
            with pytest.raises(ValueError, match="compound element type"):
                _storage_to_array(f["weird"])
