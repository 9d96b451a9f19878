"""Data-driven encoding tests: SL/SLTD, projected bases, split bases."""

import jax.numpy as jnp
import numpy as np
import pytest

import mpstime_tpu as mt
from mpstime_tpu.encodings import encode_dataset, get_encoding
from mpstime_tpu.encodings.data_driven import (kde_pdf_np, remove_zeros,
                                               sahand_legendre_coeffs,
                                               silverman_bandwidth)
from mpstime_tpu.encodings.split import (get_nbins_safely, hist_split,
                                         hist_split_1d, unif_split)


class TestKDE:
    def test_pdf_normalises(self):
        rng = np.random.default_rng(0)
        xs = rng.standard_normal(500)
        bw = silverman_bandwidth(xs)
        grid = np.linspace(-6, 6, 2001)
        p = kde_pdf_np(grid, xs, bw)
        assert np.trapezoid(p, grid) == pytest.approx(1.0, abs=1e-3)
        assert (p >= 0).all()

    def test_remove_zeros(self):
        xs = np.linspace(-1, 1, 101)
        f0 = np.exp(-10 * xs ** 2)
        f0[:10] = 0.0        # dead region
        minval, norm = remove_zeros(xs, f0)
        assert minval > 0
        assert (f0 > 0).all()


class TestSahandLegendreCoeffs:
    def test_orthonormality(self):
        # the constructed polynomials f_n(x) = poly_n(x) * f0(x) must be
        # L2-orthonormal under the f0^2 measure (bases.jl:158-206)
        xs = np.linspace(-1, 1, 801)
        f0 = np.sqrt(np.exp(-2 * xs ** 2))
        f0 /= np.sqrt(np.trapezoid(f0 ** 2, xs))
        d = 4
        c = sahand_legendre_coeffs(xs, f0, d)
        powers = xs[None, :] ** np.arange(d)[:, None]     # [d, G]
        fn = (c @ powers) * f0[None, :]
        G = np.array([[np.trapezoid(fn[i] * fn[j], xs) for j in range(d)]
                      for i in range(d)])
        # n=0 row is the raw f0 (c00=1, not renormalised in the reference)
        np.testing.assert_allclose(G[1:, 1:], np.eye(d - 1), atol=1e-6)
        np.testing.assert_allclose(G[0, 1:], 0.0, atol=1e-6)


class TestSLEncodings:
    @pytest.mark.parametrize("enc", ["SL", "SLTD"])
    def test_trains(self, ecg200, enc):
        Xtr, ytr, Xte, yte = ecg200
        opts = mt.MPSOptions(nsweeps=3, chi_max=15, d=4, encoding=enc,
                             verbosity=-1, dtype="float64", log_level=0)
        trained, _, _ = mt.fit_mps(Xtr[:60], ytr[:60], opts=opts)
        acc = np.mean(mt.classify(trained, Xte) == yte)
        assert acc >= 0.72

    def test_sl_encoding_deterministic(self, two_class_sines):
        Xtr, ytr, *_ = two_class_sines
        opts = mt.MPSOptions(d=4, encoding="SL", verbosity=-1, dtype="float64")
        from mpstime_tpu.utils.preprocessing import transform_train_data
        Xs, _ = transform_train_data(Xtr, opts)
        ds1 = encode_dataset(Xtr, Xs, ytr, opts)
        ds2 = encode_dataset(Xtr, Xs, ytr, opts)
        np.testing.assert_array_equal(np.asarray(ds1.X_enc),
                                      np.asarray(ds2.X_enc))
        # re-encoding with stored args reproduces (imputation invariant)
        ds3 = encode_dataset(Xtr, Xs, ytr, opts, training_enc_args=ds1.enc_args)
        np.testing.assert_allclose(np.asarray(ds1.X_enc), np.asarray(ds3.X_enc),
                                   atol=1e-12)


class TestProjectedBases:
    @pytest.mark.parametrize("enc,dtype", [("legendre", "float64"),
                                           ("fourier", "complex128")])
    def test_projected_trains(self, ecg200, enc, dtype):
        Xtr, ytr, Xte, yte = ecg200
        opts = mt.MPSOptions(nsweeps=3, chi_max=15, d=4, encoding=enc,
                             projected_basis=True, verbosity=-1, dtype=dtype,
                             log_level=0)
        trained, _, _ = mt.fit_mps(Xtr[:60], ytr[:60], opts=opts)
        acc = np.mean(mt.classify(trained, Xte) == yte)
        assert acc >= 0.7

    def test_projection_selects_varied_orders(self, two_class_sines):
        Xtr, ytr, *_ = two_class_sines
        opts = mt.MPSOptions(d=3, encoding="legendre", projected_basis=True,
                             verbosity=-1, dtype="float64")
        from mpstime_tpu.utils.preprocessing import transform_train_data
        Xs, _ = transform_train_data(Xtr, opts)
        spec = get_encoding("legendre", project=True)
        args = spec.init(Xs, ytr, 3, opts)
        sel = args["order_select"]
        assert sel.shape == (Xtr.shape[1], 3)
        assert sel.min() >= 0


class TestSplitBins:
    def test_unif_split(self):
        bins = unif_split(None, 4, -1.0, 1.0)
        np.testing.assert_allclose(bins, [-1, -0.5, 0, 0.5, 1])

    def test_hist_split_equal_counts(self):
        rng = np.random.default_rng(0)
        samples = rng.uniform(0, 1, 400)
        bins = hist_split_1d(samples, 4, 0.0, 1.0)
        assert bins[0] == 0.0 and bins[-1] == 1.0
        counts, _ = np.histogram(samples, bins)
        # approximately equal-count bins
        assert counts.min() >= 90 and counts.max() <= 110

    def test_hist_split_matrix(self):
        rng = np.random.default_rng(1)
        X = rng.uniform(0, 1, (50, 7))
        bins = hist_split(X, 5, 0.0, 1.0)
        assert bins.shape == (7, 6)
        assert (np.diff(bins, axis=1) >= 0).all()

    def test_nbins_divisibility(self):
        with pytest.raises(ValueError, match="evenly divide"):
            get_nbins_safely(7, 2)


class TestSplitEncoding:
    def test_boundary_weights(self):
        # a point exactly on a shared bin edge gets weight 0.5 in both bins
        # (reference rect(), splitbases.jl:96-108)
        spec = get_encoding("unif_split_uniform")
        opts = mt.MPSOptions(d=4, aux_basis_dim=2, encoding="unif_split_uniform",
                             verbosity=-1)
        X = np.array([[0.5, 0.25, 0.0, 1.0]])
        args = spec.init(X, np.zeros(1), 4, opts)
        enc = np.asarray(spec.encode_batch(jnp.asarray(X), 4, args))
        # bins: [0, .5, 1]; aux=uniform d=2 -> aux vec = [1/2, 1/2]
        np.testing.assert_allclose(enc[0, 0], [0.25, 0.25, 0.25, 0.25])  # edge
        np.testing.assert_allclose(enc[0, 1], [0.5, 0.5, 0.0, 0.0])     # bin 1
        np.testing.assert_allclose(enc[0, 2], [0.5, 0.5, 0.0, 0.0])     # a-edge
        np.testing.assert_allclose(enc[0, 3], [0.0, 0.0, 0.5, 0.5])     # b-edge

    @pytest.mark.parametrize("enc", ["unif_split_legendre", "hist_split_uniform"])
    def test_split_trains(self, two_class_sines, enc):
        Xtr, ytr, Xte, yte = two_class_sines
        opts = mt.MPSOptions(nsweeps=3, chi_max=12, d=8, aux_basis_dim=2,
                             encoding=enc, verbosity=-1, dtype="float64",
                             log_level=0)
        trained, _, _ = mt.fit_mps(Xtr, ytr, opts=opts)
        acc = np.mean(mt.classify(trained, Xte) == yte)
        assert acc >= 0.7

    def test_split_of_data_driven_forbidden(self):
        with pytest.raises(ValueError, match="not yet supported"):
            get_encoding("hist_split_sl")
