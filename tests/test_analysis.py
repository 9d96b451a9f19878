"""Analysis tests (reference test/analysis_tests.jl)."""

import numpy as np
import pytest

import mpstime_tpu as mt
from mpstime_tpu.analysis import (bipartite_spectrum, one_site_rdm,
                                  rho_correct, see_variation,
                                  single_site_entropy, single_site_spectrum,
                                  von_neumann_entropy)
from mpstime_tpu.models.mps import expand_label_index, random_mps


@pytest.fixture(scope="module")
def trained(two_class_sines):
    Xtr, ytr, Xte, yte = two_class_sines
    opts = mt.MPSOptions(nsweeps=3, chi_max=10, d=4, verbosity=-1,
                         dtype="float64", log_level=0)
    tr, _, _ = mt.fit_mps(Xtr, ytr, Xte, yte, opts)
    return tr


class TestVonNeumann:
    def test_shapes_and_positivity(self, trained):
        bees = bipartite_spectrum(trained)
        assert len(bees) == 2
        T = trained.mps.T
        for b in bees:
            assert b.shape == (T,)
            assert (b >= -1e-10).all()
            # entropy at the trivial last cut is 0
            assert b[-1] == pytest.approx(0.0, abs=1e-8)

    def test_log_bases(self, trained):
        m = expand_label_index(trained.mps)[0]
        e_nat = von_neumann_entropy(m, "log")
        e_2 = von_neumann_entropy(m, "log2")
        e_10 = von_neumann_entropy(m, "log10")
        np.testing.assert_allclose(e_2, e_nat / np.log(2), atol=1e-10)
        np.testing.assert_allclose(e_10, e_nat / np.log(10), atol=1e-10)

    def test_invalid_logfn(self, trained):
        m = expand_label_index(trained.mps)[0]
        with pytest.raises(ValueError):
            von_neumann_entropy(m, "ln")

    def test_product_state_zero_entropy(self):
        # chi_init=1 random MPS is a product state: all BEE = 0
        m = random_mps(0, 6, 3, 1, 1, 4, np.float64)
        from mpstime_tpu.models.mps import SingleMPS
        s = SingleMPS(m.cores, m.center[:, :, :, 0] / np.linalg.norm(m.center),
                      m.center_pos)
        e = von_neumann_entropy(s)
        np.testing.assert_allclose(e, 0.0, atol=1e-10)


class TestRhoCorrect:
    def test_passthrough_psd(self):
        rho = np.diag([0.6, 0.4])
        np.testing.assert_array_equal(rho_correct(rho), rho)

    def test_clamps_tiny_negatives(self):
        rho = np.diag([1.0, -1e-12])
        out = rho_correct(rho)
        w = np.linalg.eigvalsh(out)
        assert (w >= 0).all()

    def test_raises_large_negatives(self):
        rho = np.diag([1.3, -0.3])
        with pytest.raises(ValueError, match="negative eigenvalues"):
            rho_correct(rho)

    def test_trace_check(self):
        rho = np.diag([5.0, -1e-12])
        with pytest.raises(ValueError, match="Tr"):
            rho_correct(rho)


class TestSingleSite:
    def test_spectrum_shapes(self, trained):
        sees = single_site_spectrum(trained)
        assert len(sees) == 2
        T = trained.mps.T
        for s in sees:
            assert s.shape == (T,)
            assert (s >= -1e-10).all()
            assert (s <= np.log(trained.mps.d) + 1e-8).all()  # max entropy ln d

    def test_one_site_rdm_properties(self, trained):
        m = expand_label_index(trained.mps)[0]
        rho = one_site_rdm(m, 3)
        assert rho.shape == (4, 4)
        np.testing.assert_allclose(np.trace(rho).real, 1.0, atol=1e-8)
        np.testing.assert_allclose(rho, rho.conj().T, atol=1e-10)


class TestSeeVariation:
    def test_structure(self, trained, two_class_sines):
        Xtr, *_ = two_class_sines
        out = see_variation(trained, Xtr[:2], class_label=0)
        T = trained.mps.T
        assert out.shape == (2, T, T)
        # row 0 is the unmeasured baseline
        base = single_site_entropy(expand_label_index(trained.mps)[0])
        np.testing.assert_allclose(out[0, 0], base, atol=1e-8)
        np.testing.assert_allclose(out[1, 0], base, atol=1e-8)
        # measured sites have zero entries (j < k)
        assert out[0][np.tril_indices(T, k=-1)].max() == 0.0
        # entropies nonnegative and bounded
        assert (out >= -1e-9).all()
        assert (out <= np.log(trained.mps.d) + 1e-6).all()

    def test_measurement_reduces_mean_entropy(self, trained, two_class_sines):
        # conditioning on data from the same class should (on average) reduce
        # the remaining uncertainty near the measured region
        Xtr, ytr, *_ = two_class_sines
        x0 = Xtr[ytr == 0][:1]
        out = see_variation(trained, x0, class_label=0)[0]
        T = trained.mps.T
        k = T // 2
        base_tail = out[0, k:].mean()
        cond_tail = out[k, k:].mean()
        assert cond_tail <= base_tail + 0.15
