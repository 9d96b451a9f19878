"""Simulator tests (reference test/simulation_tests.jl)."""

import numpy as np
import pytest

from mpstime_tpu import mcar, mar, mnar, trendy_sine, state_space
from mpstime_tpu.simulation import percentage_missing_values


class TestMCAR:
    def test_statistics(self):
        # mean missing count within 1% over many trials (simulation_tests.jl:6-40)
        rng = np.random.default_rng(0)
        X = np.arange(100.0)
        f = 0.3
        counts = [len(mcar(X, f, rng=rng)[1]) for _ in range(5000)]
        assert np.mean(counts) == pytest.approx(30.0, rel=0.02)

    def test_reproducible(self):
        X = np.arange(50.0)
        _, i1 = mcar(X, 0.4, rng=7)
        _, i2 = mcar(X, 0.4, rng=7)
        np.testing.assert_array_equal(i1, i2)

    def test_nan_positions(self):
        X = np.arange(20.0)
        Xc, idxs = mcar(X, 0.5, rng=1)
        assert np.isnan(Xc[idxs]).all()
        mask = np.ones(20, bool)
        mask[idxs] = False
        np.testing.assert_array_equal(Xc[mask], X[mask])

    def test_bad_fraction(self):
        with pytest.raises(ValueError):
            mcar(np.arange(10.0), 1.5)


class TestMAR:
    def test_contiguous_block(self):
        X = np.arange(100.0)
        Xc, idxs = mar(X, 0.37, rng=3)
        assert len(idxs) == 37
        np.testing.assert_array_equal(np.diff(idxs), 1)

    def test_block_start_uniform(self):
        X = np.arange(40.0)
        rng = np.random.default_rng(0)
        starts = [mar(X, 0.5, rng=rng)[1][0] for _ in range(2000)]
        # valid starts: 0..20 inclusive
        assert min(starts) == 0 and max(starts) == 20

    def test_bad_fraction(self):
        with pytest.raises(ValueError):
            mar(np.arange(10.0), -0.1)


class TestMNAR:
    def test_lowest(self):
        X = np.array([5.0, 1.0, 3.0, 2.0, 4.0])
        Xc, idxs = mnar(X, 0.4, "lowest")
        assert set(idxs) == {1, 3}

    def test_highest(self):
        X = np.array([5.0, 1.0, 3.0, 2.0, 4.0])
        Xc, idxs = mnar(X, 0.4, "highest")
        assert set(idxs) == {0, 4}


class TestTrendySine:
    def test_shape_and_fixed_params(self):
        X, info = trendy_sine(30, 5, period=10.0, slope=0.0, phase=0.0,
                              sigma=0.0, rng=0)
        assert X.shape == (5, 30)
        ts = np.arange(1, 31)
        expect = np.sin(2 * np.pi / 10.0 * ts)
        np.testing.assert_allclose(X[0], expect, atol=1e-12)
        np.testing.assert_array_equal(X[0], X[4])
        assert info["T"] == 30 and info["n"] == 5

    def test_param_ranges(self):
        X, info = trendy_sine(20, 50, period=(5.0, 10.0), rng=0)
        assert (info["period"] >= 5.0).all() and (info["period"] <= 10.0).all()

    def test_discrete_params(self):
        X, info = trendy_sine(20, 50, period=[10.0, 20.0], rng=0)
        assert set(np.unique(info["period"])) <= {10.0, 20.0}

    def test_slope(self):
        X, _ = trendy_sine(40, 1, period=1e9, slope=2.0, phase=0.0, rng=0)
        # pure linear trend (period >> T): x_T - x_1 ~ 2*(T-1)/T
        assert X[0, -1] - X[0, 0] == pytest.approx(2.0 * 39 / 40, abs=1e-6)


class TestStateSpace:
    def test_shape(self):
        X = state_space(25, 4, rng=0)
        assert X.shape == (4, 25)
        assert np.isfinite(X).all()

    def test_lag_order_validation(self):
        with pytest.raises(ValueError):
            state_space(10, 2, s=1)

    def test_reproducible(self):
        X1 = state_space(15, 2, rng=5)
        X2 = state_space(15, 2, rng=5)
        np.testing.assert_array_equal(X1, X2)

    def test_noise_scale(self):
        X = state_space(50, 20, sigma=0.0, rng=0)
        np.testing.assert_allclose(X, 0.0, atol=1e-12)
