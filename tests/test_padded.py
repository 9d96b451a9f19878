"""Shape-polymorphic (padded) engine tests — MPSOptions.pad_to.

The padded path runs training/inference at static caps (chi_cap, d_cap)
with the trial's chi_max as a RUNTIME truncation rank and the encoding
zero-padded from d to d_cap, so every (chi_max, d) under the caps shares
one compiled program (what tune's padded_trials uses to avoid a fresh XLA
compile per hyperparameter trial).  Zero-padding is exact up to
eigendecomposition noise in dead directions.
"""

import numpy as np
import pytest

import mpstime_tpu as mt


def _toy(n=48, T=24, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 2 * np.pi, T)
    X = np.concatenate([
        np.sin(t[None] + rng.uniform(0, 6, (n // 2, 1))),
        np.sin(3 * t[None] + rng.uniform(0, 6, (n // 2, 1)))])
    X += 0.1 * rng.standard_normal(X.shape)
    y = np.repeat([0, 1], n // 2)
    return X, y


class TestPaddedOptions:
    def test_validation_and_roundtrip(self):
        o = mt.MPSOptions(chi_max=20, d=5, pad_to=(32, 8))
        assert o.pad_to == (32, 8)
        assert mt.MPSOptions.from_json(o.to_json()).pad_to == (32, 8)
        with pytest.raises(ValueError):
            mt.MPSOptions(chi_max=20, d=5, pad_to=(10, 8))
        with pytest.raises(ValueError):
            mt.MPSOptions(chi_max=20, d=5, pad_to=(32, 3))

    def test_mesh_exclusion(self):
        import jax
        from mpstime_tpu.parallel import make_mesh
        X, y = _toy()
        mesh = make_mesh(len(jax.devices()))
        with pytest.raises(ValueError, match="mesh"):
            mt.fit_mps(X, y, opts=mt.MPSOptions(
                nsweeps=1, chi_max=8, d=3, verbosity=-1, pad_to=(12, 5)),
                mesh=mesh)


class TestPaddedTraining:
    @pytest.fixture(scope="class")
    def runs(self, ecg200):
        Xtr, ytr, Xte, yte = ecg200
        base = dict(nsweeps=10, chi_max=15, d=4, verbosity=-1,
                    dtype="float64", log_level=0)
        exact, _, _ = mt.fit_mps(Xtr, ytr, opts=mt.MPSOptions(**base))
        padded, _, _ = mt.fit_mps(Xtr, ytr, opts=mt.MPSOptions(
            **base, pad_to=(24, 7)))
        return exact, padded, Xte, yte

    def test_shapes_and_rank_cap(self, runs):
        _, padded, _, _ = runs
        T = padded.mps.T
        assert padded.mps.cores.shape == (T, 24, 7, 24)
        # the RUNTIME truncation cap must hold: effective ranks <= chi_max
        assert int(np.max(padded.mps.bond_dims())) <= 15

    def test_padded_directions_carry_no_energy(self, runs):
        _, padded, _, _ = runs
        c = np.asarray(padded.mps.cores)
        frac = (np.abs(c[:, :, 4:, :]) ** 2).sum() / (np.abs(c) ** 2).sum()
        assert frac < 1e-15   # eigh noise in dead directions only

    def test_converged_quality_matches(self, runs):
        exact, padded, Xte, yte = runs
        acc_e = float(np.mean(mt.classify(exact, Xte) == yte))
        acc_p = float(np.mean(mt.classify(padded, Xte) == yte))
        # same algorithm up to degenerate-eigenbasis trajectory noise
        assert acc_p >= acc_e - 0.06
        assert acc_p >= 0.75

    def test_imputation_on_padded_model(self, runs):
        exact, padded, Xte, yte = runs
        _, sites = mt.mar(Xte[0], 0.2, rng=7)
        imp_p = mt.init_imputation_problem(padded, Xte, yte, verbosity=-1)
        imp_e = mt.init_imputation_problem(exact, Xte, yte, verbosity=-1)
        ts_p, _, _, st_p, _ = mt.mps_impute(imp_p, 0, 2, sites, "median")
        ts_e, _, _, st_e, _ = mt.mps_impute(imp_e, 0, 2, sites, "median")
        assert np.isfinite(np.asarray(ts_p[0])).all()
        assert st_p[0]["MAE"] < 3 * st_e[0]["MAE"] + 0.2

    def test_complex_fourier_padded(self, ecg200):
        # complex encodings (Fourier -> complex cores, svd_alg='randomized')
        # through the padded engine: zero-padded complex features + runtime
        # rank cap in the Ritz split
        Xtr, ytr, Xte, yte = ecg200
        opts = mt.MPSOptions(nsweeps=4, chi_max=10, d=4, verbosity=-1,
                             encoding="fourier", dtype="complex128",
                             log_level=0, pad_to=(16, 6))
        trained, _, _ = mt.fit_mps(Xtr[:40], ytr[:40], opts=opts)
        assert trained.mps.cores.dtype == np.complex128
        assert int(np.max(trained.mps.bond_dims())) <= 10
        acc = float(np.mean(mt.classify(trained, Xtr[:40]) == ytr[:40]))
        assert acc > 0.8

    def test_mean_method_in_jit_encode_pads(self, runs):
        # the :mean estimator re-encodes x* in-jit at enc_d and pads to d_cap
        _, padded, Xte, yte = runs
        _, sites = mt.mar(Xte[0], 0.2, rng=9)
        imp = mt.init_imputation_problem(padded, Xte, yte, verbosity=-1)
        ts, _, _, _, _ = mt.mps_impute(imp, 1, 0, sites, "mean")
        assert np.isfinite(np.asarray(ts[0])).all()


class TestPaddedPallas:
    def test_dynamic_rank_cap_in_fused_kernels(self, ecg200):
        """The production engine (f32 + randomized_warm -> Pallas bond
        kernels, interpreter mode on CPU) honors the runtime chi cap under
        pad_to, so padded hyperopt trials run the SAME fused engine as
        exact-shape training."""
        from mpstime_tpu.ops import pallas_bond
        Xtr, ytr, Xte, yte = ecg200
        base = dict(nsweeps=3, chi_max=10, d=4, verbosity=-1,
                    dtype="float32", log_level=0, svd_alg="randomized_warm")
        pallas_bond.set_interpret(True)
        try:
            padded, _, _ = mt.fit_mps(Xtr[:40], ytr[:40],
                                      opts=mt.MPSOptions(**base,
                                                         pad_to=(16, 6)))
        finally:
            pallas_bond.set_interpret(False)
        T = padded.mps.T
        assert padded.mps.cores.shape == (T, 16, 6, 16)
        assert int(np.max(padded.mps.bond_dims())) <= 10
        c = np.asarray(padded.mps.cores)
        frac = (np.abs(c[:, :, 4:, :]) ** 2).sum() / (np.abs(c) ** 2).sum()
        assert frac < 1e-7    # f32 eigh/QR noise in dead directions only
        preds = mt.classify(padded, Xtr[:40])
        assert float(np.mean(preds == ytr[:40])) > 0.8


class TestPaddedTune:
    def test_padded_trials_enumerate_same_search(self):
        X, y = _toy()
        params = {"chi_max": (6, 12), "d": (3, 5), "eta": [0.05, 0.2]}
        kw = dict(nfolds=2, parameters=params,
                  method=mt.MPSRandomSearch("LatinHypercube"),
                  objective=mt.MisclassificationRate(), rng=3, maxiters=3,
                  verbosity=0,
                  opts0=mt.MPSOptions(nsweeps=2, verbosity=-5, log_level=-1,
                                      dtype="float64"))
        best_p, cache_p = mt.tune(X, y, padded_trials=True, **kw)
        best_u, cache_u = mt.tune(X, y, padded_trials=False, **kw)
        # identical trial enumeration (same rng -> same keys)
        assert set(cache_p) == set(cache_u)
        # losses comparable trial-by-trial (trajectory noise only)
        for k in cache_p:
            assert abs(cache_p[k] - cache_u[k]) < 0.35
        assert set(best_p) == {"chi_max", "d", "eta"}

    def test_padded_with_classes_separately(self, ecg200):
        # per-class training weights + per-class encoding both compose with
        # the padded engine (zero-weight sample padding, zero-padded d)
        Xtr, ytr, Xte, yte = ecg200
        opts = mt.MPSOptions(nsweeps=3, chi_max=10, d=4, verbosity=-1,
                             dtype="float64", log_level=0,
                             train_classes_separately=True,
                             encode_classes_separately=True,
                             encoding="sahand_legendre", pad_to=(14, 6))
        trained, _, _ = mt.fit_mps(Xtr[:40], ytr[:40], opts=opts)
        assert int(np.max(trained.mps.bond_dims())) <= 10
        acc = float(np.mean(mt.classify(trained, Xtr[:40]) == ytr[:40]))
        assert acc > 0.8

    def test_scipy_solver_padded(self):
        X, y = _toy(n=24, T=12)
        best, cache = mt.tune(
            X, y, nfolds=2, parameters={"chi_max": (4, 10), "d": (3, 4)},
            method=mt.ScipySolver("differential_evolution"),
            objective=mt.MisclassificationRate(), rng=2, maxiters=4,
            verbosity=0,
            opts0=mt.MPSOptions(nsweeps=1, verbosity=-5, log_level=-1,
                                dtype="float64"))
        assert cache and all(np.isfinite(v) for v in cache.values())
        assert 4 <= best["chi_max"] <= 10

    def test_step_range_cap_covers_value_map_overshoot(self):
        # (lb, step, ub) value maps come from arange(lb, ub + step/2, step)
        # and can exceed ub; the padded caps must cover the actual max or a
        # trial above the nominal ub crashes opts.replace(pad_to=...)
        from mpstime_tpu.hyperopt.tuning import _padded_caps
        caps = _padded_caps({"chi_max": (2, 3, 10)},
                            mt.MPSOptions(chi_max=5, d=4))
        assert caps[0] >= 11   # arange gives [2, 5, 8, 11]
        X, y = _toy(n=24, T=12)
        best, cache = mt.tune(
            X, y, nfolds=2, parameters={"chi_max": (2, 3, 10)},
            method=mt.MPSRandomSearch("Exhaustive"),
            objective=mt.MisclassificationRate(), rng=1, maxiters=4,
            verbosity=0,
            opts0=mt.MPSOptions(nsweeps=1, d=3, verbosity=-5, log_level=-1,
                                dtype="float64"))
        assert len(cache) == 4   # every arange value evaluated, incl. 11

    def test_data_driven_encoding_through_fused_path(self, ecg200):
        # data-driven enc_args (KDE bandwidths etc.) are consumed with
        # float()/np.asarray() inside encode_batch -> they must be bound
        # concretely, never traced, in the in-jit encode of impute_windows
        # and the :mean estimator
        from mpstime_tpu.imputation import impute_windows
        Xtr, ytr, Xte, yte = ecg200
        opts = mt.MPSOptions(nsweeps=2, chi_max=10, d=4, verbosity=-1,
                             dtype="float64", log_level=0,
                             encoding="sahand_legendre")
        trained, _, _ = mt.fit_mps(Xtr[:40], ytr[:40], opts=opts)
        imp = mt.init_imputation_problem(trained, Xte, yte, verbosity=-1,
                                         test_encoding=False)
        _, sites = mt.mar(Xte[0], 0.2, rng=2)
        ts, _ = impute_windows(imp, 0, [0, 1], [sites], "median")
        assert np.isfinite(ts).all()
        ts2, _ = impute_windows(imp, 0, [0, 1], [sites], "mean")
        assert np.isfinite(ts2).all()
        loss = mt.eval_loss(mt.ImputationLoss(), trained, Xte[:20], yte[:20],
                            windows=[sites])
        assert np.isfinite(loss).all()

    def test_pad_b_to_roundtrip(self, ecg200):
        from mpstime_tpu.imputation import impute_windows
        Xtr, ytr, Xte, yte = ecg200
        opts = mt.MPSOptions(nsweeps=2, chi_max=10, d=4, verbosity=-1,
                             dtype="float64", log_level=0)
        trained, _, _ = mt.fit_mps(Xtr, ytr, opts=opts)
        imp = mt.init_imputation_problem(trained, Xte, yte, verbosity=-1,
                                         test_encoding=False)
        _, sites = mt.mar(Xte[0], 0.2, rng=5)
        a, ta = impute_windows(imp, 0, [0, 1, 2], [sites], "median")
        b, tb = impute_windows(imp, 0, [0, 1, 2], [sites], "median",
                               pad_b_to=8)
        assert a.shape == b.shape == (1, 3, Xte.shape[1])
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(ta, tb, atol=1e-12)
