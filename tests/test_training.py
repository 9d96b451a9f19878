import jax.numpy as jnp
import numpy as np
import pytest

import mpstime_tpu as mt


class TestEndToEnd:
    def test_synthetic_sines(self, two_class_sines):
        Xtr, ytr, Xte, yte = two_class_sines
        opts = mt.MPSOptions(nsweeps=4, chi_max=12, d=4, verbosity=-1,
                             dtype="float64")
        trained, info, ts = mt.fit_mps(Xtr, ytr, Xte, yte, opts)
        assert info["train_acc"][-1] >= 0.97
        preds = mt.classify(trained, Xte)
        assert np.mean(preds == yte) >= 0.9

    @pytest.mark.slow
    def test_ecg200_reference_defaults(self, ecg200):
        # reference-default hyperparameters reach ~0.91 on ECG200 (paper-grade;
        # cf. the reference's IPD golden constant 0.9582, test/classification.jl:26)
        Xtr, ytr, Xte, yte = ecg200
        opts = mt.MPSOptions(verbosity=-1, dtype="float64")
        trained, info, ts = mt.fit_mps(Xtr, ytr, Xte, yte, opts)
        assert info["train_acc"][-1] == 1.0
        # accuracy at default opts varies ~0.85-0.89 with the init seed
        assert info["test_acc"][-1] >= 0.84
        # the three classify routes agree (reference test/classification.jl:29-44)
        preds = mt.classify(trained, Xte)
        from mpstime_tpu.summary import classify_encoded
        preds2 = classify_encoded(trained, ts.X_enc)
        y_sorted = trained.labels[ts.y_idx]
        assert np.mean(preds == yte) >= 0.84
        assert np.mean(preds2 == y_sorted) == pytest.approx(
            np.mean(preds == yte), abs=1e-12)

    def test_loss_monotonic_descent(self, ecg200):
        Xtr, ytr, *_ = ecg200
        opts = mt.MPSOptions(nsweeps=4, chi_max=10, d=3, verbosity=-1,
                             dtype="float64")
        _, info, _ = mt.fit_mps(Xtr, ytr, opts=opts)
        kl = info["train_KL_div"]
        assert kl[1] < kl[0]  # big first-sweep drop
        assert kl[-1] <= kl[1] + 1e-6

    def test_exit_early(self, two_class_sines):
        Xtr, ytr, *_ = two_class_sines
        opts = mt.MPSOptions(nsweeps=10, chi_max=12, d=4, verbosity=-1,
                             exit_early=True, dtype="float64")
        _, info, _ = mt.fit_mps(Xtr, ytr, opts=opts)
        # should bail before 10 sweeps once train acc hits 1
        assert len(info["train_acc"]) < 12

    def test_exit_early_without_logging(self, two_class_sines, capsys):
        # exit_early must work even with stat logging off (the reference
        # checks train_acc every sweep unconditionally,
        # RealRealHighDimension.jl:847-849)
        Xtr, ytr, *_ = two_class_sines
        opts = mt.MPSOptions(nsweeps=10, chi_max=12, d=4, verbosity=1,
                             log_level=-1, exit_early=True, dtype="float64")
        mt.fit_mps(Xtr, ytr, opts=opts)
        out = capsys.readouterr().out
        assert "Early exit" in out
        # exited well before sweep 10 on this trivially separable problem
        assert "Finished sweep 10" not in out

    def test_track_cost(self, two_class_sines):
        Xtr, ytr, *_ = two_class_sines
        T = Xtr.shape[1]
        opts = mt.MPSOptions(nsweeps=3, chi_max=10, d=4, verbosity=-1,
                             log_level=-1, track_cost=True, dtype="float64")
        _, info, _ = mt.fit_mps(Xtr, ytr, opts=opts)
        costs = info["bond_costs"]
        assert len(costs) == 3
        assert all(c.shape == (2 * (T - 1),) for c in costs)
        assert all(np.isfinite(c).all() for c in costs)
        # the per-bond KLD loss decreases across sweeps
        assert costs[-1].mean() < costs[0].mean()

    def test_track_cost_warm_path(self, two_class_sines):
        # track_cost forces the XLA bond path even under the Pallas-eligible
        # warm config and still returns a full trace
        Xtr, ytr, *_ = two_class_sines
        T = Xtr.shape[1]
        opts = mt.MPSOptions(nsweeps=2, chi_max=10, d=4, verbosity=-1,
                             log_level=-1, track_cost=True, dtype="float32",
                             svd_alg="randomized_warm")
        _, info, _ = mt.fit_mps(Xtr, ytr, opts=opts)
        assert len(info["bond_costs"]) == 2
        assert info["bond_costs"][0].shape == (2 * (T - 1),)

    def test_multiclass(self):
        rng = np.random.default_rng(5)
        T, n = 30, 30
        t = np.linspace(0, 2 * np.pi, T)
        Xs, ys = [], []
        for c, f in enumerate([1.0, 3.0, 7.0]):
            ph = rng.uniform(0, 2 * np.pi, (n, 1))
            Xs.append(np.sin(f * t[None] + ph) + 0.05 * rng.standard_normal((n, T)))
            ys.append(np.full(n, c))
        X, y = np.concatenate(Xs), np.concatenate(ys)
        perm = rng.permutation(len(y))
        X, y = X[perm], y[perm]
        opts = mt.MPSOptions(nsweeps=8, chi_max=20, d=5, eta=0.05,
                             verbosity=-1, dtype="float64")
        trained, info, _ = mt.fit_mps(X[:60], y[:60], X[60:], y[60:], opts)
        assert trained.mps.num_classes == 3
        assert info["train_acc"][-1] == 1.0
        assert np.mean(mt.classify(trained, X[60:]) == y[60:]) >= 0.75

    def test_nonconsecutive_labels(self, two_class_sines):
        Xtr, ytr, Xte, yte = two_class_sines
        ytr2 = np.where(ytr == 0, -3, 7)
        yte2 = np.where(yte == 0, -3, 7)
        opts = mt.MPSOptions(nsweeps=3, chi_max=10, d=4, verbosity=-1,
                             dtype="float64")
        trained, _, _ = mt.fit_mps(Xtr, ytr2, opts=opts)
        preds = mt.classify(trained, Xte)
        assert set(np.unique(preds)) <= {-3, 7}
        assert np.mean(preds == yte2) >= 0.8

    def test_complex_encoding_training(self, two_class_sines):
        Xtr, ytr, Xte, yte = two_class_sines
        opts = mt.MPSOptions(nsweeps=8, chi_max=16, d=6, eta=0.05,
                             encoding="Fourier", verbosity=-1,
                             dtype="complex128")
        trained, info, _ = mt.fit_mps(Xtr, ytr, opts=opts)
        assert np.dtype(np.asarray(trained.mps.cores).dtype).kind == "c"
        assert np.mean(mt.classify(trained, Xte) == yte) >= 0.9

    def test_train_classes_separately(self, two_class_sines):
        Xtr, ytr, Xte, yte = two_class_sines
        opts = mt.MPSOptions(nsweeps=4, chi_max=12, d=4, verbosity=-1,
                             train_classes_separately=True, dtype="float64")
        trained, _, _ = mt.fit_mps(Xtr, ytr, opts=opts)
        assert np.mean(mt.classify(trained, Xte) == yte) >= 0.85

    @pytest.mark.parametrize("lg,bb,ui,eta,thresh", [
        ("Mixed", "TSGO", 1, 0.05, 0.95),
        ("KLD", "CGD", 3, 0.05, 0.95),
        ("MSE", "CGD", 5, 0.1, 0.7),
    ])
    def test_loss_optimiser_variants(self, lg, bb, ui, eta, thresh):
        # Mixed loss (reference loss_functions.jl:622-668) and the CGD
        # optimiser (role of the reference's Optim/OptimKit solvers) on a
        # short, well-separated problem
        rng = np.random.default_rng(42)
        T, n_per = 20, 40
        t = np.linspace(0, 2 * np.pi, T)

        def make(f, n):
            return np.sin(f * t[None] + rng.uniform(0, 2 * np.pi, (n, 1))) \
                + 0.05 * rng.standard_normal((n, T))

        X = np.concatenate([make(1.0, n_per), make(5.0, n_per)])
        y = np.repeat([0, 1], n_per)
        perm = rng.permutation(2 * n_per)
        X, y = X[perm], y[perm]
        opts = mt.MPSOptions(nsweeps=5, chi_max=12, d=4, loss_grad=lg,
                             bbopt=bb, eta=eta, update_iters=ui,
                             verbosity=-1, dtype="float64", log_level=0)
        tr, _, _ = mt.fit_mps(X[:48], y[:48], opts=opts)
        assert np.mean(mt.classify(tr, X[48:]) == y[48:]) >= thresh

    def test_optim_alias(self):
        # reference :Optim/:OptimKit map to CGD-style solvers
        assert mt.MPSOptions(bbopt="Optim").bbopt == "CGD"
        assert mt.MPSOptions(loss_grad="Mixed").loss_grad == "MIXED"

    def test_mps_stays_normalized(self, two_class_sines):
        Xtr, ytr, *_ = two_class_sines
        opts = mt.MPSOptions(nsweeps=2, chi_max=10, d=3, verbosity=-1,
                             dtype="float64")
        trained, _, _ = mt.fit_mps(Xtr, ytr, opts=opts)
        assert float(trained.mps.norm()) == pytest.approx(1.0, abs=1e-10)
        # canonical: every non-center core left-orthogonal on nonzero block
        cores = np.asarray(trained.mps.cores)
        dims = trained.mps.bond_dims()
        for t in range(trained.mps.T - 1):
            A = cores[t][:dims[t], :, :dims[t + 1]]
            G = np.einsum("aib,aic->bc", A, A)
            np.testing.assert_allclose(G, np.eye(dims[t + 1]), atol=1e-8)

    def test_chi_max_respected(self, ecg200):
        Xtr, ytr, *_ = ecg200
        opts = mt.MPSOptions(nsweeps=2, chi_max=7, d=4, verbosity=-1,
                             dtype="float64")
        trained, _, _ = mt.fit_mps(Xtr, ytr, opts=opts)
        assert trained.mps.bond_dims().max() <= 7


class TestSummary:
    def test_training_summary(self, two_class_sines):
        Xtr, ytr, Xte, yte = two_class_sines
        opts = mt.MPSOptions(nsweeps=3, chi_max=10, d=4, verbosity=-1,
                             dtype="float64")
        trained, info, ts = mt.fit_mps(Xtr, ytr, Xte, yte, opts)
        stats = mt.get_training_summary(trained, ts)
        assert 0.8 <= stats["test_acc"] <= 1.0
        assert stats["confmat"].sum() == len(yte)
        # overlap matrix symmetric with unit diagonal
        ov = stats["overlapmat"]
        np.testing.assert_allclose(np.diag(ov), 1.0, atol=1e-8)
        np.testing.assert_allclose(ov, ov.T, atol=1e-10)
        mt.sweep_summary(info)

    def test_classify_overlap_long_series_no_underflow(self):
        """Regression: per-class overlap magnitudes scale like exp(-O(T)) and
        underflow true-scale float32/float64 at large T; predictions must be
        made in the log domain."""
        from mpstime_tpu.models.mps import expand_label_index, random_mps
        from mpstime_tpu.summary import classify_overlap

        T, d, C = 1200, 3, 2
        mps = random_mps(0, T, d, C, 4, 6, np.float64).normalize()
        Ws = expand_label_index(mps)
        rng = np.random.default_rng(0)
        phis = rng.uniform(-0.6, 0.6, (8, T, d))
        phis /= np.linalg.norm(phis, axis=-1, keepdims=True)
        preds, log_ovl = classify_overlap(Ws, jnp.asarray(phis))
        # log-domain overlaps are finite and informative even where the
        # true-scale magnitude exp(log_ovl) has underflowed to 0
        assert np.all(np.isfinite(log_ovl))
        assert np.all(log_ovl < np.log(np.finfo(np.float64).tiny))
        assert log_ovl.std() > 0
        # predictions follow the per-sample argmax of the log-overlaps
        np.testing.assert_array_equal(preds, np.argmax(log_ovl, axis=1))
        # both classes appear for a symmetric random MPS over random states
        assert len(np.unique(preds)) == C

    def test_kl_div(self, two_class_sines):
        Xtr, ytr, Xte, yte = two_class_sines
        opts = mt.MPSOptions(nsweeps=3, chi_max=10, d=4, verbosity=-1,
                             dtype="float64")
        trained, info, ts = mt.fit_mps(Xtr, ytr, Xte, yte, opts)
        kd = mt.KL_div(trained, ts)
        assert kd == pytest.approx(info["test_KL_div"][-1], rel=1e-6)


class TestWarmSplitTraining:
    """svd_alg='randomized_warm': eigh-free splits warm-started across sweeps
    (the TPU default at chi_max >= 32 for non-Fourier encodings)."""

    def test_warm_trains_to_full_accuracy(self, ecg200):
        Xtr, ytr, Xte, yte = ecg200
        opts = mt.MPSOptions(nsweeps=8, chi_max=32, d=5, verbosity=-1,
                             log_level=-1, dtype="float32",
                             svd_alg="randomized_warm")
        trained, _, _ = mt.fit_mps(Xtr, ytr, Xte, yte, opts)
        assert np.mean(mt.classify(trained, Xtr) == ytr) == 1.0
        assert np.mean(mt.classify(trained, Xte) == yte) >= 0.84

    def test_warm_per_sweep_path_matches_fused(self, ecg200):
        # the logging path (one full_sweep_warm per sweep, threading the
        # subspace caches on the host) must produce the same model as the
        # fused full_sweeps path
        Xtr, ytr, Xte, yte = ecg200
        kw = dict(nsweeps=3, chi_max=16, d=4, verbosity=-1, dtype="float32",
                  svd_alg="randomized_warm")
        t_fused, _, _ = mt.fit_mps(Xtr, ytr, opts=mt.MPSOptions(
            log_level=-1, **kw))
        t_logged, _, _ = mt.fit_mps(Xtr, ytr, opts=mt.MPSOptions(
            log_level=3, **kw))
        np.testing.assert_allclose(np.asarray(t_fused.mps.cores),
                                   np.asarray(t_logged.mps.cores),
                                   rtol=1e-4, atol=1e-5)
        preds_a = mt.classify(t_fused, Xte)
        preds_b = mt.classify(t_logged, Xte)
        assert np.mean(preds_a == preds_b) == 1.0

    def test_warm_ritz_trains_and_threads_caches(self, ecg200):
        # svd_alg="randomized_warm_ritz" (warm subspace + per-bond
        # Rayleigh-Ritz rotation, the large-chi complex quality route):
        # trains through the standard warm machinery — fused path, logged
        # per-sweep path (cache threading on the host), and the frozen
        # refresh cadence — with the same model from fused and logged runs.
        Xtr, ytr, Xte, yte = ecg200
        kw = dict(nsweeps=3, chi_max=16, d=4, verbosity=-1, dtype="float32",
                  svd_alg="randomized_warm_ritz")
        t_fused, _, _ = mt.fit_mps(Xtr, ytr, opts=mt.MPSOptions(
            log_level=-1, **kw))
        t_logged, _, _ = mt.fit_mps(Xtr, ytr, opts=mt.MPSOptions(
            log_level=3, **kw))
        np.testing.assert_allclose(np.asarray(t_fused.mps.cores),
                                   np.asarray(t_logged.mps.cores),
                                   rtol=1e-4, atol=1e-5)
        assert np.mean(mt.classify(t_fused, Xtr) == ytr) >= 0.95
        # frozen-cadence sweeps split against the cached rotated basis —
        # functional check only: freezing the subspace costs accuracy at
        # this tiny config (measured 0.73 vs 0.99 refreshed; the same
        # cadence trade as docs/complex_split_oracle.md section 6)
        t_k2, _, _ = mt.fit_mps(Xtr, ytr, opts=mt.MPSOptions(
            log_level=-1, subspace_refresh_every=2, **kw))
        assert np.mean(mt.classify(t_k2, Xtr) == ytr) >= 0.6

    def test_warm_ritz_complex_training(self, ecg200):
        # the route's target use: complex encodings where the eigh-free
        # warm ordering is noisy (docs/complex_split_oracle.md section 5).
        # Sanity floor only: at this deliberately tiny config (chi=16, d=4,
        # 4 sweeps — half of them on the tracker under the shipped
        # ritz_exact_sweeps=2) the measured train acc is 0.69 at ALL of
        # init_rng 1234/777/2025 (0.71 on the all-eigh res=-1 route), so
        # the 0.65 floor's margin is seed-robust; real quality bands are
        # pinned at the route's target cell by test_complex_ritz_chi64_band.
        Xtr, ytr, Xte, yte = ecg200
        opts = mt.MPSOptions(encoding="fourier", chi_max=16, d=4, nsweeps=4,
                             svd_alg="randomized_warm_ritz", verbosity=-1,
                             dtype="complex128", init_rng=1234)
        trained, _, _ = mt.fit_mps(Xtr, ytr, opts=opts)
        assert np.mean(mt.classify(trained, Xtr) == ytr) >= 0.65

    @pytest.mark.parametrize("enc,dt,floor_tr,floor_te", [
        ("legendre", "float32", 1.0, 0.80),
        ("fourier", "complex64", 0.62, 0.55),
    ])
    def test_orth_ns_training_band(self, ecg200, enc, dt, floor_tr,
                                   floor_te):
        # orth_alg="ns" (the accelerator default): Newton-Schulz subspace
        # iteration replacing the per-bond QR.  Measured f32 bands vs the
        # QR route (ECG200 chi=25, 8 sweeps): legendre 1.00/0.87 train/test
        # (QR 1.00/0.84), fourier 0.73/0.64 (QR 0.72/0.66) — assert floors
        # a few points under so a real regression fails loudly.
        Xtr, ytr, Xte, yte = ecg200
        opts = mt.MPSOptions(nsweeps=8, chi_max=25, d=5, verbosity=-1,
                             log_level=-1, svd_alg="randomized_warm",
                             dtype=dt, encoding=enc, orth_alg="ns")
        trained, _, _ = mt.fit_mps(Xtr, ytr, opts=opts)
        assert np.mean(mt.classify(trained, Xtr) == ytr) >= floor_tr
        assert np.mean(mt.classify(trained, Xte) == yte) >= floor_te

    def test_auto_alg_resolution(self):
        import jax
        o = mt.MPSOptions(chi_max=64)
        assert o.resolved_svd_alg() == (
            "gram_eigh" if jax.default_backend() == "cpu"
            else "randomized_warm")
        # orth auto: matmul-only NS on accelerators, QR on CPU
        assert mt.MPSOptions().resolved_orth_alg() == (
            "qr" if jax.default_backend() == "cpu" else "ns")
        assert mt.MPSOptions(orth_alg="ns").resolved_orth_alg() == "ns"
        assert mt.MPSOptions(svd_alg="randomized").resolved_svd_alg() == \
            "randomized"
        # auto power iters: 1 for real encodings, 3 for complex ones
        # (docs/complex_split_oracle.md)
        assert mt.MPSOptions().resolved_power_iters() == 1
        assert mt.MPSOptions(encoding="fourier").resolved_power_iters() == 3
        assert mt.MPSOptions(encoding="fourier",
                             subspace_power_iters=1).resolved_power_iters() \
            == 1

    def test_auto_alg_complex_ritz_gate(self, monkeypatch):
        # Above COMPLEX_RITZ_CHI_GATE the accelerator auto default for
        # complex encodings switches to the Ritz-rotated warm split (the
        # chi=64 probe measured the fused q=3 route out of the exact band
        # there — docs/complex_split_oracle.md section 5), with q=1 and
        # qr orth on EVERY backend (the ritz exception in
        # resolved_orth_alg: on-chip f32 the tracked schedule's
        # NS-refreshed basis drifts — train acc 0.59-0.75 ns vs 0.90-0.95
        # qr over 2 seeds, scripts/ritz_tpu_probe.py ritz_track* cells).
        import jax
        from mpstime_tpu.options import COMPLEX_RITZ_CHI_GATE
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        o = mt.MPSOptions(encoding="fourier", chi_max=64)
        assert o.resolved_svd_alg() == "randomized_warm_ritz"
        assert o.resolved_power_iters() == 1
        assert o.resolved_orth_alg() == "qr"
        # at/below the gate: the fused warm q=3 route (beats exact there)
        o2 = mt.MPSOptions(encoding="fourier", chi_max=COMPLEX_RITZ_CHI_GATE)
        assert o2.resolved_svd_alg() == "randomized_warm"
        assert o2.resolved_power_iters() == 3
        assert o2.resolved_orth_alg() == "ns"
        # real encodings never gate
        assert mt.MPSOptions(chi_max=256).resolved_svd_alg() == \
            "randomized_warm"
        # explicit ritz anywhere resolves auto q to 1 and auto orth to qr
        # (backend-independent — still monkeypatched to "tpu" here)
        o4 = mt.MPSOptions(encoding="sahand", chi_max=25,
                           svd_alg="randomized_warm_ritz")
        assert o4.resolved_orth_alg() == "qr"
        assert o4.resolved_power_iters() == 1
        # explicit knob values always win
        o5 = mt.MPSOptions(encoding="fourier", chi_max=64, orth_alg="ns",
                           subspace_power_iters=3)
        assert o5.resolved_orth_alg() == "ns"
        assert o5.resolved_power_iters() == 3

    @pytest.mark.slow
    def test_complex_split_oracle_band(self, ecg200):
        # The r4 exact-split oracle (docs/complex_split_oracle.md) pins
        # fourier chi=25 f64: exact svd/gram_eigh 0.68-0.74 test acc, warm
        # q=1 0.62-0.64, warm q=3 (the shipped complex default) 0.81 on all
        # three probed seeds.  Assert the shipped warm path stays at or
        # above the exact-split ceiling, so a regression in the q=3 power
        # iteration fails loudly instead of silently costing quality.
        # Match: reference decomposeBT exact SVD,
        # RealRealHighDimension.jl:166-187.
        Xtr, ytr, Xte, yte = ecg200
        opts = mt.MPSOptions(encoding="fourier", chi_max=25, d=5,
                             nsweeps=10, svd_alg="randomized_warm",
                             verbosity=-1, dtype="complex128")
        assert opts.resolved_power_iters() == 3
        trained, info, ts = mt.fit_mps(Xtr, ytr, Xte, yte, opts)
        assert info["test_acc"][-1] >= 0.74

    @pytest.mark.slow
    @pytest.mark.parametrize("orth,floor", [
        ("qr", 0.74),   # probe band 0.78-0.85 (0.80 at this init_rng)
        ("ns", 0.76),   # the shipped accelerator orth: 0.82-0.88 (0.83 here)
    ])
    def test_complex_ritz_chi64_band(self, ecg200, orth, floor):
        # The large-chi complex cell the gate exists for: fourier chi=64,
        # where the r4 chi=64 probe (docs/complex_split_oracle.md section 5)
        # measured exact SVD at 0.76-0.82 test acc, the fused warm q=3
        # route OUT of band at 0.61-0.69, and the ritz route in/above band
        # on both orth chains (all-eigh: qr 0.78-0.85, ns 0.82-0.88 over
        # 3 seeds) — qr is what auto resolves to on every backend (the
        # on-chip f32 tracker drifts under ns, resolved_orth_alg); ns
        # stays covered here as the experiment knob.  Runs at the SHIPPED
        # tracked default (ritz_exact_sweeps=2,
        # orthogonal-iteration tracker after 2 exact sweeps — oracle band
        # 0.79-0.85 ns, section 7), so a regression in the Ritz rotation
        # OR the tracker fails loudly.
        Xtr, ytr, Xte, yte = ecg200
        opts = mt.MPSOptions(encoding="fourier", chi_max=64, d=5,
                             nsweeps=10, svd_alg="randomized_warm_ritz",
                             orth_alg=orth, verbosity=-1, dtype="complex128")
        assert opts.resolved_power_iters() == 1
        trained, info, ts = mt.fit_mps(Xtr, ytr, Xte, yte, opts)
        assert info["test_acc"][-1] >= floor

    def test_ritz_exact_to_track_schedule(self, ecg200):
        # ritz_exact_sweeps plumbing: n >= nsweeps takes the cond-wrapped
        # eigh branch on every sweep and must be BIT-identical to the
        # legacy -1 (no cond) route; a tracked run (exact sweeps 0-1 then
        # the eigh-free orthogonal-iteration tracker, ops/decomp._ritz_rot_track)
        # trains to a sane model.  Quality parity of the tracker at the
        # gated chi=64 cell is pinned by the oracle probe (ritz_track
        # 0.79-0.85 vs exact 0.76-0.82, docs/complex_split_oracle.md
        # section 7) and test_complex_ritz_chi64_band.
        Xtr, ytr, _, _ = ecg200
        Xtr, ytr = Xtr[:60], ytr[:60]
        base = dict(encoding="fourier", chi_max=16, d=3, nsweeps=4,
                    svd_alg="randomized_warm_ritz", verbosity=-1,
                    dtype="complex128")
        legacy, _, _ = mt.fit_mps(
            Xtr, ytr, opts=mt.MPSOptions(ritz_exact_sweeps=-1, **base))
        allex, _, _ = mt.fit_mps(
            Xtr, ytr, opts=mt.MPSOptions(ritz_exact_sweeps=99, **base))
        assert jnp.array_equal(legacy.mps.center, allex.mps.center)
        tracked, _, _ = mt.fit_mps(
            Xtr, ytr, opts=mt.MPSOptions(ritz_exact_sweeps=2, **base))
        acc = float(np.mean(mt.classify(tracked, Xtr) == ytr))
        assert np.isfinite(np.asarray(tracked.mps.center.real)).all()
        assert acc >= 0.6, acc

    def test_padded_warm_trial_quality(self, ecg200):
        # The accelerator production config for a padded hyperopt trial
        # (svd_alg="randomized_warm", runtime chi cap through pad_to) must
        # train well on the auto-resolved orth chain.  Regression for the
        # r4 TPU-lane failure: auto used to resolve padded runs to NS,
        # whose subspace iteration re-inflates the cap's structurally dead
        # directions into basis junk (train acc 0.69 vs 0.98 on qr; see
        # options.resolved_orth_alg).
        Xtr, ytr, _, _ = ecg200
        opts = mt.MPSOptions(nsweeps=4, chi_max=17, d=5, verbosity=-1,
                             log_level=-1, dtype="float32", pad_to=(40, 8),
                             svd_alg="randomized_warm")
        assert opts.resolved_orth_alg() == "qr"
        trained, _, _ = mt.fit_mps(Xtr, ytr, opts=opts)
        assert int(np.max(trained.mps.bond_dims())) <= 17
        acc = float(np.mean(mt.classify(trained, Xtr) == ytr))
        assert acc >= 0.9, acc


class TestBatchedFit:
    """fit_mps_batch: F independent models as one vmapped program
    (training/sweep.batched_full_sweeps — the XLA bond path with the model
    axis riding every op)."""

    def test_batched_matches_sequential_nondegenerate(self):
        # On a generic (non-degenerate) start the vmapped program matches
        # per-model sequential sweeps to f64 roundoff; on the production
        # padded init the trajectories diverge benignly (degenerate
        # early-sweep spectra — the documented sharded-vs-single class).
        import jax
        import jax.numpy as jnp

        from mpstime_tpu.training.sweep import batched_full_sweeps, full_sweeps

        rng = np.random.default_rng(5)
        T, chi, d, C, N, F = 16, 8, 3, 2, 24, 3
        cores = jnp.asarray(rng.standard_normal((T, chi, d, chi)))
        center = jnp.asarray(rng.standard_normal((chi, d, chi, C)))
        w = jnp.full((N,), 1.0 / N)
        kw = dict(nsweeps=2, loss="KLD", bbopt="TSGO", update_iters=1,
                  rescale=(False, True), svd_alg="randomized_warm",
                  power_iters=1, orth="ns")
        ph_f = jnp.stack([jnp.asarray(rng.uniform(-0.8, 0.8, (T, N, d)))
                          for _ in range(F)])
        y_f = jnp.stack([jnp.asarray(np.eye(C)[rng.integers(0, C, N)])
                         for _ in range(F)])
        w_f = jnp.stack([w] * F)
        etas = jnp.asarray([0.05, 0.08, 0.03])
        bc, bce = batched_full_sweeps(
            jnp.stack([cores] * F), jnp.stack([center] * F), ph_f, y_f,
            w_f, etas, jnp.float64(1e-10), **kw)
        for f in range(F):
            sc, sce = full_sweeps(cores, center, ph_f[f], y_f[f], w_f[f],
                                  etas[f], jnp.float64(1e-10),
                                  platform="xla", **kw)
            np.testing.assert_allclose(np.asarray(bc[f]), np.asarray(sc),
                                       rtol=1e-8, atol=1e-9)
            np.testing.assert_allclose(np.asarray(bce[f]), np.asarray(sce),
                                       rtol=1e-8, atol=1e-9)

    def test_fold_batch_quality(self, ecg200):
        Xtr, ytr, Xte, yte = ecg200
        jobs = [(Xtr[i:i + 80], ytr[i:i + 80]) for i in (0, 10, 20)]
        opts = mt.MPSOptions(nsweeps=4, chi_max=15, d=4, verbosity=-1,
                             log_level=-1, dtype="float32")
        models = mt.fit_mps_batch(jobs, opts=opts)
        assert len(models) == 3
        for m in models:
            acc = np.mean(mt.classify(m, Xte) == yte)
            assert acc > 0.7, acc

    def test_trial_population_rank_caps(self, ecg200):
        # per-job eta + runtime chi cap under a shared padded program —
        # the hyperopt trial axis as one device call
        Xtr, ytr, *_ = ecg200
        opts = mt.MPSOptions(nsweeps=3, chi_max=15, d=4, verbosity=-1,
                             log_level=-1, dtype="float32")
        ol = [opts.replace(eta=e, chi_max=c, pad_to=(20, 4))
              for e, c in ((0.02, 10), (0.05, 15), (0.1, 20))]
        models = mt.fit_mps_batch([(Xtr, ytr)] * 3, opts_list=ol)
        for m, o in zip(models, ol):
            assert int(np.max(m.mps.bond_dims())) <= o.chi_max
            acc = np.mean(mt.classify(m, Xtr) == ytr)
            assert acc > 0.7, acc

    def test_mismatched_static_opts_raise(self, ecg200):
        Xtr, ytr, *_ = ecg200
        opts = mt.MPSOptions(nsweeps=2, chi_max=10, d=4, verbosity=-1)
        with pytest.raises(ValueError, match="may differ only in"):
            mt.fit_mps_batch([(Xtr, ytr)] * 2,
                             opts_list=[opts, opts.replace(d=5)])

    def test_batch_partitions_mixed_resolved_algs(self, ecg200,
                                                  monkeypatch):
        # svd_alg="auto" resolves per-job through the complex chi gate
        # (options.COMPLEX_RITZ_CHI_GATE on accelerators), so a trial
        # population straddling it mixes resolved algs — fit_mps_batch must
        # partition into one vmapped program per alg, preserving job order,
        # instead of routing every job through job 0's resolution.  The
        # CPU auto path never gates, so stub a chi-keyed resolver.
        from mpstime_tpu.options import MPSOptions
        orig = MPSOptions.resolved_svd_alg
        calls = []

        def fake(self):
            alg = ("randomized_warm" if self.chi_max <= 10
                   else "randomized_warm_ritz") if self.svd_alg == "auto" \
                else orig(self)
            calls.append(alg)
            return alg
        monkeypatch.setattr(MPSOptions, "resolved_svd_alg", fake)
        Xtr, ytr, *_ = ecg200
        X, y = Xtr[:60], ytr[:60]
        opts = mt.MPSOptions(nsweeps=3, chi_max=10, d=4, verbosity=-1,
                             log_level=-1, encoding="fourier",
                             dtype="complex64", svd_alg="auto",
                             pad_to=(14, 4))
        ol = [opts, opts.replace(chi_max=14), opts]
        ms = mt.fit_mps_batch([(X, y)] * 3, opts_list=ol)
        assert len(ms) == 3
        assert "randomized_warm" in calls and \
            "randomized_warm_ritz" in calls
        for m, o in zip(ms, ol):
            # order preserved: each result honors its own job's chi cap
            assert int(np.max(m.mps.bond_dims())) <= o.chi_max
            assert m.opts is o
            # smoke floor only (the warm q=3 c64 3-sweep cell is a weak
            # learner at this tiny config: 0.48 batch == single; the ritz
            # jobs measure 0.75-0.82) — route correctness is pinned by the
            # calls/bond-cap/opts-identity asserts above
            acc = np.mean(mt.classify(m, X) == y)
            assert acc > 0.4, acc

    def test_complex_encoding_batch(self, ecg200):
        Xtr, ytr, *_ = ecg200
        X, y = Xtr[:60], ytr[:60]
        opts = mt.MPSOptions(nsweeps=3, chi_max=12, d=4, verbosity=-1,
                             log_level=-1, encoding="Fourier",
                             dtype="complex64")
        ms = mt.fit_mps_batch([(X[:50], y[:50]), (X[10:], y[10:])],
                              opts=opts)
        for m in ms:
            assert np.asarray(m.mps.center).dtype == np.complex64
            acc = np.mean(mt.classify(m, X) == y)
            # fourier at d=4/chi=12/3 sweeps is a weak learner (cf. the
            # complex-kernel e2e floors); the floor catches route breakage
            assert acc > 0.6, acc


class TestPallasRouteNotice:
    """The fused-kernel eligibility cliff must not be silent
    (docs/tpu_performance.md eligibility table)."""

    def test_default_hot_path_is_quiet(self):
        from mpstime_tpu.training.sweep import pallas_route_notice
        assert pallas_route_notice(
            np.float32, "KLD", "TSGO", 1, (False, True), "randomized_warm",
            "tpu", C=2, chi=64, d=5, N=100) is None

    def test_mse_gd_is_fused_and_quiet(self):
        # r5 widening: real-path MSE/GD run the fused kernels
        from mpstime_tpu.training.sweep import pallas_route_notice
        for loss, bb in (("MSE", "TSGO"), ("KLD", "GD"), ("MSE", "GD")):
            assert pallas_route_notice(
                np.float32, loss, bb, 1, (False, True), "randomized_warm",
                "tpu", C=2, chi=64, d=5, N=100) is None

    def test_cpu_has_no_cliff_to_report(self):
        from mpstime_tpu.training.sweep import pallas_route_notice
        assert pallas_route_notice(
            np.float64, "MSE", "GD", 3, (True, False), "svd",
            "cpu", C=2, chi=64, d=5, N=100) is None

    @pytest.mark.parametrize("kw,frag", [
        (dict(svd_alg="randomized_warm_ritz"), "randomized_warm_ritz"),
        (dict(loss="MIXED"), "loss=MIXED"),
        (dict(dtype=np.complex64, loss="MSE"), "pair kernels"),
        (dict(update_iters=2), "update_iters=2"),
        (dict(rescale=(True, False)), "rescale"),
        (dict(chi=512), "footprint"),
        (dict(track_cost=True), "track_cost"),
    ])
    def test_demotions_name_the_reason(self, kw, frag):
        from mpstime_tpu.training.sweep import pallas_route_notice
        base = dict(dtype=np.float32, loss="KLD", bbopt="TSGO",
                    update_iters=1, rescale=(False, True),
                    svd_alg="randomized_warm", platform="tpu",
                    C=2, chi=64, d=5, N=100, track_cost=False)
        base.update(kw)
        notice = pallas_route_notice(
            base.pop("dtype"), base.pop("loss"), base.pop("bbopt"),
            base.pop("update_iters"), base.pop("rescale"),
            base.pop("svd_alg"), base.pop("platform"), **base)
        assert notice is not None and frag in notice


class TestTrackedRitzRouteNotice:
    def test_complex_ritz_jacobi_is_quiet(self):
        # the shipped complex quality route: tracked sweeps fuse (K12cr)
        from mpstime_tpu.training.sweep import pallas_route_notice
        assert pallas_route_notice(
            np.complex64, "KLD", "TSGO", 1, (False, True),
            "randomized_warm_ritz", "tpu", C=2, chi=64, d=5, N=100,
            ritz_track_rot="jacobi") is None

    def test_complex_ritz_track_names_the_tracker(self):
        from mpstime_tpu.training.sweep import pallas_route_notice
        notice = pallas_route_notice(
            np.complex64, "KLD", "TSGO", 1, (False, True),
            "randomized_warm_ritz", "tpu", C=2, chi=64, d=5, N=100,
            ritz_track_rot="track")
        assert notice is not None and "jacobi" in notice
