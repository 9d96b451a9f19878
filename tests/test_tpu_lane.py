"""Real-TPU hardware lane (run with ``pytest -m tpu``; skipped otherwise).

A ~2-4 minute (warm-cache) subset pinning the device-only paths the
CPU-pinned suite cannot reach: the Pallas bond kernels in COMPILED (not
interpreter) mode, f32 accuracy floors, the complex-encoding path with the
real-imag transfer shim, the padded-trial runtime rank cap, and the fused
imputation kernels.  Invocation documented in CLAUDE.md; run once per
round on the chip.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu_check():
    import jax
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip(f"no TPU available (backend {jax.default_backend()})")


@pytest.fixture(scope="module")
def ecg(tpu_check, ecg200):
    return ecg200


def test_legendre_f32_pallas_train_classify(ecg):
    """Production config (f32 legendre, randomized_warm => compiled Pallas
    kernels) trains to the r2-recorded accuracy floor on real hardware."""
    import mpstime_tpu as mt
    from mpstime_tpu.training.sweep import _pallas_eligible

    Xtr, ytr, Xte, yte = ecg
    opts = mt.MPSOptions(nsweeps=10, chi_max=32, d=5, verbosity=-1,
                         log_level=-1)
    assert opts.resolved_svd_alg() == "randomized_warm"
    assert _pallas_eligible(np.float32, "KLD", "TSGO", 1, (False, True),
                            "randomized_warm")
    trained, _, _ = mt.fit_mps(Xtr, ytr, opts=opts)
    acc = float(np.mean(mt.classify(trained, Xte) == yte))
    # recorded on v5e: 0.94 at this config (docs/tpu_performance.md)
    assert acc >= 0.85, acc


def test_pallas_sweep_matches_xla_sweep_compiled(ecg):
    """COMPILED Pallas kernels vs the XLA bond path, same inputs, compared
    as TRAINING QUALITY (train accuracy + KLD after 5 sweeps).

    Tighter comparisons are impossible on hardware by construction:
    compiled Mosaic and XLA f32 arithmetic differ enough that a
    truncation-edge rank decision flips within the first sweep, and from
    that bond on the two runs train against different environments — the
    trajectories diverge chaotically (measured: log-overlaps apart by O(1)
    after one sweep) while both remain equally healthy models.  The exact
    per-bond contract is pinned on CPU where arithmetic is bit-comparable
    (test_parallel.py::test_single_bond_dp_matches_fused,
    test_pallas_bond.py)."""
    import jax
    import jax.numpy as jnp
    import mpstime_tpu as mt
    from mpstime_tpu.encodings import encode_dataset
    from mpstime_tpu.models.mps import random_mps
    from mpstime_tpu.training import sweep as sweep_mod
    from mpstime_tpu.utils.preprocessing import transform_data

    Xtr, ytr, _, _ = ecg
    chi, d = 32, 5
    opts = mt.MPSOptions(chi_max=chi, d=d, verbosity=-1, dtype="float32",
                         svd_alg="randomized_warm")
    Xs, _, _, _ = transform_data(Xtr, np.zeros((0, Xtr.shape[1])), opts)
    ds = encode_dataset(Xtr, Xs, ytr, opts)
    T, N, C = Xtr.shape[1], Xtr.shape[0], ds.num_classes
    mps = random_mps(opts.init_rng, T, d, C, opts.chi_init, chi, np.float32)
    phis_c = jnp.conj(ds.X_enc).swapaxes(0, 1)
    y1h = jnp.asarray(np.eye(C, dtype=np.float32)[ds.y_idx])
    w = jnp.full((N,), 1.0 / N, jnp.float32)
    kw = dict(loss="KLD", bbopt="TSGO", update_iters=1,
              rescale=(False, True), svd_alg="randomized_warm")

    # NOTE: never jax.clear_caches() on the axon platform (see CLAUDE.md);
    # the two branches get distinct jit cache keys via the static
    # ``platform`` argument instead.
    eta, cut = jnp.float32(0.05), jnp.float32(1e-10)
    c_p, ce_p = sweep_mod.full_sweeps(mps.cores, mps.center, phis_c, y1h, w,
                                      eta, cut, nsweeps=5, platform="tpu",
                                      **kw)
    orig = sweep_mod._pallas_eligible
    sweep_mod._pallas_eligible = lambda *a, **k: False
    try:
        c_x, ce_x = sweep_mod.full_sweeps(mps.cores, mps.center, phis_c,
                                          y1h, w, eta, cut, nsweeps=5,
                                          platform="axon", **kw)
    finally:
        sweep_mod._pallas_eligible = orig

    from mpstime_tpu.models.mps import MPS
    from mpstime_tpu.training.stats import loss_acc_conf

    _, kld_p, acc_p, _ = loss_acc_conf(MPS(c_p, ce_p, T - 1), ds.X_enc,
                                       ds.y_idx)
    _, kld_x, acc_x, _ = loss_acc_conf(MPS(c_x, ce_x, T - 1), ds.X_enc,
                                       ds.y_idx)
    assert np.isfinite(kld_p) and np.isfinite(kld_x)
    assert acc_p >= 0.9 and acc_x >= 0.9, (acc_p, acc_x)
    assert abs(acc_p - acc_x) <= 0.05, (acc_p, acc_x)
    assert abs(kld_p - kld_x) <= 0.3 * max(abs(kld_p), abs(kld_x), 1e-6), \
        (kld_p, kld_x)


def test_fourier_c64_parity_and_roundtrip(ecg, tmp_path):
    """The complex path end-to-end on hardware, pinned to an exact-split
    oracle cell: fourier chi=25 / 10 sweeps (docs/complex_split_oracle.md,
    CPU f64: exact svd/gram_eigh 0.68-0.74, shipped warm q=3 0.81).  In
    c64 the cell is PRECISION-limited, not device-limited — measured CPU
    c64 0.61, chip c64 0.67 (the chip beats the CPU f32 pair path), so
    the q=3 quality guard lives in the default suite's f64 oracle-band
    test (test_training.py::test_complex_split_oracle_band) and the lane
    floor is set against the measured c64 band: it catches chip-specific
    breakage (garbage kernels land near or below the 0.36/0.64 class
    priors), and the cap flags too-good-to-be-true leakage.  Also:
    save/load round-trip via the real-imag transfer shim, and a complex
    imputation MAE floor."""
    import mpstime_tpu as mt

    Xtr, ytr, Xte, yte = ecg
    opts = mt.MPSOptions(nsweeps=10, chi_max=25, d=5, encoding="fourier",
                         verbosity=-1, log_level=-1)
    assert opts.resolved_dtype() == np.complex64
    assert opts.resolved_power_iters() == 3
    trained, _, _ = mt.fit_mps(Xtr, ytr, opts=opts)
    acc = float(np.mean(mt.classify(trained, Xte) == yte))
    assert 0.60 <= acc <= 0.92, acc     # measured c64 band: chip 0.67,
                                        # CPU c64 0.61 (f64 oracle 0.81)

    p = str(tmp_path / "fourier.npz")
    mt.save_mps(p, trained)
    loaded = mt.load_mps(p)
    assert mt.trained_mps_equal(trained, loaded, atol=1e-6)
    acc2 = float(np.mean(mt.classify(loaded, Xte) == yte))
    assert acc2 == acc

    # complex imputation on hardware: MAE floor next to the smoke check
    from mpstime_tpu.imputation.problem import impute_batch
    imp = mt.init_imputation_problem(trained, Xte, yte, verbosity=-1,
                                     test_encoding=False)
    cls = int(np.unique(yte)[0])
    B = min(20, int(np.sum(yte == cls)))
    rng = np.random.default_rng(0)
    _, win = mt.mar(Xte[0], 0.2, rng=rng)
    ts, targets = impute_batch(imp, cls, np.arange(B), win, "median")
    assert np.isfinite(ts).all()
    mae = float(np.mean(np.abs(ts[:, win] - targets[:, win])))
    assert mae < 0.8, mae


def test_fourier_c64_ritz_route_on_chip(ecg):
    """The gated large-chi complex default on real hardware: above
    options.COMPLEX_RITZ_CHI_GATE the auto default is randomized_warm_ritz
    (XLA bond path with a per-bond complex [k, k] eigh inside the sweep
    scan) — this is the one shipped route the fused-kernel lane tests
    never touch, and on-device complex eigh is axon's least-exercised op.
    Short smoke: finite, healthy floor (c64 precision band, cf. the
    chi=25 test's measured 0.61-0.67)."""
    import mpstime_tpu as mt

    from mpstime_tpu.options import COMPLEX_RITZ_CHI_GATE

    Xtr, ytr, Xte, yte = ecg
    opts = mt.MPSOptions(nsweeps=5, chi_max=COMPLEX_RITZ_CHI_GATE + 8,
                         d=5, encoding="fourier", verbosity=-1,
                         log_level=-1)
    assert opts.resolved_svd_alg() == "randomized_warm_ritz"
    assert opts.resolved_power_iters() == 1
    # the ritz route pins qr orth on every backend: on chip the tracked
    # schedule's NS-refreshed basis drifts in f32 (train acc 0.59-0.75 ns
    # vs 0.90-0.95 qr, scripts/ritz_tpu_probe.py ritz_track* cells)
    assert opts.resolved_orth_alg() == "qr"
    trained, _, _ = mt.fit_mps(Xtr, ytr, opts=opts)
    acc = float(np.mean(mt.classify(trained, Xte) == yte))
    assert 0.55 <= acc <= 0.95, acc


def test_complex_xfer_shim_roundtrip(tpu_check):
    import jax.numpy as jnp
    from mpstime_tpu.utils.xfer import to_device, to_host

    rng = np.random.default_rng(0)
    z = (rng.standard_normal((16, 8)) +
         1j * rng.standard_normal((16, 8))).astype(np.complex64)
    dz = to_device(z)
    assert dz.dtype == jnp.complex64
    back = to_host(dz * 2.0)
    np.testing.assert_allclose(back, 2.0 * z, rtol=1e-6)


def test_impute_batch_smoke(ecg):
    import mpstime_tpu as mt
    from mpstime_tpu.imputation.problem import impute_batch

    Xtr, ytr, Xte, yte = ecg
    opts = mt.MPSOptions(nsweeps=3, chi_max=25, d=5, verbosity=-1,
                         log_level=-1, dtype="float32")
    trained, _, _ = mt.fit_mps(Xtr, ytr, opts=opts)
    imp = mt.init_imputation_problem(trained, Xte, yte, verbosity=-1,
                                     test_encoding=False)
    cls = int(np.unique(yte)[0])
    B = min(20, int(np.sum(yte == cls)))
    rng = np.random.default_rng(0)
    _, win = mt.mar(Xte[0], 0.2, rng=rng)
    ts, targets = impute_batch(imp, cls, np.arange(B), win, "median")
    assert np.isfinite(ts).all()
    mae = float(np.mean(np.abs(ts[:, win] - targets[:, win])))
    assert mae < 1.0, mae


def test_padded_trial_rank_cap(ecg):
    """Shape-polymorphic trial on hardware: trained at (40, 8) caps with
    chi_max=17 as a runtime rank cap through the fused kernels."""
    import mpstime_tpu as mt

    Xtr, ytr, _, _ = ecg
    opts = mt.MPSOptions(nsweeps=4, chi_max=17, d=5, verbosity=-1,
                         log_level=-1, dtype="float32", pad_to=(40, 8))
    trained, _, _ = mt.fit_mps(Xtr, ytr, opts=opts)
    assert int(np.max(trained.mps.bond_dims())) <= 17
    acc = float(np.mean(mt.classify(trained, Xtr) == ytr))
    assert acc >= 0.85, acc
