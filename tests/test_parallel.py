"""Data-parallel (multi-device mesh) tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpstime_tpu.models.mps import random_mps
from mpstime_tpu.parallel import make_mesh, replicate, shard_train_arrays
from mpstime_tpu.training.sweep import full_sweep


@pytest.fixture(scope="module")
def tiny_problem():
    T, chi, d, C, N = 8, 6, 3, 2, 32
    mps = random_mps(0, T, d, C, 4, chi, np.float64)
    rng = np.random.default_rng(0)
    phis_c = jnp.asarray(rng.uniform(-0.9, 0.9, (T, N, d)))
    y_idx = rng.integers(0, C, N)
    y_idx.sort()
    y_onehot = jnp.asarray(np.eye(C)[y_idx])
    w = jnp.full((N,), 1.0 / N)
    return mps, phis_c, y_onehot, w


KW = dict(loss="KLD", bbopt="TSGO", update_iters=1, rescale=(False, True),
          svd_alg="gram_eigh")


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_sharded_sweep_matches_single_device(tiny_problem):
    mps, phis_c, y_onehot, w = tiny_problem
    # single-device reference
    c1, ce1 = full_sweep(mps.cores, mps.center, phis_c, y_onehot, w,
                         0.01, 1e-10, **KW)

    mesh = make_mesh(8)
    sp, sy, sw = shard_train_arrays(mesh, phis_c, y_onehot, w)
    rc, rce = replicate(mesh, mps.cores, mps.center)
    c2, ce2 = full_sweep(rc, rce, sp, sy, sw, 0.01, 1e-10, **KW)

    # the sharded-N computation is mathematically identical; FP reduction
    # order differs, so compare with a tolerance
    np.testing.assert_allclose(np.asarray(ce1), np.asarray(ce2), atol=1e-8)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-8)


def test_fit_mps_with_mesh(tiny_problem):
    # end-to-end fit with the sample axis sharded over 8 devices; N=48 is
    # not a multiple of 8 after the class split, exercising the zero-weight
    # padding path too
    import mpstime_tpu as mt
    rng = np.random.default_rng(0)
    T, n = 20, 30   # 30 samples -> pad to 32 on the mesh
    t = np.linspace(0, 2 * np.pi, T)
    X = np.concatenate([np.sin(t[None] + rng.uniform(0, 6, (n // 2, 1))),
                        np.sin(5 * t[None] + rng.uniform(0, 6, (n // 2, 1)))])
    y = np.repeat([0, 1], n // 2)
    opts = mt.MPSOptions(nsweeps=3, chi_max=8, d=3, verbosity=-1,
                         dtype="float64", log_level=0)
    mesh = make_mesh(8)
    trained_m, _, _ = mt.fit_mps(X, y, opts=opts, mesh=mesh)
    trained_s, _, _ = mt.fit_mps(X, y, opts=opts)
    # sharded and single-device training agree up to FP reduction order
    np.testing.assert_allclose(np.asarray(trained_m.mps.center),
                               np.asarray(trained_s.mps.center), atol=1e-8)
    assert np.mean(mt.classify(trained_m, X) == y) >= 0.9


def test_device_farm_matches_sequential_tune(two_class_sines):
    """Fold farming across the 8 virtual devices returns the exact same
    tuning result as the sequential path (jobs are independent and
    deterministic; only placement differs)."""
    import mpstime_tpu as mt

    Xtr, ytr, _, _ = two_class_sines
    opts0 = mt.MPSOptions(verbosity=-5, log_level=-1, nsweeps=2,
                          dtype="float64", sigmoid_transform=True)
    kw = dict(parameters={"chi_max": [6, 10], "d": [3]},
              method=mt.MPSRandomSearch("Exhaustive"),
              objective=mt.MisclassificationRate(), opts0=opts0,
              maxiters=2, verbosity=-1)
    best_seq, cache_seq = mt.tune(Xtr, ytr, 2, **kw)
    best_far, cache_far = mt.tune(Xtr, ytr, 2, devices="all", **kw)
    assert best_seq == best_far
    assert set(cache_seq) == set(cache_far)
    for k in cache_seq:
        np.testing.assert_allclose(cache_seq[k], cache_far[k], rtol=1e-9)


def test_device_farm_places_jobs_on_distinct_devices():
    """jax.default_device pinning is thread-local: concurrent jobs land on
    different devices, not all on device 0."""
    import time

    import jax.numpy as jnp
    from mpstime_tpu.parallel import DeviceFarm

    farm = DeviceFarm("all")

    def job(i):
        x = jnp.full((16, 16), float(i)) @ jnp.eye(16)
        time.sleep(0.05)   # hold the device slot so jobs overlap
        return list(x.devices())[0]

    used = set(farm.map(job, range(8)))
    assert len(used) >= 4, f"jobs ran on only {len(used)} device(s): {used}"


def test_device_farm_error_propagates():
    from mpstime_tpu.parallel import DeviceFarm

    farm = DeviceFarm("all")
    assert len(farm.devices) >= 8

    def boom(i):
        if i == 3:
            raise ValueError("job 3 failed")
        return i * i

    with pytest.raises(ValueError, match="job 3"):
        farm.map(boom, range(8))
    assert farm.map(lambda i: i * i, range(5)) == [0, 1, 4, 9, 16]


def test_evaluate_device_farm(two_class_sines, tmp_path):
    import mpstime_tpu as mt

    Xtr, ytr, _, _ = two_class_sines
    opts0 = mt.MPSOptions(verbosity=-5, log_level=-1, nsweeps=2, chi_max=8,
                          d=3, dtype="float64", sigmoid_transform=True)
    res = mt.evaluate(Xtr, ytr, nfolds=2, tuning_parameters={"d": [3]},
                      objective=mt.MisclassificationRate(), opts0=opts0,
                      n_cvfolds=2, tuning_maxiters=1, verbosity=-1,
                      devices="all", write=True, writedir=str(tmp_path),
                      simname="farm_eval")
    assert len(res) == 2
    assert all(np.isfinite(r["loss"]) for r in res)
    assert [r["fold"] for r in res] == [0, 1]


def test_graft_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out[0].shape == (100, 2)
