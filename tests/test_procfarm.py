"""ProcessFarm: OS-process fold farming (the Distributed.jl addprocs+pmap
analog; reference tuning.jl:22,112, evaluate.jl:270-297, and its own
5-worker-process test setup, test/hyperopt.jl:17-25)."""

import numpy as np
import pytest

import mpstime_tpu as mt
from mpstime_tpu.parallel import ProcessFarm, resolve_process_farm


@pytest.fixture(scope="module")
def farm2():
    """One 2-worker farm shared across the module (spawn + jax import in
    the workers costs a few seconds; CachingPool semantics keep them warm)."""
    farm = ProcessFarm(2)
    yield farm
    farm.close()


def test_map_closure_order_and_reuse(farm2):
    base = np.arange(3.0)
    out = farm2.map(lambda i: float((base * i).sum()), range(5))
    assert out == [0.0, 3.0, 6.0, 9.0, 12.0]
    # workers persist across map calls (function re-broadcast each call)
    assert farm2.map(lambda s: s.upper(), ["a", "b"]) == ["A", "B"]


def test_worker_error_propagates(farm2):
    with pytest.raises(ZeroDivisionError):
        farm2.map(lambda i: 1 // 0 if i == 1 else i, range(3))
    # the pool survives a failed map
    assert farm2.map(lambda i: i * i, range(4)) == [0, 1, 4, 9]


def test_workers_are_distinct_processes(farm2):
    import os
    pids = set(farm2.map(lambda _: __import__("os").getpid(), range(2)))
    assert len(pids) == 2
    assert os.getpid() not in pids


def test_resolve_process_farm_spellings():
    farm = resolve_process_farm("processes:3")
    assert isinstance(farm, ProcessFarm) and farm.n_workers == 3
    assert resolve_process_farm("processes").n_workers >= 1
    assert resolve_process_farm(farm) is farm
    assert resolve_process_farm("all") is None
    assert resolve_process_farm(None) is None
    assert resolve_process_farm([1, 2]) is None


def test_tune_process_farm_matches_sequential(two_class_sines, farm2):
    """Fold jobs shipped to worker processes return the exact same tuning
    result as the sequential path (jobs are deterministic; only the process
    boundary differs) — the reference's tune-with-workers contract
    (test/hyperopt.jl:17-25 runs tune over 5 spawned workers)."""
    Xtr, ytr, _, _ = two_class_sines
    opts0 = mt.MPSOptions(verbosity=-5, log_level=-1, nsweeps=2,
                          dtype="float64", sigmoid_transform=True)
    kw = dict(parameters={"chi_max": [6, 10], "d": [3]},
              method=mt.MPSRandomSearch("Exhaustive"),
              objective=mt.MisclassificationRate(), opts0=opts0,
              maxiters=2, verbosity=-1)
    best_seq, cache_seq = mt.tune(Xtr, ytr, 2, **kw)
    best_far, cache_far = mt.tune(Xtr, ytr, 2, devices=farm2, **kw)
    assert best_seq == best_far
    assert set(cache_seq) == set(cache_far)
    for k in cache_seq:
        np.testing.assert_allclose(cache_seq[k], cache_far[k], rtol=1e-12)


def test_evaluate_process_farm(two_class_sines, farm2):
    """Outer evaluation folds farm whole onto worker processes and match
    the sequential protocol exactly."""
    Xtr, ytr, _, _ = two_class_sines
    opts0 = mt.MPSOptions(verbosity=-5, log_level=-1, nsweeps=2, chi_max=8,
                          d=3, dtype="float64", sigmoid_transform=True)
    kw = dict(nfolds=2, tuning_parameters={"d": [3, 4]},
              objective=mt.MisclassificationRate(), opts0=opts0,
              n_cvfolds=2, tuning_maxiters=2, verbosity=-1)
    res_far = mt.evaluate(Xtr, ytr, devices=farm2, **kw)
    res_seq = mt.evaluate(Xtr, ytr, **kw)
    assert [r["fold"] for r in res_far] == [0, 1]
    for rf, rs in zip(res_far, res_seq):
        assert rf["opts"] == rs["opts"]
        np.testing.assert_allclose(rf["loss"], rs["loss"], rtol=1e-12)
        np.testing.assert_array_equal(rf["train_inds"], rs["train_inds"])


@pytest.fixture(scope="module")
def farm3():
    """A 3-worker farm: with 2 CV folds it exceeds nfolds, so tune must
    farm the TRIAL axis (the reference's distribute_iters rule,
    random_search.jl:114-116)."""
    farm = ProcessFarm(3)
    yield farm
    farm.close()


def test_tune_trial_axis_farms_when_workers_exceed_folds(two_class_sines,
                                                         farm3):
    """With 3 workers and nfolds=2, grid trials ship whole to workers (one
    sequential-folds job per distinct hyperparameter point): ALL 3 workers
    run jobs — not just nfolds — and the result matches sequential exactly
    (the parent-side cache replaces the reference's cache-disabled farming,
    random_search.jl:114-116 / tuning.jl:170)."""
    Xtr, ytr, _, _ = two_class_sines
    opts0 = mt.MPSOptions(verbosity=-5, log_level=-1, nsweeps=2,
                          dtype="float64", sigmoid_transform=True)
    kw = dict(parameters={"chi_max": [4, 6, 8, 10], "d": [3]},
              method=mt.MPSRandomSearch("Exhaustive"),
              objective=mt.MisclassificationRate(), opts0=opts0,
              maxiters=4, verbosity=-1)
    best_seq, cache_seq = mt.tune(Xtr, ytr, 2, **kw)
    best_far, cache_far = mt.tune(Xtr, ytr, 2, devices=farm3, **kw)
    # 4 distinct trials went through one farmed batch over all 3 workers
    assert farm3.last_map_stats is not None
    assert farm3.last_map_stats["jobs"] == 4
    assert farm3.last_map_stats["workers"] == [0, 1, 2]
    assert best_seq == best_far
    assert set(cache_seq) == set(cache_far)
    for k in cache_seq:
        np.testing.assert_allclose(cache_seq[k], cache_far[k], rtol=1e-12)


def test_de_population_farms_processes(two_class_sines, farm3):
    """ScipySolver differential_evolution generations farm over ProcessFarm
    workers (pure sequential-folds energy jobs, cache kept parent-side) and
    reproduce the sequential trajectory at a fixed seed."""
    Xtr, ytr, _, _ = two_class_sines
    kw = dict(nfolds=2,
              parameters={"chi_max": (4, 10), "eta": (0.1, 2.0)},
              method=mt.ScipySolver("differential_evolution", popsize=4),
              # budget covers init + 2 full generations (8 + 2*8 = 24) so
              # the mid-generation exhaustion stop never fires and farmed /
              # sequential trajectories match exactly
              objective=mt.MisclassificationRate(), rng=3, maxiters=24,
              verbosity=-1,
              opts0=mt.MPSOptions(verbosity=-5, log_level=-1, nsweeps=2,
                                  chi_max=8, d=3, dtype="float64",
                                  sigmoid_transform=True))
    best_f, cache_f = mt.tune(Xtr, ytr, devices=farm3, **kw)
    # a whole generation's distinct energies shipped in one farmed batch
    assert farm3.last_map_stats is not None
    assert len(farm3.last_map_stats["workers"]) == 3
    best_s, cache_s = mt.tune(Xtr, ytr, **kw)
    assert best_f == best_s
    assert set(cache_f) == set(cache_s)
    for k in cache_f:
        assert cache_f[k] == pytest.approx(cache_s[k], rel=1e-9)


def test_workers_form_a_jax_distributed_job():
    """The documented multi-host mapping, exercised for real on localhost:
    two workers given ``distributed`` triples call
    jax.distributed.initialize and become one 2-process JAX job (the
    coordinator runs in worker 0)."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    farm = ProcessFarm(2, distributed=[(addr, 2, 0), (addr, 2, 1)])
    try:
        def report(_):
            import jax
            return (jax.process_index(), jax.process_count())

        out = farm.map(report, range(2))
    finally:
        farm.close()
    assert sorted(out) == [(0, 2), (1, 2)]


def test_cross_process_gspmd_training_matches_single_process():
    """The full multi-host rung of docs/parallelism.md, exercised for real:
    a dp mesh SPANNING TWO OS PROCESSES (2 workers x 2 virtual CPU devices
    each = one 4-device GSPMD job over Gloo collectives) runs
    ``sharded_full_sweeps`` and must reproduce the single-process result to
    FP-reduction-order noise.  This is the execution model the reference's
    cluster runs use (meta_hyperopt_ECG.jl:18 spawns 30 workers); here the
    *training step itself* crosses the process boundary, not just
    ``jax.distributed.initialize``."""
    import socket

    from mpstime_tpu.training.sweep import full_sweeps

    T, chi, d, C, N = 8, 6, 3, 2, 16
    from mpstime_tpu.models.mps import random_mps
    mps = random_mps(0, T, d, C, 4, chi, np.float64)
    rng = np.random.default_rng(0)
    phis_np = rng.uniform(-0.9, 0.9, (T, N, d))
    y_np = np.eye(C)[np.sort(rng.integers(0, C, N))]
    w_np = np.full((N,), 1.0 / N)
    cores_np = [np.asarray(c) for c in mps.cores] \
        if isinstance(mps.cores, (list, tuple)) else np.asarray(mps.cores)
    center_np = np.asarray(mps.center)
    kw = dict(nsweeps=2, loss="KLD", bbopt="TSGO", update_iters=1,
              rescale=(False, True), svd_alg="gram_eigh")

    # single-process reference (this process, virtual 8-device backend —
    # the computation is device-count-independent up to reduction order)
    c_ref, ce_ref = full_sweeps(mps.cores, mps.center, phis_np, y_np, w_np,
                                0.01, 1e-10, **kw)

    def job(_):
        import jax
        import numpy as np
        from mpstime_tpu.parallel import (make_mesh, replicate,
                                          shard_train_arrays,
                                          sharded_full_sweeps)

        mesh = make_mesh()          # all 4 global devices, both processes
        assert mesh.devices.size == 4 and jax.process_count() == 2
        sp, sy, sw = shard_train_arrays(mesh, phis_np, y_np, w_np)
        rc, rce = replicate(mesh, cores_np, center_np)
        c, ce = sharded_full_sweeps(mesh, rc, rce, sp, sy, sw,
                                    0.01, 1e-10, **kw)
        # outputs are replicated: every process holds full local copies
        return (np.asarray(c.addressable_shards[0].data),
                np.asarray(ce.addressable_shards[0].data))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    env = {"XLA_FLAGS": "--xla_force_host_platform_device_count=2"}
    farm = ProcessFarm(2, worker_env=[env, env], x64=True,
                       distributed=[(addr, 2, 0), (addr, 2, 1)])
    try:
        out = farm.map(job, range(2))
    finally:
        farm.close()
    (c0, ce0), (c1, ce1) = out
    # both processes converged to the same replicated model ...
    np.testing.assert_array_equal(c0, c1)
    np.testing.assert_array_equal(ce0, ce1)
    # ... and it matches the single-process run
    np.testing.assert_allclose(ce0, np.asarray(ce_ref), atol=1e-8)
    np.testing.assert_allclose(c0, np.asarray(c_ref), atol=1e-8)


def test_worker_dying_before_connect_raises():
    """A child whose interpreter cannot even start (broken PYTHONHOME)
    exits before connecting; the startup accept must surface that as an
    error instead of blocking forever."""
    farm = ProcessFarm(1, worker_env=[{"PYTHONHOME": "/nonexistent"}])
    try:
        with pytest.raises(RuntimeError, match="before connecting"):
            farm.map(lambda i: i, range(1))
    finally:
        farm.close()


def test_farm_reusable_after_close():
    """close() is idempotent and a closed farm respawns on the next map."""
    farm = ProcessFarm(2)
    assert farm.map(lambda i: i + 1, range(3)) == [1, 2, 3]
    farm.close()
    farm.close()
    assert farm._workers == []
    # respawns a fresh pool transparently
    assert farm.map(lambda i: i * 10, range(2)) == [0, 10]
    farm.close()
