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
