"""Test configuration.

Default lane: force the CPU backend with 8 virtual devices (multi-chip
sharding tests run on a virtual mesh) and enable x64 for f64 parity tests;
``-m tpu`` tests are skipped.

Hardware lane (``pytest -m tpu``): keeps the environment's real TPU
platform (f32/c64) and runs only the ``@pytest.mark.tpu`` subset —
repeatable device coverage of the compiled Pallas kernels, the complex
transfer shim, and f32 accuracy floors (the reference's
CI-runs-everything posture, its .github/workflows + test/runtests.jl).

NOTE: the environment may export JAX_PLATFORMS (e.g. a TPU plugin); the
config.update below takes precedence over the env var.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import numpy as np
import pytest


def _is_tpu_lane(config) -> bool:
    # Only the documented invocation (`pytest -m tpu`) activates the
    # hardware lane.  Anything else — including negations in any spelling
    # ("not tpu", "not (tpu or slow)") — gets the safe CPU+x64 default;
    # guessing intent from a general markexpr risks silently running the
    # whole suite against the remote TPU.
    me = (config.option.markexpr or "").strip()
    return me == "tpu"


def pytest_configure(config):
    config._tpu_lane = _is_tpu_lane(config)
    if not config._tpu_lane:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)


def pytest_collection_modifyitems(config, items):
    if getattr(config, "_tpu_lane", False):
        return
    skip = pytest.mark.skip(reason="TPU hardware lane — run `pytest -m tpu`")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)


_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="session")
def ecg200():
    """Real ECG200 (UCR) train/test split, vendored from the reference's test
    fixture (test/Data/ecg200/mps_saves/test_dataset.jld2)."""
    d = np.load(os.path.join(_DATA_DIR, "ecg200.npz"))
    return (d["X_train"], d["y_train"], d["X_test"], d["y_test"])


@pytest.fixture(scope="session")
def two_class_sines():
    """Synthetic two-class dataset: sinusoids of different frequency with
    random phase (reference utils.jl generate_toy_timeseries :50-109)."""
    rng = np.random.default_rng(42)
    T, n_per = 48, 40

    def make(freq, n):
        t = np.linspace(0, 2 * np.pi, T)
        ph = rng.uniform(0, 2 * np.pi, size=(n, 1))
        return np.sin(freq * t[None, :] + ph) + 0.05 * rng.standard_normal((n, T))

    X0, X1 = make(1.0, n_per), make(6.0, n_per)
    X = np.concatenate([X0, X1], axis=0)
    y = np.concatenate([np.zeros(n_per, int), np.ones(n_per, int)])
    perm = rng.permutation(2 * n_per)
    X, y = X[perm], y[perm]
    return X[:48], y[:48], X[48:], y[48:]
