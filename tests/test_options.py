import numpy as np
import pytest

from mpstime_tpu import MPSOptions
from mpstime_tpu.options import canonical_encoding_name, encoding_is_complex


def test_defaults_match_reference():
    # reference MPSOptions defaults (options.jl:106-143)
    o = MPSOptions()
    assert o.nsweeps == 10
    assert o.chi_max == 25
    assert o.eta == 0.01
    assert o.d == 5
    assert o.encoding == "legendre_no_norm"
    assert o.cutoff == 1e-10
    assert o.update_iters == 1
    assert o.loss_grad == "KLD"
    assert o.bbopt == "TSGO"
    assert o.rescale == (False, True)
    assert o.init_rng == 1234
    assert o.chi_init == 4
    assert o.data_bounds == (0.0, 1.0)
    assert not o.exit_early
    assert o.sigmoid_transform and o.minmax


@pytest.mark.parametrize("name,canon", [
    ("Legendre", "legendre_no_norm"),
    ("Legendre_No_Norm", "legendre_no_norm"),
    ("legendre_norm", "legendre_norm"),
    ("Stoudenmire", "stoudenmire"),
    ("Fourier", "fourier"),
    ("Sahand", "sahand"),
    ("SL", "sahand_legendre"),
    ("SLTD", "sahand_legendre_time_dependent"),
    ("uniform", "uniform"),
    ("hist_split_fourier", "hist_split_fourier"),
    ("unif_split_legendre", "unif_split_legendre_no_norm"),
])
def test_encoding_round_trip(name, canon):
    # reference test/basis_tests.jl:3-9 symbol<->encoding round trip
    assert canonical_encoding_name(name) == canon
    o = MPSOptions(encoding=name)
    assert o.encoding == canon


def test_complex_detection():
    assert encoding_is_complex("fourier")
    assert encoding_is_complex("stoudenmire")
    assert encoding_is_complex("sahand")
    assert not encoding_is_complex("legendre")
    assert encoding_is_complex("hist_split_fourier")
    assert not encoding_is_complex("unif_split_uniform")


def test_serialization_round_trip():
    o = MPSOptions(chi_max=31, d=7, eta=0.05, encoding="Fourier",
                   rescale=(True, True))
    o2 = MPSOptions.from_json(o.to_json())
    assert o == o2


def test_replace():
    o = MPSOptions().replace(chi_max=99)
    assert o.chi_max == 99 and o.d == 5


def test_invalid_options():
    with pytest.raises(ValueError):
        MPSOptions(encoding="not_a_basis")
    with pytest.raises(ValueError):
        MPSOptions(loss_grad="huber")
    with pytest.raises(ValueError):
        MPSOptions(bbopt="adam")


def test_padded_runs_resolve_orth_to_qr():
    # pad_to forces the QR orth chain on every backend: the NS subspace
    # iteration contaminates a structurally rank-deficient warm basis
    # (runtime chi cap << static keep) — measured train-acc collapse
    # 0.98 -> 0.69 on padded ECG200 trials (options.resolved_orth_alg
    # docstring; the r4 TPU-lane padded-trial failure).
    assert MPSOptions(pad_to=(40, 8)).resolved_orth_alg() == "qr"
    # explicit setting still wins
    assert MPSOptions(pad_to=(40, 8),
                      orth_alg="ns").resolved_orth_alg() == "ns"
    # unpadded auto keeps the backend rule (CPU test env -> qr)
    assert MPSOptions().resolved_orth_alg() in ("qr", "ns")
