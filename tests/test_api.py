"""API integrity (the role of the reference's Aqua.jl static QA,
test/runtests.jl:7-13): every exported name resolves, and the reference's
export list has an equivalent."""

import numpy as np
import pytest

import mpstime_tpu as mt


def test_all_exports_resolve():
    for name in mt.__all__:
        assert getattr(mt, name, None) is not None, name


REFERENCE_EXPORTS = {
    # reference src/MPSTime.jl:121-181 -> our equivalent name
    "MPSOptions": "MPSOptions",
    "TrainedMPS": "TrainedMPS",
    "EncodedTimeSeriesSet": "EncodedDataset",
    "Encoding": "EncodingSpec",
    "stoudenmire": "stoudenmire",
    "fourier": "fourier",
    "legendre": "legendre",
    "legendre_no_norm": "legendre_no_norm",
    "sahand": "sahand",
    "uniform": "uniform",
    "function_basis": "function_basis",
    "histogram_split": "histogram_split",
    "uniform_split": "uniform_split",
    "get_training_summary": "get_training_summary",
    "sweep_summary": "sweep_summary",
    "print_opts": "print_opts",
    "classify": "classify",
    "plot_encoding": "plot_encoding",
    "bipartite_spectrum": "bipartite_spectrum",
    "single_site_spectrum": "single_site_spectrum",
    "see_variation": "see_variation",
    "fitMPS": "fit_mps",
    "init_imputation_problem": "init_imputation_problem",
    "MPS_impute": "MPS_impute",
    "get_cdfs": "get_cdfs",
    "ImputationProblem": "ImputationProblem",
    "mcar": "mcar",
    "mnar": "mnar",
    "mar": "mar",
    "trendy_sine": "trendy_sine",
    "state_space": "state_space",
    "tune": "tune",
    "evaluate": "evaluate",
    "is_omp_threading": "is_omp_threading",
    "eval_loss": "eval_loss",
    "ImputationLoss": "ImputationLoss",
    "MisclassificationRate": "MisclassificationRate",
    "BalancedMisclassificationRate": "BalancedMisclassificationRate",
    "MPSRandomSearch": "MPSRandomSearch",
    "MPSClassifier": "MPSClassifier",
}


def test_reference_export_parity():
    missing = [ref for ref, ours in REFERENCE_EXPORTS.items()
               if getattr(mt, ours, None) is None]
    assert not missing, f"missing equivalents for reference exports: {missing}"


def test_print_opts_runs(capsys):
    mt.print_opts(mt.MPSOptions())
    out = capsys.readouterr().out
    assert "chi_max" in out and "encoding" in out
    mt.print_opts(mt.MPSOptions(), long=True)
    assert "svd_alg" in capsys.readouterr().out
