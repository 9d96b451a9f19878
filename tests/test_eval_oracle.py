"""Evaluate-protocol oracle: the reference's stored nested-resampling
baseline (test/Data/eval_results.jld2, written and asserted against in
/root/reference/test/meta_hyperopt.jl:17-64) parsed and pinned, and our
``evaluate`` asserted to speak the SAME protocol — fold structure,
partition law, per-fold key set, loss shape."""

import os

import numpy as np
import pytest

import mpstime_tpu as mt
from mpstime_tpu.models.itensor_import import load_mpstime_jl_eval_results

_FIXTURE = os.path.join(os.path.dirname(__file__), "data",
                        "eval_results.jld2")

# the reference's evaluate run behind the baseline (meta_hyperopt.jl:9-49):
# IPD train+test concatenated (N=1096), nfolds=5, MisclassificationRate,
# MPSRandomSearch (LatinHypercube), n_cvfolds=2, tuning_maxiters=5
_N_IPD = 1096
_BASELINE_MEAN_LOSS = 0.03924           # regression pin of the parser


@pytest.fixture(scope="module")
def baseline():
    return load_mpstime_jl_eval_results(_FIXTURE)


class TestBaselineParses:
    def test_fold_structure(self, baseline):
        assert len(baseline) == 5
        assert [int(r["fold"]) for r in baseline] == [1, 2, 3, 4, 5]

    def test_test_sets_partition_the_data(self, baseline):
        """The 5 test sets are disjoint and cover 1..N exactly once (CV
        partition law); train = complement."""
        all_test = np.concatenate([np.asarray(r["test_inds"]).ravel()
                                   for r in baseline])
        assert len(all_test) == _N_IPD
        assert len(np.unique(all_test)) == _N_IPD
        for r in baseline:
            tr = set(np.asarray(r["train_inds"]).ravel().tolist())
            te = set(np.asarray(r["test_inds"]).ravel().tolist())
            assert not (tr & te)
            assert len(tr) + len(te) == _N_IPD
            # fold sizes follow the floor/ceil law of N/nfolds
            assert len(te) in (_N_IPD // 5, _N_IPD // 5 + 1)

    def test_losses_and_metadata(self, baseline):
        losses = [float(np.ravel(r["loss"])[0]) for r in baseline]
        assert all(0.0 < l < 0.2 for l in losses)
        assert np.mean(losses) == pytest.approx(_BASELINE_MEAN_LOSS,
                                                abs=1e-4)
        for r in baseline:
            assert r["objective"] == "MisclassificationRate()"
            assert r["optimiser"].startswith("MPSRandomSearch")
            assert float(r["time"]) > 0


class TestProtocolAgreement:
    """Our evaluate emits the reference's protocol: same 13 per-fold keys,
    same partition law, same loss/index conventions (0-based here vs
    Julia's 1-based — the one documented divergence)."""

    @pytest.fixture(scope="class")
    def ours(self, two_class_sines):
        Xtr, ytr, Xte, yte = two_class_sines
        Xs = np.concatenate([Xtr, Xte])
        ys = np.concatenate([ytr, yte])
        opts0 = mt.MPSOptions(verbosity=-5, log_level=-1, nsweeps=2,
                              chi_max=8, d=3, dtype="float64",
                              sigmoid_transform=True)
        res = mt.evaluate(Xs, ys, nfolds=5, tuning_parameters={"d": [3, 4]},
                          objective=mt.MisclassificationRate(), opts0=opts0,
                          n_cvfolds=2, tuning_maxiters=2, verbosity=-1)
        return res, len(ys)

    def test_key_set_matches_reference(self, baseline, ours):
        res, _ = ours
        ref_keys = set(baseline[0].keys())
        for r in res:
            assert set(r.keys()) == ref_keys, (
                f"evaluate protocol drift: ours {sorted(r.keys())} vs "
                f"reference {sorted(ref_keys)}")

    def test_partition_law_matches(self, baseline, ours):
        res, N = ours
        all_test = np.concatenate([np.asarray(r["test_inds"]).ravel()
                                   for r in res])
        assert len(all_test) == N and len(np.unique(all_test)) == N
        for r in res:
            tr = set(np.asarray(r["train_inds"]).ravel().tolist())
            te = set(np.asarray(r["test_inds"]).ravel().tolist())
            assert not (tr & te)
            assert len(te) in (N // 5, N // 5 + 1)

    def test_loss_and_fold_conventions(self, ours):
        res, _ = ours
        assert [r["fold"] for r in res] == [0, 1, 2, 3, 4]
        for r in res:
            loss = np.ravel(np.asarray(r["loss"], dtype=np.float64))
            assert loss.size == 1 and 0.0 <= float(loss[0]) <= 1.0
            assert r["objective"] == "MisclassificationRate()"
