"""Sklearn-style classifier + visualization tests (reference
test via MLJ integration layer; vis_encodings.jl)."""

import numpy as np
import pytest

import mpstime_tpu as mt


class TestMPSClassifier:
    def test_fit_predict_score(self, two_class_sines):
        Xtr, ytr, Xte, yte = two_class_sines
        clf = mt.MPSClassifier(nsweeps=5, chi_max=12, d=4, dtype="float64")
        clf.fit(Xtr, ytr)
        preds = clf.predict(Xte)
        assert preds.shape == yte.shape
        assert clf.score(Xte, yte) >= 0.85
        np.testing.assert_array_equal(clf.classes_, [0, 1])

    def test_params_round_trip(self):
        clf = mt.MPSClassifier(chi_max=30, encoding="Fourier",
                               train_classes_separately=True)
        p = clf.get_params()
        assert p["chi_max"] == 30 and p["train_classes_separately"]
        clf2 = mt.MPSClassifier(**p)
        assert clf2.get_params() == p
        clf2.set_params(chi_max=12)
        assert clf2.get_params()["chi_max"] == 12

    def test_validation(self):
        with pytest.raises(ValueError):
            mt.MPSClassifier(chi_max=0)
        with pytest.raises(ValueError):
            mt.MPSClassifier(eta=-1.0)
        with pytest.raises(ValueError):
            mt.MPSClassifier(encoding="bogus")

    def test_unfitted_predict_raises(self):
        with pytest.raises(RuntimeError):
            mt.MPSClassifier().predict(np.zeros((2, 5)))

    def test_train_separately_couples_encoding(self):
        clf = mt.MPSClassifier(train_classes_separately=True)
        opts = clf._make_opts()
        assert opts.encode_classes_separately


class TestVis:
    def test_plot_encoding_closed_form(self):
        fig = mt.plot_encoding("legendre", 4)
        assert fig is not None
        import matplotlib.pyplot as plt
        plt.close(fig)

    def test_plot_encoding_data_driven(self, two_class_sines):
        Xtr, ytr, *_ = two_class_sines
        opts = mt.MPSOptions(d=3, encoding="SLTD", verbosity=-1)
        from mpstime_tpu.utils.preprocessing import transform_train_data
        Xs, _ = transform_train_data(Xtr, opts)
        fig = mt.plot_encoding("SLTD", 3, Xs, ytr, opts=opts)
        assert fig is not None
        import matplotlib.pyplot as plt
        plt.close(fig)

    def test_plot_encoding_requires_data(self):
        with pytest.raises(ValueError, match="data-driven"):
            mt.plot_encoding("SL", 3)

    def test_conf_mat_plot(self):
        fig = mt.plot_conf_mat(np.array([[10, 2], [3, 15]]), [0, 1])
        assert fig is not None
        import matplotlib.pyplot as plt
        plt.close(fig)

    def test_training_summary_plot(self, two_class_sines):
        Xtr, ytr, Xte, yte = two_class_sines
        opts = mt.MPSOptions(nsweeps=2, chi_max=8, d=3, verbosity=-1,
                             dtype="float64")
        _, info, _ = mt.fit_mps(Xtr, ytr, Xte, yte, opts)
        fig = mt.plot_training_summary(info)
        assert fig is not None
        import matplotlib.pyplot as plt
        plt.close(fig)

    def test_impute_plot(self, two_class_sines):
        Xtr, ytr, Xte, yte = two_class_sines
        opts = mt.MPSOptions(nsweeps=2, chi_max=8, d=3, verbosity=-1,
                             dtype="float64", log_level=0)
        trained, _, _ = mt.fit_mps(Xtr, ytr, opts=opts)
        imp = mt.init_imputation_problem(trained, Xte, yte, verbosity=-1,
                                         dx=1e-3)
        _, sites = mt.mar(Xte[0], 0.2, rng=0)
        ts, err, tgt, stats, plots = mt.mps_impute(imp, 0, 0, sites, "median",
                                                   NN_baseline=True,
                                                   plot_fits=True)
        assert len(plots) == 1
        import matplotlib.pyplot as plt
        plt.close(plots[0])
