"""Native UCR loader tests (reference load_splits_txt, utils.jl:1-22)."""

import numpy as np
import pytest

from mpstime_tpu.utils.data_loading import (_parse_native, load_splits_txt,
                                            load_ucr_file)


@pytest.fixture
def ucr_file(tmp_path, ecg200):
    Xtr, ytr, *_ = ecg200
    path = tmp_path / "data.txt"
    with open(path, "w") as f:
        for x, y in zip(Xtr, ytr):
            f.write(" ".join([str(int(y))] + [f"{v:.10g}" for v in x]) + "\n")
    return str(path), Xtr, ytr


def test_load_matches_written(ucr_file):
    path, Xtr, ytr = ucr_file
    X, y = load_ucr_file(path)
    np.testing.assert_allclose(X, Xtr, rtol=1e-9)
    np.testing.assert_array_equal(y, ytr)
    assert y.dtype == np.int64


def test_native_matches_numpy(ucr_file):
    path, Xtr, _ = ucr_file
    table = _parse_native(path)
    if table is None:
        pytest.skip("native loader unavailable")
    ref = np.loadtxt(path)
    np.testing.assert_allclose(table, ref, rtol=1e-12)


def test_comma_delimited(tmp_path):
    path = tmp_path / "c.csv"
    path.write_text("1,0.5,0.25\n2,0.1,0.9\n")
    X, y = load_ucr_file(str(path))
    np.testing.assert_array_equal(y, [1, 2])
    np.testing.assert_allclose(X, [[0.5, 0.25], [0.1, 0.9]])


def test_float_labels(tmp_path):
    path = tmp_path / "f.txt"
    path.write_text("1.5 0.5\n2.5 0.1\n")
    X, y = load_ucr_file(str(path))
    assert y.dtype == np.float64


def test_load_splits(tmp_path):
    for name in ("tr", "va", "te"):
        (tmp_path / f"{name}.txt").write_text("0 1.0 2.0\n1 3.0 4.0\n")
    (tr, ytr), (va, yva), (te, yte) = load_splits_txt(
        str(tmp_path / "tr.txt"), str(tmp_path / "va.txt"),
        str(tmp_path / "te.txt"))
    assert tr.shape == (2, 2) and list(ytr) == [0, 1]
