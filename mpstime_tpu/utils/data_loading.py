"""UCR-format dataset loading (reference load_splits_txt, src/utils.jl:1-22).

Uses the native C++ parser (mpstime_tpu/native/ucr_loader.cpp) when available
— compiled on first use and cached next to the source — with a numpy
fallback.  UCR files are whitespace/comma-delimited rows of
``label v1 v2 ... vT``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SRC = os.path.join(_NATIVE_DIR, "ucr_loader.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libucr_loader.so")
_lib_handle = None
_native_failed = False


def _get_native():
    global _lib_handle, _native_failed
    if _lib_handle is not None or _native_failed:
        return _lib_handle
    try:
        if not os.path.isfile(_LIB) or \
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
        lib.ucr_parse.restype = ctypes.c_int
        lib.ucr_parse.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        _lib_handle = lib
    except (subprocess.CalledProcessError, OSError) as e:
        warnings.warn(f"native UCR loader unavailable ({e}); "
                      "falling back to numpy")
        _native_failed = True
    return _lib_handle


def _parse_native(path: str) -> Optional[np.ndarray]:
    lib = _get_native()
    if lib is None:
        return None
    nrows = ctypes.c_int64()
    ncols = ctypes.c_int64()
    rc = lib.ucr_parse(path.encode(), None, 0, ctypes.byref(nrows),
                       ctypes.byref(ncols))
    if rc != 0:
        return None
    out = np.empty((nrows.value, ncols.value), dtype=np.float64)
    rc = lib.ucr_parse(path.encode(),
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                       out.size, ctypes.byref(nrows), ctypes.byref(ncols))
    if rc != 0:
        return None
    return out


def load_ucr_file(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Parse one UCR-format file -> (X [N, T], y [N]).

    Labels are the first column (cast to int when integral)."""
    table = _parse_native(path)
    if table is None:
        # UCR files come whitespace- or comma-delimited
        with open(path) as f:
            first = f.readline()
        delim = "," if "," in first else None
        table = np.loadtxt(path, delimiter=delim)
        if table.ndim == 1:
            table = table[None, :]
    y = table[:, 0]
    X = table[:, 1:]
    if np.allclose(y, np.round(y)):
        y = np.round(y).astype(np.int64)
    return X, y


def load_splits_txt(train_path: str, val_path: str, test_path: str):
    """Load train/val/test UCR files (reference load_splits_txt,
    utils.jl:1-22).  Returns ((X_train, y_train), (X_val, y_val),
    (X_test, y_test))."""
    return (load_ucr_file(train_path), load_ucr_file(val_path),
            load_ucr_file(test_path))
