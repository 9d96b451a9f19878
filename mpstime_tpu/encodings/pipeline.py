"""Dataset encoding pipeline.

Re-designs the reference's ``encode_dataset`` (MPSTime.jl
src/Encodings/encodings.jl:33-156): sort samples by class (the loss kernel
relies on per-class segment structure), run the encoding's host-side ``init``
on training data only, then encode the whole dataset as one batched device
computation ``[N, T] -> [N, T, d]`` (the reference encodes per scalar in a
Julia loop; on TPU the entire dataset is one vmapped evaluation).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..options import MPSOptions
from ..utils.xfer import zeros_on_device
from .registry import EncodingSpec, get_encoding


@dataclass
class EncodedDataset:
    """Encoded time-series set (reference ``EncodedTimeSeriesSet``,
    src/Structs/structs.jl:29-40) — class-sorted.

    Attributes:
      X_enc:   [N, T, d] encoded product states (device array).
      y_idx:   [N] 0-based class indices, ascending (host numpy).
      labels:  [C] sorted original class labels.
      X_orig:  [N, T] original (unscaled) data in the same sorted order.
      X_scaled:[N, T] scaled data in sorted order.
      class_distribution: [C] sample count per class.
      enc_args: encoding init outputs (pytree of numpy arrays), or a list of
                per-class pytrees when encoded separately.
    """
    X_enc: jnp.ndarray
    y_idx: np.ndarray
    labels: np.ndarray
    X_orig: np.ndarray
    X_scaled: np.ndarray
    class_distribution: np.ndarray
    enc_args: Any = None
    encode_separately: bool = False

    def __len__(self):
        return int(self.y_idx.shape[0])

    @property
    def num_classes(self) -> int:
        return int(self.labels.shape[0])


def validate_range(X_scaled: np.ndarray, spec: EncodingSpec) -> None:
    a, b = spec.range
    if X_scaled.size and not ((X_scaled >= a) & (X_scaled <= b)).all():
        raise ValueError(
            f"Data must be rescaled between {a} and {b} before a {spec.name} encoding.")


def _pad_enc(X_enc, opts: MPSOptions):
    """Zero-pad the feature axis from opts.d to opts.pad_to[1] (the
    shape-polymorphic path; padded basis directions carry exactly zero)."""
    if opts.pad_to is None or opts.pad_to[1] == X_enc.shape[-1]:
        return X_enc
    pad = opts.pad_to[1] - X_enc.shape[-1]
    widths = [(0, 0)] * (X_enc.ndim - 1) + [(0, pad)]
    return jnp.pad(X_enc, widths)


def encode_dataset(X_orig: np.ndarray, X_scaled: np.ndarray, y: np.ndarray,
                   opts: MPSOptions, spec: Optional[EncodingSpec] = None,
                   labels: Optional[np.ndarray] = None,
                   training_enc_args: Any = None,
                   dtype=None) -> EncodedDataset:
    """Encode a dataset of scaled series (rows) into product states.

    ``training_enc_args`` must be passed for test/validation sets of
    data-driven encodings (reference encodings.jl:130-138).
    """
    if spec is None:
        spec = get_encoding(opts.encoding, project=opts.projected_basis)
    X_orig = np.asarray(X_orig)
    X_scaled = np.asarray(X_scaled, dtype=np.float64)
    y = np.asarray(y)
    if dtype is None:
        dtype = opts.resolved_dtype()

    if labels is None:
        labels = np.unique(y)          # sorted
    labels = np.asarray(labels)
    N, T = X_scaled.shape if X_scaled.ndim == 2 else (0, 0)

    if N == 0:
        C = len(labels)
        d_out = opts.d if opts.pad_to is None else opts.pad_to[1]
        return EncodedDataset(zeros_on_device((0, 0, d_out), dtype),
                              np.zeros(0, np.int64), labels,
                              X_orig, X_scaled, np.zeros(C, np.int64),
                              training_enc_args, opts.encode_classes_separately)

    # class-sorted order (stable, matches reference sortperm)
    label_to_idx = {l: i for i, l in enumerate(labels.tolist())}
    y_idx = np.asarray([label_to_idx[l] for l in y.tolist()], dtype=np.int64)
    order = np.argsort(y_idx, kind="stable")
    X_orig_s, X_scaled_s, y_idx_s = X_orig[order], X_scaled[order], y_idx[order]
    class_distribution = np.bincount(y_idx_s, minlength=len(labels)).astype(np.int64)

    validate_range(X_scaled_s, spec)

    is_train = training_enc_args is None

    if opts.encode_classes_separately and spec.is_data_driven:
        # per-class encoding args (reference encodings.jl:50-76)
        enc_args: List[Any] = [] if is_train else training_enc_args
        parts = []
        start = 0
        for ci, cnt in enumerate(class_distribution.tolist()):
            Xc = X_scaled_s[start:start + cnt]
            if is_train:
                args_c = spec.init(Xc, y_idx_s[start:start + cnt], opts.d, opts) \
                    if spec.init is not None else None
                enc_args.append(args_c)
            else:
                args_c = enc_args[ci]
            if cnt:
                # stays ON device (complex encodings cannot cross the host
                # boundary on the axon platform — utils/xfer.py)
                parts.append(jnp.asarray(
                    spec.encode_batch(jnp.asarray(Xc), opts.d, args_c),
                    dtype=dtype))
            start += cnt
        X_enc = jnp.concatenate(parts, axis=0) if parts \
            else zeros_on_device((0, T, opts.d), dtype)
        return EncodedDataset(_pad_enc(X_enc, opts), y_idx_s, labels,
                              X_orig_s, X_scaled_s,
                              class_distribution, enc_args, True)

    if is_train:
        enc_args = spec.init(X_scaled_s, y_idx_s, opts.d, opts) \
            if spec.init is not None else None
    else:
        enc_args = training_enc_args

    X_enc = jnp.asarray(spec.encode_batch(jnp.asarray(X_scaled_s), opts.d, enc_args),
                        dtype=dtype)
    return EncodedDataset(_pad_enc(X_enc, opts), y_idx_s, labels, X_orig_s,
                          X_scaled_s, class_distribution, enc_args, False)


def encode_series(x_scaled: np.ndarray, opts: MPSOptions, enc_args: Any,
                  spec: Optional[EncodingSpec] = None, class_idx: int = 0,
                  dtype=None) -> jnp.ndarray:
    """Encode a single scaled series [T] -> [T, d] using stored training args."""
    if spec is None:
        spec = get_encoding(opts.encoding, project=opts.projected_basis)
    if dtype is None:
        dtype = opts.resolved_dtype()
    args = enc_args[class_idx] if (opts.encode_classes_separately and
                                   isinstance(enc_args, list)) else enc_args
    X = jnp.asarray(np.asarray(x_scaled, dtype=np.float64))[None, :]
    out = jnp.asarray(spec.encode_batch(X, opts.d, args), dtype=dtype)[0]
    return _pad_enc(out, opts)
