"""Per-sweep loss/accuracy statistics (reference summary.jl:33-114)."""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.mps import MPS, contract_batch


@partial(jax.jit, static_argnames=("center_pos", "num_classes"))
def _stats_kernel(cores, center, center_pos, phis, y_idx, num_classes):
    from ..models.mps import _contract_batch
    yhat_s, ls = _contract_batch(cores, center, center_pos, phis)  # [N, C], [N]
    onehot = jax.nn.one_hot(y_idx, num_classes, dtype=yhat_s.real.dtype)
    # true-scale yhat for the MSE (exp(ls) ~ O(1) for a trained MPS)
    yhat = yhat_s * jnp.exp(ls)[:, None].astype(yhat_s.dtype)
    resid = yhat - onehot.astype(yhat.dtype)
    mse = 0.5 * jnp.mean(jnp.sum(jnp.abs(resid) ** 2, axis=1))
    y_true_s = jnp.sum(yhat_s * onehot.astype(yhat_s.dtype), axis=1)
    kld = jnp.mean(-jnp.log(jnp.real(y_true_s) ** 2 + jnp.imag(y_true_s) ** 2)
                   - 2.0 * ls)
    preds = jnp.argmax(jnp.abs(yhat_s), axis=1)   # scale-invariant per sample
    acc = jnp.mean((preds == y_idx).astype(jnp.float32))
    conf = jnp.zeros((num_classes, num_classes), jnp.int32).at[y_idx, preds].add(1)
    return mse, kld, acc, preds, conf


def loss_acc_conf(mps: MPS, X_enc: jnp.ndarray, y_idx: np.ndarray
                  ) -> Tuple[float, float, float, np.ndarray]:
    """(mse_loss, kld_loss, accuracy, confusion[true, pred]) over a dataset
    (reference MSE_loss_acc_conf, summary.jl:102-114)."""
    mse, kld, acc, _, conf = _stats_kernel(
        mps.cores, mps.center, mps.center_pos, X_enc,   # X_enc: [N, T, d]
        jnp.asarray(y_idx), mps.num_classes)
    return float(mse), float(kld), float(acc), np.asarray(conf)


def predict_class_indices(mps: MPS, X_enc: jnp.ndarray) -> np.ndarray:
    """argmax_c |yhat_c| predictions as 0-based class indices
    (scale-invariant: uses the scaled contraction)."""
    from ..models.mps import contract_batch_scaled
    yhat_s, _ = contract_batch_scaled(mps, X_enc)
    return np.asarray(jnp.argmax(jnp.abs(yhat_s), axis=1))
