"""Classification, evaluation summaries and sweep tables
(reference src/summary.jl)."""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .encodings import encode_dataset
from .models.mps import expand_label_index, single_contract_batch_scaled
from .training.fit import TrainedMPS
from .utils.preprocessing import transform_test_data


def _encode_test(mps: TrainedMPS, X_test: np.ndarray, y_dummy=None):
    opts = mps.opts.replace(verbosity=-10)
    X_test = np.asarray(X_test, dtype=np.float64)
    X_test_s, _ = transform_test_data(X_test, mps.norms, opts)
    n = X_test.shape[0]
    y = np.zeros(n, dtype=np.int64) if y_dummy is None else np.asarray(y_dummy)
    return encode_dataset(X_test, X_test_s, y, opts, spec=mps.encoding_spec(),
                          labels=np.unique(y),
                          training_enc_args=mps.train_data.enc_args,
                          dtype=mps.opts.resolved_dtype())


def classify(mps: TrainedMPS, X_test: np.ndarray) -> np.ndarray:
    """Predict class labels for the rows of X_test by maximum overlap
    (reference classify, summary.jl:116-177)."""
    ds = _encode_test(mps, X_test)
    return classify_encoded(mps, ds.X_enc)


def classify_encoded(mps: TrainedMPS, X_enc: jnp.ndarray) -> np.ndarray:
    """Predict labels for already-encoded (class-sorted) states."""
    from .models.mps import contract_batch_scaled
    yhat_s, _ = contract_batch_scaled(mps.mps, X_enc)
    preds_idx = np.asarray(jnp.argmax(jnp.abs(yhat_s) ** 2, axis=1))
    return mps.labels[preds_idx]


def classify_overlap(Ws: list, X_enc: jnp.ndarray
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-class-MPS overlaps (reference classify_overlap, summary.jl:182-202).
    Returns (pred class indices, log-overlaps log|<psi_c|phi_n>| [N, C]).

    Deliberate divergence from the reference: the second return is in the
    *log domain*.  True-scale |overlap| ~ exp(-O(T)) underflows to exact 0
    for long series (T >~ 700 even at float64), making raw magnitudes
    useless; log-overlaps stay informative at any T and recover the true
    scale as ``exp(log_ovl)`` whenever that is representable."""
    parts = [single_contract_batch_scaled(w, X_enc) for w in Ws]
    log_ovl = jnp.stack([jnp.log(jnp.maximum(jnp.abs(y),
                                             jnp.finfo(ls.dtype).tiny)) + ls
                         for (y, ls) in parts], axis=1)       # [N, C]
    return np.asarray(jnp.argmax(log_ovl, axis=1)), np.asarray(log_ovl)


def confusion_matrix(y_true_idx: np.ndarray, y_pred_idx: np.ndarray,
                     num_classes: int) -> np.ndarray:
    conf = np.zeros((num_classes, num_classes), dtype=np.int64)
    np.add.at(conf, (y_true_idx, y_pred_idx), 1)
    return conf


def _per_class_prf(conf: np.ndarray):
    """Multiclass macro-averaged precision/recall/F1/specificity from a
    confusion matrix conf[true, pred] (reference summary.jl:316-323 via MLBase)."""
    C = conf.shape[0]
    tp = np.diag(conf).astype(np.float64)
    fp = conf.sum(axis=0) - tp
    fn = conf.sum(axis=1) - tp
    tn = conf.sum() - tp - fp - fn
    with np.errstate(divide="ignore", invalid="ignore"):
        prec = np.where(tp + fp > 0, tp / (tp + fp), 0.0)
        rec = np.where(tp + fn > 0, tp / (tp + fn), 0.0)
        spec = np.where(tn + fp > 0, tn / (tn + fp), 0.0)
        f1 = np.where(prec + rec > 0, 2 * prec * rec / (prec + rec), 0.0)
    return prec.mean(), rec.mean(), spec.mean(), f1.mean()


def get_training_summary(mps: TrainedMPS, test_states, print_stats: bool = False
                         ) -> Dict[str, object]:
    """Overlap matrix, confusion matrix, and summary statistics
    (reference get_training_summary, summary.jl:225-355)."""
    Ws = expand_label_index(mps.mps)
    C = len(Ws)
    tr = mps.train_data
    preds_tr, _ = classify_overlap(Ws, tr.X_enc)
    acc_train = float(np.mean(preds_tr == tr.y_idx))

    preds_te, _ = classify_overlap(Ws, test_states.X_enc)
    true_te = test_states.y_idx
    acc_test = float(np.mean(preds_te == true_te))

    # <psi_i | psi_j> for all class pairs in ONE device call.  The per-class
    # MPSs from expand_label_index share the core chain and differ only in
    # the center slice, so the chain transfer matrices are computed once
    # (left scan + right scan) and only the final center contraction is
    # pairwise.
    centers = jnp.stack([w.center for w in Ws])
    ov = _overlap_matrix(Ws[0].cores, centers, center_pos=Ws[0].center_pos)
    # abs on device: only a real array crosses the host boundary (complex
    # transfers are unimplemented on the axon platform, utils/xfer.py)
    overlapmat = np.asarray(jnp.abs(ov))

    conf = confusion_matrix(true_te, preds_te, C)
    prec, rec, spec, f1 = _per_class_prf(conf)
    # balanced acc: mean recall per class
    with np.errstate(invalid="ignore"):
        per_class_rec = np.where(conf.sum(1) > 0, np.diag(conf) / conf.sum(1), 0.0)
    bal_acc = float(per_class_rec.mean())

    stats = {
        "train_acc": acc_train,
        "test_acc": acc_test,
        "test_balanced_acc": bal_acc,
        "precision": float(prec),
        "recall": float(rec),
        "specificity": float(spec),
        "f1_score": float(f1),
        "confmat": conf,
        "overlapmat": overlapmat,
    }
    if print_stats:
        print("Overlap matrix:\n", np.array2string(overlapmat, precision=4))
        print("Confusion matrix (rows=true, cols=pred):\n", conf)
        for k in ("test_balanced_acc", "train_acc", "test_acc", "f1_score",
                  "specificity", "recall", "precision"):
            print(f"  {k}: {stats[k]:.6f}")
    return stats


def _overlap_matrix(cores: jnp.ndarray, centers: jnp.ndarray, *,
                    center_pos: int) -> jnp.ndarray:
    """Gram matrix O[i, j] = <psi_i | psi_j> of per-class MPSs that share
    the core chain ``cores`` [T, chi, d, chi] and differ only in the center
    tensor ``centers`` [C, chi, d, chi] at site ``center_pos`` (the
    expand_label_index layout, reference utils.jl:356-370).

    One jitted program: a left scan over sites < center_pos, a right scan
    over sites > center_pos (both independent of the class pair), and a
    single batched pairwise contraction of the centers through the two
    transfer environments — replacing a per-pair per-site host dispatch
    loop (C^2 * 2T eager einsums)."""
    return _overlap_matrix_jit(cores, centers, center_pos)


@partial(jax.jit, static_argnames=("center_pos",))
def _overlap_matrix_jit(cores, centers, center_pos):
    chi = cores.shape[1]
    E0 = jnp.zeros((chi, chi), dtype=cores.dtype).at[0, 0].set(1.0)

    def lstep(E, a):
        # E[p, q] -> E'[r, s] = conj(a[p,i,r]) E[p,q] a[q,i,s]
        tmp = jnp.einsum("pq,qis->pis", E, a)
        return jnp.einsum("pir,pis->rs", jnp.conj(a), tmp), None

    def rstep(R, a):
        # R[r, s] -> R'[p, q] = conj(a[p,i,r]) a[q,i,s] R[r,s]
        tmp = jnp.einsum("qis,rs->qir", a, R)
        return jnp.einsum("pir,qir->pq", jnp.conj(a), tmp), None

    L, _ = jax.lax.scan(lstep, E0, cores[:center_pos])
    R, _ = jax.lax.scan(rstep, E0, cores[center_pos + 1:], reverse=True)
    right = jnp.einsum("jqks,rs->jqkr", centers, R)
    left = jnp.einsum("pq,jqkr->jpkr", L, right)
    return jnp.einsum("ipkr,jpkr->ij", jnp.conj(centers), left)


def sweep_summary(info: Dict[str, list], out=None) -> None:
    """Pretty per-sweep summary table (reference sweep_summary,
    summary.jl:380-430)."""
    keys = [("Train Accuracy", "train_acc"), ("Test Accuracy", "test_acc"),
            ("Train KL Div.", "train_KL_div"), ("Test KL Div.", "test_KL_div"),
            ("Time taken", "time_taken")]
    n = len(info.get("time_taken", []))
    if n == 0:
        print("(no logged sweeps)", file=out)
        return
    nsweeps = n - 2
    header = ["Initial"] + [f"After Sweep {i+1}" for i in range(nsweeps)] + \
             ["After Norm", "Mean"]
    print("  " + " | ".join(f"{h:>14}" for h in [""] + header), file=out)
    for (label, key) in keys:
        vals = info.get(key, [])
        if not vals:
            continue
        mean = float(np.nanmean(vals[1:-1])) if len(vals) > 2 else float("nan")
        row = [label] + [f"{v:.6g}" for v in vals] + [f"{mean:.6g}"]
        print("  " + " | ".join(f"{c:>14}" for c in row), file=out)


def KL_div(mps: TrainedMPS, test_states) -> float:
    """Mean -log|<psi_y|phi>|^2 over a dataset (reference summary.jl:459-471).
    Reduced fully on device; only the scalar crosses the host boundary."""
    from .models.mps import contract_batch_scaled
    yhat_s, ls = contract_batch_scaled(mps.mps, test_states.X_enc)
    onehot = jnp.asarray(np.eye(mps.mps.num_classes)[test_states.y_idx],
                         dtype=yhat_s.real.dtype)
    y_true = jnp.sum(yhat_s * onehot.astype(yhat_s.dtype), axis=1)
    return float(jnp.mean(-jnp.log(jnp.abs(y_true) ** 2) - 2.0 * ls))
