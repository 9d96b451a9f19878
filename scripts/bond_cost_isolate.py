"""Isolate per-bond costs in the warm sweep by swapping split internals:
  A. current warm split            (power mm + QR + argsort mask)
  B. threshold mask (no argsort)
  C. no QR (CholQR-less: use Y directly, wrong but shape-true)
  D. null split (slice, no linalg at all)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "scripts")
from lean_split_check import make_train_state  # noqa: E402

from mpstime_tpu.ops import decomp  # noqa: E402
from mpstime_tpu.training import sweep as sweepmod  # noqa: E402

NS = 20


def timed(tag, mps, phis_c, y_onehot, w, eta, cutoff):
    kw = dict(loss="KLD", bbopt="TSGO", update_iters=1, rescale=(False, True))
    t0 = time.perf_counter()
    cores, center = sweepmod.full_sweeps(
        mps.cores, mps.center, phis_c, y_onehot, w, eta, cutoff,
        nsweeps=NS, svd_alg="randomized_warm", **kw)
    float(jnp.linalg.norm(center))
    tf = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        cores, center = sweepmod.full_sweeps(
            mps.cores, mps.center, phis_c, y_onehot, w, eta, cutoff,
            nsweeps=NS, svd_alg="randomized_warm", **kw)
        float(jnp.linalg.norm(center))
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts)) / NS
    print(f"{tag:30s} {t*1e3:8.2f} ms/sweep ({t*1e3/190*1000:6.1f} us/bond)",
          flush=True)


def main():
    opts, ds, ds_te, mps, phis_c, y_onehot, w, T = make_train_state(jnp)
    eta = jnp.float32(opts.eta)
    cutoff = jnp.float32(opts.cutoff)
    a = (mps, phis_c, y_onehot, w, eta, cutoff)

    orig_l, orig_r = decomp.warm_split_left, decomp.warm_split_right
    timed("A warm (current)", *a)

    # B: threshold mask, no argsort
    def wl_thresh(M, V0, keep, cutoff, q=1):
        C = M.shape[1]
        k = min(keep, C)
        Y = V0[:, :k]
        for _ in range(q):
            Y = M.conj().T @ (M @ Y)
        Y = Y / jnp.maximum(jnp.linalg.norm(Y, axis=0, keepdims=True),
                            jnp.finfo(Y.real.dtype).tiny)
        Q, _ = jnp.linalg.qr(Y)
        B = M @ Q
        wv = jnp.sum(jnp.abs(B) ** 2, axis=0)
        keep_col = ((wv > cutoff * jnp.sum(wv)) & (wv > 0)).astype(wv.dtype)
        return B * keep_col, Q.conj().T * keep_col[:, None], Q

    def wr_thresh(M, U0, keep, cutoff, q=1):
        R = M.shape[0]
        k = min(keep, R)
        Y = U0[:, :k]
        for _ in range(q):
            Y = M @ (M.conj().T @ Y)
        Y = Y / jnp.maximum(jnp.linalg.norm(Y, axis=0, keepdims=True),
                            jnp.finfo(Y.real.dtype).tiny)
        Q, _ = jnp.linalg.qr(Y)
        B = Q.conj().T @ M
        wv = jnp.sum(jnp.abs(B) ** 2, axis=1)
        keep_col = ((wv > cutoff * jnp.sum(wv)) & (wv > 0)).astype(wv.dtype)
        return Q * keep_col, B * keep_col[:, None], Q

    decomp.warm_split_left, decomp.warm_split_right = wl_thresh, wr_thresh
    jax.clear_caches()
    timed("B threshold mask (no sort)", *a)

    # C: no QR — normalize columns only (wrong math, timing only)
    def wl_noqr(M, V0, keep, cutoff, q=1):
        k = min(keep, M.shape[1])
        Y = V0[:, :k]
        for _ in range(q):
            Y = M.conj().T @ (M @ Y)
        Q = Y / jnp.maximum(jnp.linalg.norm(Y, axis=0, keepdims=True),
                            jnp.finfo(Y.real.dtype).tiny)
        B = M @ Q
        return B, Q.conj().T, Q

    def wr_noqr(M, U0, keep, cutoff, q=1):
        k = min(keep, M.shape[0])
        Y = U0[:, :k]
        for _ in range(q):
            Y = M @ (M.conj().T @ Y)
        Q = Y / jnp.maximum(jnp.linalg.norm(Y, axis=0, keepdims=True),
                            jnp.finfo(Y.real.dtype).tiny)
        B = Q.conj().T @ M
        return Q, B, Q

    decomp.warm_split_left, decomp.warm_split_right = wl_noqr, wr_noqr
    jax.clear_caches()
    timed("C no QR (power mm only)", *a)

    # D: null split — no linalg at all
    def wl_null(M, V0, keep, cutoff, q=1):
        return M[:, :keep], M[:keep, :], V0

    def wr_null(M, U0, keep, cutoff, q=1):
        return M[:, :keep], M[:keep, :], U0

    decomp.warm_split_left, decomp.warm_split_right = wl_null, wr_null
    jax.clear_caches()
    timed("D null split", *a)

    decomp.warm_split_left, decomp.warm_split_right = orig_l, orig_r


if __name__ == "__main__":
    main()
