"""Prototype: matmul-only randomized split (CholeskyQR2 orthogonalization)
vs the current QR-based randomized split and exact SVD, on CPU x64/f32.

Checks on realistic DMRG bond matrices (fast-decaying spectrum + exact
rank deficiency): isometry error of the kept basis, truncation error vs
optimal, masked-zero invariant.
"""

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from mpstime_tpu.ops import decomp


def cholqr2(Y, eps_rel=1e-6):
    """Orthonormalize Y [n, k] with two shifted-Cholesky QR passes."""
    k = Y.shape[1]
    for _ in range(2):
        G = Y.conj().T @ Y
        shift = eps_rel * jnp.trace(G).real / k
        R = jnp.linalg.cholesky(G + shift * jnp.eye(k, dtype=G.dtype))
        Y = jax.scipy.linalg.solve_triangular(
            R.conj().T, Y.conj().T, lower=False, trans='N').conj().T \
            if False else \
            jax.lax.linalg.triangular_solve(R, Y, left_side=False,
                                            lower=True, conjugate_a=True,
                                            transpose_a=True)
    return Y


def rsplit_left_cholqr(M, keep, cutoff, q=2):
    R_, C = M.shape
    k = decomp._sketch_k(keep, C)
    Psi = decomp._fixed_sketch((R_, k), M.dtype)
    Y = M.conj().T @ (M @ (M.conj().T @ Psi))
    for _ in range(q - 1):
        Y = M.conj().T @ (M @ Y)
    # normalize columns before cholqr (huge dynamic range from power its)
    Y = Y / jnp.maximum(jnp.linalg.norm(Y, axis=0, keepdims=True),
                        jnp.finfo(Y.real.dtype).tiny)
    Q = cholqr2(Y)
    B = M @ Q
    S = B.conj().T @ B
    w, W = jnp.linalg.eigh(S)
    w = w[::-1]; W = W[:, ::-1]
    mask = decomp._trunc_mask(w, keep, cutoff)
    Qt = Q @ (W[:, :keep] * mask[:keep])
    US = M @ Qt
    Vh = Qt.conj().T
    return US, Vh


def bond_matrix(rng, R, C, decay=0.05, rank=None):
    r = min(R, C) if rank is None else rank
    U, _ = np.linalg.qr(rng.standard_normal((R, min(R, C))))
    V, _ = np.linalg.qr(rng.standard_normal((C, min(R, C))))
    s = np.exp(-decay * np.arange(min(R, C)))
    if rank is not None:
        s[rank:] = 0.0
    return (U * s) @ V.T


def report(name, M, US, Vh, keep):
    M = np.asarray(M); US = np.asarray(US); Vh = np.asarray(Vh)
    approx = US @ Vh
    err = np.linalg.norm(M - approx) / np.linalg.norm(M)
    s = np.linalg.svd(M, compute_uv=False)
    opt = np.sqrt(max(np.sum(s[keep:] ** 2), 0.0)) / np.linalg.norm(M)
    # isometry of kept rows of Vh
    live = np.linalg.norm(Vh, axis=1) > 1e-12
    G = Vh[live] @ Vh[live].conj().T
    iso = np.abs(G - np.eye(G.shape[0])).max()
    print(f"{name:24s} trunc_err {err:.3e} (opt {opt:.3e})  iso_err {iso:.2e} "
          f"live {live.sum()}")


if __name__ == "__main__":
    rng = np.random.default_rng(1)
    for dt in [np.float32]:
        for (R, C) in [(640, 320), (320, 640)]:
            for rank in [None, 40, 8]:
                M = jnp.asarray(bond_matrix(rng, R, C, rank=rank).astype(dt))
                keep = 64
                print(f"--- shape {R}x{C} rank {rank} {np.dtype(dt).name}")
                US, Vh = decomp.split_bond_left(M, keep, 1e-10, "svd")
                report("svd", M, US, Vh, keep)
                US, Vh = decomp.split_bond_left(M, keep, 1e-10, "randomized")
                report("randomized(qr)", M, US, Vh, keep)
                US, Vh = rsplit_left_cholqr(M, keep, 1e-10)
                report("randomized(cholqr2)", M, US, Vh, keep)
