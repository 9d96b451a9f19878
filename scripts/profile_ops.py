"""On-device per-op costs: run each candidate op R times *inside one jit*
(chained through a data dependency so XLA can't collapse the loop), subtract
an empty-loop baseline, divide by R.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.linalg.norm(jnp.ravel(x)[:1]))


def chain_time(make_step, x0, R=64, reps=5):
    """make_step(x) -> y with y.shape == x.shape-compatible chain input."""

    @jax.jit
    def run(x):
        def body(i, x):
            return make_step(x)
        return jax.lax.fori_loop(0, R, body, x)

    out = run(x0)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(x0)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / R


def main():
    rng = np.random.default_rng(0)
    chi, d, C, N = 64, 5, 2, 100
    Rm, Cm = chi * d * C, d * chi          # 640, 320
    k = 72

    M0 = jnp.asarray(rng.standard_normal((Rm, Cm)).astype(np.float32))

    def renorm(x):
        return x / jnp.linalg.norm(x)

    t_base = chain_time(lambda M: M * 1.000001, M0, R=256)
    print(f"baseline mul            : {t_base*1e6:9.1f} us")

    # QR of [Cm, k]
    Y0 = jnp.asarray(rng.standard_normal((Cm, k)).astype(np.float32))
    def step_qr(Y):
        Q, _ = jnp.linalg.qr(Y)
        return Q + 1e-6 * Y
    print(f"qr[{Cm},{k}]            : {chain_time(step_qr, Y0)*1e6:9.1f} us")

    # eigh of [k, k]
    S0 = jnp.asarray(rng.standard_normal((k, k)).astype(np.float32))
    S0 = S0 @ S0.T + k * jnp.eye(k)
    def step_eigh(S):
        w, W = jnp.linalg.eigh(S)
        return S + 1e-6 * (W * w) @ W.T
    print(f"eigh[{k},{k}]            : {chain_time(step_eigh, S0)*1e6:9.1f} us")

    # eigh of [Cm, Cm]
    G0 = jnp.asarray(rng.standard_normal((Cm, Cm)).astype(np.float32))
    G0 = G0 @ G0.T + Cm * jnp.eye(Cm)
    def step_eighG(S):
        w, W = jnp.linalg.eigh(S)
        return S + 1e-6 * (W * w) @ W.T
    print(f"eigh[{Cm},{Cm}]          : {chain_time(step_eighG, G0, R=16)*1e6:9.1f} us")

    # cholesky + triangular solve [k,k] applied to [Cm,k]
    def step_chol(Y):
        G = Y.T @ Y
        Rc = jnp.linalg.cholesky(G + 1e-5 * jnp.trace(G) / k * jnp.eye(k))
        Q = jax.lax.linalg.triangular_solve(Rc, Y, left_side=False,
                                            lower=True, transpose_a=True)
        return Q + 1e-6 * Y
    print(f"cholqr[{Cm},{k}]        : {chain_time(step_chol, Y0)*1e6:9.1f} us")

    # power-iteration matmuls: Mh (M (Mh Psi)) with fixed Psi
    Psi = jnp.asarray(rng.standard_normal((Rm, k)).astype(np.float32))
    def step_pow(M):
        Y = M.T @ (M @ (M.T @ Psi))
        return renorm(M + 1e-9 * (Psi @ Y.T).T[:Rm].reshape(M.shape) if False else M * 1.000001 + 0 * jnp.sum(Y) )
    # simpler: chain through Y by adding its norm
    def step_pow2(M):
        Y = M.T @ (M @ (M.T @ Psi))
        return M * 1.000001 + jnp.sum(Y) * 1e-20
    print(f"power mm x3             : {chain_time(step_pow2, M0)*1e6:9.1f} us")

    # gradient einsums (KLD): L[N,chid] conj, t, yhat, RW, grad
    L0 = jnp.asarray(rng.standard_normal((N, chi * d)).astype(np.float32))
    R0 = jnp.asarray(rng.standard_normal((N, d * chi)).astype(np.float32))
    BT0 = jnp.asarray(rng.standard_normal((chi * d, d * chi, C)).astype(np.float32))
    yh = jnp.asarray(np.eye(C, dtype=np.float32)[rng.integers(0, C, N)])
    wgt = jnp.full((N,), 1.0 / N, np.float32)
    def step_grad(BTm):
        t = jnp.einsum("nx,xyc->nyc", L0, BTm)
        yhat = jnp.einsum("nyc,ny->nc", t, R0)
        y_true = jnp.sum(yhat * yh, axis=1)
        u = wgt / y_true
        Wc = yh * u[:, None]
        RW = R0[:, :, None] * Wc[:, None, :]
        g = -jnp.einsum("nx,nyc->xyc", L0, RW)
        g = g / jnp.linalg.norm(g)
        return BTm - 0.01 * g
    print(f"kld grad+tsgo update    : {chain_time(step_grad, BT0)*1e6:9.1f} us")

    # env step: two einsums [N,chi]x[chi,d,chi]x[N,d] + normalize
    v0 = jnp.asarray(rng.standard_normal((N, chi)).astype(np.float32))
    core = jnp.asarray(rng.standard_normal((chi, d, chi)).astype(np.float32))
    ph = jnp.asarray(rng.standard_normal((N, d)).astype(np.float32))
    def step_env(v):
        tmp = jnp.einsum("na,aib->nib", v, core)
        v2 = jnp.einsum("nib,ni->nb", tmp, ph)
        nrm = jnp.linalg.norm(v2, axis=1, keepdims=True)
        return v2 / jnp.where(nrm > 0, nrm, 1.0)
    print(f"env step + normalize    : {chain_time(step_env, v0)*1e6:9.1f} us")

    # full randomized split (left)
    from mpstime_tpu.ops import decomp
    def step_split(M):
        US, Vh = decomp.split_bond_left(M, chi, 1e-10, "randomized")
        return M * 1.000001 + 1e-20 * jnp.sum(US)
    print(f"randomized split (left) : {chain_time(step_split, M0)*1e6:9.1f} us")

    # .at[].set of one core slot in a [T,chi,d,chi] stack
    T = 96
    cores0 = jnp.asarray(rng.standard_normal((T, chi, d, chi)).astype(np.float32))
    def step_set(cs):
        return cs.at[40].set(cs[41] * 1.000001)
    print(f"cores .at[].set         : {chain_time(step_set, cores0, R=256)*1e6:9.1f} us")


if __name__ == "__main__":
    main()
