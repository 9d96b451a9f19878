"""Microbenchmark the sweep's per-bond components on the real device.

Isolates: (a) full sweep at each svd_alg, (b) a sweep variant with the split
replaced by a no-op reshape (gradient+env cost only), (c) standalone split
timings at the bond shapes, (d) env rebuild cost.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.linalg.norm(x))


def timeit(fn, *args, reps=10, warm=2):
    for _ in range(warm):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(jax.tree_util.tree_leaves(out)[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    import mpstime_tpu as mt
    from mpstime_tpu.encodings import encode_dataset
    from mpstime_tpu.models.mps import random_mps
    from mpstime_tpu.training.sweep import full_sweep
    from mpstime_tpu.utils.preprocessing import transform_data
    from mpstime_tpu.ops import decomp
    from mpstime_tpu.ops.bond_update import apply_update
    from mpstime_tpu.ops.env import build_left_envs

    d_npz = np.load("tests/data/ecg200.npz")
    X, y = d_npz["X_train"], d_npz["y_train"]
    chi, d = 64, 5
    opts = mt.MPSOptions(chi_max=chi, d=d, verbosity=-1, dtype="float32")
    Xs, _, _, _ = transform_data(X, np.zeros((0, X.shape[1])), opts)
    ds = encode_dataset(X, Xs, y, opts)
    T, N = X.shape[1], X.shape[0]
    C = ds.num_classes
    mps = random_mps(opts.init_rng, T, d, C, opts.chi_init, chi, np.float32)
    phis_c = jnp.conj(ds.X_enc).swapaxes(0, 1)
    y_onehot = jnp.asarray(np.eye(C, dtype=np.float32)[ds.y_idx])
    w = jnp.full((N,), 1.0 / N, jnp.float32)
    eta = jnp.float32(0.01)
    cutoff = jnp.float32(1e-10)

    kw = dict(loss="KLD", bbopt="TSGO", update_iters=1, rescale=(False, True))

    for alg in ["randomized", "gram_eigh", "svd"]:
        t = timeit(lambda c, z: full_sweep(c, z, phis_c, y_onehot, w, eta,
                                           cutoff, svd_alg=alg, **kw),
                   mps.cores, mps.center, reps=5)
        print(f"full_sweep[{alg:10s}]: {t*1e3:8.2f} ms "
              f"({t*1e3/(2*(T-1)):6.3f} ms/bond)")

    # standalone split at the backward bond shape [chi*d*C, d*chi]
    rng = np.random.default_rng(0)
    M1 = jnp.asarray(rng.standard_normal((chi * d * C, d * chi)).astype(np.float32))
    M2 = jnp.asarray(rng.standard_normal((chi * d, d * chi * C)).astype(np.float32))
    for alg in ["randomized", "gram_eigh", "svd"]:
        f1 = jax.jit(partial(decomp.split_bond_left, keep=chi, cutoff=1e-10, alg=alg))
        f2 = jax.jit(partial(decomp.split_bond_right, keep=chi, cutoff=1e-10, alg=alg))
        t1 = timeit(f1, M1, reps=20)
        t2 = timeit(f2, M2, reps=20)
        print(f"split[{alg:10s}]: left {t1*1e3:7.3f} ms   right {t2*1e3:7.3f} ms")

    # standalone pieces of the randomized split
    k = decomp._sketch_k(chi, d * chi)
    Y = jnp.asarray(rng.standard_normal((d * chi, k)).astype(np.float32))
    S72 = jnp.asarray(rng.standard_normal((k, k)).astype(np.float32))
    S72 = S72 @ S72.T
    tqr = timeit(jax.jit(jnp.linalg.qr), Y, reps=20)
    teig = timeit(jax.jit(jnp.linalg.eigh), S72, reps=20)

    def mm(Mx, Yx):
        return Mx.T @ (Mx @ Yx)

    tmm = timeit(jax.jit(mm), M1, Y, reps=20)
    print(f"pieces: qr[{d*chi},{k}] {tqr*1e3:.3f} ms  eigh[{k},{k}] "
          f"{teig*1e3:.3f} ms  powermm {tmm*1e3:.3f} ms")

    # gradient + update only (one bond, jitted alone)
    le = jnp.asarray(rng.standard_normal((N, chi)).astype(np.float32))
    re = jnp.asarray(rng.standard_normal((N, chi)).astype(np.float32))
    BT = jnp.asarray(rng.standard_normal((chi, d, d, chi, C)).astype(np.float32))
    pl_ = phis_c[0].conj()
    pr_ = phis_c[1].conj()
    els = jnp.zeros((N,), np.float32)
    fupd = jax.jit(partial(apply_update, eta=eta, loss="KLD", bbopt="TSGO",
                           update_iters=1, rescale=(False, True)))
    tupd = timeit(lambda b: fupd(b, le, re, pl_, pr_, y_onehot, w, els), BT,
                  reps=20)
    print(f"apply_update (1 bond, standalone): {tupd*1e3:.3f} ms")

    tenv = timeit(jax.jit(build_left_envs), mps.cores, phis_c, reps=10)
    print(f"build_left_envs (T={T}): {tenv*1e3:.3f} ms")


if __name__ == "__main__":
    main()
