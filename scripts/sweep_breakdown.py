"""On-TPU cost breakdown of the sweep via differential timing of
full_sweeps(nsweeps=20) variants (dispatch amortized to ~1.5 ms/sweep).

 - update_iters 1 vs 3      -> marginal cost of one grad+update per bond
 - randomized vs lean       -> cost of Ritz eigh + oversampling
 - lean q=3 vs q=0          -> cost of power-iteration matmuls
 - randomized vs gram_eigh  -> sanity anchor
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "scripts")
from lean_split_check import make_train_state  # noqa: E402

from mpstime_tpu.ops import decomp  # noqa: E402
from mpstime_tpu.training.sweep import full_sweeps  # noqa: E402

NS = 20


def run(tag, mps, phis_c, y_onehot, w, eta, cutoff, alg, iters):
    kw = dict(loss="KLD", bbopt="TSGO", update_iters=iters,
              rescale=(False, True))
    t0 = time.perf_counter()
    cores, center = full_sweeps(mps.cores, mps.center, phis_c, y_onehot, w,
                                eta, cutoff, nsweeps=NS, svd_alg=alg, **kw)
    float(jnp.linalg.norm(center))
    tfirst = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        cores, center = full_sweeps(mps.cores, mps.center, phis_c, y_onehot,
                                    w, eta, cutoff, nsweeps=NS, svd_alg=alg,
                                    **kw)
        float(jnp.linalg.norm(center))
        times.append(time.perf_counter() - t0)
    t = float(np.median(times)) / NS
    print(f"{tag:28s} {t*1e3:8.2f} ms/sweep  ({t*1e3/190:6.3f} ms/bond)  "
          f"first {tfirst:.0f}s", flush=True)
    return t


def main():
    opts, ds, ds_te, mps, phis_c, y_onehot, w, T = make_train_state(jnp)
    eta = jnp.float32(opts.eta)
    cutoff = jnp.float32(opts.cutoff)
    a = (mps, phis_c, y_onehot, w, eta, cutoff)

    run("randomized it=1", *a, "randomized", 1)
    run("randomized it=3", *a, "randomized", 3)
    run("lean q=3 it=1", *a, "randomized_lean", 1)

    orig_l, orig_r = decomp.lean_split_left, decomp.lean_split_right
    decomp.lean_split_left = functools.partial(orig_l, q=0)
    decomp.lean_split_right = functools.partial(orig_r, q=0)
    jax.clear_caches()
    run("lean q=0 it=1", *a, "randomized_lean", 1)
    decomp.lean_split_left, decomp.lean_split_right = orig_l, orig_r

    run("gram_eigh it=1", *a, "gram_eigh", 1)


if __name__ == "__main__":
    main()
