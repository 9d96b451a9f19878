"""What is the floor of the per-bond loop?  All inside single jits:
  A. warm sweep, update_iters=0, null split  (skeleton: einsum+env+sets)
  B. pure fori_loop over 190*NS trivial iterations
  C. fori_loop with one dynamic-slice read + DUS write on cores-sized array
  D. fori_loop with the env step only
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
NB = 190


def sync(x):
    return float(jnp.linalg.norm(jnp.ravel(x)[:4]))


def timeloop(tag, fn, *args, per=NS * NB):
    out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts)) / per
    print(f"{tag:36s} {t*1e6:8.2f} us/iter", flush=True)


def main():
    opts, ds, ds_te, mps, phis_c, y_onehot, w, T = make_train_state(jnp)
    eta = jnp.float32(opts.eta)
    cutoff = jnp.float32(opts.cutoff)

    # A. skeleton sweep
    def wl_null(M, V0, keep, cutoff, q=1):
        return M[:, :keep], M[:keep, :], V0

    decomp.warm_split_left = wl_null
    decomp.warm_split_right = wl_null
    kw = dict(loss="KLD", bbopt="TSGO", update_iters=0, rescale=(False, False))
    timeloop("A skeleton sweep (no upd/split)",
             lambda c, z: sweepmod.full_sweeps(
                 c, z, phis_c, y_onehot, w, eta, cutoff, nsweeps=NS,
                 svd_alg="randomized_warm", **kw),
             mps.cores, mps.center)

    # B. trivial fori_loop
    @jax.jit
    def trivial(x):
        return jax.lax.fori_loop(0, NS * NB, lambda i, v: v * 1.0000001, x)

    timeloop("B trivial fori_loop", trivial, jnp.ones((8, 128), jnp.float32))

    # C. dynamic read + write on cores-sized stack
    cores0 = mps.cores

    @jax.jit
    def dus(cs):
        def body(i, cs):
            j = i % (T - 1)
            blk = cs[j] * 1.000001
            return cs.at[j + 1].set(blk)
        return jax.lax.fori_loop(0, NS * NB, body, cs)

    timeloop("C dyn slice+DUS on cores stack", dus, cores0)

    # D. env step chain
    from mpstime_tpu.ops.env import env_step_right_scaled
    v0 = jnp.ones((phis_c.shape[1], opts.chi_max), jnp.float32)
    ls0 = jnp.zeros((phis_c.shape[1],), jnp.float32)
    core = mps.cores[0]

    @jax.jit
    def envchain(v, ls):
        def body(i, state):
            v, ls = state
            return env_step_right_scaled(v, ls, core, phis_c[0])
        return jax.lax.fori_loop(0, NS * NB, body, (v, ls))

    timeloop("D env step chain", envchain, v0, ls0)

    # E. KLD grad+TSGO chain (standalone apply_update per iter)
    from mpstime_tpu.ops.bond_update import apply_update
    rng = np.random.default_rng(0)
    BT0 = jnp.asarray(rng.standard_normal(
        (opts.chi_max, opts.d, opts.d, opts.chi_max, 2)).astype(np.float32))
    le = jnp.ones((phis_c.shape[1], opts.chi_max), jnp.float32)
    els = jnp.zeros((phis_c.shape[1],), jnp.float32)

    @jax.jit
    def gradchain(BT):
        def body(i, BT):
            _, BT = apply_update(BT, le, le, phis_c[0].conj(),
                                 phis_c[1].conj(), y_onehot, w, els,
                                 eta=eta, loss="KLD", bbopt="TSGO",
                                 update_iters=1, rescale=(False, True))
            return BT
        return jax.lax.fori_loop(0, NS * NB, body, BT)

    timeloop("E grad+TSGO chain", gradchain, BT0)


if __name__ == "__main__":
    main()
