"""Compiled-vs-interpret parity of ONE K12cr bond step on the real chip.

The r5 chip probe showed every K12cr training cell collapsing to the
majority class (train_acc 0.69 on ECG200) while the f64 XLA oracle holds
the band — this checks whether the compiled Mosaic kernel computes the
same thing as the (CPU-validated) interpret-mode kernel on identical
inputs, isolating miscompile vs algorithmic-f32-drift.

  python scripts/k12cr_chip_parity.py [chi] [rounds] [q] [fwd|bwd]
"""

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np                                           # noqa: E402


def main():
    chi = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    q = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    forward = (sys.argv[4] == "fwd") if len(sys.argv) > 4 else False

    import jax.numpy as jnp

    from mpstime_tpu.ops import pallas_bond_c

    N, d, C = 100, 5, 2
    rng = np.random.default_rng(0)
    f32 = jnp.float32

    def pair(*shape):
        return (jnp.asarray(rng.standard_normal(shape), f32),
                jnp.asarray(rng.standard_normal(shape), f32))

    args = (pair(chi, d, chi), pair(C, chi, d, chi), pair(N, chi),
            pair(N, chi), jnp.zeros((N,), f32), pair(N, d), pair(N, d),
            jnp.asarray(np.eye(C, dtype=np.float32)[rng.integers(0, C, N)]),
            jnp.full((N,), 1.0 / N, f32), pair(d * chi, chi))
    kw = dict(forward=forward, refresh=True, power_iters=q, rounds=rounds)
    eta, cutoff = f32(0.05), f32(1e-10)

    out_c = pallas_bond_c.bond_step_c_ritz(*args, eta, cutoff, **kw)
    outs_c = [np.asarray(x) for pr in out_c
              for x in (pr if isinstance(pr, tuple) else (pr,))]

    from mpstime_tpu.ops import pallas_bond as pb
    pb.set_interpret(True)
    try:
        out_i = pallas_bond_c.bond_step_c_ritz(*args, eta, cutoff, **kw)
    finally:
        pb.set_interpret(False)
    outs_i = [np.asarray(x) for pr in out_i
              for x in (pr if isinstance(pr, tuple) else (pr,))]

    names = ["center_r", "center_i", "core_r", "core_i", "env_r", "env_i",
             "env_ls", "q_r", "q_i"]
    res = {}
    for nm, a, b in zip(names, outs_c, outs_i):
        scale = max(float(np.abs(b).max()), 1e-30)
        res[nm] = round(float(np.abs(a - b).max()) / scale, 8)
    print(json.dumps({"chi": chi, "rounds": rounds, "q": q,
                      "forward": forward, "rel_max_diff": res}), flush=True)


if __name__ == "__main__":
    main()
