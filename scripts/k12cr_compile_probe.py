"""Bisect the on-chip Mosaic compile of the K12cr tracked-ritz kernel.

The r5 chip session's ritz_fused probe hung >45 min inside the FIRST
compile of the full_sweeps K12cr program (fourier chi=64), with zero
compile-cache growth — this probe compiles ONE bond_step_c_ritz call at
a given (chi, rounds, q) so the hang can be localized: kernel vs sweep
program, and the chi/rounds threshold.

Usage (each cell is its own process; run sequentially, quiet machine):
  python scripts/k12cr_compile_probe.py <chi> [rounds] [q] [fwd|bwd]
Prints one JSON line: compile+first-run seconds or the error.
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np                                           # noqa: E402


def main():
    chi = int(sys.argv[1]) if len(sys.argv) > 1 else 16
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

    A = pair(chi, d, chi)
    center = pair(C, chi, d, chi)
    le = pair(N, chi)
    re = pair(N, chi)
    re_ls = jnp.zeros((N,), f32)
    phil = pair(N, d)
    phir = pair(N, d)
    y1h = jnp.asarray(np.eye(C, dtype=np.float32)[rng.integers(0, C, N)])
    w = jnp.full((N,), 1.0 / N, f32)
    V0 = pair(d * chi, chi)
    eta, cutoff = f32(0.05), f32(1e-10)

    t0 = time.perf_counter()
    out = pallas_bond_c.bond_step_c_ritz(
        A, center, le, re, re_ls, phil, phir, y1h, w, V0, eta, cutoff,
        forward=forward, refresh=True, power_iters=q, rounds=rounds)
    s = float(jnp.linalg.norm(out[0][0]))
    dt = time.perf_counter() - t0
    print(json.dumps({"chi": chi, "rounds": rounds, "q": q,
                      "forward": forward, "compile_plus_run_s": round(dt, 2),
                      "norm": round(s, 4)}), flush=True)


if __name__ == "__main__":
    main()
