"""Bisect which complex pair kernel kills the remote compile helper at
chi>=192 (the full fourier c64 fused sweep gets the helper SIGKILLed —
host OOM during compile — where the real path at the same estimated
residents compiles fine; pair kernels are ~4x the op count).

Probes each kernel of the complex bond step in isolation:
  k1_emit0: _k1c_call with emit_y=False (BT + grad + TSGO, no power tail)
  k1_tail:  _k1c_tail_call (the standalone pair power step, q=3)
  k1_full:  _k1c_call with emit_y=True, q=3 (the monolith)
  k2:       _k2c_call

Usage: python scripts/k1c_bisect.py [chi] [stage ...]
"""

import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main():
    import jax.numpy as jnp

    from mpstime_tpu.ops import pallas_bond as pb
    from mpstime_tpu.ops import pallas_bond_c as pbc

    chi = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    only = sys.argv[2:]
    N, d, C = 100, 5, 2
    f32 = jnp.float32
    rng = np.random.default_rng(0)

    def r(*shape):
        return jnp.asarray(rng.standard_normal(shape) / np.sqrt(chi), f32)

    def pair(*shape):
        return (r(*shape), r(*shape))

    left = pair(C, chi, d, chi)
    right = pair(chi, d, chi)
    le, re = pair(N, chi), pair(N, chi)
    phil, phir = pair(N, d), pair(N, d)
    y1h = jnp.asarray(np.eye(C, dtype=np.float32)[rng.integers(0, C, N)])
    w = jnp.full((N, 1), 1.0 / N, f32)
    V0 = pair(chi * d, chi)
    BTp = pair(C, chi * d, d, chi)
    eta2 = jnp.full((1, 1), 0.05, f32)
    est = 2 * pb.kernel_footprint(C, chi, d, N)
    print(f"chi={chi} est={est / 2 ** 20:.1f} MB", flush=True)

    def run(name, fn):
        if only and name not in only:
            return
        t0 = time.perf_counter()
        try:
            out = fn()
            n = float(jnp.linalg.norm(out[0][:8, :8]))
            print(f"{name}: OK norm={n:.5f} {time.perf_counter()-t0:.1f} s",
                  flush=True)
        except Exception as e:                                # noqa: BLE001
            print(f"{name}: FAILED {str(e)[:200]}", flush=True)

    fwd = True
    run("k1_emit0", lambda: pbc._k1c_call(
        eta2, y1h, w, (left[0], left[1]), right, le, re, phil, phir, V0,
        C=C, chi=chi, d=d, forward=fwd, emit_y=False, q=3, orth="qr",
        est=est)[2:])
    run("k1_tail", lambda: pbc._k1c_tail_call(
        BTp, V0, C=C, chi=chi, d=d, forward=fwd, q=3, est=est))
    run("k1_full", lambda: pbc._k1c_call(
        eta2, y1h, w, (left[0], left[1]), right, le, re, phil, phir, V0,
        C=C, chi=chi, d=d, forward=fwd, emit_y=True, q=3, orth="qr",
        est=est)[2:])
    cut2 = jnp.stack([jnp.float32(1e-10), jnp.float32(chi)])[None, :]
    run("k2", lambda: pbc._k2c_call(
        cut2, BTp, V0, le, jnp.zeros((N, 1), f32), phil,
        C=C, chi=chi, d=d, forward=fwd, est=est)[4:])


if __name__ == "__main__":
    main()
