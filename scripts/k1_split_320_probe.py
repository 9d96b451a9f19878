"""Probe: do the two-kernel dp-split K1 variants (grad + update) compile
at chi=320/384 where the monolithic fwd K1 crashes the Mosaic compiler?

If yes, bond_step can route large-chi bonds through grad+update (without
the psum) — same math, pinned by the existing dp contract test — and the
chi>256 XLA fallback retires.

Usage: nohup python scripts/k1_split_320_probe.py > /tmp/k1split320.log 2>&1 &
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

    N, d, C = 100, 5, 2
    rng = np.random.default_rng(0)

    for chi, vmem_mb in [(320, 96), (384, 110)]:
        pb.set_vmem_limit(vmem_mb * 2 ** 20)
        f32 = jnp.float32
        center = jnp.asarray(rng.standard_normal((C, chi, d, chi)) / chi, f32)
        B = jnp.asarray(rng.standard_normal((chi, d, chi)) / chi, f32)
        le = jnp.asarray(rng.standard_normal((N, chi)), f32)
        re = jnp.asarray(rng.standard_normal((N, chi)), f32)
        phil = jnp.asarray(rng.standard_normal((N, d)), f32)
        phir = jnp.asarray(rng.standard_normal((N, d)), f32)
        y1h = jnp.asarray(np.eye(C, dtype=np.float32)[rng.integers(0, C, N)])
        w = jnp.full((N, 1), 1.0 / N, f32)
        U0 = jnp.asarray(rng.standard_normal((chi * d, chi)), f32)
        eta2 = jnp.full((1, 1), 0.05, f32)

        for fwd in (True, False):
            left, right = (center, B) if fwd else (B, center)
            t0 = time.perf_counter()
            try:
                G = pb._k1_grad_call(left, right, le, re, phil, phir, y1h, w,
                                     jnp.zeros((N, 1), f32),
                                     C=C, chi=chi, d=d, forward=fwd)
                n = float(jnp.linalg.norm(G[0, :8, 0, :8]))
                print(f"chi={chi} fwd={fwd} grad OK norm={n:.5f} "
                      f"{time.perf_counter()-t0:.1f} s", flush=True)
            except Exception as e:
                print(f"chi={chi} fwd={fwd} grad FAILED {str(e)[:160]}",
                      flush=True)
                continue
            t0 = time.perf_counter()
            try:
                BT, Y = pb._k1_update_call(eta2, left, right, G, U0,
                                           C=C, chi=chi, d=d, forward=fwd)
                n = float(jnp.linalg.norm(Y[:8, :8]))
                print(f"chi={chi} fwd={fwd} update OK norm={n:.5f} "
                      f"{time.perf_counter()-t0:.1f} s", flush=True)
            except Exception as e:
                print(f"chi={chi} fwd={fwd} update FAILED {str(e)[:160]}",
                      flush=True)


if __name__ == "__main__":
    main()
