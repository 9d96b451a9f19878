"""Probe: does the caller-side center pre-reshape let fwd K1 compile at
chi=320?  (r4: the in-kernel per-class ref-slice reshape crashed the
Mosaic remote compiler at chi=320 for every VMEM budget 64-110 MB, while
bwd K1 and both K2 kernels compiled fine — bisect log /tmp/bisect320.log.)

Runs the forward K1 kernel alone, then a full fwd bond_step, at
chi in {320, 384}, ECG200-like N=100/d=5/C=2, 64+ MB budgets.

Usage: nohup python scripts/k1_fwd_320_probe.py > /tmp/k1fwd320.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main():
    import jax
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

        t0 = time.perf_counter()
        try:
            BT, Y = pb._k1_call(eta2, center, B, le, re, phil, phir, y1h, w,
                                jnp.zeros((N, 1), f32),
                                U0, C=C, chi=chi, d=d, forward=True,
                                est=25 * 2 ** 20)
            n = float(jnp.linalg.norm(Y))
            print(f"chi={chi} vmem={vmem_mb}MB K1 fwd OK norm={n:.3f} "
                  f"compile+run {time.perf_counter()-t0:.1f} s", flush=True)
        except Exception as e:
            print(f"chi={chi} vmem={vmem_mb}MB K1 fwd FAILED: "
                  f"{str(e)[:300]}", flush=True)
            continue

        # full fwd bond_step (K1 + QR + K2)
        env_ls = jnp.zeros((N,), f32)
        eta = jnp.float32(0.05)
        cutoff = jnp.float32(0.0)
        t0 = time.perf_counter()
        try:
            out = pb.bond_step(B, center, le, re, env_ls, phil, phir, y1h,
                               w[:, 0], U0, eta, cutoff, forward=True)
            n = float(jnp.linalg.norm(out[0]))
            print(f"chi={chi} bond_step fwd OK norm={n:.3f} "
                  f"compile+run {time.perf_counter()-t0:.1f} s", flush=True)
        except Exception as e:
            print(f"chi={chi} bond_step fwd FAILED: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
