"""Bisect which part of the fwd K1 kernel body crashes the Mosaic remote
compiler at chi=320 (bwd compiles; fwd fails fast at every VMEM budget).

Stages (cumulative):
  bt:    form BT blocks, write bt_ref
  yhat:  + per-class scaled yhat (L @ BT_ck, row-reduce)
  grad:  + KLD gradient G blocks
  tsgo:  + TSGO update + global renormalize (the full body, emit_y=False)

Usage: python scripts/k1_fwd_bisect.py [chi]
"""

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mpstime_tpu.ops.pallas_bond import _kron_batch_major, _vmem

    chi = int(sys.argv[1]) if len(sys.argv) > 1 else 320
    N, d, C = 100, 5, 2
    f32 = jnp.float32
    rng = np.random.default_rng(0)

    left = jnp.asarray(rng.standard_normal((C, chi * d, chi)) / chi, f32)
    right = jnp.asarray(rng.standard_normal((d, chi, chi)) / chi, f32)
    le = jnp.asarray(rng.standard_normal((N, chi)), f32)
    re = jnp.asarray(rng.standard_normal((N, chi)), f32)
    phil = jnp.asarray(rng.standard_normal((N, d)), f32)
    phir = jnp.asarray(rng.standard_normal((N, d)), f32)
    y1h = jnp.asarray(np.eye(C, dtype=np.float32)[rng.integers(0, C, N)])
    w = jnp.full((N, 1), 1.0 / N, f32)

    def kern(stage, left_ref, right_ref, le_ref, re_ref, phil_ref, phir_ref,
             y1h_ref, w_ref, bt_ref):
        le_v = le_ref[:]
        re_v = re_ref[:]
        phil_v = phil_ref[:]
        phir_v = phir_ref[:]
        y1h_v = y1h_ref[:]
        w_v = w_ref[:]
        L = _kron_batch_major(le_v, phil_v)

        BT = [[None] * d for _ in range(C)]
        yhat = []
        for c in range(C):
            acc = None
            Cc2 = left_ref[c]
            for k in range(d):
                BT_ck = jnp.dot(Cc2, right_ref[k], preferred_element_type=f32)
                BT[c][k] = BT_ck
                if stage >= 1:
                    t_ck = jnp.dot(L, BT_ck, preferred_element_type=f32)
                    R_k = phir_v[:, k:k + 1] * re_v
                    part = jnp.sum(t_ck * R_k, axis=1, keepdims=True)
                    acc = part if acc is None else acc + part
            yhat.append(acc)

        if stage >= 2:
            y_true = sum(yhat[c] * y1h_v[:, c:c + 1] for c in range(C))
            u = w_v / y_true
            G = [[None] * d for _ in range(C)]
            g2 = jnp.zeros((), f32)
            for c in range(C):
                wc = y1h_v[:, c:c + 1] * u
                for k in range(d):
                    R_k = phir_v[:, k:k + 1] * re_v
                    G_ck = -jnp.dot(L.T, R_k * wc, preferred_element_type=f32)
                    G[c][k] = G_ck
                    g2 = g2 + jnp.sum(G_ck * G_ck)
            gn = jax.lax.rsqrt(jnp.maximum(g2, jnp.finfo(f32).tiny))

        if stage >= 3:
            b2 = jnp.zeros((), f32)
            for c in range(C):
                for k in range(d):
                    BT[c][k] = BT[c][k] - (0.05 * gn) * G[c][k]
                    b2 = b2 + jnp.sum(BT[c][k] * BT[c][k])
            bn = jax.lax.rsqrt(jnp.maximum(b2, jnp.finfo(f32).tiny))
            for c in range(C):
                for k in range(d):
                    BT[c][k] = BT[c][k] * bn

        for c in range(C):
            for k in range(d):
                bt_ref[c, :, k, :] = BT[c][k]

    names = ["bt", "yhat", "grad", "tsgo"]
    only = [a for a in sys.argv[2:] if not a.startswith("-")]
    for stage, name in enumerate(names):
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            out = pl.pallas_call(
                functools.partial(kern, stage),
                out_shape=jax.ShapeDtypeStruct((C, chi * d, d, chi), f32),
                in_specs=[_vmem()] * 8,
                out_specs=_vmem(),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=96 * 2 ** 20),
            )(left, right, le, re, phil, phir, y1h, w)
            n = float(jnp.linalg.norm(out[0, :8, 0, :8]))
            print(f"stage {name}: OK norm={n:.4f} "
                  f"{time.perf_counter()-t0:.1f} s", flush=True)
        except Exception as e:
            print(f"stage {name}: FAILED {str(e)[:200]}", flush=True)

    # ---- stages above "tsgo": V0/y_ref plumbing, the fwd power tail, and
    # the SMEM eta — the remaining deltas vs the real _k1_kernel
    from mpstime_tpu.ops.pallas_bond import _power_step_tail, _smem_scalar

    V0 = jnp.asarray(rng.standard_normal((chi * d, chi)), f32)
    eta2 = jnp.full((1, 1), 0.05, f32)

    def kern2(mode, left_ref, right_ref, le_ref, re_ref, phil_ref, phir_ref,
              y1h_ref, w_ref, v0_ref, bt_ref, y_ref):
        kern(3, left_ref, right_ref, le_ref, re_ref, phil_ref, phir_ref,
             y1h_ref, w_ref, bt_ref)
        BT = [[bt_ref[c, :, k, :] for k in range(d)] for c in range(C)]
        if mode == "emit0":
            y_ref[:] = v0_ref[:]
        else:
            _power_step_tail(BT, v0_ref[:], y_ref, C=C, chi=chi, d=d,
                             forward=True, emit_y=True, q=1)

    for mode in ["emit0", "tail"]:
        if only and mode not in only:
            continue
        t0 = time.perf_counter()
        try:
            out = pl.pallas_call(
                functools.partial(kern2, mode),
                out_shape=(jax.ShapeDtypeStruct((C, chi * d, d, chi), f32),
                           jax.ShapeDtypeStruct((chi * d, chi), f32)),
                in_specs=[_vmem()] * 9,
                out_specs=(_vmem(), _vmem()),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=96 * 2 ** 20),
            )(left, right, le, re, phil, phir, y1h, w, V0)
            n = float(jnp.linalg.norm(out[1][:8, :8]))
            print(f"stage {mode}: OK norm={n:.4f} "
                  f"{time.perf_counter()-t0:.1f} s", flush=True)
        except Exception as e:
            print(f"stage {mode}: FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
