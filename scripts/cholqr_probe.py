"""Probe: can CholeskyQR2 replace the per-bond Householder QR in the
fused sweep (the QR is ~50-60% of a refresh sweep at chi=64)?

Measures on the TPU, for the hot shapes [chi*d, chi] (real) and
[2*chi*d, 2*chi] (the complex pair embedding):
  qr:    jnp.linalg.qr (current)
  cqr2:  two rounds of Gram -> Cholesky -> triangular solve (all
         MXU/blocked ops)

Each timed as a fori_loop of ``iters`` dependent applications inside one
jit (per-call dispatch on the remote service is 10-30 ms, so only fused
loops reflect device throughput).

Usage: nohup python scripts/cholqr_probe.py > /tmp/cholqr.log 2>&1 &
"""

import json
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

    f32 = jnp.float32

    def cqr_once(Y):
        G = jnp.dot(Y.T, Y, preferred_element_type=f32)
        R = jnp.linalg.cholesky(G, upper=True)
        return jax.lax.linalg.triangular_solve(
            R, Y, left_side=False, lower=False)

    def cqr2(Y):
        return cqr_once(cqr_once(Y))

    def qr(Y):
        return jnp.linalg.qr(Y)[0]

    def timed(fn, Y, iters=50, reps=3):
        @jax.jit
        def loop(Y):
            def body(_, y):
                q = fn(y)
                # feed the output back in (keeps the loop dependent);
                # re-perturb so the input stays generic
                return q + 1e-3 * y
            return jax.lax.fori_loop(0, iters, body, Y)

        out = loop(Y)
        out.block_until_ready()
        n = float(jnp.linalg.norm(out[:4, :4]))  # axon-safe barrier
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = loop(Y)
            n = float(jnp.linalg.norm(out[:4, :4]))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / iters, n

    rng = np.random.default_rng(0)
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    # [chi*d, chi] real hot shapes; [640, 128] / [1280, 256] double as the
    # complex pair embeddings ([2*chi*d, 2*chi] at chi=64 / 128)
    shapes = [(320, 64), (640, 128), (960, 192), (1280, 256), (1600, 320)]
    for R, kk in shapes:
        Y = jnp.asarray(rng.standard_normal((R, kk)).astype(np.float32))
        for name, fn in (("qr", qr), ("cqr2", cqr2)):
            try:
                t, n = timed(fn, Y)
                print(json.dumps({"shape": [R, kk], "alg": name,
                                  "s_per_call": round(t, 6)}), flush=True)
            except Exception as e:                            # noqa: BLE001
                print(json.dumps({"shape": [R, kk], "alg": name,
                                  "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
