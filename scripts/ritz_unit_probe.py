"""Per-bond op-cost microbenchmarks for the tracked-ritz fusion design (r5).

The complex large-chi quality route (svd_alg="randomized_warm_ritz",
tracked) runs 0.068 s/sweep on the XLA bond path at fourier chi=64
(scripts/ritz_tpu_probe.py ritz_track res=0 qr cells).  To fuse its
matmul bulk into the Pallas pair kernels we need the cost of every op
that would REMAIN on XLA between kernels, per bond, at the target shapes
(chi=64, d=5, C=2 -> warm basis [d*chi, chi] = [320, 64], realified
Householder QR input [640, 128]; tracker Gram S [64, 64] complex ->
realified [128, 128]):

  ctrl_mm     two [640,128]-ish matmuls (scan-step floor / control)
  qr_640x128  the orth="qr" warm-refresh QR (realified pair embedding)
  qr_128x128  one tracker orthogonal-iteration step
  eigh_r128   realified-S alternative to the complex eigh
  eigh_c64    the exact ritz rotation (r4 measured ~2.2 ms/bond implied)
  tracker     ops/decomp._ritz_rot_track on a pair-built complex S
              (2 realified QRs + matmuls + argsort) — the exact XLA tail
  tracker_i1  same with iters=1 (1 QR)

Each op runs inside a jitted lax.scan of length 190 (= 2(T-1) bonds of
the ECG200 sweep), so the number IS the per-sweep cost of keeping that
op per-bond on XLA.  Run on a quiet machine:
  nohup python scripts/ritz_unit_probe.py > /tmp/ritz_unit.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax                                                   # noqa: E402
import jax.numpy as jnp                                      # noqa: E402
from jax import lax                                          # noqa: E402

ITERS = 190    # bonds per ECG200 sweep (2 * (96 - 1))
REPS = 5


def _sync(x):
    return float(jnp.linalg.norm(jnp.real(x)))


def time_scan(step, x0, iters=ITERS, reps=REPS):
    f = jax.jit(lambda x: lax.scan(lambda c, _: (step(c), None), x, None,
                                   length=iters)[0])
    r = f(x0)
    _sync(jax.tree.leaves(r)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(x0)
        _sync(jax.tree.leaves(r)[0])
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    return t, t / iters


def _norm(x):
    return x / jnp.maximum(jnp.linalg.norm(x), 1e-30)


def main():
    rng = np.random.default_rng(0)
    X0 = jnp.asarray(rng.standard_normal((640, 128)), jnp.float32)
    G0 = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)
    Sr0 = jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)
    Si0 = jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)

    out = {"device": str(jax.devices()[0]), "iters": ITERS}

    def ctrl_mm(X):
        G = jnp.dot(X.T, X, precision=lax.Precision.HIGHEST)
        return _norm(jnp.dot(X, G, precision=lax.Precision.HIGHEST))

    def qr_640(X):
        Q, _ = jnp.linalg.qr(X)
        return _norm(Q + 0.01 * X)

    def qr_128(G):
        Q, _ = jnp.linalg.qr(G)
        return _norm(Q + 0.01 * G)

    def eigh_r128(G):
        S = G @ G.T
        w, V = jnp.linalg.eigh(S)
        return _norm((V * w) @ V.T + 0.01 * G)

    def eigh_c64(carry):
        re, im = carry
        S = lax.complex(re, im)
        S = S @ S.conj().T
        w, V = jnp.linalg.eigh(S)
        M = (V * w.astype(S.dtype)) @ V.conj().T
        return (_norm(jnp.real(M) + 0.01 * re), _norm(jnp.imag(M) + 0.01 * im))

    from mpstime_tpu.ops.decomp import _ritz_rot_track

    def tracker(carry, iters_):
        re, im = carry
        S = lax.complex(re, im)
        S = S @ S.conj().T
        w, W = _ritz_rot_track(S, iters=iters_)
        M = (W * w.astype(S.dtype)) @ W.conj().T
        return (_norm(jnp.real(M) + 0.01 * re), _norm(jnp.imag(M) + 0.01 * im))

    cells = [
        ("ctrl_mm", ctrl_mm, X0),
        ("qr_640x128", qr_640, X0),
        ("qr_128x128", qr_128, G0),
        ("eigh_r128", eigh_r128, G0),
        ("eigh_c64", eigh_c64, (Sr0, Si0)),
        ("tracker", lambda c: tracker(c, 2), (Sr0, Si0)),
        ("tracker_i1", lambda c: tracker(c, 1), (Sr0, Si0)),
    ]
    for name, step, x0 in cells:
        try:
            total, per = time_scan(step, x0)
            out[name] = {"s_per_sweep": round(total, 5),
                         "us_per_bond": round(per * 1e6, 1)}
        except Exception as e:                           # noqa: BLE001
            out[name] = {"error": str(e)[:200]}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
