"""Probe: matmul-only Newton-Schulz polar orthogonalization as a
replacement for the per-bond refresh QR.

The refresh QR is the one op in the fused bond step that Pallas cannot
express as matmuls (Householder is sequential over reflectors), forcing a
K1 -> XLA-QR -> K2 kernel split per bond.  A Newton-Schulz polar iteration
(quintic warmup + cubic cleanup, all matmuls) could run INSIDE the kernel,
and on the pair-embedded complex path it is complex-structure-preserving
by construction (X^T X of a pair embedding IS the complex Gram — no
Householder fill-in hazard, cf. ops/decomp._qr_orth's documented
rank-deficiency caveat).

Part A — orthogonality: ||Q^T Q - I||_inf and span error vs kappa(Y) in
f32 (HIGHEST matmul precision) on the hot shape [chi*d, chi].
Part B — timing: slope-based per-op cost (chains of 190 and 1900
dependent applications inside one jit; the difference cancels the
10-30 ms per-call dispatch that invalidated scripts/cholqr_probe.py's
absolute numbers).

Usage: nohup python scripts/orth_probe.py > /tmp/orth_probe.log 2>&1 &
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
    HI = jax.lax.Precision.HIGHEST

    def mm(a, b):
        return jnp.dot(a, b, precision=HI, preferred_element_type=f32)

    # quintic (Muon) coefficients: aggressive singular-value inflation
    QA, QB, QC = 3.4445, -4.7750, 2.0315

    def ns_orth(Y, n_quintic=5, n_cubic=3):
        """Polar orthogonalization: X <- poly(X X^T) X, matmuls only."""
        nf = jnp.sqrt(jnp.sum(Y * Y)) * (1.0 + 1e-3)
        X = Y / jnp.maximum(nf, jnp.finfo(f32).tiny)
        for _ in range(n_quintic):
            G = mm(X.T, X)
            G2 = mm(G, G)
            P = QA * jnp.eye(G.shape[0], dtype=f32) + QB * G + QC * G2
            X = mm(X, P)
        for _ in range(n_cubic):
            G = mm(X.T, X)
            X = 1.5 * X - 0.5 * mm(X, G)
        return X

    def qr_orth(Y):
        return jnp.linalg.qr(Y)[0]

    def cqr2(Y):
        def once(Z):
            G = mm(Z.T, Z)
            R = jnp.linalg.cholesky(G, upper=True)
            return jax.lax.linalg.triangular_solve(
                R, Z, left_side=False, lower=False)
        return once(once(Y))

    rng = np.random.default_rng(0)
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)

    # ---- Part A: orthogonality vs conditioning ---------------------------
    m, n = 320, 64
    U0 = np.linalg.qr(rng.standard_normal((m, n)))[0]
    V0 = np.linalg.qr(rng.standard_normal((n, n)))[0]
    schemes = {"ns5+3": (5, 3), "ns5+5": (5, 5), "ns6+8": (6, 8)}
    for kappa in (1e1, 1e2, 1e3, 1e4, 1e6):
        s = np.logspace(0, -np.log10(kappa), n)
        Y = (U0 * s) @ V0.T
        Y = Y / np.linalg.norm(Y, axis=0, keepdims=True)  # per-col normed
        Yd = jnp.asarray(Y.astype(np.float32))
        for name, (nq, nc) in schemes.items():
            Q = jax.jit(lambda y, a=nq, b=nc: ns_orth(y, a, b))(Yd)
            G = np.asarray(mm(Q.T, Q))
            oerr = float(np.max(np.abs(G - np.eye(n))))
            # span error: project Y onto span(Q)
            span = float(np.linalg.norm(np.asarray(mm(Q, mm(Q.T, Yd))) - Y)
                         / np.linalg.norm(Y))
            print(json.dumps({"part": "A", "kappa": kappa, "alg": name,
                              "orth_err": round(oerr, 8),
                              "span_err": round(span, 8)}), flush=True)
        Qr = jax.jit(qr_orth)(Yd)
        G = np.asarray(mm(Qr.T, Qr))
        print(json.dumps({"part": "A", "kappa": kappa, "alg": "qr",
                          "orth_err": round(float(np.max(np.abs(
                              G - np.eye(n)))), 8)}), flush=True)

    # ---- Part B: slope timing -------------------------------------------
    def chain_time(fn, Y, iters):
        @jax.jit
        def loop(Y):
            def body(_, y):
                q = fn(y)
                return q + 1e-3 * Y        # dependent, conditioning reset
            return jax.lax.fori_loop(0, iters, body, Y)
        out = loop(Y)
        float(jnp.linalg.norm(out[:4, :4]))   # axon-safe barrier
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = loop(Y)
            float(jnp.linalg.norm(out[:4, :4]))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    algs = {"qr": qr_orth, "ns5+3": lambda y: ns_orth(y, 5, 3),
            "cqr2": cqr2}
    for (R, kk) in ((320, 64), (640, 128), (960, 192), (1280, 256)):
        Y = jnp.asarray(rng.standard_normal((R, kk)).astype(np.float32))
        for name, fn in algs.items():
            try:
                t190 = chain_time(fn, Y, 190)
                t1900 = chain_time(fn, Y, 1900)
                per_op = (t1900 - t190) / 1710.0
                print(json.dumps({"part": "B", "shape": [R, kk],
                                  "alg": name,
                                  "us_per_op": round(per_op * 1e6, 2),
                                  "t190_ms": round(t190 * 1e3, 3)}),
                      flush=True)
            except Exception as e:                       # noqa: BLE001
                print(json.dumps({"part": "B", "shape": [R, kk],
                                  "alg": name, "error": str(e)[:200]}),
                      flush=True)


if __name__ == "__main__":
    main()
