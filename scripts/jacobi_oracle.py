"""f64 CPU accuracy oracle for the r5 ritz-rotation variants.

Validates the two new rotation implementations against the exact-split
band (docs/complex_split_oracle.md: fourier chi=64 exact 0.76-0.82;
tracked orthogonal-iteration 0.79-0.85) on the shipped protocol: ECG200,
fourier chi=64, c128, nsweeps=10, ritz route at the shipped
exact->track schedule (res=2), orth=qr, test accuracy over seeds
1234/777/2025.

Cells:
  track      (eigh, track)     the r4 shipped pair (control)
  eighr      (eigh_r, track)   realified exact eigh (TPU exact-cost fix)
  jacobi     (eigh, jacobi)    matmul-only tracker (the in-kernel one)
  both       (eigh_r, jacobi)  the accelerator auto pair
  jacobi_ss  (eigh, jacobi) res=0 — pure jacobi tracking from sweep 0
             (cold-start robustness; the jacobi tracker is only locally
             convergent, so this cell is expected to be the weak one)

Usage (CPU-heavy — do not run concurrently with TPU probes):
  nohup python scripts/jacobi_oracle.py > /tmp/jacobi_oracle.log 2>&1 &
"""

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CELLS = {
    # name -> (ritz_rot_exact, ritz_rot_track, ritz_exact_sweeps[, orth])
    # ROUND 1 (r5, measured — see docs/complex_split_oracle.md sect. 9):
    #   track     (eigh, track, 2)    0.85/0.79/0.84  band ok (control)
    #   eighr     (eigh_r, track, 2)  0.79/0.79/0.76  low edge
    #   jacobi    (eigh, jacobi, 2)   0.79/0.81/0.77  band ok  <- shipped
    #   both      (eigh_r, jacobi, 2) 0.74/0.76/0.75  below band
    #   jacobi_ss (eigh, jacobi, 0)   0.76/0.75/0.80  borderline
    #   ns_jacobi (eigh_r, jacobi, 2, ns) 0.70/0.70/0.67 out of band
    #     -> NS refresh degrades the tracked chain; the fused kernel now
    #        uses the QR-gauge tri-Newton instead, whose f64 proxy is
    #        the (in-band) qr cells.
    # ROUND 2: can the exact sweeps drop the eigh entirely?
    "jwarm": ("jacobi", "jacobi", 2),      # 24-round jacobi cold start
    "jwarm_r1": ("jacobi", "jacobi", 1),
    # dtype-aware eigh_r split (f64 now 1e-11): rescued on the oracle?
    "eighr11": ("eigh_r", "jacobi", 2),
}
SEEDS = (1234, 777, 2025)

_CHILD = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import mpstime_tpu as mt

import sys
ex, tr, res, seed, orth = (sys.argv[1], sys.argv[2], int(sys.argv[3]),
                           int(sys.argv[4]), sys.argv[5])
d = np.load("tests/data/ecg200.npz")
opts = mt.MPSOptions(encoding="fourier", chi_max=64, d=5, nsweeps=10,
                     svd_alg="randomized_warm_ritz", verbosity=-1,
                     log_level=-1, dtype="complex128", init_rng=seed,
                     ritz_rot_exact=ex, ritz_rot_track=tr,
                     ritz_exact_sweeps=res, orth_alg=orth)
trained, _, _ = mt.fit_mps(d["X_train"], d["y_train"], opts=opts)
te = float(np.mean(mt.classify(trained, d["X_test"]) == d["y_test"]))
trn = float(np.mean(mt.classify(trained, d["X_train"]) == d["y_train"]))
print("RESULT", te, trn)
"""


def main():
    out = {}
    for name, cell in CELLS.items():
        ex, tr, res = cell[:3]
        orth = cell[3] if len(cell) > 3 else "auto"
        accs = []
        for seed in SEEDS:
            try:
                r = subprocess.run(
                    [sys.executable, "-c", _CHILD, ex, tr, str(res),
                     str(seed), orth],
                    capture_output=True, text=True, timeout=3600, cwd=_REPO)
                line = [ln for ln in r.stdout.splitlines()
                        if ln.startswith("RESULT")]
                if line:
                    te, trn = map(float, line[-1].split()[1:])
                    accs.append({"seed": seed, "test": te, "train": trn})
                else:
                    accs.append({"seed": seed, "error":
                                 r.stderr.strip().splitlines()[-1][:200]
                                 if r.stderr.strip() else f"rc={r.returncode}"})
            except Exception as e:                       # noqa: BLE001
                accs.append({"seed": seed, "error": str(e)[:200]})
            print(json.dumps({name: accs[-1]}), flush=True)
        out[name] = accs
    print(json.dumps(out))


if __name__ == "__main__":
    main()
