"""Measure the multi-bond block route (K12m/K12mc) vs single-bond K12 on
the TPU.

Each (encoding, chi, block) config runs in its own subprocess: BOND_BLOCK
is trace-time module state (no retrace on change), the axon platform
forbids jax.clear_caches, and an isolated process means a Mosaic compile
crash costs one datapoint instead of the probe.  Children inherit the
persistent compile cache, so repeat runs are warm.

Usage: nohup python scripts/block_tpu_probe.py > /tmp/block_tpu.log 2>&1 &
"""

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

CONFIGS = [
    # (encoding, chi, T-source, power_iters: 0 = resolved default)
    ("legendre", 32, "ecg", 0),
    ("legendre", 64, "ecg", 0),
    ("legendre", 128, "ecg", 0),
    # fourier q=3 = the shipped fused perf knob (block-ineligible by the
    # complex-q gate, so auto == single K12); q=1 = the largest complex
    # block config that compiles (K12mc Bb=4)
    ("fourier", 64, "ecg", 0),
    ("fourier", 64, "ecg", 1),
    ("legendre", 25, "ipd", 0),
]


def child(enc: str, chi: int, src: str, block: str, q: int):
    import numpy as np

    from mpstime_tpu.training import sweep

    sweep.BOND_BLOCK = None if block == "auto" else int(block)

    if src == "ecg":
        d_npz = np.load(os.path.join(_REPO, "tests/data/ecg200.npz"))
        X, y = d_npz["X_train"], d_npz["y_train"]
    else:  # IPD-shaped synthetic (T=24, N=54) — bench.py's shared generator
        from bench import synth_two_sine
        X, y = synth_two_sine(np.random.default_rng(1), 27, 27, T=24)

    from scripts.ns_orth_tpu_probe import steady
    t, acc = steady(X, y, chi, 5, "ns", encoding=enc, q=q)
    print(json.dumps({"enc": enc, "chi": chi, "src": src, "block": block,
                      "q": q, "s_per_sweep": round(t, 5),
                      "train_acc": round(acc, 4)}), flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], int(sys.argv[3]), sys.argv[4], sys.argv[5],
              int(sys.argv[6]))
        return
    for enc, chi, src, q in CONFIGS:
        for block in ("auto", "1"):
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--child",
                     enc, str(chi), src, block, str(q)],
                    capture_output=True, text=True, timeout=3600)
            except subprocess.TimeoutExpired:
                # one hung child (remote-compile stall) costs one datapoint,
                # not the sweep
                print(json.dumps({"enc": enc, "chi": chi, "block": block,
                                  "error": "timeout 3600s"}), flush=True)
                continue
            line = [ln for ln in r.stdout.splitlines()
                    if ln.startswith("{")]
            if line:
                print(line[-1], flush=True)
            else:
                print(json.dumps({"enc": enc, "chi": chi, "block": block,
                                  "error": (r.stderr or "no output")[-300:]}),
                      flush=True)


if __name__ == "__main__":
    main()
