"""Probe: complex (fourier c64) fused sweeps at chi=192/256 through the
new split-tail route (bond_step_c._k1c_tail_call) on hardware — these
shapes fell back to the XLA bond path before r4 (pair kernels cost 2x
residents, past the in-kernel-tail ceiling).

Run:  nohup python scripts/split_tail_c_probe.py > /tmp/splitc.log 2>&1 &
"""

import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main():
    import jax

    import bench

    d_npz = np.load(os.path.join(_REPO, "tests", "data", "ecg200.npz"))
    X, y = d_npz["X_train"], d_npz["y_train"]
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    for chi in (int(a) for a in (sys.argv[1:] or ["192", "256"])):
        try:
            t, _, acc = bench._steady_sweep_time(
                X, y, chi=chi, d=5, nsweeps_block=4, reps=3,
                measure_percall=False, encoding="fourier")
            print(json.dumps({"chi": chi, "ok": True,
                              "s_per_sweep": round(t, 5),
                              "train_acc": round(float(acc), 4)}),
                  flush=True)
        except Exception as e:                                # noqa: BLE001
            print(json.dumps({"chi": chi, "ok": False,
                              "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
