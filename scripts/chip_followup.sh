#!/bin/bash
# Post-fix chip validation (run AFTER chip_session.sh, quiet machine):
#  1. the two r4 lane failures, rerun against the fixes (padded trials now
#     resolve orth to qr; ritz lane test back on the exact-eigh default)
#  2. tracked-ritz timing cells (exact->track schedule)
#  3. fourier block cells at the now-self-consistent q (q=3 single-K12 vs
#     q=1 blocked)
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"
echo "=== chip followup start $(date) ===" | tee /tmp/chip_followup.log

echo "--- lane reruns ---" | tee -a /tmp/chip_followup.log
timeout 3600 python -m pytest tests/test_tpu_lane.py -m tpu -q \
    -k "padded_trial_rank_cap or ritz_route_on_chip" \
    > /tmp/chip_lane_rerun.log 2>&1
echo "lane rerun exit $?" | tee -a /tmp/chip_followup.log

echo "--- tracked ritz timing ---" | tee -a /tmp/chip_followup.log
timeout 7200 python scripts/ritz_tpu_probe.py ritz_track ritz_track_ss \
    > /tmp/ritz_track_tpu.log 2>&1
echo "ritz track exit $?" | tee -a /tmp/chip_followup.log

echo "--- chi192 quiet rerun (bench cell hit a compile-helper 500 under CPU load) ---" | tee -a /tmp/chip_followup.log
timeout 3600 python - > /tmp/chi192_rerun.log 2>&1 <<'EOF'
import numpy as np, os, json
d = np.load("/root/repo/tests/data/ecg200.npz")
from scripts.ns_orth_tpu_probe import steady
t, acc = steady(d["X_train"], d["y_train"], 192, 5, "ns")
print(json.dumps({"chi": 192, "s_per_sweep": round(t, 5),
                  "train_acc": round(acc, 4)}), flush=True)
EOF
echo "chi192 exit $?" | tee -a /tmp/chip_followup.log

echo "--- fourier block cells (fixed q) ---" | tee -a /tmp/chip_followup.log
timeout 7200 python - > /tmp/block_fourier_rerun.log 2>&1 <<'EOF'
import subprocess, sys, os
os.chdir("/root/repo")
for q in (0, 1):
    for block in ("auto", "1"):
        r = subprocess.run([sys.executable, "scripts/block_tpu_probe.py",
                            "--child", "fourier", "64", "ecg", block, str(q)],
                           capture_output=True, text=True, timeout=3600)
        out = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        print(out[-1] if out else f"FAIL q={q} block={block}: "
              + (r.stderr or "")[-200:], flush=True)
EOF
echo "block rerun exit $?" | tee -a /tmp/chip_followup.log
echo "=== chip followup done $(date) ===" | tee -a /tmp/chip_followup.log
