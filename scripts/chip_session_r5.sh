#!/bin/bash
# r5 sequential chip-validation session (QUIET machine — no concurrent
# pytest/CPU load; the local AOT compile helper gets SIGKILLed otherwise).
# Stages log to /tmp/r5_*.log; a stage failure does not stop the next.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"   # repo import + keep the axon plugin path
echo "=== r5 chip session start $(date) ===" | tee /tmp/r5_session.log

echo "--- stage 0: smoke ---" | tee -a /tmp/r5_session.log
timeout 3600 python scripts/tpu_smoke.py > /tmp/r5_smoke.log 2>&1
echo "smoke exit $?" | tee -a /tmp/r5_session.log

echo "--- stage 1: fused tracked-ritz probe (K12cr; VERDICT tasks 2+3) ---" | tee -a /tmp/r5_session.log
timeout 14400 python scripts/ritz_fused_probe.py > /tmp/r5_ritz_fused.log 2>&1
echo "ritz_fused exit $?" | tee -a /tmp/r5_session.log

echo "--- stage 2: MSE/GD fused probe (task 8 widening) ---" | tee -a /tmp/r5_session.log
timeout 7200 python scripts/mse_fused_probe.py > /tmp/r5_mse_fused.log 2>&1
echo "mse_fused exit $?" | tee -a /tmp/r5_session.log

echo "--- stage 3: N-streaming probe (task 5) ---" | tee -a /tmp/r5_session.log
timeout 7200 python scripts/stream_probe.py > /tmp/r5_stream.log 2>&1
echo "stream exit $?" | tee -a /tmp/r5_session.log

echo "--- stage 4: donation probe (task 6) ---" | tee -a /tmp/r5_session.log
timeout 7200 python scripts/donation_probe.py > /tmp/r5_donation.log 2>&1
echo "donation exit $?" | tee -a /tmp/r5_session.log

echo "--- stage 5: tpu pytest lane ---" | tee -a /tmp/r5_session.log
timeout 7200 python -m pytest tests/ -m tpu -q > /tmp/r5_lane.log 2>&1
echo "lane exit $?" | tee -a /tmp/r5_session.log

echo "--- stage 6: bench (the round's artifact of record) ---" | tee -a /tmp/r5_session.log
timeout 14400 python bench.py > /tmp/r5_bench.json 2>/tmp/r5_bench.err
echo "bench exit $?" | tee -a /tmp/r5_session.log
echo "=== r5 chip session done $(date) ===" | tee -a /tmp/r5_session.log

# After a green run: refresh CLAUDE.md ("Benchmarks"), README.md, and
# docs/tpu_performance.md + docs/complex_split_oracle.md from the logs;
# decide the jacobi_warm default flip from /tmp/r5_ritz_fused.log
# (jwarm10 acc >= 0.90 on both seeds AND amortized <= the eigh res2 cells).
