#!/bin/bash
# Sequential chip-validation session (run on a QUIET machine — no pytest).
# Stages log to /tmp/chip_*.log; a stage failure does not stop the next.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH}"   # repo import + keep the axon plugin path
echo "=== chip session start $(date) ===" | tee /tmp/chip_session.log

echo "--- stage 1: smoke ---" | tee -a /tmp/chip_session.log
timeout 3600 python scripts/tpu_smoke.py > /tmp/chip_smoke.log 2>&1
echo "smoke exit $?" | tee -a /tmp/chip_session.log

echo "--- stage 2: block probe ---" | tee -a /tmp/chip_session.log
timeout 14400 python scripts/block_tpu_probe.py > /tmp/chip_block.log 2>&1
echo "block probe exit $?" | tee -a /tmp/chip_session.log

echo "--- stage 2b: ritz route probe ---" | tee -a /tmp/chip_session.log
timeout 14400 python scripts/ritz_tpu_probe.py > /tmp/chip_ritz.log 2>&1
echo "ritz probe exit $?" | tee -a /tmp/chip_session.log

echo "--- stage 3: tpu pytest lane ---" | tee -a /tmp/chip_session.log
timeout 7200 python -m pytest tests/ -m tpu -q > /tmp/chip_lane.log 2>&1
echo "lane exit $?" | tee -a /tmp/chip_session.log

echo "--- stage 4: bench ---" | tee -a /tmp/chip_session.log
timeout 14400 python bench.py > /tmp/chip_bench.json 2>/tmp/chip_bench.err
echo "bench exit $?" | tee -a /tmp/chip_session.log
echo "=== chip session done $(date) ===" | tee -a /tmp/chip_session.log

# After a green run: refresh the measured numbers in CLAUDE.md
# ("Benchmarks") and docs/tpu_performance.md from /tmp/chip_block.log and
# /tmp/chip_bench.json, and validate the lane band changes landed
# (tests/test_tpu_lane.py) — see memory round2-state.md for the pending
# items this script exists to close.
