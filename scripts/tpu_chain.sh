#!/bin/sh
# Retry the full on-chip backlog until the axon tunnel comes back, then
# run it in sequence (ONE TPU client at a time; each step is a real
# workload, never a probe — CLAUDE.md).  Log: /tmp/tpu_chain_r2.log
cd /root/repo || exit 1
LOG=/tmp/tpu_chain_r2.log
i=0
while :; do
    i=$((i + 1))
    echo "=== validate attempt $i $(date -u +%H:%M:%S) ===" >> "$LOG"
    if PYTHONPATH=. timeout -s KILL 2700 \
        python scripts/tpu_validate.py >> "$LOG" 2>&1; then
        echo "=== VALIDATE OK attempt $i ===" >> "$LOG"
        break
    fi
    sleep 300
done
echo "=== calibrate $(date -u +%H:%M:%S) ===" >> "$LOG"
PYTHONPATH=. timeout -s KILL 3600 \
    python scripts/pallas_calibrate.py >> "$LOG" 2>&1 \
    && echo "=== CALIBRATE OK ===" >> "$LOG"
echo "=== bench $(date -u +%H:%M:%S) ===" >> "$LOG"
timeout -s KILL 3600 python bench.py >> "$LOG" 2>&1 \
    && echo "=== BENCH OK ===" >> "$LOG"
echo "=== CHAIN DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
