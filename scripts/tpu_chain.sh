#!/bin/sh
# Retry the full on-chip backlog until the axon tunnel comes back, then
# run it in sequence (ONE TPU client at a time; each step is a real
# workload, never a probe — CLAUDE.md).  Log: /tmp/tpu_chain_r2.log
#
# The retry loop breaks as soon as a validate attempt made REAL
# on-chip progress ("ATTENTION BACKWARD OK"), even if a later section
# timed out — otherwise a slow-compile day would starve calibrate and
# bench forever behind a validate that keeps almost-finishing.
cd /root/repo || exit 1
LOG=/tmp/tpu_chain_r2.log
i=0
while :; do
    i=$((i + 1))
    echo "=== validate attempt $i $(date -u +%H:%M:%S) ===" >> "$LOG"
    MARK=$(wc -c < "$LOG")
    if PYTHONPATH=. timeout -s KILL 4800 \
        python scripts/tpu_validate.py >> "$LOG" 2>&1; then
        echo "=== VALIDATE OK attempt $i ===" >> "$LOG"
        break
    fi
    # partial progress still proves the tunnel is alive and the flash
    # kernels ran — continue the chain rather than looping
    if tail -c +$((MARK + 1)) "$LOG" | grep -q "ATTENTION BACKWARD OK"; then
        echo "=== VALIDATE PARTIAL (continuing) attempt $i ===" >> "$LOG"
        break
    fi
    # the tunnel FLAPS during recovery: short windows open and close in
    # minutes, so a 5-min sleep can straddle every window.  A failed
    # registration exits in ~30s; retry at 2 min.
    sleep 120
done
echo "=== calibrate $(date -u +%H:%M:%S) ===" >> "$LOG"
PYTHONPATH=. timeout -s KILL 3600 \
    python scripts/pallas_calibrate.py >> "$LOG" 2>&1 \
    && echo "=== CALIBRATE OK ===" >> "$LOG"
echo "=== bench $(date -u +%H:%M:%S) ===" >> "$LOG"
timeout -s KILL 3600 python bench.py >> "$LOG" 2>&1 \
    && echo "=== BENCH OK ===" >> "$LOG"
echo "=== CHAIN DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
