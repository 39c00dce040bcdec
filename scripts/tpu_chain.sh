#!/bin/sh
# Round-4 on-chip chain: retry until the axon tunnel comes back, then
# run the backlog in sequence (ONE TPU client at a time; each step is a
# real workload, never a probe — CLAUDE.md).  Log: /tmp/tpu_chain_r4.log
#
# The tunnel FLAPS during recovery: short windows open and close in
# minutes, so EVERY step gets its own bounded retry loop (a failed
# registration exits in ~30s; retry at 2 min).  The validate loop
# additionally breaks on REAL on-chip progress ("ATTENTION BACKWARD
# OK") so a slow-compile day cannot starve the later steps forever.
#
# Round-4 sequence (VERDICT r3 priorities):
#   1. tpu_validate   — prove the new banded-window + head-chunked paged
#                       kernels (+ everything else) on-chip
#   2. pallas_calibrate — COMMIT pallas_calibration.json (verdict #1a)
#   3. pallas_overhead  — launch-vs-body split + block variants (#1b,c)
#   4. flash_sweep      — block_q x block_k at the bench shape (#3)
#   5. bench.py         — the full headline sweep (now with spread bars,
#                       steady-state batching, trained speculative)
cd /root/repo || exit 1
LOG=/tmp/tpu_chain_r4.log

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
    if tail -c +$((MARK + 1)) "$LOG" | grep -q "ATTENTION BACKWARD OK"; then
        echo "=== VALIDATE PARTIAL (continuing) attempt $i ===" >> "$LOG"
        break
    fi
    sleep 120
done

step() {
    name=$1; tmo=$2; shift 2
    j=0
    while [ "$j" -lt 90 ]; do
        j=$((j + 1))
        echo "=== $name attempt $j $(date -u +%H:%M:%S) ===" >> "$LOG"
        if timeout -s KILL "$tmo" "$@" >> "$LOG" 2>&1; then
            echo "=== $name OK (attempt $j) ===" >> "$LOG"
            return 0
        fi
        sleep 120
    done
    echo "=== $name GAVE UP after $j attempts ===" >> "$LOG"
    return 1
}

PYTHONPATH=. step CALIBRATE 3600 python scripts/pallas_calibrate.py
PYTHONPATH=. step OVERHEAD 3600 python scripts/pallas_overhead.py
PYTHONPATH=. step FLASHSWEEP 3600 python scripts/flash_sweep.py
step BENCH 3600 python bench.py
echo "=== CHAIN DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
