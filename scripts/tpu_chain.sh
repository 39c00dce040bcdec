#!/bin/sh
# Retry the full on-chip backlog until the axon tunnel comes back, then
# run it in sequence (ONE TPU client at a time; each step is a real
# workload, never a probe — CLAUDE.md).  Log: /tmp/tpu_chain_r2.log
#
# The tunnel FLAPS during recovery: short windows open and close in
# minutes, so EVERY step gets its own bounded retry loop — a window
# that closes right after validate must not burn the single calibrate
# and bench attempts (a failed registration exits in ~30s; retry at
# 2 min).  The validate loop additionally breaks on REAL on-chip
# progress ("ATTENTION BACKWARD OK"), even if a later section timed
# out — otherwise a slow-compile day would starve calibrate and bench
# forever behind a validate that keeps almost-finishing.
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
    sleep 120
done

# bounded per-step retries: each failed attempt is cheap (~30s dead
# registration) but a success is a full real run
step() {
    name=$1; tmo=$2; shift 2
    j=0
    while [ "$j" -lt 60 ]; do
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
step BENCH 3600 python bench.py
echo "=== CHAIN DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
