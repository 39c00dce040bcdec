#!/bin/sh
# Round-5 on-chip supervisor (replaces tpu_chain_r5.sh): retry FOREVER,
# and always give the next tunnel window to the HIGHEST-PRIORITY step
# still outstanding (the old chain burned its per-step retry budgets in
# order, so a late recovery would land on flash_sweep with the
# 3-round-old calibration ask still unserved).
#
# Each pass walks the priority list and runs the first step whose
# success marker is missing; on failure it sleeps and restarts the walk
# from the top.  ONE TPU client at a time (CLAUDE.md); every attempt is
# the real workload, never a probe.  Log: /tmp/tpu_chain_r5.log
#
# Priority (VERDICT r4 "Next round"):
#   1. pallas_calibrate  -> backend/pallas_calibration.json (#1a)
#   2. pallas_overhead   -> launch-vs-body split (#1b)
#   3. tpu_validate      -> execution proof for the r4 families (#8)
#   4. flash_sweep       -> flash + paged + windowed sweeps (#3/#4/#7)
#   5. bench.py          -> headline numbers (#2/#5/#6/#9 entries)
cd /root/repo || exit 1
LOG=/tmp/tpu_chain_r5.log
MARK=/tmp/r5mark
mkdir -p "$MARK"

try() {
    name=$1; tmo=$2; shift 2
    [ -e "$MARK/$name" ] && return 0
    echo "=== $name attempt $(date -u +%H:%M:%S) ===" >> "$LOG"
    if timeout -s KILL "$tmo" "$@" >> "$LOG" 2>&1; then
        echo "=== $name OK $(date -u +%H:%M:%S) ===" >> "$LOG"
        touch "$MARK/$name"
        return 0
    fi
    return 1
}

while :; do
    if ! PYTHONPATH=. try CALIBRATE 3600 python scripts/pallas_calibrate.py; then
        sleep 120; continue
    fi
    if ! PYTHONPATH=. try OVERHEAD 3600 python scripts/pallas_overhead.py; then
        sleep 120; continue
    fi
    if ! PYTHONPATH=. try VALIDATE 4800 python scripts/tpu_validate.py; then
        sleep 120; continue
    fi
    if ! PYTHONPATH=. try FLASHSWEEP 5400 python scripts/flash_sweep.py; then
        sleep 120; continue
    fi
    if ! try BENCH 3600 python bench.py; then
        sleep 120; continue
    fi
    echo "=== CHAIN ALL DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
    break
done
