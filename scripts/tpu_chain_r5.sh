#!/bin/sh
# Round-5 on-chip chain: retry until the axon tunnel admits a client,
# then run the VERDICT r4 backlog in priority order (ONE TPU client at
# a time; every step is a real workload, never a probe — CLAUDE.md).
# Log: /tmp/tpu_chain_r5.log
#
# The tunnel FLAPS during recovery, so EVERY step gets its own bounded
# retry loop (a failed registration exits in ~30s; retry at 2 min).
#
# Round-5 order (VERDICT r4 "Next round" #1/#8/#3):
#   1. pallas_calibrate — COMMIT pallas_calibration.json (3-round-old
#                         ask; flushes partial results per shape, so
#                         even a short window produces the artifact)
#   2. pallas_overhead  — launch-vs-body slope fit -> BENCH_DETAILS
#   3. tpu_validate     — execution proof for the r4 families (cmpred
#                         gather/scatter, row-chain, masked ragged)
#   4. flash_sweep      — block_q x block_k at the bench shape
#   5. bench.py         — full headline sweep (fencing fixed, chain=32
#                         scheduled matmul, scatter-add entry)
cd /root/repo || exit 1
LOG=/tmp/tpu_chain_r5.log

step() {
    name=$1; tmo=$2; max=$3; shift 3
    j=0
    while [ "$j" -lt "$max" ]; do
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

PYTHONPATH=. step CALIBRATE 3600 200 python scripts/pallas_calibrate.py
PYTHONPATH=. step OVERHEAD 3600 60 python scripts/pallas_overhead.py
PYTHONPATH=. step VALIDATE 4800 60 python scripts/tpu_validate.py
PYTHONPATH=. step FLASHSWEEP 3600 60 python scripts/flash_sweep.py
step BENCH 3600 60 python bench.py
echo "=== CHAIN DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
