#!/bin/sh
# Round-5 on-chip supervisor, revision d (replaces tpu_chain_r5c.sh).
#
# THE FIX THAT MATTERS: no `PYTHONPATH=.` prefixes.  That prefix
# REPLACED the inherited PYTHONPATH=/root/.axon_site, whose
# sitecustomize.py is what registers the axon TPU plugin — so every
# prefixed chip attempt across rounds 2-5 died at backend init
# ("Unable to initialize backend 'axon'") even while the tunnel was
# healthy (the driver's bare `python bench.py` succeeded in ALL FOUR
# rounds).  The scripts now bootstrap the repo root onto sys.path
# themselves; run them bare so the plugin env survives.
#
# Each pass walks the priority list and runs the first step whose
# success marker is missing; on failure it sleeps and restarts the walk
# from the top.  ONE TPU client at a time (CLAUDE.md); busy() yields
# (read-only /proc scan, never kills) while any other python runs
# bench.py/__graft_entry__/chain scripts — bounded to 90 min so a
# stray cmdline match can't wedge the chain forever.
# Log: /tmp/tpu_chain_r5.log  Markers: /tmp/r5mark
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

busy() {
    for d in /proc/[0-9]*; do
        pid=${d#/proc/}
        [ "$pid" = "$$" ] && continue
        cmd=$(tr '\0' ' ' < "$d/cmdline" 2>/dev/null) || continue
        case "$cmd" in
            *python*bench.py*|*python*__graft_entry__*|*python*scripts/tpu_validate*|*python*scripts/pallas_*|*python*scripts/flash_sweep*)
                ppid=$(awk '/^PPid:/{print $2}' "$d/status" 2>/dev/null)
                [ "$ppid" = "$$" ] && continue
                return 0;;
        esac
    done
    return 1
}

try() {
    name=$1; tmo=$2; shift 2
    [ -e "$MARK/$name" ] && return 0
    n=0
    while busy && [ "$n" -lt 90 ]; do
        echo "=== yield: another TPU client is running $(date -u +%H:%M:%S) ===" >> "$LOG"
        sleep 60
        n=$((n + 1))
    done
    echo "=== $name attempt $(date -u +%H:%M:%S) ===" >> "$LOG"
    if timeout -s KILL "$tmo" "$@" >> "$LOG" 2>&1; then
        echo "=== $name OK $(date -u +%H:%M:%S) ===" >> "$LOG"
        touch "$MARK/$name"
        return 0
    fi
    return 1
}

while :; do
    if ! try CALIBRATE 3600 python scripts/pallas_calibrate.py; then
        sleep 120; continue
    fi
    if ! try OVERHEAD 3600 python scripts/pallas_overhead.py; then
        sleep 120; continue
    fi
    if ! try VALIDATE 4800 python scripts/tpu_validate.py; then
        sleep 120; continue
    fi
    if ! try FLASHSWEEP 5400 python scripts/flash_sweep.py; then
        sleep 120; continue
    fi
    if ! try BENCH 3600 python bench.py; then
        sleep 120; continue
    fi
    echo "=== CHAIN ALL DONE $(date -u +%H:%M:%S) ===" >> "$LOG"
    break
done
