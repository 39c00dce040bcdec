#!/bin/sh
# Retry the on-chip validation sweep until the axon tunnel comes back.
# CLAUDE.md: no probe-first — each attempt IS the real workload; the
# script has its own 2400s watchdog, belt-and-braces timeout here.
cd /root/repo || exit 1
i=0
while :; do
    i=$((i + 1))
    echo "=== attempt $i $(date -u +%H:%M:%S) ===" >> /tmp/tpu_validate_r2.log
    if PYTHONPATH=. timeout -s KILL 2700 \
        python scripts/tpu_validate.py >> /tmp/tpu_validate_r2.log 2>&1; then
        echo "=== SUCCESS attempt $i ===" >> /tmp/tpu_validate_r2.log
        exit 0
    fi
    sleep 300
done
