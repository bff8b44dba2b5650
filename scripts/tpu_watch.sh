#!/bin/bash
# Relay recovery watcher: probe every ~10 min; on recovery run the full
# TPU capture (scripts/tpu_capture.py) and stop.  While another CPU-heavy
# job owns the host (the GRCh38 5M dry run), grab parity only — the
# bench's host-bound phases would be depressed — and keep looping for a
# quiet window.
#
#   setsid nohup bash scripts/tpu_watch.sh > /tmp/tpu_watch.log 2>&1 &
cd "$(dirname "$0")/.."
while true; do
    if pgrep -f dryrun_grch38 > /dev/null 2>&1; then
        echo "[watch $(date +%H:%M:%S)] host busy (5M dryrun) — parity-only probe"
        TPU_CAPTURE_PARITY_ONLY=1 python scripts/tpu_capture.py
    else
        echo "[watch $(date +%H:%M:%S)] full capture attempt"
        python scripts/tpu_capture.py && {
            echo "[watch $(date +%H:%M:%S)] FULL CAPTURE DONE"; break; }
    fi
    sleep 600
done
