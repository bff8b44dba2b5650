#!/bin/bash
# Pair-capture watcher: wait until the host is quiet (no dryrun job),
# then loop — probe relay weather, and in a good/usable window run one
# back-to-back 500k pair (scripts/pair500k.py), alternating arm order.
# Stops after MAX_PAIRS pairs or when killed.
#
#   setsid nohup bash scripts/pair_watch.sh > /tmp/pair_watch.log 2>&1 &
cd "$(dirname "$0")/.."
MAX_PAIRS=${MAX_PAIRS:-4}
n=0
order=tpu-first
while [ "$n" -lt "$MAX_PAIRS" ]; do
    if pgrep -f dryrun_grch38 > /dev/null 2>&1; then
        echo "[pair-watch $(date +%H:%M:%S)] host busy (dryrun); sleeping"
        sleep 600
        continue
    fi
    probe=$(timeout 150 env PYTHONPATH=/root/.axon_site \
            python scripts/weather_probe.py 2>/dev/null)
    echo "[pair-watch $(date +%H:%M:%S)] probe: ${probe:-timeout/fail}"
    # usable = init+first call completed, call floor healthy AND the d2h
    # link above the preflip bar — pair r5s_1837 fired on call_ms alone
    # (71.7 ms) while d2h sat at 9.1 MB/s and lost by 115 s; the
    # preflip would now contain that, but a WIN needs a healthy link
    ok=$(python - << EOF
import json, sys
try:
    d = json.loads('''$probe''')
    print(1 if (d.get("call_ms", 9e9) < 150
                and d.get("d2h_mb_s", 0) > 15) else 0)
except Exception:
    print(0)
EOF
)
    if [ "$ok" = "1" ]; then
        tag="w$(date +%H%M)"
        echo "[pair-watch $(date +%H:%M:%S)] firing pair $tag ($order)"
        timeout 5200 python scripts/pair500k.py --order "$order" \
            --tag "$tag" >> /tmp/pair_watch_pairs.log 2>&1
        rc=$?
        echo "[pair-watch $(date +%H:%M:%S)] pair $tag rc=$rc"
        if [ $rc -eq 0 ]; then
            n=$((n + 1))
            if [ "$order" = tpu-first ]; then order=cpu-first; else order=tpu-first; fi
        fi
        sleep 120
    else
        sleep 480
    fi
done
echo "[pair-watch $(date +%H:%M:%S)] done: $n pairs"
