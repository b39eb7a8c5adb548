#!/bin/bash
# Supervise tools/eval_e2e.py on the tunneled TPU: the axon worker can
# wedge a client's device stream without erroring (the process then blocks
# forever inside a device fetch while its log goes quiet).  Every stage of
# the eval is CONTINUE-resumable, so the recovery is simply: kill the
# exact child PID and relaunch until the report exists.
#
#   tools/eval_supervisor.sh [LOG] [OUT] [ROOT]
#
# STALE (env, seconds, default 900): restart when the log has not grown
# for this long.  All progress paths print at sub-minute cadence
# (collector updates ~8 s, render ticks, trainer validations).
set -u
LOG=${1:-/tmp/eval_supervised.log}
OUT=${2:-EVAL_r04.json}
ROOT=${3:-runs/eval_e2e}
STALE=${STALE:-900}
cd "$(dirname "$0")/.."
touch "$LOG"
for attempt in $(seq 1 40); do
    echo "[supervisor] attempt $attempt: launching eval" >> "$LOG"
    python -u tools/eval_e2e.py --root "$ROOT" --out "$OUT" >> "$LOG" 2>&1 &
    PID=$!
    while kill -0 "$PID" 2>/dev/null; do
        sleep 60
        age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
        if [ "$age" -gt "$STALE" ]; then
            echo "[supervisor] log stale ${age}s — killing $PID" >> "$LOG"
            kill "$PID" 2>/dev/null
            sleep 5
            kill -9 "$PID" 2>/dev/null
            break
        fi
    done
    wait "$PID" 2>/dev/null
    if [ -f "$OUT" ]; then
        echo "[supervisor] $OUT exists — done" >> "$LOG"
        exit 0
    fi
    sleep 20
done
echo "[supervisor] gave up after 40 attempts" >> "$LOG"
exit 1
