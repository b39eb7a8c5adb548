#!/bin/bash
# Supervise tools/collect_r05.py on the tunneled TPU (same rationale as
# eval_supervisor.sh: the axon worker can wedge a device stream silently;
# every stage is CONTINUE-resumable, so recovery = kill exact PID, relaunch).
#
#   tools/collect_supervisor.sh [LOG]
#
# Done condition: /tmp/collect_r05.done (written by the script itself).
# STALE (env, seconds, default 900): restart when the log stops growing.
set -u
LOG=${1:-/tmp/collect_r05.log}
STALE=${STALE:-900}
DONE=/tmp/collect_r05.done
cd "$(dirname "$0")/.."
touch "$LOG"
for attempt in $(seq 1 60); do
    [ -f "$DONE" ] && { echo "[supervisor] done sentinel — exit" >> "$LOG"; exit 0; }
    echo "[supervisor] attempt $attempt: launching collect_r05" >> "$LOG"
    python -u tools/collect_r05.py >> "$LOG" 2>&1 &
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
    [ -f "$DONE" ] && { echo "[supervisor] done — exit" >> "$LOG"; exit 0; }
    sleep 20
done
echo "[supervisor] gave up after 60 attempts" >> "$LOG"
exit 1
