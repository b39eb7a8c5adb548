#!/bin/bash
# Serial chip-work queue for round 4: waits for the eval supervisor to
# finish (EVAL_r04.json exists and no eval process holds the chip), then
# runs the measurement batch one job at a time — the axon tunnel allows
# ONE client; this keeps every probe strictly after the eval.
#
#   nohup tools/chip_queue.sh >> /tmp/chip_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_queue.log
echo "[queue] waiting for EVAL_r04.json" >> "$LOG"
for i in $(seq 1 360); do
    if [ -f EVAL_r04.json ]; then break; fi
    sleep 60
done
if [ ! -f EVAL_r04.json ]; then
    echo "[queue] gave up waiting for eval" >> "$LOG"
    exit 1
fi
# Let the supervisor exit and the tunnel drain.
sleep 90
echo "[queue] eval done -- starting probes $(date)" >> "$LOG"

echo "[queue] 1/4 perf_probe sweep" >> "$LOG"
timeout 2400 python -u tools/perf_probe.py --sweep --json PERF_r04.json >> "$LOG" 2>&1
echo "[queue] 2/4 bench brick sweep" >> "$LOG"
timeout 3600 python -u bench.py --brick-sweep > /tmp/brick_sweep.jsonl 2>> "$LOG"
cat /tmp/brick_sweep.jsonl >> "$LOG"
echo "[queue] 3/4 grid64 bisect" >> "$LOG"
timeout 2400 python -u tools/grid64_bisect.py --json GRID64_BISECT.json >> "$LOG" 2>&1
echo "[queue] 3.5/4 pallas gather probe" >> "$LOG"
timeout 1200 python -u tools/pallas_gather_probe.py --json PALLAS_GATHER.json >> "$LOG" 2>&1
echo "[queue] 4/4 drive (verify) on chip" >> "$LOG"
timeout 580 python -u tools/drive_render.py >> "$LOG" 2>&1
echo "[queue] all done $(date)" >> "$LOG"
