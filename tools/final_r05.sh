#!/bin/bash
# Round-5 final chip phase (run AFTER stopping the collection supervisor):
#   1. PT ground-truth render at 512x256 (reused by the eval if present)
#   2. the staged eval: device-resident 200/100-epoch training on the
#      collected prefix + NN/BNN/random renders + RMS report
#   3. bench.py -> BENCH preview
# Each step logs to /tmp/final_r05.log; steps are individually resumable
# (PT render and training both skip/resume finished work).
set -u
LOG=${1:-/tmp/final_r05.log}
cd "$(dirname "$0")/.."
{
    echo "[final] $(date) step 1: PT render 512x256"
    PT_BUDGET_S=${PT_BUDGET_S:-900} timeout 1500 python -u tools/render_pt_r05.py
    echo "[final] $(date) step 2: eval (train + renders + report)"
    timeout 2400 python -u tools/eval_e2e.py --root runs/eval_e2e \
        --out EVAL_r05.json --width 512 --height 256 \
        --epochs-nn 200 --epochs-bnn 100 --run-name runs_r05 --no-collect
    echo "[final] $(date) step 3: bench"
    timeout 3000 python -u bench.py | tee /tmp/bench_r05_preview.json
    echo "[final] $(date) ALL DONE"
} >> "$LOG" 2>&1
