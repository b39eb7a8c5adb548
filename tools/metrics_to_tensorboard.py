"""Export training metrics (JSONL) to TensorBoard event files.

The trainer writes append-only JSONL scalars (train/trainer.py
MetricsWriter — the tensorboardX replacement, reference:
TR/Common/Trainer.py:117,153).  This tool converts a run's
``metrics.jsonl`` into a TensorBoard event log so the reference's
``runTensorboard.cmd`` workflow keeps working:

    python tools/metrics_to_tensorboard.py runs/DisneyModel
    tensorboard --logdir runs/DisneyModel/tb
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def convert(run_dir: str, out_dir: str | None = None) -> str:
    metrics_path = os.path.join(run_dir, "metrics.jsonl")
    if not os.path.exists(metrics_path):
        raise FileNotFoundError(metrics_path)
    out_dir = out_dir or os.path.join(run_dir, "tb")
    try:
        from torch.utils.tensorboard import SummaryWriter
    except ImportError as e:  # pragma: no cover - image ships torch
        raise SystemExit(
            f"torch.utils.tensorboard unavailable ({e}); metrics remain "
            f"readable as JSONL at {metrics_path}"
        )
    writer = SummaryWriter(log_dir=out_dir)
    n = 0
    with open(metrics_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            writer.add_scalar(
                rec["tag"], rec["value"], rec["step"], walltime=rec.get("ts")
            )
            n += 1
    writer.close()
    print(f"wrote {n} scalars -> {out_dir}")
    return out_dir


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("run_dir", help="training run directory with metrics.jsonl")
    p.add_argument("--out", default=None, help="event-file directory (default <run>/tb)")
    args = p.parse_args(argv)
    convert(args.run_dir, args.out)


if __name__ == "__main__":
    main(sys.argv[1:])
