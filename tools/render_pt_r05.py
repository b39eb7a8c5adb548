"""Render the round-5 eval's PT ground truth at the reference operating
point (512x256, Tasks.cpp:49-50) for the held-out validation scene, into
the path tools/eval_e2e.py reuses (renders_512x256/eval.PT.exr) — so the
longest render of the eval runs in its own chip window instead of
serializing the final training+render stage.

    cd /root/repo && timeout 5400 python -u tools/render_pt_r05.py
"""

import faulthandler
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

faulthandler.dump_traceback_later(600, repeat=True)

from deepestscatter_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import dataclasses

from deepestscatter_tpu import tasks
from deepestscatter_tpu.config import (
    CameraConfig,
    CloudRendering,
    SceneConfig,
)
from deepestscatter_tpu.data.store import DatasetTriplet
from deepestscatter_tpu.render.progressive import ProgressiveRenderer
from deepestscatter_tpu.utils import exr

ROOT = "runs/eval_e2e"
W, H = 512, 256


def main() -> None:
    out_dir = os.path.join(ROOT, f"renders_{W}x{H}")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "eval.PT.exr")
    if os.path.exists(out):
        print(f"[pt] {out} already exists — nothing to do", flush=True)
        return
    triplet = DatasetTriplet(ROOT)
    setup = triplet.validation.table("SceneSetup").get_record(0)
    base = SceneConfig(
        rendering=CloudRendering(
            rr_start_depth=64, rr_survival=0.98, march_dtype="uint8"
        ),
        camera=CameraConfig(width=W, height=H),
    )
    cfg, params, static = tasks.scene_from_setup(setup, base)
    cfg = dataclasses.replace(cfg, camera=CameraConfig(width=W, height=H))
    t0 = time.time()
    prog = ProgressiveRenderer(cfg, params, static, seed=3)
    # Wall-clock budget (seconds): tick to convergence OR until the budget
    # is spent, then write whatever accumulated — the progressive state is
    # a running mean, so a budget-capped PT is just a noisier ground truth
    # (the CI convergence state is recorded alongside).
    budget = float(os.environ.get("PT_BUDGET_S", "1200"))
    p = cfg.progressive
    remaining = -1
    while int(prog.state.subframe_id) < p.max_subframes:
        remaining = prog.tick()
        print(
            f"subframe {int(prog.state.subframe_id)}: {remaining} unconverged",
            flush=True,
        )
        if (
            int(prog.state.subframe_id) >= p.min_subframes
            and remaining < p.max_unconverged_pixels
        ):
            break
        if time.time() - t0 > budget:
            print(f"[pt] budget {budget:.0f}s spent — writing as-is", flush=True)
            break
    pt = prog.hdr_image()
    exr.write_exr(out, pt)
    print(
        f"[pt] wrote {out}: {int(prog.state.subframe_id)} subframes, "
        f"{remaining} unconverged px, mean {float(pt.mean()):.4f}, "
        f"{time.time() - t0:.0f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()
