"""Bisect the 64^3 throughput regression (round 2: 0.3882 -> round 3:
0.3775 Mrays/s) over the round-3 scheduling knobs, on the real chip.

Measures the progressive tick at 64^3 across the scheduling space the
round-3 consolidation touched: lane-regeneration tick vs the plain
deferred megabatch, march_check_every, march_resolve_frac, and substeps.
Writes one JSON with Mrays/s per variant so docs/PERFORMANCE.md can cite
the cause (VERDICT r3 weak #2).

    timeout 1800 python -u tools/grid64_bisect.py --json GRID64_BISECT.json
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from deepestscatter_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from deepestscatter_tpu import scene as scene_mod
from deepestscatter_tpu.config import (
    CameraConfig,
    CloudModel,
    CloudRendering,
    ProgressiveConfig,
    SceneConfig,
)
from deepestscatter_tpu.data import procedural
from deepestscatter_tpu.render import camera as camera_ops
from deepestscatter_tpu.render import inscatter, pathtracer
from deepestscatter_tpu.render.progressive import ProgressiveRenderer

W = H = 512
S = 2
MIN_SECONDS = 8.0


def measure_tick(cfg, params, static):
    r = ProgressiveRenderer(cfg, params, static, seed=1)
    r.tick()  # compile
    t0 = time.time()
    r.tick()
    jax.block_until_ready(r.state.mean)
    per = time.time() - t0
    n = max(2, int(MIN_SECONDS / per) + 1)
    t0 = time.time()
    for _ in range(n):
        r.tick()
    jax.block_until_ready(r.state.mean)
    dt = (time.time() - t0) / n
    return W * H * S / dt / 1e6


def measure_megabatch(params, static):
    """The plain deferred megabatch (no lane regeneration): S x N lanes,
    each one sample — the round-2 tick formulation."""
    basis_cfg = CameraConfig(width=W, height=H)
    basis = camera_ops.camera_basis(basis_cfg)
    origins, directions = camera_ops.generate_rays(basis, W, H)
    n = W * H
    ids = jnp.tile(jnp.arange(n, dtype=jnp.uint32), S)
    o = jnp.tile(origins, (S, 1))
    d = jnp.tile(directions, (S, 1))

    @jax.jit
    def run(params, sub0):
        subframe = sub0 + 1 + jnp.repeat(jnp.arange(S, dtype=jnp.int32), n)
        return pathtracer.render_subframe(
            params, static, o, d, 1, subframe, ids
        )

    run(params, jnp.int32(0)).block_until_ready()
    t0 = time.time()
    run(params, jnp.int32(2)).block_until_ready()
    per = time.time() - t0
    k = max(2, int(MIN_SECONDS / per) + 1)
    t0 = time.time()
    for i in range(k):
        r = run(params, jnp.int32(2 * (i + 2)))
    r.block_until_ready()
    dt = (time.time() - t0) / k
    return W * H * S / dt / 1e6


def main():
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]
    report = {}
    print("devices:", jax.devices())
    density = procedural.cumulus(resolution=64, seed=11)

    def build(**kw):
        cfg = SceneConfig(
            cloud=CloudModel(size_m=2000.0),
            camera=CameraConfig(width=W, height=H),
            progressive=ProgressiveConfig(subframes_per_tick=S),
            rendering=CloudRendering(march_dtype="uint8", **kw),
        )
        params, static = scene_mod.build_scene(cfg, density)
        params = inscatter.with_baked_inscatter(params, static)
        return cfg, params, static

    variants = {
        "default": {},
        "check_every_1": {"march_check_every": 1},
        "check_every_4": {"march_check_every": 4},
        "resolve_frac_0.5": {"march_resolve_frac": 0.5},
        "resolve_frac_1.0": {"march_resolve_frac": 1.0},
        "substeps_4": {"march_substeps": 4},
        "substeps_8": {"march_substeps": 8},
        "brick_2": {"march_brick": 2},
        "brick_4": {"march_brick": 4},
    }
    for name, kw in variants.items():
        cfg, params, static = build(**kw)
        m = measure_tick(cfg, params, static)
        report[f"tick_{name}"] = round(m, 4)
        print(f"tick {name}: {m:.4f} Mrays/s", flush=True)

    cfg, params, static = build()
    m = measure_megabatch(params, static)
    report["megabatch_no_regen"] = round(m, 4)
    print(f"megabatch (no lane regen): {m:.4f} Mrays/s", flush=True)

    if out_json:
        with open(out_json, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
