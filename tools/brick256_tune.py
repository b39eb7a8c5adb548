"""Tune the 256^3 brick operating point on the chip: padded brick widths
(row alignment, scene.march_row_width) x scheduling knobs at brick 3.
Writes BRICK256_TUNE.json."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json, time
import jax, jax.numpy as jnp
from deepestscatter_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from deepestscatter_tpu import scene as scene_mod
from deepestscatter_tpu.config import (CameraConfig, CloudModel, CloudRendering,
                                       ProgressiveConfig, SceneConfig)
from deepestscatter_tpu.data import procedural
from deepestscatter_tpu.render import inscatter
from deepestscatter_tpu.render.progressive import ProgressiveRenderer

W = H = 512
S = 2
MIN_SECONDS = 8.0
density = procedural.cumulus(resolution=256, seed=11)

def measure(**kw):
    cfg = SceneConfig(
        cloud=CloudModel(size_m=2000.0),
        camera=CameraConfig(width=W, height=H),
        progressive=ProgressiveConfig(subframes_per_tick=S),
        rendering=CloudRendering(march_dtype="uint8", **kw),
    )
    params, static = scene_mod.build_scene(cfg, density)
    params = inscatter.with_baked_inscatter(params, static)
    r = ProgressiveRenderer(cfg, params, static, seed=1)
    r.tick()
    t0 = time.time(); r.tick(); jax.block_until_ready(r.state.mean)
    per = time.time() - t0
    n = max(2, int(MIN_SECONDS / per) + 1)
    t0 = time.time()
    for _ in range(n):
        r.tick()
    jax.block_until_ready(r.state.mean)
    dt = (time.time() - t0) / n
    return W * H * S / dt / 1e6

variants = {
    "brick3_default": {"march_brick": 3},
    "brick2_padded64": {"march_brick": 2},
    "brick4_padded256": {"march_brick": 4},
    "brick3_substeps_4": {"march_brick": 3, "march_substeps": 4},
    "brick3_substeps_9": {"march_brick": 3, "march_substeps": 9},
    "brick3_substeps_12": {"march_brick": 3, "march_substeps": 12},
    "brick3_check_4": {"march_brick": 3, "march_check_every": 4},
    "brick3_check_1": {"march_brick": 3, "march_check_every": 1},
    "brick3_frac_0.125": {"march_brick": 3, "march_resolve_frac": 0.125},
    "brick3_frac_0.5": {"march_brick": 3, "march_resolve_frac": 0.5},
}
report = {}
print("devices:", jax.devices())
for name, kw in variants.items():
    m = measure(**kw)
    report[name] = round(m, 4)
    print(f"{name}: {m:.4f} Mrays/s", flush=True)
with open("BRICK256_TUNE.json", "w") as f:
    json.dump(report, f, indent=1)
print("wrote BRICK256_TUNE.json")
