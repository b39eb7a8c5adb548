"""End-to-end pipelined-loop measurement at the bench operating points."""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from deepestscatter_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
import jax
import dataclasses

from deepestscatter_tpu import scene as scene_mod
from deepestscatter_tpu.config import (CameraConfig, CloudModel, CloudRendering, ProgressiveConfig, SceneConfig)
from deepestscatter_tpu.data import procedural
from deepestscatter_tpu.render import inscatter
from deepestscatter_tpu.render.progressive import ProgressiveRenderer

def measure(res, cadence=None, ticks_min_s=10.0):
    cfg = SceneConfig(
        cloud=CloudModel(size_m=2000.0),
        camera=CameraConfig(width=512, height=512),
        progressive=ProgressiveConfig(subframes_per_tick=2),
        rendering=CloudRendering(march_dtype="uint8",
                                 **({"march_resolve_every": cadence} if cadence else {})),
    )
    density = procedural.cumulus(resolution=res, seed=11)
    params, static = scene_mod.build_scene(cfg, density)
    params = inscatter.with_baked_inscatter(params, static)
    r = ProgressiveRenderer(cfg, params, static, seed=1)
    r.tick()
    t0 = time.time(); r.tick(); jax.block_until_ready(r.state.mean)
    per = time.time() - t0
    n = max(2, int(ticks_min_s/per)+1)
    t0 = time.time()
    for _ in range(n): r.tick()
    jax.block_until_ready(r.state.mean)
    dt = time.time() - t0
    mean = float(r.hdr_image().mean())
    assert 0.1 < mean < 10.0, mean
    return round(512*512*2*n/dt/1e6, 4)

out = {}
for cad in (2, 3, 4, None):
    key = f"256_cad{cad or 'def8'}"
    out[key] = measure(256, cad)
    print(key, out[key], "Mrays/s", flush=True)
out["64_caddef8"] = measure(64)
print("64_caddef8", out["64_caddef8"], flush=True)
with open('/tmp/probe_e2e.json','w') as f: json.dump(out, f, indent=1)
