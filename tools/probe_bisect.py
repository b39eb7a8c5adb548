"""Bisect the render_tick vs direct-loop throughput gap on the real chip.

Variants (same megabatch of 512*512*2 rays, distinct subframe ids):
  A) jit(render_subframe) with params as TRACED ARGUMENT (render_tick's way)
  B) jit(closure over params) — params baked as CONSTANTS (old probe's way)
  C) A + Welford merge tail (= render_tick exactly)
  D) full ProgressiveRenderer.tick()
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from deepestscatter_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from deepestscatter_tpu import scene as scene_mod
from deepestscatter_tpu.config import (CameraConfig, CloudModel, CloudRendering,
                                       ProgressiveConfig, SceneConfig)
from deepestscatter_tpu.data import procedural
from deepestscatter_tpu.render import camera as camera_ops
from deepestscatter_tpu.render import inscatter, pathtracer
from deepestscatter_tpu.render import progressive as prog

W = H = 512
S = 2
N = W * H

cfg = SceneConfig(
    cloud=CloudModel(size_m=2000.0),
    camera=CameraConfig(width=W, height=H),
    progressive=ProgressiveConfig(subframes_per_tick=S),
    rendering=CloudRendering(march_dtype="uint8"),
)
density = procedural.cumulus(resolution=64, seed=11)
params, static = scene_mod.build_scene(cfg, density)
params = inscatter.with_baked_inscatter(params, static)

basis = camera_ops.camera_basis(cfg.camera)
origins, directions = camera_ops.generate_rays(basis, W, H)
ray_ids = jnp.tile(jnp.arange(N, dtype=jnp.uint32), S)
subframe = jnp.repeat(1 + jnp.arange(S, dtype=jnp.int32), N)
o = jnp.tile(origins, (S, 1))
d = jnp.tile(directions, (S, 1))


def bench(label, fn, *args, n=3):
    t0 = time.time()
    jax.block_until_ready(fn(*args))
    print(f"  {label}: compile+first {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / n
    print(f"  {label}: {dt:.3f} s -> {N*S/dt/1e6:.3f} Mrays/s", flush=True)
    return r


# A: traced params
fA = jax.jit(
    functools.partial(pathtracer.render_subframe),
    static_argnames=("static", "seed_base"),
)
rA = bench("A traced-params", lambda: fA(params, static, o, d, 1, subframe, ray_ids))

# B: constant params (closure)
@jax.jit
def fB(o, d, subframe, ray_ids):
    return pathtracer.render_subframe(params, static, o, d, 1, subframe, ray_ids)

rB = bench("B const-params ", fB, o, d, subframe, ray_ids)

# C: A + welford tail
@functools.partial(jax.jit, static_argnames=())
def fC(params, o, d, subframe, ray_ids, state):
    sample = pathtracer.render_subframe(
        params, static, o, d, 1, subframe, ray_ids
    ).reshape(S, N, 3)
    sample = prog.paint_error_pixels(sample)
    bm = sample.mean(axis=0)
    bm2 = ((sample - bm) ** 2).sum(axis=0)
    from deepestscatter_tpu.ops import welford as welford_ops
    merged = welford_ops.merge(
        welford_ops.Welford(state.mean, state.m2, state.subframe_id.astype(jnp.float32)),
        welford_ops.Welford(bm, bm2, jnp.float32(S)),
    )
    return prog.ProgressiveState(merged.mean, merged.m2, state.subframe_id + S)

state = prog.init_state(N)
rC = bench("C +welford     ", lambda: fC(params, o, d, subframe, ray_ids, state).mean)

# D: full tick
r = prog.ProgressiveRenderer(cfg, params, static, seed=1)
t0 = time.time(); r.tick(); jax.block_until_ready(r.state.mean)
print(f"  D full tick: compile+first {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
nt = 3
for _ in range(nt):
    r.tick()
jax.block_until_ready(r.state.mean)
dt = (time.time() - t0) / nt
print(f"  D full tick: {dt:.3f} s -> {N*S/dt/1e6:.3f} Mrays/s", flush=True)

print("A vs B max abs diff:", float(jnp.abs(rA - rB).max()))
