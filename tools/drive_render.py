"""Drive the framework end-to-end through its public API, as a user would:
build a scene, bake, render with PT + both neural renderers, write EXRs."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from deepestscatter_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

print("devices:", jax.devices(), flush=True)

from deepestscatter_tpu.config import SceneConfig, CameraConfig, CloudModel
from deepestscatter_tpu import scene as scene_mod
from deepestscatter_tpu.data import procedural
from deepestscatter_tpu.models.rpnn import DisneyModel
from deepestscatter_tpu.models.probes import LightProbeModel, ProbeRendererModel
from deepestscatter_tpu.render import inscatter, neural, baked, camera as cam
from deepestscatter_tpu.render.progressive import ProgressiveRenderer
from deepestscatter_tpu.utils import exr

W, H, RES = 128, 64, 64
cfg = SceneConfig(cloud=CloudModel(size_m=2000.0), camera=CameraConfig(width=W, height=H))
density = procedural.cumulus(resolution=RES, seed=11)
params, static = scene_mod.build_scene(cfg, density)
t0 = time.time()
params = inscatter.with_baked_inscatter(params, static)
print(f"inscatter bake: {time.time()-t0:.2f}s", flush=True)

# --- path tracer, a few ticks ---
pr = ProgressiveRenderer(cfg, params, static, seed=1)
t0 = time.time()
for _ in range(3):
    rem = pr.tick()
print(f"PT 3 ticks (30 subframes): {time.time()-t0:.2f}s, unconverged={rem}", flush=True)
hdr = pr.hdr_image()
print("PT img: mean", float(hdr.mean()), "max", float(hdr.max()), flush=True)
exr.write_exr("/tmp/pt.exr", hdr)
back = exr.read_exr("/tmp/pt.exr")
assert np.allclose(back, hdr, atol=1e-6), "EXR round-trip mismatch"
print("EXR round-trip OK", flush=True)

# --- RPNN neural render ---
model = DisneyModel()
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 226)))
renderer = neural.DisneyRenderer(model, variables)
basis = cam.camera_basis(cfg.camera)
t0 = time.time()
frame = renderer.render_frame(params, static, W, H, basis, seed=5)
frame.block_until_ready()
t_compile = time.time() - t0
t0 = time.time()
frame = renderer.render_frame(params, static, W, H, basis, seed=5)
frame.block_until_ready()
print(f"NN render {W}x{H}: compile+run {t_compile:.2f}s, steady {time.time()-t0:.3f}s", flush=True)
print("NN img: mean", float(jnp.mean(frame)), "finite", bool(jnp.all(jnp.isfinite(frame))), flush=True)
exr.write_exr("/tmp/nn.exr", np.asarray(frame))

# --- Baked neural render ---
probe_model = LightProbeModel()
probe_vars = probe_model.init(jax.random.PRNGKey(1), jnp.zeros((1, 9, 225)))
rend_model = ProbeRendererModel()
rend_vars = rend_model.init(jax.random.PRNGKey(2), jnp.zeros((1, 202)), jnp.zeros((1, 3, 226)))
t0 = time.time()
brenderer = baked.BakedRenderer(params, static, probe_model, probe_vars, rend_model, rend_vars)
print(f"probe bake {brenderer.lattice}: {time.time()-t0:.2f}s", flush=True)
t0 = time.time()
bframe = brenderer.render_frame(params, static, W, H, basis, seed=5)
bframe.block_until_ready()
t_compile = time.time() - t0
t0 = time.time()
bframe = brenderer.render_frame(params, static, W, H, basis, seed=5)
bframe.block_until_ready()
print(f"BNN render: compile+run {t_compile:.2f}s, steady {time.time()-t0:.3f}s", flush=True)
print("BNN img: mean", float(jnp.mean(bframe)), "finite", bool(jnp.all(jnp.isfinite(bframe))), flush=True)

# --- probes: zero-density cloud → everything transparent, image == sky ---
empty = np.zeros((16, 16, 16), np.float32)
p2, s2 = scene_mod.build_scene(cfg, empty)
o2, d2 = cam.generate_rays(basis, 32, 16)
f2 = neural.render_disney(p2, s2, model, variables, o2, d2)
hit2, _ = cam.intersect_box(o2, d2, s2, p2.bbox_size)
miss = cam.miss_radiance(p2, s2, d2)
h = np.asarray(hit2)
# Reference semantics: non-scattering box hits stay black (copyToFrameResult
# writes only scattered pixels); misses shade sun/sky.
assert np.allclose(np.asarray(f2)[h], 0.0), "empty-cloud box hits should be black"
assert np.allclose(np.asarray(f2)[~h], np.asarray(miss)[~h]), "misses should shade sky"
print("probe: empty cloud → black box / sky miss OK", flush=True)

# --- probe: axis-parallel ray through box (inv=inf path) ---
o = jnp.asarray([[0.0, 0.0, -3.0]]); d = jnp.asarray([[0.0, 0.0, 1.0]])
f3 = neural.render_disney(params, static, model, variables, o, d)
assert np.all(np.isfinite(np.asarray(f3))), "axis-parallel ray produced non-finite"
print("probe: axis-parallel ray OK", flush=True)
print("ALL DRIVE STEPS PASSED")
