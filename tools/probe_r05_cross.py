"""What re-serializes the standalone march? geo body + incremental
crossing machinery."""
import sys, os, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from deepestscatter_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp, dataclasses
import importlib.util
spec = importlib.util.spec_from_file_location('pd', os.path.join(os.path.dirname(__file__), 'perf_decompose.py'))
pd = importlib.util.module_from_spec(spec); spec.loader.exec_module(pd)
from deepestscatter_tpu import scene as scene_mod
from deepestscatter_tpu.ops import grid as grid_ops, march as march_ops
from deepestscatter_tpu.render import camera as camera_ops
from deepestscatter_tpu.scene import is_in_box

cfg, params, static = pd.build_scene()
BRICK = 3; half = (BRICK+1)**3
rows_grid = params.march_rows.reshape(-1, scene_mod.march_row_width(BRICK))
dens_tab = rows_grid[:, :half]
rows_scale = jnp.float32(scene_mod.march_rows_scale(params.march_rows))
step = jnp.float32(static.sample_step); dm = jnp.float32(static.density_multiplier)
n_sub = static.march_substeps
rng = np.random.default_rng(0)
LANES = 16384; ITERS = 200
basis = camera_ops.camera_basis(cfg.camera)
origins, directions = camera_ops.generate_rays(basis, 512, 512)
mid = (origins.shape[0]-LANES)//2
o = origins[mid:mid+LANES]; d = directions[mid:mid+LANES]
hit, t_hit = camera_ops.intersect_box(o, d, static, params.bbox_size)
entry = o + d*t_hit[:,None] + 0.5*params.bbox_size
od = jnp.asarray(rng.uniform(1e-3, 1.0, LANES), jnp.float32)
out = {"n_sub": int(n_sub), "lanes": LANES}

def variant(name, with_cross, with_back, with_scatterrec):
    def body(c):
        pos, dirn, trans, odc, scattered, spos, alive = c
        first = pos + dirn*step
        cell0, _, ridx0, _ = grid_ops.brick_cell(first/params.bbox_size, static.grid_shape, BRICK)
        rows = jnp.take(dens_tab, ridx0, axis=0, mode="clip").astype(jnp.float32)*rows_scale
        live = alive; cur = pos
        for j in range(n_sub):
            newp = first if j == 0 else cur + dirn*step
            cellj, fracj, _, localj = grid_ops.brick_cell(newp/params.bbox_size, static.grid_shape, BRICK)
            ok = live if j == 0 else live & jnp.all(cellj == cell0, axis=-1)
            density = grid_ops.trilinear_from_brick(rows, localj, fracj, BRICK)*dm
            trans_new = jnp.where(ok, trans*jnp.exp(-density*step), trans)
            if with_cross:
                crossed = ok & ~scattered & (odc > trans_new)
                if with_back:
                    back = march_ops.back_correct_distance(odc, trans_new, density)
                    cand = newp - dirn*back[:,None]
                else:
                    cand = newp
                if with_scatterrec:
                    spos = jnp.where(crossed[:,None], cand, spos)
                scattered = scattered | crossed
            inb = is_in_box(newp, params.bbox_size)
            trans = trans_new
            pos = jnp.where(ok[:,None], newp, pos)
            live = ok & inb
            cur = jnp.where(ok[:,None], newp, cur)
        reset = ~live
        pos = jnp.where(reset[:,None], entry, pos)
        trans = jnp.where(reset, 1.0, trans)
        scattered = jnp.where(reset, False, scattered)
        return (pos, dirn, trans, odc, scattered, spos, alive)
    @jax.jit
    def run(e, od_):
        init = (e, d, jnp.ones(LANES), od_, jnp.zeros(LANES, bool), jnp.zeros((LANES,3)), hit)
        def b(c, _):
            return body(c), None
        c, _ = jax.lax.scan(b, init, None, length=ITERS)
        return c[0]
    dt = pd.timeit(run, entry, od, reps=3)
    out[name] = round(LANES*ITERS/dt/1e6, 1)
    print(name, out[name], flush=True)

variant("geo_plain", False, False, False)
variant("geo_cross", True, False, False)
variant("geo_cross_back", True, True, False)
variant("geo_full", True, True, True)

# the actual next_scattering_event (pipelined static), timed per-iteration-est
pstatic = dataclasses.replace(static, march_pipeline=True)
@jax.jit
def real(e, od_):
    ev = march_ops.next_scattering_event(params, pstatic, od_, e, d, stop_at_scatter=False)
    return ev.transmittance
dt = pd.timeit(real, entry, od, reps=3)
out["real_nse_s"] = round(dt, 3)
print("real_nse_s", out["real_nse_s"], flush=True)
with open('/tmp/probe_cross.json','w') as f: json.dump(out, f, indent=1)
