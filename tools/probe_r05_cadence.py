"""Static-cadence unconditional resolve: body = K march_iters + 1 resolve,
no lax.cond.  Sweep K and n_sub."""
import sys, os, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from deepestscatter_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
import importlib.util
spec = importlib.util.spec_from_file_location('pd', os.path.join(os.path.dirname(__file__), 'perf_decompose.py'))
pd = importlib.util.module_from_spec(spec); spec.loader.exec_module(pd)
from deepestscatter_tpu import scene as scene_mod
from deepestscatter_tpu.ops import grid as grid_ops
from deepestscatter_tpu.render import camera as camera_ops
from deepestscatter_tpu.scene import is_in_box

cfg, params, static = pd.build_scene()
BRICK = 3; half = (BRICK+1)**3
rows_grid = params.march_rows.reshape(-1, scene_mod.march_row_width(BRICK))
dens_tab = rows_grid[:, :half]
insc_tab = rows_grid[:, half:2*half]
rows_scale = jnp.float32(scene_mod.march_rows_scale(params.march_rows))
step = jnp.float32(static.sample_step); dm = jnp.float32(static.density_multiplier)
rng = np.random.default_rng(0)
LANES = 32768
basis = camera_ops.camera_basis(cfg.camera)
origins, directions = camera_ops.generate_rays(basis, 512, 512)
mid = (origins.shape[0]-LANES)//2
o = origins[mid:mid+LANES]; d = directions[mid:mid+LANES]
hit, t_hit = camera_ops.intersect_box(o, d, static, params.bbox_size)
entry = o + d*t_hit[:,None] + 0.5*params.bbox_size
out = {}

def make_geo_body(n_sub):
    def geo_body(c):
        pos, dirn, trans, alive = c
        first = pos + dirn*step
        cell0, _, ridx0, _ = grid_ops.brick_cell(first/params.bbox_size, static.grid_shape, BRICK)
        rows = jnp.take(dens_tab, ridx0, axis=0, mode="clip").astype(jnp.float32) * rows_scale
        live = alive; cur = pos
        for j in range(n_sub):
            newp = first if j == 0 else cur + dirn*step
            cellj, fracj, _, localj = grid_ops.brick_cell(newp/params.bbox_size, static.grid_shape, BRICK)
            ok_geo = live if j == 0 else live & jnp.all(cellj == cell0, axis=-1)
            density = grid_ops.trilinear_from_brick(rows, localj, fracj, BRICK) * dm
            trans = jnp.where(ok_geo, trans*jnp.exp(-density*step), trans)
            inb = is_in_box(newp, params.bbox_size)
            pos = jnp.where(ok_geo[:,None], newp, pos)
            live = ok_geo & inb
            cur = jnp.where(ok_geo[:,None], newp, cur)
        reset = ~live
        pos = jnp.where(reset[:,None], entry, pos)
        trans = jnp.where(reset, 1.0, trans)
        return (pos, dirn, trans, alive)
    return geo_body

def resolve(c):
    pos, dirn, trans, alive = c
    _, frac, ridx, local = grid_ops.brick_cell(pos/params.bbox_size, static.grid_shape, BRICK)
    rowsi = jnp.take(insc_tab, ridx, axis=0, mode="clip").astype(jnp.float32) * rows_scale
    ts = grid_ops.trilinear_from_brick(rowsi, local, frac, BRICK)
    # serializing: position perturbed by resolve output (new-direction analog)
    pos = pos + dirn * (ts*0.0)[:,None]
    trans = jnp.where(trans < 0.37, 1.0, trans)
    return (pos, dirn, trans, alive)

for n_sub in (4, 6):
    body_fn = make_geo_body(n_sub)
    for K in (4, 8, 16):
        ITERS = 192
        @jax.jit
        def run(e, t0, K=K, body_fn=body_fn):
            def cond(s):
                return (s[0] < ITERS) & (jnp.count_nonzero(s[1][3]) > 0)
            def body(s):
                i, c = s
                for _ in range(K):
                    c = body_fn(c)
                c = resolve(c)
                return (i+K, c)
            _, c = jax.lax.while_loop(cond, body, (jnp.int32(0), (e, d, t0, hit)))
            return c[0]
        dt = pd.timeit(run, entry, jnp.ones(LANES), reps=3)
        key = f"nsub{n_sub}_K{K}"
        out[key] = round(LANES*ITERS/dt/1e6, 1)
        print(key, out[key], flush=True)
with open('/tmp/probe_cadence.json','w') as f: json.dump(out, f, indent=1)
