"""Bisect stage C's cost: which part of the march body eats the 126->56?"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from deepestscatter_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
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
n_rows = dens_tab.shape[0]
rows_scale = jnp.float32(scene_mod.march_rows_scale(params.march_rows))
step = jnp.float32(static.sample_step); dm = jnp.float32(static.density_multiplier)
n_sub = static.march_substeps
nz, ny, nx = static.grid_shape
dims_f = jnp.asarray([nx, ny, nz], jnp.float32)
rng = np.random.default_rng(0)
LANES = 32768; ITERS = 200
basis = camera_ops.camera_basis(cfg.camera)
origins, directions = camera_ops.generate_rays(basis, 512, 512)
mid = (origins.shape[0]-LANES)//2
o = origins[mid:mid+LANES]; d = directions[mid:mid+LANES]
hit, t_hit = camera_ops.intersect_box(o, d, static, params.bbox_size)
entry = o + d*t_hit[:,None] + 0.5*params.bbox_size
out = {}

def run(name, body_fn, init):
    @jax.jit
    def stage(init0):
        def body(c, _):
            return body_fn(c), None
        outc, _ = jax.lax.scan(body, init0, None, length=ITERS)
        return outc[0]
    dt = pd.timeit(stage, init, reps=3)
    out[name] = round(LANES*ITERS/dt/1e6, 1)
    print(f"{name}: {out[name]} Mrows/s", flush=True)

# C1: position advance + ONE brick_cell + gather; no substeps beyond advance
def c1(c):
    pos, dirn = c
    first = pos + dirn*step
    cell0, frac0, ridx0, local0 = grid_ops.brick_cell(first/params.bbox_size, static.grid_shape, BRICK)
    rows = jnp.take(dens_tab, ridx0, axis=0, mode="clip").astype(jnp.float32) * rows_scale
    acc = rows[:, 0]
    pos = first + dirn*(step*(acc*0 + 3.0))[:,None]   # advance a few steps, depends on gather
    pos = jnp.where(is_in_box(pos, params.bbox_size)[:,None], pos, entry)
    return (pos, dirn)
run("C1_gather_1cell", c1, (entry, d))

# C2: + 4x brick_cell (per substep) but NO trilinear, NO masks
def c2(c):
    pos, dirn = c
    first = pos + dirn*step
    cell0, _, ridx0, _ = grid_ops.brick_cell(first/params.bbox_size, static.grid_shape, BRICK)
    rows = jnp.take(dens_tab, ridx0, axis=0, mode="clip").astype(jnp.float32) * rows_scale
    s = jnp.zeros(LANES)
    cur = pos
    for j in range(n_sub):
        newp = first if j == 0 else cur + dirn*step
        cellj, fracj, _, localj = grid_ops.brick_cell(newp/params.bbox_size, static.grid_shape, BRICK)
        s = s + fracj[:,0] + localj[:,0].astype(jnp.float32)
        cur = newp
    pos = cur + dirn*(s*0)[:,None] + dirn*step
    pos = jnp.where(is_in_box(pos, params.bbox_size)[:,None], pos, entry)
    return (pos, dirn)
run("C2_plus_4cellmath", c2, (entry, d))

# C3: C2 + trilinear per substep (no masks/state)
def c3(c):
    pos, dirn = c
    first = pos + dirn*step
    cell0, _, ridx0, _ = grid_ops.brick_cell(first/params.bbox_size, static.grid_shape, BRICK)
    rows = jnp.take(dens_tab, ridx0, axis=0, mode="clip").astype(jnp.float32) * rows_scale
    s = jnp.zeros(LANES)
    cur = pos
    for j in range(n_sub):
        newp = first if j == 0 else cur + dirn*step
        cellj, fracj, _, localj = grid_ops.brick_cell(newp/params.bbox_size, static.grid_shape, BRICK)
        s = s + grid_ops.trilinear_from_brick(rows, localj, fracj, BRICK)
        cur = newp
    pos = cur + dirn*(s*0)[:,None] + dirn*step
    pos = jnp.where(is_in_box(pos, params.bbox_size)[:,None], pos, entry)
    return (pos, dirn)
run("C3_plus_trilinear", c3, (entry, d))

# C4: C3 + transmittance+masks (≈ full C, minus empty-skip & back-correct)
def c4(c):
    pos, dirn, trans, alive = c
    first = pos + dirn*step
    cell0, _, ridx0, _ = grid_ops.brick_cell(first/params.bbox_size, static.grid_shape, BRICK)
    rows = jnp.take(dens_tab, ridx0, axis=0, mode="clip").astype(jnp.float32) * rows_scale
    live = alive; cur = pos
    for j in range(n_sub):
        newp = first if j == 0 else cur + dirn*step
        cellj, fracj, _, localj = grid_ops.brick_cell(newp/params.bbox_size, static.grid_shape, BRICK)
        ok = live if j == 0 else live & jnp.all(cellj == cell0, axis=-1)
        density = grid_ops.trilinear_from_brick(rows, localj, fracj, BRICK) * dm
        trans = jnp.where(ok, trans*jnp.exp(-density*step), trans)
        inb = is_in_box(newp, params.bbox_size)
        pos = jnp.where(ok[:,None], newp, pos)
        live = ok & inb
        cur = jnp.where(ok[:,None], newp, cur)
    reset = ~live
    pos = jnp.where(reset[:,None], entry, pos)
    trans = jnp.where(reset, 1.0, trans)
    return (pos, dirn, trans, alive)
run("C4_plus_masks", c4, (entry, d, jnp.ones(LANES), hit))

# C5: full body including back-correct + empty-skip (repeat of stage C)
od = jnp.asarray(rng.uniform(1e-3, 1.0, LANES), jnp.float32)
def c5(c):
    pos, dirn, trans, odc, alive = c
    first = pos + dirn*step
    cell0, _, ridx0, _ = grid_ops.brick_cell(first/params.bbox_size, static.grid_shape, BRICK)
    rows = jnp.take(dens_tab, ridx0, axis=0, mode="clip").astype(jnp.float32)
    dens_rows = rows * rows_scale
    live = alive; cur = pos
    for j in range(n_sub):
        newp = first if j == 0 else cur + dirn*step
        cellj, fracj, _, localj = grid_ops.brick_cell(newp/params.bbox_size, static.grid_shape, BRICK)
        ok = live if j == 0 else live & jnp.all(cellj == cell0, axis=-1)
        density = grid_ops.trilinear_from_brick(dens_rows, localj, fracj, BRICK) * dm
        trans_new = jnp.where(ok, trans*jnp.exp(-density*step), trans)
        crossed = ok & (odc > trans_new)
        back = march_ops.back_correct_distance(odc, trans_new, density)
        spos = newp - dirn*back[:,None]
        inb = is_in_box(newp, params.bbox_size)
        pos = jnp.where(ok[:,None], jnp.where(crossed[:,None], spos, newp), pos)
        trans = trans_new
        live = ok & ~crossed & inb
        cur = jnp.where(ok[:,None], newp, cur)
    zero_cell = dens_rows.max(axis=-1) <= 0.0
    extra = march_ops.empty_cell_exit_steps(cell0*BRICK, cur, dirn, dims_f, params.bbox_size, step, span=float(BRICK))
    pos = pos + dirn*(jnp.where(zero_cell & live, extra, 0.0)*step)[:,None]
    reset = ~live
    pos = jnp.where(reset[:,None], entry, pos)
    trans = jnp.where(reset, 1.0, trans)
    return (pos, dirn, trans, odc, alive)
run("C5_full_body", c5, (entry, d, jnp.ones(LANES), od, hit))
with open('/tmp/probe_bisect.json','w') as f: json.dump(out, f, indent=1)
