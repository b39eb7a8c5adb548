"""Quick chip probes: (1) gather rate vs lane count; (2) log-space march
body (no exp/log per substep) vs the current body."""
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
BRICK = 3
half = (BRICK+1)**3
rows_grid = params.march_rows.reshape(-1, scene_mod.march_row_width(BRICK))
dens_tab = rows_grid[:, :half]
n_rows = dens_tab.shape[0]
rows_scale = jnp.float32(scene_mod.march_rows_scale(params.march_rows))
step = jnp.float32(static.sample_step); dm = jnp.float32(static.density_multiplier)
n_sub = static.march_substeps
nz, ny, nx = static.grid_shape
dims_f = jnp.asarray([nx, ny, nz], jnp.float32)
rng = np.random.default_rng(0)
out = {}

# (1) gather rate vs lanes
for lanes in (16384, 32768, 65536, 131072, 262144):
    idx0 = jnp.asarray(rng.integers(0, n_rows, lanes), jnp.uint32)
    iters = max(50, 200 * 32768 // lanes)
    @jax.jit
    def stage_a(tab, idx, iters=iters, lanes=lanes):
        def body(c, _):
            idx, acc = c
            r = jnp.take(tab, idx.astype(jnp.int32), axis=0, mode="clip")
            acc = acc + r[:, :8].astype(jnp.float32).sum(-1)
            idx = (idx * jnp.uint32(1103515245) + jnp.uint32(12345)) % jnp.uint32(n_rows)
            return (idx, acc), None
        (_, acc), _ = jax.lax.scan(body, (idx, jnp.zeros(lanes)), None, length=iters)
        return acc
    dt = pd.timeit(stage_a, dens_tab, idx0, reps=3)
    out[f"gather_{lanes}"] = round(lanes*iters/dt/1e6, 1)
    print(f"gather lanes={lanes}: {out[f'gather_{lanes}']} Mrows/s", flush=True)

# (2) log-space march body at 32768 lanes
LANES = 32768
basis = camera_ops.camera_basis(cfg.camera)
origins, directions = camera_ops.generate_rays(basis, 512, 512)
mid = (origins.shape[0]-LANES)//2
o = origins[mid:mid+LANES]; d = directions[mid:mid+LANES]
hit, t_hit = camera_ops.intersect_box(o, d, static, params.bbox_size)
entry = o + d*t_hit[:,None] + 0.5*params.bbox_size
od = jnp.asarray(rng.uniform(1e-3, 1.0, LANES), jnp.float32)
ITERS = 200

def body_log(carry):
    pos, dirn, tau, log_od, alive = carry
    first = pos + dirn*step
    cell0, _, ridx0, _ = grid_ops.brick_cell(first/params.bbox_size, static.grid_shape, BRICK)
    rows = jnp.take(dens_tab, ridx0, axis=0, mode="clip").astype(jnp.float32)
    dens_rows = rows * rows_scale
    live = alive; cur = pos
    cross_dens = jnp.zeros(LANES); cross_tau = jnp.zeros(LANES); crossed_any = jnp.zeros(LANES, bool)
    for j in range(n_sub):
        newp = first if j == 0 else cur + dirn*step
        cellj, fracj, _, localj = grid_ops.brick_cell(newp/params.bbox_size, static.grid_shape, BRICK)
        ok = live if j == 0 else live & jnp.all(cellj == cell0, axis=-1)
        density = grid_ops.trilinear_from_brick(dens_rows, localj, fracj, BRICK) * dm
        tau_new = jnp.where(ok, tau + density*step, tau)
        crossed = ok & (log_od > -tau_new)     # od > exp(-tau)
        # record crossing state; back-correct AFTER the loop (one log-free div)
        cross_dens = jnp.where(crossed & ~crossed_any, density, cross_dens)
        cross_tau = jnp.where(crossed & ~crossed_any, tau_new, cross_tau)
        crossed_any = crossed_any | crossed
        inb = is_in_box(newp, params.bbox_size)
        pos = jnp.where(ok[:,None], newp, pos)
        tau = tau_new
        live = ok & ~crossed & inb
        cur = jnp.where(ok[:,None], newp, cur)
    # one back-correct for the (at most one) crossing this iteration
    back = (log_od + cross_tau) / jnp.maximum(cross_dens, 1e-10)
    pos = jnp.where(crossed_any[:,None], pos - dirn*back[:,None], pos)
    zero_cell = dens_rows.max(axis=-1) <= 0.0
    extra = march_ops.empty_cell_exit_steps(cell0*BRICK, cur, dirn, dims_f, params.bbox_size, step, span=float(BRICK))
    pos = pos + dirn*(jnp.where(zero_cell & live, extra, 0.0)*step)[:,None]
    reset = ~live
    pos = jnp.where(reset[:,None], entry, pos)
    tau = jnp.where(reset, 0.0, tau)
    return (pos, dirn, tau, log_od, alive)

@jax.jit
def stage_log(entry_, od_):
    init = (entry_, d, jnp.zeros(LANES), jnp.log(jnp.maximum(od_, 1e-20)), hit)
    def body(c, _):
        return body_log(c), None
    outc, _ = jax.lax.scan(body, init, None, length=ITERS)
    return outc[2]
dt = pd.timeit(stage_log, entry, od, reps=3)
out["C_logspace_Mrows_s"] = round(LANES*ITERS/dt/1e6, 1)
print(f"C log-space: {out['C_logspace_Mrows_s']} Mrows/s", flush=True)

# (3) log-space at 131072 lanes (band-size interaction)
LANES2 = 131072
o2 = origins[mid-LANES2//2:mid+LANES2//2]; d2 = directions[mid-LANES2//2:mid+LANES2//2]
hit2, t2 = camera_ops.intersect_box(o2, d2, static, params.bbox_size)
entry2 = o2 + d2*t2[:,None] + 0.5*params.bbox_size
od2 = jnp.asarray(rng.uniform(1e-3, 1.0, LANES2), jnp.float32)
ITERS2 = 60
def body_log2(carry):
    pos, dirn, tau, log_od, alive = carry
    first = pos + dirn*step
    cell0, _, ridx0, _ = grid_ops.brick_cell(first/params.bbox_size, static.grid_shape, BRICK)
    rows = jnp.take(dens_tab, ridx0, axis=0, mode="clip").astype(jnp.float32)
    dens_rows = rows * rows_scale
    live = alive; cur = pos
    crossed_any = jnp.zeros(LANES2, bool)
    for j in range(n_sub):
        newp = first if j == 0 else cur + dirn*step
        cellj, fracj, _, localj = grid_ops.brick_cell(newp/params.bbox_size, static.grid_shape, BRICK)
        ok = live if j == 0 else live & jnp.all(cellj == cell0, axis=-1)
        density = grid_ops.trilinear_from_brick(dens_rows, localj, fracj, BRICK) * dm
        tau_new = jnp.where(ok, tau + density*step, tau)
        crossed = ok & (log_od > -tau_new)
        crossed_any = crossed_any | crossed
        inb = is_in_box(newp, params.bbox_size)
        pos = jnp.where(ok[:,None], newp, pos)
        tau = tau_new
        live = ok & ~crossed & inb
        cur = jnp.where(ok[:,None], newp, cur)
    zero_cell = dens_rows.max(axis=-1) <= 0.0
    extra = march_ops.empty_cell_exit_steps(cell0*BRICK, cur, dirn, dims_f, params.bbox_size, step, span=float(BRICK))
    pos = pos + dirn*(jnp.where(zero_cell & live, extra, 0.0)*step)[:,None]
    reset = ~live
    pos = jnp.where(reset[:,None], entry2, pos)
    tau = jnp.where(reset, 0.0, tau)
    return (pos, dirn, tau, log_od, alive)
@jax.jit
def stage_log2(entry_, od_):
    init = (entry_, d2, jnp.zeros(LANES2), jnp.log(jnp.maximum(od_, 1e-20)), hit2)
    def body(c, _):
        return body_log2(c), None
    outc, _ = jax.lax.scan(body, init, None, length=ITERS2)
    return outc[2]
dt = pd.timeit(stage_log2, entry2, od2, reps=3)
out["C_logspace_131k_Mrows_s"] = round(LANES2*ITERS2/dt/1e6, 1)
print(f"C log-space 131k lanes: {out['C_logspace_131k_Mrows_s']} Mrows/s", flush=True)
with open('/tmp/probe_r05_quick.json','w') as f: json.dump(out, f, indent=1)
