"""Decompose the 256^3 march residual: where do the cycles between the raw
gather roofline and the achieved march rate go?  (VERDICT r4 task 2: commit
a per-component table that sums to the observed gap.)

Stages build the deferred march loop incrementally at the bench operating
point (256^3 uint8 scene, brick 3, 32768 lanes — bench.py's band size);
every stage is a lax.scan of K iterations timed by value fetch with distinct
inputs per timed call (tunnel discipline, docs/PERFORMANCE.md):

  A  gather-only       take(dens_tab, idx) + LCG index churn (the roofline)
  B  + trilinear x4    dequant + 4 trilinear_from_brick contractions with
                       synthetic frac/local (the VPU arithmetic of the
                       substeps, no ray state)
  C  march body        a faithful copy of the deferred loop's march_iter
                       (real ray state: positions, fetch_cell per substep,
                       crossing/exit masks, empty-skip) on full-occupancy
                       synthetic rays
  D  + loop control    C under lax.while_loop with the per-check
                       count_nonzero reductions and the lax.cond(resolve)
                       scheduling of loop_body (resolve never taken)
  E  real loop         pathtracer.trace_tick_moments with_stats on camera
                       rays — achieved Mrows/s from the exact gather count
                       (the bench number's instrument)

Run:  cd /root/repo && timeout 900 python -u tools/perf_decompose.py --march
      (writes PERF_r05.json stage table)

--neural: per-component timing of the neural renderers' frame at the
reference operating point (512x256, 256^3): pass-1/pass-2 camera marches,
descriptor gathers (10-layer and 3-layer), probe interpolation, MLPs,
end-to-end frames.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANES = 32768
RES = 256
BRICK = 3


def timeit(fn, *args, reps=3, **kw):
    """Median wall time by VALUE FETCH (block_until_ready can lie through
    the tunnel)."""
    out = fn(*args, **kw)
    _fetch(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        _fetch(fn(*args, **kw))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def _fetch(out):
    import jax

    leaves = jax.tree.leaves(out)
    return float(np.asarray(leaves[0].sum() if hasattr(leaves[0], "sum") else leaves[0]))


def build_scene():
    from deepestscatter_tpu import scene as scene_mod
    from deepestscatter_tpu.config import (
        CameraConfig,
        CloudModel,
        CloudRendering,
        SceneConfig,
    )
    from deepestscatter_tpu.data import procedural
    from deepestscatter_tpu.render import inscatter

    cfg = SceneConfig(
        cloud=CloudModel(size_m=2000.0),
        camera=CameraConfig(width=512, height=512),
        rendering=CloudRendering(march_dtype="uint8", march_brick=BRICK),
    )
    density = procedural.cumulus(resolution=RES, seed=11)
    params, static = scene_mod.build_scene(cfg, density)
    params = inscatter.with_baked_inscatter(params, static)
    return cfg, params, static


def march_stages(reps=3, iters=200):
    import jax
    import jax.numpy as jnp

    from deepestscatter_tpu import scene as scene_mod
    from deepestscatter_tpu.ops import grid as grid_ops
    from deepestscatter_tpu.ops import march as march_ops
    from deepestscatter_tpu.render import camera as camera_ops
    from deepestscatter_tpu.render import pathtracer
    from deepestscatter_tpu.scene import is_in_box

    cfg, params, static = build_scene()
    half = (BRICK + 1) ** 3
    rows_grid = params.march_rows.reshape(-1, scene_mod.march_row_width(BRICK))
    dens_tab = rows_grid[:, :half]
    n_rows = dens_tab.shape[0]
    rows_scale = jnp.float32(scene_mod.march_rows_scale(params.march_rows))
    n_sub = static.march_substeps
    step = jnp.float32(static.sample_step)
    dm = jnp.float32(static.density_multiplier)
    nz, ny, nx = static.grid_shape
    dims_f = jnp.asarray([nx, ny, nz], jnp.float32)

    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, n_rows, LANES), jnp.uint32)

    report = {"lanes": LANES, "iters": iters, "res": RES, "brick": BRICK,
              "table_mb": round(dens_tab.size * dens_tab.dtype.itemsize / 1e6, 1)}

    # --- A: gather only ----------------------------------------------------
    @jax.jit
    def stage_a(tab, idx):
        def body(c, _):
            idx, acc = c
            r = jnp.take(tab, idx.astype(jnp.int32), axis=0, mode="clip")
            acc = acc + r[:, :8].astype(jnp.float32).sum(-1)
            idx = (idx * jnp.uint32(1103515245) + jnp.uint32(12345)) % jnp.uint32(n_rows)
            return (idx, acc), None
        (_, acc), _ = jax.lax.scan(body, (idx, jnp.zeros(LANES)), None, length=iters)
        return acc

    dt = timeit(stage_a, dens_tab, idx0, reps=reps)
    report["A_gather_only_Mrows_s"] = round(LANES * iters / dt / 1e6, 1)

    # --- B: + dequant + 4x trilinear ---------------------------------------
    @jax.jit
    def stage_b(tab, idx):
        def body(c, _):
            idx, acc = c
            r = jnp.take(tab, idx.astype(jnp.int32), axis=0, mode="clip")
            rows = r.astype(jnp.float32) * rows_scale
            fr = (idx & jnp.uint32(255)).astype(jnp.float32) / 255.0
            frac = jnp.stack([fr, fr * 0.7, fr * 0.3], -1)
            local = jnp.stack([
                (idx % 3).astype(jnp.int32),
                ((idx >> 2) % 3).astype(jnp.int32),
                ((idx >> 4) % 3).astype(jnp.int32),
            ], -1)
            s = jnp.zeros(LANES)
            for j in range(n_sub):
                s = s + grid_ops.trilinear_from_brick(
                    rows, local, jnp.minimum(frac + 0.02 * j, 1.0), BRICK
                )
            acc = acc + s
            idx = (idx * jnp.uint32(1103515245) + jnp.uint32(12345)) % jnp.uint32(n_rows)
            return (idx, acc), None
        (_, acc), _ = jax.lax.scan(body, (idx, jnp.zeros(LANES)), None, length=iters)
        return acc

    dt = timeit(stage_b, dens_tab, idx0, reps=reps)
    report["B_plus_trilinear_Mrows_s"] = round(LANES * iters / dt / 1e6, 1)

    # --- C: faithful march body (scan, no loop control) --------------------
    basis = camera_ops.camera_basis(cfg.camera)
    origins, directions = camera_ops.generate_rays(basis, 512, 512)
    mid = max(0, (origins.shape[0] - LANES) // 2)  # center rays hit the cloud
    o = origins[mid:mid + LANES]
    d = directions[mid:mid + LANES]
    hit, t_hit = camera_ops.intersect_box(o, d, static, params.bbox_size)
    entry = o + d * t_hit[:, None] + 0.5 * params.bbox_size
    od = jnp.asarray(rng.uniform(1e-3, 1.0, LANES), jnp.float32)

    def march_body(carry):
        pos, dirn, trans, odc, alive = carry
        first = pos + dirn * step
        cell0, _, ridx0, _ = grid_ops.brick_cell(
            first / params.bbox_size, static.grid_shape, BRICK
        )
        rows = jnp.take(dens_tab, ridx0, axis=0, mode="clip").astype(jnp.float32)
        dens_rows = rows * rows_scale
        live = alive
        cur = pos
        pending = jnp.zeros_like(alive)
        for j in range(n_sub):
            newp = first if j == 0 else cur + dirn * step
            cellj, fracj, _, localj = grid_ops.brick_cell(
                newp / params.bbox_size, static.grid_shape, BRICK
            )
            ok = live if j == 0 else live & jnp.all(cellj == cell0, axis=-1)
            density = grid_ops.trilinear_from_brick(dens_rows, localj, fracj, BRICK) * dm
            trans_new = jnp.where(ok, trans * jnp.exp(-density * step), trans)
            crossed = ok & (odc > trans_new)
            back = march_ops.back_correct_distance(odc, trans_new, density)
            spos = newp - dirn * back[:, None]
            inb = is_in_box(newp, params.bbox_size)
            pos = jnp.where(ok[:, None], jnp.where(crossed[:, None], spos, newp), pos)
            trans = trans_new
            pending = pending | crossed
            live = ok & ~crossed & inb
            cur = jnp.where(ok[:, None], newp, cur)
        zero_cell = dens_rows.max(axis=-1) <= 0.0
        extra = march_ops.empty_cell_exit_steps(
            cell0 * BRICK, cur, dirn, dims_f, params.bbox_size, step, span=float(BRICK)
        )
        pos = pos + dirn * (jnp.where(zero_cell & live, extra, 0.0) * step)[:, None]
        # keep occupancy full for the measurement: dead/pending lanes reset
        reset = ~live
        pos = jnp.where(reset[:, None], entry, pos)
        trans = jnp.where(reset, 1.0, trans)
        return (pos, dirn, trans, odc, alive)

    @jax.jit
    def stage_c(entry_, od_):
        init = (entry_, d, jnp.ones(LANES), od_, hit)
        def body(c, _):
            return march_body(c), None
        out, _ = jax.lax.scan(body, init, None, length=iters)
        return out[2]

    dt = timeit(stage_c, entry, od, reps=reps)
    report["C_march_body_Mrows_s"] = round(LANES * iters / dt / 1e6, 1)

    # --- D: + while_loop control (reductions + cond) -----------------------
    check = max(1, static.march_check_every)

    @jax.jit
    def stage_d(entry_, od_):
        init = (jnp.int32(0), (entry_, d, jnp.ones(LANES), od_, hit))
        def cond(s):
            return s[0] < iters
        def body(s):
            i, c = s
            for _ in range(check):
                c = march_body(c)
            pend_n = jnp.count_nonzero(c[4] & (c[2] < 0.0))  # never true
            alive_n = jnp.count_nonzero(c[4])
            need = (pend_n > alive_n)  # never true -> resolve not taken
            c = jax.lax.cond(need, lambda x: x, lambda x: x, c)
            return (i + check, c)
        _, c = jax.lax.while_loop(cond, body, init)
        return c[2]

    dt = timeit(stage_d, entry, od, reps=reps)
    report["D_plus_loop_control_Mrows_s"] = round(LANES * iters / dt / 1e6, 1)

    # --- E: the real deferred loop (bench instrument) ----------------------
    ids = jnp.arange(LANES, dtype=jnp.uint32)

    @functools.partial(jax.jit, static_argnames=("s",))
    def band_stats(params, o_, d_, rid, s):
        _, stats = pathtracer.trace_tick_moments(
            params, static, o_, d_, 1, jnp.int32(0), s, ray_ids=rid,
            with_stats=True,
        )
        return stats

    # time the real tick (2 subframes like bench) on this band
    @functools.partial(jax.jit, static_argnames=("s",))
    def band_run(params, o_, d_, rid, sd, s):
        return pathtracer.trace_tick_moments(
            params, static, o_, d_, sd, jnp.int32(0), s, ray_ids=rid,
        )

    band_run(params, o, d, ids, 1, 2)  # compile
    _fetch(band_run(params, o, d, ids, 1, 2))
    ts = []
    for k in range(reps):
        t0 = time.time()
        _fetch(band_run(params, o, d, ids, 2 + k, 2))
        ts.append(time.time() - t0)
    dt = float(np.median(ts))
    iters_c, nres_c, bufs = map(np.asarray, band_stats(params, o, d, ids, 2))
    d_iters = np.diff(iters_c, prepend=0)
    d_nres = np.diff(nres_c, prepend=0)
    rows = float(((d_iters + d_nres) * bufs).sum())
    report["E_real_loop_Mrows_s"] = round(rows / dt / 1e6, 1)
    report["E_rows_per_tick"] = rows
    report["E_tick_s"] = round(dt, 3)
    report["E_iters_per_phase"] = [int(v) for v in d_iters]
    report["E_resolves_per_phase"] = [int(v) for v in d_nres]
    report["E_phase_buffers"] = [int(v) for v in bufs]
    return report


def neural_stages(reps=3):
    import jax
    import jax.numpy as jnp

    from deepestscatter_tpu import tasks
    from deepestscatter_tpu.ops import descriptor as desc_ops
    from deepestscatter_tpu.ops import march as march_ops
    from deepestscatter_tpu.ops import rng as rng_ops
    from deepestscatter_tpu.render import camera as camera_ops

    cfg, params, static = build_scene()
    basis = camera_ops.camera_basis(cfg.camera)
    origins, directions = camera_ops.generate_rays(basis, 512, 256)
    TILE = 16384
    mid = max(0, (origins.shape[0] - TILE) // 2)  # center tile hits the cloud
    o = origins[mid:mid + TILE]
    d = directions[mid:mid + TILE]
    hit, t_hit = camera_ops.intersect_box(o, d, static, params.bbox_size)
    entry = o + d * t_hit[:, None] + 0.5 * params.bbox_size
    ids = jnp.arange(TILE, dtype=jnp.uint32)
    report = {"tile": TILE, "res": RES}

    @jax.jit
    def pass1(p, e, dd):
        ev = march_ops.next_scattering_event(
            p, static, jnp.zeros(TILE), e, dd, stop_at_scatter=False
        )
        return ev.transmittance

    t1 = timeit(pass1, params, entry, d, reps=reps)
    report["pass1_march_ms"] = round(t1 * 1e3, 1)

    @jax.jit
    def pass2(p, e, dd, sd):
        u = rng_ops.hash_uniform(sd, ids, jnp.int32(0))
        od = 1.0 - u * 0.9  # representative conditional-scatter draw
        ev = march_ops.next_scattering_event(
            p, static, od, e, dd, stop_at_scatter=True
        )
        return ev.scatter_pos

    t2 = timeit(pass2, params, entry, d, jnp.uint32(1), reps=reps)
    report["pass2_march_ms"] = round(t2 * 1e3, 1)

    scatter_pos = pass2(params, entry, d, jnp.uint32(1))

    for L, name in ((10, "descriptor10_ms"), (3, "descriptor3_ms")):
        @jax.jit
        def gather(p, sp, dd, L=L):
            return desc_ops.gather_descriptor(p, static, sp, dd, n_layers=L)

        report[name] = round(timeit(gather, params, scatter_pos, d, reps=reps) * 1e3, 1)

    # MLPs on random inputs
    w = tasks._load_neural_weights("nn", ":init:")
    model, variables = w["model"], w["params"]

    @jax.jit
    def mlp(v, x):
        return model.apply(v, x)

    x = jnp.asarray(np.random.default_rng(0).random((TILE, 10, 226), np.float32))
    report["rpnn_mlp_ms"] = round(timeit(mlp, variables, x, reps=reps) * 1e3, 1)

    wb = tasks._load_neural_weights("bnn", ":init:")

    @jax.jit
    def bnn_mlp(v, probe, rt):
        return wb["renderer_model"].apply(v, probe, rt)

    probe = jnp.asarray(np.random.default_rng(1).random((TILE, 202), np.float32))
    rt = jnp.asarray(np.random.default_rng(2).random((TILE, 3, 226), np.float32))
    report["bnn_mlp_ms"] = round(
        timeit(bnn_mlp, wb["renderer_params"], probe, rt, reps=reps) * 1e3, 1
    )

    # end-to-end frames (the bench's neural number)
    for kind in ("nn", "bnn"):
        t0 = time.time()
        r = tasks._load_neural_renderer(kind, params, static, ":init:")
        init_s = time.time() - t0
        img = r.render_frame(params, static, 512, 256, basis, seed=1)
        jax.block_until_ready(img)
        ts = []
        for k in range(reps):
            t0 = time.time()
            img = r.render_frame(params, static, 512, 256, basis, seed=2 + k)
            _ = float(np.asarray(img).sum())
            ts.append(time.time() - t0)
        report[f"{kind}_frame_ms"] = round(float(np.median(ts)) * 1e3, 1)
        report[f"{kind}_init_s"] = round(init_s, 1)
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--march", action="store_true")
    ap.add_argument("--neural", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    from deepestscatter_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    out = {}
    if args.march:
        out["march"] = march_stages()
        print(json.dumps(out["march"], indent=1), flush=True)
    if args.neural:
        out["neural"] = neural_stages()
        print(json.dumps(out["neural"], indent=1), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
