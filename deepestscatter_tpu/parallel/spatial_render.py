"""Rendering through a SPATIALLY SHARDED grid — volume decomposition.

SURVEY.md §2.11 item 3 realized as a consumer: the fused march rows
([Z, Y, X, 16] density+in-scatter corners — the dominant memory of a scene)
are split into z-slabs with one-plane halos (``HaloSlabGrid`` layout), one
slab per device, so a cloud too large for one chip's HBM renders across the
mesh.  Everything else (phase tables, light vectors, ray buffers) is small
and replicates.

Algorithm — owner-computes with phase-wise merges:

- Ray state is replicated; each march step's sample cell has exactly ONE
  owning device (the slab containing its z index), so each device marches
  exactly the rays currently sampling inside its slab.
- A ray marches locally for up to ``steps_per_phase`` steps; when it
  crosses into a neighbor's slab it parks for the rest of the phase.
- At each phase end one ``psum`` merges ray states: the toucher's version
  wins (ownership is exclusive), untouched rays keep their state.  This is
  the volumetric analog of ray-queue handoff in distributed ray tracers,
  expressed as an XLA collective over ICI.
- The scatter-point NEE lookup (back-corrected ≤ one step behind the
  sample, cloud.cuh:99) lands at most one cell away, which the one-plane
  halo covers — no remote reads inside a phase.

The estimator and the RNG draw sites are IDENTICAL to the single-device
path tracer (render/pathtracer.py: optical-distance free flight, NEE per
bounce with full Mie at depth 1 / chopped after, inverse-CDF direction
resampling, optional Russian roulette — cloudRadianceMaterials.cu:28-63),
and draws are keyed by (seed, global ray id, depth) — independent of which
device executes them — so renders are device-count invariant.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RenderMode
from ..ops import grid as grid_ops
from ..ops import march as march_ops
from ..ops import phase as phase_ops
from ..ops import rng as rng_ops
from .. import scene as scene_mod
from ..scene import SceneParams, SceneStatic, is_in_box
from ..render import camera as camera_ops
from ..render.pathtracer import _DRAWS_PER_BOUNCE
from .spatial import HaloSlabGrid


class SpatialScene(NamedTuple):
    """Device state for spatially sharded rendering: the big grid is
    z-slab sharded, everything else replicates."""

    slab_rows: jnp.ndarray  # [n_dev, slab + 2h, Y, X, 16] sharded on dim 0
    bbox_size: jnp.ndarray
    light_dir: jnp.ndarray
    light_radiance: jnp.ndarray
    sky_intensity: jnp.ndarray
    ground_intensity: jnp.ndarray
    phase: phase_ops.PhaseTable


def shard_scene(
    mesh: Mesh,
    params: SceneParams,
    axis: str = "space",
    halo: int = 1,
    march_rows: Optional[np.ndarray] = None,
    static: Optional[SceneStatic] = None,
) -> SpatialScene:
    """Build the sharded scene: march rows → per-device halo slabs.

    ``march_rows`` may be given as a HOST numpy array so the full grid
    never has to exist on any single device (the only-fits-sharded path);
    by default ``params.march_rows`` is used.

    Brick scenes (``static.march_brick > 0``, round 5): the flat
    ``[NB, W]`` brick-row table reshapes to its ``[NBz, NBy, NBx, W]``
    lattice and z-slab shards in BRICK units with a one-BRICK halo (the
    NEE scatter point sits ≤ one cell behind the sample — inside the
    previous brick at worst).  ``NBz`` pads up to a multiple of the slab
    count; padded bricks are never owned (ownership tests real brick
    coordinates) so their contents are inert.
    """
    rows = march_rows if march_rows is not None else params.march_rows
    brick = static.march_brick if static is not None else 0
    if brick:
        nbz, nby, nbx = grid_ops.brick_counts(static.grid_shape, brick)
        rows = np.asarray(rows).reshape(nbz, nby, nbx, -1)
        n_dev = int(mesh.shape[axis])
        pad = (-nbz) % n_dev
        if pad:
            rows = np.concatenate(
                [rows, np.zeros((pad,) + rows.shape[1:], rows.dtype)], axis=0
            )
    elif rows.ndim < 4:
        raise ValueError(
            "spatial sharding requires CELL march rows [Z, Y, X, 16] or a "
            "brick scene (pass static= so the brick lattice can be "
            "reshaped for slab decomposition)"
        )
    slabs = HaloSlabGrid(mesh, axis=axis, halo=halo).scatter(rows)
    rep = NamedSharding(mesh, P())
    put = lambda x: jax.device_put(x, rep)
    return SpatialScene(
        slab_rows=slabs,
        bbox_size=put(params.bbox_size),
        light_dir=put(params.light_dir),
        light_radiance=put(params.light_radiance),
        sky_intensity=put(params.sky_intensity),
        ground_intensity=put(params.ground_intensity),
        phase=jax.tree.map(put, params.phase),
    )


def _miss_params(scene: SpatialScene):
    """A lightweight stand-in accepted by camera_ops.miss_radiance /
    sky_gradient / sun_disc (they only read these fields)."""

    class _P(NamedTuple):
        light_dir: jnp.ndarray
        light_radiance: jnp.ndarray
        sky_intensity: jnp.ndarray
        ground_intensity: jnp.ndarray

    return _P(
        scene.light_dir,
        scene.light_radiance,
        scene.sky_intensity,
        scene.ground_intensity,
    )


def make_spatial_subframe(
    mesh: Mesh,
    static: SceneStatic,
    axis: str = "space",
    halo: int = 1,
    steps_per_phase: Optional[int] = None,
    data_axis: Optional[str] = None,
):
    """Build the jitted sharded-grid subframe renderer.

    Returns ``fn(scene, origins, directions, seed, subframe_id, ray_ids)
    -> radiance [N, 3]`` — the spatial-decomposition analog of
    ``pathtracer.render_subframe``.

    ``data_axis`` composes ray/tile data parallelism WITH the volume
    decomposition on a 2D mesh (``Mesh(devices.reshape(D, S),
    ("data", "space"))``): rays shard over ``data_axis`` while the grid
    slabs shard over ``axis`` — each space group then marches only its
    1/D ray shard, so the per-phase ownership psum moves O(N/D x state)
    per device instead of O(N x state), and the two parallelism axes
    scale independently (more chips → more rays AND bigger grids).  The
    march body is UNCHANGED: its collectives name only the space axis,
    and RNG keys on global ray ids, so renders are mesh-layout invariant
    (tested in tests/test_spatial_render.py).
    """
    n_dev = int(mesh.shape[axis])
    nz, ny, nx = static.grid_shape
    brick = static.march_brick
    if brick:
        nbz, nby_b, nbx_b = grid_ops.brick_counts(static.grid_shape, brick)
        nbz_pad = -(-nbz // n_dev) * n_dev
        slab = nbz_pad // n_dev  # slab thickness in BRICKS
        half = (brick + 1) ** 3
        n_sub = max(1, static.march_substeps)
    else:
        assert nz % n_dev == 0, f"Z={nz} must divide over {n_dev} slabs"
        slab = nz // n_dev
        n_sub = 1
    if static.sample_sky:
        raise NotImplementedError(
            "sample_sky is not supported on the spatially sharded march "
            "(use the replicated renderer for that estimator variant)"
        )
    h = halo
    if steps_per_phase is None:
        # Steps a z-parallel ray needs to cross one slab: slab thickness in
        # normalized units over the sample step (≥1).
        span_cells = slab * brick if brick else slab
        steps_per_phase = max(
            1,
            int(round(span_cells * static.voxel_size_normalized / static.sample_step)),
        )
    iters_per_phase = -(-steps_per_phase // n_sub)
    mode = static.mode
    if mode is RenderMode.SUN_SINGLE_SCATTER:
        # The single-scatter estimator is the bounce loop stopped after the
        # depth-1 NEE (cloudRadianceMaterials.cu:120-148).
        static = dataclasses.replace(static, max_depth=2)
    chopped_at_depth1 = mode is RenderMode.SUN_MULTIPLE_SCATTER

    step = jnp.float32(static.sample_step)
    dm = jnp.float32(static.density_multiplier)
    tiny = jnp.float32(1e-30)
    # Brick iterations can cover fewer than n_sub real steps at brick
    # boundaries, so the step-counted cap gets headroom.
    max_iters = static.max_total_steps * (2 if brick else 1)

    def local_subframe(slab_rows, scene, origins, directions, seed, subframe, ray_ids):
        d_idx = jax.lax.axis_index(axis)
        z0 = d_idx * slab
        row_w = slab_rows.shape[-1]
        rows_flat = slab_rows[0].reshape(-1, row_w)
        rows_scale = jnp.float32(scene_mod.march_rows_scale(slab_rows))
        n = origins.shape[0]
        f32 = jnp.float32
        bbox = scene.bbox_size

        seed_s = jnp.asarray(seed, jnp.uint32) ^ (
            jnp.asarray(subframe, jnp.uint32) * jnp.uint32(0x9E3779B1)
        )
        ids = jnp.asarray(ray_ids, jnp.uint32)

        hit, t_hit = camera_ops.intersect_box(origins, directions, static, bbox)
        entry = origins + directions * t_hit[:, None] + 0.5 * bbox
        mparams = _miss_params(scene)
        miss = camera_ops.miss_radiance(mparams, static, directions)

        dirn0 = directions
        if mode is RenderMode.SUN_MULTIPLE_SCATTER:
            u_cdf = rng_ops.hash_uniform(seed_s, ids, jnp.int32(0))
            u_phi = rng_ops.hash_uniform(seed_s, ids, jnp.int32(1))
            # new_direction reads only the phase table from params.
            cos_theta = phase_ops.sample_cos_theta_fast(scene.phase, u_cdf)
            local = rng_ops.uniform_on_sphere_circle(u_phi, cos_theta)
            d = rng_ops.from_onb(local, dirn0)
            dirn0 = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

        def own(cell):
            return (cell[..., 2] >= z0) & (cell[..., 2] < z0 + slab)

        def local_row_idx(cell):
            if brick:
                zl = jnp.clip(cell[..., 2] - z0 + h, 0, slab + 2 * h - 1)
                return (zl * nby_b + cell[..., 1]) * nbx_b + cell[..., 0]
            zl = jnp.clip(cell[..., 2] - z0 + h, 0, slab + 2 * h - 1)
            return (zl * ny + cell[..., 1]) * nx + cell[..., 0]

        def march_step_brick(carry, _):
            """Brick-slab iteration: ONE row gather serves up to ``n_sub``
            steps inside the fetched brick; the (at most one) crossing's
            bounce tail (NEE + direction resample + free-flight reset) runs
            once after the substeps — identical draws, positions, and
            arithmetic (ops.grid.trilinear_from_brick) to the replicated
            brick march, so per-sample values match the single-device
            renderer exactly as the cell body does."""
            (pos, dirn, trans, od, depth, weight, radiance, alive, mine0) = carry
            first = pos + dirn * step
            bc0, _, _, _ = grid_ops.brick_cell(
                first / bbox, static.grid_shape, brick
            )
            rows = jnp.take(
                rows_flat, local_row_idx(bc0), axis=0, mode="clip"
            ).astype(f32)
            dens_rows = rows[:, :half] * rows_scale
            marching = mine0 & alive & own(bc0)
            live = marching
            cur = pos
            crossed_any = jnp.zeros_like(alive)
            exited_any = jnp.zeros_like(alive)
            scatter_pos = jnp.zeros_like(pos)
            for j in range(n_sub):
                newp = first if j == 0 else cur + dirn * step
                bcj, fracj, _, localj = grid_ops.brick_cell(
                    newp / bbox, static.grid_shape, brick
                )
                ok = live if j == 0 else live & jnp.all(bcj == bc0, axis=-1)
                density = (
                    grid_ops.trilinear_from_brick(dens_rows, localj, fracj, brick)
                    * dm
                )
                trans_new = jnp.where(ok, trans * jnp.exp(-density * step), trans)
                crossed = ok & (od > trans_new)
                back = march_ops.back_correct_distance(od, trans_new, density)
                sp = newp - dirn * back[:, None]
                scatter_pos = jnp.where(crossed[:, None], sp, scatter_pos)
                inb = is_in_box(newp, bbox)
                exited_any = exited_any | (ok & ~crossed & ~inb)
                pos = jnp.where(
                    ok[:, None], jnp.where(crossed[:, None], sp, newp), pos
                )
                trans = trans_new
                crossed_any = crossed_any | crossed
                live = ok & ~crossed & inb
                cur = jnp.where(ok[:, None], newp, cur)

            in_box_scatter = is_in_box(scatter_pos, bbox)
            scattered = crossed_any & in_box_scatter
            chopped = (depth != 1) | jnp.bool_(chopped_at_depth1)
            cos_light = (-scene.light_dir * dirn).sum(axis=-1)
            p_full, p_chop = phase_ops.eval_phase_pair(scene.phase, cos_light)
            p = jnp.where(chopped, p_chop, p_full)
            s_bc, s_frac, _, s_local = grid_ops.brick_cell(
                scatter_pos / bbox, static.grid_shape, brick
            )
            s_ridx = jnp.where(scattered, local_row_idx(s_bc), 0)
            s_rows = jnp.take(
                rows_flat, s_ridx, axis=0, mode="clip"
            ).astype(f32)[:, half:2 * half] * rows_scale
            trans_sun = grid_ops.trilinear_from_brick(
                s_rows, s_local, s_frac, brick
            )
            factor = weight * p * static.sun_solid_angle_ratio
            radiance = radiance + jnp.where(
                scattered[:, None],
                (factor * trans_sun)[:, None] * scene.light_radiance,
                0.0,
            )

            ctr = depth * _DRAWS_PER_BOUNCE
            u_cdf = rng_ops.hash_uniform(seed_s, ids, ctr + 1)
            u_phi = rng_ops.hash_uniform(seed_s, ids, ctr + 2)
            cos_theta = phase_ops.sample_cos_theta_fast(scene.phase, u_cdf)
            local = rng_ops.uniform_on_sphere_circle(u_phi, cos_theta)
            nd = rng_ops.from_onb(local, dirn)
            nd = nd / jnp.linalg.norm(nd, axis=-1, keepdims=True)
            new_depth = jnp.where(crossed_any, depth + 1, depth)
            od_next = rng_ops.hash_uniform(
                seed_s, ids, new_depth * _DRAWS_PER_BOUNCE
            )
            dirn = jnp.where(scattered[:, None], nd, dirn)
            trans = jnp.where(crossed_any, 1.0, trans)
            od = jnp.where(crossed_any, od_next, od)
            dead = (
                exited_any
                | (crossed_any & ~in_box_scatter)
                | (crossed_any & (new_depth >= static.max_depth))
            )
            if static.rr_start_depth > 0:
                q = jnp.float32(static.rr_survival)
                u_rr = rng_ops.hash_uniform(seed_s, ids, ctr + 3)
                rr_active = crossed_any & (new_depth >= static.rr_start_depth)
                killed = rr_active & (u_rr >= q)
                weight = jnp.where(rr_active & ~killed, weight / q, weight)
                dead = dead | killed
            alive = alive & ~dead
            return (
                pos, dirn, trans, od, new_depth, weight, radiance, alive, mine0,
            ), None

        def march_step(carry, _):
            (pos, dirn, trans, od, depth, weight, radiance, alive, mine0) = carry
            new_pos = pos + dirn * step
            cell, frac, _ = grid_ops.packed_cell(new_pos / bbox, static.grid_shape)
            active = mine0 & alive & own(cell)
            ridx = jnp.where(active, local_row_idx(cell), 0)
            rows = jnp.take(rows_flat, ridx, axis=0, mode="clip").astype(f32)
            density = (
                grid_ops.trilinear_from_rows(rows[:, :8] * rows_scale, frac) * dm
            )
            trans_new = jnp.where(active, trans * jnp.exp(-density * step), trans)
            crossed = active & (od > trans_new)
            back = march_ops.back_correct_distance(od, trans_new, density)
            scatter_pos = new_pos - dirn * back[:, None]
            in_box_scatter = is_in_box(scatter_pos, bbox)
            scattered = crossed & in_box_scatter

            # NEE at the scatter point (cloud.cuh:146-158): the sun
            # transmittance row sits ≤ one cell behind — halo-local.
            chopped = (depth != 1) | jnp.bool_(chopped_at_depth1)
            cos_light = (-scene.light_dir * dirn).sum(axis=-1)
            p_full, p_chop = phase_ops.eval_phase_pair(scene.phase, cos_light)
            p = jnp.where(chopped, p_chop, p_full)
            s_cell, s_frac, _ = grid_ops.packed_cell(
                scatter_pos / bbox, static.grid_shape
            )
            s_ridx = jnp.where(scattered, local_row_idx(s_cell), 0)
            s_rows = jnp.take(rows_flat, s_ridx, axis=0, mode="clip").astype(f32)
            trans_sun = grid_ops.trilinear_from_rows(
                s_rows[:, 8:16] * rows_scale, s_frac
            )
            factor = weight * p * static.sun_solid_angle_ratio
            radiance = radiance + jnp.where(
                scattered[:, None],
                (factor * trans_sun)[:, None] * scene.light_radiance,
                0.0,
            )

            ctr = depth * _DRAWS_PER_BOUNCE
            u_cdf = rng_ops.hash_uniform(seed_s, ids, ctr + 1)
            u_phi = rng_ops.hash_uniform(seed_s, ids, ctr + 2)
            cos_theta = phase_ops.sample_cos_theta_fast(scene.phase, u_cdf)
            local = rng_ops.uniform_on_sphere_circle(u_phi, cos_theta)
            nd = rng_ops.from_onb(local, dirn)
            nd = nd / jnp.linalg.norm(nd, axis=-1, keepdims=True)
            new_depth = jnp.where(crossed, depth + 1, depth)
            od_next = rng_ops.hash_uniform(
                seed_s, ids, new_depth * _DRAWS_PER_BOUNCE
            )
            dirn = jnp.where(scattered[:, None], nd, dirn)
            pos = jnp.where(
                active[:, None],
                jnp.where(crossed[:, None], scatter_pos, new_pos),
                pos,
            )
            trans = jnp.where(crossed, 1.0, trans_new)
            od = jnp.where(crossed, od_next, od)

            exited = active & (~crossed) & (~is_in_box(new_pos, bbox))
            dead = (
                exited
                | (crossed & ~in_box_scatter)
                | (crossed & (new_depth >= static.max_depth))
            )
            if static.rr_start_depth > 0:
                q = jnp.float32(static.rr_survival)
                u_rr = rng_ops.hash_uniform(seed_s, ids, ctr + 3)
                rr_active = crossed & (new_depth >= static.rr_start_depth)
                killed = rr_active & (u_rr >= q)
                weight = jnp.where(rr_active & ~killed, weight / q, weight)
                dead = dead | killed
            alive = alive & ~dead
            return (
                pos, dirn, trans, od, new_depth, weight, radiance, alive, mine0,
            ), None

        def pmerge(old, new, upd, any_upd):
            """Exclusive-owner merge: psum picks the toucher's state."""

            def one(o, nv):
                shape = upd.shape + (1,) * (nv.ndim - 1)
                mask = upd.reshape(shape)
                anym = any_upd.reshape(shape)
                if nv.dtype == jnp.bool_:
                    s = (
                        jax.lax.psum(
                            jnp.where(mask, nv, False).astype(jnp.int32), axis
                        )
                        > 0
                    )
                    return jnp.where(anym, s, o)
                s = jax.lax.psum(jnp.where(mask, nv, jnp.zeros_like(nv)), axis)
                return jnp.where(anym, s.astype(nv.dtype), o)

            return jax.tree.map(one, old, new)

        def phase_body(state):
            i, pos, dirn, trans, od, depth, weight, radiance, alive = state
            nxt = pos + dirn * step
            if brick:
                cell, _, _, _ = grid_ops.brick_cell(
                    nxt / bbox, static.grid_shape, brick
                )
            else:
                cell, _, _ = grid_ops.packed_cell(nxt / bbox, static.grid_shape)
            mine0 = alive & own(cell)
            carry0 = (pos, dirn, trans, od, depth, weight, radiance, alive, mine0)
            carry, _ = jax.lax.scan(
                march_step_brick if brick else march_step,
                carry0, None, length=iters_per_phase,
            )
            old = (pos, dirn, trans, od, depth, weight, radiance, alive)
            new = carry[:8]
            any_upd = jax.lax.psum(mine0.astype(jnp.int32), axis) > 0
            merged = pmerge(old, new, mine0, any_upd)
            return (i + steps_per_phase,) + merged

        def cond(state):
            return jnp.logical_and(state[0] < max_iters, jnp.any(state[8]))

        # Free-flight draw site: the bounce loop keys by depth*4 (depth 1 →
        # counter 4); the single-scatter estimator draws its one optical
        # distance at counter 0 (pathtracer.trace_hit_radiance).
        od0_ctr = 0 if mode is RenderMode.SUN_SINGLE_SCATTER else _DRAWS_PER_BOUNCE
        od0 = rng_ops.hash_uniform(seed_s, ids, jnp.int32(od0_ctr))
        state0 = (
            jnp.int32(0),
            entry,
            dirn0,
            jnp.ones((n,), f32),
            od0,
            jnp.full((n,), 1, jnp.int32),
            jnp.ones((n,), f32),
            jnp.zeros((n, 3), f32),
            hit & is_in_box(entry, bbox),
        )
        state = jax.lax.while_loop(cond, phase_body, state0)
        radiance = state[7]
        return jnp.where(hit[:, None], radiance, miss)

    rep = P()
    ray = P(data_axis) if data_axis else rep
    fn = shard_map(
        local_subframe,
        mesh=mesh,
        # slab_rows shard over the space axis; origins/directions/ray_ids
        # shard over the data axis (replicated when data_axis is None);
        # scene/seed/subframe replicate.
        in_specs=(P(axis), rep, ray, ray, rep, rep, ray),
        out_specs=ray,
        check_vma=False,
    )

    @jax.jit
    def subframe(scene: SpatialScene, origins, directions, seed, subframe_id, ray_ids):
        return fn(
            scene.slab_rows, scene, origins, directions, seed, subframe_id, ray_ids
        )

    return subframe


def render_spatial_frame(
    mesh: Mesh,
    params: SceneParams,
    static: SceneStatic,
    width: int,
    height: int,
    basis,
    seed: int = 0,
    n_subframes: int = 4,
    axis: str = "space",
    scene: Optional[SpatialScene] = None,
) -> np.ndarray:
    """Convenience: average ``n_subframes`` sharded-grid subframes of a
    pinhole frame → HDR [H, W, 3] (the spatial analog of a progressive
    tick; per-subframe RNG keying matches render/progressive.py)."""
    if scene is None:
        scene = shard_scene(mesh, params, axis=axis, static=static)
    origins, directions = camera_ops.generate_rays(basis, width, height)
    ray_ids = jnp.arange(origins.shape[0], dtype=jnp.uint32)
    fn = make_spatial_subframe(mesh, static, axis=axis)
    acc = jnp.zeros((origins.shape[0], 3), jnp.float32)
    for s in range(n_subframes):
        acc = acc + fn(
            scene, origins, directions, jnp.uint32(seed), jnp.uint32(s + 1),
            ray_ids,
        )
    return np.asarray(acc / n_subframes).reshape(height, width, 3)
