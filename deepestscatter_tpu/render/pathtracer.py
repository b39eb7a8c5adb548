"""Progressive Monte-Carlo volumetric path tracer — the ground-truth renderer.

Capability parity with the reference's three closest-hit radiance programs
(DG/src/CUDA/cloudRadianceMaterials.cu):

- ``totalRadiance``            → RenderMode.SUN_AND_SKY_ALL_SCATTER
- ``multipleScatterSunRadiance`` → RenderMode.SUN_MULTIPLE_SCATTER
  (resamples the direction *before* the loop so single scattering is
  excluded — the dataset-label mode, :72-115)
- ``singleScatterSunRadiance``  → RenderMode.SUN_SINGLE_SCATTER

TPU-native shape: the per-ray bounce ``while`` with data-dependent depth
becomes one ``lax.while_loop`` over the whole ray megabatch with per-ray
alive masks; each iteration runs the lockstep march of ``ops.march``.
Next-event estimation, phase evaluation, and direction sampling are the
batched ops from ``ops.phase`` / ``ops.rng``.  RNG is the shard-stable
counter hash keyed by global ray id (``ops.rng.hash_uniform``), replacing
the reference's ``tea<4>(launchID.x * 4096 + launchID.y)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import RenderMode
from ..ops import grid as grid_ops
from ..ops import march as march_ops
from ..ops import phase as phase_ops
from ..ops import rng as rng_ops
from .. import scene as scene_mod
from ..scene import SceneParams, SceneStatic, is_in_box
from . import camera as camera_ops

#: RNG draw sites per bounce (optical distance, cos-theta, azimuth).
_DRAWS_PER_BOUNCE = 4


def in_scattering(
    params: SceneParams,
    static: SceneStatic,
    scatter_pos: jnp.ndarray,
    direction: jnp.ndarray,
    chopped: jnp.ndarray | bool,
) -> jnp.ndarray:
    """Next-event estimation toward the sun disc (cloud.cuh:146-158):
    light radiance × baked sun transmittance × phase × sun solid-angle ratio.

    ``chopped`` selects the truncated-forward-peak phase (bounces ≥ 2)."""
    cos_light = (-params.light_dir * direction).sum(axis=-1)
    p_full, p_chop = phase_ops.eval_phase_pair(params.phase, cos_light)
    p = jnp.where(chopped, p_chop, p_full)
    trans_sun = march_ops.sample_inscatter(params, scatter_pos)
    scale = p * trans_sun * static.sun_solid_angle_ratio
    return params.light_radiance * scale[..., None]


def new_direction(
    params: SceneParams,
    prev_direction: jnp.ndarray,
    u_cdf: jnp.ndarray,
    u_phi: jnp.ndarray,
) -> jnp.ndarray:
    """Sample the next propagation direction from the chopped-Mie CDF
    (cloud.cuh:160-188): inverse-CDF cosθ, uniform azimuth cone around the
    previous direction."""
    cos_theta = phase_ops.sample_cos_theta_fast(params.phase, u_cdf)
    local = rng_ops.uniform_on_sphere_circle(u_phi, cos_theta)
    d = rng_ops.from_onb(local, prev_direction)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def _scatter_loop_deferred(
    params: SceneParams,
    static: SceneStatic,
    pos: jnp.ndarray,
    direction: jnp.ndarray,
    alive: jnp.ndarray,
    seed: jnp.ndarray,
    ray_ids: jnp.ndarray,
    start_depth: jnp.ndarray,
    chopped_at_depth1: bool,
    with_stats: bool = False,
    n_samples: int = 1,
    respawn_seed_base: jnp.ndarray | None = None,
    respawn_sub0: jnp.ndarray | int = 0,
    resample_on_spawn: bool = False,
    spawn_dir: jnp.ndarray | None = None,
):
    """Deferred-scatter NEE bounce loop with lane regeneration — the fast path.

    Same estimator and RNG draw sites as ``_scatter_loop`` (below), three
    scheduling changes driven by the measured TPU cost model (gathers are
    latency-bound per row regardless of table size, so the phase-pair and
    inverse-CDF lookups each cost as much as the grid-row gather):

    1. CELL-RESIDENT SUBSTEPS: one fetched density+inscatter row serves up
       to ``static.march_substeps`` consecutive march steps while the ray
       stays inside the fetched cell (at sample step 1/512 a ray spends
       ~512/grid_res steps per cell, and the legacy loop re-gathered the
       same 16-byte row every step).  Positions advance incrementally
       (``pos + dir * step`` per substep), reproducing the one-step-loop
       float sequence exactly.
    2. DEFERRED SCATTER RESOLVE: a ray that scatters parks as "pending"
       (its position already back-corrected to the scatter point) and stops
       marching; once ``march_resolve_frac`` of the alive rays are pending
       or finished (or nothing else remains) one batched resolve performs
       the whole per-bounce tail — NEE phase evaluation, sun-transmittance
       gather, direction inverse-CDF sample, free-flight reset, Russian
       roulette — whose three gathers amortize over the bounce instead of
       burdening every step.
    3. LANE REGENERATION (``n_samples > 1``): each lane owns ``n_samples``
       independent Monte-Carlo samples of ITS ray; when a sample finishes
       (box exit, depth cap, roulette kill) the resolve folds its radiance
       into a per-lane Welford accumulator and respawns the lane at
       ``(pos0, dir0)`` with the next sample's seed.  In a lockstep
       megabatch every iteration gathers for the WHOLE buffer, so an idle
       lane costs as much as a working one — regeneration keeps occupancy
       ~100% until lanes exhaust their samples (the wavefront
       "path regeneration" scheme, done here as a while_loop invariant
       instead of a persistent-threads kernel).  Respawn seeds follow
       ``respawn_seed_base ^ (uint32(respawn_sub0 + k) * 0x9E3779B1)`` for
       sample k — exactly the per-subframe seeds of the legacy megabatch
       (render_subframe), so per-sample values are bit-identical and only
       the fp summation order differs.  ``resample_on_spawn`` redraws the
       initial direction per sample (counters 0/1) — the multi-scatter
       entry resample of trace_hit_radiance.

    RNG is keyed by (seed, ray, depth) — draws are scheduled later but take
    identical values, so images match the legacy oracle to float precision.

    Returns per-lane radiance [n, 3] when ``n_samples == 1`` (the
    trace_hit_radiance contract) or the per-lane Welford triple
    ``(mean [n,3], m2 [n,3], count [n])`` when regenerating; with
    ``with_stats`` a gather-accounting tuple is appended (see bench.py).
    """
    n = pos.shape[0]
    f32 = pos.dtype
    step = jnp.float32(static.sample_step)
    dm = jnp.float32(static.density_multiplier)
    n_sub = static.march_substeps
    # Respawn machinery + moments output engage whenever a respawn seed
    # schedule is supplied (even for a 1-sample tick, whose respawns are
    # simply never taken); bare calls keep the radiance-vector contract.
    regen = n_samples > 1 or respawn_seed_base is not None
    use_sky = (
        static.sample_sky and static.mode is RenderMode.SUN_AND_SKY_ALL_SCATTER
    )

    brick = static.march_brick
    half = (brick + 1) ** 3 if brick else 8
    rows_grid = params.march_rows.reshape(
        -1, scene_mod.march_row_width(brick)
    )
    # SPLIT TABLES: the march consumes only the density half of every
    # fetched row, while the in-scatter half is read once per BOUNCE (at
    # the deferred resolve).  Hoisting the two halves into separate
    # tables halves the bytes of the hot march gather AND halves its
    # table size — both measured first-order levers on the gather rate
    # (PERF_r04.json) — at the cost of one extra (resolve-only) gather
    # per bounce and a cheap one-time strided copy per call.  Values are
    # identical to the fused-row path.
    dens_tab = rows_grid[:, :half]
    insc_tab = rows_grid[:, half:2 * half]
    rows_scale = jnp.float32(scene_mod.march_rows_scale(params.march_rows))
    nz, ny, nx = static.grid_shape
    dims_f = jnp.asarray([nx, ny, nz], f32)

    def fetch_cell(u):
        """(region_key, frac, row_idx, local) — brick or cell lookup."""
        if brick:
            bc, frac, ridx, local = grid_ops.brick_cell(
                u, static.grid_shape, brick
            )
            return bc, frac, ridx, local
        cell, frac, ridx = grid_ops.packed_cell(u, static.grid_shape)
        return cell, frac, ridx, None

    def sample_rows(rows_half, frac, local):
        """Trilinear from an already-fetched (dequantized) row half."""
        if brick:
            return grid_ops.trilinear_from_brick(rows_half, local, frac, brick)
        return grid_ops.trilinear_from_rows(rows_half, frac)

    def sky_exit_radiance(direction, depth, weight):
        add = camera_ops.sky_gradient(params, direction) + jnp.where(
            (depth == 1)[:, None],
            camera_ops.sun_disc(params, static, direction),
            0.0,
        )
        return add * weight[:, None]

    od0 = rng_ops.hash_uniform(seed, ray_ids, start_depth * _DRAWS_PER_BOUNCE)
    depth0 = jnp.broadcast_to(start_depth, (n,)).astype(jnp.int32)
    # Respawn anchor: with resample_on_spawn the per-sample direction is
    # redrawn around the ORIGINAL ray direction, which then differs from the
    # (already resampled) initial ``direction``.
    dir_anchor = direction if spawn_dir is None else spawn_dir
    # carry = (0 pos, 1 dirn, 2 trans, 3 od, 4 depth, 5 weight,
    #          6 radiance-of-current-sample, 7 alive, 8 pending, 9 ray_ids,
    #          10 seed, 11 finished, 12 w_mean, 13 w_m2, 14 w_count,
    #          15 nsamp, 16 pos0, 17 dir0, 18 sub0 — the per-lane respawn
    #          seed-schedule offset travels with the lane through
    #          compaction — 19 gcur: the GEOMETRIC fetch cursor of the
    #          pipelined march (advances on ray geometry alone so the next
    #          iteration's row gather never waits on this iteration's
    #          fetched data; re-synced to pos at each resolve))
    carry0 = (
        pos,
        direction,
        jnp.ones((n,), f32),
        od0,
        depth0,
        jnp.ones((n,), f32),
        jnp.zeros((n, 3), f32),
        alive & is_in_box(pos, params.bbox_size),
        jnp.zeros((n,), bool),  # pending (scattered, awaiting bounce tail)
        jnp.asarray(ray_ids, jnp.uint32),
        jnp.broadcast_to(jnp.asarray(seed, jnp.uint32), (n,)),
        jnp.zeros((n,), bool),  # finished (sample done, awaiting fold)
        jnp.zeros((n, 3), f32),  # w_mean
        jnp.zeros((n, 3), f32),  # w_m2
        jnp.zeros((n,), f32),  # w_count (current Welford chunk)
        jnp.zeros((n,), jnp.int32),  # nsamp (samples completed, total)
        pos,
        dir_anchor,
        jnp.broadcast_to(
            jnp.asarray(respawn_sub0 if regen else 0, jnp.int32), (n,)
        ),
        pos,  # gcur
    )

    def march_iter(carry):
        """ONE row gather + up to ``n_sub`` march steps inside that cell."""
        (pos, dirn, trans, od, depth, weight, radiance, alive, pending,
         ray_ids, seed, finished, w_mean, w_m2, w_count, nsamp,
         pos0, dir0, sub0, gcur) = carry
        active = alive & ~pending & ~finished
        first = pos + dirn * step
        cell0, _, ridx0, _ = fetch_cell(first / params.bbox_size)
        rows = jnp.take(dens_tab, ridx0, axis=0, mode="clip").astype(f32)
        dens_rows = rows * rows_scale

        live = active
        cur = pos
        for j in range(n_sub):
            newp = first if j == 0 else cur + dirn * step
            cellj, fracj, _, localj = fetch_cell(newp / params.bbox_size)
            ok = live if j == 0 else live & jnp.all(cellj == cell0, axis=-1)
            density = sample_rows(dens_rows, fracj, localj) * dm
            trans_new = jnp.where(ok, trans * jnp.exp(-density * step), trans)
            crossed = ok & (od > trans_new)
            back = march_ops.back_correct_distance(od, trans_new, density)
            spos = newp - dirn * back[:, None]
            in_box_s = is_in_box(spos, params.bbox_size)
            inb = is_in_box(newp, params.bbox_size)
            exited = ok & ~crossed & ~inb
            pos = jnp.where(
                ok[:, None], jnp.where(crossed[:, None], spos, newp), pos
            )
            trans = trans_new
            pending = pending | (crossed & in_box_s)
            fin_evt = exited | (crossed & ~in_box_s)
            if use_sky:
                radiance = radiance + jnp.where(
                    fin_evt[:, None],
                    sky_exit_radiance(dirn, depth, weight),
                    0.0,
                )
            # A sample that leaves the box is DONE but its lane is not: it
            # parks as finished until the next resolve folds (and, when
            # regenerating, respawns) it.
            finished = finished | fin_evt
            live = ok & ~crossed & inb
            cur = jnp.where(ok[:, None], newp, cur)

        if static.march_empty_skip:
            # ALL fetched density corners zero ⇒ trilinear density ≡ 0
            # across the closed fetch region (cell or whole brick): jump
            # rays still live in it to its exit face on the step lattice
            # (exact, no bias).
            zero_cell = dens_rows.max(axis=-1) <= 0.0
            extra = march_ops.empty_cell_exit_steps(
                cell0 * brick if brick else cell0,
                cur, dirn, dims_f, params.bbox_size, step,
                span=float(brick) if brick else 1.0,
            )
            advance = jnp.where(zero_cell & live, extra, 0.0)
            pos = pos + dirn * (advance * step)[:, None]
        return (pos, dirn, trans, od, depth, weight, radiance, alive,
                pending, ray_ids, seed, finished, w_mean, w_m2, w_count,
                nsamp, pos0, dir0, sub0, gcur)

    def march_iter_geo(carry):
        """Pipelined march iteration: the row-gather INDEX comes from the
        geometric cursor ``gcur``, which advances on ray geometry alone
        (same-brick substep checks + box exit) — never on fetched density.
        XLA can then software-pipeline consecutive iterations' gathers
        (measured 3.5x the serialized body at the 256^3 operating point:
        PERF_r05.json stages; the serialized form's next index waits on
        ``crossed``/empty-skip, both functions of the fetched row).

        Physics writes (transmittance, crossing, park/finish) use exactly
        the v1 masks and the identical step lattice, so per-sample values
        are bit-identical to the non-pipelined loop with empty-skip off;
        the cursor marches THROUGH zero-density bricks (skipped by v1's
        data-dependent jump), where ``trans *= exp(-0) == trans`` exactly.
        A parked/finished lane's cursor keeps advancing (its fetches are
        the usual lockstep waste); ``resolve`` re-syncs ``gcur = pos``."""
        (pos, dirn, trans, od, depth, weight, radiance, alive, pending,
         ray_ids, seed, finished, w_mean, w_m2, w_count, nsamp,
         pos0, dir0, sub0, gcur) = carry
        active = alive & ~pending & ~finished
        first = gcur + dirn * step
        cell0, _, ridx0, _ = fetch_cell(first / params.bbox_size)
        rows = jnp.take(dens_tab, ridx0, axis=0, mode="clip").astype(f32)
        dens_rows = rows * rows_scale

        march_ok = active
        cur = gcur
        for j in range(n_sub):
            newp = first if j == 0 else cur + dirn * step
            cellj, fracj, _, localj = fetch_cell(newp / params.bbox_size)
            same = None if j == 0 else jnp.all(cellj == cell0, axis=-1)
            inb = is_in_box(newp, params.bbox_size)
            ok_geo = inb if j == 0 else same & inb
            density = sample_rows(dens_rows, fracj, localj) * dm
            ok = march_ok if j == 0 else march_ok & same
            trans_new = jnp.where(ok, trans * jnp.exp(-density * step), trans)
            crossed = ok & (od > trans_new)
            back = march_ops.back_correct_distance(od, trans_new, density)
            spos = newp - dirn * back[:, None]
            in_box_s = is_in_box(spos, params.bbox_size)
            pos = jnp.where(
                ok[:, None], jnp.where(crossed[:, None], spos, newp), pos
            )
            trans = trans_new
            pending = pending | (crossed & in_box_s)
            fin_evt = (ok & ~crossed & ~inb) | (crossed & ~in_box_s)
            if use_sky:
                radiance = radiance + jnp.where(
                    fin_evt[:, None],
                    sky_exit_radiance(dirn, depth, weight),
                    0.0,
                )
            finished = finished | fin_evt
            march_ok = ok & ~crossed & inb
            # Cursor advance: geometry only (brick residency + box).
            cur = jnp.where(ok_geo[:, None], newp, cur)
        return (pos, dirn, trans, od, depth, weight, radiance, alive,
                pending, ray_ids, seed, finished, w_mean, w_m2, w_count,
                nsamp, pos0, dir0, sub0, cur)

    def resolve(carry):
        """Batched per-bounce tail for every pending ray (NEE + direction
        resample + free-flight reset — the reference's per-scatter work,
        cloudRadianceMaterials.cu:28-63, batched across rays) + the fold/
        respawn of finished samples."""
        (pos, dirn, trans, od, depth, weight, radiance, alive, pending,
         ray_ids, seed, finished, w_mean, w_m2, w_count, nsamp,
         pos0, dir0, sub0, gcur) = carry
        pend = pending & alive
        chopped = (depth != 1) | jnp.bool_(chopped_at_depth1)
        cos_light = (-params.light_dir * dirn).sum(axis=-1)
        p_full, p_chop = phase_ops.eval_phase_pair(params.phase, cos_light)
        p = jnp.where(chopped, p_chop, p_full)
        _, frac, ridx, local = fetch_cell(pos / params.bbox_size)
        rows = jnp.take(
            insc_tab, jnp.where(pend, ridx, 0), axis=0, mode="clip"
        ).astype(f32)
        trans_sun = sample_rows(rows * rows_scale, frac, local)
        factor = weight * p * static.sun_solid_angle_ratio
        radiance = radiance + jnp.where(
            pend[:, None],
            (factor * trans_sun)[:, None] * params.light_radiance,
            0.0,
        )
        ctr = depth * _DRAWS_PER_BOUNCE
        u_cdf = rng_ops.hash_uniform(seed, ray_ids, ctr + 1)
        u_phi = rng_ops.hash_uniform(seed, ray_ids, ctr + 2)
        nd = new_direction(params, dirn, u_cdf, u_phi)
        new_depth = jnp.where(pend, depth + 1, depth)
        od_next = rng_ops.hash_uniform(
            seed, ray_ids, new_depth * _DRAWS_PER_BOUNCE
        )
        dirn = jnp.where(pend[:, None], nd, dirn)
        trans = jnp.where(pend, 1.0, trans)
        od = jnp.where(pend, od_next, od)
        dead = pend & (new_depth >= static.max_depth)
        if static.rr_start_depth > 0:
            q = jnp.float32(static.rr_survival)
            u_rr = rng_ops.hash_uniform(seed, ray_ids, ctr + 3)
            rr_active = pend & (new_depth >= static.rr_start_depth)
            killed = rr_active & (u_rr >= q)
            weight = jnp.where(rr_active & ~killed, weight / q, weight)
            dead = dead | killed
        depth = new_depth

        # Fold every finished sample into the lane's Welford chunk
        # (progressive.cu:17-27 semantics, applied per lane).
        fold = (finished | dead) & alive
        cnt_new = w_count + fold.astype(f32)
        nsafe = jnp.maximum(cnt_new, 1.0)
        delta = radiance - w_mean
        mean_new = w_mean + delta / nsafe[:, None]
        m2_new = w_m2 + delta * (radiance - mean_new)
        w_mean = jnp.where(fold[:, None], mean_new, w_mean)
        w_m2 = jnp.where(fold[:, None], m2_new, w_m2)
        w_count = jnp.where(fold, cnt_new, w_count)
        nsamp = nsamp + fold.astype(jnp.int32)

        if regen:
            # Respawn lanes with samples remaining; the seed schedule is the
            # legacy megabatch's per-subframe seed, so draws are identical.
            respawn = fold & (nsamp < n_samples)
            seed_new = jnp.asarray(respawn_seed_base, jnp.uint32) ^ (
                (sub0 + nsamp).astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
            )
            if resample_on_spawn:
                u0 = rng_ops.hash_uniform(seed_new, ray_ids, jnp.int32(0))
                u1 = rng_ops.hash_uniform(seed_new, ray_ids, jnp.int32(1))
                d_spawn = new_direction(params, dir0, u0, u1)
            else:
                d_spawn = dir0
            od_spawn = rng_ops.hash_uniform(
                seed_new, ray_ids, start_depth * _DRAWS_PER_BOUNCE
            )
            pos = jnp.where(respawn[:, None], pos0, pos)
            dirn = jnp.where(respawn[:, None], d_spawn, dirn)
            trans = jnp.where(respawn, 1.0, trans)
            od = jnp.where(respawn, od_spawn, od)
            depth = jnp.where(
                respawn, jnp.asarray(start_depth, jnp.int32), depth
            )
            weight = jnp.where(respawn, 1.0, weight)
            radiance = jnp.where(respawn[:, None], 0.0, radiance)
            seed = jnp.where(respawn, seed_new, seed)
            alive = alive & ~(fold & ~respawn)
        else:
            alive = alive & ~fold
        finished = finished & ~fold
        # Pipelined cursor re-sync: the resolve is the one serialization
        # point per bounce; the cursor resumes from the authoritative
        # physics position (scatter point, or respawn anchor).
        return (pos, dirn, trans, od, depth, weight, radiance, alive,
                jnp.zeros_like(pending), ray_ids, seed, finished,
                w_mean, w_m2, w_count, nsamp, pos0, dir0, sub0, pos)

    def merge_resolved(marched, resolved, touch):
        """Apply the overlapped resolve's outputs: lanes the resolve acted
        on (parked at block start) take the resolved state wholesale; all
        others keep the marched state.  The two lane sets are disjoint by
        construction — the march never writes a parked lane's physics, the
        resolve never touches an actively marching lane."""
        t1 = touch[:, None]

        def pick(m, r):
            return jnp.where(t1 if r.ndim == 2 else touch, r, m)

        return tuple(pick(m, r) for m, r in zip(marched, resolved))

    def loop_body(state):
        if static.march_pipeline:
            # Pipelined block: K geometric-cursor march iterations with the
            # parked lanes' RESOLVE computed CONCURRENTLY from the block-
            # start state and merged at block end.  No ``lax.cond`` (a
            # conditional resolve re-serializes every iteration's gather:
            # 52 vs 157+ Mrows/s measured, PERF_r05.json), and the resolve's
            # own serialized gather chain (in-scatter row, phase pair,
            # inverse CDF) overlaps the block's marching instead of
            # stalling it.  A lane that scatters mid-block parks and is
            # resolved in the NEXT block — per-lane sequences (and thus
            # every sampled value) are unchanged; only idle timing moves.
            i, nres, carry = state
            touch = (carry[8] | carry[11]) & carry[7]
            resolved = resolve(carry)
            carry, _ = jax.lax.scan(
                lambda c, _: (march_iter_geo(c), None),
                carry,
                None,
                length=static.march_resolve_every,
            )
            carry = merge_resolved(carry, resolved, touch)
            return (i + static.march_resolve_every, nres + 1, carry)
        i, nres, carry = state
        if static.march_check_every > 1:
            carry, _ = jax.lax.scan(
                lambda c, _: (march_iter(c), None),
                carry,
                None,
                length=static.march_check_every,
            )
        else:
            carry = march_iter(carry)
        alive, pending, finished = carry[7], carry[8], carry[11]
        pend_n = jnp.count_nonzero((pending | finished) & alive)
        alive_n = jnp.count_nonzero(alive)
        # Resolve when parked lanes (pending scatters + finished samples)
        # are a ``march_resolve_frac`` share of the rays still ALIVE (not of
        # the buffer: late in a phase a small active tail must not stall a
        # large parked population), or when nothing but parked rays remains
        # (the backstop that makes a misconfigured frac > 1.0 harmless).
        frac = jnp.float32(static.march_resolve_frac)
        need = (
            (pend_n.astype(jnp.float32) >= alive_n.astype(jnp.float32) * frac)
            | (pend_n == alive_n)
        ) & (pend_n > 0)
        carry = jax.lax.cond(need, resolve, lambda c: c, carry)
        return (
            i + max(1, static.march_check_every),
            nres + need.astype(jnp.int32),
            carry,
        )

    # Safety cap: unlike the flat loop (whose iterations all march), an
    # iteration here may only serve OTHER rays while a parked ray stalls,
    # so the bound is the wavefront one — every bounce round is at most one
    # full box crossing, times the samples a lane owns.  Real termination is
    # "no ray alive"; the cap only guards runaway loops.
    max_iters = static.march_max_iters or (
        (static.max_depth + 1) * (static.max_march_steps + 1) * n_samples
    )

    def run_phase(i, nres, carry, stop_below):
        def cond(state):
            alive = state[2][7]
            live = jnp.count_nonzero(alive) if stop_below else jnp.any(alive)
            enough = live >= stop_below if stop_below else live
            return jnp.logical_and(state[0] < max_iters, enough)

        return jax.lax.while_loop(cond, loop_body, (i, nres, carry))

    def compact(carry, m):
        """Gather the ≤ m live lanes into an m-sized buffer.  The in-flight
        sample state (radiance, depth, nsamp, spawn anchors) travels with
        the lane; the Welford chunk restarts at zero and is merged back
        into the full-buffer stats when the phase ends."""
        alive = carry[7]
        idx = jnp.nonzero(alive, size=m, fill_value=0)[0]
        valid = jnp.arange(m, dtype=jnp.int32) < jnp.count_nonzero(alive)
        small = jax.tree.map(lambda a: a[idx], carry)
        small = (
            small[0], small[1], small[2], small[3], small[4], small[5],
            small[6],
            small[7] & valid, small[8] & valid, small[9], small[10],
            small[11] & valid,
            jnp.zeros((m, 3), f32),  # fresh w_mean chunk
            jnp.zeros((m, 3), f32),  # fresh w_m2 chunk
            jnp.zeros((m,), f32),  # fresh w_count chunk
            small[15], small[16], small[17], small[18], small[19],
        )
        return small, idx, valid

    def merge_back(w_mean, w_m2, w_count, carry, gidx):
        """Per-lane Welford merge of the compacted phase's chunk into the
        full-buffer stats.  ``gidx`` maps each compacted lane to its GLOBAL
        (n-buffer) index, composed through every compaction level; invalid
        lanes carry the out-of-range sentinel ``n`` and drop on scatter."""
        c_mean, c_m2, c_cnt = carry[12], carry[13], carry[14]
        a_mean = w_mean[gidx]  # sentinel rows clamp-read garbage; dropped
        a_m2 = w_m2[gidx]
        a_cnt = w_count[gidx]
        tot = a_cnt + c_cnt
        safe = jnp.maximum(tot, 1.0)
        w = (c_cnt / safe)[:, None]
        new_mean = a_mean + (c_mean - a_mean) * w
        new_m2 = (
            a_m2 + c_m2
            + (c_mean - a_mean) ** 2 * ((a_cnt * c_cnt / safe)[:, None])
        )
        w_mean = w_mean.at[gidx].set(new_mean, mode="drop")
        w_m2 = w_m2.at[gidx].set(new_m2, mode="drop")
        w_count = w_count.at[gidx].set(tot, mode="drop")
        return w_mean, w_m2, w_count

    def fold_unfinished(carry):
        """Fold still-in-flight samples of lanes alive at the safety-cap
        exit into the Welford chunk as one truncated sample each, so a
        tripped ``max_iters`` cap degrades gracefully (partial NEE energy
        kept) instead of dropping the lane's radiance."""
        (pos, dirn, trans, od, depth, weight, radiance, alive, pending,
         ray_ids, seed, finished, w_mean, w_m2, w_count, nsamp,
         pos0, dir0, sub0, gcur) = carry
        fold = alive
        cnt_new = w_count + fold.astype(f32)
        nsafe = jnp.maximum(cnt_new, 1.0)
        delta = radiance - w_mean
        mean_new = w_mean + delta / nsafe[:, None]
        m2_new = w_m2 + delta * (radiance - mean_new)
        w_mean = jnp.where(fold[:, None], mean_new, w_mean)
        w_m2 = jnp.where(fold[:, None], m2_new, w_m2)
        w_count = jnp.where(fold, cnt_new, w_count)
        return (pos, dirn, trans, od, depth, weight, radiance, alive,
                pending, ray_ids, seed, finished, w_mean, w_m2, w_count,
                nsamp, pos0, dir0, sub0, gcur)

    def fold_if_capped(i, carry):
        """A phase that exits via the ``max_iters`` safety cap can leave
        MORE live lanes than the next cascade level's buffer; ``compact``'s
        fixed-size ``jnp.nonzero`` would silently truncate the excess and
        drop their in-flight radiance.  On a cap exit, fold every live
        lane's partial sample (as ``fold_unfinished`` does at the final
        level) and retire the lane — the cap then degrades gracefully at
        ANY cascade level."""

        def do(c):
            c = fold_unfinished(c)
            return c[:7] + (jnp.zeros_like(c[7]),) + c[8:]

        return jax.lax.cond(i >= max_iters, do, lambda c: c, carry)

    # Compaction cascade: the tail — deep-diffusion paths (and, when
    # regenerating, the last unfinished samples) — runs thousands of
    # iterations whose cost is all fixed overhead once the buffer is small;
    # each /8 level cuts that.
    levels = []
    m = n
    while m >= 8192:
        m //= 8
        levels.append(m)
    levels = levels[:4]

    i = jnp.int32(0)
    nres = jnp.int32(0)
    phase_iters = []
    phase_nres = []
    i, nres, carry = run_phase(i, nres, carry0, levels[0] if levels else 0)
    phase_iters.append(i)
    phase_nres.append(nres)
    if not levels:
        carry = fold_unfinished(carry)
    else:
        carry = fold_if_capped(i, carry)
    w_mean, w_m2, w_count = carry[12], carry[13], carry[14]
    # ``gidx`` maps each compacted lane to its index in the ORIGINAL
    # n-buffer; composing it through every level is what makes multi-level
    # cascades scatter their Welford chunks back to the right pixels (a
    # level-2 compact's local indices point into the level-1 buffer, not
    # the full one).
    gidx = None
    for li, m in enumerate(levels):
        carry, idx, valid = compact(carry, m)
        gidx = jnp.where(valid, idx if gidx is None else gidx[idx], n)
        next_stop = levels[li + 1] if li + 1 < len(levels) else 0
        i, nres, carry = run_phase(i, nres, carry, next_stop)
        phase_iters.append(i)
        phase_nres.append(nres)
        if li + 1 == len(levels):
            carry = fold_unfinished(carry)
        else:
            carry = fold_if_capped(i, carry)
        w_mean, w_m2, w_count = merge_back(w_mean, w_m2, w_count, carry, gidx)
    if regen:
        out = (w_mean, w_m2, w_count)
    else:
        # One sample per lane: the folded mean IS the sample radiance.
        out = w_mean
    if with_stats:
        # Cumulative (march_iter calls, resolve calls) at the end of each
        # compaction phase; with the phase buffer sizes ([n] + levels) this
        # reconstructs the exact fused-row gather count — the roofline
        # numerator in bench.py.
        return out, (
            jnp.stack(phase_iters),
            jnp.stack(phase_nres),
            jnp.asarray([n] + levels, jnp.int32),
        )
    return out


def _scatter_loop(
    params: SceneParams,
    static: SceneStatic,
    pos: jnp.ndarray,
    direction: jnp.ndarray,
    alive: jnp.ndarray,
    seed: jnp.ndarray,
    ray_ids: jnp.ndarray,
    start_depth: jnp.ndarray,
    chopped_at_depth1: bool,
    with_stats: bool = False,
) -> jnp.ndarray:
    """The NEE bounce loop shared by the all-scatter and multi-scatter modes.

    Semantics mirror cloudRadianceMaterials.cu:28-63: march to each scatter
    event, accumulate NEE, resample the direction; rays die on exit or at
    ``max_depth`` bounces (plus optional unbiased Russian roulette).

    TPU-native shape — the two critical redesigns vs the reference's nested
    per-thread loops:

    1. ONE FLAT ``lax.while_loop`` whose iteration is a single march step;
       scatter events are handled inline under a mask.  A nested
       bounce-loop-around-march-loop runs ``max_bounces x max_march_steps``
       lockstep iterations (~1.8M at the reference operating point); the
       flat loop runs only as long as the longest ray *path*.
    2. CASCADE COMPACTION for the tail: lockstep cost per iteration scales
       with the BUFFER size, not the live-ray count, and deep-diffusion
       paths keep a shrinking minority alive for thousands of steps.  When
       the live count drops below 1/8 (then 1/64) of the buffer, survivors
       are gathered (``jnp.nonzero`` with a static size — the shape-stable
       analog of stream compaction) into a smaller buffer and the loop
       continues there; tail radiance is scatter-added back.

    ``static.march_deferred`` (the default) dispatches to
    ``_scatter_loop_deferred`` — the fast path; this function is the legacy
    two-gather-per-step oracle (and the differentiable-mode body).
    """
    if static.march_deferred:
        return _scatter_loop_deferred(
            params, static, pos, direction, alive, seed, ray_ids,
            start_depth, chopped_at_depth1, with_stats=with_stats,
        )
    if with_stats:
        raise NotImplementedError(
            "gather-count stats are a deferred-loop instrument "
            "(march_deferred=True)"
        )
    n = pos.shape[0]
    f32 = pos.dtype
    step = jnp.float32(static.sample_step)
    dm = jnp.float32(static.density_multiplier)
    tiny = jnp.float32(1e-30)

    # Sky/sun sampling (the reference's disabled code path,
    # cloudRadianceMaterials.cu:20-27,36-46; all-scatter mode only).  The
    # reference marches every bounce to the box exit and adds
    # L_sky(dir_d) * T_exit(x_d, dir_d) as per-vertex NEE (plus the
    # unattenuated sun disc at depth 1).  Here the identical expectation
    # comes from the exit-indicator estimator — when the free flight
    # carries the ray out of the box, add weight * (sky gradient + sun
    # disc if no scatter happened yet): P(exit | x_d, dir_d) IS
    # T_exit(x_d, dir_d), so no second march is needed.
    use_sky = (
        static.sample_sky and static.mode is RenderMode.SUN_AND_SKY_ALL_SCATTER
    )

    def sky_exit_radiance(direction, depth, weight):
        add = camera_ops.sky_gradient(params, direction) + jnp.where(
            (depth == 1)[:, None],
            camera_ops.sun_disc(params, static, direction),
            0.0,
        )
        return add * weight[:, None]

    # Free-flight threshold for the first segment (counter depth*4 + 0,
    # matching the per-bounce draw sites of the nested formulation).
    od0 = rng_ops.hash_uniform(seed, ray_ids, start_depth * _DRAWS_PER_BOUNCE)

    # carry = (pos, direction, trans, od, depth, weight, radiance, alive,
    #          ray_ids, seed) — everything per-ray, so compaction is one
    #          tree_map gather.
    carry0 = (
        pos,
        direction,
        jnp.ones((n,), f32),
        od0,
        jnp.broadcast_to(start_depth, (n,)).astype(jnp.int32),
        jnp.ones((n,), f32),
        jnp.zeros((n, 3), f32),
        alive & is_in_box(pos, params.bbox_size),
        jnp.asarray(ray_ids, jnp.uint32),
        jnp.broadcast_to(jnp.asarray(seed, jnp.uint32), (n,)),
    )

    def body(state):
        """Legacy one-phase body: two grid gathers per step.  Kept as the
        equality oracle for the deferred fast path (and as the
        differentiable-mode body)."""
        i, (pos, direction, trans, od, depth, weight, radiance, alive,
            ray_ids, seed) = state
        if static.occupancy_skip_steps >= 2:
            # Empty-space skipping: a zero dilated-occupancy block certifies
            # one block of exactly-zero density ahead — advance K steps in
            # one iteration (ops.grid.build_occupancy; exact, not approx).
            occ = grid_ops.sample_occupancy(
                params.occupancy,
                pos / params.bbox_size,
                static.grid_shape,
                static.occupancy_block,
            )
            step_len = jnp.where(
                alive & (occ < 0.5),
                step * static.occupancy_skip_steps,
                step,
            )
            new_pos = pos + direction * step_len[:, None]
        else:
            new_pos = pos + direction * step
        density = march_ops.sample_density(params, new_pos) * dm
        trans_new = jnp.where(alive, trans * jnp.exp(-density * step), trans)
        crossed = alive & (od > trans_new)
        # Back-correct the scatter position inside the step (cloud.cuh:99).
        back = march_ops.back_correct_distance(od, trans_new, density)
        scatter_pos = new_pos - direction * back[:, None]
        in_box_scatter = is_in_box(scatter_pos, params.bbox_size)
        scattered = crossed & in_box_scatter

        # NEE at the scatter point; full Mie only at depth 1 of the
        # all-scatter mode (cloudRadianceMaterials.cu:56).
        chopped = (depth != 1) | jnp.bool_(chopped_at_depth1)
        nee = in_scattering(params, static, scatter_pos, direction, chopped)
        radiance = radiance + jnp.where(
            scattered[:, None], nee * weight[:, None], 0.0
        )

        # Resample the direction and the next free-flight threshold.
        ctr = depth * _DRAWS_PER_BOUNCE
        u_cdf = rng_ops.hash_uniform(seed, ray_ids, ctr + 1)
        u_phi = rng_ops.hash_uniform(seed, ray_ids, ctr + 2)
        nd = new_direction(params, direction, u_cdf, u_phi)
        new_depth = jnp.where(crossed, depth + 1, depth)
        od_next = rng_ops.hash_uniform(
            seed, ray_ids, new_depth * _DRAWS_PER_BOUNCE
        )
        direction = jnp.where(scattered[:, None], nd, direction)
        pos = jnp.where(crossed[:, None], scatter_pos, new_pos)
        trans = jnp.where(crossed, 1.0, trans_new)
        od = jnp.where(crossed, od_next, od)

        exited = alive & (~crossed) & (~is_in_box(new_pos, params.bbox_size))
        if use_sky:
            sky_exit = exited | (crossed & ~in_box_scatter)
            radiance = radiance + jnp.where(
                sky_exit[:, None],
                sky_exit_radiance(direction, depth, weight),
                0.0,
            )
        alive = (
            alive
            & (~exited)
            & (~(crossed & ~in_box_scatter))
            & (new_depth < static.max_depth)
        )
        if static.rr_start_depth > 0:
            # Unbiased Russian roulette: kill deep paths with prob (1 - q),
            # reweight survivors by 1/q (draw site 3 of the bounce).
            q = jnp.float32(static.rr_survival)
            u_rr = rng_ops.hash_uniform(seed, ray_ids, ctr + 3)
            rr_active = crossed & (new_depth >= static.rr_start_depth)
            killed = rr_active & (u_rr >= q)
            weight = jnp.where(rr_active & ~killed, weight / q, weight)
            alive = alive & ~killed
        return i + 1, (pos, direction, trans, od, new_depth, weight,
                       radiance, alive, ray_ids, seed)

    if static.differentiable:
        # Reverse-differentiable variant: the SAME ``body`` under a
        # fixed-trip-count rematerialized scan (while_loop has no reverse
        # rule; the trip count is the loop's own iteration cap, so forward
        # values are identical — dead rays just no-op the remaining
        # iterations).  One phase, no compaction (``jnp.nonzero`` sizes
        # would be value-dependent).
        assert not static.march_deferred, (
            "differentiable mode requires the legacy oracle loop "
            "(march_deferred=False)"
        )

        def scan_body(state, _):
            return jax.checkpoint(body)(state), None

        (_, carry), _ = jax.lax.scan(
            scan_body, (jnp.int32(0), carry0), None,
            length=static.max_total_steps,
        )
        return carry[6]

    def run_phase(i, carry, stop_below):
        """while_loop until < stop_below rays stay alive (0 = until none)."""

        def cond(state):
            alive = state[1][7]
            live = jnp.count_nonzero(alive) if stop_below else jnp.any(alive)
            enough = live >= stop_below if stop_below else live
            return jnp.logical_and(state[0] < static.max_total_steps, enough)

        return jax.lax.while_loop(cond, body, (i, carry))

    def compact(carry, m):
        """Gather the ≤ m live rays into an m-sized buffer.  Returns the
        small carry (radiance zeroed) and the scatter-back indices."""
        alive = carry[7]
        idx = jnp.nonzero(alive, size=m, fill_value=0)[0]
        valid = (
            jnp.arange(m, dtype=jnp.int32) < jnp.count_nonzero(alive)
        )
        small = jax.tree.map(lambda a: a[idx], carry)
        small = (
            small[0], small[1], small[2], small[3], small[4], small[5],
            jnp.zeros((m, 3), f32),  # fresh radiance accumulator
            small[7] & valid,
            small[8], small[9],
        )
        return small, idx, valid

    # Compaction cascade: full → n/8 → n/64 (skipped for small batches,
    # where the gather bookkeeping would outweigh the win).
    levels = []
    m = n
    while m >= 8192:
        m //= 8
        levels.append(m)
    levels = levels[:3]

    i = jnp.int32(0)
    radiance_total = None
    i, carry = run_phase(i, carry0, levels[0] if levels else 0)
    radiance_total = carry[6]
    # Global-index map composed through the cascade (level-2 local indices
    # point into the level-1 buffer); invalid lanes carry the out-of-range
    # sentinel n and drop on the scatter-add.
    gidx = None
    for li, m in enumerate(levels):
        carry, idx, valid = compact(carry, m)
        gidx = jnp.where(valid, idx if gidx is None else gidx[idx], n)
        next_stop = levels[li + 1] if li + 1 < len(levels) else 0
        i, carry = run_phase(i, carry, next_stop)
        radiance_total = radiance_total.at[gidx].add(carry[6], mode="drop")
    return radiance_total


def trace_hit_radiance(
    params: SceneParams,
    static: SceneStatic,
    entry_pos: jnp.ndarray,
    directions: jnp.ndarray,
    hit: jnp.ndarray,
    seed: int,
    ray_ids: jnp.ndarray,
    with_stats: bool = False,
) -> jnp.ndarray:
    """Radiance for rays that hit the cloud box, per the configured mode.

    ``entry_pos`` [N, 3] in local coords [0, bbox]; ``hit`` masks rays that
    actually intersect.  Returns [N, 3] (plus the deferred loop's gather
    stats when ``with_stats``).
    """
    mode = static.mode
    if mode is RenderMode.SUN_AND_SKY_ALL_SCATTER:
        depth0 = jnp.int32(1)
        return _scatter_loop(
            params, static, entry_pos, directions, hit, seed, ray_ids,
            depth0, False, with_stats=with_stats,
        )
    if mode is RenderMode.SUN_MULTIPLE_SCATTER:
        # Resample the direction before the loop so the estimate excludes
        # single scattering; all NEE uses the chopped phase
        # (cloudRadianceMaterials.cu:72-115).
        u_cdf = rng_ops.hash_uniform(seed, ray_ids, jnp.int32(0))
        u_phi = rng_ops.hash_uniform(seed, ray_ids, jnp.int32(1))
        directions = new_direction(params, directions, u_cdf, u_phi)
        return _scatter_loop(
            params, static, entry_pos, directions, hit, seed, ray_ids,
            jnp.int32(1), True, with_stats=with_stats,
        )
    if mode is RenderMode.SUN_SINGLE_SCATTER:
        if with_stats:
            raise NotImplementedError(
                "gather stats exist for the bounce-loop modes only"
            )
        if static.differentiable:
            raise NotImplementedError(
                "single scatter has a dedicated differentiable quadrature "
                "formulation (render.diff.render_single_scatter)"
            )
        od = rng_ops.hash_uniform(seed, ray_ids, jnp.int32(0))
        event = march_ops.next_scattering_event(
            params, static, od, entry_pos, directions, stop_at_scatter=True
        )
        ok = hit & event.has_scattered & is_in_box(event.scatter_pos, params.bbox_size)
        nee = in_scattering(params, static, event.scatter_pos, directions, False)
        return jnp.where(ok[:, None], nee, 0.0)
    raise ValueError(f"unknown mode {mode}")


def render_subframe(
    params: SceneParams,
    static: SceneStatic,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    seed_base: int,
    subframe_id: jnp.ndarray,
    ray_ids: jnp.ndarray | None = None,
    with_stats: bool = False,
) -> jnp.ndarray:
    """One full Monte-Carlo sample per ray → radiance [N, 3].

    Equivalent of one ray-gen launch of pathTracingCamera.cu: intersect the
    box, shade misses with sun/sky, run the in-cloud estimator for hits.
    The per-subframe RNG stream folds ``subframe_id`` into the seed so every
    subframe is an independent (but reproducible) sample.

    ``with_stats`` (deferred loop only) additionally returns the gather
    accounting (cumulative march/resolve calls per compaction phase +
    phase buffer sizes) — the instrument behind bench.py's roofline line.
    """
    n = origins.shape[0]
    if ray_ids is None:
        ray_ids = jnp.arange(n, dtype=jnp.uint32)
    seed = jnp.uint32(seed_base) ^ (
        jnp.asarray(subframe_id, jnp.uint32) * jnp.uint32(0x9E3779B1)
    )
    hit, t_hit = camera_ops.intersect_box(origins, directions, static, params.bbox_size)
    entry = origins + directions * t_hit[:, None] + 0.5 * params.bbox_size
    hit_radiance = trace_hit_radiance(
        params, static, entry, directions, hit, seed, ray_ids,
        with_stats=with_stats,
    )
    if with_stats:
        hit_radiance, stats = hit_radiance
    miss = camera_ops.miss_radiance(params, static, directions)
    out = jnp.where(hit[:, None], hit_radiance, miss)
    return (out, stats) if with_stats else out


def trace_tick_moments(
    params: SceneParams,
    static: SceneStatic,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    seed_base,
    sub0: jnp.ndarray,
    n_subframes: int,
    ray_ids: jnp.ndarray | None = None,
    with_stats: bool = False,
):
    """Per-pixel Welford moments of ``n_subframes`` independent samples via
    lane regeneration — the progressive tick's estimator core.

    ``ray_ids`` defaults to 0..N-1; the shard_map'd tick passes each
    shard's GLOBAL ids so RNG streams are device-layout-invariant.

    Replaces the S x N megabatch (tile the rays ``n_subframes`` times, run
    one giant lockstep loop): the buffer here is ONE lane per pixel and a
    lane whose sample finishes respawns in place with the next subframe's
    seed, so every lockstep row gather stays ~100% useful instead of idling
    on dead lanes (the reference's persistent-thread GPU loop has no such
    problem; this is its TPU counterpart).  Per-sample radiance values are
    bit-identical to ``render_subframe``'s — same (seed, ray, depth)-keyed
    draws — only the fp summation order differs.

    Returns ``(mean [N,3], m2 [N,3], count [N])`` over the tick's samples.
    """
    if not static.march_deferred:
        raise NotImplementedError(
            "lane regeneration is a deferred-loop feature "
            "(march_deferred=True); use render_subframe megabatches with "
            "the oracle loop"
        )
    n = origins.shape[0]
    if ray_ids is None:
        ray_ids = jnp.arange(n, dtype=jnp.uint32)
    sub0 = jnp.asarray(sub0, jnp.int32)
    seed0 = jnp.uint32(seed_base) ^ (
        (sub0 + 1).astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
    )
    hit, t_hit = camera_ops.intersect_box(
        origins, directions, static, params.bbox_size
    )
    entry = origins + directions * t_hit[:, None] + 0.5 * params.bbox_size
    mode = static.mode
    if mode is RenderMode.SUN_AND_SKY_ALL_SCATTER:
        dirs_init, resample, chopped = directions, False, False
    elif mode is RenderMode.SUN_MULTIPLE_SCATTER:
        u0 = rng_ops.hash_uniform(seed0, ray_ids, jnp.int32(0))
        u1 = rng_ops.hash_uniform(seed0, ray_ids, jnp.int32(1))
        dirs_init = new_direction(params, directions, u0, u1)
        resample, chopped = True, True
    else:
        raise NotImplementedError(
            "tick moments exist for the bounce-loop modes only"
        )
    out = _scatter_loop_deferred(
        params,
        static,
        entry,
        dirs_init,
        hit,
        seed0,
        ray_ids,
        jnp.int32(1),
        chopped,
        with_stats=with_stats,
        n_samples=n_subframes,
        respawn_seed_base=jnp.uint32(seed_base),
        respawn_sub0=sub0 + 1,
        resample_on_spawn=resample,
        spawn_dir=directions if resample else None,
    )
    if with_stats:
        (mean, m2, cnt), stats = out
    else:
        mean, m2, cnt = out
    # Box-missing pixels shade the deterministic sun/sky miss program every
    # subframe: mean = miss, zero variance.
    miss = camera_ops.miss_radiance(params, static, directions)
    s = jnp.float32(n_subframes)
    mean = jnp.where(hit[:, None], mean, miss)
    m2 = jnp.where(hit[:, None], m2, 0.0)
    cnt = jnp.where(hit, cnt, s)
    if with_stats:
        return (mean, m2, cnt), stats
    return mean, m2, cnt
