"""Scene state: the device pytree + static (compile-time) scene description.

The reference wires per-task scene state through a DI container into OptiX
context variables (installers.cpp:28-119, Scene.cpp:36-44).  The TPU-native
equivalent is a split into:

- ``SceneParams``  — a pytree of device arrays (density mip pyramid,
  in-scatter grid, light/sky vectors, phase tables) that flows through jit;
- ``SceneStatic``  — hashable compile-time facts (step counts, shapes,
  scatter mode) that select code paths and loop bounds.

``build_scene`` is the composition root.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .config import MipmapsMode, RenderMode, SceneConfig
from .ops import grid as grid_ops
from .ops.phase import PhaseTable, load_phase_table


class SceneParams(NamedTuple):
    """Device-resident scene state (a pytree)."""

    density_mips: Tuple[jnp.ndarray, ...]  # mip pyramid, packed [Z, Y, X, 8]
    inscatter: jnp.ndarray  # sun-transmittance grid, packed [Z, Y, X, 8]
    #: Fused march rows [Z, Y, X, 16]: density corners + inscatter corners
    #: co-packed so the hot loop pays ONE row gather per step (gather cost
    #: on TPU is per row, not per byte).  float32 or uint8 (x255), per
    #: config.CloudRendering.march_dtype.
    march_rows: jnp.ndarray
    occupancy: jnp.ndarray  # coarse dilated max-density blocks, [Zb, Yb, Xb]
    bbox_size: jnp.ndarray  # [3] (x, y, z), max component == 1
    light_dir: jnp.ndarray  # [3] normalized, pointing *from* sun
    light_radiance: jnp.ndarray  # [3] color * intensity
    sky_intensity: jnp.ndarray  # [3]
    ground_intensity: jnp.ndarray  # [3]
    phase: PhaseTable
    #: Brick-3 mip tables (ops.grid.pack_bricks_single) — NOT built by
    #: default: measured 15x SLOWER than the packed corners for the
    #: descriptor featurizer (isolated samples must reduce the 64-wide
    #: fetched lattice to 8 corners per sample — the negative-result note
    #: in ops.descriptor.gather_descriptor).  The field remains for
    #: callers that want the layout (it wins when substeps REUSE a row,
    #: as the march does).
    density_mip_bricks: Tuple[jnp.ndarray, ...] = ()


@dataclasses.dataclass(frozen=True)
class SceneStatic:
    """Compile-time scene facts (hashable; passed as a static jit arg)."""

    grid_shape: Tuple[int, int, int]  # [Z, Y, X]
    n_mips: int
    sample_step: float  # in normalized bbox units (1/512)
    density_multiplier: float  # cloud_size / mean_free_path
    max_depth: int
    mode: RenderMode
    sun_cos_half_angle: float  # cos(0.53deg / 2)
    sun_solid_angle_ratio: float  # sun disc area / full sphere
    voxel_size_in_mfp: float  # voxel edge in mean-free-path units
    voxel_size_normalized: float  # voxel edge in bbox-normalized units
    minimal_ray_distance: float = 1e-4
    #: Russian-roulette controls (config.CloudRendering.rr_*; 0 = off).
    rr_start_depth: int = 0
    rr_survival: float = 0.98
    #: Empty-space skipping: march steps advanced at once through a zero
    #: occupancy block (0/1 = disabled).
    occupancy_block: int = 8
    occupancy_skip_steps: int = 0
    #: Exact empty-cell exit jumps in the deferred loop (all 8 density
    #: corners zero ⇒ trilinear density ≡ 0 over the closed cell).  Test
    #: hook; always a win when on.
    march_empty_skip: bool = True
    #: Deferred-scatter march loop (config.CloudRendering.march_deferred);
    #: False selects the legacy two-gather-per-step oracle loop.
    march_deferred: bool = True
    #: Cell-resident substeps per fetched row (resolved, never 0 here).
    march_substeps: int = 4
    #: Pending fraction of alive rays that triggers a deferred resolve.
    march_resolve_frac: float = 0.25
    #: march_iter calls between resolve checks (amortizes the per-iteration
    #: reduction + cond overhead over several row fetches).
    march_check_every: int = 2
    #: Pipelined march: geometric fetch cursor + unconditional resolve
    #: cadence (config.CloudRendering.march_pipeline notes: a measured
    #: wash/regression for the bounce loop — default off — and the clear
    #: win for the resolve-free standalone march, where the neural camera
    #: passes turn it on).
    march_pipeline: bool = False
    march_resolve_every: int = 4
    #: Brick rows: cells per axis per fused-row gather (0 = cell rows;
    #: config.CloudRendering.march_brick).
    march_brick: int = 0
    #: Hard override of the deferred loop's safety-cap iteration bound
    #: (0 = the derived wavefront bound).  Lets callers bound worst-case
    #: compute per call — and tests force the cap path deterministically.
    march_max_iters: int = 0
    #: Per-mip-level grid shapes (index math for the brick mip tables;
    #: empty = no brick mip tables were built).
    mip_shapes: Tuple[Tuple[int, int, int], ...] = ()
    #: Tight axis-aligned bounds of NONZERO density, in local coordinates
    #: (6 floats: lo_xyz + hi_xyz, one-cell margin).  The pipelined
    #: standalone march clips its iteration range to this box — density
    #: outside is exactly zero, so skipped segments multiply transmittance
    #: by exp(0) and can never scatter (round 5; empty = full box).
    cloud_aabb: Tuple[float, ...] = ()
    #: Sample sky/sun light along paths in the all-scatter mode — the
    #: reference's disabled code path (cloudRadianceMaterials.cu:20-27,
    #: 36-46); see pathtracer._scatter_loop for the estimator notes.
    sample_sky: bool = False
    #: Differentiable-mode path tracing: the bounce loop runs as a
    #: fixed-trip-count rematerialized ``lax.scan`` of the SAME legacy body
    #: (reverse-mode differentiable) instead of ``lax.while_loop``; requires
    #: ``march_deferred == False`` (the oracle loop), disables compaction.
    #: Identical forward values.
    differentiable: bool = False

    @property
    def max_march_steps(self) -> int:
        """Upper bound on fixed-step march iterations (box diagonal)."""
        return int(math.ceil(math.sqrt(3.0) / self.sample_step)) + 4

    @property
    def max_total_steps(self) -> int:
        """Iteration cap for the flat path-tracing loop: enough for
        ``max_depth`` bounces of mean free-flight length plus two full box
        crossings (entry + escape).  In-cloud segments average ~1 mean free
        path = ``1/density_multiplier`` normalized units ≈ a few sample
        steps, so this bound is generous; rays that somehow exceed it are
        truncated exactly like the reference truncates at MAX_DEPTH."""
        mean_segment_steps = max(
            1.0 / (self.density_multiplier * self.sample_step), 1.0
        )
        return int(
            math.ceil(self.max_depth * (mean_segment_steps + 3.0))
            + 2 * self.max_march_steps
        )


#: Brick edge of the descriptor mip tables (64 corners = 64-byte uint8
#: rows, already a power of two — no padding needed).
_DESCRIPTOR_BRICK = 3


def march_row_width(brick: int) -> int:
    """Stored march-row width in elements: the 2*(brick+1)^3 corner pair,
    padded up to the next power of two for brick rows.  Row ALIGNMENT
    governs the gather rate more than width (PERF_r04.json: 54 B unaligned
    rows gather at 34.7 Mrows/s from HBM-resident tables, 128 B aligned at
    106.9; 16 B cell rows are already aligned)."""
    if not brick:
        return 16
    w = 2 * (brick + 1) ** 3
    p = 1
    while p < w:
        p *= 2
    return p


def make_march_rows(
    density: jnp.ndarray,
    inscatter: jnp.ndarray,
    march_dtype: str = "float32",
    brick: int = 0,
) -> jnp.ndarray:
    """Fused march rows: density + in-scatter corners, one gather per step.

    ``brick == 0``: [Z, Y, X, 16] cell rows (8 corners each grid).
    ``brick >= 2``: [NB, 2*(brick+1)^3] brick rows (ops.grid.pack_bricks) —
    one row serves every sample in a brick^3-cell region.

    ``march_dtype == "uint8"`` stores both fields quantized x255 — the
    reference's own storage (density: Resources.cpp:93-96; in-scatter:
    inScatter.cu:65); samplers dequantize by 1/255."""
    if brick >= 2:
        rows = grid_ops.pack_bricks(density, inscatter, brick)
        pad = march_row_width(brick) - rows.shape[-1]
        if pad:
            rows = jnp.concatenate(
                [rows, jnp.zeros((*rows.shape[:-1], pad), rows.dtype)],
                axis=-1,
            )
    else:
        rows = grid_ops.pack_corner_pair(density, inscatter)
    if march_dtype == "uint8":
        # Saturate: a caller-supplied density/in-scatter outside [0,1]
        # must clip, not wrap through the uint8 cast.
        return jnp.round(jnp.clip(rows, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    if march_dtype != "float32":
        raise ValueError(f"march_dtype must be float32|uint8, got {march_dtype}")
    return rows


def march_rows_scale(march_rows: jnp.ndarray) -> float:
    """Dequantization scale for fetched march rows."""
    return 1.0 / 255.0 if march_rows.dtype == jnp.uint8 else 1.0


def build_scene(
    cfg: SceneConfig,
    density: np.ndarray,
    inscatter: Optional[np.ndarray] = None,
    dtype=jnp.float32,
) -> Tuple[SceneParams, SceneStatic]:
    """Compose the scene from config + a raw [Z, Y, X] density grid.

    Mirrors VDBCloud::init (VDBCloud.cpp:15-115): normalizes density by max,
    builds the mip pyramid, derives bboxSize / densityMultiplier /
    voxelSize*, and binds light + sky + phase state.  The in-scatter grid is
    baked separately (`render.inscatter.bake`) because collectors disable it
    (ScatterSampleCollector.h:32).
    """
    density = grid_ops.normalize_density(density)
    nz0, ny0, nx0 = density.shape
    brick = cfg.rendering.march_brick
    if brick < 0:
        # AUTO: brick 3 for uint8 scenes — the measured best at BOTH the
        # cache-resident and HBM-resident operating points with the split
        # density/in-scatter tables (SPLIT_TABLES_r04.json: 0.652 Mrays/s
        # at 64^3 vs 0.479 for brick 4; 0.423 at 256^3 vs 0.223): its
        # 64 B density half is aligned and amortizes 3 cells/axis per
        # fetch while the (B+1)^3 trilinear stays cheap.  uint8 rows
        # only: every measured brick win is on the uint8 tables
        # (PERF_r04.json: float32 16 B rows already gather at their
        # width-class plateau), so float32 scenes keep cell rows.
        brick = 3 if cfg.rendering.march_dtype == "uint8" else 0

    # MipmapsMode.OFF keeps only the base level (SceneDescription.h
    # Cloud::Model::mipmapsOn; descriptor LODs then clamp to level 0).
    mips = grid_ops.build_mipmaps(density)
    if cfg.cloud.mipmaps is not MipmapsMode.ON:
        mips = mips[:1]
    nz, ny, nx = density.shape
    bbox = grid_ops.bbox_size_from_shape(density.shape)

    # Tight nonzero-density bounds in local coordinates (one-cell margin:
    # trilinear support reaches one corner beyond the last nonzero voxel).
    nzm = np.asarray(density) > 0.0
    if nzm.any():
        zi, yi, xi = [np.nonzero(nzm.any(axis=ax))[0] for ax in ((1, 2), (0, 2), (0, 1))]
        dims_xyz = np.asarray([nx, ny, nz], np.float64)
        lo_idx = np.asarray([xi[0], yi[0], zi[0]], np.float64)
        hi_idx = np.asarray([xi[-1], yi[-1], zi[-1]], np.float64)
        aabb_lo = np.maximum(lo_idx - 1.0, 0.0) / dims_xyz * bbox
        aabb_hi = np.minimum(hi_idx + 2.0, dims_xyz) / dims_xyz * bbox
        cloud_aabb = tuple(float(v) for v in np.concatenate([aabb_lo, aabb_hi]))
    else:
        cloud_aabb = tuple(float(v) for v in np.concatenate([0.0 * bbox, bbox]))

    light_dir = np.asarray(cfg.light.direction, np.float32)
    light_dir = light_dir / np.linalg.norm(light_dir)

    half_angle = math.radians(cfg.light.angular_diameter_deg) / 2.0
    sun_area = 2.0 * math.pi * (1.0 - math.cos(half_angle))
    sun_ratio = sun_area / (4.0 * math.pi)

    max_dim = max(nx, ny, nz)
    voxel_size_m = cfg.cloud.size_m / max_dim
    occ_block = 8
    # A zero (dilated) occupancy block guarantees one block length of empty
    # space: skip that many march steps at once (exact — see
    # ops.grid.build_occupancy).  DISABLED by default: in the lockstep
    # megabatch loops the iteration count is set by the densest (non-
    # skipping) ray, so the extra occupancy lookup costs ~30% without
    # shortening the critical path (measured on v5e).  It pays off only for
    # sparse sample sets (collectors), which opt in via occupancy_skipping.
    if cfg.rendering.occupancy_skipping:
        skip_steps = int(occ_block / max_dim / cfg.rendering.sample_step)
        if skip_steps < 2:
            skip_steps = 0
    else:
        skip_steps = 0
    static = SceneStatic(
        grid_shape=(nz, ny, nx),
        n_mips=len(mips),
        mip_shapes=tuple(tuple(int(s) for s in m.shape) for m in mips),
        cloud_aabb=cloud_aabb,
        sample_step=cfg.rendering.sample_step,
        density_multiplier=cfg.density_multiplier,
        max_depth=cfg.rendering.max_depth,
        mode=cfg.rendering.mode,
        sun_cos_half_angle=math.cos(half_angle),
        sun_solid_angle_ratio=sun_ratio,
        voxel_size_in_mfp=voxel_size_m / cfg.cloud.mean_free_path_m,
        voxel_size_normalized=1.0 / max_dim,
        rr_start_depth=cfg.rendering.rr_start_depth,
        rr_survival=cfg.rendering.rr_survival,
        occupancy_block=occ_block,
        occupancy_skip_steps=skip_steps,
        march_deferred=cfg.rendering.march_deferred,
        # Auto substeps: one fetched row serves the steps a ray takes
        # crossing one fetch region (a cell, or a brick of march_brick
        # cells), capped so thin-cell grids don't burn masked substep
        # arithmetic.
        march_substeps=(
            cfg.rendering.march_substeps
            if cfg.rendering.march_substeps > 0
            else min(
                16,
                max(
                    1,
                    round(
                        max(1, brick)
                        / (max_dim * cfg.rendering.sample_step)
                    ),
                ),
            )
        ),
        # Clamped: a frac > 1.0 would make the pending-share resolve trigger
        # unsatisfiable (the == alive trigger in the loop is the backstop).
        march_resolve_frac=min(cfg.rendering.march_resolve_frac, 1.0),
        march_check_every=cfg.rendering.march_check_every,
        march_pipeline=cfg.rendering.march_pipeline,
        march_resolve_every=max(1, cfg.rendering.march_resolve_every),
        march_brick=brick,
        sample_sky=cfg.rendering.sample_sky,
    )

    if inscatter is None:
        inscatter = np.ones(density.shape, np.float32)

    # Grids ship in the packed-corner layout: trilinear sampling costs ONE
    # row gather instead of 8 scalar gathers (ops.grid.pack_corners — the
    # TPU-native replacement for the hardware 3D texture unit).  With
    # march_dtype="uint8" the textures themselves quantize x255 — the
    # reference's own storage for density AND in-scatter (Resources.cpp:
    # 93-96, inScatter.cu:65); samplers dequantize (ops.grid).  This
    # shrinks the descriptor featurizer's mip tables 4x (the NN/BNN
    # renderers' dominant gather traffic).
    tex_u8 = cfg.rendering.march_dtype == "uint8"

    def quantize(m):
        m = jnp.asarray(m, jnp.float32)
        if tex_u8:
            # Clip before the cast: a value a hair outside [0, 1] (fp error
            # in the mip filter, or a caller-supplied grid) must saturate,
            # not wrap through the uint8 conversion.
            return jnp.round(jnp.clip(m, 0.0, 1.0) * 255.0).astype(jnp.uint8)
        return m.astype(dtype)

    def tex(m):
        # Pack corners of the ALREADY-quantized grid: the brick mip tables
        # below must hold the identical stored values (corners are copies
        # of grid voxels, so quantize-then-pack == pack-then-quantize).
        return grid_ops.pack_corners(quantize(m))

    params = SceneParams(
        density_mips=tuple(tex(m) for m in mips),
        inscatter=tex(inscatter),
        march_rows=make_march_rows(
            jnp.asarray(mips[0], jnp.float32),
            jnp.asarray(inscatter, jnp.float32),
            cfg.rendering.march_dtype,
            brick,
        ),
        occupancy=jnp.asarray(
            grid_ops.build_occupancy(density, occ_block), dtype
        ),
        bbox_size=jnp.asarray(bbox, dtype),
        light_dir=jnp.asarray(light_dir, dtype),
        light_radiance=jnp.asarray(cfg.light.color, dtype) * cfg.light.intensity,
        sky_intensity=jnp.asarray(cfg.sky.sky_intensity, dtype),
        ground_intensity=jnp.asarray(cfg.sky.ground_intensity, dtype),
        phase=load_phase_table(dtype),
    )
    return params, static


def is_in_box(pos: jnp.ndarray, bbox_size: jnp.ndarray) -> jnp.ndarray:
    """The reference's tolerant box test (cloud.cuh:40-44): pos [..., 3] in
    local coords [0, bbox], with a ±0.01 margin."""
    return jnp.all((pos >= -0.01) & (pos <= bbox_size + 0.01), axis=-1)
