"""Typed configuration for the framework.

The reference composes per-task configuration through a vendored DI container
(Hypodermic) of settings structs (reference: DG/src/Scene/SceneDescription.h,
DG/src/installers.cpp:28-119).  Here the same information is plain frozen
dataclasses with a single composition root (`SceneConfig.build()` in
`deepestscatter_tpu.render.scene`), which is the idiomatic JAX equivalent:
static config stays in Python, array state lives in pytrees.
"""

from __future__ import annotations

import dataclasses
import enum
import math
from typing import Optional, Tuple

Vec3 = Tuple[float, float, float]


class RenderMode(enum.Enum):
    """Scatter modes (reference: SceneDescription.h:42-47)."""

    SUN_AND_SKY_ALL_SCATTER = "sun_and_sky_all_scatter"
    SUN_MULTIPLE_SCATTER = "sun_multiple_scatter"
    SUN_SINGLE_SCATTER = "sun_single_scatter"


class MipmapsMode(enum.Enum):
    OFF = "off"
    ON = "on"


@dataclasses.dataclass(frozen=True)
class DirectionalLight:
    """Reference: SceneDescription.h DirectionalLight; intensity installed as
    1e6 (installers.cpp:99); sun angular diameter 0.53 deg (cloud.cuh:138)."""

    direction: Vec3 = (-0.586, -0.766, -0.271)
    color: Vec3 = (1.0, 1.0, 1.0)
    intensity: float = 1e6
    angular_diameter_deg: float = 0.53


@dataclasses.dataclass(frozen=True)
class CloudModel:
    """Reference: SceneDescription.h Cloud::Model (:59-81)."""

    #: Path to the density volume (.npy/.npz dense grid or .vdb).
    volume_path: Optional[str] = None
    #: Physical size of the cloud's longest side, meters (1e3..1.2e4 in data gen).
    size_m: float = 3000.0
    #: Mean free path at density 1.0, meters (reference default 10 m).
    mean_free_path_m: float = 10.0
    mipmaps: MipmapsMode = MipmapsMode.ON


@dataclasses.dataclass(frozen=True)
class CloudRendering:
    """Reference: SceneDescription.h Cloud::Rendering; sampleStep installed as
    1/512 (installers.cpp:86); MAX_DEPTH 2000 (cloudRadianceMaterials.cu:4)."""

    sample_step: float = 1.0 / 512.0
    mode: RenderMode = RenderMode.SUN_AND_SKY_ALL_SCATTER
    max_depth: int = 2000
    #: Whether to sample sky/sun at path vertices (disabled in the reference,
    #: cloudRadianceMaterials.cu:23-25).
    sample_sky: bool = False
    #: Russian roulette: starting at this bounce depth, paths survive each
    #: bounce with probability ``rr_survival`` and surviving contributions
    #: are reweighted by 1/q — an UNBIASED variance/work trade the reference
    #: lacks (it walks every path to MAX_DEPTH).  0 disables (reference
    #: parity).  Deep-diffusion walks in dense clouds are the dominant cost;
    #: RR cuts expected path length by ~an order of magnitude.
    rr_start_depth: int = 0
    rr_survival: float = 0.98
    #: Exact empty-space skipping via the dilated occupancy grid.  Off by
    #: default: in lockstep megabatch loops the densest ray sets the
    #: iteration count, so the extra lookup loses (measured); useful for
    #: sparse/scattered sample workloads.
    occupancy_skipping: bool = False
    #: Deferred-scatter march (the fast path): per march step only the
    #: fused grid-row gather runs; rays that scatter park as "pending"
    #: and the per-bounce work (phase evaluation, direction inverse-CDF,
    #: NEE sun-transmittance — each a gather as expensive as the grid row,
    #: since TPU gathers are latency-bound per row at ~3 ns regardless of
    #: table size) resolves in batches once enough rays are pending.
    #: Identical estimator and RNG draw sites; False selects the legacy
    #: two-gather-per-step loop, kept as the equality oracle for tests
    #: (and as the differentiable-mode body).
    march_deferred: bool = True
    #: Steps evaluated per fetched grid row (cell-resident substeps): at
    #: sample_step 1/512 a ray takes ~(grid_res/512)^-1 steps inside one
    #: cell, and re-gathering the same 16-byte row every step is the
    #: dominant cost.  0 = auto (derived from steps-per-voxel).
    march_substeps: int = 0
    #: Pending share of ALIVE rays that triggers a deferred-scatter resolve
    #: (tuned on v5e: 0.125-0.25 equivalent; smaller = less lane stalling,
    #: more resolve passes).
    march_resolve_frac: float = 0.25
    #: march_iter calls between resolve checks: the per-iteration alive/
    #: pending reductions + lax.cond dispatch cost as much as a row gather,
    #: so checking every other iteration ~doubles throughput (measured).
    #: (Legacy scheduling; unused when march_pipeline is on.)
    march_check_every: int = 2
    #: Pipelined march scheduling (round 5): the row-gather index stream
    #: advances on ray GEOMETRY alone and the per-bounce resolve runs
    #: UNCONDITIONALLY every march_resolve_every iterations — no lax.cond,
    #: no gather-fed indices — so XLA software-pipelines consecutive
    #: iterations' gathers.  The march BODY is 3x faster this way (56 →
    #: 157+ Mrows/s at the 256^3 point: each serialized fetch was waiting
    #: on the previous fetch's crossing/empty-skip results — PERF_r05.json
    #: stage table), but in the full BOUNCE loop the static resolve
    #: cadence wastes lane occupancy (a lane that scatters parks until the
    #: next resolve; the dynamic pending-share trigger resolves ~3x
    #: sooner), and the measured END-TO-END render is a wash at 256^3
    #: (0.44 vs 0.43 Mrays/s) and a regression at 64^3 (0.41 vs 0.66,
    #: where auto-substeps are huge and parked lanes idle longest) — so
    #: the default stays the dynamic scheduler.  Estimator is identical
    #: either way: bit-identical to the non-pipelined loop with
    #: march_empty_skip=False (the cursor marches THROUGH zero bricks,
    #: trans *= exp(0)).  Where the pipeline wins OUTRIGHT is the
    #: resolve-free standalone march — the neural renderers' camera passes
    #: enable it explicitly (render/neural.py).
    march_pipeline: bool = False
    #: March iterations per unconditional resolve in the pipelined loop.
    march_resolve_every: int = 4
    #: Storage dtype for the fused march rows: "float32" or "uint8".
    #: uint8 is the REFERENCE'S semantics (both the density volume and the
    #: baked in-scatter grid are uint8 textures, Resources.cpp:93-96,
    #: inScatter.cu:65) and is ~18% faster to gather.
    march_dtype: str = "float32"
    #: Brick rows: cells per axis served by ONE fused-row gather (0 = the
    #: 8-corner cell rows).  A brick row stores the (B+1)^3 corner lattice
    #: of density AND in-scatter (e.g. B=3, uint8: 128-byte rows), so one
    #: gather covers B x more march distance; trilinear becomes a 3-step
    #: tensor contraction on the VPU (ops.grid.trilinear_from_brick).
    #: -1 = AUTO (the default): uint8 scenes resolve to brick 3 at EVERY
    #: grid size — the measured best with split density/in-scatter tables
    #: (SPLIT_TABLES_r04.json: 0.652 at 64^3 vs 0.479 for brick 4; 0.423
    #: at 256^3 vs 0.223): 128 B aligned rows gather FASTER than 16 B cell
    #: rows from an HBM-resident table AND serve 3x the march distance
    #: (~2x end-to-end at 256^3).  float32 scenes resolve to cell rows (no
    #: measured f32 brick win, PERF_r04.json).  Estimator output is
    #: bit-identical to cell rows (ops.grid.brick_cell).
    march_brick: int = -1


@dataclasses.dataclass(frozen=True)
class SkyConfig:
    """Reference: Scene.cpp:20-24 (sky/ground intensities), miss program
    gradient (pathTracingCamera.cu:33-50)."""

    sky_intensity: Vec3 = (0.1, 0.2, 2.0)
    ground_intensity: Vec3 = (0.9, 1.1, 1.1)


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Reference: Camera.cpp:37-42 (eye, hfov), Camera.h:90 (exposure),
    Tasks.cpp:49-50 (default resolution)."""

    width: int = 512
    height: int = 256
    eye: Vec3 = (2.5, -0.4, 0.0)
    look_at: Vec3 = (0.0, 0.0, 0.0)
    up: Vec3 = (0.0, 1.0, 0.0)
    hfov_deg: float = 30.0
    exposure: float = 0.4


@dataclasses.dataclass(frozen=True)
class ProgressiveConfig:
    """Progressive-estimation / convergence control
    (reference: Camera.cpp:189-268)."""

    subframes_per_tick: int = 10
    snapshot_every: int = 40
    min_subframes: int = 100
    #: 95% CI gates: converged if relative < rel_tol or absolute < abs_tol.
    rel_tol: float = 0.02
    abs_tol: float = 1e-2
    #: Frame converged when fewer than this many pixels are unconverged.
    max_unconverged_pixels: int = 500
    max_subframes: int = 7000


@dataclasses.dataclass(frozen=True)
class SceneConfig:
    light: DirectionalLight = dataclasses.field(default_factory=DirectionalLight)
    cloud: CloudModel = dataclasses.field(default_factory=CloudModel)
    rendering: CloudRendering = dataclasses.field(default_factory=CloudRendering)
    sky: SkyConfig = dataclasses.field(default_factory=SkyConfig)
    camera: CameraConfig = dataclasses.field(default_factory=CameraConfig)
    progressive: ProgressiveConfig = dataclasses.field(
        default_factory=ProgressiveConfig
    )

    @property
    def density_multiplier(self) -> float:
        """size / mean-free-path (reference: VDBCloud.cpp:109)."""
        return self.cloud.size_m / self.cloud.mean_free_path_m


@dataclasses.dataclass(frozen=True)
class BatchSettings:
    """Dataset-generation slice ownership: scene i owns sample ids
    [i*2048, (i+1)*2048) (reference: Tasks.cpp:137, GlobalSettings.py:1)."""

    start_id: int = 0
    size: int = 2048


@dataclasses.dataclass(frozen=True)
class PointRadianceConfig:
    """Ground-truth label estimation (reference: RadianceCollector.cpp:17,
    88,112-118)."""

    max_threads: int = 10 * 2048
    launches_per_update: int = 100
    rel_tol: float = 2e-2
    abs_tol: float = 1e-4
    black_min_experiments: int = 100_000


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Reference: TR/Common/Trainer.py:40-115."""

    seed: int = 566
    learning_rate: float = 1e-3
    batch_size: int = 1024
    val_batch_size: int = 4096
    epochs: int = 200
    validate_every: int = 40
    run_dir: str = "runs"


#: Light directions used by renderCloud tasks (reference: Tasks.cpp:52-65).
LIGHT_DIRECTIONS = {
    "Front": (-0.586, -0.766, -0.271),
    "Side": (0.03, -0.766, -0.642),
    "Back": (0.586, -0.766, 0.271),
}


def fov_tan_halves(hfov_deg: float, width: int, height: int) -> Tuple[float, float]:
    """Pinhole half-extent tangents for (U, V) from horizontal fov; aspect
    keeps square pixels (reference: sutil::calculateCameraVariables)."""
    tan_h = math.tan(math.radians(hfov_deg) / 2.0)
    tan_v = tan_h * (height / width)
    return tan_h, tan_v
