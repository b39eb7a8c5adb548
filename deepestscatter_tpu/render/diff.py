"""Differentiable volumetric rendering — the north-star capability beyond
the reference (BASELINE.md: "pixel gradients w.r.t. density voxels, sun
direction, and camera"; the reference's OptiX renderer has no gradients).

Design: a deterministic quadrature formulation of the scattering integral
(the noise-free analog of the free-flight Monte-Carlo estimator):

    L(ray) = Σ_i  T_i · σ(x_i) · Δt · NEE(x_i, ω)      (single scatter)
    T_i    = exp(-Σ_{j≤i} σ(x_j) Δt)

with the in-scatter (sun transmittance) field itself computed by a
differentiable scan, so ∂L/∂density flows BOTH through the view-ray
transmittance and through the sun-shadowing of every sample point, and
∂L/∂sun_direction flows through the in-scatter march directions and the
phase angle.  Everything is ``lax.scan`` over fixed step counts with
``jax.checkpoint`` (rematerialization) so the backward pass of long
marches stays within memory (SURVEY.md §7 hard part (e)).

This module intentionally takes RAW inputs (dense [Z, Y, X] density, sun
vector, camera eye/look-at) rather than the packed SceneParams: gradients
address the physical parameters directly, and the classic trilinear
gather is linear in the grid values so its VJP is an exact scatter-add.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SceneConfig, fov_tan_halves
from ..ops import grid as grid_ops
from ..ops import phase as phase_ops


class DiffScene(NamedTuple):
    """Differentiable scene inputs (a pytree of leaves gradients address)."""

    density: jnp.ndarray  # [Z, Y, X] raw density in [0, 1]
    sun_dir: jnp.ndarray  # [3] direction FROM the sun (not normalized)
    eye: jnp.ndarray  # [3] camera position
    look_at: jnp.ndarray  # [3]
    light_radiance: jnp.ndarray  # [3]


def _bbox(density: jnp.ndarray) -> jnp.ndarray:
    nz, ny, nx = density.shape
    m = float(max(nx, ny, nz))
    return jnp.asarray([nx / m, ny / m, nz / m], jnp.float32)


def sample_density(density: jnp.ndarray, bbox: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Trilinear density at local coords [0, bbox] (zero outside the box —
    the raw grid is expected zero-padded like data.clouds.prepare)."""
    u = pos / bbox
    inside = jnp.all((u >= 0.0) & (u <= 1.0), axis=-1)
    return jnp.where(inside, grid_ops.sample_trilinear(density, u), 0.0)


@partial(jax.checkpoint, static_argnums=(3, 4))
def sun_transmittance(
    density: jnp.ndarray,
    sun_dir: jnp.ndarray,
    pos: jnp.ndarray,
    density_multiplier: float,
    n_steps: int,
    sample_step: float = 1.0 / 256.0,
) -> jnp.ndarray:
    """Differentiable in-scatter: Beer-Lambert transmittance from ``pos``
    [N, 3] toward the sun (the inScatter.cu bake, computed on the fly so
    gradients flow through the sun direction and every shadowing voxel)."""
    bbox = _bbox(density)
    to_sun = -sun_dir / jnp.linalg.norm(sun_dir)
    step = jnp.float32(sample_step)

    def body(tau, i):
        p = pos + to_sun * (step * (i + 1.0))
        sigma = sample_density(density, bbox, p) * density_multiplier
        return tau + sigma * step, None

    tau, _ = jax.lax.scan(
        body, jnp.zeros(pos.shape[:-1]), jnp.arange(n_steps, dtype=jnp.float32)
    )
    return jnp.exp(-tau)


def camera_rays(
    eye: jnp.ndarray,
    look_at: jnp.ndarray,
    width: int,
    height: int,
    hfov_deg: float = 30.0,
    up=(0.0, 1.0, 0.0),
):
    """Differentiable pinhole ray bundle (camera_ops.generate_rays with
    traced eye/look_at)."""
    up = jnp.asarray(up, jnp.float32)
    w = look_at - eye
    wlen = jnp.linalg.norm(w)
    u = jnp.cross(w, up)
    u = u / jnp.linalg.norm(u)
    v = jnp.cross(u, w)
    v = v / jnp.linalg.norm(v)
    tan_h, tan_v = fov_tan_halves(hfov_deg, width, height)
    u = u * wlen * tan_h
    v = v * wlen * tan_v
    xs = (jnp.arange(width, dtype=jnp.float32) / width) * 2.0 - 1.0
    ys = (jnp.arange(height, dtype=jnp.float32) / height) * 2.0 - 1.0
    dx, dy = jnp.meshgrid(xs, ys)
    d = dx[..., None] * u + dy[..., None] * v + w
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(eye, d.shape)
    return o.reshape(-1, 3), d.reshape(-1, 3)


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "density_multiplier", "n_steps", "sun_steps",
        "sample_step", "remat_chunk", "use_baked_inscatter",
    ),
)
def render_single_scatter(
    scene: DiffScene,
    width: int = 64,
    height: int = 32,
    density_multiplier: float = 100.0,
    n_steps: int = 256,
    sun_steps: int = 128,
    sample_step: float = 1.0 / 256.0,
    sun_cos_half_angle: float = math.cos(math.radians(0.53) / 2.0),
    remat_chunk: int = 32,
    use_baked_inscatter: bool = True,
) -> jnp.ndarray:
    """Differentiable single-scatter render → [height, width, 3].

    The march is a ``lax.scan`` over ``n_steps`` chunked under
    ``jax.checkpoint``: backward memory is O(n_steps / remat_chunk)
    checkpoints instead of O(n_steps) full states.

    ``use_baked_inscatter`` (default) evaluates NEE sun transmittance from
    a DIFFERENTIABLY baked grid sampled trilinearly — the renderer's own
    semantics (VDBCloud bake + tex3D, inScatter.cu), so values cross-
    validate against the MC path tracer, and the bake is O(V) instead of
    the O(pixels x steps x sun_steps) per-point march.  ``False`` re-marches
    the sun exactly per sample point (pointwise-exact physics; differs from
    grid-interpolated transmittance by the trilinear-of-exponential
    interpolation error in deep shadow).
    """
    density, sun_dir = scene.density, scene.sun_dir
    bbox = _bbox(density)
    sun_n = sun_dir / jnp.linalg.norm(sun_dir)
    phase = phase_ops.load_phase_table()
    origins, dirs = camera_rays(scene.eye, scene.look_at, width, height)

    if use_baked_inscatter:
        packed_density = grid_ops.pack_corners(density)
        baked = bake_inscatter_diff(
            packed_density, bbox, sun_n, density_multiplier, sample_step
        )
        ins_packed = grid_ops.pack_corners(baked)

        def t_sun_at(p):
            return grid_ops.sample_trilinear(ins_packed, p / bbox)

    else:

        def t_sun_at(p):
            return sun_transmittance(
                density, sun_dir, p, density_multiplier, sun_steps, sample_step
            )

    # Entry points (the box is fixed; t_near still differentiates w.r.t.
    # eye/dirs).  Axis-parallel rays have a zero direction component; guard
    # the reciprocal so the backward pass stays finite (0 * inf = NaN in
    # reverse mode even for rays the final `where` masks out).
    half = bbox * 0.5
    safe = jnp.where(jnp.abs(dirs) < 1e-9, jnp.where(dirs >= 0.0, 1e-9, -1e-9), dirs)
    inv = 1.0 / safe
    t0 = (-half - origins) * inv
    t1 = (half - origins) * inv
    t_near = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), 1e-4)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = t_near < t_far
    entry = origins + dirs * t_near[:, None] + half

    cos_light = (-sun_n * dirs).sum(axis=-1)
    p_phase = phase_ops.eval_phase(phase.mie, cos_light)
    sun_area = 2.0 * math.pi * (1.0 - sun_cos_half_angle)
    sun_ratio = sun_area / (4.0 * math.pi)
    step = jnp.float32(sample_step)
    dm = jnp.float32(density_multiplier)

    def chunk_body(carry, i0):
        def step_body(carry, i):
            tau, radiance = carry
            p = entry + dirs * (step * (i + 1.0))
            sigma = sample_density(density, bbox, p) * dm
            t_view = jnp.exp(-tau)
            # Exact per-segment weight: ∫ σ e^{-τ} over the segment equals
            # T_prev · (1 − e^{−σΔ}) for segment-constant σ — precisely the
            # expectation of the free-flight MC estimator on the same step
            # grid (cloud.cuh:87-106), so quadrature cross-validates
            # against the path tracer without first-order O(σΔ) bias.
            seg = 1.0 - jnp.exp(-sigma * step)
            # NEE evaluates at the segment's free-flight MEAN point (the MC
            # scatter position is exp-weighted within the step, cloud.cuh:99
            # back-correction): offset Δ−E[x] behind the segment end, with
            # E[x] = 1/σ − Δ·e^{−σΔ}/(1−e^{−σΔ}) for x ∈ [0, Δ].  Sampling
            # t_sun at the segment END instead is first-order biased in
            # strong sun-shadow gradients (measured ~25% on silhouette
            # pixels at σΔ ≈ 0.3).
            sig = jnp.maximum(sigma, 1e-6)
            a = sig * step
            em = -jnp.expm1(-a)  # 1 − e^{−a}, cancellation-free
            exact = 1.0 / sig - step * jnp.exp(-a) / jnp.maximum(em, 1e-30)
            taylor = step * (0.5 - a / 12.0)  # E[x] for σΔ → 0
            mean_x = jnp.where(a < 1e-3, taylor, exact)
            p_nee = p - dirs * (step - mean_x)[:, None]
            t_sun = t_sun_at(p_nee)
            contrib = t_view * seg * t_sun * p_phase * sun_ratio
            return (tau + sigma * step, radiance + contrib), None

        carry, _ = jax.lax.scan(
            jax.checkpoint(step_body),
            carry,
            i0 + jnp.arange(remat_chunk, dtype=jnp.float32),
        )
        return carry, None

    tau0 = jnp.zeros(entry.shape[0])
    rad0 = jnp.zeros(entry.shape[0])
    starts = jnp.arange(0, n_steps, remat_chunk, dtype=jnp.float32)
    (tau, radiance), _ = jax.lax.scan(chunk_body, (tau0, rad0), starts)

    rgb = scene.light_radiance[None, :] * radiance[:, None]
    rgb = jnp.where(hit[:, None], rgb, 0.0)
    return rgb.reshape(height, width, 3)


def render_and_grads(scene: DiffScene, **kw):
    """Convenience: (image, gradients of mean radiance w.r.t. every scene
    leaf) — the allclose-gradient check target of BASELINE.json."""

    def loss(s):
        img = render_single_scatter(s, **kw)
        return img.mean(), img

    (value, img), grads = jax.value_and_grad(loss, has_aux=True)(scene)
    return img, grads


# ---------------------------------------------------------------------------
# Differentiable MULTI-scatter: reparameterized Monte Carlo through the
# path tracer's own bounce loop (render/pathtracer.py with
# static.differentiable=True: the identical legacy body, run as a
# rematerialized fixed-trip-count scan).  Given fixed RNG draws the whole
# path — free-flight scatter positions (back-correction log(od/T)/σ,
# cloud.cuh:99), per-bounce NEE, direction frames — is a deterministic
# differentiable function of (density voxels, sun direction, radiance), so
# reverse-mode AD yields exact per-sample path gradients; averaging
# subframes gives the gradient of the Monte-Carlo estimate.
# ---------------------------------------------------------------------------


def bake_inscatter_diff(
    density_packed: jnp.ndarray,
    bbox: jnp.ndarray,
    light_dir: jnp.ndarray,
    density_multiplier,
    sample_step: float,
) -> jnp.ndarray:
    """Differentiable sun-transmittance bake → raw [Z, Y, X].

    Arithmetic mirrors render.inscatter.bake's EXACT float mode
    (``quantize=False, early_out=False`` — inScatter.cu:40-66 without the
    uint8 freeze, whose floor/freeze would zero gradients in optically
    thick regions) with the data-dependent while replaced by a fixed-length
    scan covering the box diagonal; values match that bake exactly."""
    import math as _math

    nz, ny, nx, _ = density_packed.shape
    max_dim = float(max(nx, ny, nz))
    step = jnp.float32(sample_step)
    dm = jnp.asarray(density_multiplier, jnp.float32)
    n_steps = int(_math.ceil(_math.sqrt(3.0) / sample_step)) + 2
    to_light = -light_dir

    zi = jnp.arange(nz, dtype=jnp.float32)
    yi = jnp.arange(ny, dtype=jnp.float32)
    xi = jnp.arange(nx, dtype=jnp.float32)
    zz, yy, xx = jnp.meshgrid(zi, yi, xi, indexing="ij")
    base = jnp.stack([xx, yy, zz], axis=-1).reshape(-1, 3) / max_dim

    def body(trans, i):
        pos = base + to_light * (step * i)
        density = grid_ops.sample_trilinear(density_packed, pos / bbox) * dm
        return trans * jnp.exp(-density * step), None

    trans, _ = jax.lax.scan(
        jax.checkpoint(body),
        jnp.ones((base.shape[0],), jnp.float32),
        jnp.arange(n_steps, dtype=jnp.float32),
    )
    return trans.reshape(nz, ny, nx)


def diff_scene(cfg: SceneConfig, scene: DiffScene, max_depth: int = 4):
    """Build (SceneParams, SceneStatic) DIFFERENTIABLY from raw leaves.

    The params pytree is a traced function of ``scene.density`` /
    ``scene.sun_dir`` / ``scene.light_radiance`` — the in-scatter bake, the
    corner packing, and the fused march rows are all jnp ops — so
    ``jax.grad`` through a render addresses the physical inputs.  Static
    facts come from ``cfg`` with the differentiable oracle loop selected.
    """
    import dataclasses as _dc

    from .. import scene as scene_mod
    from ..config import CloudRendering

    density = scene.density
    nz, ny, nx = density.shape
    bbox = _bbox(density)
    light_dir = scene.sun_dir / jnp.linalg.norm(scene.sun_dir)

    rendering = _dc.replace(
        cfg.rendering,
        max_depth=max_depth,
        march_deferred=False,
        occupancy_skipping=False,
        march_brick=0,  # diff params carry hand-built cell rows
    )
    cfg = _dc.replace(cfg, rendering=rendering)
    _, static0 = scene_mod.build_scene(cfg, np.zeros((2, 2, 2), np.float32))
    static = _dc.replace(
        static0,
        grid_shape=(nz, ny, nx),
        n_mips=1,
        voxel_size_normalized=1.0 / max(nx, ny, nz),
        voxel_size_in_mfp=(
            cfg.cloud.size_m / max(nx, ny, nz) / cfg.cloud.mean_free_path_m
        ),
        differentiable=True,
        march_deferred=False,
        occupancy_skip_steps=0,
    )

    packed = grid_ops.pack_corners(density)
    inscatter_raw = bake_inscatter_diff(
        packed, bbox, light_dir, static.density_multiplier, static.sample_step
    )
    inscatter_packed = grid_ops.pack_corners(inscatter_raw)
    march_rows = jnp.concatenate([packed, inscatter_packed], axis=-1)
    params = scene_mod.SceneParams(
        density_mips=(packed,),
        inscatter=inscatter_packed,
        march_rows=march_rows,
        occupancy=jnp.zeros((1, 1, 1), jnp.float32),
        bbox_size=bbox,
        light_dir=light_dir,
        light_radiance=scene.light_radiance,
        sky_intensity=jnp.asarray(cfg.sky.sky_intensity, jnp.float32),
        ground_intensity=jnp.asarray(cfg.sky.ground_intensity, jnp.float32),
        phase=phase_ops.load_phase_table(),
    )
    return params, static


def render_multi_scatter_mc(
    scene: DiffScene,
    cfg: SceneConfig,
    width: int = 16,
    height: int = 8,
    max_depth: int = 4,
    n_subframes: int = 2,
    seed: int = 0,
) -> jnp.ndarray:
    """Differentiable multi-scatter Monte-Carlo render → [H, W, 3].

    The estimator IS the path tracer's (mode from ``cfg.rendering.mode``,
    NEE each bounce, chopped-phase resampling — cloudRadianceMaterials.cu:
    28-115) with the same RNG keying, so with matching seeds the forward
    pass reproduces ``pathtracer.render_subframe`` exactly; reverse-mode
    gradients flow to density / sun / radiance through every march step,
    scatter position, and the in-scatter bake."""
    from ..render import pathtracer as pt

    params, static = diff_scene(cfg, scene, max_depth=max_depth)
    origins, dirs = camera_rays(
        scene.eye, scene.look_at, width, height, cfg.camera.hfov_deg
    )
    # Axis-parallel guard: camera_ops.intersect_box divides by the
    # direction (IEEE inf is fine forward, but 0 * inf = NaN in reverse
    # mode even for lanes the final `where` masks) — nudge exact zeros.
    dirs = jnp.where(
        jnp.abs(dirs) < 1e-9, jnp.where(dirs >= 0.0, 1e-9, -1e-9), dirs
    )
    ids = jnp.arange(origins.shape[0], dtype=jnp.uint32)
    acc = jnp.zeros((origins.shape[0], 3), jnp.float32)
    for s in range(n_subframes):
        acc = acc + pt.render_subframe(
            params, static, origins, dirs, seed, jnp.int32(s + 1), ids
        )
    return (acc / n_subframes).reshape(height, width, 3)


def multi_scatter_and_grads(scene: DiffScene, cfg: SceneConfig, **kw):
    """(image, gradients of mean radiance w.r.t. every DiffScene leaf) for
    the multi-scatter MC renderer."""

    def loss(s):
        img = render_multi_scatter_mc(s, cfg, **kw)
        return img.mean(), img

    (_, img), grads = jax.value_and_grad(loss, has_aux=True)(scene)
    return img, grads
