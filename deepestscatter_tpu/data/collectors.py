"""Dataset collectors — the 4-stage ground-truth pipeline.

Capability parity with the reference's collector SceneItems (SURVEY.md §3.2):

1. ``generate_scatter_samples`` — ScatterSampleCollector +
   pointGeneratorCamera.cu: rejection-sample first-scatter (position,
   direction) pairs: uniform sphere normal, uniform disc of radius √3/2,
   ray at the cloud, keep the first scatter event.
2. ``estimate_point_radiance`` — RadianceCollector + pointEmissionCamera.cu:
   Monte-Carlo multi-scatter radiance at each stored (position, direction)
   with Welford statistics and the reference's CI gates (rel < 2e-2 or
   abs < 1e-4; zero-radiance needs > 1e5 experiments,
   RadianceCollector.cpp:112-118).
3. ``collect_disney_descriptors`` — DisneyDescriptorCollector: the 10-layer
   5x5x9 uint8 descriptor at each sample.
4. ``collect_baked_sets`` — BakedDescriptorCollector: the 4 tetrahedral
   probes per sample (descriptor at the probe with canonical direction
   (0,0,1), barycentric power, position; "Baked descriptor doesn't know
   where the light shoots from", BakedDescriptorCollector.cpp:41-42).

TPU-native shape: every stage is ONE batched jit program over the scene's
2048-sample slice — no per-sample launches, no GPU↔CPU ping-pong.  The
rejection loop is a masked ``lax.while_loop``; the radiance estimator folds
``experiments_per_launch`` experiments into the batch per update (the
reference's 10x-replica trick becomes a Welford batch-merge).  RNG is
counter-based on (seed, sample id, draw site): restartable and
shard-stable.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PointRadianceConfig, RenderMode
from ..ops import descriptor as desc_ops
from ..ops import rng as rng_ops
from ..ops import tetra as tetra_ops
from ..ops import welford as welford_ops
from ..render import baked as baked_mod
from ..render import camera as camera_ops
from ..render import pathtracer
from ..scene import SceneParams, SceneStatic, is_in_box
from . import records

_SQRT3_2 = math.sqrt(3.0) / 2.0
#: RNG draw sites per rejection attempt (2 sphere + 2 disc + 1 od).
_DRAWS_PER_ATTEMPT = 8
_MAX_ATTEMPTS = 256


def generate_scatter_samples(
    params: SceneParams,
    static: SceneStatic,
    n: int,
    seed: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """First-scatter sample generation (pointGeneratorCamera.cu:20-42).

    Returns (positions [n, 3] world-centered coords, directions [n, 3]).
    Every sample retries until its ray scatters (masked lockstep loop; the
    reference's per-thread ``while(true)``).
    """
    ids = jnp.arange(n, dtype=jnp.uint32)
    seed = jnp.uint32(seed)

    def attempt(k, found, pos, direction):
        ctr = k * _DRAWS_PER_ATTEMPT
        u1 = rng_ops.hash_uniform(seed, ids, ctr)
        u2 = rng_ops.hash_uniform(seed, ids, ctr + 1)
        u3 = rng_ops.hash_uniform(seed, ids, ctr + 2)
        u4 = rng_ops.hash_uniform(seed, ids, ctr + 3)
        od = rng_ops.hash_uniform(seed, ids, ctr + 4)
        normal = rng_ops.uniform_on_sphere(u1, u2)
        disc = rng_ops.uniform_on_disc(u3, u4, normal) * _SQRT3_2
        origin = disc + normal * 2.0
        ray_dir = -normal
        hit, t_hit = camera_ops.intersect_box(
            origin, ray_dir, static, params.bbox_size
        )
        entry = origin + ray_dir * t_hit[:, None] + 0.5 * params.bbox_size
        from ..ops import march as march_ops

        event = march_ops.next_scattering_event(
            params, static, od, entry, ray_dir, stop_at_scatter=True
        )
        ok = (
            hit
            & event.has_scattered
            & is_in_box(event.scatter_pos, params.bbox_size)
            & (~found)
        )
        new_pos = event.scatter_pos - 0.5 * params.bbox_size
        pos = jnp.where(ok[:, None], new_pos, pos)
        direction = jnp.where(ok[:, None], ray_dir, direction)
        return found | ok, pos, direction

    def cond(state):
        k, found, _, _ = state
        return jnp.logical_and(k < _MAX_ATTEMPTS, ~jnp.all(found))

    def body(state):
        k, found, pos, direction = state
        found, pos, direction = attempt(k, found, pos, direction)
        return k + 1, found, pos, direction

    state = (
        jnp.int32(0),
        jnp.zeros((n,), bool),
        jnp.zeros((n, 3), jnp.float32),
        jnp.zeros((n, 3), jnp.float32),
    )
    _, found, pos, direction = jax.lax.while_loop(cond, body, state)
    return pos, direction


class RadianceEstimate(NamedTuple):
    radiance: jnp.ndarray  # [n] mean multi-scatter radiance (red channel)
    is_converged: jnp.ndarray  # [n] bool
    experiments: jnp.ndarray  # [n] experiment counts


def _radiance_static(static: SceneStatic) -> SceneStatic:
    """Labels are multi-scatter-only radiance (Tasks.h collect mode)."""
    return dataclasses.replace(static, mode=RenderMode.SUN_MULTIPLE_SCATTER)


def estimate_point_radiance(
    params: SceneParams,
    static: SceneStatic,
    positions: jnp.ndarray,
    directions: jnp.ndarray,
    cfg: PointRadianceConfig = PointRadianceConfig(),
    seed: int = 0,
    max_updates: int = 200,
    verbose: bool = False,
) -> RadianceEstimate:
    """Monte-Carlo ground-truth labels with CI-gated convergence.

    ``positions`` world-centered (as stored by the sample generator).  Each
    update folds ``replicas`` experiments per point into the Welford state
    (the reference replicates tasks to fill 20,480 threads and merges,
    RadianceCollector.cpp:17,176-192 — here the merge is a batch reduce).
    """
    n = positions.shape[0]
    rstatic = _radiance_static(static)
    replicas = max(1, cfg.max_threads // max(n, 1))
    entry = positions + 0.5 * params.bbox_size
    ids = jnp.arange(n, dtype=jnp.uint32)

    @jax.jit
    def update(state: welford_ops.Welford, round_id):
        o = jnp.tile(entry, (replicas, 1))
        d = jnp.tile(directions, (replicas, 1))
        rids = jnp.tile(ids, replicas)
        # Experiment-unique RNG stream: fold (round, replica) into the seed.
        rep = jnp.repeat(jnp.arange(replicas, dtype=jnp.uint32), n)
        seeds = (
            jnp.uint32(seed)
            ^ ((round_id.astype(jnp.uint32) * replicas + rep) * jnp.uint32(0x9E3779B1))
        )
        radiance = pathtracer.trace_hit_radiance(
            params,
            rstatic,
            o,
            d,
            jnp.ones((n * replicas,), bool),
            seeds,
            rids,
        )[:, 0].reshape(replicas, n)
        batch_mean = radiance.mean(axis=0)
        batch_m2 = ((radiance - batch_mean) ** 2).sum(axis=0)
        merged = welford_ops.merge(
            state,
            welford_ops.Welford(
                batch_mean, batch_m2, jnp.full((n,), float(replicas))
            ),
        )
        ci = welford_ops.confidence_interval_95(merged)
        rel_ok = ci / (merged.mean + jnp.finfo(jnp.float32).eps) < cfg.rel_tol
        abs_ok = ci < cfg.abs_tol
        converged = rel_ok | abs_ok
        # Zero-radiance points only count once they survive the experiment
        # budget (RadianceCollector.cpp:112-118).
        black = merged.mean <= 0.0
        converged = jnp.where(
            black, merged.count > cfg.black_min_experiments, converged
        )
        return merged, converged

    state = welford_ops.Welford.zeros((n,))
    converged = jnp.zeros((n,), bool)
    for r in range(max_updates):
        state, converged = update(state, jnp.int32(r))
        n_left = int((~converged).sum())
        if verbose:
            print(f"radiance update {r}: {n_left} unconverged")
        if n_left == 0:
            break
    return RadianceEstimate(state.mean, converged, state.count)


def collect_disney_descriptors(
    params: SceneParams,
    static: SceneStatic,
    positions: jnp.ndarray,
    directions: jnp.ndarray,
) -> np.ndarray:
    """10-layer uint8 descriptor grids [n, 2250]
    (disneyDescriptorCollector.cu:22-47)."""
    local = positions + 0.5 * params.bbox_size
    layers = desc_ops.gather_descriptor(
        params, static, local, directions, n_layers=desc_ops.DISNEY_LAYERS
    )
    return np.asarray(desc_ops.quantize_u8(layers)).reshape(
        positions.shape[0], records.GRID_BYTES
    )


def collect_baked_sets(
    params: SceneParams,
    static: SceneStatic,
    positions: jnp.ndarray,
) -> np.ndarray:
    """BakedInterpolationSet records [n] (lightProbeCollector.cu:23-59):
    per sample, the 4 tetrahedron probes with descriptor (canonical
    direction), barycentric power, and probe position."""
    n = positions.shape[0]
    local = positions + 0.5 * params.bbox_size
    units = local * (
        static.density_multiplier / baked_mod.STEP_IN_MEAN_FREE_PATH
    )
    corners, weights = tetra_ops.probe_interpolation(units)  # [n,4,3],[n,4]
    spacing = baked_mod.STEP_IN_MEAN_FREE_PATH / static.density_multiplier
    probe_local = corners.astype(jnp.float32) * spacing  # [n, 4, 3]
    probe_dir = jnp.broadcast_to(
        jnp.asarray(baked_mod.PROBE_DIRECTION, jnp.float32), (n * 4, 3)
    )
    flat_pos = probe_local.reshape(n * 4, 3)
    layers = desc_ops.gather_descriptor(
        params,
        static,
        flat_pos,
        probe_dir,
        n_layers=desc_ops.DISNEY_LAYERS,
        frame_dir=probe_dir,
    )
    grids = np.asarray(desc_ops.quantize_u8(layers)).reshape(
        n, 4, records.GRID_BYTES
    )
    out = np.zeros(n, records.BAKED_INTERPOLATION_SET)
    probe_world = np.asarray(flat_pos).reshape(n, 4, 3) - np.asarray(
        0.5 * params.bbox_size
    )
    powers = np.asarray(weights)
    for i, corner in enumerate(("a", "b", "c", "d")):
        out[corner]["grid"] = grids[:, i]
        out[corner]["position"] = probe_world[:, i]
        out[corner]["direction"] = np.asarray(
            baked_mod.PROBE_DIRECTION, np.float32
        )
        out[corner]["power"] = powers[:, i]
    return out
