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
rejection loop is a masked ``lax.while_loop``; the radiance estimator keeps
the reference's host-driven reschedule/densify loop (converged points leave
the schedule, the thread budget re-divides among survivors) around a jitted
update that replica-merges with one Welford moments reduction.  RNG is
counter-based on (seed, sample id, experiment index): restartable and
shard-stable.
"""

from __future__ import annotations

import dataclasses
import functools
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
    radiance: np.ndarray  # [n] mean multi-scatter radiance (red channel)
    is_converged: np.ndarray  # [n] bool
    experiments: np.ndarray  # [n] experiment counts
    #: Per-update (n_active, replicas) — the reschedule/densify record
    #: (the reference prints "converged: k of n" each update).
    schedule: Tuple[Tuple[int, int], ...] = ()


def _radiance_static(static: SceneStatic) -> SceneStatic:
    """Labels are multi-scatter-only radiance (Tasks.h collect mode)."""
    return dataclasses.replace(static, mode=RenderMode.SUN_MULTIPLE_SCATTER)


def _bucket_size(n_active: int) -> int:
    """Padded active-set size (power of two ≥ 8) so rescheduling compiles
    one program per bucket, not per active count."""
    b = 8
    while b < n_active:
        b *= 2
    return b


@functools.partial(
    jax.jit, static_argnames=("static", "replicas", "launches")
)
def _radiance_launch(
    params: SceneParams,
    static: SceneStatic,
    entry: jnp.ndarray,  # [bucket, 3]
    direction: jnp.ndarray,  # [bucket, 3]
    rids: jnp.ndarray,  # [bucket] uint32 global sample ids
    exp_base: jnp.ndarray,  # [bucket] uint32 first experiment index
    seed: jnp.ndarray,  # uint32 scalar
    *,
    replicas: int,
    launches: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trace ``bucket * replicas * launches`` independent experiments with
    LANE REGENERATION → per-point moment sums (Σx, Σx²).

    The reference runs 100 sequential launches over replicated tasks per
    update (RadianceCollector.cpp:88-96).  Here each lane is a (point,
    replica) pair that runs its ``launches`` experiments back to back —
    when one finishes, the lane respawns at the point's entry with the next
    experiment's seed (pathtracer lane regeneration), so the lockstep
    megabatch stays ~100% occupied through the deep-diffusion tail instead
    of idling on finished lanes.  RNG keying is unchanged — (seed, sample
    id, global experiment index), experiment index = exp_base +
    replica * launches + k — so every per-experiment radiance value is
    bit-identical to the tiled-megabatch formulation; only the fp order of
    the moment sums differs."""
    bucket = entry.shape[0]
    o = jnp.tile(entry, (replicas, 1))
    d = jnp.tile(direction, (replicas, 1))
    ids_t = jnp.tile(rids, replicas)
    r = jnp.repeat(
        jnp.arange(replicas, dtype=jnp.uint32) * jnp.uint32(launches), bucket
    )
    sub0 = jnp.tile(exp_base, replicas) + r  # [bucket*replicas]
    seed0 = seed ^ (sub0 * jnp.uint32(0x9E3779B1))
    rstatic = static
    resample = static.mode is RenderMode.SUN_MULTIPLE_SCATTER
    if resample:
        # The multi-scatter estimator resamples the direction before the
        # loop (cloudRadianceMaterials.cu:72-115) — per experiment, with
        # that experiment's seed (counters 0/1).
        u0 = rng_ops.hash_uniform(seed0, ids_t, jnp.int32(0))
        u1 = rng_ops.hash_uniform(seed0, ids_t, jnp.int32(1))
        d_init = pathtracer.new_direction(params, d, u0, u1)
    else:
        d_init = d
    mean, m2, count = pathtracer._scatter_loop_deferred(
        params,
        rstatic,
        o,
        d_init,
        jnp.ones((bucket * replicas,), bool),
        seed0,
        ids_t,
        jnp.int32(1),
        resample,
        n_samples=launches,
        respawn_seed_base=seed,
        respawn_sub0=sub0.astype(jnp.int32),
        resample_on_spawn=resample,
        spawn_dir=d if resample else None,
    )
    # Per-lane Welford → raw moments, then the replica axis sums away.
    # The ACTUAL folded count travels with the moments: a lane stopped by
    # the safety cap contributes fewer than ``launches`` experiments, and
    # normalizing by the scheduled count would silently bias the label.
    cnt, s1, s2 = welford_ops.to_moments(
        welford_ops.Welford(mean[:, 0], m2[:, 0], count)
    )
    return (
        cnt.reshape(replicas, bucket).sum(axis=0),
        s1.reshape(replicas, bucket).sum(axis=0),
        s2.reshape(replicas, bucket).sum(axis=0),
    )


def _radiance_update(
    params: SceneParams,
    static: SceneStatic,
    entry: jnp.ndarray,
    direction: jnp.ndarray,
    rids: jnp.ndarray,
    base_count: jnp.ndarray,
    seed: jnp.ndarray,
    *,
    replicas: int,
    launches: int,
) -> welford_ops.Welford:
    """One collector update: ``replicas * launches`` fresh experiments per
    point as chunked megabatch launches; the replica merge of the reference
    (PointRadianceTask.h:54-68) becomes a moments sum.

    The RNG stream is keyed by (seed, sample id, global experiment index =
    base_count + k) — the same index set as the reference's
    replica-by-launch grid, unique across updates and independent of how
    replicas were densified, so results are restartable and
    schedule-stable.

    The lane buffer is ``bucket * replicas`` (the reference's thread budget,
    ~20k), each lane regenerating through its ``launches`` experiments —
    bounded per-call work by construction, no ray-count chunking needed."""
    count, s1, s2 = _radiance_launch(
        params,
        static,
        entry,
        direction,
        rids,
        base_count,
        seed,
        replicas=replicas,
        launches=launches,
    )
    return welford_ops.from_moments(count, s1, s2)


def estimate_point_radiance(
    params: SceneParams,
    static: SceneStatic,
    positions: jnp.ndarray,
    directions: jnp.ndarray,
    cfg: PointRadianceConfig = PointRadianceConfig(),
    seed: int = 0,
    max_updates: int = 200,
    verbose: bool = False,
    state_path: str | None = None,
    save_every: int = 10,
) -> RadianceEstimate:
    """Monte-Carlo ground-truth labels with CI-gated convergence and the
    reference's reschedule/densify loop (RadianceCollector.cpp:105-141,178):

    - after each update, converged points leave the schedule FOREVER (their
      experiment counts freeze — no re-tracing of done work);
    - the full thread budget (``cfg.max_threads``, 20,480 by default) is
      re-divided among the survivors (``taskRepeatCount = budget / todo``),
      so stragglers — in particular black samples, which need
      > ``black_min_experiments`` (1e5) experiments before they may pass
      (RadianceCollector.cpp:112-118) — receive densifying replicas and
      actually converge under default gates.

    ``positions`` are world-centered (as stored by the sample generator).
    Persistent Welford state lives on host (numpy); each device update
    returns only the fresh-experiment contribution for the active set,
    padded to a power-of-two bucket so recompiles are O(log n), not O(n).

    ``state_path`` checkpoints the host state every ``save_every`` updates
    (atomic npz) and resumes from it — the RNG stream is keyed by absolute
    experiment index, so a resumed run continues the exact experiment
    sequence.  A wedged/killed run then loses at most ``save_every``
    updates instead of the whole scene (tools/eval_supervisor.sh relies on
    this).  The caller removes the file once the labels are durably
    stored (tasks.collect, after the Result batch_append).
    """
    import os

    n = positions.shape[0]
    rstatic = _radiance_static(static)
    entry = np.asarray(positions + 0.5 * params.bbox_size, np.float32)
    dirs = np.asarray(directions, np.float32)

    mean = np.zeros(n, np.float32)
    m2 = np.zeros(n, np.float32)
    # Welford weights stay float; the authoritative experiment counter is
    # int64 (float32 goes inexact past 2^24 experiments, which would let
    # RNG experiment-index bases overlap across updates and correlate
    # samples on stubborn unconverged points).
    count = np.zeros(n, np.float32)
    count_int = np.zeros(n, np.int64)
    converged = np.zeros(n, bool)
    eps = np.finfo(np.float32).eps
    r0 = 0
    if state_path and os.path.exists(state_path):
        st = np.load(state_path)
        if st["n"] == n and st["seed"] == seed:
            mean, m2 = st["mean"], st["m2"]
            count, count_int = st["count"], st["count_int"]
            converged = st["converged"]
            r0 = int(st["update"])
            if verbose:
                print(
                    f"radiance resume: update {r0}, "
                    f"{int((~converged).sum())} unconverged",
                    flush=True,
                )

    def save_state(r):
        tmp = state_path + ".tmp.npz"
        np.savez(
            tmp, n=n, seed=seed, update=r, mean=mean, m2=m2, count=count,
            count_int=count_int, converged=converged,
        )
        os.replace(tmp, state_path)

    active = np.arange(n)[~converged]
    seed_arr = jnp.uint32(seed)
    schedule = []
    for r in range(r0, max_updates):
        if active.size == 0:
            break
        bucket = _bucket_size(active.size)
        replicas = max(1, cfg.max_threads // bucket)
        schedule.append((int(active.size), replicas))
        # Pad with duplicates of the first survivor; padded slots are
        # traced but their contributions are discarded below.
        idx = active
        if bucket > active.size:
            idx = np.concatenate(
                [active, np.full(bucket - active.size, active[0])]
            )
        contrib = _radiance_update(
            params,
            rstatic,
            jnp.asarray(entry[idx]),
            jnp.asarray(dirs[idx]),
            jnp.asarray(idx.astype(np.uint32)),
            jnp.asarray((count_int[idx] & 0xFFFFFFFF).astype(np.uint32)),
            seed_arr,
            replicas=replicas,
            launches=cfg.launches_per_update,
        )
        k = active.size
        c_mean = np.asarray(contrib.mean)[:k]
        c_m2 = np.asarray(contrib.m2)[:k]
        c_count = np.asarray(contrib.count)[:k]
        expected = float(replicas * cfg.launches_per_update)
        if not np.all(c_count == expected):
            short = int((c_count != expected).sum())
            print(
                f"radiance warning: {short} lanes folded "
                f"{c_count.min():.0f}..{c_count.max():.0f} experiments "
                f"(scheduled {expected:.0f}) — safety cap tripped; "
                "labels normalize by the actual count",
                flush=True,
            )

        # Host-side Welford merge into the persistent per-point state.
        tot = count[active] + c_count
        safe = np.maximum(tot, 1.0)
        delta = c_mean - mean[active]
        mean[active] += delta * (c_count / safe)
        m2[active] += c_m2 + delta**2 * (count[active] * c_count / safe)
        count[active] = tot
        count_int[active] += replicas * cfg.launches_per_update

        # Convergence gates (RadianceCollector.cpp:112-118): rel CI < 2e-2
        # or abs CI < 1e-4; black samples instead require surviving the
        # experiment budget.
        nsafe = np.maximum(count[active], 1.0)
        ci = 1.96 * np.sqrt(m2[active] / nsafe) / np.sqrt(nsafe)
        conv = (ci / (mean[active] + eps) < cfg.rel_tol) | (ci < cfg.abs_tol)
        black = mean[active] < eps
        conv = np.where(
            black, count_int[active] > cfg.black_min_experiments, conv
        )
        converged[active] = conv
        active = active[~conv]
        if verbose:
            print(
                f"radiance update {r}: {active.size} unconverged "
                f"(replicas {replicas} x launches {cfg.launches_per_update})",
                flush=True,
            )
        if state_path and (r + 1) % save_every == 0:
            save_state(r + 1)
    # The state file stays until the CALLER has durably stored the labels
    # (tasks.collect removes it after the Result batch_append): a crash
    # between estimate and store write must resume, not restart.
    return RadianceEstimate(mean, converged, count_int, tuple(schedule))


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
