"""Neural renderers: the RPNN ("NN") path, fused descriptor-gather + MLP.

Capability parity with the reference's DisneyRenderer
(DG/src/Scene/Cameras/DisneyRenderer.cpp + disneyCamera.cu +
disneyDescriptorMaterial.cu):

- two-pass conditional scatter: march once for the total transmittance T,
  then draw the scatter point from ``optical_distance = 1 - u * (1 - T)``
  (importance-sampled *given* scattering, disneyDescriptorMaterial.cu:29-30);
- direct radiance = NEE at the scatter point with the full Mie phase;
- 10-layer hierarchical descriptor + the view∠light angle ω appended to
  every layer (disneyCamera.cu:31-35);
- composite ``pixel = (predicted + direct) * (1 - T)`` for scattered rays
  (disneyCamera.cu:38-46); non-scattering box hits stay black; misses shade
  sun/sky exactly like the path tracer.

TPU-native shape: where the reference ping-pongs between OptiX launches and
a TorchScript ``forward`` through zero-copy aliased buffers
(DisneyRenderer.cpp:30-35,78-100), here the march, the 2,250-gather
descriptor and the RPNN MLP are ONE jit-compiled program — XLA fuses the
featurizer into the batched MXU matmuls and no host round-trip exists.  The
reference's 128x128 tiling + host "did anything scatter" early-out
(DisneyRenderer.cpp:84-94) is unnecessary: the whole frame is one megabatch.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..models.rpnn import DisneyModel
from ..ops import descriptor as desc_ops
from ..ops import march as march_ops
from ..ops import rng as rng_ops
from ..scene import SceneParams, SceneStatic, is_in_box
from . import camera as camera_ops
from . import pathtracer


class ConditionalScatter(NamedTuple):
    """Per-ray result of the neural-path camera march."""

    transmittance: jnp.ndarray  # [N] total T through the cloud
    scatter_pos: jnp.ndarray  # [N, 3] local coords
    has_scattered: jnp.ndarray  # [N] bool
    direct: jnp.ndarray  # [N, 3] NEE radiance at the scatter point


def conditional_scatter(
    params: SceneParams,
    static: SceneStatic,
    entry_pos: jnp.ndarray,
    directions: jnp.ndarray,
    hit: jnp.ndarray,
    seed: jnp.ndarray,
    ray_ids: jnp.ndarray,
) -> ConditionalScatter:
    """The shared neural-renderer camera logic
    (disneyDescriptorMaterial.cu:14-46 / lightProbeMaterial.cu:26-87):
    total transmittance, conditional scatter draw, NEE direct radiance.

    Both passes run the PIPELINED march (march_pipeline=True; round 5):
    with ``stop_at_scatter=False`` the loop's liveness and fetch cursor are
    pure ray geometry, so XLA overlaps consecutive iterations' row gathers
    — the camera march was the measured 3x-serialized half of the neural
    frame (docs/PERFORMANCE.md breakdown).  Pass 2 therefore marches to
    the box exit instead of stopping at its scatter event; the recorded
    first-crossing position and flag are bit-identical either way (the
    crossing test gates on ``~scattered``), and the extra post-scatter
    steps are cheaper than the serialization they remove."""
    pstatic = dataclasses.replace(static, march_pipeline=True)
    # Pass 1: full march for total transmittance (optical_distance = 0 can
    # never trigger a scatter, mirroring getNextScatteringEvent(..., false)).
    zero_od = jnp.zeros_like(hit, jnp.float32)
    full = march_ops.next_scattering_event(
        params, pstatic, zero_od, entry_pos, directions, stop_at_scatter=False
    )
    trans = full.transmittance
    # Pass 2: scatter point importance-sampled given that scattering occurs.
    u = rng_ops.hash_uniform(seed, ray_ids, jnp.int32(0))
    od = 1.0 - u * (1.0 - trans)
    scatter = march_ops.next_scattering_event(
        params, pstatic, od, entry_pos, directions, stop_at_scatter=False
    )
    ok = (
        hit
        & scatter.has_scattered
        & is_in_box(scatter.scatter_pos, params.bbox_size)
    )
    direct = pathtracer.in_scattering(
        params, static, scatter.scatter_pos, directions, chopped=False
    )
    direct = jnp.where(ok[:, None], direct, 0.0)
    return ConditionalScatter(trans, scatter.scatter_pos, ok, direct)


def composite(
    predicted: jnp.ndarray,
    cs: ConditionalScatter,
    miss: jnp.ndarray,
    hit: jnp.ndarray,
) -> jnp.ndarray:
    """``(predicted + direct) * (1 - T)`` for scattered rays; black for
    non-scattering hits; sun/sky for misses (disneyCamera.cu:38-46)."""
    scattered_rgb = (predicted[:, None] + cs.direct) * (
        1.0 - cs.transmittance[:, None]
    )
    out = jnp.where(cs.has_scattered[:, None], scattered_rgb, 0.0)
    return jnp.where(hit[:, None], out, miss)


def disney_network_inputs(
    params: SceneParams,
    static: SceneStatic,
    cs: ConditionalScatter,
    directions: jnp.ndarray,
) -> jnp.ndarray:
    """[N, 10, 226] RPNN inputs: descriptor layers + appended ω
    (disneyCamera.cu:31-35).  Layers are gathered at the scatter position in
    float (network) precision — no uint8 round trip on the fused path."""
    layers = desc_ops.gather_descriptor(
        params,
        static,
        cs.scatter_pos,
        directions,
        n_layers=desc_ops.DISNEY_LAYERS,
    )
    omega = desc_ops.omega_angle(params.light_dir, directions)
    return desc_ops.with_angle(layers, omega)


def camera_pass(
    params: SceneParams,
    static: SceneStatic,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    seed: jnp.ndarray,
    ray_ids: jnp.ndarray,
):
    """Whole-frame neural camera: box test, the two pipelined conditional-
    scatter marches, NEE direct light, and miss shading — everything the
    shade stage does NOT need per-pixel-count knowledge for.  Returns
    ``(cs, hit, miss)``."""
    hit, t_hit = camera_ops.intersect_box(
        origins, directions, static, params.bbox_size
    )
    entry = origins + directions * t_hit[:, None] + 0.5 * params.bbox_size
    cs = conditional_scatter(
        params, static, entry, directions, hit, seed, ray_ids
    )
    miss = camera_ops.miss_radiance(params, static, directions)
    return cs, hit, miss


def shade_disney(
    params: SceneParams,
    static: SceneStatic,
    model: DisneyModel,
    variables: Any,
    pos: jnp.ndarray,
    dirs: jnp.ndarray,
) -> jnp.ndarray:
    """Descriptor + RPNN forward for shading points ``pos`` viewed along
    ``dirs`` → predicted radiance [N].  Pure per-row math: safe to run on a
    scatter-compacted subset of a frame."""
    layers = desc_ops.gather_descriptor(
        params, static, pos, dirs, n_layers=desc_ops.DISNEY_LAYERS
    )
    omega = desc_ops.omega_angle(params.light_dir, dirs)
    inputs = desc_ops.with_angle(layers, omega)
    return model.apply(variables, inputs)[:, 0]


def compact_apply(mask: jnp.ndarray, arrays, fn: Any, tile: int):
    """Run ``fn`` only on the rows where ``mask`` holds.

    Fetches the count (ONE host-synced scalar), gathers the masked rows of
    every array in ``arrays`` into ceil(count/tile) dense tiles of a
    single compiled shape, applies ``fn`` per tile, and concatenates.
    Returns ``(idx, out, count)`` — scatter results back with
    ``template.at[idx].set(values, mode="drop")`` (pad indices are ``n``,
    out of range, and drop) — or ``(None, None, 0)`` when the mask is
    empty.  ``fn`` may return an array or a tuple of arrays.
    """
    n = mask.shape[0]
    count = int(jnp.count_nonzero(mask))
    if count == 0:
        return None, None, 0
    k = -(-count // tile) * tile
    idx = jnp.nonzero(mask, size=k, fill_value=n)[0]
    safe = jnp.minimum(idx, n - 1)
    gathered = [jnp.take(a, safe, axis=0) for a in arrays]
    outs = [
        fn(*(g[s : s + tile] for g in gathered)) for s in range(0, k, tile)
    ]
    if isinstance(outs[0], tuple):
        out = tuple(
            o[0] if len(outs) == 1 else jnp.concatenate(o)
            for o in zip(*outs)
        )
    else:
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
    return idx, out, count


def shade_compacted(
    shade_one: Any,
    cs: ConditionalScatter,
    directions: jnp.ndarray,
    tile: int,
) -> jnp.ndarray:
    """Run the shade stage only where the camera actually scattered.

    The reference does a host-side "did anything scatter" early-out per
    tile (DisneyRenderer.cpp:84-94); this is that check promoted to a
    compaction.  A typical frame is mostly sky/edge pixels, so the
    descriptor gather + MLP — the measured dominant terms of the neural
    frame (PERF_r05.json neural_per_component) — run on a fraction of the
    pixel buffer.  Per-pixel values are identical to shading the full
    buffer: every shade op is row-independent.
    """
    n = directions.shape[0]
    idx, pred, _ = compact_apply(
        cs.has_scattered, (cs.scatter_pos, directions), shade_one, tile
    )
    if idx is None:
        return jnp.zeros((n,), jnp.float32)
    return jnp.zeros((n,), jnp.float32).at[idx].set(pred, mode="drop")


def box_pass(
    params: SceneParams,
    static: SceneStatic,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
):
    """Whole-frame geometry-only camera stage: box hit test, entry points,
    miss radiance.  No marching — the marches run compacted."""
    hit, t_hit = camera_ops.intersect_box(
        origins, directions, static, params.bbox_size
    )
    entry = origins + directions * t_hit[:, None] + 0.5 * params.bbox_size
    miss = camera_ops.miss_radiance(params, static, directions)
    return hit, entry, miss


def march_pass1(
    params: SceneParams,
    static: SceneStatic,
    entry: jnp.ndarray,
    dirs: jnp.ndarray,
) -> jnp.ndarray:
    """Total-transmittance march of a (compacted) ray batch
    (getNextScatteringEvent with optical distance 0 — never scatters)."""
    pstatic = dataclasses.replace(static, march_pipeline=True)
    zero_od = jnp.zeros(entry.shape[:1], jnp.float32)
    full = march_ops.next_scattering_event(
        params, pstatic, zero_od, entry, dirs, stop_at_scatter=False
    )
    return full.transmittance


def march_pass2(
    params: SceneParams,
    static: SceneStatic,
    entry: jnp.ndarray,
    dirs: jnp.ndarray,
    seed: jnp.ndarray,
    ray_ids: jnp.ndarray,
    trans: jnp.ndarray,
):
    """Conditional scatter draw + NEE for a (compacted) ray batch: the
    scatter point from ``od = 1 - u(1 - T)`` (disneyDescriptorMaterial.cu:
    29-30, keyed by GLOBAL ray id so compaction cannot change draws) and
    the direct radiance at it."""
    pstatic = dataclasses.replace(static, march_pipeline=True)
    u = rng_ops.hash_uniform(seed, ray_ids, jnp.int32(0))
    od = 1.0 - u * (1.0 - trans)
    scatter = march_ops.next_scattering_event(
        params, pstatic, od, entry, dirs, stop_at_scatter=False
    )
    ok = scatter.has_scattered & is_in_box(
        scatter.scatter_pos, params.bbox_size
    )
    direct = pathtracer.in_scattering(
        params, static, scatter.scatter_pos, dirs, chopped=False
    )
    direct = jnp.where(ok[:, None], direct, 0.0)
    return scatter.scatter_pos, ok, direct


class CompactCamera:
    """Host-coordinated compacted neural camera: march only rays that can
    contribute.

    Stage 1 (whole frame, geometry only): box test + miss shading.
    Stage 2 (compacted to box HITS): the total-transmittance march.
    Stage 3 (compacted to ``hit & T < 1``): the conditional-scatter march
    + NEE.  The od draw ``1 - u(1 - T)`` lies in ``(T, 1]``, so a ray
    scatters iff ``T < 1`` — the stage-3 mask is exact, not a heuristic.

    Produces the same ``(cs, hit, miss)`` as ``camera_pass`` (per-ray
    march math is row-independent and RNG keys on global ray ids), but
    the lockstep march buffers hold only contributing rays — sky pixels
    no longer occupy march lanes (lockstep cost scales with the BUFFER,
    docs/PERFORMANCE.md)."""

    #: Rays per compiled march launch (the measured optimal lane band,
    #: docs/PERFORMANCE.md).
    MARCH_TILE = 32768

    def __init__(self):
        self._box = jax.jit(box_pass, static_argnames=("static",))
        self._p1 = jax.jit(march_pass1, static_argnames=("static",))
        self._p2 = jax.jit(march_pass2, static_argnames=("static",))
        #: (n_rays, box hits, scatterable T<1) of the last frame — the
        #: compaction ratios that explain a frame's cost.
        self.last_counts = (0, 0, 0)

    def run(
        self,
        params: SceneParams,
        static: SceneStatic,
        origins: jnp.ndarray,
        directions: jnp.ndarray,
        seed: jnp.ndarray,
        ray_ids: jnp.ndarray,
    ):
        hit, entry, miss = self._box(params, static, origins, directions)
        n = origins.shape[0]
        trans = jnp.ones((n,), jnp.float32)
        pos = jnp.zeros((n, 3), jnp.float32)
        scat = jnp.zeros((n,), jnp.bool_)
        direct = jnp.zeros((n, 3), jnp.float32)
        idx, t_c, n_hit = compact_apply(
            hit,
            (entry, directions),
            lambda e, d: self._p1(params, static, e, d),
            self.MARCH_TILE,
        )
        n_scat = 0
        if idx is not None:
            trans = trans.at[idx].set(t_c, mode="drop")
            idx2, out2, n_scat = compact_apply(
                hit & (trans < 1.0),
                (entry, directions, ray_ids, trans),
                lambda e, d, i, t: self._p2(params, static, e, d, seed, i, t),
                self.MARCH_TILE,
            )
            if idx2 is not None:
                p_c, ok_c, d_c = out2
                pos = pos.at[idx2].set(p_c, mode="drop")
                scat = scat.at[idx2].set(ok_c, mode="drop")
                direct = direct.at[idx2].set(d_c, mode="drop")
        self.last_counts = (n, n_hit, n_scat)
        cs = ConditionalScatter(trans, pos, scat, direct)
        return cs, hit, miss


def render_disney(
    params: SceneParams,
    static: SceneStatic,
    model: DisneyModel,
    variables: Any,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    seed: int | jnp.ndarray = 0,
    ray_ids: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """One RPNN neural render of a ray batch → radiance [N, 3].

    Deterministic given ``seed`` (the reference reseeds per pixel with
    tea<4>(clock()) — here the conditional-scatter draw is keyed by ray id).
    """
    n = origins.shape[0]
    if ray_ids is None:
        ray_ids = jnp.arange(n, dtype=jnp.uint32)
    seed = jnp.asarray(seed, jnp.uint32)
    hit, t_hit = camera_ops.intersect_box(
        origins, directions, static, params.bbox_size
    )
    entry = origins + directions * t_hit[:, None] + 0.5 * params.bbox_size
    cs = conditional_scatter(params, static, entry, directions, hit, seed, ray_ids)
    predicted = shade_disney(
        params, static, model, variables, cs.scatter_pos, directions
    )
    # The RPNN predicts radiance given unit-scaled sun radiance 1e6
    # (DisneyModel.py:16-21): no rescale — intensity is baked into labels.
    predicted = jnp.where(cs.has_scattered, predicted, 0.0)
    miss = camera_ops.miss_radiance(params, static, directions)
    return composite(predicted, cs, miss, hit)


class DisneyRenderer:
    """Frame-level convenience wrapper (the reference's DisneyRenderer
    strategy object): holds the model variables and renders full frames.

    Round-5 frame schedule: a geometry-only whole-frame box pass, the two
    camera marches compacted to contributing rays (``CompactCamera``),
    then the descriptor + RPNN shade only the scatter-compacted pixels in
    fixed ``TILE`` chunks (``shade_compacted``)."""

    #: Shade pixels per compiled launch (~16k x 225 x 8 rows ≈ 1.8 GB
    #: descriptor-gather transient — the reason the shade stage tiles).
    TILE = 16384

    def __init__(self, model: DisneyModel, variables: Any):
        self.model = model
        self.variables = variables
        self._camera = CompactCamera()
        self._shade = jax.jit(
            shade_disney, static_argnames=("static", "model")
        )

    def render_frame(
        self,
        params: SceneParams,
        static: SceneStatic,
        width: int,
        height: int,
        basis: camera_ops.CameraBasis,
        seed: int = 0,
    ) -> jnp.ndarray:
        origins, directions = camera_ops.generate_rays(basis, width, height)
        ray_ids = jnp.arange(origins.shape[0], dtype=jnp.uint32)
        cs, hit, miss = self._camera.run(
            params, static, origins, directions, jnp.uint32(seed), ray_ids
        )
        predicted = shade_compacted(
            lambda p, d: self._shade(
                params, static, self.model, self.variables, p, d
            ),
            cs,
            directions,
            self.TILE,
        )
        out = composite(predicted, cs, miss, hit)
        return out.reshape(height, width, 3)
