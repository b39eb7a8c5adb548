"""The baked light-probe renderer ("BNN") — the Faster-RPNN fast path.

Capability parity with the reference's BakedRenderer + Baker
(DG/src/Scene/Cameras/BakedRenderer.cpp, lightProbeBaker.cu,
lightProbeMaterial.cu, bakedCamera.cu, LightProbe.{h,cuh}):

- **bake**: a probe lattice with one probe every 6 mean free paths per axis,
  ``ceil(size_in_mfp / 6) + 1`` probes per axis (BakedRenderer.cpp:48-49);
  at each probe the 9-layer hierarchical descriptor is gathered with the
  fixed canonical direction (0, 0, 1) (lightProbeBaker.cu:17-24), pushed
  through the LightProbeModel, and the 200-dim sigmoid latent is quantized
  ``x*256 → uint8`` (BakedRenderer.cpp:113-120);
- **render**: two-pass conditional scatter (shared with the RPNN path), then
  tetrahedral-barycentric interpolation of the 4 enclosing probes
  (LightProbe.cuh:134-180, dequantized /256), the angles ω (view∠light) and
  α (signed angle between view-based and canonical descriptor bases,
  lightProbeMaterial.cu:66-84), a 3-layer realtime descriptor with ω
  appended, the ProbeRendererModel, and the same
  ``(predicted + direct) * (1 - T)`` composite.

TPU-native shape: the reference bakes z-slice by z-slice with a
GPU→libtorch→CPU→GPU round trip per slice (BakedRenderer.cpp:98-122); here
the whole lattice is one batched jit call (descriptor gather + MLP fused by
XLA) and the bake result stays on device.  The render is one megabatch
program — no 512x256 tiling, no host sync.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..models.probes import LightProbeModel, ProbeRendererModel
from ..ops import descriptor as desc_ops
from ..ops import tetra as tetra_ops
from ..scene import SceneParams, SceneStatic
from . import camera as camera_ops
from . import neural

#: Lattice spacing in mean free paths (LightProbe.h:11).
STEP_IN_MEAN_FREE_PATH = 6.0
#: Latent width (LightProbe.h:13).
PROBE_LENGTH = 200
#: Canonical probe direction (lightProbeBaker.cu:19).
PROBE_DIRECTION = (0.0, 0.0, 1.0)


def probe_lattice_shape(static: SceneStatic, bbox_size) -> Tuple[int, int, int]:
    """Probes per axis (x, y, z): ceil(size_in_mfp / 6) + 1
    (BakedRenderer.cpp:48-49)."""
    sizes_mfp = [float(b) * static.density_multiplier for b in bbox_size]
    return tuple(
        int(math.ceil(s / STEP_IN_MEAN_FREE_PATH)) + 1 for s in sizes_mfp
    )


def probe_positions(static: SceneStatic, lattice: Tuple[int, int, int]) -> jnp.ndarray:
    """Local-coordinate positions of every probe, [P, 3] with P = px*py*pz,
    x fastest (the baker's (launchID.x, launchID.y, posZ) order)."""
    px, py, pz = lattice
    spacing = STEP_IN_MEAN_FREE_PATH / static.density_multiplier
    xs = jnp.arange(px, dtype=jnp.float32)
    ys = jnp.arange(py, dtype=jnp.float32)
    zs = jnp.arange(pz, dtype=jnp.float32)
    zz, yy, xx = jnp.meshgrid(zs, ys, xs, indexing="ij")
    return jnp.stack([xx, yy, zz], axis=-1).reshape(-1, 3) * spacing


def bake_probes(
    params: SceneParams,
    static: SceneStatic,
    model: LightProbeModel,
    variables: Any,
    lattice: Tuple[int, int, int],
    chunk: int = 4096,
    quantize: bool = True,
) -> jnp.ndarray:
    """Bake the full probe lattice → [pz, py, px, 200] (uint8 if quantized).

    One fused jit program per chunk of probes; the descriptor uses the fixed
    canonical direction so every probe is light-axis aligned.
    """
    positions = probe_positions(static, lattice)
    frame_dir = jnp.broadcast_to(
        jnp.asarray(PROBE_DIRECTION, jnp.float32), (chunk, 3)
    )

    @jax.jit
    def bake_chunk(params, variables, pos):
        # params/variables enter as ARGUMENTS: a closed-over 256^3 mip
        # pyramid would embed hundreds of MB of HLO constants (HTTP 413
        # through the tunneled backend).
        layers = desc_ops.gather_descriptor(
            params,
            static,
            pos,
            frame_dir,
            n_layers=desc_ops.LIGHTPROBE_LAYERS,
            frame_dir=frame_dir,
        )
        latent = model.apply(variables, layers)  # [chunk, 200] in (0, 1)
        if quantize:
            # x*256 → uint8, saturating (BakedRenderer.cpp:113-116).
            return jnp.clip(latent * 256.0, 0.0, 255.0).astype(jnp.uint8)
        return latent

    n = positions.shape[0]
    outs = []
    for start in range(0, n, chunk):
        pos = positions[start : start + chunk]
        if pos.shape[0] < chunk:  # pad the tail to keep one compiled shape
            pad = chunk - pos.shape[0]
            pos = jnp.concatenate([pos, jnp.zeros((pad, 3), jnp.float32)])
            outs.append(bake_chunk(params, variables, pos)[: chunk - pad])
        else:
            outs.append(bake_chunk(params, variables, pos))
    probes = jnp.concatenate(outs, axis=0)
    px, py, pz = lattice
    return probes.reshape(pz, py, px, PROBE_LENGTH)


def interpolate_probes(
    probes: jnp.ndarray,
    static: SceneStatic,
    pos: jnp.ndarray,
) -> jnp.ndarray:
    """Tetrahedral-barycentric probe interpolation at local positions
    ``pos`` [N, 3] → [N, 200] float latents (LightProbe.cuh:134-180, lerp
    dequantizes the uint8 latents by /256)."""
    pz, py, px, _ = probes.shape
    units = pos * (static.density_multiplier / STEP_IN_MEAN_FREE_PATH)
    corners, weights = tetra_ops.probe_interpolation(units)  # [N,4,3], [N,4]
    cx = jnp.clip(corners[..., 0], 0, px - 1)
    cy = jnp.clip(corners[..., 1], 0, py - 1)
    cz = jnp.clip(corners[..., 2], 0, pz - 1)
    flat = probes.reshape(-1, PROBE_LENGTH)
    idx = (cz * py + cy) * px + cx  # [N, 4]
    latents = jnp.take(flat, idx, axis=0, mode="clip")  # [N, 4, 200]
    if probes.dtype == jnp.uint8:
        latents = latents.astype(jnp.float32) / 256.0
    return (latents * weights[..., None]).sum(axis=1)


def alpha_canonical(params: SceneParams, directions: jnp.ndarray) -> jnp.ndarray:
    """α between the view-based and canonical probe bases
    (lightProbeMaterial.cu:66-84; same convention as the training side,
    BakedDataset.py:56-69 via ops.descriptor.alpha_angle)."""
    probe_dir = jnp.broadcast_to(
        jnp.asarray(PROBE_DIRECTION, jnp.float32), directions.shape
    )
    return desc_ops.alpha_angle(params.light_dir, directions, probe_dir)


def shade_baked(
    params: SceneParams,
    static: SceneStatic,
    model: ProbeRendererModel,
    variables: Any,
    probes: jnp.ndarray,
    pos: jnp.ndarray,
    dirs: jnp.ndarray,
) -> jnp.ndarray:
    """Probe interpolation + ω/α + 3-layer realtime descriptor +
    ProbeRendererModel forward at shading points ``pos`` viewed along
    ``dirs`` → predicted radiance [N].  Pure per-row math: safe on a
    scatter-compacted subset (lightProbeMaterial.cu:26-87)."""
    latent = interpolate_probes(probes, static, pos)  # [N, 200]
    omega = desc_ops.omega_angle(params.light_dir, dirs)
    alpha = alpha_canonical(params, dirs)
    probe_in = jnp.concatenate(
        [latent, omega[:, None], alpha[:, None]], axis=-1
    )  # [N, 202]
    layers = desc_ops.gather_descriptor(
        params,
        static,
        pos,
        dirs,
        n_layers=desc_ops.BAKED_REALTIME_LAYERS,
    )
    realtime = desc_ops.with_angle(layers, omega)  # [N, 3, 226]
    return model.apply(variables, probe_in, realtime)[:, 0]


def render_baked(
    params: SceneParams,
    static: SceneStatic,
    model: ProbeRendererModel,
    variables: Any,
    probes: jnp.ndarray,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    seed: int | jnp.ndarray = 0,
    ray_ids: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """One baked-probe neural render of a ray batch → radiance [N, 3]."""
    n = origins.shape[0]
    if ray_ids is None:
        ray_ids = jnp.arange(n, dtype=jnp.uint32)
    seed = jnp.asarray(seed, jnp.uint32)
    hit, t_hit = camera_ops.intersect_box(
        origins, directions, static, params.bbox_size
    )
    entry = origins + directions * t_hit[:, None] + 0.5 * params.bbox_size
    cs = neural.conditional_scatter(
        params, static, entry, directions, hit, seed, ray_ids
    )
    predicted = shade_baked(
        params, static, model, variables, probes, cs.scatter_pos, directions
    )
    predicted = jnp.where(cs.has_scattered, predicted, 0.0)
    miss = camera_ops.miss_radiance(params, static, directions)
    return neural.composite(predicted, cs, miss, hit)


class BakedRenderer:
    """Two-network renderer (the reference's BakedRenderer): bakes the probe
    lattice once at init, then renders frames with the realtime network."""

    def __init__(
        self,
        params: SceneParams,
        static: SceneStatic,
        probe_model: LightProbeModel,
        probe_variables: Any,
        renderer_model: ProbeRendererModel,
        renderer_variables: Any,
        quantize_probes: bool = True,
    ):
        self.renderer_model = renderer_model
        self.renderer_variables = renderer_variables
        self.lattice = probe_lattice_shape(static, params.bbox_size.tolist())
        self.probes = bake_probes(
            params, static, probe_model, probe_variables, self.lattice,
            quantize=quantize_probes,
        )
        self._camera = neural.CompactCamera()
        self._shade = jax.jit(
            shade_baked, static_argnames=("static", "model")
        )

    #: Shade pixels per compiled launch (bounds the 3-layer descriptor
    #: gather transient; the camera marches run whole-frame).
    TILE = 32768

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
        predicted = neural.shade_compacted(
            lambda p, d: self._shade(
                params, static, self.renderer_model, self.renderer_variables,
                self.probes, p, d,
            ),
            cs,
            directions,
            self.TILE,
        )
        out = neural.composite(predicted, cs, miss, hit)
        return out.reshape(height, width, 3)
