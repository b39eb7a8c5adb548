"""Hierarchical density descriptors — the RPNN input featurizer.

Capability parity with the reference's descriptor gather
(DG/src/CUDA/DisneyDescriptor.cuh:72-112, layout DisneyDescriptor.h:8-33):

- a light-oriented frame: ``eZ = -light``, ``eX = norm(eZ × view)``,
  ``eY = eX × eZ``;
- L layers of 5×5×9 samples at offsets x,y ∈ [-2,2], z ∈ [-2,6] in layer
  units (box corners [-1,-1,-1]..[1,1,3]);
- layer 0 spacing = half a mean free path (0.5 / density_multiplier in
  normalized units), doubling per layer;
- sampled at mip level ``-log2(voxel_size_in_mfp) - 1``, +1 per layer —
  sample spacing matched to mip cell size;
- densities faded linearly to 0 outside the box over one mip-voxel
  (DisneyDescriptor.cuh:96-102).

TPU-native shape: the 225 offsets per layer are a static constant; all
shading points gather in one batched ``sample_mip`` call per layer (the mip
level is static because cloud size is config).  Result: [N, L, 225] —
exactly the z-layers the Flax models consume.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..scene import SceneParams, SceneStatic
from . import grid as grid_ops

LAYER_NX = 5
LAYER_NY = 5
LAYER_NZ = 9
LAYER_SIZE = LAYER_NX * LAYER_NY * LAYER_NZ  # 225
DISNEY_LAYERS = 10
BAKED_REALTIME_LAYERS = 3
LIGHTPROBE_LAYERS = 9


def _layer_offsets() -> np.ndarray:
    """[225, 3] static offsets in layer units, sample-id order x fastest,
    then y, then z (DisneyDescriptor.cuh:86-106)."""
    out = np.empty((LAYER_SIZE, 3), np.float32)
    i = 0
    for z in range(-2, 7):
        for y in range(-2, 3):
            for x in range(-2, 3):
                out[i] = (x, y, z)
                i += 1
    return out


_OFFSETS = _layer_offsets()


def light_frame(light_dir: jnp.ndarray, view_dir: jnp.ndarray):
    """The light-oriented descriptor basis (DisneyDescriptor.cuh:74-76).
    ``view_dir`` [N, 3]; ``light_dir`` is a single [3] vector or a per-row
    [N, 3] batch (the training datasets mix scenes with different lights);
    returns (eX, eY, eZ) each [N, 3].

    The norm is PER ROW (axis=-1): a global Frobenius norm over an [N, 3]
    batch scaled eZ by 1/sqrt(N), which collapsed the dataset-path α angle
    to ±π/2 via the doubly-scaled eY dot product (round-5 bug fix, caught
    by tests/test_device_train.py's host/device equality check)."""
    ez = -light_dir / jnp.linalg.norm(light_dir, axis=-1, keepdims=True)
    ez = jnp.broadcast_to(ez, view_dir.shape)
    ex = jnp.cross(ez, view_dir)
    ex = ex / jnp.maximum(jnp.linalg.norm(ex, axis=-1, keepdims=True), 1e-12)
    ey = jnp.cross(ex, ez)
    return ex, ey, ez


def distance_to_box(
    pos: jnp.ndarray, bbox_size: jnp.ndarray, voxel_size: float
) -> jnp.ndarray:
    """Distance outside the (shrunk-by-half-a-voxel) box
    (DisneyDescriptor.cuh:48-55); pos [..., 3] local coords."""
    dist = jnp.abs(pos - bbox_size * 0.5)
    corner = jnp.maximum(bbox_size * 0.5 - voxel_size * 0.5, 0.0)
    dist = jnp.maximum(dist - corner, 0.0)
    return jnp.linalg.norm(dist, axis=-1)


def base_mip_level(static: SceneStatic) -> float:
    """-log2(voxel size in MFP) - 1 (DisneyDescriptor.cuh:83)."""
    return -float(np.log2(static.voxel_size_in_mfp)) - 1.0


def gather_descriptor(
    params: SceneParams,
    static: SceneStatic,
    world_pos: jnp.ndarray,
    view_dir: jnp.ndarray,
    n_layers: int = DISNEY_LAYERS,
    frame_dir: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Hierarchical descriptor at ``world_pos`` (local coords [0, bbox]).

    ``view_dir`` [N, 3] orients the frame; ``frame_dir`` overrides it (the
    light-probe baker uses the fixed direction (0, 0, 1),
    lightProbeBaker.cu:17-24).  Returns [N, L, 225] float in [0, 1].
    """
    d = view_dir if frame_dir is None else frame_dir
    ex, ey, ez = light_frame(params.light_dir, d)
    offsets = jnp.asarray(_OFFSETS)  # [225, 3]

    scale = 0.5 / static.density_multiplier
    mip = base_mip_level(static)
    layers = []
    for _ in range(n_layers):
        mip_voxel = (2.0 ** max(mip, 0.0)) * static.voxel_size_normalized
        # [N, 225, 3] sample positions.
        off = (
            ex[:, None, :] * offsets[None, :, 0:1]
            + ey[:, None, :] * offsets[None, :, 1:2]
            + ez[:, None, :] * offsets[None, :, 2:3]
        ) * scale
        pos = world_pos[:, None, :] + off
        u = pos / params.bbox_size
        # NOTE (round 5, negative result — measured, tools/perf_decompose
        # --neural): brick-3 mip tables for the featurizer (64 B aligned
        # rows, 3x smaller tables — the march's winning layout) are 15x
        # SLOWER here: the fetched 64-wide lattice must be reduced to the
        # sample's 8 corners per sample, and both reduction forms lose —
        # the one-hot/einsum extraction burns VPU + blows the transient to
        # ~1 GB/level at the render tile (OOM until chunked, 4.3 s vs
        # 0.29 s chunked), and per-lane dynamic indexing lowers to another
        # gather.  The march wins with bricks because SUBSTEPS reuse one
        # fetched row; descriptor samples are isolated points, so the
        # packed-corner row IS the right fetch.  Helpers remain in
        # ops.grid (sample_mip_bricks) with the bitwise-equality test.
        density = grid_ops.sample_mip(params.density_mips, u, max(mip, 0.0))
        # Fade to zero outside the box over one mip voxel.
        t = jnp.clip(distance_to_box(pos, params.bbox_size, mip_voxel) / mip_voxel, 0.0, 1.0)
        layers.append(density * (1.0 - t))
        scale *= 2.0
        mip += 1.0
    return jnp.stack(layers, axis=1)


def quantize_u8(descriptor: jnp.ndarray) -> jnp.ndarray:
    """Storage quantization (DisneyDescriptor.cuh TFromFloat<uint8_t>:
    truncate f*255); the network consumes uint8/256
    (DisneyDescriptor.h LightMapNetworkInput::fill, LmdbDataset /256)."""
    return (descriptor * 255.0).astype(jnp.uint8)


def dequantize_u8(stored: jnp.ndarray) -> jnp.ndarray:
    """Train/infer-time dequantization: /256 (DisneyDataset.py:33)."""
    return stored.astype(jnp.float32) / 256.0


def omega_angle(light_dir: jnp.ndarray, view_dir: jnp.ndarray) -> jnp.ndarray:
    """The ω angle appended to each realtime layer: angle between the light
    direction and the viewing ray (disneyCamera.cu:33, DisneyDataset.py:35-37)."""
    d = (light_dir * view_dir).sum(axis=-1)
    return jnp.arccos(jnp.clip(d, -1.0, 1.0))


def with_angle(descriptor: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Append ω to every layer: [N, L, 225] + [N] → [N, L, 226]."""
    n, l, _ = descriptor.shape
    a = jnp.broadcast_to(angle[:, None, None], (n, l, 1))
    return jnp.concatenate([descriptor, a], axis=-1)


def alpha_angle(
    light_dir: jnp.ndarray, view_dir: jnp.ndarray, probe_dir: jnp.ndarray
) -> jnp.ndarray:
    """The α angle: signed angle between the descriptor bases built from the
    view direction vs the probe (canonical) direction, about the light axis
    (BakedDataset.py:56-69, lightProbeMaterial.cu:66-84).

    Both bases share eZ = -light; α = signedAngleBetween(eY_view, eY_probe,
    eZ) exactly as Vector.py:22-27 (negative when dot(eZ, eY_view × eY_probe)
    < 0).
    """
    _, ey_v, ez = light_frame(light_dir, view_dir)
    _, ey_p, _ = light_frame(light_dir, probe_dir)
    cos_a = jnp.clip((ey_v * ey_p).sum(-1), -1.0, 1.0)
    sign = jnp.where((jnp.cross(ey_v, ey_p) * ez).sum(-1) < 0.0, -1.0, 1.0)
    return jnp.arccos(cos_a) * sign
