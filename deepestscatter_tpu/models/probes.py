"""The baked light-probe model family.

Reference:
- ``LightProbeModel``   (TR/Baked/LightProbeModel.py:6-66): 9 DisneyBlocks
  consuming descriptor layers **in reverse (coarse→fine)**; head
  200→400→400→400→200 with a final Sigmoid so the 200-dim latent quantizes
  to uint8 for the probe lattice.
- ``ProbeRendererModel`` (TR/Baked/ProbeRenderModel.py:6-66): input FC
  202→200 + ReLU; 3 blocks over realtime descriptor layers (225 + ω = 226);
  head 200→100→100→1 with ReLU×2 + LeakyReLU.
- ``BakedModel``         (TR/Baked/BakedModel.py:9-79): end-to-end training
  composition — probe = Σᵢ powerᵢ · LightProbeModel(descᵢ) over the 4
  tetrahedron corners, concat (ω, α), then the renderer.
- ``MimicModel``         (TR/Mimic/MimicModel.py:7-43): single-probe variant
  (no tetrahedral interpolation) used as an experiment scaffold.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .blocks import DisneyBlock

LIGHT_PROBE_DIMENSION = 200
LIGHT_PROBE_DIMENSION_WITH_META = LIGHT_PROBE_DIMENSION + 2
BAKED_LAYERS = 9
REALTIME_LAYERS = 3


class LightProbeModel(nn.Module):
    output_dim: int = LIGHT_PROBE_DIMENSION
    block_count: int = BAKED_LAYERS
    block_dim: int = 200
    hidden_dim: int = 400
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z_layers: jnp.ndarray) -> jnp.ndarray:
        """z_layers: [B, block_count, 225] (no angle); returns [B, 200]
        sigmoid latent."""
        assert z_layers.shape[2] == 225, z_layers.shape
        b = z_layers.shape[0]
        out = jnp.zeros((b, self.block_dim), self.dtype)
        for i in range(self.block_count):
            # Coarse→fine: block i consumes layer (block_count - 1 - i)
            # (LightProbeModel.py:41).
            layer = z_layers[:, self.block_count - i - 1, :].astype(self.dtype)
            out = DisneyBlock(self.block_dim, dtype=self.dtype, name=f"block_{i}")(
                out, layer
            )
        out = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc0")(out))
        out = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(out))
        out = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc2")(out))
        out = nn.Dense(self.output_dim, dtype=self.dtype, name="fc3")(out)
        return nn.sigmoid(out).astype(jnp.float32)


class ProbeRendererModel(nn.Module):
    input_dim: int = LIGHT_PROBE_DIMENSION_WITH_META
    block_count: int = REALTIME_LAYERS
    block_dim: int = 200
    output_hidden: int = 100
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, light_probe: jnp.ndarray, descriptor: jnp.ndarray) -> jnp.ndarray:
        """light_probe: [B, 202] (200 latent + ω + α); descriptor:
        [B, 3, 226] realtime layers with ω appended; returns [B, 1]."""
        out = nn.relu(
            nn.Dense(self.block_dim, dtype=self.dtype, name="input_fc")(
                light_probe.astype(self.dtype)
            )
        )
        for i in range(self.block_count):
            out = DisneyBlock(self.block_dim, dtype=self.dtype, name=f"block_{i}")(
                out, descriptor[:, i, :].astype(self.dtype)
            )
        out = nn.relu(nn.Dense(self.output_hidden, dtype=self.dtype, name="fc0")(out))
        out = nn.relu(nn.Dense(self.output_hidden, dtype=self.dtype, name="fc1")(out))
        out = nn.Dense(1, dtype=self.dtype, name="fc2")(out)
        return nn.leaky_relu(out).astype(jnp.float32)


class BakedModel(nn.Module):
    """End-to-end two-stage composition for training (BakedModel.py:9-79)."""

    baked_layers: int = BAKED_LAYERS
    realtime_layers: int = REALTIME_LAYERS
    dtype: Any = jnp.float32

    def setup(self):
        self.light_probe_model = LightProbeModel(
            block_count=self.baked_layers, dtype=self.dtype
        )
        self.renderer_model = ProbeRendererModel(
            block_count=self.realtime_layers, dtype=self.dtype
        )

    def __call__(
        self,
        probe_descriptors: jnp.ndarray,
        probe_powers: jnp.ndarray,
        disney_descriptor: jnp.ndarray,
        omega: jnp.ndarray,
        alpha: jnp.ndarray,
    ) -> jnp.ndarray:
        """probe_descriptors: [B, 4, baked_layers, 225] (tetra corners),
        probe_powers: [B, 4], disney_descriptor: [B, 3, 226],
        omega/alpha: [B].  Returns [B, 1]."""
        b = probe_descriptors.shape[0]
        # Fold the 4 corners into the batch so the probe net runs once.
        flat = probe_descriptors.reshape(b * 4, self.baked_layers, 225)
        probes = self.light_probe_model(flat).reshape(b, 4, -1)
        probe = (probes * probe_powers[..., None]).sum(axis=1)  # [B, 200]
        probe = jnp.concatenate(
            [probe, omega[:, None], alpha[:, None]], axis=-1
        )  # applyAnglesToLightProbe (BakedModel.py:48-55)
        return self.renderer_model(probe, disney_descriptor)

    def bake(self, probe_descriptor: jnp.ndarray) -> jnp.ndarray:
        """Probe latent for the offline bake (BakedRenderer.cpp:86-122)."""
        return self.light_probe_model(probe_descriptor)

    def render(self, light_probe: jnp.ndarray, descriptor: jnp.ndarray) -> jnp.ndarray:
        return self.renderer_model(light_probe, descriptor)


class MimicModel(nn.Module):
    """Single-probe experiment variant (TR/Mimic/MimicModel.py:7-43):
    one probe descriptor (no interpolation) feeds the renderer."""

    baked_layers: int = BAKED_LAYERS
    realtime_layers: int = REALTIME_LAYERS
    dtype: Any = jnp.float32

    def setup(self):
        self.light_probe_model = LightProbeModel(
            block_count=self.baked_layers, dtype=self.dtype
        )
        self.renderer_model = ProbeRendererModel(
            block_count=self.realtime_layers, dtype=self.dtype
        )

    def __call__(
        self,
        probe_descriptor: jnp.ndarray,
        disney_descriptor: jnp.ndarray,
        omega: jnp.ndarray,
        alpha: jnp.ndarray,
    ) -> jnp.ndarray:
        probe = self.light_probe_model(probe_descriptor)
        probe = jnp.concatenate([probe, omega[:, None], alpha[:, None]], axis=-1)
        return self.renderer_model(probe, disney_descriptor)
