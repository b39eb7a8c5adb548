"""The Deep Scattering RPNN ("DisneyModel").

Reference: TR/Disney/DisneyModel.py:5-58 — 10 DisneyBlocks of width 200
consuming the hierarchical descriptor layers **fine→coarse in order**, with
the view∠light angle appended to each 225-sample layer (226 inputs/block);
initial recurrence state is zeros; head 200→200→200→1 with ReLU×2 and a
final LeakyReLU.  Output: radiance given sun radiance 1e6.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .blocks import DisneyBlock

BLOCK_DIMENSION = 200
BLOCK_COUNT = 10
LAYER_DIMENSION = 225
LAYER_WITH_ANGLE = LAYER_DIMENSION + 1


class DisneyModel(nn.Module):
    block_dim: int = BLOCK_DIMENSION
    block_count: int = BLOCK_COUNT
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z_layers: jnp.ndarray) -> jnp.ndarray:
        """z_layers: [B, 10, 226] (descriptor layers + appended ω angle);
        returns [B, 1] predicted radiance."""
        assert z_layers.shape[1] == self.block_count, z_layers.shape
        assert z_layers.shape[2] == LAYER_WITH_ANGLE, z_layers.shape
        b = z_layers.shape[0]
        out = jnp.zeros((b, self.block_dim), self.dtype)
        for i in range(self.block_count):
            out = DisneyBlock(self.block_dim, dtype=self.dtype, name=f"block_{i}")(
                out, z_layers[:, i, :].astype(self.dtype)
            )
        out = nn.relu(nn.Dense(self.block_dim, dtype=self.dtype, name="fc0")(out))
        out = nn.relu(nn.Dense(self.block_dim, dtype=self.dtype, name="fc1")(out))
        out = nn.Dense(1, dtype=self.dtype, name="fc2")(out)
        return nn.leaky_relu(out).astype(jnp.float32)
