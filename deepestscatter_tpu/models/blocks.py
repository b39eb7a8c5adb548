"""RPNN building blocks in Flax.

``DisneyBlock`` is the residual block of the Deep Scattering RPNN
(reference: TR/Disney/DisneyBlock.py:3-31):
``out = ReLU(f2(ReLU(f1o(o) + f1z(z))) + o)``.

Matmuls run in the configured ``dtype`` (bfloat16 by default on TPU — the
MXU's native precision) with float32 parameters.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class DisneyBlock(nn.Module):
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, o: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
        f1o = nn.Dense(self.out_dim, dtype=self.dtype, name="f1o")
        f1z = nn.Dense(self.out_dim, dtype=self.dtype, name="f1z")
        f2 = nn.Dense(self.out_dim, dtype=self.dtype, name="f2")
        h = nn.relu(f1o(o) + f1z(z))
        return nn.relu(f2(h) + o)


class LogTransform:
    """Log-space target transform (reference: Trainer.py LogModel.logEps,
    :27-31): ``log(max(10x + 1, 0.0099 + x/100))`` — smooth for x near 0,
    defined for slightly negative x."""

    @staticmethod
    def forward(x: jnp.ndarray) -> jnp.ndarray:
        val = x * 1e1 + 1.0
        val = jnp.maximum(val, 0.0099 + val / 100.0)
        return jnp.log(val)

    @staticmethod
    def inverse(y: jnp.ndarray) -> jnp.ndarray:
        """Inverse on the main branch (val > 0.01): x = (exp(y) - 1) / 10."""
        return (jnp.exp(y) - 1.0) / 10.0
