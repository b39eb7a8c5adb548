"""Reinhard tone mapping (reference: DG/src/CUDA/reinhard.cu:26-84).

The reference runs three sequential launches (column luminance sums → global
average → per-pixel map).  On TPU that is a single fused reduction + map —
XLA fuses the mean into the elementwise pass; no hand-scheduling needed.
"""

from __future__ import annotations

import jax.numpy as jnp

#: Luminance weights (reinhard.cu:20-23).
LUMA = (0.265068, 0.67023428, 0.06409157)
_DELTA = 1e-5


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    w = jnp.asarray(LUMA, dtype=rgb.dtype)
    return (rgb * w).sum(axis=-1)


def average_luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    """Simple (not log) average, + DELTA per pixel, as in the reference
    ('trying to display the brightest part at its best', reinhard.cu:37-39)."""
    return (luminance(rgb) + _DELTA).mean()


def reinhard(rgb: jnp.ndarray, exposure: float, avg_luminance=None) -> jnp.ndarray:
    """Map linear HDR [H, W, 3] to display [0, 1] with gamma 1/2.2."""
    if avg_luminance is None:
        avg_luminance = average_luminance(rgb)
    lw = luminance(rgb)
    ld = lw * exposure / avg_luminance
    ld = ld / (1.0 + ld)
    scale = ld / jnp.maximum(lw, jnp.finfo(rgb.dtype).tiny)
    out = jnp.clip(rgb * scale[..., None], 0.0, 1.0)
    return out ** (1.0 / 2.2)


def to_uint8(display_rgb: jnp.ndarray) -> jnp.ndarray:
    """[0,1] float → uint8 (truncating, as the uchar4 cast in reinhard.cu:81)."""
    return (display_rgb * 255.0).astype(jnp.uint8)
