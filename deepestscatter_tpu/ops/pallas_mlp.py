"""Pallas TPU kernel: the fused RPNN forward pass.

The RPNN (models.rpnn.DisneyModel) is 10 residual blocks of
``o = relu(f2(relu(f1o(o) + f1z(z_i))) + o)`` plus a 3-layer head — 33
small matmuls whose weights total ~0.9M params (~3.6 MB f32).  Running it
as 33 separate XLA ops re-reads activations from HBM between every matmul;
the whole network FITS IN VMEM, so this kernel:

- holds every weight in VMEM for the whole grid (BlockSpec index maps
  pin them to block (0, ...) — loaded once, reused by all batch blocks);
- streams the batch through the full recurrence block-by-block: one HBM
  read of the descriptors, one HBM write of the radiance, everything
  between lives in VMEM/registers;
- runs the matmuls on the MXU with ``preferred_element_type=float32``.

Weights are stacked per-block ([10, in, out]) so the kernel unrolls a
static Python loop — no dynamic shapes, no control flow in the hot path
(pallas_guide.md: static shapes, MXU-aligned work).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_DIM = 200
LAYER_IN = 226
N_BLOCKS = 10
#: Batch rows per grid step (MXU-friendly; 256x226 @ 226x200 per matmul).
BATCH_BLOCK = 256


def stack_disney_weights(variables: Any) -> Dict[str, jnp.ndarray]:
    """Flax DisneyModel variables → stacked kernel weights."""
    p = variables["params"]
    blocks = [p[f"block_{i}"] for i in range(N_BLOCKS)]

    def stack(name, field):
        return jnp.stack([b[name][field] for b in blocks])

    return {
        "f1o_w": stack("f1o", "kernel"),  # [10, 200, 200]
        "f1o_b": stack("f1o", "bias"),  # [10, 200]
        "f1z_w": stack("f1z", "kernel"),  # [10, 226, 200]
        "f1z_b": stack("f1z", "bias"),
        "f2_w": stack("f2", "kernel"),
        "f2_b": stack("f2", "bias"),
        "fc0_w": p["fc0"]["kernel"],  # [200, 200]
        "fc0_b": p["fc0"]["bias"],
        "fc1_w": p["fc1"]["kernel"],
        "fc1_b": p["fc1"]["bias"],
        "fc2_w": p["fc2"]["kernel"],  # [200, 1]
        "fc2_b": p["fc2"]["bias"],
    }


def _rpnn_kernel(
    z_ref,  # [BATCH_BLOCK, 10, 226]
    f1o_w, f1o_b, f1z_w, f1z_b, f2_w, f2_b,
    fc0_w, fc0_b, fc1_w, fc1_b, fc2_w, fc2_b,
    out_ref,  # [BATCH_BLOCK, 1]
):
    o = jnp.zeros((z_ref.shape[0], BLOCK_DIM), jnp.float32)
    for i in range(N_BLOCKS):
        z = z_ref[:, i, :]
        h = (
            jnp.dot(o, f1o_w[i], preferred_element_type=jnp.float32)
            + f1o_b[i]
            + jnp.dot(z, f1z_w[i], preferred_element_type=jnp.float32)
            + f1z_b[i]
        )
        h = jnp.maximum(h, 0.0)
        o = jnp.maximum(
            jnp.dot(h, f2_w[i], preferred_element_type=jnp.float32) + f2_b[i] + o,
            0.0,
        )
    o = jnp.maximum(
        jnp.dot(o, fc0_w[...], preferred_element_type=jnp.float32) + fc0_b[...],
        0.0,
    )
    o = jnp.maximum(
        jnp.dot(o, fc1_w[...], preferred_element_type=jnp.float32) + fc1_b[...],
        0.0,
    )
    y = jnp.dot(o, fc2_w[...], preferred_element_type=jnp.float32) + fc2_b[...]
    out_ref[...] = jnp.where(y >= 0.0, y, 0.01 * y)  # LeakyReLU(0.01)


_WEIGHT_NAMES = (
    "f1o_w", "f1o_b", "f1z_w", "f1z_b", "f2_w", "f2_b",
    "fc0_w", "fc0_b", "fc1_w", "fc1_b", "fc2_w", "fc2_b",
)


@functools.partial(jax.jit, static_argnames=("interpret",))
def rpnn_forward(
    z_layers: jnp.ndarray, weights: Dict[str, jnp.ndarray], interpret: bool = False
) -> jnp.ndarray:
    """Fused RPNN forward: [B, 10, 226] → [B, 1] (B padded to BATCH_BLOCK)."""
    b = z_layers.shape[0]
    padded = -(-b // BATCH_BLOCK) * BATCH_BLOCK
    if padded != b:
        z_layers = jnp.concatenate(
            [z_layers, jnp.zeros((padded - b,) + z_layers.shape[1:], z_layers.dtype)]
        )
    grid = padded // BATCH_BLOCK

    def pinned(w):
        """Whole-array block pinned to the origin: loaded once, reused."""
        return pl.BlockSpec(
            w.shape, lambda i: (0,) * w.ndim, memory_space=pltpu.VMEM
        )

    ws = [jnp.asarray(weights[k], jnp.float32) for k in _WEIGHT_NAMES]
    out = pl.pallas_call(
        _rpnn_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (BATCH_BLOCK, N_BLOCKS, LAYER_IN),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [pinned(w) for w in ws],
        out_specs=pl.BlockSpec(
            (BATCH_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((padded, 1), jnp.float32),
        interpret=interpret,
    )(z_layers.astype(jnp.float32), *ws)
    return out[:b]


def make_fused_apply(variables: Any, interpret: bool = False):
    """Drop-in replacement for ``DisneyModel().apply`` backed by the Pallas
    kernel (same [B, 10, 226] → [B, 1] contract)."""
    weights = stack_disney_weights(variables)

    def apply_fn(_variables_ignored, z_layers):
        return rpnn_forward(z_layers, weights, interpret=interpret)

    return apply_fn
