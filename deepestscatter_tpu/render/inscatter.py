"""In-scatter bake: per-voxel transmittance toward the sun.

Capability parity with the reference's init-time bake
(DG/src/CUDA/inScatter.cu:40-66, launched over the full voxel grid by
VDBCloud.cpp:57-86): every voxel marches toward the sun with the scene's
sample step, accumulating Beer-Lambert transmittance, early-out below 1/255,
quantized to uint8 precision.  The result is the NEE shadow field sampled by
``getInScattering``.

TPU-native shape: one ``lax.while_loop`` over all voxels in lockstep with a
global early-out (all voxels below threshold or out of steps); positions are
reconstructed from the step index so the carry is just the transmittance
plane.  Batched over voxel chunks to bound peak memory for large grids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import grid as grid_ops
from ..scene import SceneParams, SceneStatic


#: Voxels per device call.  One bake call marches ``chunk x n_steps``
#: trilinear samples; at 2^21 voxels x 512 steps that is ~1G row gathers —
#: a few seconds on a v5e.  Bounding the per-call work matters on tunneled
#: single-chip setups, where one multi-minute XLA computation can bring the
#: worker down (a 256^3 grid baked as ONE call is exactly that).
_BAKE_CHUNK_VOXELS = 1 << 21


@functools.partial(
    jax.jit, static_argnames=("static", "early_out", "n_steps")
)
def _bake_chunk(
    params: SceneParams,
    static: SceneStatic,
    base: jnp.ndarray,  # [C, 3] voxel-corner positions, local coords
    *,
    early_out: bool,
    n_steps: int,
) -> jnp.ndarray:
    step = jnp.float32(static.sample_step)
    dm = jnp.float32(static.density_multiplier)
    to_light = -params.light_dir
    density0 = params.density_mips[0]

    def cond(state):
        i, trans = state
        more = jnp.any(trans * 255.0 >= 1.0) if early_out else True
        return jnp.logical_and(i < n_steps, more)

    def body(state):
        i, trans = state
        # Sample first, then step (inScatter.cu:54-60).
        pos = base + to_light * (step * i.astype(jnp.float32))
        u = pos / params.bbox_size
        density = grid_ops.sample_trilinear(density0, u) * dm
        if early_out:
            active = trans * 255.0 >= 1.0
            trans = jnp.where(active, trans * jnp.exp(-density * step), trans)
        else:
            trans = trans * jnp.exp(-density * step)
        return i + 1, trans

    trans0 = jnp.ones((base.shape[0],), jnp.float32)
    _, trans = jax.lax.while_loop(cond, body, (jnp.int32(0), trans0))
    return trans


def bake(
    params: SceneParams,
    static: SceneStatic,
    quantize: bool = True,
    early_out: bool = True,
    chunk_voxels: int = _BAKE_CHUNK_VOXELS,
) -> jnp.ndarray:
    """Bake the sun-transmittance grid at density resolution → [Z, Y, X].

    ``early_out`` freezes voxels once transmittance falls below 1/255 —
    correct under uint8 quantization (the stored value floors to 0 anyway,
    inScatter.cu:57) but a ~1/255 overestimate when keeping float values;
    pass ``early_out=False`` with ``quantize=False`` for exact float bakes
    (e.g. cross-validation against quadrature references).

    Large grids bake in ``chunk_voxels``-sized z-major slices, one bounded
    device call each (voxels are independent, so chunking is exact)."""
    import math

    nz, ny, nx = static.grid_shape
    max_dim = float(max(nx, ny, nz))
    # The exact (no-early-out) bake must cover the longest in-box sun path
    # (the box diagonal); the uint8 path keeps the legacy 1.0-length cap
    # (values below 1/255 freeze long before the diagonal matters).
    n_steps = (
        int(round(1.0 / static.sample_step))
        if early_out
        else int(math.ceil(math.sqrt(3.0) / static.sample_step)) + 2
    )

    # Voxel-corner positions in local coords: idx / max_dim
    # (inScatter.cu:45-47: launchID / maxSize / minScale with minScale == 1
    # because the longest bbox side is normalized to 1).
    zi = jnp.arange(nz, dtype=jnp.float32)
    yi = jnp.arange(ny, dtype=jnp.float32)
    xi = jnp.arange(nx, dtype=jnp.float32)
    zz, yy, xx = jnp.meshgrid(zi, yi, xi, indexing="ij")
    base = jnp.stack([xx, yy, zz], axis=-1).reshape(-1, 3) / max_dim  # [V, 3]

    v = base.shape[0]
    if v <= chunk_voxels:
        trans = _bake_chunk(
            params, static, base, early_out=early_out, n_steps=n_steps
        )
    else:
        parts = []
        for lo in range(0, v, chunk_voxels):
            piece = base[lo : lo + chunk_voxels]
            if piece.shape[0] < chunk_voxels:  # pad: one compile for all
                pad = chunk_voxels - piece.shape[0]
                piece = jnp.pad(piece, ((0, pad), (0, 0)))
            parts.append(
                _bake_chunk(
                    params, static, piece, early_out=early_out,
                    n_steps=n_steps,
                )
            )
        trans = jnp.concatenate(parts)[:v]
    if quantize:
        # uint8 storage semantics: floor(t * 255) / 255 (inScatter.cu:65).
        trans = jnp.floor(trans * 255.0) / 255.0
    return trans.reshape(nz, ny, nx)


def with_baked_inscatter(
    params: SceneParams,
    static: SceneStatic,
    quantize: bool = True,
    early_out: bool = True,
) -> SceneParams:
    """Return a copy of ``params`` with the in-scatter grid baked (stored in
    the packed-corner fast-sampling layout, like the density mips)."""
    baked = bake(params, static, quantize=quantize, early_out=early_out)
    from ..scene import make_march_rows  # local import: scene imports ops only

    march_dtype = (
        "uint8" if params.march_rows.dtype == jnp.uint8 else "float32"
    )
    # density_mips[0][..., 0] is corner (z, y, x) itself — the raw grid
    # (dequantized when textures store uint8, scene.build_scene).
    raw_density = params.density_mips[0][..., 0].astype(jnp.float32)
    if params.density_mips[0].dtype == jnp.uint8:
        raw_density = raw_density * jnp.float32(1.0 / 255.0)
    inscatter_packed = grid_ops.pack_corners(baked)
    if params.inscatter.dtype == jnp.uint8:
        # Keep the uint8 texture convention (values are exact multiples
        # of 1/255 after the quantize step above).  Clip first: transmit-
        # tance is in [0, 1] by construction, but a wrap through the uint8
        # cast on any fp spill would be catastrophic, a saturate is inert.
        inscatter_packed = jnp.round(
            jnp.clip(inscatter_packed, 0.0, 1.0) * 255.0
        ).astype(jnp.uint8)
    return params._replace(
        inscatter=inscatter_packed,
        march_rows=make_march_rows(
            raw_density, baked, march_dtype, static.march_brick
        ),
    )
