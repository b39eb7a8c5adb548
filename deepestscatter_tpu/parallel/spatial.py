"""Spatial / volume parallelism — the "context parallelism" analog.

SURVEY.md §2.11 item 3: for grids and probe lattices too large per chip,
shard 3D arrays across the mesh and keep stencil reads local via halo
slabs; coarse mips replicate while fine levels shard (the mip pyramid is a
natural shard/replicate split).

Two layers are provided:

- ``sharded_inscatter_bake`` — voxel-work data parallelism: the bake's
  voxel batch shards over the mesh (embarrassingly parallel, zero
  collectives) while the density grid stays replicated.  This is the
  dominant init-time cost of every scene (VDBCloud.cpp:57-86).
- ``HaloSlabGrid`` — memory sharding: a [Z, Y, X(,8)] grid split into
  z-slabs with one-voxel halos exchanged via ``jax.lax.ppermute`` so
  trilinear sampling inside a slab needs no remote reads; out-of-slab
  samples clamp into the halo (callers route rays to the owning slab).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import grid as grid_ops
from ..scene import SceneParams, SceneStatic


def sharded_inscatter_bake(
    mesh: Mesh,
    params: SceneParams,
    static: SceneStatic,
    quantize: bool = True,
    data_axis: str = "data",
) -> jnp.ndarray:
    """Bake the sun-transmittance grid with voxels sharded over the mesh.

    Functionally identical to render.inscatter.bake (same march, same
    quantization); each device marches its slice of the voxel batch.
    Returns the unpacked [Z, Y, X] grid.
    """
    nz, ny, nx = static.grid_shape
    max_dim = float(max(nx, ny, nz))
    step = jnp.float32(static.sample_step)
    dm = jnp.float32(static.density_multiplier)
    n_steps = int(round(1.0 / static.sample_step))
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))

    zi = jnp.arange(nz, dtype=jnp.float32)
    yi = jnp.arange(ny, dtype=jnp.float32)
    xi = jnp.arange(nx, dtype=jnp.float32)
    zz, yy, xx = jnp.meshgrid(zi, yi, xi, indexing="ij")
    base = jnp.stack([xx, yy, zz], axis=-1).reshape(-1, 3) / max_dim
    n_vox = base.shape[0]
    pad = (-n_vox) % n_dev
    if pad:
        base = jnp.concatenate([base, jnp.zeros((pad, 3), jnp.float32)])

    def local_bake(density0, bbox, base_local):
        to_light = -params.light_dir

        def cond(state):
            i, trans = state
            return jnp.logical_and(i < n_steps, jnp.any(trans * 255.0 >= 1.0))

        def body(state):
            i, trans = state
            pos = base_local + to_light * (step * i.astype(jnp.float32))
            u = pos / bbox
            density = grid_ops.sample_trilinear(density0, u) * dm
            active = trans * 255.0 >= 1.0
            trans = jnp.where(active, trans * jnp.exp(-density * step), trans)
            return i + 1, trans

        trans0 = jnp.ones((base_local.shape[0],), jnp.float32)
        _, trans = jax.lax.while_loop(cond, body, (jnp.int32(0), trans0))
        if quantize:
            trans = jnp.floor(trans * 255.0) / 255.0
        return trans

    fn = shard_map(
        local_bake,
        mesh=mesh,
        in_specs=(P(), P(), P(data_axis)),
        out_specs=P(data_axis),
        check_vma=False,
    )
    trans = jax.jit(fn)(params.density_mips[0], params.bbox_size, base)
    return trans[:n_vox].reshape(nz, ny, nx)


class HaloSlabGrid:
    """A [Z, ...] grid sharded into z-slabs with exchanged one-slice halos.

    ``local`` on each device is ``[slab + 2*halo, ...]``: row 0 is the
    previous device's last rows, rows [halo, halo+slab) are owned, the
    tail is the next device's first rows — so any stencil within ``halo``
    of the owned region resolves locally.  Edge devices replicate their
    boundary (clamp-to-edge, matching the samplers).
    """

    def __init__(self, mesh: Mesh, axis: str = "data", halo: int = 1):
        self.mesh = mesh
        self.axis = axis
        self.halo = halo
        self.n_dev = int(mesh.shape[axis])

    def scatter(self, grid) -> jnp.ndarray:
        """Full grid → per-device halo slabs, stacked on a leading device
        axis [n_dev, slab + 2h, ...] sharded over the mesh.

        The stacking happens HOST-side (numpy) and the transfer goes
        through ``device_put`` with the sharding attached, so the full
        grid never materializes on any single device — grids larger than
        one device's memory can be scattered from host RAM."""
        host = np.asarray(grid)
        nz = host.shape[0]
        assert nz % self.n_dev == 0, f"Z={nz} must divide over {self.n_dev}"
        slab = nz // self.n_dev
        h = self.halo
        pieces = []
        for d in range(self.n_dev):
            lo = d * slab - h
            hi = (d + 1) * slab + h
            idx = np.clip(np.arange(lo, hi), 0, nz - 1)
            pieces.append(host[idx])
        stacked = np.stack(pieces)
        return jax.device_put(
            stacked, NamedSharding(self.mesh, P(self.axis))
        )

    def exchange_halos(self, owned: jnp.ndarray, axis_name: str) -> jnp.ndarray:
        """Inside shard_map: owned slab [slab, ...] → [slab + 2h, ...] with
        halos fetched from ring neighbors via ppermute (ICI traffic only).
        Call within a shard-mapped function over ``axis_name``."""
        h = self.halo
        n = jax.lax.axis_size(axis_name)
        idx = jax.lax.axis_index(axis_name)
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [(i, (i - 1) % n) for i in range(n)]
        from_prev = jax.lax.ppermute(owned[-h:], axis_name, fwd)
        from_next = jax.lax.ppermute(owned[:h], axis_name, bwd)
        # Clamp-to-edge at the global boundaries (matches scatter()'s clip).
        from_prev = jnp.where(idx == 0, owned[:h], from_prev)
        from_next = jnp.where(idx == n - 1, owned[-h:], from_next)
        return jnp.concatenate([from_prev, owned, from_next], axis=0)


def replicate_coarse_mips(
    mesh: Mesh, mips: Tuple[jnp.ndarray, ...], shard_below_level: int = 1
):
    """The shard/replicate mip split: level 0 (fine, large) is the slab-
    sharding candidate; coarse levels replicate (they are small and every
    descriptor layer reads them) — SURVEY.md §2.11."""
    rep = NamedSharding(mesh, P())
    return tuple(
        m if lvl < shard_below_level else jax.device_put(m, rep)
        for lvl, m in enumerate(mips)
    )
