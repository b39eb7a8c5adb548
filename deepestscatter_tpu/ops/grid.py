"""Density grids, mip pyramids and trilinear sampling.

The reference stores the cloud density as a 3D uint8 OptiX texture with
normalized-coordinate trilinear sampling plus a CPU-built box-filter mip
pyramid (reference: DG/src/Util/Resources.cpp:68-209, VDBCloud.cpp:48-55).
On TPU there is no texture unit: grids are HBM-resident ``[Z, Y, X]`` arrays
and trilinear interpolation is 8 explicit gathers over a flattened grid.
Gathers are expressed with ``jnp.take`` so XLA lowers them to the native
dynamic-gather path; everything is batch-vectorized over sample points.

Conventions
-----------
- Grid layout is ``[Z, Y, X]`` (x fastest), values in [0, 1].
- Normalized texture coordinates ``u ∈ [0, 1]^3`` are ordered ``(x, y, z)``,
  texel centers at ``(i + 0.5) / N``, clamp-to-edge — matching CUDA
  ``tex3D`` with normalized coordinates.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def build_mipmaps(density: np.ndarray, dtype=np.float32) -> Tuple[np.ndarray, ...]:
    """Build the full mip pyramid down to 1x1x1 with an 8-tap box filter.

    Capability parity with the reference's CPU mip builder
    (Resources.cpp:169-209).  Odd dimensions are handled by clamping the +1
    tap to the edge; level sizes follow ``ceil(n / 2)``.
    Runs in NumPy (host, offline — part of asset import, not the hot path).
    """
    density = np.asarray(density, dtype=np.float32)
    assert density.ndim == 3, "density grid must be [Z, Y, X]"
    levels = [density]
    current = density
    while current.shape != (1, 1, 1):
        nz, ny, nx = current.shape
        sz, sy, sx = (max(1, (nz + 1) // 2), max(1, (ny + 1) // 2), max(1, (nx + 1) // 2))
        iz = np.minimum(2 * np.arange(sz), nz - 1)
        iy = np.minimum(2 * np.arange(sy), ny - 1)
        ix = np.minimum(2 * np.arange(sx), nx - 1)
        iz1 = np.minimum(iz + 1, nz - 1)
        iy1 = np.minimum(iy + 1, ny - 1)
        ix1 = np.minimum(ix + 1, nx - 1)
        acc = np.zeros((sz, sy, sx), dtype=np.float64)
        for z in (iz, iz1):
            for y in (iy, iy1):
                for x in (ix, ix1):
                    acc += current[np.ix_(z, y, x)]
        current = (acc / 8.0).astype(np.float32)
        levels.append(current)
    return tuple(lvl.astype(dtype) for lvl in levels)


def pack_corners(grid: jnp.ndarray) -> jnp.ndarray:
    """Pack each voxel's 2x2x2 cell corners into one row → ``[Z, Y, X, 8]``.

    ``packed[z, y, x, cx + 2*cy + 4*cz] = grid[min(z+cz, Z-1),
    min(y+cy, Y-1), min(x+cx, X-1)]`` (clamp-to-edge baked in).

    This is the TPU-native texture layout: XLA lowers a *row* gather (one
    index fetching a contiguous 8-vector) to one DMA descriptor per sample,
    ~10x faster on TPU than 8 independent scalar gathers — measured 0.9 ms
    vs 9.2 ms per 131k trilinear samples on v5e.  Costs 8x memory; mip
    pyramids at cloud resolutions stay far below HBM limits.
    """
    g = jnp.asarray(grid)

    def shift(a, axis):
        ahead = jnp.concatenate(
            [
                jax.lax.slice_in_dim(a, 1, a.shape[axis], axis=axis),
                jax.lax.slice_in_dim(a, a.shape[axis] - 1, a.shape[axis], axis=axis),
            ],
            axis=axis,
        )
        return ahead

    gx = shift(g, 2)
    gy = shift(g, 1)
    gxy = shift(gx, 1)
    corners = [g, gx, gy, gxy]
    corners += [shift(c, 0) for c in corners]
    return jnp.stack(corners, axis=-1)


def pack_corner_pair(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pack TWO co-located grids' cell corners into one ``[Z, Y, X, 16]``
    row (``[..., :8]`` = a's corners, ``[..., 8:]`` = b's).

    The march hot loop needs density AND sun-transmittance at (nearly) the
    same coordinate every step; on TPU the gather cost is per ROW, not per
    byte (measured: f32x8 3.2 ms, f32x16 3.2 ms per 262k rows on v5e), so
    co-packing halves the dominant cost of the loop."""
    return jnp.concatenate([pack_corners(a), pack_corners(b)], axis=-1)


def packed_cell(
    u: jnp.ndarray, grid_shape: Tuple[int, int, int]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Cell coordinates for a ``pack_corners`` lookup at ``u`` ([..., 3],
    (x, y, z) order): returns ``(cell [..., 3] int32, frac [..., 3],
    row_idx [...])``.  Exactly the index math of the packed trilinear path,
    exposed so the march loop can reuse the cell for co-fetched rows,
    cell-equality tests, and empty-cell exit distances."""
    nz, ny, nx = grid_shape
    dims = jnp.asarray([nx, ny, nz], dtype=u.dtype)
    t = u * dims - 0.5
    t0 = jnp.floor(t)
    # Clamp-to-edge below zero: the packed row at index 0 holds corners
    # (0, 1); the classic path uses (0, 0), i.e. frac 0.
    frac = jnp.where(t0 < 0.0, 0.0, t - t0)
    t0 = t0.astype(jnp.int32)
    cell = jnp.stack(
        [
            jnp.clip(t0[..., 0], 0, nx - 1),
            jnp.clip(t0[..., 1], 0, ny - 1),
            jnp.clip(t0[..., 2], 0, nz - 1),
        ],
        axis=-1,
    )
    row_idx = (cell[..., 2] * ny + cell[..., 1]) * nx + cell[..., 0]
    return cell, frac, row_idx


def trilinear_weights(frac: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] cell-relative fractions → the 8 corner weights [..., 8] in
    ``pack_corners`` order (x fastest)."""
    fx = frac[..., 0:1]
    fy = frac[..., 1:2]
    fz = frac[..., 2:3]
    wx = jnp.concatenate([1.0 - fx, fx], axis=-1)  # [..., 2]
    wy = jnp.concatenate([1.0 - fy, fy], axis=-1)
    wz = jnp.concatenate([1.0 - fz, fz], axis=-1)
    return (
        wz[..., :, None, None] * wy[..., None, :, None] * wx[..., None, None, :]
    ).reshape(*frac.shape[:-1], 8)


def trilinear_from_rows(rows: jnp.ndarray, frac: jnp.ndarray) -> jnp.ndarray:
    """Interpolate already-fetched corner rows ``[..., 8]`` at ``frac``."""
    return (rows * trilinear_weights(frac)).sum(axis=-1)


def _packed_trilinear(packed: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample from a ``pack_corners`` grid: one row gather + an
    8-weight dot.  Semantics identical to the classic 8-gather path.

    uint8 grids are the reference's texture storage (x255, Resources.cpp:
    93-96) and dequantize here — callers always see [0, 1] values."""
    nz, ny, nx, _ = packed.shape
    _, frac, idx = packed_cell(u, (nz, ny, nx))
    rows = jnp.take(packed.reshape(-1, 8), idx, axis=0, mode="clip")
    if packed.dtype == jnp.uint8:
        rows = rows.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    return trilinear_from_rows(rows, frac)


def _gather3d(grid: jnp.ndarray, xi: jnp.ndarray, yi: jnp.ndarray, zi: jnp.ndarray) -> jnp.ndarray:
    """Gather ``grid[zi, yi, xi]`` for integer index arrays of equal shape."""
    nz, ny, nx = grid.shape
    flat = grid.reshape(-1)
    idx = (zi * ny + yi) * nx + xi
    out = jnp.take(flat, idx, mode="clip")
    if grid.dtype == jnp.uint8:
        out = out.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    return out


def sample_trilinear(grid: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Trilinearly sample ``grid`` at normalized coordinates ``u``.

    ``u`` has shape ``[..., 3]`` ordered (x, y, z); returns shape ``[...]``.
    Matches CUDA tex3D normalized-coordinate linear filtering with
    clamp-to-edge addressing (texel centers at ``(i + 0.5) / N``).

    Accepts either a raw ``[Z, Y, X]`` grid (8 scalar gathers) or a
    ``pack_corners`` ``[Z, Y, X, 8]`` grid (one row gather — the TPU fast
    path).
    """
    if grid.ndim == 4:
        return _packed_trilinear(grid, u)
    nz, ny, nx = grid.shape
    dims = jnp.asarray([nx, ny, nz], dtype=u.dtype)
    # Texel-space position of the sample relative to texel centers.
    t = u * dims - 0.5
    t0 = jnp.floor(t)
    frac = t - t0
    t0 = t0.astype(jnp.int32)
    x0 = jnp.clip(t0[..., 0], 0, nx - 1)
    y0 = jnp.clip(t0[..., 1], 0, ny - 1)
    z0 = jnp.clip(t0[..., 2], 0, nz - 1)
    x1 = jnp.clip(t0[..., 0] + 1, 0, nx - 1)
    y1 = jnp.clip(t0[..., 1] + 1, 0, ny - 1)
    z1 = jnp.clip(t0[..., 2] + 1, 0, nz - 1)
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]

    c000 = _gather3d(grid, x0, y0, z0)
    c100 = _gather3d(grid, x1, y0, z0)
    c010 = _gather3d(grid, x0, y1, z0)
    c110 = _gather3d(grid, x1, y1, z0)
    c001 = _gather3d(grid, x0, y0, z1)
    c101 = _gather3d(grid, x1, y0, z1)
    c011 = _gather3d(grid, x0, y1, z1)
    c111 = _gather3d(grid, x1, y1, z1)

    c00 = c000 * (1 - fx) + c100 * fx
    c10 = c010 * (1 - fx) + c110 * fx
    c01 = c001 * (1 - fx) + c101 * fx
    c11 = c011 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def sample_mip(mips: Sequence[jnp.ndarray], u: jnp.ndarray, lod: float) -> jnp.ndarray:
    """Sample a mip pyramid at a *static* fractional LOD.

    Linear-mipmap-linear: trilinear within each of the two bracketing levels,
    then a lerp between them — matching ``rtTex3DLod`` with linear mip
    filtering (reference: DisneyDescriptor.cuh:39-42).  ``lod`` must be a
    Python float (it is static per descriptor layer: the cloud size is config,
    not a traced value), so level selection costs nothing at runtime.
    """
    n_levels = len(mips)
    lod = float(min(max(lod, 0.0), n_levels - 1))
    lo = int(np.floor(lod))
    hi = min(lo + 1, n_levels - 1)
    frac = lod - lo
    lo_val = sample_trilinear(mips[lo], u)
    if frac == 0.0 or lo == hi:
        return lo_val
    hi_val = sample_trilinear(mips[hi], u)
    return lo_val * (1.0 - frac) + hi_val * frac


def normalize_density(raw: np.ndarray) -> np.ndarray:
    """Normalize a raw density grid by its max (reference: Resources.cpp:93-96
    loads VDB values scaled so max density = 1, stored as uint8/255)."""
    raw = np.asarray(raw, dtype=np.float32)
    m = float(raw.max())
    if m > 0:
        raw = raw / m
    return np.clip(raw, 0.0, 1.0)


def pad_boundary(grid: np.ndarray, pad: int = 1) -> np.ndarray:
    """Expand the grid with ``pad`` zero voxels on each side (the reference
    expands the loaded bbox by one voxel, Resources.cpp:89-91) so the density
    fades to zero inside the sampled domain."""
    return np.pad(grid, pad, mode="constant")


def bbox_size_from_shape(shape: Tuple[int, int, int]) -> np.ndarray:
    """Normalized bbox size with the longest side == 1
    (reference: VDBCloud.cpp:101-105); shape is [Z, Y, X] → returns (x, y, z)."""
    nz, ny, nx = shape
    m = float(max(nx, ny, nz))
    return np.asarray([nx / m, ny / m, nz / m], dtype=np.float32)


def build_occupancy(density: np.ndarray, block: int = 8) -> np.ndarray:
    """Conservative coarse occupancy for empty-space skipping.

    ``occ[c] = 1`` iff any density lives in block ``c`` OR any of its 26
    neighbors (one-block dilation).  Therefore ``occ[cell(p)] == 0``
    guarantees density — including its trilinear support — is exactly zero
    within one block length of ``p``, so a ray may advance a whole block
    without sampling: an EXACT skip, not an approximation.  The reference
    marches fixed 1/512 steps through empty space (cloud.cuh:87-106); on
    TPU each step costs a gather, so skipping empties is a direct
    gather-count win.
    """
    density = np.asarray(density)
    nz, ny, nx = density.shape
    pz, py, px = (-nz) % block, (-ny) % block, (-nx) % block
    padded = np.pad(density, ((0, pz), (0, py), (0, px)))
    bz, by, bx = padded.shape[0] // block, padded.shape[1] // block, padded.shape[2] // block
    core = padded.reshape(bz, block, by, block, bx, block).max(axis=(1, 3, 5))
    occupied = (core > 0.0).astype(np.float32)
    # Dilate by one block in every direction (3^3 max filter).
    d = np.pad(occupied, 1, mode="edge")
    out = np.zeros_like(occupied)
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                out = np.maximum(
                    out, d[dz : dz + bz, dy : dy + by, dx : dx + bx]
                )
    return out


def sample_nearest(grid: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor lookup at normalized coords ``u`` [..., 3] (x, y, z)
    with clamp-to-edge — one scalar gather."""
    nz, ny, nx = grid.shape
    dims = jnp.asarray([nx, ny, nz], dtype=u.dtype)
    t = jnp.clip(
        jnp.floor(u * dims).astype(jnp.int32),
        0,
        jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.int32),
    )
    idx = (t[..., 2] * ny + t[..., 1]) * nx + t[..., 0]
    return jnp.take(grid.reshape(-1), idx, mode="clip")


def sample_occupancy(
    occ: jnp.ndarray,
    u: jnp.ndarray,
    grid_shape: Tuple[int, int, int],
    block: int,
) -> jnp.ndarray:
    """Occupancy lookup for normalized density coords ``u`` [..., 3].

    The occupancy covers the density grid padded up to a block multiple, so
    the cell index is ``floor(u * density_dims / block)`` (NOT a direct
    normalized lookup into the occupancy dims)."""
    nz, ny, nx = grid_shape
    bz, by, bx = occ.shape
    dims = jnp.asarray([nx, ny, nz], dtype=u.dtype)
    cell = jnp.floor(u * dims / block).astype(jnp.int32)
    cx = jnp.clip(cell[..., 0], 0, bx - 1)
    cy = jnp.clip(cell[..., 1], 0, by - 1)
    cz = jnp.clip(cell[..., 2], 0, bz - 1)
    idx = (cz * by + cy) * bx + cx
    return jnp.take(occ.reshape(-1), idx, mode="clip")


# ---------------------------------------------------------------------------
# Brick rows: one gather serves a whole (brick x brick x brick)-cell region
# ---------------------------------------------------------------------------

def brick_counts(grid_shape: Tuple[int, int, int], brick: int):
    """Brick-grid dimensions [Z, Y, X] for ``brick`` cells per axis."""
    nz, ny, nx = grid_shape
    c = lambda n: -(-n // brick)  # noqa: E731
    return c(nz), c(ny), c(nx)


def pack_bricks(
    a: jnp.ndarray, b: jnp.ndarray, brick: int = 3
) -> jnp.ndarray:
    """Pack TWO co-located grids into brick rows ``[NB, 2*(brick+1)^3]``.

    A brick covers ``brick^3`` sampling cells; its row stores the
    ``(brick+1)^3`` corner lattice of each grid (clamp-to-edge), corner
    order z-major/x-fastest, a's lattice first.  One row gather then
    serves EVERY trilinear sample inside the brick — ``brick``x more march
    distance per gather than ``pack_corner_pair`` cell rows, at ~2.4x LESS
    memory per cell (``(B+1)^3 / B^3`` corners per cell vs 8).  On TPU the
    gather cost is per ROW, nearly independent of row width (measured in
    tools/perf_probe.py), so fatter rows are the lever on HBM-resident
    grids where the fetch dominates the march.
    """
    assert a.shape == b.shape
    return jnp.concatenate(
        [pack_bricks_single(a, brick), pack_bricks_single(b, brick)], axis=-1
    )


def pack_bricks_single(g: jnp.ndarray, brick: int = 3) -> jnp.ndarray:
    """ONE grid's brick-corner lattice → ``[NB, (brick+1)^3]`` (the
    density half of ``pack_bricks``; also the descriptor mip-table layout:
    64-byte aligned uint8 rows from a table 3x smaller than the 8-corner
    packing — both first-order gather-rate levers, PERF_r04.json)."""
    nz, ny, nx = g.shape
    nbz, nby, nbx = brick_counts((nz, ny, nx), brick)
    b1 = brick + 1
    zi = jnp.minimum(
        jnp.arange(nbz)[:, None] * brick + jnp.arange(b1)[None, :], nz - 1
    )
    yi = jnp.minimum(
        jnp.arange(nby)[:, None] * brick + jnp.arange(b1)[None, :], ny - 1
    )
    xi = jnp.minimum(
        jnp.arange(nbx)[:, None] * brick + jnp.arange(b1)[None, :], nx - 1
    )
    t = jnp.take(g, zi.reshape(-1), axis=0).reshape(nbz, b1, ny, nx)
    t = jnp.take(t, yi.reshape(-1), axis=2).reshape(nbz, b1, nby, b1, nx)
    t = jnp.take(t, xi.reshape(-1), axis=4).reshape(nbz, b1, nby, b1, nbx, b1)
    # → [nbz, nby, nbx, cz, cy, cx]
    t = t.transpose(0, 2, 4, 1, 3, 5)
    return t.reshape(nbz * nby * nbx, b1**3)


def sample_brick_table(
    table: jnp.ndarray,
    grid_shape: Tuple[int, int, int],
    u: jnp.ndarray,
    brick: int = 3,
) -> jnp.ndarray:
    """Trilinear sample from a ``pack_bricks_single`` table — one row
    gather + the brick contraction; values bit-identical to the packed-
    corner path (``brick_cell`` shares ``packed_cell``'s frac math and
    ``trilinear_from_brick`` reproduces the cell-row lerp bit-for-bit,
    tests/test_march_deferred.py)."""
    _, frac, ridx, local = brick_cell(u, grid_shape, brick)
    rows = jnp.take(table, ridx, axis=0, mode="clip")
    if table.dtype == jnp.uint8:
        rows = rows.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    # Extract the sample's 8 cell corners from the fetched lattice with
    # one-hot contractions, then run the SAME 8-corner lerp as the
    # packed-corner path — bit-identical results (the direct 2-hot brick
    # contraction reassociates the lerp at the last ulp).
    return trilinear_from_rows(brick_cell_rows(rows, local, brick), frac)


def brick_cell_rows(
    lattice: jnp.ndarray, local: jnp.ndarray, brick: int
) -> jnp.ndarray:
    """Extract a cell's 8 corners from a fetched brick lattice →
    ``[..., 8]`` in ``pack_corners`` order (x fastest) — arithmetic corner
    selection (one-hot per axis), no gathers."""
    b1 = brick + 1
    v = lattice.reshape(*lattice.shape[:-1], b1, b1, b1)  # [..., z, y, x]
    i = jnp.arange(b1)

    def onehots(l):
        l = l[..., None]
        oh0 = (i == l).astype(lattice.dtype if lattice.dtype != jnp.uint8 else jnp.float32)
        oh1 = (i == l + 1).astype(oh0.dtype)
        return jnp.stack([oh0, oh1], axis=-2)  # [..., 2, b1]

    ohz = onehots(local[..., 2])
    ohy = onehots(local[..., 1])
    ohx = onehots(local[..., 0])
    t = jnp.einsum("...zyx,...cz->...cyx", v, ohz)
    t = jnp.einsum("...cyx,...dy->...cdx", t, ohy)
    t = jnp.einsum("...cdx,...ex->...cde", t, ohx)  # [..., z2, y2, x2]
    return t.reshape(*lattice.shape[:-1], 8)


def sample_mip_bricks(
    tables: Sequence[jnp.ndarray],
    shapes: Sequence[Tuple[int, int, int]],
    u: jnp.ndarray,
    lod: float,
    brick: int = 3,
) -> jnp.ndarray:
    """``sample_mip`` over brick mip tables (static fractional LOD,
    linear-mipmap-linear) — identical values, faster rows."""
    n_levels = len(tables)
    lod = float(min(max(lod, 0.0), n_levels - 1))
    lo = int(np.floor(lod))
    hi = min(lo + 1, n_levels - 1)
    frac = lod - lo
    lo_val = sample_brick_table(tables[lo], shapes[lo], u, brick)
    if frac == 0.0 or lo == hi:
        return lo_val
    hi_val = sample_brick_table(tables[hi], shapes[hi], u, brick)
    return lo_val * (1.0 - frac) + hi_val * frac


def brick_cell(
    u: jnp.ndarray, grid_shape: Tuple[int, int, int], brick: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Brick lookup for a sample at ``u`` ([..., 3], (x, y, z) order):
    ``(bcell [..., 3] int32 brick coords, frac [..., 3], row_idx [...],
    local [..., 3] cell-within-brick)``.  Cell/frac math identical to
    ``packed_cell`` (same clamp-to-edge), so brick sampling reproduces the
    cell-row path bit-for-bit."""
    nz, ny, nx = grid_shape
    dims = jnp.asarray([nx, ny, nz], dtype=u.dtype)
    t = u * dims - 0.5
    t0 = jnp.floor(t)
    frac = jnp.where(t0 < 0.0, 0.0, t - t0)
    t0 = t0.astype(jnp.int32)
    cell = jnp.stack(
        [
            jnp.clip(t0[..., 0], 0, nx - 1),
            jnp.clip(t0[..., 1], 0, ny - 1),
            jnp.clip(t0[..., 2], 0, nz - 1),
        ],
        axis=-1,
    )
    bcell = cell // brick
    local = cell - bcell * brick
    nbz, nby, nbx = brick_counts(grid_shape, brick)
    row_idx = (bcell[..., 2] * nby + bcell[..., 1]) * nbx + bcell[..., 0]
    return bcell, frac, row_idx, local


def trilinear_from_brick(
    lattice: jnp.ndarray,  # [..., (brick+1)^3] one grid's corner lattice
    local: jnp.ndarray,  # [..., 3] cell-within-brick (x, y, z)
    frac: jnp.ndarray,  # [..., 3]
    brick: int,
) -> jnp.ndarray:
    """Trilinear sample from an already-fetched brick lattice — a 3-step
    tensor contraction with per-axis 2-hot weight vectors (no gathers: the
    8 relevant corners are selected arithmetically on the VPU)."""
    b1 = brick + 1
    v = lattice.reshape(*lattice.shape[:-1], b1, b1, b1)  # [..., z, y, x]
    i = jnp.arange(b1)

    def wts(l, f):
        l = l[..., None]
        f = f[..., None]
        return jnp.where(i == l, 1.0 - f, jnp.where(i == l + 1, f, 0.0))

    wx = wts(local[..., 0], frac[..., 0])
    wy = wts(local[..., 1], frac[..., 1])
    wz = wts(local[..., 2], frac[..., 2])
    v = jnp.einsum("...zyx,...z->...yx", v, wz)
    v = jnp.einsum("...yx,...y->...x", v, wy)
    return jnp.einsum("...x,...x->...", v, wx)
