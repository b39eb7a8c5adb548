"""Tetrahedral barycentric interpolation over the light-probe lattice.

The reference splits each unit lattice cell into 5 tetrahedra, picks one by
nearest-corner half-space tests, and interpolates the 4 corner probes with
scalar-triple-product barycentric weights
(reference: DG/src/CUDA/LightProbe.cuh:57-75,137-180).

Here the same geometry is expressed branchlessly: the 5 candidate tetrahedra
are a static [5, 4, 3] corner table, the half-space tests produce an index
into it via ``jnp.select``-style arithmetic, and the barycentric solve is
vectorized over points.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

#: Corner offsets of the 5 tetrahedra (LightProbe.cuh:143-180), in priority
#: order of the reference's if/else chain: near (0,0,0), near (0,1,1),
#: near (1,0,1), near (1,1,0), else the central tetrahedron.
TETRA_CORNERS = np.asarray(
    [
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
        [[0, 1, 1], [0, 0, 1], [0, 1, 0], [1, 1, 1]],
        [[1, 0, 1], [0, 0, 1], [1, 0, 0], [1, 1, 1]],
        [[1, 1, 0], [0, 1, 0], [1, 0, 0], [1, 1, 1]],
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]],
    ],
    dtype=np.float32,
)

#: The 4 "corner" vertices tested by the half-space checks, in test order.
_TEST_VERTICES = np.asarray(
    [[0, 0, 0], [0, 1, 1], [1, 0, 1], [1, 1, 0]], dtype=np.float32
)

_INV_SQRT3 = 0.5773502691896258  # distance-to-plane constant (LightProbe.cuh:128)


def _sctp(a, b, c):
    """Scalar triple product dot(cross(a, b), c), batched over [..., 3]."""
    return (jnp.cross(a, b) * c).sum(axis=-1)


def barycentric(a, b, c, d, p):
    """Barycentric weights of ``p`` w.r.t. tetrahedron (a,b,c,d)
    (LightProbe.cuh:57-75).  All args [..., 3]; returns [..., 4]."""
    vap, vbp = p - a, p - b
    vab, vac, vad = b - a, c - a, d - a
    vbc, vbd = c - b, d - b
    va6 = _sctp(vbp, vbd, vbc)
    vb6 = _sctp(vap, vac, vad)
    vc6 = _sctp(vap, vad, vab)
    vd6 = _sctp(vap, vab, vac)
    inv = 1.0 / _sctp(vab, vac, vad)
    return jnp.stack([va6, vb6, vc6, vd6], axis=-1) * inv[..., None]


def select_tetrahedron(local: jnp.ndarray) -> jnp.ndarray:
    """Index (0..4) of the tetrahedron containing ``local`` ∈ [0,1)^3.

    Mirrors ``isCloseToVertex`` (LightProbe.cuh:126-131): point belongs to
    corner-tetra v iff dot(local - v, normalize(center - v)) < 1/sqrt(3);
    the first passing test in order wins, else the central tetrahedron.
    """
    v = jnp.asarray(_TEST_VERTICES)  # [4, 3]
    center = jnp.float32(0.5)
    normals = center - v
    normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)  # [4, 3]
    # [..., 4] — test k passes if projection < 1/sqrt(3)
    proj = ((local[..., None, :] - v) * normals).sum(axis=-1)
    passes = proj < _INV_SQRT3
    # First passing index, else 4.
    idx = jnp.argmax(passes, axis=-1)
    any_pass = passes.any(axis=-1)
    return jnp.where(any_pass, idx, 4).astype(jnp.int32)


def probe_interpolation(
    pos_in_probe_units: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Probe-cell corner ids and barycentric weights for points in lattice
    units (position * density_multiplier / STEP_IN_MEAN_FREE_PATH).

    Returns ``(corners [..., 4, 3] int32, weights [..., 4] float)`` —
    the (a,b,c,d) probes and powers of the reference's
    ``getLightProbeInterpolation`` (LightProbe.cuh:134-180).
    """
    cell = jnp.floor(pos_in_probe_units)
    local = pos_in_probe_units - cell
    cell = jnp.maximum(cell, 0.0).astype(jnp.int32)  # floorId clamps to >= 0
    t_idx = select_tetrahedron(local)
    table = jnp.asarray(TETRA_CORNERS)  # [5, 4, 3]
    corners_local = table[t_idx]  # [..., 4, 3]
    weights = barycentric(
        corners_local[..., 0, :],
        corners_local[..., 1, :],
        corners_local[..., 2, :],
        corners_local[..., 3, :],
        local,
    )
    corners = cell[..., None, :] + corners_local.astype(jnp.int32)
    return corners, weights
