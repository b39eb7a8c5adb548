"""Deterministic, shard-stable random sampling utilities.

The reference seeds a tea<4>/LCG per-thread RNG with ``clock()`` — i.e.
renders are not reproducible (reference: DG/src/CUDA/random.cuh:34-44).
Here everything derives from threefry ``jax.random`` keys folded per
(pixel, subframe, bounce), so renders are bitwise reproducible and
independent of device layout (a requirement for shard-invariance tests).

Geometric samplers mirror random.cuh:122-174: ``uniform_on_sphere``,
``uniform_on_sphere_circle`` (cone with given cosθ around +z), and
``uniform_on_disc``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_onb(normal: jnp.ndarray):
    """Orthonormal basis (tangent, bitangent) around ``normal`` ([..., 3]).

    Branchless Frisvad-style construction (the reference uses OptiX's Onb;
    any smooth frame yields the same sampling distribution).
    """
    n = normal
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    tangent = jnp.stack(
        [1.0 + sign * n[..., 0] ** 2 * a, sign * b, -sign * n[..., 0]], axis=-1
    )
    bitangent = jnp.stack([b, sign + n[..., 1] ** 2 * a, -n[..., 1]], axis=-1)
    return tangent, bitangent


def from_onb(local: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """Transform a vector from the (tangent, bitangent, normal) frame to world."""
    t, b = make_onb(normal)
    return (
        local[..., 0:1] * t + local[..., 1:2] * b + local[..., 2:3] * normal
    )


def uniform_on_sphere(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Uniform direction on the unit sphere from two uniforms [...]→[..., 3]."""
    phi = u * (2.0 * jnp.pi)
    cos_theta = 2.0 * v - 1.0
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta**2))
    return jnp.stack(
        [jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta], axis=-1
    )


def uniform_on_sphere_circle(u: jnp.ndarray, cos_theta: jnp.ndarray) -> jnp.ndarray:
    """Uniform azimuth on the circle at polar angle ``cosθ`` around +z."""
    phi = u * (2.0 * jnp.pi)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta**2))
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def uniform_on_disc(u: jnp.ndarray, v: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """Uniform point on the unit disc perpendicular to ``normal``.

    Note the reference maps the 2D disc point into the Onb as (x, 0, y)
    (random.cuh:161-174) — i.e. the disc spans the tangent/normal-completed
    frame; the distribution is identical for any in-plane frame.
    """
    theta = u * (2.0 * jnp.pi)
    sqrt_r = jnp.sqrt(v)
    x = sqrt_r * jnp.cos(theta)
    y = sqrt_r * jnp.sin(theta)
    t, b = make_onb(normal)
    return x[..., None] * t + y[..., None] * b


def _pcg(x: jnp.ndarray) -> jnp.ndarray:
    """One PCG-RXS-M-XS output round over uint32 — a high-quality stateless
    mixer built from cheap VPU integer ops."""
    state = x * jnp.uint32(747796405) + jnp.uint32(2891336453)
    word = ((state >> ((state >> 28) + jnp.uint32(4))) ^ state) * jnp.uint32(277803737)
    return (word >> 22) ^ word


def hash_u32(seed: jnp.ndarray, stream: jnp.ndarray, counter) -> jnp.ndarray:
    """Stateless counter-based random uint32 for (seed, stream, counter).

    ``stream`` is typically a *global* ray/pixel id, so the value is
    independent of how rays are sharded across devices; ``counter`` advances
    per draw site / bounce.  This replaces the reference's
    ``tea<4>(clock())``-seeded LCG (random.cuh:34-44) with a deterministic,
    shard-stable stream.
    """
    s = jnp.asarray(seed, jnp.uint32)
    x = _pcg(jnp.asarray(stream, jnp.uint32) ^ (s * jnp.uint32(0x9E3779B9)))
    return _pcg(x + jnp.asarray(counter, jnp.uint32) * jnp.uint32(0x85EBCA6B))


def hash_uniform(seed, stream, counter) -> jnp.ndarray:
    """Uniform float32 in [0, 1) with 24 bits of precision (the reference's
    LCG also produces 24-bit floats, random.cuh:100-107)."""
    bits = hash_u32(seed, stream, counter)
    return (bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
