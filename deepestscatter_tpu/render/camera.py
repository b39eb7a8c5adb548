"""Pinhole camera, box intersection, and miss shading.

Capability parity:
- ray generation — reference cameraCommon.cuh:18-30 (NDC in [-1, 1] through
  eye/U/V/W) with U/V/W built as in sutil::calculateCameraVariables;
- box intersection — reference cloudBBox.cu:7-45 (slab test; rays starting
  inside the box hit at ``minimal_ray_distance``);
- miss shading — reference pathTracingCamera.cu:31-51 (sun disc else
  ground↔sky gradient on direction.y).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import CameraConfig, fov_tan_halves
from ..scene import SceneParams, SceneStatic


class CameraBasis(NamedTuple):
    eye: jnp.ndarray  # [3]
    u: jnp.ndarray  # [3] right axis, scaled by tan(hfov/2) * |W|
    v: jnp.ndarray  # [3] up axis, scaled by tan(vfov/2) * |W|
    w: jnp.ndarray  # [3] view axis, |W| = focal distance


def camera_basis(cfg: CameraConfig, rotation: np.ndarray | None = None) -> CameraBasis:
    """Eye/U/V/W from config (sutil::calculateCameraVariables semantics).

    ``rotation`` (optional [3, 3]) applies an arcball-style orbit of the
    camera frame around the look-at point (Camera.cpp:100-134)."""
    eye = np.asarray(cfg.eye, np.float32)
    look_at = np.asarray(cfg.look_at, np.float32)
    up = np.asarray(cfg.up, np.float32)
    if rotation is not None:
        eye = look_at + (eye - look_at) @ np.asarray(rotation, np.float32).T
        up = up @ np.asarray(rotation, np.float32).T
    w = look_at - eye
    wlen = np.linalg.norm(w)
    u = np.cross(w, up)
    u /= np.linalg.norm(u)
    v = np.cross(u, w)
    v /= np.linalg.norm(v)
    tan_h, tan_v = fov_tan_halves(cfg.hfov_deg, cfg.width, cfg.height)
    u = u * wlen * tan_h
    v = v * wlen * tan_v
    return CameraBasis(
        eye=jnp.asarray(eye), u=jnp.asarray(u), v=jnp.asarray(v), w=jnp.asarray(w)
    )


def generate_rays(
    basis: CameraBasis, width: int, height: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All primary rays for a frame → (origins [H*W, 3], directions [H*W, 3]).

    Pixel (x, y) maps to NDC d = (x, y) / (W, H) * 2 - 1 exactly as the
    reference (cameraCommon.cuh:22) — i.e. the sample sits at the pixel's
    lower-left corner; progressive estimation does not jitter the subpixel
    position (variance comes from the path RNG), matching the reference.
    """
    xs = (jnp.arange(width, dtype=jnp.float32) / width) * 2.0 - 1.0
    ys = (jnp.arange(height, dtype=jnp.float32) / height) * 2.0 - 1.0
    dx, dy = jnp.meshgrid(xs, ys)  # [H, W]
    d = (
        dx[..., None] * basis.u + dy[..., None] * basis.v + basis.w
    )  # [H, W, 3]
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(basis.eye, d.shape)
    return origins.reshape(-1, 3), d.reshape(-1, 3)


def intersect_box(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    static: SceneStatic,
    bbox_size: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slab test against the centered cloud box → (hit [N] bool, t_hit [N]).

    The box spans [-bbox/2, +bbox/2] in world coords.  If the entry point is
    behind (or too close to) the origin but the exit is ahead, the hit is
    reported at ``minimal_ray_distance`` so rays starting inside the volume
    still enter the march (cloudBBox.cu:19-36).
    """
    half = bbox_size * 0.5
    inv = 1.0 / directions  # IEEE inf for axis-parallel rays is fine here
    t0 = (-half - origins) * inv
    t1 = (half - origins) * inv
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (t_near < t_far) & (t_far > 0.0)
    t_hit = jnp.maximum(t_near, static.minimal_ray_distance)
    return hit, t_hit


def sky_gradient(params: SceneParams, directions: jnp.ndarray) -> jnp.ndarray:
    """Ground↔sky lerp on direction.y (cloud.cuh sampleSky:124-132)."""
    t = jnp.clip((directions[..., 1] + 0.5) / 1.5, 0.0, 1.0)[..., None]
    return params.ground_intensity * (1.0 - t) + params.sky_intensity * t


def sun_disc(
    params: SceneParams, static: SceneStatic, directions: jnp.ndarray
) -> jnp.ndarray:
    """Full sun radiance inside the disc, else 0 (cloud.cuh
    sampleSun:134-144)."""
    cos_light = (-params.light_dir * directions).sum(axis=-1)
    in_sun = cos_light > static.sun_cos_half_angle
    return jnp.where(in_sun[..., None], params.light_radiance, 0.0)


def miss_radiance(params: SceneParams, static: SceneStatic, directions: jnp.ndarray) -> jnp.ndarray:
    """Sun disc else sky gradient (pathTracingCamera.cu:31-51)."""
    cos_light = (-params.light_dir * directions).sum(axis=-1)
    in_sun = cos_light > static.sun_cos_half_angle
    return jnp.where(
        in_sun[..., None], params.light_radiance, sky_gradient(params, directions)
    )
