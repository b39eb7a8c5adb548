"""Physics tests: march vs closed-form Beer-Lambert, free-flight sampling
distribution, in-scatter bake, camera/box intersection, miss shading, and the
three path-tracing modes on tiny grids (SURVEY.md §4 test plan)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from deepestscatter_tpu.config import (
    CameraConfig,
    CloudModel,
    CloudRendering,
    DirectionalLight,
    RenderMode,
    SceneConfig,
)
from deepestscatter_tpu.data import procedural
from deepestscatter_tpu.ops import march as march_ops
from deepestscatter_tpu.render import camera as camera_ops
from deepestscatter_tpu.render import inscatter as inscatter_ops
from deepestscatter_tpu.render import pathtracer
from deepestscatter_tpu.scene import build_scene, is_in_box


def make_scene(density=None, mode=RenderMode.SUN_AND_SKY_ALL_SCATTER,
               size_m=640.0, light_dir=(0.0, -1.0, 0.0), sample_step=1 / 128):
    """Small scene: 32³ grid, density_multiplier = size/10."""
    if density is None:
        density = procedural.constant_box(32, 1.0)
    cfg = SceneConfig(
        light=DirectionalLight(direction=light_dir),
        cloud=CloudModel(size_m=size_m),
        rendering=CloudRendering(sample_step=sample_step, mode=mode, max_depth=50),
        camera=CameraConfig(width=16, height=8),
    )
    params, static = build_scene(cfg, density)
    return cfg, params, static


class TestMarch:
    def test_transmittance_constant_medium(self):
        """Beer-Lambert closed form through a uniform box: T = exp(-σ·L)."""
        cfg, params, static = make_scene(size_m=40.0)  # σ = 4 per unit length
        n = 8
        pos = jnp.tile(jnp.asarray([[0.0, 0.5, 0.5]]), (n, 1))
        direction = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (n, 1))
        od = jnp.zeros((n,))  # never scatter
        ev = march_ops.next_scattering_event(
            params, static, od, pos, direction, stop_at_scatter=False
        )
        # Path length through the box is 1 (normalized); σ = 40/10 = 4.
        # The marcher overshoots slightly: the reference's isInBox has a
        # ±0.01 margin (cloud.cuh:40-44) and the last step quantizes, so
        # the travelled distance is in [1, 1 + 0.01 + step].
        expected = math.exp(-4.0)
        t = np.asarray(ev.transmittance)
        assert (t <= expected * 1.001).all()
        assert (t >= expected * math.exp(-4.0 * (0.01 + 2 / 128))).all()
        assert not bool(ev.has_scattered.any())

    def test_scatter_position_free_flight(self):
        """With threshold od, the scatter point satisfies T(x) = od exactly
        in a constant medium: depth = -ln(od)/σ."""
        cfg, params, static = make_scene(size_m=100.0)  # σ = 10
        od = jnp.asarray([0.8, 0.5, 0.2])
        pos = jnp.tile(jnp.asarray([[0.0, 0.5, 0.5]]), (3, 1))
        direction = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (3, 1))
        ev = march_ops.next_scattering_event(params, static, od, pos, direction)
        assert bool(ev.has_scattered.all())
        depth = np.asarray(ev.scatter_pos)[:, 0]
        expected = -np.log(np.asarray(od)) / 10.0
        np.testing.assert_allclose(depth, expected, atol=0.02)

    def test_no_scatter_in_vacuum(self):
        cfg, params, static = make_scene(density=np.zeros((16, 16, 16), np.float32))
        pos = jnp.asarray([[0.0, 0.5, 0.5]])
        direction = jnp.asarray([[1.0, 0.0, 0.0]])
        ev = march_ops.next_scattering_event(
            params, static, jnp.asarray([0.5]), pos, direction
        )
        assert not bool(ev.has_scattered.any())
        np.testing.assert_allclose(float(ev.transmittance[0]), 1.0, atol=1e-5)
        # Exit position recorded past the box.
        assert float(ev.scatter_pos[0, 0]) > 1.0

    def test_exit_position_recorded(self):
        cfg, params, static = make_scene()
        pos = jnp.asarray([[0.0, 0.5, 0.5]])
        direction = jnp.asarray([[0.0, 0.0, 1.0]])
        ev = march_ops.next_scattering_event(
            params, static, jnp.asarray([0.0]), pos, direction
        )
        assert float(ev.scatter_pos[0, 2]) > 1.0


class TestInscatter:
    def test_vacuum_is_one(self):
        cfg, params, static = make_scene(density=np.zeros((8, 8, 8), np.float32))
        grid = np.asarray(inscatter_ops.bake(params, static, quantize=False))
        np.testing.assert_allclose(grid, 1.0, atol=1e-5)

    def test_constant_medium_profile(self):
        """Sun straight down (+y travel): T grows monotonically toward the
        sun and matches exp(-σ·thickness) at the bottom.  Uses a zero-padded
        slab (real imports pad by a voxel, Resources.cpp:89-91) because the
        marcher samples clamp-to-edge like the reference's tex3D."""
        from deepestscatter_tpu.ops.grid import pad_boundary

        density = pad_boundary(procedural.constant_box(28, 1.0), 2)  # 32³
        cfg, params, static = make_scene(density=density, size_m=20.0)  # σ = 2
        grid = np.asarray(inscatter_ops.bake(params, static, quantize=False))
        profile = grid[16, :, 16]
        assert (np.diff(profile) >= -1e-6).all()  # monotone toward the sun
        np.testing.assert_allclose(profile[-1], 1.0, atol=0.02)
        # Bottom voxel sees the full slab: 28/32 normalized units of σ = 2.
        np.testing.assert_allclose(
            profile[0], np.exp(-2.0 * 28 / 32), rtol=0.12
        )

    def test_quantization(self):
        cfg, params, static = make_scene(size_m=20.0)
        q = np.asarray(inscatter_ops.bake(params, static, quantize=True))
        np.testing.assert_allclose(q, np.floor(q * 255) / 255, atol=1e-7)


class TestCamera:
    def test_ray_directions_normalized(self):
        cfg = CameraConfig(width=32, height=16)
        basis = camera_ops.camera_basis(cfg)
        o, d = camera_ops.generate_rays(basis, cfg.width, cfg.height)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-6
        )
        assert o.shape == (512, 3) and d.shape == (512, 3)

    def test_central_ray_towards_lookat(self):
        cfg = CameraConfig(width=33, height=17)  # odd → a ray near center
        basis = camera_ops.camera_basis(cfg)
        look = np.asarray(cfg.look_at) - np.asarray(cfg.eye)
        look = look / np.linalg.norm(look)
        o, d = camera_ops.generate_rays(basis, cfg.width, cfg.height)
        dirs = np.asarray(d).reshape(17, 33, 3)
        # NDC for pixel (17, 9) is (2/33, 1/17) — close to center.
        np.testing.assert_allclose(dirs[8, 16], look, atol=0.05)

    def test_box_intersection(self):
        cfg, params, static = make_scene()
        o = jnp.asarray([[2.5, 0.0, 0.0], [2.5, 5.0, 0.0], [0.0, 0.0, 0.0]])
        d = jnp.asarray([[-1.0, 0.0, 0.0], [-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
        hit, t = camera_ops.intersect_box(o, d, static, params.bbox_size)
        assert bool(hit[0])  # through the box
        assert not bool(hit[1])  # offset above
        assert bool(hit[2])  # origin inside
        np.testing.assert_allclose(float(t[0]), 2.0, atol=1e-5)
        np.testing.assert_allclose(float(t[2]), static.minimal_ray_distance)

    def test_miss_shading_sun_disc(self):
        cfg, params, static = make_scene(light_dir=(0.0, -1.0, 0.0))
        d = jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
        r = np.asarray(camera_ops.miss_radiance(params, static, d))
        np.testing.assert_allclose(r[0], [1e6, 1e6, 1e6])  # into the sun
        # Horizon direction: t = (0 + 0.5)/1.5 = 1/3 between ground and sky.
        expected = np.asarray(cfg.sky.ground_intensity) * (2 / 3) + np.asarray(
            cfg.sky.sky_intensity
        ) * (1 / 3)
        np.testing.assert_allclose(r[1], expected, rtol=1e-5)


class TestPathTracer:
    @pytest.mark.parametrize(
        "mode",
        [
            RenderMode.SUN_AND_SKY_ALL_SCATTER,
            RenderMode.SUN_MULTIPLE_SCATTER,
            RenderMode.SUN_SINGLE_SCATTER,
        ],
    )
    def test_modes_run_and_finite(self, mode, small_cloud):
        cfg, params, static = make_scene(density=small_cloud, mode=mode)
        params = inscatter_ops.with_baked_inscatter(params, static)
        basis = camera_ops.camera_basis(cfg.camera)
        o, d = camera_ops.generate_rays(basis, cfg.camera.width, cfg.camera.height)
        r = np.asarray(
            pathtracer.render_subframe(params, static, o, d, 0, jnp.int32(1))
        )
        assert np.isfinite(r).all()
        assert (r >= 0).all()
        assert r.max() > 0  # something is lit

    def test_single_scatter_leq_total_on_average(self, small_cloud):
        """E[single-scatter radiance] ≤ E[all-scatter radiance] per pixel
        region (multi-scatter adds energy)."""
        imgs = {}
        for mode in (RenderMode.SUN_SINGLE_SCATTER, RenderMode.SUN_AND_SKY_ALL_SCATTER):
            cfg, params, static = make_scene(density=small_cloud, mode=mode)
            params = inscatter_ops.with_baked_inscatter(params, static)
            basis = camera_ops.camera_basis(cfg.camera)
            o, d = camera_ops.generate_rays(basis, cfg.camera.width, cfg.camera.height)
            acc = 0
            for s in range(16):
                acc += np.asarray(
                    pathtracer.render_subframe(params, static, o, d, 0, jnp.int32(s + 1))
                )
            hit, _ = camera_ops.intersect_box(o, d, static, params.bbox_size)
            imgs[mode] = (acc / 16)[np.asarray(hit)]
        assert imgs[RenderMode.SUN_SINGLE_SCATTER].mean() <= imgs[
            RenderMode.SUN_AND_SKY_ALL_SCATTER
        ].mean() * 1.05

    def test_deterministic(self, small_cloud):
        cfg, params, static = make_scene(density=small_cloud)
        params = inscatter_ops.with_baked_inscatter(params, static)
        basis = camera_ops.camera_basis(cfg.camera)
        o, d = camera_ops.generate_rays(basis, cfg.camera.width, cfg.camera.height)
        r1 = np.asarray(pathtracer.render_subframe(params, static, o, d, 0, jnp.int32(1)))
        r2 = np.asarray(pathtracer.render_subframe(params, static, o, d, 0, jnp.int32(1)))
        np.testing.assert_array_equal(r1, r2)
        r3 = np.asarray(pathtracer.render_subframe(params, static, o, d, 0, jnp.int32(2)))
        assert not np.array_equal(r1, r3)
