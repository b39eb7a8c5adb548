"""Tests for the RPNN and baked-probe neural renderers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepestscatter_tpu import scene as scene_mod
from deepestscatter_tpu.config import SceneConfig, CameraConfig, CloudModel
from deepestscatter_tpu.models.probes import LightProbeModel, ProbeRendererModel
from deepestscatter_tpu.models.rpnn import DisneyModel
from deepestscatter_tpu.render import baked as baked_mod
from deepestscatter_tpu.render import camera as camera_ops
from deepestscatter_tpu.render import inscatter
from deepestscatter_tpu.render import neural


@pytest.fixture(scope="module")
def tiny_scene():
    from deepestscatter_tpu.data import procedural

    cfg = SceneConfig(
        cloud=CloudModel(size_m=1000.0),
        camera=CameraConfig(width=24, height=16),
    )
    density = procedural.cumulus(resolution=24, seed=7)
    params, static = scene_mod.build_scene(cfg, density)
    params = inscatter.with_baked_inscatter(params, static)
    return cfg, params, static


def _rays(cfg):
    basis = camera_ops.camera_basis(cfg.camera)
    return camera_ops.generate_rays(basis, cfg.camera.width, cfg.camera.height)


class TestDisneyRenderer:
    def test_render_finite_and_deterministic(self, tiny_scene):
        cfg, params, static = tiny_scene
        model = DisneyModel()
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 10, 226))
        )
        origins, directions = _rays(cfg)
        out1 = neural.render_disney(
            params, static, model, variables, origins, directions, seed=3
        )
        out2 = neural.render_disney(
            params, static, model, variables, origins, directions, seed=3
        )
        assert np.all(np.isfinite(np.asarray(out1)))
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    def test_misses_shade_sky(self, tiny_scene):
        cfg, params, static = tiny_scene
        model = DisneyModel()
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 226)))
        origins, directions = _rays(cfg)
        hit, _ = camera_ops.intersect_box(
            origins, directions, static, params.bbox_size
        )
        out = neural.render_disney(
            params, static, model, variables, origins, directions
        )
        miss_expected = camera_ops.miss_radiance(params, static, directions)
        missed = ~np.asarray(hit)
        assert missed.any()
        np.testing.assert_allclose(
            np.asarray(out)[missed], np.asarray(miss_expected)[missed]
        )

    def test_composite_identity(self):
        """(pred + direct) * (1 - T) for scattered; black non-scatter hits;
        miss radiance for misses (disneyCamera.cu:38-46)."""
        cs = neural.ConditionalScatter(
            transmittance=jnp.asarray([0.25, 0.9, 0.5]),
            scatter_pos=jnp.zeros((3, 3)),
            has_scattered=jnp.asarray([True, False, True]),
            direct=jnp.asarray([[1.0, 2.0, 3.0], [0, 0, 0], [1, 1, 1]]),
        )
        predicted = jnp.asarray([4.0, 5.0, 6.0])
        miss = jnp.full((3, 3), 9.0)
        hit = jnp.asarray([True, True, False])
        out = np.asarray(neural.composite(predicted, cs, miss, hit))
        np.testing.assert_allclose(
            out[0], (np.array([1, 2, 3]) + 4.0) * 0.75, rtol=1e-6
        )
        np.testing.assert_allclose(out[1], 0.0)
        np.testing.assert_allclose(out[2], 9.0)

    def test_conditional_scatter_importance_identity(self, tiny_scene):
        """The conditional draw od = 1 - u(1 - T) lands in (T, 1], i.e. the
        scatter event happens before exit for every u in (0, 1)."""
        cfg, params, static = tiny_scene
        origins, directions = _rays(cfg)
        hit, t_hit = camera_ops.intersect_box(
            origins, directions, static, params.bbox_size
        )
        entry = origins + directions * t_hit[:, None] + 0.5 * params.bbox_size
        ray_ids = jnp.arange(origins.shape[0], dtype=jnp.uint32)
        cs = neural.conditional_scatter(
            params, static, entry, directions, hit, jnp.uint32(0), ray_ids
        )
        hit_np = np.asarray(hit)
        t = np.asarray(cs.transmittance)[hit_np]
        # Where the cloud has any extinction (T < 1), the ray must scatter.
        scattered = np.asarray(cs.has_scattered)[hit_np]
        assert np.all(scattered[t < 0.999])


class TestCompactedFrames:
    """The scatter-compacted frame schedule (camera_pass + shade_compacted)
    must reproduce the direct megabatch renders: compaction only reorders
    row-independent shade work (DisneyRenderer.cpp:84-94 is the reference's
    own host scatter check)."""

    def test_disney_frame_matches_megabatch(self, tiny_scene):
        cfg, params, static = tiny_scene
        model = DisneyModel()
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 226)))
        origins, directions = _rays(cfg)
        direct = neural.render_disney(
            params, static, model, variables, origins, directions, seed=3
        )
        renderer = neural.DisneyRenderer(model, variables)
        renderer.TILE = 64  # force multiple shade tiles + a padded tail
        basis = camera_ops.camera_basis(cfg.camera)
        frame = renderer.render_frame(
            params, static, cfg.camera.width, cfg.camera.height, basis, seed=3
        )
        np.testing.assert_allclose(
            np.asarray(frame).reshape(-1, 3),
            np.asarray(direct),
            rtol=2e-5,
            atol=1e-6,
        )

    def test_baked_frame_matches_megabatch(self, tiny_scene):
        cfg, params, static = tiny_scene
        probe_model = LightProbeModel()
        probe_vars = probe_model.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 9, 225))
        )
        rend_model = ProbeRendererModel()
        rend_vars = rend_model.init(
            jax.random.PRNGKey(2), jnp.zeros((1, 202)), jnp.zeros((1, 3, 226))
        )
        renderer = baked_mod.BakedRenderer(
            params, static, probe_model, probe_vars, rend_model, rend_vars
        )
        renderer.TILE = 64
        origins, directions = _rays(cfg)
        direct = baked_mod.render_baked(
            params, static, rend_model, rend_vars, renderer.probes,
            origins, directions, seed=5,
        )
        basis = camera_ops.camera_basis(cfg.camera)
        frame = renderer.render_frame(
            params, static, cfg.camera.width, cfg.camera.height, basis, seed=5
        )
        np.testing.assert_allclose(
            np.asarray(frame).reshape(-1, 3),
            np.asarray(direct),
            rtol=2e-5,
            atol=1e-6,
        )

    def test_compact_camera_matches_camera_pass(self, tiny_scene):
        """CompactCamera (box pass + hit-compacted pass-1 march +
        T<1-compacted pass-2 march) must reproduce the whole-frame
        camera_pass: RNG keys on global ray ids and the stage-3 mask
        (T < 1) is exactly the scatter condition of od = 1 - u(1 - T)."""
        cfg, params, static = tiny_scene
        origins, directions = _rays(cfg)
        ids = jnp.arange(origins.shape[0], dtype=jnp.uint32)
        ref_cs, ref_hit, ref_miss = neural.camera_pass(
            params, static, origins, directions, jnp.uint32(7), ids
        )
        cam = neural.CompactCamera()
        cam.MARCH_TILE = 64  # force several march tiles + padded tails
        cs, hit, miss = cam.run(
            params, static, origins, directions, jnp.uint32(7), ids
        )
        np.testing.assert_array_equal(np.asarray(hit), np.asarray(ref_hit))
        np.testing.assert_array_equal(
            np.asarray(cs.has_scattered), np.asarray(ref_cs.has_scattered)
        )
        # Tolerance: XLA fuses the march arithmetic differently at the
        # two batch shapes (fma/reassociation) — ~1e-5 relative noise.
        np.testing.assert_allclose(
            np.asarray(cs.transmittance),
            np.asarray(ref_cs.transmittance),
            rtol=3e-5,
            atol=3e-6,
        )
        scat = np.asarray(cs.has_scattered)
        np.testing.assert_allclose(
            np.asarray(cs.scatter_pos)[scat],
            np.asarray(ref_cs.scatter_pos)[scat],
            rtol=1e-5,
            atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(cs.direct)[scat],
            np.asarray(ref_cs.direct)[scat],
            rtol=1e-5,
            atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(miss), np.asarray(ref_miss), rtol=1e-6
        )

    def test_no_scatter_frame(self, tiny_scene):
        """A frame whose rays all miss the cloud never launches a shade
        tile and composites pure miss radiance."""
        cfg, params, static = tiny_scene
        model = DisneyModel()
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 226)))
        renderer = neural.DisneyRenderer(model, variables)
        n = 32
        origins = jnp.tile(jnp.asarray([[3.0, 5.0, 0.0]], jnp.float32), (n, 1))
        directions = jnp.tile(
            jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1)
        )
        ids = jnp.arange(n, dtype=jnp.uint32)
        cs, hit, miss = neural.camera_pass(
            params, static, origins, directions, jnp.uint32(0), ids
        )
        assert not bool(jnp.any(cs.has_scattered))

        def boom(p, d):  # pragma: no cover - must not be called
            raise AssertionError("shade launched with zero scattered pixels")

        predicted = neural.shade_compacted(boom, cs, directions, tile=16)
        out = neural.composite(predicted, cs, miss, hit)
        np.testing.assert_allclose(np.asarray(out), np.asarray(miss))


class TestBakedRenderer:
    def test_lattice_shape(self, tiny_scene):
        cfg, params, static = tiny_scene
        lattice = baked_mod.probe_lattice_shape(
            static, params.bbox_size.tolist()
        )
        # cloud is 1000 m, mfp 10 m → 100 mfp → ceil(100/6)+1 = 18 per axis.
        assert lattice == (18, 18, 18)

    def test_constant_probe_interpolation(self, tiny_scene):
        """Barycentric weights are a partition of unity: constant probes
        interpolate to the constant."""
        cfg, params, static = tiny_scene
        probes = jnp.full((4, 4, 4, 200), 0.5, jnp.float32)
        pos = jnp.asarray(
            np.random.default_rng(0).uniform(0.05, 0.5, (64, 3)),
            jnp.float32,
        )
        out = baked_mod.interpolate_probes(probes, static, pos)
        np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-5)

    def test_uint8_dequantization(self, tiny_scene):
        cfg, params, static = tiny_scene
        probes = jnp.full((4, 4, 4, 200), 128, jnp.uint8)
        pos = jnp.full((5, 3), 0.1, jnp.float32)
        out = baked_mod.interpolate_probes(probes, static, pos)
        np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-5)

    def test_end_to_end_render(self, tiny_scene):
        cfg, params, static = tiny_scene
        probe_model = LightProbeModel()
        probe_vars = probe_model.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 9, 225))
        )
        rend_model = ProbeRendererModel()
        rend_vars = rend_model.init(
            jax.random.PRNGKey(2), jnp.zeros((1, 202)), jnp.zeros((1, 3, 226))
        )
        renderer = baked_mod.BakedRenderer(
            params, static, probe_model, probe_vars, rend_model, rend_vars
        )
        assert renderer.probes.shape == (18, 18, 18, 200)
        assert renderer.probes.dtype == jnp.uint8
        basis = camera_ops.camera_basis(cfg.camera)
        frame = renderer.render_frame(
            params, static, cfg.camera.width, cfg.camera.height, basis
        )
        assert frame.shape == (16, 24, 3)
        assert np.all(np.isfinite(np.asarray(frame)))


def test_brick_mip_sampling_bitwise(tiny_scene):
    """ops.grid.sample_mip_bricks must reproduce the packed-corner
    sample_mip bit-for-bit (same quantized values, shared frac math, the
    corners extracted from the fetched lattice feed the identical 8-corner
    lerp).  The layout is NOT used by the descriptor — measured 15x slower
    there (negative result recorded in gather_descriptor) — but the
    equality contract keeps the helper honest for row-reusing callers."""
    import jax.numpy as jnp
    import numpy as np

    from deepestscatter_tpu.ops import grid as grid_ops

    cfg, params, static = tiny_scene
    tables = tuple(
        grid_ops.pack_bricks_single(m[..., 0], 3) for m in params.density_mips
    )
    rng = np.random.default_rng(8)
    u = jnp.asarray(rng.random((512, 3)).astype(np.float32))
    for lod in (0.0, 0.4, 1.0, 1.7):
        a = grid_ops.sample_mip_bricks(tables, static.mip_shapes, u, lod)
        b = grid_ops.sample_mip(params.density_mips, u, lod)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
