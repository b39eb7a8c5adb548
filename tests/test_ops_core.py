"""Unit tests for the core ops: grids, phase tables, RNG, Welford, tetra,
tone mapping, EXR IO.  Strategy per SURVEY.md §4: kernels validated against
NumPy/analytic references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepestscatter_tpu.ops import grid, phase, rng as rng_ops, tetra, tonemap, welford
from deepestscatter_tpu.utils import exr


class TestGrid:
    def test_mipmaps_shapes(self):
        g = np.random.default_rng(0).random((16, 8, 4)).astype(np.float32)
        mips = grid.build_mipmaps(g)
        assert mips[0].shape == (16, 8, 4)
        assert mips[1].shape == (8, 4, 2)
        assert mips[-1].shape == (1, 1, 1)

    def test_mipmaps_preserve_mean_pow2(self):
        g = np.random.default_rng(0).random((8, 8, 8)).astype(np.float32)
        mips = grid.build_mipmaps(g)
        for m in mips:
            np.testing.assert_allclose(m.mean(), g.mean(), rtol=1e-5)

    def test_trilinear_at_texel_centers(self):
        g = np.random.default_rng(1).random((4, 5, 6)).astype(np.float32)
        nz, ny, nx = g.shape
        # Sample at every texel center: must return the exact texel value.
        zi, yi, xi = np.meshgrid(range(nz), range(ny), range(nx), indexing="ij")
        u = np.stack(
            [(xi + 0.5) / nx, (yi + 0.5) / ny, (zi + 0.5) / nz], axis=-1
        ).astype(np.float32)
        vals = grid.sample_trilinear(jnp.asarray(g), jnp.asarray(u.reshape(-1, 3)))
        np.testing.assert_allclose(np.asarray(vals), g.ravel(), rtol=1e-6)

    def test_trilinear_midpoint(self):
        g = np.zeros((1, 1, 2), np.float32)
        g[0, 0, 1] = 1.0
        # Midpoint between the two texel centers along x.
        v = grid.sample_trilinear(jnp.asarray(g), jnp.asarray([[0.5, 0.5, 0.5]]))
        np.testing.assert_allclose(np.asarray(v), [0.5], atol=1e-6)

    def test_clamp_to_edge(self):
        g = np.arange(8, dtype=np.float32).reshape(2, 2, 2)
        v = grid.sample_trilinear(
            jnp.asarray(g), jnp.asarray([[-1.0, -1.0, -1.0], [2.0, 2.0, 2.0]])
        )
        np.testing.assert_allclose(np.asarray(v), [g[0, 0, 0], g[1, 1, 1]])

    def test_sample_mip_lerp_between_levels(self):
        g = np.random.default_rng(2).random((8, 8, 8)).astype(np.float32)
        mips = [jnp.asarray(m) for m in grid.build_mipmaps(g)]
        u = jnp.asarray([[0.4, 0.6, 0.3]])
        v0 = grid.sample_mip(mips, u, 0.0)
        v1 = grid.sample_mip(mips, u, 1.0)
        vh = grid.sample_mip(mips, u, 0.5)
        np.testing.assert_allclose(
            np.asarray(vh), np.asarray(0.5 * (v0 + v1)), rtol=1e-5
        )


class TestPhase:
    def test_normalization_mean_one(self):
        t = phase.load_phase_table()
        # Table-mean 1 ⇔ (1/4π)∫p dΩ = 1 on the tabulated function.
        np.testing.assert_allclose(float(t.mie.mean()), 1.0, rtol=1e-5)
        np.testing.assert_allclose(float(t.chopped.mean()), 1.0, rtol=1e-5)

    def test_forward_peak(self):
        t = phase.load_phase_table()
        assert float(t.mie[-1]) > 100.0  # strong forward diffraction spike
        assert float(t.chopped.max()) < float(t.mie.max())

    def test_cdf_monotone(self):
        t = phase.load_phase_table()
        c = np.asarray(t.chopped_cdf)
        assert (np.diff(c) >= 0).all()
        np.testing.assert_allclose(c[-1], 1.0, rtol=1e-6)

    def test_eval_phase_interpolates(self):
        t = phase.load_phase_table()
        n = t.mie.shape[0]
        # At u = (i + 0.5) / n the lookup hits entry i exactly.
        cos = 2.0 * (jnp.asarray([10.5, 100.5]) / n) - 1.0
        v = phase.eval_phase(t.mie, cos)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(t.mie)[[10, 100]], rtol=1e-5
        )

    def test_inverse_cdf_roundtrip(self):
        t = phase.load_phase_table()
        u = jnp.linspace(0.01, 0.99, 257)
        cos = phase.sample_cos_theta(t, u)
        assert (np.diff(np.asarray(cos)) >= -1e-6).all()  # monotone in u
        # Forward CDF at the sampled points must recover u.
        m = (np.asarray(cos) + 1.0) / 2.0
        cdf = np.asarray(t.chopped_cdf)
        n = len(cdf)
        tpos = m * n - 0.5
        i0 = np.clip(np.floor(tpos).astype(int), 0, n - 1)
        i1 = np.clip(i0 + 1, 0, n - 1)
        frac = tpos - np.floor(tpos)
        fwd = cdf[i0] * (1 - frac) + cdf[i1] * frac
        np.testing.assert_allclose(fwd, np.asarray(u), atol=1e-4)

    def test_sampling_matches_distribution(self):
        """Histogram of sampled cosθ matches the chopped phase density."""
        t = phase.load_phase_table()
        u = jax.random.uniform(jax.random.key(0), (200_000,))
        cos = np.asarray(phase.sample_cos_theta(t, u))
        hist, edges = np.histogram(cos, bins=64, range=(-1, 1), density=True)
        # Expected density = bin-averaged chopped phase / 2 (the Mie table
        # ripples within a bin, so bin centers are not representative).
        table = np.asarray(t.chopped)
        expected = table.reshape(64, -1).mean(axis=1) / 2.0
        mask = expected > 0.05
        np.testing.assert_allclose(hist[mask], expected[mask], rtol=0.12)


class TestRng:
    def test_hash_uniform_range_and_determinism(self):
        ids = jnp.arange(10_000, dtype=jnp.uint32)
        u1 = rng_ops.hash_uniform(7, ids, 3)
        u2 = rng_ops.hash_uniform(7, ids, 3)
        np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
        u = np.asarray(u1)
        assert (u >= 0).all() and (u < 1).all()
        assert abs(u.mean() - 0.5) < 0.01
        # Different counters decorrelate.
        u3 = np.asarray(rng_ops.hash_uniform(7, ids, 4))
        assert abs(np.corrcoef(u, u3)[0, 1]) < 0.05

    def test_uniform_on_sphere(self):
        k = jax.random.key(1)
        u, v = jax.random.uniform(k, (2, 50_000))
        d = np.asarray(rng_ops.uniform_on_sphere(u, v))
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
        assert np.abs(d.mean(0)).max() < 0.02

    def test_onb_orthonormal(self):
        k = jax.random.key(2)
        u, v = jax.random.uniform(k, (2, 1000))
        n = rng_ops.uniform_on_sphere(u, v)
        t, b = rng_ops.make_onb(n)
        tn, bn, nn = np.asarray(t), np.asarray(b), np.asarray(n)
        np.testing.assert_allclose((tn * bn).sum(-1), 0, atol=1e-5)
        np.testing.assert_allclose((tn * nn).sum(-1), 0, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(tn, axis=-1), 1, atol=1e-5)
        # Right-handed: t × b == n
        np.testing.assert_allclose(np.cross(tn, bn), nn, atol=1e-5)

    def test_cone_sampling(self):
        k = jax.random.key(3)
        u = jax.random.uniform(k, (1000,))
        cos_t = jnp.full((1000,), 0.8)
        d = np.asarray(rng_ops.uniform_on_sphere_circle(u, cos_t))
        np.testing.assert_allclose(d[:, 2], 0.8, atol=1e-6)
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)

    def test_disc_perpendicular(self):
        k = jax.random.key(4)
        u, v = jax.random.uniform(k, (2, 1000))
        normal = jnp.asarray([0.0, 1.0, 0.0])
        normal = jnp.broadcast_to(normal, (1000, 3))
        p = np.asarray(rng_ops.uniform_on_disc(u, v, normal))
        np.testing.assert_allclose(p[:, 1], 0.0, atol=1e-6)
        r = np.linalg.norm(p, axis=-1)
        assert r.max() <= 1.0 + 1e-5


def _welford_scan(xs: np.ndarray) -> welford.Welford:
    """Fold samples through welford.update in one jitted scan."""
    def step(st, x):
        return welford.update(st, x), None

    st, _ = jax.lax.scan(step, welford.Welford.zeros(()), jnp.asarray(xs))
    return st


class TestWelford:
    def test_update_matches_numpy(self, rng):
        xs = rng.standard_normal(500).astype(np.float32) * 3 + 2
        st = _welford_scan(xs)
        np.testing.assert_allclose(float(st.mean), xs.mean(), rtol=1e-4)
        np.testing.assert_allclose(
            float(st.m2) / len(xs), xs.var(), rtol=1e-3
        )

    def test_merge_associative(self, rng):
        xs = rng.standard_normal(300).astype(np.float32)
        parts = [_welford_scan(chunk) for chunk in np.split(xs, 3)]
        merged = welford.merge(welford.merge(parts[0], parts[1]), parts[2])
        np.testing.assert_allclose(float(merged.mean), xs.mean(), rtol=1e-4)
        np.testing.assert_allclose(float(merged.m2) / len(xs), xs.var(), rtol=1e-3)

    def test_moment_roundtrip(self, rng):
        xs = rng.standard_normal(100).astype(np.float32)
        st = _welford_scan(xs)
        rt = welford.from_moments(*welford.to_moments(st))
        np.testing.assert_allclose(float(rt.mean), float(st.mean), rtol=1e-5)
        np.testing.assert_allclose(float(rt.m2), float(st.m2), rtol=1e-3)

    def test_convergence_gate(self):
        st = welford.Welford(
            mean=jnp.float32(10.0), m2=jnp.float32(0.01 * 1000), count=jnp.float32(1000)
        )
        assert bool(welford.is_converged(st, 0.02, 1e-4))


class TestTetra:
    def test_barycentric_sums_to_one(self, rng):
        p = jnp.asarray(rng.random((100, 3)), jnp.float32)
        corners, w = tetra.probe_interpolation(p * 3.0)
        np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-4)

    def test_weights_reconstruct_point(self, rng):
        """Barycentric property: Σ wᵢ · cornerᵢ == the point itself."""
        p = jnp.asarray(rng.random((200, 3)) * 3.0, jnp.float32)
        corners, w = tetra.probe_interpolation(p)
        recon = (np.asarray(corners) * np.asarray(w)[..., None]).sum(axis=1)
        np.testing.assert_allclose(recon, np.asarray(p), atol=1e-3)

    def test_vertex_exact(self):
        p = jnp.asarray([[1.0, 2.0, 1.0]])
        corners, w = tetra.probe_interpolation(p)
        recon = (np.asarray(corners) * np.asarray(w)[..., None]).sum(axis=1)
        np.testing.assert_allclose(recon[0], [1, 2, 1], atol=1e-5)


class TestTonemap:
    def test_range_and_gamma(self):
        img = jnp.asarray(np.random.default_rng(0).random((8, 8, 3)) * 10)
        out = np.asarray(tonemap.reinhard(img, exposure=0.4))
        assert (out >= 0).all() and (out <= 1).all()

    def test_monotone_in_luminance(self):
        lo = jnp.full((4, 4, 3), 0.5)
        hi = jnp.full((4, 4, 3), 2.0)
        img = jnp.concatenate([lo, hi], axis=0)
        out = np.asarray(tonemap.reinhard(img, exposure=0.4))
        assert out[:4].mean() < out[4:].mean()


class TestExr:
    def test_roundtrip(self, tmp_path, rng):
        img = rng.random((17, 23, 3)).astype(np.float32)
        p = str(tmp_path / "test.exr")
        exr.write_exr(p, img)
        back = exr.read_exr(p)
        np.testing.assert_array_equal(back, img)


def test_mipmaps_off_keeps_base_level_only():
    """CloudModel(mipmaps=OFF) builds a 1-level pyramid (SceneDescription.h
    mipmapsOn); descriptor LODs clamp to level 0 and gathers still work."""
    import jax.numpy as jnp

    from deepestscatter_tpu import scene as scene_mod
    from deepestscatter_tpu.config import (
        CloudModel,
        MipmapsMode,
        SceneConfig,
    )
    from deepestscatter_tpu.data import procedural
    from deepestscatter_tpu.ops import descriptor as desc_ops

    density = procedural.cumulus(resolution=16, seed=2)
    cfg = SceneConfig(cloud=CloudModel(size_m=800.0, mipmaps=MipmapsMode.OFF))
    params, static = scene_mod.build_scene(cfg, density)
    assert len(params.density_mips) == 1
    assert static.n_mips == 1
    pos = jnp.zeros((4, 3)) + 0.5 * params.bbox_size
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4, 1))
    layers = desc_ops.gather_descriptor(params, static, pos, d, n_layers=10)
    assert bool(jnp.isfinite(layers).all())

    cfg_on = SceneConfig(cloud=CloudModel(size_m=800.0))
    params_on, _ = scene_mod.build_scene(cfg_on, density)
    assert len(params_on.density_mips) > 1
