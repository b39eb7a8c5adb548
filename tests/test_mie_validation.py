"""Validate the regenerated Mie tables against the reference's table shape.

VERDICT r1 item #8: the chopped-Mie variant was an unvalidated approximation.
These tests pin the regenerated tables (tools/gen_mie.py — Bohren-Huffman
over a fitted modified-gamma droplet distribution) to anchors derived from
the reference's published ``mie[]`` / ``choppedMie[]`` tables
(DG/src/Mie.cpp:8, :4107) — a handful of derived scalars, not copied data.

When ``/root/reference`` is mounted, a second test re-measures the full
curve/CDF discrepancy live (tools/validate_mie.py) and bounds it.
"""

import os

import numpy as np
import pytest

ASSET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "deepestscatter_tpu",
    "assets",
    "mie_4096.npz",
)

# Anchors derived from the reference tables (see tools/validate_mie.py).
REF_G_FULL = 0.97496  # asymmetry parameter of mie[]
REF_G_CHOPPED = 0.75022  # asymmetry parameter of choppedMie[]
REF_PEAK_OVER_MEAN = 3629.36  # forward diffraction spike height
REF_BACKSCATTER_OVER_MEAN = 0.13570  # mie[0] / mean(mie)
REF_CHOP_ENERGY_REMOVED = 0.89981  # 1 - sum(chopped)/sum(mie)
# Chopped-phase CDF (solid-angle measure, uniform-cosθ grid) at probe cosθ.
REF_CHOP_CDF_PROBES = [-0.9, -0.5, 0.0, 0.5, 0.8, 0.9, 0.95, 0.99, 0.995]
REF_CHOP_CDF_VALUES = [0.01111, 0.05723, 0.06720, 0.10787, 0.30034, 0.50034, 0.67817, 0.90988, 0.95424]
# Mean-normalized full-Mie curve at probe scattering angles (degrees).
REF_CURVE_PROBES_DEG = [180, 140, 100, 60, 40, 20, 10, 5, 3]
REF_CURVE_VALUES = [0.1357, 0.0703, 0.0034, 0.0476, 0.2245, 0.8062, 1.4176, 2.7426, 7.2045]

REF_MIE_CPP = "/root/reference/DeepestScatter_DataGen/DeepestScatter_DataGen/src/Mie.cpp"


@pytest.fixture(scope="module")
def tables():
    data = np.load(ASSET)
    return data["mie_raw"], data["chopped_raw"]


class TestMieAnchors:
    def test_asymmetry_parameters(self, tables):
        mie, chop = tables
        x = np.linspace(-1, 1, mie.shape[0])
        g_full = np.sum(x * mie) / mie.sum()
        g_chop = np.sum(x * chop) / chop.sum()
        assert abs(g_full - REF_G_FULL) < 2e-3
        assert abs(g_chop - REF_G_CHOPPED) < 6e-3

    def test_forward_spike_and_backscatter(self, tables):
        mie, _ = tables
        np.testing.assert_allclose(mie.max() / mie.mean(), REF_PEAK_OVER_MEAN, rtol=0.02)
        np.testing.assert_allclose(mie[0] / mie.mean(), REF_BACKSCATTER_OVER_MEAN, rtol=0.20)

    def test_chop_energy_fraction(self, tables):
        mie, chop = tables
        removed = 1.0 - chop.sum() / mie.sum()
        assert abs(removed - REF_CHOP_ENERGY_REMOVED) < 0.01

    def test_chopped_cdf_anchors(self, tables):
        """Bounds the direction-sampling CDF discrepancy (VERDICT #8 'done' bar)."""
        _, chop = tables
        x = np.linspace(-1, 1, chop.shape[0])
        cdf = np.cumsum(chop / chop.sum())
        ours = np.interp(REF_CHOP_CDF_PROBES, x, cdf)
        np.testing.assert_allclose(ours, REF_CHOP_CDF_VALUES, atol=0.01)

    def test_normalized_curve_anchors(self, tables):
        """Fogbow, glory, and forward-lobe amplitudes of the NEE weight curve."""
        mie, _ = tables
        x = np.linspace(-1, 1, mie.shape[0])
        theta = np.degrees(np.arccos(np.clip(x, -1, 1)))
        mn = mie / mie.mean()
        for deg, want in zip(REF_CURVE_PROBES_DEG, REF_CURVE_VALUES):
            got = mn[np.argmin(np.abs(theta - deg))]
            # log-space tolerance; the 100-deg minimum is tiny and most sensitive
            assert abs(np.log(got / want)) < np.log(1.6), f"at {deg} deg: {got} vs {want}"


@pytest.mark.skipif(not os.path.exists(REF_MIE_CPP), reason="reference not mounted")
def test_live_reference_comparison(tables):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from validate_mie import compare, parse_reference_tables

    ref_mie, ref_chop = parse_reference_tables()
    report = compare(ref_mie, ref_chop, tables[0], tables[1])
    assert report["mie"]["cdf_max_abs_diff"] < 0.01
    assert report["chopped"]["cdf_max_abs_diff"] < 0.015
    assert report["inverse_cdf"]["median_angular_err_deg"] < 0.5
    assert report["inverse_cdf"]["max_angular_err_deg"] < 5.0


def test_fast_sampler_render_ab(monkeypatch):
    """Render-level A/B: the fast inverse-table direction sampler vs the
    exact piecewise-linear CDF inversion must leave the estimator unchanged
    within Monte-Carlo noise (VERDICT r4 item 7's acceptance check).  Same
    seeds; only the scatter-cosine draw differs (by <= the fast-path lerp
    error, max 0.037 deg at 16k entries)."""
    import jax.numpy as jnp

    from deepestscatter_tpu import scene as scene_mod
    from deepestscatter_tpu.config import (
        CameraConfig,
        CloudModel,
        CloudRendering,
        SceneConfig,
    )
    from deepestscatter_tpu.data import procedural
    from deepestscatter_tpu.ops import phase as phase_ops
    from deepestscatter_tpu.render import camera as camera_ops
    from deepestscatter_tpu.render import inscatter
    from deepestscatter_tpu.render import pathtracer as pt

    cfg = SceneConfig(
        cloud=CloudModel(size_m=900.0),
        camera=CameraConfig(width=16, height=8),
        rendering=CloudRendering(max_depth=20, sample_step=1.0 / 64.0),
    )
    density = procedural.cumulus(resolution=24, seed=3)
    params, static = scene_mod.build_scene(cfg, density)
    params = inscatter.with_baked_inscatter(params, static)
    basis = camera_ops.camera_basis(cfg.camera)
    o, d = camera_ops.generate_rays(basis, 16, 8)

    def render_sum(n_sub):
        acc = 0.0
        for s in range(n_sub):
            img = pt.render_subframe(params, static, o, d, 11, jnp.int32(s))
            acc = acc + np.asarray(img)
        return acc / n_sub

    fast = render_sum(6)
    monkeypatch.setattr(
        phase_ops, "sample_cos_theta_fast",
        lambda table, u: phase_ops.sample_cos_theta(table, u),
    )
    exact = render_sum(6)
    # Identical RNG streams; the only divergence is the sub-0.04-deg
    # direction perturbation, which decorrelates a small minority of deep
    # paths.  The image MEANS must agree tightly.
    assert abs(fast.mean() - exact.mean()) / exact.mean() < 0.02
    # And the majority of pixels must be bitwise or near-identical.
    rel = np.abs(fast - exact) / (np.abs(exact) + 1e-6)
    assert np.median(rel) < 1e-3
