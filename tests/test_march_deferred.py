"""Equivalence of the deferred-scatter path-tracing loop vs the legacy oracle.

The deferred fast path (render.pathtracer._scatter_loop_deferred: ONE fused
density+inscatter row gather per cell, cell-resident substeps, batched
scatter resolves, exact empty-cell exit jumps) must compute the SAME
estimator as the legacy one-phase loop (march_deferred=False, two grid
gathers per step) — the estimator of the reference's
cloudRadianceMaterials.cu bounce loop.  RNG draws are keyed by
(seed, ray, depth), not by step index, so every variant replays identical
random sequences and the images must agree to float precision (summation-
order differences only); the empty-cell jump changes the positions by one
fused multiply-add vs repeated adds, so it is compared statistically on
the image mean.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from deepestscatter_tpu import scene as scene_mod
from deepestscatter_tpu.config import (
    CameraConfig,
    CloudModel,
    CloudRendering,
    SceneConfig,
)
from deepestscatter_tpu.data import procedural
from deepestscatter_tpu.render import camera as camera_ops
from deepestscatter_tpu.render import inscatter
from deepestscatter_tpu.render import pathtracer as pt


@pytest.fixture(scope="module")
def rig():
    cfg = SceneConfig(
        cloud=CloudModel(size_m=600.0),
        camera=CameraConfig(width=16, height=8),
        rendering=CloudRendering(max_depth=15, sample_step=1.0 / 64.0),
    )
    density = procedural.cumulus(resolution=24, seed=3)
    params, static = scene_mod.build_scene(cfg, density)
    params = inscatter.with_baked_inscatter(params, static)
    basis = camera_ops.camera_basis(cfg.camera)
    origins, directions = camera_ops.generate_rays(basis, 16, 8)

    def render(st):
        return np.asarray(
            pt.render_subframe(params, st, origins, directions, 7, jnp.int32(0))
        )

    return static, render


def test_deferred_matches_legacy_oracle(rig):
    """Deferred-scatter loop (skip off, identical step lattice and RNG draw
    sites) vs the legacy two-gather loop: per-pixel float-precision
    equality, for several substep/resolve-threshold settings."""
    static, render = rig
    img_leg = render(dataclasses.replace(static, march_deferred=False))
    scale = np.abs(img_leg).max() + 1e-9
    for n_sub, frac in [(1, 0.5), (4, 0.5), (8, 0.25), (4, 1.0)]:
        img_def = render(
            dataclasses.replace(
                static,
                march_deferred=True,
                march_empty_skip=False,
                march_substeps=n_sub,
                march_resolve_frac=frac,
            )
        )
        assert np.abs(img_def - img_leg).max() / scale < 1e-5, (n_sub, frac)


def test_deferred_empty_skip_unbiased(rig):
    """Deferred loop with empty-cell exit jumps: estimator mean unchanged."""
    static, render = rig
    img_skip = render(
        dataclasses.replace(static, march_deferred=True, march_empty_skip=True)
    )
    img_dense = render(
        dataclasses.replace(
            static, march_deferred=True, march_empty_skip=False
        )
    )
    m0, m1 = float(img_dense.mean()), float(img_skip.mean())
    assert abs(m0 - m1) / (abs(m0) + 1e-9) < 2e-2


def test_empty_skip_unbiased(rig):
    """Empty-cell exit jumps sample a density that is exactly zero over the
    skipped segment, so the estimator mean is unchanged (positions differ
    by ulps → individual threshold crossings may flip → compare means)."""
    static, render = rig
    img_skip = render(static)
    img_dense = render(dataclasses.replace(static, march_empty_skip=False))
    m0, m1 = float(img_dense.mean()), float(img_skip.mean())
    assert abs(m0 - m1) / (abs(m0) + 1e-9) < 2e-2


def test_uint8_rows_match_reference_quantization(rig):
    """uint8 march rows (the reference's texture storage) stay close to the
    float32 estimator on a smooth cloud: quantization error is 1/255 of
    density/transmittance, so the image mean shifts by at most a few %."""
    static, _ = rig
    cfg = SceneConfig(
        cloud=CloudModel(size_m=600.0),
        camera=CameraConfig(width=16, height=8),
        rendering=CloudRendering(
            max_depth=15, sample_step=1.0 / 64.0, march_dtype="uint8"
        ),
    )
    density = procedural.cumulus(resolution=24, seed=3)
    params_u8, static_u8 = scene_mod.build_scene(cfg, density)
    params_u8 = inscatter.with_baked_inscatter(params_u8, static_u8)
    assert params_u8.march_rows.dtype == jnp.uint8
    basis = camera_ops.camera_basis(cfg.camera)
    origins, directions = camera_ops.generate_rays(basis, 16, 8)
    img_u8 = np.asarray(
        pt.render_subframe(
            params_u8, static_u8, origins, directions, 7, jnp.int32(0)
        )
    )
    _, render = rig
    img_f32 = render(static)
    m0, m1 = float(img_f32.mean()), float(img_u8.mean())
    assert np.isfinite(img_u8).all()
    assert abs(m0 - m1) / (abs(m0) + 1e-9) < 0.1


def test_brick_rows_match_cell_rows(rig):
    """Brick rows (one gather serves a (brick+1)^3 corner lattice,
    ops.grid.pack_bricks) must reproduce the 8-corner cell-row estimator
    bit-for-bit: identical cell/frac math, same RNG draws — the only
    change is which fetch serves the trilinear weights."""
    static, render = rig
    img_cell = render(
        dataclasses.replace(static, march_empty_skip=False)
    )
    for brick in (2, 3, 4):
        cfg = SceneConfig(
            cloud=CloudModel(size_m=600.0),
            camera=CameraConfig(width=16, height=8),
            rendering=CloudRendering(
                max_depth=15, sample_step=1.0 / 64.0, march_brick=brick
            ),
        )
        density = procedural.cumulus(resolution=24, seed=3)
        params_b, static_b = scene_mod.build_scene(cfg, density)
        params_b = inscatter.with_baked_inscatter(params_b, static_b)
        assert static_b.march_brick == brick
        basis = camera_ops.camera_basis(cfg.camera)
        o, d = camera_ops.generate_rays(basis, 16, 8)
        img_b = np.asarray(
            pt.render_subframe(
                params_b,
                dataclasses.replace(static_b, march_empty_skip=False),
                o, d, 7, jnp.int32(0),
            )
        )
        scale = np.abs(img_cell).max() + 1e-9
        assert np.abs(img_b - img_cell).max() / scale < 1e-5, brick
        # And with empty-brick exit jumps on: estimator mean unchanged.
        img_skip = np.asarray(
            pt.render_subframe(params_b, static_b, o, d, 7, jnp.int32(0))
        )
        m0, m1 = float(img_cell.mean()), float(img_skip.mean())
        assert abs(m0 - m1) / (abs(m0) + 1e-9) < 2e-2, brick


def test_multilevel_compaction_scatters_to_owner_lanes(rig):
    """Regression: with >= 2 compaction levels (n >= 65536 lanes) the
    level-2 compact's local indices point into the level-1 buffer, so the
    Welford merge-back must compose a global-index map through the cascade
    — the old code scattered level-2 chunks at LOCAL indices into the full
    buffer, folding ~3% of tail samples into the wrong pixels (per-lane
    counts of 2 or 4 instead of n_subframes).

    Check: (a) every lane folds exactly n_subframes samples; (b) the
    65536-lane run matches the same rays traced in two 32768-lane calls
    (single compaction level each) to float precision — RNG is keyed by
    global ray id so per-sample values are bit-identical; only the Welford
    chunk fold boundaries (and hence fp rounding) differ.  The broken
    cascade produced order-1 per-lane errors here, 5e-8 after the fix.
    """
    static, _ = rig
    cfg = SceneConfig(
        cloud=CloudModel(size_m=600.0),
        camera=CameraConfig(width=16, height=8),
        rendering=CloudRendering(max_depth=15, sample_step=1.0 / 64.0),
    )
    density = procedural.cumulus(resolution=24, seed=3)
    params, _ = scene_mod.build_scene(cfg, density)
    params = inscatter.with_baked_inscatter(params, static)
    basis = camera_ops.camera_basis(cfg.camera)
    o0, d0 = camera_ops.generate_rays(basis, 16, 8)  # 128 rays
    reps = 512  # -> 65536 lanes: cascade levels [8192, 1024]
    o = jnp.tile(o0, (reps, 1))
    d = jnp.tile(d0, (reps, 1))
    n = o.shape[0]
    ids = jnp.arange(n, dtype=jnp.uint32)
    s = 3
    mean, m2, cnt = pt.trace_tick_moments(
        params, static, o, d, 7, jnp.int32(0), s, ray_ids=ids
    )
    np.testing.assert_array_equal(np.asarray(cnt), np.float32(s))
    # Two half-size calls: 32768 lanes -> one compaction level each.
    h = n // 2
    parts = [
        pt.trace_tick_moments(
            params, static, o[lo:lo + h], d[lo:lo + h], 7, jnp.int32(0), s,
            ray_ids=ids[lo:lo + h],
        )
        for lo in (0, h)
    ]
    mean_b = np.concatenate([np.asarray(p[0]) for p in parts])
    m2_b = np.concatenate([np.asarray(p[1]) for p in parts])
    scale_m = np.abs(mean_b).max() + 1e-9
    scale_v = np.abs(m2_b).max() + 1e-9
    assert np.abs(np.asarray(mean) - mean_b).max() / scale_m < 1e-5
    assert np.abs(np.asarray(m2) - m2_b).max() / scale_v < 1e-5


def test_regen_tick_matches_megabatch_oracle(rig):
    """Lane-regeneration tick (ONE lane per pixel, finished samples respawn
    in place — pathtracer.trace_tick_moments) vs the legacy S x N megabatch
    tick on the oracle loop: identical per-sample draws, so mean AND m2
    agree to float precision across consecutive ticks."""
    import jax.numpy as jnp  # noqa: F811 (test-local)

    from deepestscatter_tpu.render import camera as camera_ops
    from deepestscatter_tpu.render import progressive as prog

    static, _ = rig
    cfg = SceneConfig(
        cloud=CloudModel(size_m=600.0),
        camera=CameraConfig(width=16, height=8),
        rendering=CloudRendering(max_depth=15, sample_step=1.0 / 64.0),
    )
    density = procedural.cumulus(resolution=24, seed=3)
    params, _ = scene_mod.build_scene(cfg, density)
    params = inscatter.with_baked_inscatter(params, static)
    basis = camera_ops.camera_basis(cfg.camera)
    o, d = camera_ops.generate_rays(basis, 16, 8)
    legacy = dataclasses.replace(static, march_deferred=False)
    sa = prog.init_state(o.shape[0])
    sb = prog.init_state(o.shape[0])
    for _ in range(2):
        sa = prog.render_tick(params, static, o, d, sa, seed_base=7,
                              n_subframes=5)
        sb = prog.render_tick(params, legacy, o, d, sb, seed_base=7,
                              n_subframes=5)
    scale_m = np.abs(np.asarray(sb.mean)).max() + 1e-9
    scale_v = np.abs(np.asarray(sb.m2)).max() + 1e-9
    assert np.abs(np.asarray(sa.mean) - np.asarray(sb.mean)).max() / scale_m < 1e-5
    assert np.abs(np.asarray(sa.m2) - np.asarray(sb.m2)).max() / scale_v < 1e-5
    assert int(sa.subframe_id) == int(sb.subframe_id) == 10
