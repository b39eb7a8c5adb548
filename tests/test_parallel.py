"""Multi-device rendering: shard-invariance on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepestscatter_tpu import scene as scene_mod
from deepestscatter_tpu.config import CameraConfig, CloudModel, SceneConfig
from deepestscatter_tpu.parallel import make_mesh
from deepestscatter_tpu.parallel.render import ShardedProgressiveRenderer
from deepestscatter_tpu.render import inscatter
from deepestscatter_tpu.render.progressive import ProgressiveRenderer


@pytest.fixture(scope="module")
def tiny_scene():
    from deepestscatter_tpu.data import procedural

    cfg = SceneConfig(
        cloud=CloudModel(size_m=1200.0),
        camera=CameraConfig(width=32, height=16),
    )
    density = procedural.cumulus(resolution=24, seed=2)
    params, static = scene_mod.build_scene(cfg, density)
    params = inscatter.with_baked_inscatter(params, static)
    return cfg, params, static


def test_mesh_uses_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices()) == 8


def test_sharded_tick_matches_single_device(tiny_scene):
    """The 8-device render vs the 1-device render: per-SAMPLE values are
    bitwise identical (RNG keyed by global ray ids, so device layout cannot
    leak in), but the lane-regeneration tick folds a pixel's subframes in
    shard-local compaction order, so the multi-subframe Welford stats agree
    to float precision rather than bitwise."""
    cfg, params, static = tiny_scene
    single = ProgressiveRenderer(cfg, params, static, seed=3)
    single.tick()

    mesh = make_mesh()
    sharded = ShardedProgressiveRenderer(cfg, params, static, mesh, seed=3)
    sharded.tick()

    np.testing.assert_allclose(
        np.asarray(single.state.mean), np.asarray(sharded.state.mean),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(single.state.m2), np.asarray(sharded.state.m2),
        rtol=1e-4, atol=1e-5,
    )


def test_single_subframe_tick_bitwise_shard_invariant(tiny_scene):
    """With ONE subframe per tick there is no fold-order freedom: each lane
    folds exactly once, so the 8-device state must be bitwise equal to the
    1-device state."""
    import dataclasses

    cfg, params, static = tiny_scene
    cfg1 = dataclasses.replace(
        cfg,
        progressive=dataclasses.replace(cfg.progressive, subframes_per_tick=1),
    )
    single = ProgressiveRenderer(cfg1, params, static, seed=3)
    single.tick()
    sharded = ShardedProgressiveRenderer(cfg1, params, static, make_mesh(), seed=3)
    sharded.tick()
    np.testing.assert_array_equal(
        np.asarray(single.state.mean), np.asarray(sharded.state.mean)
    )


def test_sharded_unconverged_count(tiny_scene):
    cfg, params, static = tiny_scene
    mesh = make_mesh()
    r = ShardedProgressiveRenderer(cfg, params, static, mesh, seed=3)
    # Before min_subframes the frame reports all rays unconverged.
    assert r.tick() == 32 * 16
