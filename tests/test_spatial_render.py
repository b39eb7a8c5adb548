"""Rendering through a z-slab-sharded grid (parallel/spatial_render.py).

VERDICT round-1 task #6: the sharded grid must actually be CONSUMED by a
renderer.  These tests assert (a) the sharded-grid render matches the
replicated path tracer (identical estimator + RNG keyed by global ray id),
(b) device-count invariance (1 vs 8 slabs bitwise), and (c) each device
really holds only its slab + halos of the march rows.
"""


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepestscatter_tpu import scene as scene_mod
from deepestscatter_tpu.config import (
    CameraConfig,
    CloudModel,
    CloudRendering,
    RenderMode,
    SceneConfig,
)
from deepestscatter_tpu.data import procedural
from deepestscatter_tpu.parallel import make_mesh
from deepestscatter_tpu.parallel.spatial_render import (
    make_spatial_subframe,
    shard_scene,
)
from deepestscatter_tpu.render import camera as camera_ops
from deepestscatter_tpu.render import inscatter, pathtracer

W, H = 32, 16


def _scene(mode=RenderMode.SUN_AND_SKY_ALL_SCATTER, res=24):
    cfg = SceneConfig(
        cloud=CloudModel(size_m=1500.0),
        camera=CameraConfig(width=W, height=H),
        rendering=CloudRendering(
            sample_step=1.0 / 128.0, max_depth=40, mode=mode,
            march_brick=0,  # spatial decomposition requires cell rows
        ),
    )
    density = procedural.cumulus(resolution=res, seed=5)
    params, static = scene_mod.build_scene(cfg, density)
    params = inscatter.with_baked_inscatter(params, static)
    return cfg, params, static


def _rays(cfg):
    basis = camera_ops.camera_basis(cfg.camera)
    o, d = camera_ops.generate_rays(basis, W, H)
    ids = jnp.arange(o.shape[0], dtype=jnp.uint32)
    return o, d, ids


def _spatial_render(params, static, o, d, ids, n_dev, axis="space", seed=3,
                    subframe=1):
    mesh = make_mesh(devices=jax.devices()[:n_dev], axis_names=(axis,))
    scene = shard_scene(mesh, params, axis=axis)
    fn = make_spatial_subframe(mesh, static, axis=axis)
    out = fn(scene, o, d, jnp.uint32(seed), jnp.uint32(subframe), ids)
    return np.asarray(out), scene


@pytest.mark.parametrize(
    "mode",
    [
        RenderMode.SUN_AND_SKY_ALL_SCATTER,
        RenderMode.SUN_MULTIPLE_SCATTER,
        RenderMode.SUN_SINGLE_SCATTER,
    ],
)
def test_sharded_matches_replicated(mode):
    """8-slab sharded-grid render ≈ the replicated path tracer: same
    estimator, same RNG draw sites → equality to float-accumulation order."""
    cfg, params, static = _scene(mode)
    o, d, ids = _rays(cfg)
    seed = jnp.uint32(3) ^ (jnp.uint32(1) * jnp.uint32(0x9E3779B1))
    ref = np.asarray(
        pathtracer.render_subframe(
            params, static, o, d, 3, jnp.int32(1), ids
        )
    )
    got, _ = _spatial_render(params, static, o, d, ids, n_dev=8)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_device_count_invariance():
    """1-slab vs 8-slab renders are bitwise identical (RNG keyed by global
    ray id, arithmetic per step identical)."""
    cfg, params, static = _scene()
    o, d, ids = _rays(cfg)
    one, _ = _spatial_render(params, static, o, d, ids, n_dev=1)
    eight, _ = _spatial_render(params, static, o, d, ids, n_dev=8)
    np.testing.assert_array_equal(one, eight)


def test_each_device_holds_only_its_slab():
    """Memory sharding is real: per-device march-row shards are
    [1, slab + 2*halo, Y, X, 16], ~1/n_dev of the full grid."""
    cfg, params, static = _scene()
    mesh = make_mesh(devices=jax.devices()[:8], axis_names=("space",))
    scene = shard_scene(mesh, params, axis="space")
    nz, ny, nx = static.grid_shape
    slab = nz // 8
    shards = scene.slab_rows.addressable_shards
    assert len(shards) == 8
    for s in shards:
        assert s.data.shape == (1, slab + 2, ny, nx, 16)
    # Sanity: the slab content matches the full grid (owned region).
    full = np.asarray(params.march_rows)
    d3 = np.asarray(shards[3].data)[0]
    np.testing.assert_array_equal(d3[1:-1], full[3 * slab : 4 * slab])


@pytest.mark.parametrize("shape", [(2, 4), (4, 2), (8, 1)])
def test_data_x_space_mesh_composes(shape):
    """2D (data x space) mesh: rays shard over "data" while the grid
    slabs shard over "space" — the two parallelism axes compose in ONE
    shard_map, and every mesh layout renders bitwise identically to the
    1D spatial render (RNG keyed by global ray id; the march collectives
    name only the space axis)."""
    n_data, n_space = shape
    cfg, params, static = _scene()
    o, d, ids = _rays(cfg)
    ref, _ = _spatial_render(params, static, o, d, ids, n_dev=1)
    mesh = make_mesh(
        devices=np.asarray(jax.devices()).reshape(n_data, n_space),
        axis_names=("data", "space"),
    )
    scene = shard_scene(mesh, params, axis="space")
    fn = make_spatial_subframe(mesh, static, axis="space", data_axis="data")
    out = fn(scene, o, d, jnp.uint32(3), jnp.uint32(1), ids)
    # Rays really shard: each device holds N/n_data rays of the output.
    assert out.addressable_shards[0].data.shape[0] == o.shape[0] // n_data
    np.testing.assert_array_equal(np.asarray(out), ref)
    # And the grid really shards: slab thickness follows n_space.
    nz = static.grid_shape[0]
    assert scene.slab_rows.addressable_shards[0].data.shape[1] == (
        nz // n_space + 2
    )


def test_spatial_beyond_single_device_capacity_shape():
    """The only-fits-sharded path: march rows are built host-side and
    scattered straight to slabs — no full-grid device array is ever
    created (HaloSlabGrid.scatter goes numpy → per-device transfer)."""
    cfg, params, static = _scene()
    mesh = make_mesh(devices=jax.devices()[:8], axis_names=("space",))
    rows_host = np.asarray(params.march_rows)
    scene = shard_scene(mesh, params, axis="space", march_rows=rows_host)
    o, d, ids = _rays(cfg)
    fn = make_spatial_subframe(mesh, static, axis="space")
    out = fn(scene, o, d, jnp.uint32(3), jnp.uint32(1), ids)
    assert np.isfinite(np.asarray(out)).all()


def _brick_scene(mode=RenderMode.SUN_AND_SKY_ALL_SCATTER, res=24):
    cfg = SceneConfig(
        cloud=CloudModel(size_m=1500.0),
        camera=CameraConfig(width=W, height=H),
        rendering=CloudRendering(
            sample_step=1.0 / 128.0, max_depth=40, mode=mode,
            march_dtype="uint8",  # AUTO brick => 3
        ),
    )
    density = procedural.cumulus(resolution=res, seed=5)
    params, static = scene_mod.build_scene(cfg, density)
    params = inscatter.with_baked_inscatter(params, static)
    assert static.march_brick > 0
    return cfg, params, static


def _spatial_render_brick(params, static, o, d, ids, n_dev, seed=3,
                          subframe=1, steps_per_phase=None):
    mesh = make_mesh(devices=jax.devices()[:n_dev], axis_names=("space",))
    scene = shard_scene(mesh, params, static=static)
    fn = make_spatial_subframe(mesh, static, steps_per_phase=steps_per_phase)
    out = fn(scene, o, d, jnp.uint32(seed), jnp.uint32(subframe), ids)
    return np.asarray(out), scene


@pytest.mark.parametrize(
    "mode",
    [RenderMode.SUN_AND_SKY_ALL_SCATTER, RenderMode.SUN_MULTIPLE_SCATTER],
)
def test_brick_sharded_matches_replicated(mode):
    """Round-5: the spatially sharded march on BRICK slabs (substeps, one
    gather per fetched brick, tail bounce per iteration) must match the
    replicated brick path tracer — same draws, same trilinear arithmetic
    (ops.grid.trilinear_from_brick), equality to fold order."""
    cfg, params, static = _brick_scene(mode)
    o, d, ids = _rays(cfg)
    ref = np.asarray(
        pathtracer.render_subframe(params, static, o, d, 3, jnp.int32(1), ids)
    )
    got, _ = _spatial_render_brick(params, static, o, d, ids, n_dev=8)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_brick_device_count_invariance():
    """Bitwise 1-vs-8 slab equality at a FIXED phase length.  The phase
    length is a scheduling parameter (defaulting to the slab-crossing
    span, which varies with the slab count); different phase lengths give
    different lax.scan trip counts, whose XLA lowerings may reassociate
    the brick trilinear contraction at the last ulp — measured 1-2 ulp on
    ~4% of pixels, same-device.  With the schedule pinned, the ownership
    handoff itself is exactly invariant."""
    cfg, params, static = _brick_scene()
    o, d, ids = _rays(cfg)
    one, _ = _spatial_render_brick(
        params, static, o, d, ids, n_dev=1, steps_per_phase=16
    )
    eight, _ = _spatial_render_brick(
        params, static, o, d, ids, n_dev=8, steps_per_phase=16
    )
    np.testing.assert_array_equal(one, eight)


def test_brick_slab_nbz_padding():
    """24^3 at brick 3 => 8 brick planes over 8 devices (and 24^3 at brick
    4 => 6 planes, padded to 8): both layouts must render finitely and
    device-count invariantly."""
    cfg, params, static = _brick_scene()
    import dataclasses as dc

    from deepestscatter_tpu.scene import build_scene
    from deepestscatter_tpu.data import procedural as proc

    cfg4 = SceneConfig(
        cloud=CloudModel(size_m=1500.0),
        camera=CameraConfig(width=W, height=H),
        rendering=CloudRendering(
            sample_step=1.0 / 128.0, max_depth=20, march_dtype="uint8",
            march_brick=4,
        ),
    )
    density = proc.cumulus(resolution=24, seed=5)
    p4, s4 = build_scene(cfg4, density)
    p4 = inscatter.with_baked_inscatter(p4, s4)
    o, d, ids = _rays(cfg4)
    one, _ = _spatial_render_brick(
        p4, s4, o, d, ids, n_dev=1, steps_per_phase=16
    )
    eight, _ = _spatial_render_brick(
        p4, s4, o, d, ids, n_dev=8, steps_per_phase=16
    )
    assert np.isfinite(eight).all()
    np.testing.assert_array_equal(one, eight)
