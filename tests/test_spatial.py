"""Spatial parallelism: sharded bake equivalence + halo-slab exchange."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from deepestscatter_tpu import scene as scene_mod
from deepestscatter_tpu.config import CloudModel, SceneConfig
from deepestscatter_tpu.parallel import make_mesh
from deepestscatter_tpu.parallel import spatial
from deepestscatter_tpu.render import inscatter


@pytest.fixture(scope="module")
def tiny_scene():
    from deepestscatter_tpu.data import procedural

    cfg = SceneConfig(cloud=CloudModel(size_m=1200.0))
    density = procedural.cumulus(resolution=16, seed=6)
    return scene_mod.build_scene(cfg, density)


def test_sharded_bake_matches_single_device(tiny_scene):
    params, static = tiny_scene
    mesh = make_mesh()
    sharded = spatial.sharded_inscatter_bake(mesh, params, static)
    single = inscatter.bake(params, static)
    # 1-ulp tolerance: XLA fuses the /255 differently per program shape.
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), atol=1e-6
    )


def test_halo_slab_roundtrip():
    mesh = make_mesh()
    grid = jnp.asarray(
        np.random.default_rng(0).random((32, 4, 4)).astype(np.float32)
    )
    slabs = spatial.HaloSlabGrid(mesh, halo=1)
    stacked = slabs.scatter(grid)
    assert stacked.shape == (8, 32 // 8 + 2, 4, 4)
    # Device d's owned rows equal the global slab.
    host = np.asarray(stacked)
    for d in range(8):
        np.testing.assert_array_equal(
            host[d, 1:-1], np.asarray(grid)[d * 4 : (d + 1) * 4]
        )
        lo = max(d * 4 - 1, 0)
        hi = min((d + 1) * 4, 31)
        np.testing.assert_array_equal(host[d, 0], np.asarray(grid)[lo])
        np.testing.assert_array_equal(host[d, -1], np.asarray(grid)[hi])


def test_halo_exchange_matches_scatter():
    """ppermute halo exchange reproduces the host-built halo slabs."""
    mesh = make_mesh()
    grid = jnp.asarray(
        np.random.default_rng(1).random((32, 4, 4)).astype(np.float32)
    )
    slabs = spatial.HaloSlabGrid(mesh, halo=1)
    expected = np.asarray(slabs.scatter(grid))

    owned = grid.reshape(8, 4, 4, 4)  # [dev, slab, ...]

    def f(owned_local):
        return slabs.exchange_halos(owned_local[0], "data")[None]

    out = jax.jit(
        shard_map(
            f, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
            check_vma=False,
        )
    )(owned)
    np.testing.assert_array_equal(np.asarray(out), expected)
