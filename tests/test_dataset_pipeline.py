"""End-to-end dataset pipeline: setups → samples → labels → descriptors."""

import dataclasses

import numpy as np
import pytest

from deepestscatter_tpu import tasks
from deepestscatter_tpu.config import (
    CloudRendering,
    PointRadianceConfig,
    SceneConfig,
)
from deepestscatter_tpu.data import records, scenesetups
from deepestscatter_tpu.data.store import RecordStore
from deepestscatter_tpu.scene import is_in_box

BATCH = 64  # tiny slice for CPU tests (reference: 2048)


@pytest.fixture(scope="module")
def seeded_store(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    triplet = scenesetups.generate(
        str(root),
        ["procedural:24:3", "procedural:24:4"],
        seed=1,
        scenes_per_cloud=2,
    )
    return triplet


@pytest.fixture(scope="module")
def base_cfg():
    # Cheap physics for CPU: shallow depth, coarse step.
    return SceneConfig(
        rendering=CloudRendering(sample_step=1.0 / 128.0, max_depth=60)
    )


def test_scene_setups_seeded(seeded_store):
    # 2 clouds split by cloud: train gets 1-2 clouds x 2 scenes.
    total = sum(
        s.count("SceneSetup")
        for s in (
            seeded_store.train,
            seeded_store.validation,
            seeded_store.test,
        )
    )
    assert total == 4
    setup = None
    for s in (seeded_store.train, seeded_store.validation, seeded_store.test):
        if s.count("SceneSetup"):
            setup = s.table("SceneSetup").get_record(0)
            break
    assert 1000.0 <= float(setup["cloud_size_m"]) <= 12000.0
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(setup["light_direction"])), 1.0, rtol=1e-5
    )


def _store_with_setups(seeded_store):
    for s in (seeded_store.train, seeded_store.validation, seeded_store.test):
        if s.count("SceneSetup") >= 2:
            return s
    pytest.skip("no split with 2 scenes")


@pytest.fixture(scope="module")
def filled_store(seeded_store, base_cfg):
    """Runs all 4 collection stages on 2 tiny scenes."""
    store = _store_with_setups(seeded_store)
    n = tasks.collect(
        store, "ScatterSample", tasks.CollectMode.OVERWRITE,
        base=base_cfg, batch_size=BATCH, max_scenes=2, verbose=False,
    )
    assert n == 2
    assert store.count("ScatterSample") == 2 * BATCH

    # Samples lie inside the cloud box and have unit directions.
    setup = store.table("SceneSetup").get_record(0)
    _, params, static = tasks.scene_from_setup(setup, base_cfg, bake=False)
    samples = store.table("ScatterSample").read(0, BATCH)
    pos = samples["point"] + 0.5 * np.asarray(params.bbox_size)
    assert np.asarray(is_in_box(pos, params.bbox_size)).all()
    np.testing.assert_allclose(
        np.linalg.norm(samples["view_direction"], axis=1), 1.0, rtol=1e-4
    )
    assert (samples["scene_setup_id"] == 0).all()

    # Stage 2: radiance labels (loose gates for CPU speed).
    cfg = PointRadianceConfig(
        max_threads=BATCH * 8, launches_per_update=2, rel_tol=0.5,
        abs_tol=0.05, black_min_experiments=16,
    )
    n = tasks.collect(
        store, "Result", tasks.CollectMode.OVERWRITE, base=base_cfg,
        radiance_cfg=cfg, batch_size=BATCH, max_scenes=2, verbose=False,
    )
    results = store.table("Result").read(0, BATCH)
    assert np.isfinite(results["light_intensity"]).all()
    assert results["light_intensity"].max() > 0

    # Stage 3 + 4: descriptors.
    tasks.collect(
        store, "DisneyDescriptor", tasks.CollectMode.OVERWRITE,
        base=base_cfg, batch_size=BATCH, max_scenes=2, verbose=False,
    )
    grids = store.table("DisneyDescriptor").read(0, BATCH)["grid"]
    assert grids.shape == (BATCH, records.GRID_BYTES)
    assert grids.max() > 0  # scatter points sit in density

    tasks.collect(
        store, "BakedInterpolationSet", tasks.CollectMode.OVERWRITE,
        base=base_cfg, batch_size=BATCH, max_scenes=2, verbose=False,
    )
    return store


def test_full_pipeline(filled_store, base_cfg):
    store = filled_store
    sets = store.table("BakedInterpolationSet").read(0, BATCH)
    powers = np.stack(
        [sets[c]["power"] for c in "abcd"], axis=1
    )
    np.testing.assert_allclose(powers.sum(axis=1), 1.0, atol=1e-4)

    # Resume arithmetic: CONTINUE skips completed scenes (Tasks.h:59-68).
    n = tasks.collect(
        store, "ScatterSample", tasks.CollectMode.CONTINUE,
        base=base_cfg, batch_size=BATCH, max_scenes=2, verbose=False,
    )
    assert n == 0


def test_disney_dataset_and_training(filled_store):
    """Records → DisneyDataset batches → a few RPNN train steps."""
    import jax
    import jax.numpy as jnp

    from deepestscatter_tpu.data.datasets import DisneyDataset
    from deepestscatter_tpu.models.rpnn import DisneyModel
    from deepestscatter_tpu.train import trainer as trainer_mod

    ds = DisneyDataset(filled_store, batch_size=BATCH)
    assert len(ds) == 2 * BATCH
    batches = list(ds.batches(32, seed=0))
    assert batches
    item, labels = batches[0]
    assert item["z_layers"].shape[1:] == (10, 226)
    assert (item["z_layers"][:, :, :225] <= 1.0).all()
    # ω equals the angle between light and view on every layer.
    assert np.isfinite(item["z_layers"][:, :, 225]).all()

    model = DisneyModel()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 226)))
    tx = trainer_mod.adam_amsgrad(1e-3)
    step = trainer_mod.make_train_step(
        lambda p, b: model.apply(p, b["z_layers"]), tx
    )
    state = trainer_mod.TrainState(
        jax.tree.map(jnp.copy, variables), tx.init(variables), jnp.int32(0)
    )
    for item, labels in batches[:3]:
        state, loss = step(
            state,
            {"z_layers": jnp.asarray(item["z_layers"])},
            jnp.asarray(labels),
        )
        assert np.isfinite(float(loss))


def test_baked_dataset(filled_store):
    import jax
    import jax.numpy as jnp

    from deepestscatter_tpu.data.datasets import BakedDataset
    from deepestscatter_tpu.models.probes import BakedModel

    ds = BakedDataset(filled_store, batch_size=BATCH)
    batches = list(ds.batches(16, seed=1))
    assert batches
    item, labels = batches[0]
    assert item["probe_descriptors"].shape[1:] == (4, 9, 225)
    assert item["disney_descriptor"].shape[1:] == (3, 226)
    np.testing.assert_allclose(item["probe_powers"].sum(-1), 1.0, atol=1e-4)

    model = BakedModel()
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, 9, 225)),
        jnp.zeros((1, 4)),
        jnp.zeros((1, 3, 226)),
        jnp.zeros((1,)),
        jnp.zeros((1,)),
    )
    out = model.apply(
        variables,
        jnp.asarray(item["probe_descriptors"]),
        jnp.asarray(item["probe_powers"]),
        jnp.asarray(item["disney_descriptor"]),
        jnp.asarray(item["omega"]),
        jnp.asarray(item["alpha"]),
    )
    assert out.shape == (len(labels), 1)
    assert np.isfinite(np.asarray(out)).all()
