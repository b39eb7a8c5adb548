"""Device-resident training fast path (train.device_data + chunked scan).

Contracts:
- ``make_chunk_step`` (one jitted lax.scan of k optimizer steps over
  device-assembled batches) matches k sequential ``make_train_step`` calls
  on the same data to float precision;
- ``DeviceDisneyData``/``DeviceBakedData`` assemble batches identical to
  the host-side datasets (data/datasets.py) for the same indices;
- the device-mode Trainer trains (loss decreases) and exports.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepestscatter_tpu.config import TrainConfig
from deepestscatter_tpu.data import records
from deepestscatter_tpu.data.datasets import BakedDataset, DisneyDataset
from deepestscatter_tpu.data.store import RecordStore
from deepestscatter_tpu.models.rpnn import DisneyModel
from deepestscatter_tpu.train import device_data as dd
from deepestscatter_tpu.train import trainer as trainer_mod


def _fill_store(root: str, n: int = 96, seed: int = 4) -> RecordStore:
    """A tiny store with all the tables the training pipelines read."""
    rng = np.random.default_rng(seed)
    store = RecordStore(root)
    n_scenes = -(-n // 32)
    setups = np.zeros(n_scenes, records.SCENE_SETUP)
    for i in range(n_scenes):
        light = rng.normal(size=3)
        setups[i] = (b"procedural:8:1", 2000.0,
                     (light / np.linalg.norm(light)).astype(np.float32))
    store.table("SceneSetup").batch_append(0, setups)

    samples = np.zeros(n, records.SCATTER_SAMPLE)
    samples["scene_setup_id"] = np.arange(n) // 32
    samples["point"] = rng.random((n, 3)).astype(np.float32)
    view = rng.normal(size=(n, 3))
    samples["view_direction"] = (
        view / np.linalg.norm(view, axis=1, keepdims=True)
    ).astype(np.float32)
    store.table("ScatterSample").batch_append(0, samples)

    results = np.zeros(n, records.RESULT)
    results["light_intensity"] = rng.random(n).astype(np.float32) * 3.0
    results["is_converged"] = (rng.random(n) > 0.25).astype(np.uint8)
    store.table("Result").batch_append(0, results)

    grids = np.zeros(n, records.DISNEY_DESCRIPTOR)
    grids["grid"] = rng.integers(0, 256, (n, 2250), dtype=np.uint8)
    store.table("DisneyDescriptor").batch_append(0, grids)

    sets = np.zeros(n, records.BAKED_INTERPOLATION_SET)
    for c in "abcd":
        sets[c]["grid"] = rng.integers(0, 256, (n, 2250), dtype=np.uint8)
        sets[c]["power"] = rng.random(n).astype(np.float32)
        direction = rng.normal(size=(n, 3))
        sets[c]["direction"] = (
            direction / np.linalg.norm(direction, axis=1, keepdims=True)
        ).astype(np.float32)
        sets[c]["position"] = rng.random((n, 3)).astype(np.float32)
    store.table("BakedInterpolationSet").batch_append(0, sets)
    return store


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    return _fill_store(str(tmp_path_factory.mktemp("devtrain")))


def test_device_disney_matches_host_dataset(store):
    dev = dd.DeviceDisneyData(store)
    host = DisneyDataset(store)
    idx = np.asarray([0, 3, 17, 40, 95])
    item_h, labels_h, ok_h = host._gather(idx)
    item_d, labels_d = dev.assemble(jnp.asarray(idx.astype(np.int32)))
    np.testing.assert_allclose(
        np.asarray(item_d["z_layers"]), item_h["z_layers"], rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(labels_d), labels_h, rtol=1e-6)
    np.testing.assert_array_equal(dev.converged[idx], ok_h)


def test_device_baked_matches_host_dataset(store):
    dev = dd.DeviceBakedData(store)
    host = BakedDataset(store)
    idx = np.asarray([1, 8, 33, 94])
    item_h, labels_h, _ = host._gather(idx)
    item_d, labels_d = dev.assemble(jnp.asarray(idx.astype(np.int32)))
    for k in item_h:
        np.testing.assert_allclose(
            np.asarray(item_d[k]), item_h[k], rtol=1e-5, atol=1e-6,
            err_msg=k,
        )
    np.testing.assert_allclose(np.asarray(labels_d), labels_h, rtol=1e-6)


def test_chunk_step_matches_sequential(store):
    dev = dd.DeviceDisneyData(store)
    model = DisneyModel()
    variables = model.init(jax.random.PRNGKey(566), jnp.zeros((1, 10, 226)))
    tx = trainer_mod.adam_amsgrad(1e-3)

    def apply_fn(p, b):
        return model.apply(p, b["z_layers"])

    sched = dd.epoch_schedule(dev.pool(), 8, seed=566, epoch=0)[:4]

    # Sequential reference.
    step = trainer_mod.make_train_step(apply_fn, tx)
    state = trainer_mod.TrainState(
        jax.tree.map(jnp.copy, variables), tx.init(variables), jnp.int32(0)
    )
    seq_losses = []
    for idx in sched:
        batch, labels = dev.assemble(jnp.asarray(idx))
        state, loss = step(state, batch, labels)
        seq_losses.append(float(loss))

    chunk = trainer_mod.make_chunk_step(apply_fn, tx, dev.assemble)
    cstate = trainer_mod.TrainState(
        jax.tree.map(jnp.copy, variables), tx.init(variables), jnp.int32(0)
    )
    cstate, closses = chunk(cstate, jnp.asarray(sched))
    np.testing.assert_allclose(np.asarray(closses), seq_losses, rtol=1e-5)
    assert int(cstate.step) == int(state.step) == 4
    for a, b in zip(jax.tree.leaves(cstate.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_device_trainer_runs_and_exports(store, tmp_path):
    dev = dd.DeviceDisneyData(store)
    model = DisneyModel()
    variables = model.init(jax.random.PRNGKey(566), jnp.zeros((1, 10, 226)))
    t = trainer_mod.Trainer(
        name="DisneyModel",
        apply_fn=lambda p, b: model.apply(p, b["z_layers"]),
        init_params=variables,
        train_batches=lambda epoch: iter(()),  # unused in device mode
        val_batch=lambda: (_ for _ in ()).throw(RuntimeError),
        config=TrainConfig(
            run_dir=str(tmp_path), batch_size=8, val_batch_size=16,
            validate_every=4,
        ),
        device_data=dev,
        val_device_data=dev,  # smoke: validate on the train store
    )
    t.run(epochs=3)
    assert int(t.state.step) > 0
    assert np.isfinite(t.best_val)
    assert (tmp_path / "DisneyModel" / "DisneyModel.params.msgpack").exists()
