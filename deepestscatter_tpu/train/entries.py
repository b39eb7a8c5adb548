"""Training entry points — TrainDisneyModel.py / TrainBakedModel.py parity.

Each builds its dataset pair (train/validation stores), constructs the
model, and runs the shared Trainer with the reference recipe (seed 566,
Adam-amsgrad 1e-3, batch 1024 / val 4096, validate every 40 batches —
TR/Common/Trainer.py:40-115).

The Baked entry exports the two submodels separately — the probe net and
the realtime renderer net are consumed by different render stages
(TrainBakedModel.py:42-43): the bake runs LightProbeModel over the lattice,
the realtime path runs ProbeRendererModel per pixel.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainConfig
from ..data.datasets import BakedDataset, DisneyDataset
from ..data.store import DatasetTriplet
from ..models.probes import BakedModel
from ..models.rpnn import DisneyModel
from . import trainer as trainer_mod


def _val_batch_fn(dataset, batch_size: int, seed: int = 999):
    def val_batch():
        for item, labels in dataset.batches(batch_size, seed=seed):
            return (
                {k: jnp.asarray(v) for k, v in item.items()},
                labels,
            )
        raise RuntimeError("validation store has no complete batch")

    return val_batch


def _val_store(triplet: DatasetTriplet, label_table: str, name: str):
    """The validation store, with a LOUD fallback: when the validation
    store holds no labels yet (a collection prefix that has only reached
    train scenes — tools/collect_r05.py collects train first), validate on
    a train slice instead.  The val_loss watermark then measures fit, not
    generalization; the eval's real quality gate — render RMS on a
    held-out SCENE whose cloud never appears in Train — is unaffected."""
    store = triplet.validation
    if min(store.count(label_table), store.count("Result")) == 0:
        print(
            f"[{name}] WARNING: validation store has no complete labels — "
            "validating on a train slice (held-out-scene render RMS is the "
            "generalization check)",
            flush=True,
        )
        return triplet.train
    return store


def _train_batches_fn(dataset, batch_size: int, base_seed: int):
    def train_batches(epoch: int):
        for item, labels in dataset.batches(batch_size, seed=base_seed + epoch):
            yield {k: jnp.asarray(v) for k, v in item.items()}, labels

    return train_batches


def train_disney(
    dataset_root: str,
    config: TrainConfig = TrainConfig(),
    mesh=None,
    epochs: Optional[int] = None,
    device_resident: bool = False,
) -> trainer_mod.Trainer:
    """DisneyTrainer().run() (TrainDisneyModel.py:35-39).

    ``device_resident``: upload the record tables to HBM once and train in
    jitted scan chunks (train.device_data) — the production path for
    reference-scale datasets/epochs; the host-batch path remains the
    default for small runs and tests."""
    triplet = DatasetTriplet(dataset_root)
    train_ds = DisneyDataset(triplet.train)
    vstore = _val_store(triplet, "DisneyDescriptor", "DisneyModel")
    val_ds = DisneyDataset(vstore)
    model = DisneyModel()
    variables = model.init(
        jax.random.PRNGKey(config.seed), jnp.zeros((1, 10, 226))
    )
    dev = val_dev = None
    if device_resident:
        from .device_data import DeviceDisneyData

        dev = DeviceDisneyData(triplet.train)
        val_dev = DeviceDisneyData(vstore)
    t = trainer_mod.Trainer(
        name="DisneyModel",
        apply_fn=lambda p, b: model.apply(p, b["z_layers"]),
        init_params=variables,
        train_batches=_train_batches_fn(train_ds, config.batch_size, config.seed),
        val_batch=_val_batch_fn(
            val_ds, max(1, min(config.val_batch_size, len(val_ds)))
        ),
        config=config,
        mesh=mesh,
        device_data=dev,
        val_device_data=val_dev,
    )
    t.restore()  # resume a preempted run: warm optimizer, exact trajectory
    t.run(epochs=epochs)
    return t


def train_baked(
    dataset_root: str,
    config: TrainConfig = TrainConfig(),
    mesh=None,
    epochs: Optional[int] = None,
    device_resident: bool = False,
) -> trainer_mod.Trainer:
    """BakedTrainer().run() (TrainBakedModel.py:47-51) — end-to-end training
    of the two-stage model; exports the submodels separately."""
    triplet = DatasetTriplet(dataset_root)
    train_ds = BakedDataset(triplet.train)
    vstore = _val_store(triplet, "BakedInterpolationSet", "BakedModel")
    val_ds = BakedDataset(vstore)
    model = BakedModel()
    variables = model.init(
        jax.random.PRNGKey(config.seed),
        jnp.zeros((1, 4, 9, 225)),
        jnp.zeros((1, 4)),
        jnp.zeros((1, 3, 226)),
        jnp.zeros((1,)),
        jnp.zeros((1,)),
    )

    def apply_fn(params, b):
        return model.apply(
            params,
            b["probe_descriptors"],
            b["probe_powers"],
            b["disney_descriptor"],
            b["omega"],
            b["alpha"],
        )

    def export_params(params, run_dir):
        """Split export (TrainBakedModel.py:42-43): the probe net for the
        baker, the renderer net for the realtime path."""
        inner = params["params"]
        trainer_mod.save_pytree(
            os.path.join(run_dir, "LightProbeModel.params.msgpack"),
            {"params": inner["light_probe_model"]},
        )
        trainer_mod.save_pytree(
            os.path.join(run_dir, "ProbeRendererModel.params.msgpack"),
            {"params": inner["renderer_model"]},
        )
        trainer_mod.save_pytree(
            os.path.join(run_dir, "BakedModel.params.msgpack"), params
        )

    dev = val_dev = None
    if device_resident:
        from .device_data import DeviceBakedData

        dev = DeviceBakedData(triplet.train)
        val_dev = DeviceBakedData(vstore)
    t = trainer_mod.Trainer(
        name="BakedModel",
        apply_fn=apply_fn,
        init_params=variables,
        train_batches=_train_batches_fn(train_ds, config.batch_size, config.seed),
        val_batch=_val_batch_fn(
            val_ds, max(1, min(config.val_batch_size, len(val_ds)))
        ),
        config=config,
        mesh=mesh,
        export_params=export_params,
        device_data=dev,
        val_device_data=val_dev,
    )
    t.restore()  # resume a preempted run: warm optimizer, exact trajectory
    t.run(epochs=epochs)
    return t


def train_mimic(
    dataset_root: str,
    config: TrainConfig = TrainConfig(),
    mesh=None,
    epochs: Optional[int] = None,
) -> trainer_mod.Trainer:
    """Mimic-variant training: single probe descriptor, no tetrahedral
    interpolation (TR/Mimic/MimicModel.py:7-43; the reference's trainer
    file is empty — this completes the scaffold)."""
    from ..models.probes import MimicModel

    triplet = DatasetTriplet(dataset_root)
    train_ds = BakedDataset(triplet.train)
    val_ds = BakedDataset(triplet.validation)
    model = MimicModel()
    variables = model.init(
        jax.random.PRNGKey(config.seed),
        jnp.zeros((1, 9, 225)),
        jnp.zeros((1, 3, 226)),
        jnp.zeros((1,)),
        jnp.zeros((1,)),
    )

    def apply_fn(params, b):
        # Probe "a" only — the nearest tetra corner (no interpolation).
        return model.apply(
            params,
            b["probe_descriptors"][:, 0],
            b["disney_descriptor"],
            b["omega"],
            b["alpha"],
        )

    t = trainer_mod.Trainer(
        name="MimicModel",
        apply_fn=apply_fn,
        init_params=variables,
        train_batches=_train_batches_fn(train_ds, config.batch_size, config.seed),
        val_batch=_val_batch_fn(val_ds, config.val_batch_size),
        config=config,
        mesh=mesh,
    )
    t.restore()  # resume a preempted run: warm optimizer, exact trajectory
    t.run(epochs=epochs)
    return t
