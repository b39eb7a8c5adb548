"""Flagship seam: trained weights → Trainer export → tasks.render_cloud NN.

The reference ships trained ``DisneyModel.pt`` and loads it inside the
renderer task container (DisneyRenderer.cpp:19); here the analogous seam is
``train.trainer.Trainer.export`` writing
``<run_dir>/DisneyModel/DisneyModel.params.msgpack`` and
``tasks._load_neural_weights`` resolving it for ``tasks.render_cloud``.
Until round 3 that lookup was only ever exercised by its ABSENCE branch
(random-init fallbacks in every test); this trains a tiny RPNN, exports
through the real Trainer path, renders through the real task entry, and
asserts the trained render is finite and differs from the random-init one.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepestscatter_tpu import tasks
from deepestscatter_tpu.config import (
    CameraConfig,
    CloudRendering,
    SceneConfig,
    TrainConfig,
)
from deepestscatter_tpu.models.rpnn import DisneyModel
from deepestscatter_tpu.train import trainer as trainer_mod
from deepestscatter_tpu.utils import exr


def _synthetic(n, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.random((n, 10, 226)).astype(np.float32)
    y = x[:, :, :225].mean(axis=(1, 2)).astype(np.float32) * 2.0
    return x, y


def test_render_cloud_consumes_trained_export(tmp_path):
    model = DisneyModel()
    variables = model.init(jax.random.PRNGKey(566), jnp.zeros((1, 10, 226)))
    x, y = _synthetic(256)

    def train_batches(epoch):
        yield jnp.asarray(x), y

    trainer = trainer_mod.Trainer(
        name="DisneyModel",
        apply_fn=model.apply,
        init_params=variables,
        train_batches=train_batches,
        val_batch=lambda: (jnp.asarray(x[:64]), y[:64]),
        config=TrainConfig(run_dir=str(tmp_path), validate_every=1),
    )
    trainer.run(epochs=8)

    base = SceneConfig(
        camera=CameraConfig(width=24, height=12),
        rendering=CloudRendering(max_depth=10, sample_step=1.0 / 32.0),
    )
    kwargs = dict(
        cloud_path="procedural:16:5",
        renderer="nn",
        size_m=600.0,
        directions=("Side",),
        base=base,
        verbose=False,
    )
    (trained_path,) = tasks.render_cloud(
        out_dir=str(tmp_path / "trained"), models_dir=str(tmp_path), **kwargs
    )
    (random_path,) = tasks.render_cloud(
        out_dir=str(tmp_path / "random"), models_dir=":init:", **kwargs
    )
    trained = exr.read_exr(trained_path)
    random_init = exr.read_exr(random_path)
    assert np.isfinite(trained).all()
    assert np.isfinite(random_init).all()
    # Trained weights must actually reach the render: the two images come
    # from the same scene/seed and differ only through the loaded params.
    assert np.abs(trained - random_init).max() > 1e-4


def test_missing_export_raises_with_guidance(tmp_path):
    with pytest.raises(FileNotFoundError, match="train first"):
        tasks._load_neural_weights("nn", str(tmp_path))
