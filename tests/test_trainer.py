"""Training-harness tests: log-MSE descent, checkpoints, NaN abort, DP mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from deepestscatter_tpu.config import TrainConfig
from deepestscatter_tpu.models.blocks import LogTransform
from deepestscatter_tpu.models.rpnn import DisneyModel
from deepestscatter_tpu.train import trainer as trainer_mod


def _synthetic(n, seed=0):
    """Descriptors whose mean density predicts the label — learnable fast."""
    rng = np.random.default_rng(seed)
    x = rng.random((n, 10, 226)).astype(np.float32)
    y = x[:, :, :225].mean(axis=(1, 2)).astype(np.float32) * 2.0
    return x, y


@pytest.fixture(scope="module")
def model_and_params():
    model = DisneyModel()
    variables = model.init(jax.random.PRNGKey(566), jnp.zeros((1, 10, 226)))
    return model, variables


def test_log_transform_roundtrip():
    x = jnp.asarray([0.0, 0.01, 1.0, 50.0])
    y = LogTransform.forward(x)
    np.testing.assert_allclose(
        np.asarray(LogTransform.inverse(y)), np.asarray(x), rtol=1e-5, atol=1e-7
    )


def test_loss_decreases(model_and_params):
    model, variables = model_and_params
    x, y = _synthetic(256)
    tx = trainer_mod.adam_amsgrad(1e-3)
    step = trainer_mod.make_train_step(model.apply, tx)
    # Copy: the train step donates its input state's buffers.
    state = trainer_mod.TrainState(
        jax.tree.map(jnp.copy, variables), tx.init(variables), jnp.int32(0)
    )
    losses = []
    for _ in range(20):
        state, loss = step(state, jnp.asarray(x), jnp.asarray(y))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses


def test_mesh_sharded_step_matches_single(model_and_params):
    """DP over the 8-device CPU mesh must give the same loss trajectory."""
    model, variables = model_and_params
    x, y = _synthetic(64)
    tx = trainer_mod.adam_amsgrad(1e-3)

    def run(mesh):
        step = trainer_mod.make_train_step(model.apply, tx, mesh=mesh)
        state = trainer_mod.TrainState(
            jax.tree.map(jnp.copy, variables), tx.init(variables), jnp.int32(0)
        )
        out = []
        for _ in range(3):
            state, loss = step(state, jnp.asarray(x), jnp.asarray(y))
            out.append(float(loss))
        return out

    single = run(None)
    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
    sharded = run(mesh)
    np.testing.assert_allclose(sharded, single, rtol=1e-5)


def test_trainer_loop_checkpoints_and_exports(model_and_params, tmp_path):
    model, variables = model_and_params
    x, y = _synthetic(128)

    def train_batches(epoch):
        for i in range(4):
            yield jnp.asarray(x), jnp.asarray(y)

    t = trainer_mod.Trainer(
        name="DisneyModel",
        apply_fn=model.apply,
        init_params=variables,
        train_batches=train_batches,
        val_batch=lambda: (jnp.asarray(x), jnp.asarray(y)),
        config=TrainConfig(validate_every=2, run_dir=str(tmp_path)),
    )
    t.run(epochs=1)
    assert os.path.exists(t.checkpoint_path())
    assert os.path.exists(t.checkpoint_path(best=True))
    assert os.path.exists(os.path.join(t.run_dir, "DisneyModel.params.msgpack"))
    assert os.path.exists(os.path.join(t.run_dir, "metrics.jsonl"))
    # Restore round-trips the FULL state (params + opt_state + step +
    # best_val — the reference checkpoints optimizer.state_dict() too,
    # Trainer.py:164-169).
    t2 = trainer_mod.Trainer(
        name="DisneyModel",
        apply_fn=model.apply,
        init_params=variables,
        train_batches=train_batches,
        val_batch=lambda: (jnp.asarray(x), jnp.asarray(y)),
        config=TrainConfig(validate_every=2, run_dir=str(tmp_path)),
    )
    assert t2.restore()
    assert int(t2.state.step) == int(t.state.step) == 4
    assert t2.best_val == t.best_val
    for tree_a, tree_b in (
        (t2.state.params, t.state.params),
        (t2.state.opt_state, t.state.opt_state),
    ):
        for a, b in zip(jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues_exact_trajectory(model_and_params, tmp_path):
    """Train 6 steps uninterrupted vs train 3 → checkpoint → fresh Trainer →
    restore → train 3 more: identical final params AND losses (warm Adam
    moments, step counter, and best-val watermark all survive the restart —
    the eval pipeline's preemption-recovery contract)."""
    model, variables = model_and_params
    x, y = _synthetic(128)

    def batches_n(n):
        def train_batches(epoch):
            for _ in range(n):
                yield jnp.asarray(x), jnp.asarray(y)
        return train_batches

    def make(run_dir, n_batches):
        return trainer_mod.Trainer(
            name="DisneyModel",
            apply_fn=model.apply,
            init_params=variables,
            train_batches=batches_n(n_batches),
            val_batch=lambda: (jnp.asarray(x), jnp.asarray(y)),
            config=TrainConfig(validate_every=3, run_dir=run_dir),
        )

    full = make(str(tmp_path / "full"), 6)
    full.run(epochs=1)

    part = make(str(tmp_path / "part"), 3)
    part.run(epochs=1)
    resumed = make(str(tmp_path / "part"), 6)
    assert resumed.restore()
    assert int(resumed.state.step) == 3
    resumed.run(epochs=1)  # skips the 3 consumed batches, runs 3 more

    assert int(resumed.state.step) == int(full.state.step) == 6
    assert resumed.best_val == full.best_val
    for a, b in zip(
        jax.tree.leaves(resumed.state.params), jax.tree.leaves(full.state.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nan_abort(model_and_params, tmp_path):
    model, variables = model_and_params
    x, y = _synthetic(32)
    bad_y = np.full_like(y, np.nan)

    def train_batches(epoch):
        yield jnp.asarray(x), jnp.asarray(bad_y)
        yield jnp.asarray(x), jnp.asarray(bad_y)

    t = trainer_mod.Trainer(
        name="NanModel",
        apply_fn=model.apply,
        init_params=variables,
        train_batches=train_batches,
        val_batch=lambda: (jnp.asarray(x), jnp.asarray(y)),
        config=TrainConfig(validate_every=2, run_dir=str(tmp_path)),
    )
    with pytest.raises(FloatingPointError):
        t.run(epochs=1)
