"""The train entries must survive a collection prefix whose validation
store has no labels yet (tools/collect_r05.py collects train scenes
first): the val_loss watermark falls back to a train slice — loudly —
instead of crashing (host path) or silently producing NaN (device path).
The generalization check of the eval (held-out-scene render RMS) does not
depend on the val store's labels."""

import numpy as np
import pytest

from deepestscatter_tpu.config import (
    CloudRendering,
    PointRadianceConfig,
    SceneConfig,
    TrainConfig,
)


@pytest.fixture(scope="module")
def train_only_root(tmp_path_factory):
    """A toy triplet: one fully collected TRAIN scene, a validation store
    holding only its SceneSetup (no ScatterSample/Result rows)."""
    from deepestscatter_tpu import tasks
    from deepestscatter_tpu.data import records
    from deepestscatter_tpu.data.store import DatasetTriplet

    root = str(tmp_path_factory.mktemp("train_only"))
    triplet = DatasetTriplet(root)
    setup = np.zeros(1, records.SCENE_SETUP)
    setup[0] = (b"procedural:24:1", 1800.0, (0.0, -1.0, 0.2))
    triplet.train.table("SceneSetup").batch_append(0, setup)
    setup[0] = (b"procedural:24:9", 1800.0, (0.0, -1.0, 0.2))
    triplet.validation.table("SceneSetup").batch_append(0, setup)

    base = SceneConfig(
        rendering=CloudRendering(sample_step=1.0 / 128.0, max_depth=60)
    )
    rcfg = PointRadianceConfig(
        max_threads=512, launches_per_update=2, rel_tol=0.5, abs_tol=0.05,
        black_min_experiments=16,
    )
    for stage in ("ScatterSample", "Result", "DisneyDescriptor",
                  "BakedInterpolationSet"):
        tasks.collect(
            triplet.train, stage, tasks.CollectMode.CONTINUE, base=base,
            radiance_cfg=rcfg, batch_size=64, verbose=False,
        )
    return root, triplet


def test_empty_val_store_falls_back_to_train(train_only_root, capsys):
    from deepestscatter_tpu.train import entries

    root, triplet = train_only_root
    assert triplet.validation.count("Result") == 0  # the premise
    t = entries.train_disney(
        root,
        config=TrainConfig(
            run_dir=root + "/runs", batch_size=16, val_batch_size=32,
            validate_every=2,
        ),
        epochs=2,
    )
    out = capsys.readouterr().out
    assert "validating on a train slice" in out
    assert np.isfinite(t.best_val)


def test_empty_val_store_device_resident(train_only_root, capsys):
    from deepestscatter_tpu.train import entries

    root, triplet = train_only_root
    t = entries.train_disney(
        root,
        config=TrainConfig(
            run_dir=root + "/runs_dev", batch_size=16, val_batch_size=32,
            validate_every=2,
        ),
        epochs=2,
        device_resident=True,
    )
    out = capsys.readouterr().out
    assert "validating on a train slice" in out
    assert np.isfinite(t.best_val)
