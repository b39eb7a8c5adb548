"""CI-scale smoke of the end-to-end quality evaluation (tools/eval_e2e.py):
dataset → trained RPNN/Baked → NN/BNN/PT renders → RMS bias vs ground truth
(the reference's acceptance check, GenerateComparisons.py:32-43).

The full-scale run on the real chip produces EVAL_r03.json; this asserts
the pipeline's core claim at toy scale: a TRAINED model renders closer to
the path tracer than a randomly initialized one.
"""

import numpy as np
import pytest

from deepestscatter_tpu.config import (
    CloudRendering,
    PointRadianceConfig,
    SceneConfig,
    TrainConfig,
)


@pytest.fixture(scope="module")
def eval_report(tmp_path_factory):
    from tools.eval_e2e import run_eval

    root = str(tmp_path_factory.mktemp("eval_e2e"))
    return run_eval(
        root,
        train_clouds=("procedural:24:1", "procedural:24:2"),
        val_cloud="procedural:24:9",
        scenes_per_cloud=1,
        val_scenes=1,
        batch_size=64,
        size_range=(1500.0, 2000.0),
        width=32,
        height=16,
        base_cfg=SceneConfig(
            rendering=CloudRendering(sample_step=1.0 / 128.0, max_depth=60)
        ),
        radiance_cfg=PointRadianceConfig(
            max_threads=512,
            launches_per_update=2,
            rel_tol=0.5,
            abs_tol=0.05,
            black_min_experiments=16,
        ),
        train_cfg=TrainConfig(
            run_dir=root + "/runs",
            batch_size=16,
            val_batch_size=32,
            validate_every=4,
        ),
        epochs_disney=10,
        epochs_baked=4,
        out_json=root + "/EVAL_smoke.json",
        verbose=False,
    )


def test_trained_nn_beats_random(eval_report):
    """The RPNN trained on the generated dataset must track the path tracer
    better than random init — the minimal form of the quality claim."""
    assert np.isfinite(eval_report["rms_nn"])
    assert eval_report["rms_nn"] < eval_report["rms_nn_random"]


def test_trained_bnn_finite_and_reported(eval_report):
    assert np.isfinite(eval_report["rms_bnn"])
    assert np.isfinite(eval_report["rms_bnn_random"])
    # Training reported a finite best validation loss for both models.
    assert np.isfinite(eval_report["val_loss_nn"])
    assert np.isfinite(eval_report["val_loss_bnn"])


def test_pt_ground_truth_sane(eval_report):
    """The PT render reached the minimum subframe count and produced a
    plausibly lit image (verify-skill sanity band)."""
    assert eval_report["pt_subframes"] >= 100
    assert 0.05 < eval_report["pt_mean"] < 50.0
