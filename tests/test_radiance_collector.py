"""RadianceCollector semantics: reschedule-only-unconverged + replica
densification (reference: RadianceCollector.cpp:105-141,178).

The two properties the reference loop guarantees and round 1 lacked:

1. Black samples CONVERGE under the DEFAULT config — they need
   > 100,000 experiments (RadianceCollector.cpp:112-118), which only the
   densified schedule can deliver (taskRepeatCount = MAX_THREAD_COUNT /
   todo grows as points finish).
2. Converged points leave the schedule forever: their experiment counts
   freeze, and the freed budget goes to the survivors.
"""

import dataclasses

import numpy as np
import pytest

from deepestscatter_tpu.config import (
    CloudRendering,
    PointRadianceConfig,
    SceneConfig,
)
from deepestscatter_tpu.data import collectors
from deepestscatter_tpu.render import inscatter
from deepestscatter_tpu.scene import build_scene


def _scene(density, sample_step=1.0 / 16.0, max_depth=8, size_m=30.0):
    # size_m=30 with mean_free_path 10 m → optical depth ~3: thin enough
    # that sun transmittance (and thus NEE radiance) is non-negligible.
    from deepestscatter_tpu.config import CloudModel

    cfg = SceneConfig(
        cloud=CloudModel(size_m=size_m),
        rendering=CloudRendering(sample_step=sample_step, max_depth=max_depth),
    )
    params, static = build_scene(cfg, density)
    params = inscatter.with_baked_inscatter(params, static)
    return params, static


def test_black_sample_converges_under_default_config():
    """A guaranteed-black sample (empty cloud → zero multi-scatter
    radiance) reaches > 1e5 experiments and converges with the DEFAULT
    PointRadianceConfig: 20,480 threads densify onto the 4 points
    (replicas = 20480 // 8 = 2560; one update = 2560 x 100 = 256,000
    experiments per point)."""
    density = np.zeros((8, 8, 8), np.float32)
    params, static = _scene(density)
    pos = np.zeros((4, 3), np.float32)  # box center (world-centered coords)
    dirs = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (4, 1))

    est = collectors.estimate_point_radiance(
        params, static, pos, dirs, PointRadianceConfig(), seed=3,
        max_updates=3,
    )
    assert est.is_converged.all()
    assert (est.experiments > 100_000).all()
    np.testing.assert_array_equal(est.radiance, 0.0)


def test_converged_points_freeze_and_survivors_densify():
    """Mixed batch: bright points (inside a uniform cloud) converge by CI
    early; black points (outside the box → deterministic zero) must wait
    for the experiment budget.  After the bright points converge their
    counts freeze, and the freed thread budget densifies replicas onto the
    black survivors."""
    density = np.ones((8, 8, 8), np.float32)
    params, static = _scene(density)
    bbox = np.asarray(params.bbox_size)
    bright = np.zeros((8, 3), np.float32)  # box center
    black = np.tile((bbox * 4.0).astype(np.float32), (8, 1))  # far outside
    pos = np.concatenate([bright, black])
    dirs = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (16, 1))

    cfg = PointRadianceConfig(
        max_threads=256,
        launches_per_update=1,
        rel_tol=0.5,
        abs_tol=1e-9,
        black_min_experiments=100,
    )
    est = collectors.estimate_point_radiance(
        params, static, pos, dirs, cfg, seed=7, max_updates=64,
    )
    assert est.is_converged.all()
    black_exp = est.experiments[8:]
    assert (est.radiance[:8] > 0).all()
    np.testing.assert_array_equal(est.radiance[8:], 0.0)
    # The black budget rule: black points only pass once past the minimum.
    assert (black_exp > 100).all()

    # Reschedule-only-unconverged: experiment counts are staggered (each
    # point froze when IT converged), not lockstep-uniform.
    assert len(set(est.experiments.tolist())) > 1

    # Densification: as the active set shrinks, the re-divided thread
    # budget raises replicas per survivor (taskRepeatCount = budget/todo).
    actives = [a for a, _ in est.schedule]
    replicas = [r for _, r in est.schedule]
    assert actives[-1] < actives[0]
    assert replicas[-1] > replicas[0]
    assert replicas == sorted(replicas)  # monotone as the set shrinks

    # Determinism/restartability of the schedule: identical rerun matches.
    est2 = collectors.estimate_point_radiance(
        params, static, pos, dirs, cfg, seed=7, max_updates=64,
    )
    np.testing.assert_array_equal(est.radiance, est2.radiance)
    np.testing.assert_array_equal(est.experiments, est2.experiments)


def test_converged_counts_identical_to_single_update_prefix():
    """The frozen-count property, directly: points that converge in update
    1 keep EXACTLY their update-1 experiment count in a longer run (the
    schedule never re-traces them)."""
    density = np.ones((8, 8, 8), np.float32)
    params, static = _scene(density)
    pos = np.concatenate(
        [
            np.zeros((4, 3), np.float32),
            np.tile(np.asarray(params.bbox_size)[None] * 4.0, (4, 1)).astype(
                np.float32
            ),
        ]
    )
    dirs = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (8, 1))
    cfg = PointRadianceConfig(
        max_threads=64,
        launches_per_update=2,
        rel_tol=0.9,
        abs_tol=1e-9,
        black_min_experiments=60,
    )
    one = collectors.estimate_point_radiance(
        params, static, pos, dirs, cfg, seed=11, max_updates=1
    )
    full = collectors.estimate_point_radiance(
        params, static, pos, dirs, cfg, seed=11, max_updates=32
    )
    assert full.is_converged.all()
    early = np.asarray(one.is_converged)
    assert early.any(), "expected some points to converge in update 1"
    assert not early.all()
    np.testing.assert_array_equal(
        full.experiments[early], one.experiments[early]
    )
    np.testing.assert_array_equal(full.radiance[early], one.radiance[early])
    assert (full.experiments[~early] > one.experiments[~early]).all()


def test_radiance_static_is_multi_scatter():
    density = np.ones((8, 8, 8), np.float32)
    _, static = _scene(density)
    rstatic = collectors._radiance_static(static)
    from deepestscatter_tpu.config import RenderMode

    assert rstatic.mode is RenderMode.SUN_MULTIPLE_SCATTER
    assert dataclasses.asdict(rstatic) != dataclasses.asdict(static) or (
        static.mode is RenderMode.SUN_MULTIPLE_SCATTER
    )
