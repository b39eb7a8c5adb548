"""Pipelined (geometric-cursor) march loop vs the legacy deferred loop.

The pipelined loop changes SCHEDULING only: the row-fetch index stream
advances on ray geometry (so XLA can overlap consecutive iterations'
gathers) and the per-bounce resolve runs unconditionally every
``march_resolve_every`` iterations (no lax.cond).  Per-sample physics is
untouched — identical step lattice, identical masks, identical RNG draw
sites — so:

- with ``march_empty_skip=False`` on the legacy loop, results are
  BIT-IDENTICAL (the cursor marches through zero-density bricks where the
  legacy loop jumps; trans *= exp(-0) is exact);
- against the legacy DEFAULT (empty-skip on), results agree statistically
  (the jump changes step-lattice anchoring by sub-ulp position rounding,
  the same equivalence class as the existing skip tests).
"""

from __future__ import annotations

import dataclasses

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
from deepestscatter_tpu.render import camera as camera_ops
from deepestscatter_tpu.render import inscatter
from deepestscatter_tpu.render import pathtracer as pt


@pytest.fixture(scope="module", params=[0, 2])
def rig(request):
    brick = request.param
    cfg = SceneConfig(
        cloud=CloudModel(size_m=700.0),
        camera=CameraConfig(width=16, height=8),
        rendering=CloudRendering(
            max_depth=15, sample_step=1.0 / 64.0, march_brick=brick,
            march_dtype="uint8" if brick else "float32",
        ),
    )
    density = procedural.cumulus(resolution=24, seed=3)
    params, static = scene_mod.build_scene(cfg, density)
    params = inscatter.with_baked_inscatter(params, static)
    basis = camera_ops.camera_basis(cfg.camera)
    origins, directions = camera_ops.generate_rays(basis, 16, 8)
    return params, static, origins, directions


def _moments(params, static, o, d, s=3):
    return tuple(
        np.asarray(x)
        for x in pt.trace_tick_moments(params, static, o, d, 7, jnp.int32(0), s)
    )


def test_pipeline_bitwise_vs_legacy_noskip(rig):
    params, static, o, d = rig
    pipe = dataclasses.replace(static, march_pipeline=True)
    legacy = dataclasses.replace(
        static, march_pipeline=False, march_empty_skip=False
    )
    a = _moments(params, pipe, o, d)
    b = _moments(params, legacy, o, d)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_pipeline_statistical_vs_legacy_default(rig):
    params, static, o, d = rig
    pipe = dataclasses.replace(static, march_pipeline=True)
    legacy = dataclasses.replace(static, march_pipeline=False)
    a = _moments(params, pipe, o, d, s=6)
    b = _moments(params, legacy, o, d, s=6)
    # Same estimator; only the empty-skip lattice anchor differs.  Means
    # agree tightly, most pixels bitwise.
    assert abs(a[0].mean() - b[0].mean()) / max(b[0].mean(), 1e-9) < 0.05
    rel = np.abs(a[0] - b[0]) / (np.abs(b[0]) + 1e-6)
    assert np.median(rel) < 1e-4


@pytest.mark.parametrize("cadence", [2, 5, 16])
def test_resolve_cadence_invariant(rig, cadence):
    """Per-sample values cannot depend on WHEN resolves run — any cadence
    must produce bitwise-identical moments."""
    params, static, o, d = rig
    a = _moments(
        params, dataclasses.replace(static, march_pipeline=True), o, d
    )
    b = _moments(
        params,
        dataclasses.replace(
            static, march_pipeline=True, march_resolve_every=cadence
        ),
        o, d,
    )
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_pipeline_multiscatter_mode(rig):
    """SUN_MULTIPLE_SCATTER (the label generator's mode) through the
    pipelined loop equals the legacy loop bitwise with skip off."""
    params, static, o, d = rig
    ms = dataclasses.replace(static, mode=RenderMode.SUN_MULTIPLE_SCATTER)
    pipe = dataclasses.replace(ms, march_pipeline=True)
    legacy = dataclasses.replace(
        ms, march_pipeline=False, march_empty_skip=False
    )
    a = _moments(params, pipe, o, d)
    b = _moments(params, legacy, o, d)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
