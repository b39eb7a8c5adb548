"""Bounded-per-call execution must be EXACT: chunked bake and banded tick.

One multi-minute XLA computation can crash a tunneled single-chip TPU
worker (verify SKILL.md), so large grids bake in voxel chunks
(render/inscatter.py) and large-table renders tick in lane bands
(render/progressive.py).  Both are pure re-chunkings of independent work
items — voxels and (pixel, sample) lanes — so their outputs must equal the
single-call versions bitwise.
"""

from __future__ import annotations

import numpy as np
import pytest

from deepestscatter_tpu import scene as scene_mod
from deepestscatter_tpu.config import (
    CameraConfig,
    CloudModel,
    CloudRendering,
    ProgressiveConfig,
    SceneConfig,
)
from deepestscatter_tpu.data import procedural
from deepestscatter_tpu.render import inscatter
from deepestscatter_tpu.render import progressive as prog


@pytest.fixture(scope="module")
def scene():
    cfg = SceneConfig(
        cloud=CloudModel(size_m=600.0),
        camera=CameraConfig(width=16, height=8),
        progressive=ProgressiveConfig(subframes_per_tick=4),
        rendering=CloudRendering(max_depth=12, sample_step=1.0 / 64.0),
    )
    density = procedural.cumulus(resolution=24, seed=3)
    params, static = scene_mod.build_scene(cfg, density)
    return cfg, params, static


def test_chunked_bake_bitwise_equals_single_call(scene):
    _, params, static = scene
    single = np.asarray(inscatter.bake(params, static))
    # 24^3 = 13824 voxels; 5000-voxel chunks exercise padding + concat.
    chunked = np.asarray(inscatter.bake(params, static, chunk_voxels=5000))
    np.testing.assert_array_equal(single, chunked)


def test_banded_tick_bitwise_equals_single_call(scene, monkeypatch):
    cfg, params, static = scene
    params = inscatter.with_baked_inscatter(params, static)
    r_single = prog.ProgressiveRenderer(cfg, params, static, seed=5)
    r_single.tick()

    # Force banding: 128 rays in 4 bands of 32 lanes.
    monkeypatch.setattr(prog, "_BAND_TABLE_BYTES", 1)
    monkeypatch.setattr(prog, "_BAND_LANES", 32)
    r_banded = prog.ProgressiveRenderer(cfg, params, static, seed=5)
    assert r_banded._lanes_per_call() == 32
    r_banded.tick()

    np.testing.assert_array_equal(
        np.asarray(r_single.state.mean), np.asarray(r_banded.state.mean)
    )
    np.testing.assert_array_equal(
        np.asarray(r_single.state.m2), np.asarray(r_banded.state.m2)
    )
    assert int(r_single.state.subframe_id) == int(r_banded.state.subframe_id)
