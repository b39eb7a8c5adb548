"""Safety-cap behavior of the deferred loop + per-pixel progressive counts.

Round-4 VERDICT weak #7: the progressive tick merged the ACTUAL per-lane
fold counts into the Welford state but then keyed the CI gate on the
scheduled ``subframe_id`` — a lane whose tick tripped the march safety cap
had its CI sharpened by phantom samples.  ``ProgressiveState`` now carries
per-pixel counts.

Round-4 ADVICE: a cap exit during a NON-final cascade phase with more live
lanes than the next level's buffer silently truncated the excess lanes'
in-flight radiance (``compact``'s fixed-size nonzero).  ``fold_if_capped``
now folds and retires every live lane on any cap exit.

The cap is forced via ``SceneStatic.march_max_iters`` (a hard override of
the derived wavefront bound).
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
    ProgressiveConfig,
    SceneConfig,
)
from deepestscatter_tpu.data import procedural
from deepestscatter_tpu.render import camera as camera_ops
from deepestscatter_tpu.render import inscatter
from deepestscatter_tpu.render import pathtracer as pt
from deepestscatter_tpu.render import progressive as prog


def _rig(width, height):
    cfg = SceneConfig(
        cloud=CloudModel(size_m=900.0),
        camera=CameraConfig(width=width, height=height),
        progressive=ProgressiveConfig(subframes_per_tick=4),
        rendering=CloudRendering(max_depth=15, sample_step=1.0 / 64.0),
    )
    density = procedural.cumulus(resolution=16, seed=5)
    params, static = scene_mod.build_scene(cfg, density)
    params = inscatter.with_baked_inscatter(params, static)
    basis = camera_ops.camera_basis(cfg.camera)
    origins, directions = camera_ops.generate_rays(basis, width, height)
    return cfg, params, static, origins, directions


def test_progressive_counts_match_schedule_without_cap():
    """Default (generous) cap: every lane folds exactly the scheduled
    number of samples, and the per-pixel count equals subframe_id."""
    cfg, params, static, o, d = _rig(8, 4)
    st = prog.init_state(o.shape[0])
    st = prog.render_tick(params, static, o, d, st, seed_base=3,
                          n_subframes=4)
    assert int(st.subframe_id) == 4
    np.testing.assert_array_equal(np.asarray(st.count)[:, 0], 4.0)


def test_capped_tick_keeps_honest_counts():
    """A tick that trips the safety cap folds FEWER samples on stalled
    lanes; the state must record the actual counts (not the schedule) and
    the CI gate must use them."""
    cfg, params, static, o, d = _rig(8, 4)
    capped = dataclasses.replace(static, march_max_iters=4)
    s = 4
    st = prog.init_state(o.shape[0])
    st = prog.render_tick(params, capped, o, d, st, seed_base=3,
                          n_subframes=s)
    counts = np.asarray(st.count)[:, 0]
    hit, _ = camera_ops.intersect_box(o, d, static, params.bbox_size)
    hit = np.asarray(hit)
    # Miss lanes fold all s deterministic miss samples; capped hit lanes
    # fold at least their truncated in-flight sample and at most s.
    np.testing.assert_array_equal(counts[~hit], float(s))
    assert counts[hit].min() >= 1.0
    assert counts[hit].max() <= float(s)
    assert counts[hit].min() < float(s), "cap did not trip — weak test"
    # Schedule counter still advances (seeding/snapshot cadence).
    assert int(st.subframe_id) == s
    # The CI gate runs off the honest per-pixel N and stays finite.
    n_unconv = int(prog.unconverged_count(st, cfg.progressive))
    assert 0 <= n_unconv <= o.shape[0]
    assert np.isfinite(np.asarray(st.mean)).all()


def test_cascade_cap_folds_truncated_lanes():
    """Cap exit in a non-final cascade phase (live lanes > next level's
    buffer): every hit lane must still fold >= 1 (possibly truncated)
    sample — the pre-fix code silently dropped the in-flight radiance of
    lanes beyond the compacted buffer size."""
    # 8192 lanes => one cascade level of 1024; a cap of 4 iterations trips
    # in phase 0 with nearly all lanes alive (>> 1024).
    cfg, params, static, o, d = _rig(128, 64)
    capped = dataclasses.replace(static, march_max_iters=4)
    mean, m2, cnt = pt.trace_tick_moments(
        params, capped, o, d, 3, jnp.int32(0), 2
    )
    counts = np.asarray(cnt)
    hit, _ = camera_ops.intersect_box(o, d, static, params.bbox_size)
    hit = np.asarray(hit)
    assert hit.sum() > 2048, "scene must cover many lanes for this test"
    assert counts[hit].min() >= 1.0, (
        "cap exit truncated lanes without folding their in-flight sample"
    )
    assert np.isfinite(np.asarray(mean)).all()
    assert np.isfinite(np.asarray(m2)).all()


@pytest.mark.parametrize("n_subframes", [1, 3])
def test_cap_override_zero_is_inert(n_subframes):
    """march_max_iters=0 (the default) must reproduce the derived bound's
    results bitwise."""
    cfg, params, static, o, d = _rig(8, 4)
    explicit = dataclasses.replace(
        static,
        march_max_iters=(static.max_depth + 1)
        * (static.max_march_steps + 1)
        * n_subframes,
    )
    a = pt.trace_tick_moments(params, static, o, d, 9, jnp.int32(0),
                              n_subframes)
    b = pt.trace_tick_moments(params, explicit, o, d, 9, jnp.int32(0),
                              n_subframes)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
