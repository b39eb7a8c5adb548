"""Russian roulette must be an unbiased variance/work trade."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from deepestscatter_tpu import scene as scene_mod
from deepestscatter_tpu.config import (
    CameraConfig,
    CloudModel,
    CloudRendering,
    SceneConfig,
)
from deepestscatter_tpu.data import procedural
from deepestscatter_tpu.render import camera as camera_ops
from deepestscatter_tpu.render import inscatter, pathtracer


def _render_mean(cfg, density, n_subframes):
    params, static = scene_mod.build_scene(cfg, density)
    params = inscatter.with_baked_inscatter(params, static)
    basis = camera_ops.camera_basis(cfg.camera)
    o, d = camera_ops.generate_rays(basis, cfg.camera.width, cfg.camera.height)
    n = o.shape[0]
    acc = jnp.zeros((n, 3))
    for s in range(n_subframes):
        acc = acc + pathtracer.render_subframe(
            params, static, o, d, 7, jnp.int32(s + 1)
        )
    return np.asarray(acc / n_subframes)


def test_rr_unbiased_and_shorter():
    density = procedural.cumulus(resolution=24, seed=5)
    base = SceneConfig(
        cloud=CloudModel(size_m=1500.0),
        camera=CameraConfig(width=16, height=8),
        rendering=CloudRendering(max_depth=300),
    )
    rr = dataclasses.replace(
        base,
        rendering=CloudRendering(max_depth=300, rr_start_depth=20, rr_survival=0.95),
    )
    img_ref = _render_mean(base, density, 48)
    img_rr = _render_mean(rr, density, 48)
    # Same estimator in expectation: means agree within Monte-Carlo noise.
    bright = img_ref[:, 0] > 0.05
    assert bright.sum() > 10
    rel = np.abs(img_rr[bright] - img_ref[bright]) / (img_ref[bright] + 1e-3)
    assert np.median(rel) < 0.25, (np.median(rel), rel.max())
    # Global means very close (noise averages out across pixels).
    assert abs(img_rr.mean() - img_ref.mean()) / img_ref.mean() < 0.05
