"""Fast TPU paths must match the exact reference formulations."""

import jax.numpy as jnp
import numpy as np

from deepestscatter_tpu.ops import grid as grid_ops
from deepestscatter_tpu.ops import phase as phase_ops


def test_packed_trilinear_matches_classic(rng):
    grid = jnp.asarray(rng.random((9, 7, 5)).astype(np.float32))
    packed = grid_ops.pack_corners(grid)
    assert packed.shape == (9, 7, 5, 8)
    # Include out-of-range coords to exercise clamp-to-edge.
    u = jnp.asarray(rng.uniform(-0.2, 1.2, (4096, 3)).astype(np.float32))
    classic = grid_ops.sample_trilinear(grid, u)
    fast = grid_ops.sample_trilinear(packed, u)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(classic), atol=1e-6)


def test_eval_phase_pair_matches_exact(rng):
    phase = phase_ops.load_phase_table()
    cos_t = jnp.asarray(rng.uniform(-1.0, 1.0, 8192).astype(np.float32))
    mie_fast, chop_fast = phase_ops.eval_phase_pair(phase, cos_t)
    mie = phase_ops.eval_phase(phase.mie, cos_t)
    chop = phase_ops.eval_phase(phase.chopped, cos_t)
    np.testing.assert_allclose(np.asarray(mie_fast), np.asarray(mie), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(chop_fast), np.asarray(chop), rtol=1e-5, atol=1e-5)


def test_inv_cdf_sampling_matches_exact(rng):
    phase = phase_ops.load_phase_table()
    u = jnp.asarray(rng.random(8192).astype(np.float32))
    exact = np.asarray(phase_ops.sample_cos_theta(phase, u))
    fast = np.asarray(phase_ops.sample_cos_theta_fast(phase, u))
    # The tabulated inverse agrees to table resolution; compare via the
    # forward CDF (the meaningful metric for a sampler).
    cdf_exact = np.interp(
        (exact + 1) / 2,
        (np.arange(4096) + 0.5) / 4096,
        np.asarray(phase.chopped_cdf),
    )
    cdf_fast = np.interp(
        (fast + 1) / 2,
        (np.arange(4096) + 0.5) / 4096,
        np.asarray(phase.chopped_cdf),
    )
    np.testing.assert_allclose(cdf_fast, cdf_exact, atol=2e-3)


def test_pipelined_standalone_march_statistical():
    """The pipelined standalone march (geometric cursor + tight-AABB clip,
    no empty-skip; round 5 — the neural camera path) is the empty-skip
    equivalence class of the legacy march: scatter decisions and
    transmittance agree except on od-threshold-grazing lanes, and the
    estimator-level statistics match."""
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
    from deepestscatter_tpu.ops import march as march_ops
    from deepestscatter_tpu.render import camera as camera_ops

    cfg = SceneConfig(
        cloud=CloudModel(size_m=900.0),
        camera=CameraConfig(width=24, height=12),
        rendering=CloudRendering(sample_step=1.0 / 96.0, march_dtype="uint8"),
    )
    density = procedural.cumulus(resolution=24, seed=6)
    params, static = scene_mod.build_scene(cfg, density)
    basis = camera_ops.camera_basis(cfg.camera)
    o, d = camera_ops.generate_rays(basis, 24, 12)
    hit, t_hit = camera_ops.intersect_box(o, d, static, params.bbox_size)
    entry = o + d * t_hit[:, None] + 0.5 * params.bbox_size
    rng = np.random.default_rng(2)
    od = jnp.asarray(rng.uniform(1e-3, 1.0, o.shape[0]), jnp.float32)

    legacy = march_ops.next_scattering_event(
        params, dataclasses.replace(static, march_pipeline=False),
        od, entry, d, stop_at_scatter=False,
    )
    pipe = march_ops.next_scattering_event(
        params, dataclasses.replace(static, march_pipeline=True),
        od, entry, d, stop_at_scatter=False,
    )
    sl = np.asarray(legacy.has_scattered)
    sp = np.asarray(pipe.has_scattered)
    n = len(sl)
    assert (sl == sp).sum() >= n - max(2, n // 50), "scatter flags diverge"
    both = sl & sp
    np.testing.assert_allclose(
        np.asarray(pipe.transmittance), np.asarray(legacy.transmittance),
        rtol=5e-3, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(pipe.scatter_pos)[both],
        np.asarray(legacy.scatter_pos)[both],
        rtol=5e-3, atol=5e-3,
    )
    # Rays that miss the cloud AABB never march: transmittance exactly 1.
    assert np.isfinite(np.asarray(pipe.transmittance)).all()
